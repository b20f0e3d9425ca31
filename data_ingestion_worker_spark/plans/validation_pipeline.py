"""The flagship plan: the reference's initial-processing loop as ONE query.

Reference ``src/processor.py:124-388`` validates a contacts CSV with a
sequential per-row loop (hash -> dup pre-scan -> existing-email lookup ->
4-rule validation).  Here the same semantics are a single declarative
DataFrame plan — per-row Python disappears, and at scale the heavy pieces
are exactly the ones Spark already does well:

- duplicate detection (A1)  -> window count over the normalized email
  (hash-partition shuffle on the email key; skew-safe under AQE),
- existing-email membership (J2/J3) -> broadcast left join against the
  tenant's contacts slice (predicate ``contacts_user_id = uid`` pushes into
  the contacts scan; the slice is small, so no shuffle),
- verdicts (F4) -> one chained CASE inside whole-stage codegen,
- row identity (F5) -> sha256 over the canonical row string.

``derive_contacts_batch`` fabricates a deterministic contacts-like batch
from the driver's ``customer`` table (modular-arithmetic fault injection:
missing fields, invalid formats, duplicate groups, pre-existing emails) so
the full rule precedence is exercised by the DuckDB oracle at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import row_hash
from ..functions.validation import (
    issue_key,
    issue_message,
    normalize_email,
    validation_verdict,
)


def derive_contacts_batch(customer: DataFrame) -> DataFrame:
    """Deterministic contacts-like batch derived from ``customer``.

    Fault injection by modular arithmetic on ``c_custkey`` (deterministic,
    SF-independent semantics):

    - ``% 23 == 3``  -> empty email          (MISSING_REQUIRED_FIELD)
    - ``% 23 == 7``  -> malformed email      (INVALID_EMAIL)
    - ``% 11 == 5``  -> one of 7 shared addresses (DUPLICATE_EMAIL)
    - ``% 29 == 11`` -> whitespace first_name (MISSING_REQUIRED_FIELD)
    - ``% 31 == 13`` -> NULL last_name        (MISSING_REQUIRED_FIELD)
    - ``% 37 == 17`` -> empty company         (MISSING_REQUIRED_FIELD)
    - otherwise a valid ``user.{k}@example.com`` (mixed case + padding to
      exercise F1 normalization).
    """
    k = F.col("c_custkey")
    ks = k.cast("string")
    email = (
        F.when(k % 23 == 3, F.lit(""))
        .when(k % 23 == 7, F.concat(F.lit("bad-email-"), ks))
        .when(k % 11 == 5,
              F.concat(F.lit("shared"), (k % 7).cast("string"),
                       F.lit("@dup.example.com")))
        .otherwise(F.concat(F.lit("  User."), ks, F.lit("@Example.COM ")))
    )
    return customer.select(
        k.alias("c_custkey"),
        (k + 1).alias("row_num"),
        email.alias("email"),
        F.when(k % 29 == 11, F.lit("   "))
         .otherwise(F.concat(F.lit("First"), ks)).alias("first_name"),
        F.when(k % 31 == 13, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("Last"), ks)).alias("last_name"),
        F.when(k % 37 == 17, F.lit(""))
         .otherwise(F.concat(F.lit("Co-"), F.col("c_mktsegment")))
         .alias("company"),
    )


def derive_existing_contacts(customer: DataFrame) -> DataFrame:
    """Tenant's pre-existing contact emails (J2 build side).

    Mirrors contact_repository.py:18-39: the lookup is one tenant-filtered
    email set, small enough to broadcast.
    """
    k = F.col("c_custkey")
    return (
        customer.filter(k % 13 == 2)
        .select(
            F.concat(F.lit("user."), k.cast("string"),
                     F.lit("@example.com")).alias("contact_email")
        )
        .distinct()
    )


def annotate_contacts(batch: DataFrame, existing: DataFrame,
                      job_id: int = 1,
                      row_col: str = "row_num",
                      job_col: str | None = None) -> DataFrame:
    """Annotate a contacts batch with the full validation verdict.

    Input columns: ``row_col``, email, first_name, last_name, company
    (plus any passenger columns, preserved).  Output adds email_norm,
    issue_type, issue_msg, issue_key, row_hash, is_importable.

    This is the single codification of the validation semantics — the
    flagship query AND the control-flow processor (control/processor.py)
    both run through it, so a rule change lands everywhere at once and
    stays pinned by the flagship's DuckDB oracle.

    ``job_col``: when the batch holds rows from SEVERAL jobs (the
    consumer's one-annotate-per-microbatch path), name the long column
    carrying each row's job id.  Duplicate detection then partitions by
    (job, email) — A1 is per-file in the reference
    (src/processor.py:239-258) — and the F5 row hash uses the per-row
    job id.  ``job_col=None`` (every existing caller) is byte-identical
    to the previous single-job behavior with ``lit(job_id)``.
    """
    norm = normalize_email(F.col("email"))
    df = batch.withColumn("email_norm", norm)

    # A1: duplicate detection at row grain — window count per normalized
    # email (empty emails never count as duplicates; they fail rule 1
    # anyway). One hash-shuffle on the email key.
    dup_keys = ([job_col] if job_col else []) + ["email_norm"]
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*dup_keys))
    df = df.withColumn(
        "is_duplicate", (F.length("email_norm") > 0) & (cnt > 1)
    )

    # J2/J3: membership against the tenant's existing contacts. Broadcast:
    # the build side is one tenant's email set.
    df = df.join(
        F.broadcast(existing.withColumnRenamed("contact_email", "email_norm")
                    .withColumn("email_exists", F.lit(True))),
        on="email_norm",
        how="left",
    ).withColumn("email_exists", F.coalesce("email_exists", F.lit(False)))

    verdict = validation_verdict(
        F.col("email"), F.col("first_name"), F.col("last_name"),
        F.col("company"), F.col("is_duplicate"), F.col("email_exists"),
    )
    df = df.withColumn("issue_type", verdict)
    df = df.withColumn(
        "issue_msg",
        issue_message(F.col("email"), F.col("first_name"),
                      F.col("last_name"), F.col("company"),
                      F.col("issue_type")),
    )
    df = df.withColumn("issue_key", issue_key(F.col("email"), F.col(row_col)))
    df = df.withColumn(
        "row_hash",
        row_hash(F.col(job_col) if job_col else F.lit(job_id),
                 F.col(row_col), F.col("email"),
                 F.col("first_name"), F.col("last_name"), F.col("company")),
    )
    return df.withColumn("is_importable", F.col("issue_type").isNull())


def contacts_validation_plan(customer: DataFrame, job_id: int = 1) -> DataFrame:
    """End-to-end flagship query: derive batch -> annotate -> project."""
    batch = derive_contacts_batch(customer)
    existing = derive_existing_contacts(customer)
    annotated = annotate_contacts(batch, existing, job_id=job_id)
    return annotated.select(
        "c_custkey", "row_num", "email_norm", "issue_type", "issue_msg",
        "issue_key", "row_hash", "is_importable",
    )


# --- DuckDB-oracle mirrors of the derivations above -----------------------
# Kept adjacent to the Spark code so any change updates both sides.

BATCH_CTE = """
batch AS (
  SELECT
    c_custkey,
    c_custkey + 1 AS row_num,
    CASE
      WHEN c_custkey % 23 = 3 THEN ''
      WHEN c_custkey % 23 = 7 THEN 'bad-email-' || CAST(c_custkey AS VARCHAR)
      WHEN c_custkey % 11 = 5 THEN 'shared' || CAST(c_custkey % 7 AS VARCHAR) || '@dup.example.com'
      ELSE '  User.' || CAST(c_custkey AS VARCHAR) || '@Example.COM '
    END AS email,
    CASE WHEN c_custkey % 29 = 11 THEN '   '
         ELSE 'First' || CAST(c_custkey AS VARCHAR) END AS first_name,
    CASE WHEN c_custkey % 31 = 13 THEN CAST(NULL AS VARCHAR)
         ELSE 'Last' || CAST(c_custkey AS VARCHAR) END AS last_name,
    CASE WHEN c_custkey % 37 = 17 THEN ''
         ELSE 'Co-' || c_mktsegment END AS company
  FROM customer
)
"""

EXISTING_CTE = """
existing AS (
  SELECT DISTINCT 'user.' || CAST(c_custkey AS VARCHAR) || '@example.com' AS contact_email
  FROM customer WHERE c_custkey % 13 = 2
)
"""

EMAIL_REGEX_SQL = "'^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$'"

CONTACTS_VALIDATION_ORACLE = f"""
WITH {BATCH_CTE.strip()}, {EXISTING_CTE.strip()},
annot AS (
  SELECT b.*,
         lower(trim(coalesce(b.email, ''))) AS email_norm,
         count(*) OVER (PARTITION BY lower(trim(coalesce(b.email, '')))) AS email_cnt,
         (e.contact_email IS NOT NULL) AS email_exists
  FROM batch b
  LEFT JOIN existing e ON lower(trim(coalesce(b.email, ''))) = e.contact_email
),
verdicts AS (
  SELECT *,
    CASE
      WHEN trim(coalesce(email, '')) = '' THEN 'email'
      WHEN trim(coalesce(first_name, '')) = '' THEN 'first_name'
      WHEN trim(coalesce(last_name, '')) = '' THEN 'last_name'
      WHEN trim(coalesce(company, '')) = '' THEN 'company'
    END AS missing_field,
    (email_cnt > 1 AND email_norm <> '') AS is_duplicate,
    regexp_matches(trim(coalesce(email, '')), {EMAIL_REGEX_SQL}) AS email_ok
  FROM annot
),
final AS (
  SELECT *,
    CASE
      WHEN missing_field IS NOT NULL THEN 'MISSING_REQUIRED_FIELD'
      WHEN NOT email_ok THEN 'INVALID_EMAIL'
      WHEN is_duplicate THEN 'DUPLICATE_EMAIL'
      WHEN email_exists THEN 'EXISTING_EMAIL'
    END AS issue_type
  FROM verdicts
)
SELECT c_custkey, row_num, email_norm, issue_type,
  CASE
    WHEN issue_type = 'MISSING_REQUIRED_FIELD' THEN 'Missing required field: ' || missing_field
    WHEN issue_type = 'INVALID_EMAIL' THEN 'Invalid email format: ' || trim(coalesce(email, ''))
    WHEN issue_type = 'DUPLICATE_EMAIL' THEN 'Duplicate email in file: ' || email_norm
    WHEN issue_type = 'EXISTING_EMAIL' THEN 'Email already exists: ' || email_norm
  END AS issue_msg,
  CASE WHEN length(email_norm) > 0 THEN email_norm
       ELSE 'row_' || CAST(row_num AS VARCHAR) END AS issue_key,
  sha256(concat_ws(chr(1), '1', CAST(row_num AS VARCHAR), email_norm,
                   trim(coalesce(first_name, '')), trim(coalesce(last_name, '')),
                   trim(coalesce(company, '')))) AS row_hash,
  (issue_type IS NULL) AS is_importable
FROM final
"""
