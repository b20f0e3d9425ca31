"""Row-validation rules as whole-column expressions.

The reference validates each row with a sequential Python function
(``src/validators/row_validator.py:47-107``) applying four rules in strict
precedence; here the whole rule set is one chained ``F.when`` CASE that
Catalyst evaluates columnar-side — the per-row loop disappears entirely.

Rules & precedence (first failing rule wins, reference README.md:110-118):
1. MISSING_REQUIRED_FIELD — email, first_name, last_name, company each
   non-empty after trim; the *first* missing field is reported
   (row_validator.py:30,67-75).
2. INVALID_EMAIL — regex on the trimmed (not lowercased) email
   (row_validator.py:26-28,77-85).
3. DUPLICATE_EMAIL — normalized email occurs >1 time in the batch
   (processor.py:674-726).
4. EXISTING_EMAIL — normalized email already in contacts for this tenant
   (row_validator.py:98-104, contact_repository.py:34-39).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference regex verbatim (row_validator.py:26-28); the character-class
#: syntax is identical in Java regex, so ``rlike`` matches byte-for-byte.
EMAIL_REGEX = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"

REQUIRED_FIELDS = ["email", "first_name", "last_name", "company"]


def _clean(c: Column) -> Column:
    return F.trim(F.coalesce(c, F.lit("")))


def normalize_email(email: Column) -> Column:
    """F1: ``lower(strip(email))``, empty-safe (row_validator.py:32-45)."""
    return F.lower(_clean(email))


def email_is_valid(email: Column) -> Column:
    """F2: format regex over the trimmed, un-lowered email."""
    return _clean(email).rlike(EMAIL_REGEX)


def first_missing_field(email: Column, first_name: Column,
                        last_name: Column, company: Column) -> Column:
    """F3: name of the first required field empty after trim, else NULL."""
    cols = dict(zip(REQUIRED_FIELDS, [email, first_name, last_name, company]))
    expr: Column = F.lit(None).cast("string")
    # Build the chain in reverse so precedence reads front-to-back.
    for name in reversed(REQUIRED_FIELDS):
        expr = F.when(F.length(_clean(cols[name])) == 0, F.lit(name)).otherwise(expr)
    return expr


def validation_verdict(email: Column, first_name: Column, last_name: Column,
                       company: Column, is_duplicate: Column,
                       email_exists: Column) -> Column:
    """F4: the full precedence CASE; NULL means the row is valid.

    ``is_duplicate`` / ``email_exists`` are boolean columns produced by the
    batch-level duplicate aggregation (A1) and the contacts membership join
    (J2/J3) — the validator itself stays pure, mirroring the reference's
    pre-loaded-set design (row_validator.py:56-58).
    """
    missing = first_missing_field(email, first_name, last_name, company)
    return (
        F.when(missing.isNotNull(), F.lit("MISSING_REQUIRED_FIELD"))
        .when(~email_is_valid(email), F.lit("INVALID_EMAIL"))
        .when(F.coalesce(is_duplicate, F.lit(False)), F.lit("DUPLICATE_EMAIL"))
        .when(F.coalesce(email_exists, F.lit(False)), F.lit("EXISTING_EMAIL"))
        .otherwise(F.lit(None).cast("string"))
    )


def issue_message(email: Column, first_name: Column, last_name: Column,
                  company: Column, verdict: Column) -> Column:
    """Human-readable description per issue type (row_validator.py:67-104)."""
    missing = first_missing_field(email, first_name, last_name, company)
    return (
        F.when(verdict == "MISSING_REQUIRED_FIELD",
               F.concat(F.lit("Missing required field: "), missing))
        .when(verdict == "INVALID_EMAIL",
              F.concat(F.lit("Invalid email format: "), _clean(email)))
        .when(verdict == "DUPLICATE_EMAIL",
              F.concat(F.lit("Duplicate email in file: "),
                       normalize_email(email)))
        .when(verdict == "EXISTING_EMAIL",
              F.concat(F.lit("Email already exists: "),
                       normalize_email(email)))
        .otherwise(F.lit(None).cast("string"))
    )


def issue_key(email: Column, row_number: Column) -> Column:
    """F6: normalized email when present, else ``row_{n}``
    (processor.py:261-263)."""
    norm = normalize_email(email)
    return F.when(F.length(norm) > 0, norm).otherwise(
        F.concat(F.lit("row_"), row_number.cast("string"))
    )
