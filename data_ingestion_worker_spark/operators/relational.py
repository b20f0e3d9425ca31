"""Relational core operators (SURVEY.md §2.2-§2.6) over the driver tables.

Each entry re-expresses one reference operator as a declarative DataFrame
plan.  The reference implements these as Python loops / SQLAlchemy queries
(file:line cited per spec); here Catalyst picks the physical strategy —
broadcast vs shuffle joins, partial aggregation, predicate pushdown into
the parquet scan — which is the entire point of the rebuild.

Scale notes (100 TB): every filter below is expressible against the scan
(PushedFilters), every groupBy gets map-side partial aggregation, and the
semi/anti joins broadcast their small side automatically under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import row_hash
from ..plans.validation_pipeline import (
    BATCH_CTE,
    CONTACTS_VALIDATION_ORACLE,
    EMAIL_REGEX_SQL,
    contacts_validation_plan,
    derive_contacts_batch,
)
from ..functions.validation import EMAIL_REGEX
from ..spec import QuerySpec
from ..tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- flagship --------------------------------------------------------------

def contacts_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6 + A1 + J2/J3 + P1/P6 in one plan (reference processor.py:124-388)."""
    return contacts_validation_plan(_t(spark, sf_dir, "customer"))


# --- projections / filters (P1-P6; reference §2.2) --------------------------

def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 business projection (processor.py:238-247): narrow column select.

    Column pruning reaches the parquet scan — ReadSchema lists only the
    three columns.
    """
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def p2_filter_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 filter-by-job analogue (staging_repository.py:112-125)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_suppkey") % 10 == 3).select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
    )


def p3_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 job AND status (staging_repository.py:128-144): conjunctive pushdown."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def p4_exclusion_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 DISCARD exclusion (processor.py:428-432): negated equality."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") != "O").select(
        "o_orderkey", "o_orderstatus"
    )


def p6_nonempty_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 non-empty predicate (processor.py:162,688-690) on documents.text."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.length(F.trim("text")) > 0).select("doc_id", "lang", "n_chars")


# --- joins (J1-J5; reference §2.3) ------------------------------------------

def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 FK inner join (issue_repository.py:221-223): orders x customer.

    customer is the small side -> broadcast hash join, no shuffle of orders.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


def j2_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 membership semi-join (contact_repository.py:34-39).

    Customers having at least one finished order — broadcast left-semi.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def j3_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 negated membership (row_validator.py:98-104): customers w/o orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def j5_idempotency_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 already-staged skip (staging_repository.py:46-66, processor.py:207-235).

    Composite-key left-anti join: new rows minus rows whose
    (l_orderkey, l_linenumber) identity is already staged.  This is the
    replay-idempotency primitive (ADR-001).
    """
    li = _t(spark, sf_dir, "lineitem")
    staged = li.filter(F.col("l_linenumber") <= 2).select(
        "l_orderkey", "l_linenumber"
    )
    return li.join(
        staged, ["l_orderkey", "l_linenumber"], "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


# --- aggregations (A1-A8; reference §2.4) ------------------------------------

def a1_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 duplicate-email detection (processor.py:674-726): hash agg + HAVING."""
    batch = derive_contacts_batch(_t(spark, sf_dir, "customer"))
    norm = F.lower(F.trim(F.coalesce(F.col("email"), F.lit(""))))
    return (
        batch.select(norm.alias("norm_email"))
        .filter(F.col("norm_email") != "")
        .groupBy("norm_email")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def a2_distinct_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 distinct email set (processor.py:162)."""
    batch = derive_contacts_batch(_t(spark, sf_dir, "customer"))
    norm = F.lower(F.trim(F.coalesce(F.col("email"), F.lit(""))))
    return (
        batch.select(norm.alias("norm_email"))
        .filter(F.col("norm_email") != "")
        .distinct()
    )


def a4_count_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 rows-per-status (staging_repository.py:173-191)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def a5_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 total vs unresolved counting (issue_repository.py:130-161, ADR-002).

    One pass, conditional aggregation — the reference issues two separate
    SQL counts.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "unresolved"
        ),
    )


def a7_all_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 auto-resolve check (issue_repository.py:226-272).

    Groups whose members have all left the 'open' state: orders where no
    lineitem is still linestatus='O'.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0)).alias(
                "open_items"
            )
        )
        .filter(F.col("open_items") == 0)
        .select("l_orderkey")
    )


def a8_progress_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 progress percentage (processor.py:231,296,584): round(x/y*100, 2)."""
    li = _t(spark, sf_dir, "lineitem")
    returned = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return li.groupBy("l_orderkey").agg(
        F.round(returned * 100.0 / F.count(F.lit(1)), 2).alias("pct_returned")
    )


# --- windows / sort / limit / set ops (§2.5, engine extensions) --------------

def w1_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 deterministic row numbering (processor.py:181 enumerate analogue).

    The reference's physical-file-order numbering re-specified as an
    explicit total order (acctbal desc, custkey) per nation.
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.row_number().over(w).alias("rn")
    )


def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per customer (rank window + filter).

    The scan spread is keyed on the WINDOW key (o_custkey), not the
    table's default join key: hashpartitioning(o_custkey, N) satisfies
    the window's required distribution, so the spread exchange IS the
    window exchange — one shuffle total (r10 shipped the default
    o_orderkey spread here, which sat as pure overhead ahead of the
    window's own exchange: 0.59 → 0.70 s and the suite's worst 8→32
    core ratio; guide §2.4 "two operations keyed the same way share
    one exchange").
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders", spread="o_custkey")
        .select("o_custkey", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total over the event stream (cumulative window).

    DECIMAL accumulation keeps the running sum exact and order-independent
    across engines.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(14,2)")).over(w)
         .cast("double").alias("run_sum"),
    )


def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user delta vs previous event (lag window)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events")
    delta = (F.col("value").cast("decimal(14,2)")
             - F.lag(F.col("value").cast("decimal(14,2)")).over(w))
    return e.select("event_id", "user_id", delta.cast("double").alias("delta"))


def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartile + percent_rank per market segment.

    NTILE/PERCENT_RANK are deterministic only under a total order, so the
    ORDER BY always carries the key tie-break — the same discipline every
    "latest wins" window in this repo follows.  percent_rank is
    (rank−1)/(n−1): a single division of exact integers, bit-identical
    across engines.
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 8).alias("bal_prank"),
    )


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (TakeOrderedAndProject — no full sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT with distinct semantics over key subsets."""
    c = _t(spark, sf_dir, "customer")
    evens = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    threes = c.filter(F.col("c_custkey") % 3 == 0).select("c_custkey")
    fives = c.filter(F.col("c_custkey") % 5 == 0).select("c_custkey")
    return evens.union(threes).distinct().exceptAll(fives.distinct())


def corr_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers richer than their nation's average balance.

    The correlated-scalar-subquery shape, decorrelated the way Catalyst
    (and any optimizer) rewrites it: one per-nation aggregate joined
    back to the row grain.  The comparison is ``bal · n > Σbal`` in
    DECIMAL — no division, so the boundary can't drift between engines
    no matter how the average would round.
    """
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    per_nation = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(bal).alias("s"),
    )
    j = c.join(F.broadcast(per_nation), "c_nationkey")
    return (
        j.filter((bal * F.col("n")).cast("decimal(38,2)")
                 > F.col("s").cast("decimal(38,2)"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


def set_ops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — planned as a left-semi join, so
    it broadcasts/shuffles exactly like any other join under AQE."""
    c = _t(spark, sf_dir, "customer")
    evens = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey")
    threes = c.filter(F.col("c_custkey") % 3 == 0).select("c_custkey")
    return evens.intersect(threes)


# --- scalar functions (F2, F5, F8; reference §2.6) ---------------------------

def f2_email_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 email format regex (row_validator.py:26-28,77-85)."""
    batch = derive_contacts_batch(_t(spark, sf_dir, "customer"))
    return batch.select(
        "c_custkey",
        F.trim(F.coalesce(F.col("email"), F.lit(""))).rlike(EMAIL_REGEX)
         .alias("email_ok"),
    )


def f5_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 sha256 row-identity hash (staging_repository.py:19-44, ADR-001)."""
    batch = derive_contacts_batch(_t(spark, sf_dir, "customer"))
    return batch.select(
        "c_custkey",
        row_hash(F.lit(1), F.col("row_num"), F.col("email"),
                 F.col("first_name"), F.col("last_name"),
                 F.col("company")).alias("row_hash"),
    )


def f8_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 JSON body parse (consumer.py:131): path extraction + cast."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


# --- oracle SQL --------------------------------------------------------------

SPECS: dict[str, QuerySpec] = {
    "contacts_validation": QuerySpec(
        contacts_validation, CONTACTS_VALIDATION_ORACLE,
        "flagship: full validation pipeline as one plan"),
    "p1_projection": QuerySpec(
        p1_projection,
        "SELECT c_custkey, c_name, c_mktsegment FROM customer"),
    "p2_filter_by_key": QuerySpec(
        p2_filter_by_key,
        "SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity "
        "FROM lineitem WHERE l_suppkey % 10 = 3"),
    "p3_conjunctive_filter": QuerySpec(
        p3_conjunctive_filter,
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'"),
    "p4_exclusion_filter": QuerySpec(
        p4_exclusion_filter,
        "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'O'"),
    "p6_nonempty_filter": QuerySpec(
        p6_nonempty_filter,
        "SELECT doc_id, lang, n_chars FROM documents WHERE length(trim(text)) > 0"),
    "j1_inner_equi": QuerySpec(
        j1_inner_equi,
        "SELECT o_orderkey, c_name, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey"),
    "j2_semi": QuerySpec(
        j2_semi,
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"),
    "j3_anti": QuerySpec(
        j3_anti,
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    "j5_idempotency_anti": QuerySpec(
        j5_idempotency_anti,
        "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem l WHERE NOT EXISTS ("
        " SELECT 1 FROM lineitem s WHERE s.l_linenumber <= 2"
        "   AND s.l_orderkey = l.l_orderkey AND s.l_linenumber = l.l_linenumber)"),
    "a1_duplicate_groups": QuerySpec(
        a1_duplicate_groups,
        f"WITH {BATCH_CTE.strip()} "
        "SELECT lower(trim(coalesce(email,''))) AS norm_email, "
        "CAST(count(*) AS BIGINT) AS cnt FROM batch "
        "WHERE lower(trim(coalesce(email,''))) <> '' "
        "GROUP BY 1 HAVING count(*) > 1"),
    "a2_distinct_emails": QuerySpec(
        a2_distinct_emails,
        f"WITH {BATCH_CTE.strip()} "
        "SELECT DISTINCT lower(trim(coalesce(email,''))) AS norm_email "
        "FROM batch WHERE lower(trim(coalesce(email,''))) <> ''"),
    "a4_count_by_status": QuerySpec(
        a4_count_by_status,
        "SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n "
        "FROM orders GROUP BY 1"),
    "a5_conditional_counts": QuerySpec(
        a5_conditional_counts,
        "SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS total, "
        "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS unresolved FROM orders GROUP BY 1"),
    "a7_all_resolved": QuerySpec(
        a7_all_resolved,
        "SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        "HAVING sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) = 0"),
    "a8_progress_pct": QuerySpec(
        a8_progress_pct,
        "SELECT l_orderkey, round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
        " * 100.0 / count(*), 2) AS pct_returned FROM lineitem GROUP BY l_orderkey"),
    "w1_row_number": QuerySpec(
        w1_row_number,
        "SELECT c_custkey, c_nationkey, CAST(row_number() OVER ("
        "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn "
        "FROM customer"),
    "win_topn_per_group": QuerySpec(
        win_topn_per_group,
        "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn FROM orders) "
        "WHERE rn <= 3"),
    "win_running_sum": QuerySpec(
        win_running_sum,
        "SELECT event_id, user_id, CAST(sum(CAST(value AS DECIMAL(14,2))) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum "
        "FROM events"),
    "win_lag_delta": QuerySpec(
        win_lag_delta,
        "SELECT event_id, user_id, CAST(CAST(value AS DECIMAL(14,2)) - "
        "lag(CAST(value AS DECIMAL(14,2))) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS DOUBLE) AS delta FROM events"),
    "win_ntile_quartiles": QuerySpec(
        win_ntile_quartiles,
        "SELECT c_custkey, c_mktsegment, c_acctbal, "
        "CAST(ntile(4) OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal DESC, c_custkey) AS INT) AS bal_quartile, "
        "round(percent_rank() OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal DESC, c_custkey), 8) AS bal_prank "
        "FROM customer"),
    "topk_orders": QuerySpec(
        topk_orders,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    "set_ops": QuerySpec(
        set_ops,
        "SELECT c_custkey FROM ("
        "SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0 "
        "UNION SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0) "
        "EXCEPT SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0"),
    "corr_subquery_above_avg": QuerySpec(
        corr_subquery_above_avg,
        "SELECT c_custkey, c_nationkey, c_acctbal FROM customer c "
        "WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * ("
        "  SELECT count(*) FROM customer i "
        "  WHERE i.c_nationkey = c.c_nationkey) AS DECIMAL(38,2)) > ("
        "  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) "
        "              AS DECIMAL(38,2)) FROM customer i "
        "  WHERE i.c_nationkey = c.c_nationkey)"),
    "set_ops_intersect": QuerySpec(
        set_ops_intersect,
        "SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0 "
        "INTERSECT SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0"),
    "f2_email_regex": QuerySpec(
        f2_email_regex,
        f"WITH {BATCH_CTE.strip()} "
        f"SELECT c_custkey, regexp_matches(trim(coalesce(email,'')), "
        f"{EMAIL_REGEX_SQL}) AS email_ok FROM batch"),
    "f5_row_hash": QuerySpec(
        f5_row_hash,
        f"WITH {BATCH_CTE.strip()} "
        "SELECT c_custkey, sha256(concat_ws(chr(1), '1', CAST(row_num AS VARCHAR), "
        "lower(trim(coalesce(email,''))), trim(coalesce(first_name,'')), "
        "trim(coalesce(last_name,'')), trim(coalesce(company,'')))) AS row_hash "
        "FROM batch"),
    "f8_json_extract": QuerySpec(
        f8_json_extract,
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val "
        "FROM events"),
}
