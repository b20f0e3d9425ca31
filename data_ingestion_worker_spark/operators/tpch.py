"""Analytic (TPC-H-style) queries — the engine's headline batch workload.

The reference has no analytic queries at all (its only aggregation is a
duplicate-email count, SURVEY.md §2.4); these exercise the same engine
primitives at warehouse shape: multi-way joins with broadcast dimensions,
partial aggregation, rollup, top-k.

Determinism: all money math is DECIMAL until the final projection (see
spec.py) — sums are exact and order-independent, so the driver's value
hash matches DuckDB bit-for-bit.

Scale notes: every query below keeps lineitem (the 100 TB fact) on the
probe side; dimensions broadcast (region/nation/customer/supplier are
KB-GB even at SF100k). Filters are plain column predicates that push into
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spec import QuerySpec
from ..tables import load_table as _load_table


def load_table(spark, sf_dir, name):
    """TPC-H-local loader: scan-spread disabled (measured at sf0.1 —
    these queries are scan→join→aggregate with light per-row map work,
    so the spread exchange is pure overhead (interleaved min-of-4 at
    sf0.1: q5 0.90→0.77 s, q10 0.98→0.79 s, others wash); the heavy-map
    operators keep the default-on spread in tables.load_table)."""
    return _load_table(spark, sf_dir, name, spread=False)


def _dec(col: str, scale: str = "12,2") -> F.Column:
    return F.col(col).cast(f"decimal({scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass grouped aggregation over the fact table.

    Map-side partial aggregation reduces 100 TB to KBs before the shuffle
    (only 6 groups exist).
    """
    # q1 is the one classic query that IS map-heavy (eight DECIMAL
    # aggregates per row), so it keeps the spread (0.63 vs 0.75 s in
    # the same interleaved A/B).
    li = _load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02 00:00:00"
    )
    qty, price = _dec("l_quantity"), _dec("l_extendedprice")
    disc, tax = _dec("l_discount", "4,2"), _dec("l_tax", "4,2")
    disc_price = price * (F.lit(1).cast("decimal(4,2)") - disc)
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + tax)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, grouped revenue, global top-10.

    customer is broadcast; orders/lineitem co-shuffle on orderkey; the
    final top-10 is TakeOrderedAndProject (no global sort materialized).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01 00:00:00"
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", "4,2")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with the local-supplier twist
    (supplier nation == customer nation), revenue per nation."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", "4,2")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c),
              (o.o_custkey == c.c_custkey)
              & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


Q5_ORACLE = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate pushes
    into the parquet scan (PushedFilters), zero joins, one shuffle-free
    partial+final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _dec("l_extendedprice") * _dec("l_discount", "4,2")
    return sel.agg(F.sum(rev).cast("double").alias("revenue"))


Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", "4,2")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status -> priority -> grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup(F.col("o_orderstatus").alias("status"),
                 F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


ROLLUP_ORACLE = """
SELECT o_orderstatus AS status, o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def agg_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (count(DISTINCT ...)) — expand+two-phase in Spark."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


DISTINCT_ORACLE = """
SELECT o_orderstatus AS status,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per status.

    Explicit pivot values keep the plan a single pass (no extra distinct
    scan to discover columns) — required practice at scale.
    """
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "priority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


PIVOT_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY 1
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide status-count table back to long form.

    The inverse of :func:`agg_pivot` — ``DataFrame.unpivot`` (Spark's
    native melt; an Expand node, one pass, no shuffle beyond the
    pivot's own aggregation) turns the per-status count columns into
    (status, n_orders) rows.  Wide→long reshaping is a first-class
    primitive in any reporting pipeline; round-tripping the engine's
    own pivot output also pins that the two operators compose.
    """
    return agg_pivot(spark, sf_dir).unpivot(
        ["priority"], ["n_f", "n_o", "n_p"], "status_col", "n_orders"
    ).withColumn(
        "status",
        F.upper(F.substring(F.col("status_col"), 3, 1)),
    ).select("priority", "status", "n_orders")


UNPIVOT_ORACLE = """
WITH w AS (
  SELECT o_orderpriority AS priority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_p
  FROM orders GROUP BY 1
)
SELECT priority, 'F' AS status, n_f AS n_orders FROM w
UNION ALL
SELECT priority, 'O' AS status, n_o AS n_orders FROM w
UNION ALL
SELECT priority, 'P' AS status, n_p AS n_orders FROM w
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted collect_list per group, emitted as a joined string.

    array_sort makes the collected list deterministic regardless of
    shuffle arrival order — the only safe way to hash-compare a
    collect_list across engines (or across two Spark runs under AQE).
    The list is serialized with concat_ws so downstream hashers that
    cannot factorize nested arrays (pandas value-hash canonicalizers)
    still grade it; the array form is recoverable via split+cast.
    """
    s = load_table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("s_suppkey"))).alias(
            "suppkeys"
        ),
        F.count(F.lit(1)).alias("n"),
    )


COLLECT_ORACLE = """
SELECT s_nationkey,
       array_to_string(list(s_suppkey ORDER BY s_suppkey), ',') AS suppkeys,
       CAST(count(*) AS BIGINT) AS n
FROM supplier GROUP BY 1
"""


def agg_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: per-batch partial aggregates
    merged into the final answer, pinned equal to a direct recompute.

    Batches are shipment months — the unit an incremental pipeline
    lands.  Phase 1 computes each batch's partial state (count / DECIMAL
    sum / min / max); phase 2 merges states with the combiner algebra
    (sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes).  The oracle
    is the DIRECT aggregation over all rows, so the green row proves the
    merge is lossless — the contract that lets a 100 TB rollup absorb a
    new day by touching one partial instead of re-scanning the fact
    table (same proof shape as ``scd2_incremental_merge``).  Both phases
    are ordinary hash aggregates; the second runs on batch-count-sized
    input (~84 months × groups), i.e. metadata scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("batch"),
        "l_returnflag", "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("l_quantity")).alias("sq"),
        F.min(_dec("l_extendedprice")).alias("mn"),
        F.max(_dec("l_extendedprice")).alias("mx"),
    )
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum("sq").cast("decimal(22,2)").cast("double").alias("sum_qty"),
        F.min("mn").cast("double").alias("min_price"),
        F.max("mx").cast("double").alias("max_price"),
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
    )


PARTIAL_MERGE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
                 AS DECIMAL(22,2)) AS DOUBLE) AS sum_qty,
       CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS min_price,
       CAST(max(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS max_price,
       CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT)
         AS n_batches
FROM lineitem
GROUP BY 1, 2
"""


SPECS: dict[str, QuerySpec] = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_ORACLE),
    "agg_pivot": QuerySpec(agg_pivot, PIVOT_ORACLE),
    "agg_unpivot": QuerySpec(agg_unpivot, UNPIVOT_ORACLE),
    "agg_cube": QuerySpec(agg_cube, CUBE_ORACLE),
    "agg_collect_sorted": QuerySpec(agg_collect_sorted, COLLECT_ORACLE),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_ORACLE),
    "q5_local_supplier_volume": QuerySpec(q5_local_supplier_volume, Q5_ORACLE),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_ORACLE),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_ORACLE),
    "agg_rollup": QuerySpec(agg_rollup, ROLLUP_ORACLE),
    "agg_distinct_per_group": QuerySpec(agg_distinct_per_group, DISTINCT_ORACLE),
    "agg_partial_merge": QuerySpec(agg_partial_merge, PARTIAL_MERGE_ORACLE),
}
