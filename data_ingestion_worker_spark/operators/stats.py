"""Statistical aggregates with engine-exact determinism.

Two classes of statistics and how each stays reproducible:

- **Order statistics** (``percentile``): Spark's exact ``percentile`` and
  DuckDB's ``quantile_cont`` share linear-interpolation semantics, so the
  values agree bit-for-bit.  (At 100 TB you would switch to
  ``approx_percentile`` — t-digest — and accept engine-specific results;
  the exact form is the verifiable baseline.)
- **Moment statistics** (variance, correlation): the built-in one-pass
  implementations accumulate doubles in shuffle order — not reproducible
  across engines or even across runs under AQE.  Here they are computed
  from exact DECIMAL power sums (n, Σx, Σx², Σxy) via the algebraic
  identities, with a single double division/sqrt at the end: associative,
  order-independent, identical in both engines.  The power sums are also
  the *distributed-friendly* form — each is a map-side-combinable SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spec import QuerySpec
from ..tables import load_table


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 order totals per priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


PERCENTILES_ORACLE = """
SELECT o_orderpriority AS priority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY 1
"""


def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance of order totals per priority, from exact
    DECIMAL power sums: var = (n·Σx² − (Σx)²) / n²."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    agg = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxx")).cast("decimal(38,4)") \
        - (F.col("sx") * F.col("sx")).cast("decimal(38,4)")
    # Round to 3 decimals: the DECIMAL(38)->double conversion may differ
    # by one ulp between engines (Java BigDecimal vs DuckDB int128 path);
    # the statistic itself is exact far beyond that.
    return agg.select(
        "priority", "n",
        F.round(
            num.cast("double") / (F.col("n") * F.col("n")).cast("double"), 3
        ).alias("var_pop"),
    )


VARIANCE_ORACLE = """
SELECT priority, n,
       round(CAST(CAST(n AS DECIMAL(38,4)) * sxx - sx * sx AS DOUBLE)
             / CAST(n * n AS DOUBLE), 3) AS var_pop
FROM (
  SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
         AS sxx
  FROM orders GROUP BY 1
)
"""


def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    from exact power sums:
    corr = (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy")).cast("decimal(38,4)") \
        - (F.col("sx") * F.col("sy")).cast("decimal(38,4)")
    denx = (n * F.col("sxx")).cast("decimal(38,4)") \
        - (F.col("sx") * F.col("sx")).cast("decimal(38,4)")
    deny = (n * F.col("syy")).cast("decimal(38,4)") \
        - (F.col("sy") * F.col("sy")).cast("decimal(38,4)")
    corr = num.cast("double") / (
        F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double"))
    )
    return agg.select("l_returnflag", "n", F.round(corr, 10).alias("corr_qp"))


CORR_ORACLE = """
SELECT l_returnflag, n,
       round(CAST(CAST(n AS DECIMAL(38,4)) * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(CAST(n AS DECIMAL(38,4)) * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(CAST(n AS DECIMAL(38,4)) * syy - sy * sy
                            AS DOUBLE))), 10) AS corr_qp
FROM (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy,
         sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy
  FROM lineitem GROUP BY 1
)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id disambiguation.

    Complements the CUBE/ROLLUP operators: only the requested grouping
    combinations are computed (one Expand branch each), and grouping_id
    lets the consumer tell a genuine NULL from an aggregated-out column
    — both engines share the first-column-is-MSB bitmask convention.
    """
    from ..tables import register_views
    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
                 AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

HIST_WIDTH = 25000


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals.

    Bucketing is ``floor(x / width)`` — one exact double division per
    row, no data-dependent bucket boundaries, so the aggregation is a
    single partial+final hash agg (the same shape at any scale; compare
    equi-depth histograms, which need a percentile pre-pass).
    """
    o = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / F.lit(float(HIST_WIDTH)))
    return o.groupBy(b.cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


HISTOGRAM_ORACLE = f"""
SELECT CAST(floor(o_totalprice / {HIST_WIDTH}.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM orders GROUP BY 1
"""


def stats_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression of extended price on quantity per return flag,
    from the same exact DECIMAL power sums as :func:`agg_corr_exact`:

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n

    Every accumulator is a map-side-combinable DECIMAL SUM (one shuffle
    of one row per flag, any cluster size); only the final two divisions
    run in double, and IEEE division is correctly rounded, so both
    engines produce bit-identical statistics regardless of row order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy")).cast("decimal(38,4)") \
        - (F.col("sx") * F.col("sy")).cast("decimal(38,4)")
    den = (n * F.col("sxx")).cast("decimal(38,4)") \
        - (F.col("sx") * F.col("sx")).cast("decimal(38,4)")
    slope = num.cast("double") / den.cast("double")
    intercept = (F.col("sy").cast("double") - slope
                 * F.col("sx").cast("double")) / n.cast("double")
    return agg.select(
        "l_returnflag", "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
    )


LINREG_ORACLE = """
SELECT l_returnflag, n,
       round(slope, 6) AS slope,
       round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 4) AS intercept
FROM (
  SELECT *,
         CAST(CAST(n AS DECIMAL(38,4)) * sxy - sx * sy AS DOUBLE)
         / CAST(CAST(n AS DECIMAL(38,4)) * sxx - sx * sx AS DOUBLE) AS slope
  FROM (
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))
                    AS DECIMAL(38,4))) AS sxx,
           sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(38,4))) AS sxy
    FROM lineitem GROUP BY 1
  )
)
"""


def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal order priority per order status with a pinned tie-break.

    The built-in ``mode()`` in both engines picks an arbitrary winner on
    ties, so the operator is specified as the deterministic composition:
    count per (group, value), then rank by (count DESC, value ASC) and
    keep rank 1.  The count pre-aggregation means the window runs over
    |statuses|×|priorities| rows — constant-size whatever the fact-table
    scale — instead of windowing the raw scan.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc())
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("cnt").alias("modal_count"),
        )
    )


MODE_ORACLE = """
SELECT o_orderstatus, o_orderpriority AS modal_priority,
       cnt AS modal_count
FROM (
  SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY count(*) DESC, o_orderpriority ASC)
           AS rn
  FROM orders GROUP BY 1, 2
)
WHERE rn = 1
"""


SPECS: dict[str, QuerySpec] = {
    "agg_grouping_sets": QuerySpec(agg_grouping_sets, GROUPING_SETS_ORACLE),
    "stats_linreg_exact": QuerySpec(stats_linreg_exact, LINREG_ORACLE),
    "agg_mode_deterministic": QuerySpec(agg_mode_deterministic, MODE_ORACLE),
    "agg_histogram": QuerySpec(agg_histogram, HISTOGRAM_ORACLE),
    "agg_percentiles": QuerySpec(agg_percentiles, PERCENTILES_ORACLE),
    "agg_variance_exact": QuerySpec(agg_variance_exact, VARIANCE_ORACLE),
    "agg_corr_exact": QuerySpec(agg_corr_exact, CORR_ORACLE),
}
