"""Salted join / two-phase aggregation equal their unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_worker_spark.operators.skew import (
    salted_count,
    salted_join,
)


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, ["o_custkey"]).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, customer, ["o_custkey"], n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark, sf_dir):
    """Unmatched left rows survive with NULLs, exactly as unsalted."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    ).filter(F.col("o_custkey") % 2 == 0)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = orders.join(customer, ["o_custkey"], "left").select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(orders, customer, ["o_custkey"],
                         n_salts=4, how="left").select("o_orderkey", "c_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_count_matches_groupby(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r["o_orderstatus"]: r["n"]
        for r in salted_count(orders, ["o_orderstatus"], n_salts=4).collect()
    }
    assert salted == plain


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """The 100 TB path for A2-style distinct counts is HLL
    (approx_count_distinct) — engine-specific sketches can't be
    oracle-hashed, so the engine pins a relative-error contract instead.
    """
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = orders.select("o_custkey").distinct().count()
    approx = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.05
