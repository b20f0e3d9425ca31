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


def test_salted_lsh_pair_set_equals_unsalted(spark, sf_dir):
    """Triangle-cell band salting must not change the candidate pair
    set — only how a hot band bucket's pair generation is distributed.
    Also exercises a synthetic hot bucket (every doc sharing one band
    signature) so the cross-salt cells actually fire."""
    from data_ingestion_worker_spark.operators.dedup import (
        _band_pairs,
        dedup_minhash_lsh,
    )

    plain = dedup_minhash_lsh(spark, sf_dir, salts=1)
    salted = dedup_minhash_lsh(spark, sf_dir, salts=4)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0

    hot = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"), F.lit(7).alias("m1"), F.lit(9).alias("m2"),
    )
    want = {(a, b) for a in range(40) for b in range(40) if a < b}
    got = {(r["d1"], r["d2"])
           for r in _band_pairs(hot, salts=4).collect()}
    assert got == want
