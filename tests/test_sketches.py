"""Sketch-operator guarantees beyond oracle parity.

Parity (test_oracle_parity) proves both engines compute the same sketch;
these tests pin the *algorithmic* contracts — the properties a user
relies on when the sketch replaces an exact computation at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_worker_spark.operators.sketches import (
    sample_hash_bottomk,
    sketch_bloom_membership,
    sketch_countmin_tokens,
    sketch_kmv_distinct,
)


def test_bloom_no_false_negatives_and_broadcast_plan(spark, sf_dir):
    """A Bloom filter may say 'maybe' wrongly, never 'no' wrongly — and
    both its joins must broadcast (the bit set and build keys are tiny
    by construction; shuffling the probe side for them would be wrong
    at any scale)."""
    df = sketch_bloom_membership(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    rows = df.collect()
    assert rows, "probe side empty"
    false_negatives = [r for r in rows if r.is_member and not r.bloom_maybe]
    assert false_negatives == []
    # fp flag column is consistent with the other two.
    for r in rows:
        assert r.false_positive == (r.bloom_maybe and not r.is_member)


def test_cms_never_underestimates(spark, sf_dir):
    """Count-Min point queries are one-sided: estimate >= true count."""
    rows = sketch_countmin_tokens(spark, sf_dir).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_est >= r.exact_freq for r in rows)


def test_kmv_estimate_tolerance(spark, sf_dir):
    """KMV with k=64 has relative stddev ~1/sqrt(k-2) (~13%); assert a
    generous 3-sigma envelope so the test pins sanity, not luck."""
    rows = sketch_kmv_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_distinct >= 64, "fixture too small for the sketch"
        assert r.rel_err < 0.40, (r.source, r.rel_err)


def test_bottomk_sample_stable_under_repartition(spark, sf_dir):
    """The sample must be a pure function of the data, not of the
    physical layout (that is the reproducibility contract)."""
    base = {(r.doc_id, r.sample_rank)
            for r in sample_hash_bottomk(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.conv(F.substring(F.md5(
        F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))
    ), 1, 15), 16, 10).cast("bigint")
    from pyspark.sql import Window
    w = Window.orderBy(h.asc(), F.col("doc_id"))
    shuffled = (
        docs.repartition(7, "source").select("doc_id")
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= 100)
    )
    assert {(r.doc_id, r.sample_rank) for r in shuffled.collect()} == base


def test_hll_estimate_tolerance_and_register_bound(spark, sf_dir):
    """HLL at m=256 has relative stddev ~1.04/sqrt(m) (~6.5%); assert a
    generous envelope plus the structural bound n_buckets <= m."""
    from data_ingestion_worker_spark.operators.sketches import (
        HLL_M,
        sketch_hll_distinct,
    )
    rows = sketch_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_buckets <= HLL_M
        if r.exact_distinct >= 4 * HLL_M:
            # raw-estimator regime: the 3-sigma envelope applies
            assert r.rel_err < 0.20, (r.source, r.rel_err)


def test_hll_union_merge_is_lossless_and_estimates_union(spark, sf_dir):
    """Merging per-source register sets must equal sketching the whole
    corpus directly (max is associative), and the merged estimate must
    track the exact cross-source distinct count."""
    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.sketches import (
        HLL_M,
        HLL_REST_BITS,
        _src_shingles,
        sketch_hll_union,
    )
    from data_ingestion_worker_spark.functions.hashing import hash64

    row = sketch_hll_union(spark, sf_dir).collect()[0]
    assert row.n_sources > 1, "union over one source is vacuous"
    assert 0 <= row.rel_err < 0.2
    assert row.n_buckets <= HLL_M

    # Direct global sketch (no per-source stage): bucketwise max over
    # the whole corpus — must yield identical registers, hence an
    # identical estimate.
    sh = _src_shingles(spark, sf_dir).select(
        hash64(F.col("shingle")).alias("h")
    )
    direct = (
        sh.select(
            F.pmod("h", F.lit(HLL_M)).alias("bucket"),
            F.expr(f"h div {HLL_M}").alias("rest"),
        )
        .select(
            "bucket",
            F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
                F.lit(HLL_REST_BITS + 1)
                - F.length(F.conv(F.col("rest").cast("string"), 10, 2))
            ).cast("int").alias("rho"),
        )
        .groupBy("bucket").agg(F.max("rho").alias("r"))
        .agg(F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_REST_BITS} - r)")
        ).alias("z_present"), F.count(F.lit(1)).alias("n_buckets"))
        .collect()[0]
    )
    # z_present is not exposed by the operator, so compare via the
    # estimate instead — identical registers imply an identical hll_est.
    from data_ingestion_worker_spark.operators.sketches import HLL_ALPHA_NUM
    z = direct.z_present + (HLL_M - direct.n_buckets) * (1 << HLL_REST_BITS)
    import math
    assert row.hll_est == math.floor(HLL_ALPHA_NUM / float(z))


def test_kmv_jaccard_estimates_track_exact_overlap(spark, sf_dir):
    """The sketch-only Jaccard must be a probability, agree with the
    exact value within the KMV error regime, be symmetric-complete
    (every source pair present once, s1 < s2), and its intersection
    estimate must be 0 exactly when the sketch overlap count is 0."""
    from data_ingestion_worker_spark.operators.sketches import (
        KMV_K,
        sketch_kmv_jaccard,
    )

    rows = sketch_kmv_jaccard(spark, sf_dir).collect()
    assert rows
    seen = {(r.s1, r.s2) for r in rows}
    assert all(s1 < s2 for s1, s2 in seen)
    srcs = sorted({s for p in seen for s in p})
    assert len(seen) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert 0.0 <= r.kmv_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert (r.kmv_inter_est == 0) == (r.kmv_jaccard == 0.0)
        # KMV error: union-sketch overlap count is Binomial(K, J); allow
        # 4 sigma plus the estimator's own 1/K resolution.
        import math
        sigma = math.sqrt(max(r.exact_jaccard * (1 - r.exact_jaccard), 1e-9)
                          / KMV_K)
        assert abs(r.kmv_jaccard - r.exact_jaccard) <= 4 * sigma + 1.0 / KMV_K, r


def test_sliding_hll_matches_python_mirror(spark, sf_dir):
    """ev_sliding_uniques_hll equals a pure-Python recomputation of the
    same md5-derived registers, window for window — pinning both halves:
    the exact sliding distinct AND the register max-merge (merging
    hourly sketches must equal sketching the merged hours; max-merge is
    lossless for HLL)."""
    import hashlib
    import math

    from data_ingestion_worker_spark.operators.sketches import (
        HLL_ALPHA_NUM,
        HLL_M,
        HLL_REST_BITS,
        HLL_WIN_HOURS,
        ev_sliding_uniques_hll,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").cast("long").alias("sec"), "user_id"
    ).collect()

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    by_hour: dict[int, set[int]] = {}
    for r in rows:
        by_hour.setdefault(r.sec // 3600, set()).add(h64(str(r.user_id)))
    hours = set(by_hour)

    want = {}
    for w in hours:
        span = [hh for hh in range(w - HLL_WIN_HOURS + 1, w + 1)
                if hh in hours]
        users = set().union(*(by_hour[hh] for hh in span))
        regs: dict[int, int] = {}
        for h in users:
            bucket, rest = h % HLL_M, h // HLL_M
            rho = HLL_REST_BITS + 1 - (rest.bit_length() if rest else 0)
            regs[bucket] = max(regs.get(bucket, 0), rho)
        z = sum(1 << (HLL_REST_BITS - r) for r in regs.values()) \
            + (HLL_M - len(regs)) * (1 << HLL_REST_BITS)
        want[w] = (len(span), len(users),
                   math.floor(HLL_ALPHA_NUM / float(z)))

    got = {r.win_hour: (r.n_hours, r.exact_uniques, r.hll_est)
           for r in ev_sliding_uniques_hll(spark, sf_dir).collect()}
    assert got == want
    # Estimate tolerance applies only in the raw-estimator regime
    # (n >> m); the linear-counting correction for tiny windows is
    # deliberately omitted (see sketch_hll_distinct's docstring), so
    # small-n windows are exempt — they exist only at toy SFs.
    for _, exact, est in got.values():
        if exact >= 3 * HLL_M:
            assert abs(est - exact) / exact < 0.25
