"""Semantic contracts for the SCD2 build and linear-interpolation resample
(beyond the oracle-parity row/value match in test_oracle_parity.py).

SCD2 (scd2_user_state): the interval set must be a well-formed history —
versions consecutive from 1, exactly one open interval per user, each
interval's valid_to equal to the next interval's valid_from, and no two
consecutive intervals sharing a state (else the change compression
failed).

Interpolation (ev_resample_interpolate): every non-NULL spine value must
lie within the [min, max] of the user's observed values (a convex
combination cannot escape its bracket), and a spine hour that lands
exactly on an observation must return that observation verbatim.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestion_worker_spark.operators.temporal import (
    N_RESAMPLE_USERS,
    _scd2_build,
    ev_resample_interpolate,
    scd2_merge_batch,
    scd2_user_state,
)
from data_ingestion_worker_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_intervals_form_a_wellformed_history(spark):
    rows = scd2_user_state(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user, "SCD2 produced no intervals"
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r.is_current for r in ivs) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.valid_from < a.valid_to
            assert a.state != b.state, "adjacent intervals share a state"


def test_scd2_covers_every_user_from_first_event(spark):
    e = load_table(spark, SF_DIR, "events")
    firsts = {
        r.user_id: r.first_ts
        for r in e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
        .collect()
    }
    opens = {r.user_id: r.valid_from
             for r in scd2_user_state(spark, SF_DIR)
             .filter("version = 1").collect()}
    assert set(opens) == set(firsts)
    for u, t in opens.items():
        assert t == firsts[u]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("split", [
    "2024-01-01 00:00:00",   # everything arrives as the batch
    "2024-01-08 00:00:00",
    "2024-01-16 00:00:00",
    "2024-01-23 12:00:00",
    "2024-02-01 00:00:00",   # empty batch — merge must be a no-op
])
def test_scd2_merge_equals_full_rebuild_at_any_split(spark, split):
    e = load_table(spark, SF_DIR, "events")
    cut = F.expr(f"TIMESTAMP_NTZ '{split}'")
    merged = scd2_merge_batch(
        _scd2_build(e.filter(F.col("ts") <= cut)),
        e.filter(F.col("ts") > cut),
    )
    assert _canon(merged) == _canon(_scd2_build(e))


def test_scd2_merge_repeated_state_batch_is_a_noop(spark):
    e = load_table(spark, SF_DIR, "events")
    dim = _scd2_build(e)
    # A batch that replays every user's current state strictly later
    # must change nothing but survive the merge unchanged.
    replay = (
        dim.filter("is_current")
        .select(
            "user_id", F.col("state").alias("event_type"),
            F.expr("TIMESTAMP_NTZ '2024-03-01 00:00:00'").alias("ts"),
            F.monotonically_increasing_id().alias("event_id"),
        )
    )
    assert _canon(scd2_merge_batch(dim, replay)) == _canon(dim)


def test_interpolation_stays_inside_its_bracket(spark):
    e = load_table(spark, SF_DIR, "events").filter(
        F.col("user_id") < N_RESAMPLE_USERS
    )
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in e.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    out = ev_resample_interpolate(spark, SF_DIR).collect()
    assert any(r.interp_value is not None for r in out)
    for r in out:
        if r.interp_value is None:
            continue
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.interp_value <= hi + 1e-6


def test_interpolation_exact_hit_returns_the_observation(spark):
    # Deduped per (user, ts) with max-event_id-wins, same spec as the op.
    e = load_table(spark, SF_DIR, "events").filter(
        F.col("user_id") < N_RESAMPLE_USERS
    )
    on_hour = (
        e.filter(F.col("ts") == F.date_trunc("hour", F.col("ts")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts")
                .orderBy(F.col("event_id").desc())
            ),
        )
        .filter("_rn = 1")
        .select("user_id", "ts", "value")
        .collect()
    )
    if not on_hour:
        return  # no on-the-hour observation at this SF — nothing to pin
    got = {
        (r.user_id, r.hour_ts): r.interp_value
        for r in ev_resample_interpolate(spark, SF_DIR).collect()
    }
    for r in on_hour:
        assert got[(r.user_id, r.ts)] == r.value


@pytest.mark.parametrize("seed", [3, 41, 97])
def test_scd2_multibatch_fold_equals_rebuild_random(spark, seed):
    """Folding a random event stream through scd2_merge_batch in
    multiple time-ordered batches equals the one-shot rebuild — the
    associativity a per-microbatch deployment relies on (seeded, so
    failures reproduce).  Includes same-timestamp ties and users
    appearing first in a later batch."""
    import random

    from datetime import datetime, timedelta

    rng = random.Random(seed)
    base = datetime(2024, 6, 1)
    rows = []
    for eid in range(300):
        rows.append((
            eid,
            base + timedelta(minutes=rng.randrange(0, 500)),
            rng.randrange(12),
            rng.choice(["a", "b", "c"]),
        ))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string"
    )
    full = _canon(_scd2_build(df))

    cuts = sorted(rng.sample(range(0, 500), 2))
    bounds = [base + timedelta(minutes=m) for m in cuts]
    b0 = df.filter(F.col("ts") <= bounds[0])
    b1 = df.filter((F.col("ts") > bounds[0]) & (F.col("ts") <= bounds[1]))
    b2 = df.filter(F.col("ts") > bounds[1])
    dim = _scd2_build(b0)
    dim = scd2_merge_batch(dim, b1)
    dim = scd2_merge_batch(dim, b2)
    assert _canon(dim) == full


def test_scd2_null_states_are_non_observations(spark):
    """A NULL event_type (e.g. a malformed stream record) is dropped,
    not treated as a state: the interval set ignores it entirely and
    incremental merge still equals the full rebuild around it."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 6, 1, 0, 0), 7, "a"),
        (2, datetime(2024, 6, 1, 1, 0), 7, None),
        (3, datetime(2024, 6, 1, 2, 0), 7, "a"),
        (4, datetime(2024, 6, 1, 3, 0), 7, "b"),
        (5, datetime(2024, 6, 1, 0, 30), 8, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string"
    )
    full = _scd2_build(df)
    got = {(r.user_id, r.state, r.version, r.is_current)
           for r in full.collect()}
    # User 7: one 'a' interval (the NULL and the repeat collapse away)
    # then 'b'; user 8 has only a NULL record -> no intervals at all.
    assert got == {(7, "a", 1, False), (7, "b", 2, True)}
    # Incremental around the NULL equals the rebuild.
    cut = F.expr("TIMESTAMP_NTZ '2024-06-01 01:30:00'")
    merged = scd2_merge_batch(
        _scd2_build(df.filter(F.col("ts") <= cut)),
        df.filter(F.col("ts") > cut),
    )
    assert _canon(merged) == _canon(full)


def test_abc_two_phase_is_partition_count_invariant(spark, monkeypatch):
    """The ABC classification depends only on the (revenue DESC,
    partkey) total order — re-running with a radically different range
    partition count must produce identical rows (the offsets, not the
    partitioning, carry the global cumsum)."""
    from data_ingestion_worker_spark.operators import tpch_ext

    base = _canon(tpch_ext.abc_revenue_classes(spark, SF_DIR))
    monkeypatch.setattr(tpch_ext, "ABC_PARTITIONS", 3)
    assert _canon(tpch_ext.abc_revenue_classes(spark, SF_DIR)) == base


def test_asof_nearest_matches_pandas_merge_asof(spark, sf_dir):
    """direction='nearest' semantics recomputed with a plain-Python
    nearest scan; backward beats forward on exact |gap| ties."""
    from collections import defaultdict

    from data_ingestion_worker_spark.operators.temporal import (
        ASOF_TOLERANCE_S, asof_join_nearest,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_id: (r.purchase_event_id, r.gap_s)
           for r in asof_join_nearest(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "event_type").collect()
    purch: dict = defaultdict(dict)
    for r in ev:
        if r.event_type == "purchase":
            s = int(r.ts.timestamp())
            cur = purch[r.user_id].get(s)
            if cur is None or r.event_id > cur:
                purch[r.user_id][s] = r.event_id   # max id per (u, ts)
    n_matched = 0
    for r in ev:
        if r.event_type != "click":
            continue
        s = int(r.ts.timestamp())
        best = None
        for ps, pid in purch[r.user_id].items():
            gap = abs(s - ps)
            if gap > ASOF_TOLERANCE_S:
                continue
            key = (gap, 0 if ps <= s else 1, -pid)
            if best is None or key < best[0]:
                best = (key, pid, gap)
        if best is None:
            assert got[r.event_id] == (None, None), r.event_id
        else:
            assert got[r.event_id] == (best[1], best[2]), r.event_id
            n_matched += 1
    assert n_matched > 0


def test_seasonal_decompose_reconstructs_the_series(spark, sf_dir):
    """Additive-decomposition identity: on full-window days,
    trend + seasonal + remainder must reconstruct the observed count
    within quantization (three floor-4 readouts, each flooring down by
    < 1e-4, so 0 <= n - sum < 3e-4); edge days carry a NULL trend."""
    from data_ingestion_worker_spark.operators.events import (
        ev_seasonal_decompose,
    )

    rows = ev_seasonal_decompose(spark, sf_dir).collect()
    assert rows
    full = [r for r in rows if r["trend7"] is not None]
    assert full, "no full 7-day windows in the fixture - vacuous"
    for r in full:
        diff = r["n"] - (r["trend"] + r["seasonal"] + r["remainder"])
        assert -1e-9 <= diff < 3.0001e-4, r
        # trend7 is the raw integer 7-day window sum.
        assert r["trend"] == _math_floor4(r["trend7"] / 7.0)


def _math_floor4(x: float) -> float:
    import math

    return math.floor(x * 10000.0) / 10000.0


def _write_events(spark, tmp_path, rows):
    """(ts_day_offset, user_id, event_type) rows -> a tmp events table."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    data = [
        (i, base + _dt.timedelta(days=d, minutes=i % 60), u, et, 1.0, "{}")
        for i, (d, u, et) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_interrupted_ts_recovers_known_jump(spark, tmp_path):
    """On an exactly piecewise-linear daily series (pre: 10+2t, post:
    50+5t, 14 days, t0=6) ev_interrupted_ts must read back the exact
    slopes and the exact level jump at t0 — segmented OLS on noiseless
    data is an identity, so any deviation is a formula bug."""
    from data_ingestion_worker_spark.operators.events import (
        ev_interrupted_ts,
    )

    rows = []
    u = 0
    for t in range(14):
        y = 10 + 2 * t if t < 6 else 50 + 5 * t
        for _ in range(y):
            rows.append((t, u % 7, "a"))
            u += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in ev_interrupted_ts(spark, sf)
           .collect()}
    r = got["a"]
    assert (r["n_pre"], r["n_post"], r["t0"]) == (6, 8, 6)
    assert r["pre_slope"] == 2.0
    assert r["post_slope"] == 5.0
    assert r["slope_change"] == 3.0
    # fit at t0: pre 10+2*6=22, post 50+5*6=80 -> jump 58.
    assert r["level_change"] == 58.0


def test_logrank_matches_python_reference(spark, tmp_path):
    """ev_logrank_test must equal a from-scratch textbook Mantel-Cox
    computation (same lifetime/censoring conventions and the same
    micro quantization) on a fixture with controlled lifetimes: error
    cohort churns early, clean cohort lives long."""
    import math

    from data_ingestion_worker_spark.operators.events import (
        SURVIVAL_CENSOR_DAYS,
        ev_logrank_test,
    )

    # (user, lifetime_days, in_error_cohort); horizon pinned by the
    # longest-lived user (20), so lifetime <= 17 means death.
    spec = [(1, 2, True), (2, 4, True), (3, 6, True), (4, 20, True),
            (5, 8, False), (6, 10, False), (7, 12, False),
            (8, 20, False)]
    rows = []
    for u, life, err in spec:
        rows.append((0, u, "error" if err else "view"))
        rows.append((life, u, "view"))
    sf = _write_events(spark, tmp_path, rows)
    got = ev_logrank_test(spark, sf).collect()[0]

    horizon = max(life for _, life, _ in spec)
    marked = [(1 if err else 0, life,
               1 if horizon - life >= SURVIVAL_CENSOR_DAYS else 0)
              for _, life, err in spec]
    days = sorted({d for _, d, _ in marked})
    e1_micro = v_micro = deaths_err = deaths_all = 0
    for t in days:
        n = sum(1 for _, d, _ in marked if d >= t)
        n1 = sum(1 for g, d, _ in marked if d >= t and g)
        d_t = sum(1 for _, d, died in marked if d == t and died)
        d1_t = sum(1 for g, d, died in marked if d == t and died and g)
        deaths_all += d_t
        deaths_err += d1_t
        e1_micro += (1000000 * d_t * n1) // n
        if n > 1:
            v_micro += math.floor(
                float(d_t) * n1 * (n - n1) * (n - d_t)
                / (float(n) * n * (n - 1)) * 1000000.0)
    z = math.floor((1000000.0 * deaths_err - e1_micro)
                   / (1000.0 * math.sqrt(v_micro)) * 1000000.0) / 1e6
    assert (got["n_users"], got["n_err_users"]) == (8, 4)
    assert (got["deaths_all"], got["deaths_err"]) == (deaths_all,
                                                      deaths_err)
    assert (got["e1_micro"], got["v_micro"]) == (e1_micro, v_micro)
    assert got["z"] == z
    # Error cohort dies earlier than expected under H0 -> positive z.
    assert z > 0
