"""From-scratch behavioral contracts for the round-10 operators.

Oracle parity pins Spark == DuckDB; these tests pin that the shared
semantics are RIGHT, on synthetic fixtures engineered so the expected
answer is known in closed form (the r9 contract-test precedent).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type) -> events.parquet with
    the driver schema (value/props filled with constants)."""
    spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_page_hinkley_detects_shift_and_stays_quiet(spark, tmp_path):
    """An upward level shift must alarm; an exactly-constant daily
    series has every (x - running mean) term equal to ZERO (integer
    arithmetic), so ph_max is exactly 0."""
    from data_ingestion_worker_spark.operators.events import (
        ev_page_hinkley,
    )

    rows = []
    eid = 0
    base = datetime(2024, 1, 1, 6, 0, 0)
    for day in range(30):
        # 'shift': 100/day for 20 days, then 300/day.
        n_shift = 100 if day < 20 else 300
        for k in range(n_shift):
            eid += 1
            rows.append((eid, base + timedelta(days=day, seconds=k),
                         1, "shift"))
        # 'flat': exactly 100/day throughout.
        for k in range(100):
            eid += 1
            rows.append((eid, base + timedelta(days=day, seconds=k),
                         2, "flat"))
    _write_events(spark, str(tmp_path), rows)
    out = {r["event_type"]: r
           for r in ev_page_hinkley(spark, str(tmp_path)).collect()}
    assert out["flat"]["ph_max_micro"] == 0
    assert out["flat"]["alarm"] == 0
    assert out["shift"]["alarm"] == 1
    # 10 shifted days x ~(300 - running mean) >> the 50-unit lambda.
    assert out["shift"]["ph_max_micro"] > 1_000_000_000


def test_cmh_simpson_pattern(spark, tmp_path):
    """Within-day click rates identical morning vs afternoon but day
    mixes skewed: the MARGINAL table shows an association (morning
    0.40 vs afternoon ~0.23) while every stratum is exactly null —
    CMH must read 0 and the MH odds ratio must read exactly 1."""
    from data_ingestion_worker_spark.operators.events import (
        ev_cmh_test,
        ev_odds_ratio_mh,
    )

    # (day, morning?, clicks, non-clicks): rates 1/2 on day 1, 1/5 on
    # day 2, in BOTH halves of each day.
    spec = [
        (1, True, 20, 20), (1, False, 5, 5),
        (2, True, 4, 16), (2, False, 20, 80),
    ]
    rows = []
    eid = 0
    for day, morning, clicks, rest in spec:
        t0 = datetime(2024, 3, day, 8 if morning else 16, 0, 0)
        for k in range(clicks):
            eid += 1
            rows.append((eid, t0 + timedelta(seconds=k), 1, "click"))
        for k in range(rest):
            eid += 1
            rows.append((eid, t0 + timedelta(seconds=1000 + k),
                         1, "view"))
    _write_events(spark, str(tmp_path), rows)
    cmh = ev_cmh_test(spark, str(tmp_path)).collect()[0]
    assert cmh["sum_d_micro"] == 0          # every stratum exactly null
    assert cmh["cmh_milli"] == 0
    assert cmh["reject"] == 0
    orr = ev_odds_ratio_mh(spark, str(tmp_path)).collect()[0]
    assert orr["or_mh_ppm"] == 1_000_000    # exactly OR = 1


def test_reciprocity_extremes(spark, tmp_path):
    """A strictly one-way flow reads 0; a perfectly alternating flow
    (equal A->B and B->A volumes) reads exactly 1e6 ppm."""
    from data_ingestion_worker_spark.operators.graph import (
        graph_reciprocity,
    )

    t0 = datetime(2024, 5, 1, 12, 0, 0)
    # Users 1..10: one A->B hop each (one-way).  Users 11..20: A,B,A —
    # one A->B and one B->A each (perfectly reciprocal).
    one_way, recip = [], []
    eid = 0
    for u in range(1, 11):
        for j, ty in enumerate(["A", "B"]):
            eid += 1
            one_way.append((eid, t0 + timedelta(seconds=j), u, ty))
    for u in range(11, 21):
        for j, ty in enumerate(["A", "B", "A"]):
            eid += 1
            recip.append((eid, t0 + timedelta(seconds=j), u, ty))
    _write_events(spark, str(tmp_path), one_way)
    r = graph_reciprocity(spark, str(tmp_path)).collect()[0]
    assert (r["total_w"], r["reciprocal_w"], r["reciprocity_ppm"]) \
        == (10, 0, 0)
    _write_events(spark, str(tmp_path), recip)
    r = graph_reciprocity(spark, str(tmp_path)).collect()[0]
    assert (r["total_w"], r["reciprocal_w"], r["reciprocity_ppm"]) \
        == (20, 20, 1_000_000)


def test_heldout_xent_fully_unseen(spark, tmp_path):
    """A holdout document whose bigrams the training split never saw
    must score exactly -log2(1/v) per bigram = 10000*log2(v) quantized
    units (the add-one floor for unseen context and pair)."""
    from data_ingestion_worker_spark.operators.curation import (
        _split_bucket,
    )
    from data_ingestion_worker_spark.operators.text import (
        corpus_heldout_xent,
    )
    from pyspark.sql import functions as F

    # The split is hash-keyed on doc_id: probe for one train id and
    # one holdout id instead of assuming any.
    probe = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        _split_bucket(F.col("id")).alias("b")).collect()
    train_id = next(r["doc_id"] for r in probe if r["b"] < 96)
    held_id = next(r["doc_id"] for r in probe if r["b"] >= 96)
    texts = [(train_id, "xx yy xx yy"), (held_id, "pp qq pp")]
    spark.createDataFrame(
        [(i, t, "s", len(t), len(t.split())) for i, t in texts],
        "doc_id long, text string, source string, n_chars long, "
        "n_tokens long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = corpus_heldout_xent(spark, str(tmp_path)).collect()
    assert len(out) == 1
    row = out[0]
    # Train vocab v = {xx, yy} -> unseen term = floor(1e4*log2(0+2)) =
    # 10000 exactly, for each of the 2 holdout bigrams.
    assert row["n_bigrams"] == 2
    assert row["xent_q"] == 20000
    assert row["mean_xent_q"] == 10000
