"""Event-time streaming: watermarked windows, sessions, custom state.

Each test drives a real streaming query (file JSON source ->
foreachBatch parquet sink) with availableNow drains; the multi-drain
tests prove that state and watermarks survive a query restart via the
checkpoint — the T2/T5 exactly-once story on the data plane.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_worker_spark.streaming.windows import (
    EVENT_SCHEMA,
    running_user_totals,
    session_aggregates,
    windowed_counts,
)


def _write_events(inbox: str, name: str, rows: list[dict]) -> None:
    os.makedirs(inbox, exist_ok=True)
    tmp = os.path.join(inbox, f".{name}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(inbox, name))


def _drain(spark, inbox: str, checkpoint: str, transform, out_dir: str,
           output_mode: str) -> None:
    """Run one availableNow drain; emitted rows append to ``out_dir``.

    foreachBatch (not the memory sink) so the checkpoint supports
    restart-and-resume across drains.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).json(inbox)
    )
    q = (
        transform(stream).writeStream
        .foreachBatch(
            lambda b, _e: b.write.mode("append").parquet(out_dir)
        )
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _rows(spark, out_dir: str) -> list:
    if not os.path.isdir(out_dir):
        return []
    try:
        return spark.read.parquet(out_dir).collect()
    except Exception:
        return []


def _ev(eid, ts, uid, etype, value):
    return {"event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": value}


def test_windowed_counts_with_watermark(spark, tmp_path):
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        _ev(1, "2026-01-01 10:05:00", 1, "click", 1.0),
        _ev(2, "2026-01-01 10:45:00", 1, "click", 2.0),
        _ev(3, "2026-01-01 11:10:00", 2, "view", 4.0),
    ])
    _drain(spark, inbox, ckpt, windowed_counts, out, "append")
    # Watermark = max(ts) - 2h = 09:10 -> no window is closed yet; append
    # mode emits nothing.
    assert len(_rows(spark, out)) == 0

    # Second drain: an event at 14:00 advances the watermark to 12:00
    # (watermarks move BETWEEN batches), closing the 10:00 and 11:00
    # windows.
    _write_events(inbox, "b2.json", [
        _ev(4, "2026-01-01 14:00:00", 1, "click", 8.0),
    ])
    _drain(spark, inbox, ckpt, windowed_counts, out, "append")
    # Third drain: a late event behind the 12:00 watermark must be
    # dropped, not resurrect the already-emitted 10:00 window.
    _write_events(inbox, "b3.json", [
        _ev(5, "2026-01-01 10:20:00", 1, "click", 100.0),  # too late
    ])
    _drain(spark, inbox, ckpt, windowed_counts, out, "append")
    all_rows = _rows(spark, out)
    rows = {(r["window_start"].hour, r["event_type"]): r for r in all_rows}
    assert len(all_rows) == 2                            # each window once
    assert rows[(10, "click")]["n_events"] == 2          # late row dropped
    assert rows[(10, "click")]["total_value"] == 3.0
    assert rows[(11, "view")]["n_events"] == 1
    assert (14, "click") not in rows                     # still open


def test_session_aggregates(spark, tmp_path):
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        _ev(1, "2026-01-01 10:00:00", 1, "click", 1.0),
        _ev(2, "2026-01-01 10:10:00", 1, "click", 2.0),   # same session
        _ev(3, "2026-01-01 12:00:00", 1, "click", 4.0),   # new session
    ])
    _drain(spark, inbox, ckpt, session_aggregates, out, "append")
    # Close sessions by advancing the watermark far past them.
    _write_events(inbox, "b2.json", [
        _ev(4, "2026-01-02 09:00:00", 2, "view", 0.0),
    ])
    _drain(spark, inbox, ckpt, session_aggregates, out, "append")
    sessions = sorted(
        [(r["user_id"], r["n_events"], r["total_value"])
         for r in _rows(spark, out)]
    )
    assert (1, 2, 3.0) in sessions      # merged 10:00+10:10
    assert (1, 1, 4.0) in sessions      # separate 12:00 session


def test_running_user_totals_state_survives_restart(spark, tmp_path):
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        _ev(1, "2026-01-01 10:00:00", 1, "click", 1.0),
        _ev(2, "2026-01-01 10:01:00", 1, "click", 2.0),
        _ev(3, "2026-01-01 10:02:00", 2, "view", 5.0),
    ])
    _drain(spark, inbox, ckpt, running_user_totals, out, "update")
    first = {r["user_id"]: r for r in _rows(spark, out)}
    assert first[1]["n_events"] == 2 and first[1]["total_value"] == 3.0
    assert first[2]["n_events"] == 1

    # New query instance, same checkpoint: per-key state must resume.
    out2 = str(tmp_path / "out2")
    _write_events(inbox, "b2.json", [
        _ev(4, "2026-01-01 10:05:00", 1, "click", 10.0),
    ])
    _drain(spark, inbox, ckpt, running_user_totals, out2, "update")
    second = {r["user_id"]: r for r in _rows(spark, out2)}
    assert second[1]["n_events"] == 3           # 2 (restored) + 1
    assert second[1]["total_value"] == 13.0
    assert 2 not in second                      # untouched key not re-emitted


def test_windowed_counts_batch_parity(spark, sf_dir):
    """The same plan runs in batch mode over the events table."""
    # ``ts`` is already a timestamp in the driver parquet — pass through.
    events = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id", "ts", "user_id", "event_type", "value",
    )
    out = windowed_counts(events)
    total = out.agg({"n_events": "sum"}).collect()[0][0]
    assert total == events.count()


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchase->click attribution as a watermarked stream-stream join:
    only clicks within 30 min after a same-user purchase match."""
    from data_ingestion_worker_spark.streaming.windows import (
        attribute_clicks,
    )

    in_c, in_p = str(tmp_path / "clicks"), str(tmp_path / "purch")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_events(in_p, "p1.json", [
        _ev(100, "2026-01-01 10:00:00", 1, "purchase", 9.99),
        _ev(101, "2026-01-01 12:00:00", 2, "purchase", 5.00),
    ])
    _write_events(in_c, "c1.json", [
        _ev(200, "2026-01-01 10:10:00", 1, "click", 0.0),   # attributed
        _ev(201, "2026-01-01 10:45:00", 1, "click", 0.0),   # too late
        _ev(202, "2026-01-01 12:05:00", 3, "click", 0.0),   # wrong user
    ])
    clicks = spark.readStream.schema(EVENT_SCHEMA).json(in_c)
    purchases = spark.readStream.schema(EVENT_SCHEMA).json(in_p)
    q = (
        attribute_clicks(clicks, purchases).writeStream
        .foreachBatch(lambda b, _e: b.write.mode("append").parquet(out))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = _rows(spark, out)
    assert [(r["purchase_id"], r["click_id"]) for r in rows] == [(100, 200)]
    assert rows[0]["purchase_value"] == 9.99


def test_stream_dedup_exact(spark, tmp_path):
    """Duplicate event_ids across microbatches (a redelivery) are
    dropped while state stays within the watermark horizon."""
    from data_ingestion_worker_spark.streaming.windows import (
        stream_dedup_exact,
    )

    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        _ev(1, "2026-01-01 10:00:00", 1, "click", 1.0),
        _ev(2, "2026-01-01 10:01:00", 1, "click", 2.0),
        _ev(1, "2026-01-01 10:00:00", 1, "click", 1.0),   # in-batch dup
    ])
    _drain(spark, inbox, ckpt, stream_dedup_exact, out, "append")
    _write_events(inbox, "b2.json", [
        _ev(2, "2026-01-01 10:01:00", 1, "click", 2.0),   # replayed dup
        _ev(3, "2026-01-01 10:05:00", 2, "view", 5.0),    # new
    ])
    _drain(spark, inbox, ckpt, stream_dedup_exact, out, "append")
    ids = sorted(r["event_id"] for r in _rows(spark, out))
    assert ids == [1, 2, 3]


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: each microbatch is enriched against the
    static dimension with a broadcast join, statelessly (no watermark
    required, no state store directory growth)."""
    from data_ingestion_worker_spark.streaming.windows import (
        enrich_with_dimension,
    )

    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id bigint, tier string")
    _write_events(inbox, "b1.json", [
        _ev(1, "2026-01-01 10:00:00", 1, "click", 1.0),
        _ev(2, "2026-01-01 10:01:00", 2, "view", 2.0),
        _ev(3, "2026-01-01 10:02:00", 9, "view", 3.0),   # no dim row
    ])
    _drain(spark, inbox, ckpt,
           lambda s: enrich_with_dimension(s, dim), out, "append")
    rows = {r["event_id"]: r["tier"] for r in _rows(spark, out)}
    assert rows == {1: "gold", 2: "silver"}              # inner join drops 9


def test_dedup_on_arrival_drops_corpus_and_instream_dups(spark, tmp_path):
    """Streaming incremental-ingest dedup: a doc already in the corpus is
    dropped; identical in-stream docs reduce to the first; dedup state
    survives a restart (a redelivered duplicate in a later drain stays
    dropped)."""
    from data_ingestion_worker_spark.functions.text import fingerprint
    from data_ingestion_worker_spark.streaming.windows import (
        dedup_on_arrival,
    )
    from pyspark.sql import functions as F

    DOC_SCHEMA = "doc_id bigint, ts timestamp, text string"
    corpus = spark.createDataFrame(
        [("already ingested body",)], "text string"
    ).select(fingerprint(F.col("text")).alias("fp"))

    inbox = str(tmp_path / "in")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        {"doc_id": 1, "ts": "2026-01-01 10:00:00",
         "text": "already ingested body"},          # corpus dup
        {"doc_id": 2, "ts": "2026-01-01 10:01:00",
         "text": "fresh document two"},             # kept
        {"doc_id": 3, "ts": "2026-01-01 10:02:00",
         "text": "fresh document two"},             # in-stream dup of 2
        {"doc_id": 4, "ts": "2026-01-01 10:03:00",
         "text": "fresh document four"},            # kept
    ])

    def drain(batch_name_unused=None):
        stream = spark.readStream.schema(DOC_SCHEMA).json(inbox)
        q = (
            dedup_on_arrival(stream, corpus).writeStream
            .foreachBatch(
                lambda b, _e: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(r["doc_id"] for r in _rows(spark, out)) == [2, 4]

    # Restart with a redelivery of doc 2's content inside the watermark:
    # the checkpointed dedup state must still drop it.
    _write_events(inbox, "b2.json", [
        {"doc_id": 5, "ts": "2026-01-01 10:10:00",
         "text": "fresh document two"},             # late duplicate
        {"doc_id": 6, "ts": "2026-01-01 10:11:00",
         "text": "brand new six"},                  # kept
    ])
    drain()
    assert sorted(r["doc_id"] for r in _rows(spark, out)) == [2, 4, 6]


def test_cusum_alarms_stream_matches_recursion_across_restart(
    spark, tmp_path
):
    """The streaming CUSUM must equal the textbook recursion computed in
    Python over the full series, with the prefix/min state surviving a
    drain boundary; a zero-variance type is filtered like the batch
    twin."""
    from data_ingestion_worker_spark.streaming.windows import (
        HOURLY_SCHEMA,
        cusum_alarms_stream,
    )

    series = {"click": [5, 5, 12, 12, 12], "view": [3, 3, 3, 3, 3]}
    hours = [f"2026-01-01 {h:02d}:00:00" for h in range(10, 15)]
    base_rows = []
    for et, xs in series.items():
        n, sx = len(xs), sum(xs)
        sxx = sum(x * x for x in xs)
        base_rows.append((et, n, sx, sxx))
    baseline = spark.createDataFrame(
        base_rows, "event_type string, n bigint, sx bigint, sxx bigint")

    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_hourly(name, idxs):
        rows = [{"event_type": et, "hour": hours[i], "c": series[et][i]}
                for et in series for i in idxs]
        _write_events(inbox, name, rows)

    def drain(out_dir):
        stream = spark.readStream.schema(HOURLY_SCHEMA).json(inbox)
        q = (cusum_alarms_stream(stream, baseline).writeStream
             .foreachBatch(
                 lambda b, _e: b.write.mode("append").parquet(out_dir))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    write_hourly("b1.json", [0, 1, 2])
    drain(out)
    write_hourly("b2.json", [3, 4])   # state must carry p/minp across
    drain(out)

    got = {(r.event_type, r.hour.hour): r for r in _rows(spark, out)}
    assert not any(et == "view" for et, _ in got)   # zero variance
    import math
    xs = series["click"]
    n, sx = len(xs), sum(xs)
    sxx = sum(x * x for x in xs)
    sigma = math.sqrt(n * sxx - sx * sx)
    s = 0
    for i, c in enumerate(xs):
        s = max(0, s + n * c - sx)
        r = got[("click", 10 + i)]
        assert r.cusum_scaled == s, i
        assert r.hour_count == c
        assert r.alarm == (s > 3.0 * sigma)


def test_streaming_rollup_incremental_and_exactly_once(spark, tmp_path):
    """RollupSink maintains a grouped count/sum rollup per microbatch
    (streaming materialized view): across a restart the rollup equals
    the full recompute over everything ingested, and a replayed batch id
    is a no-op (at-least-once delivery -> exactly-once contents)."""
    from data_ingestion_worker_spark.control.store import compute_aggregate
    from data_ingestion_worker_spark.streaming.rollup import RollupSink

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    sink = RollupSink(spark, str(tmp_path / "rollup"),
                      keys=["event_type"], sum_cols=["value_cents"])

    def to_cents(stream):
        return stream.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )

    def drain():
        q = (
            to_cents(spark.readStream.schema(EVENT_SCHEMA).json(inbox))
            .writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(inbox, "a.json", [
        _ev(1, "2024-01-01T00:00:01", 1, "view", 1.25),
        _ev(2, "2024-01-01T00:00:02", 1, "view", 2.50),
        _ev(3, "2024-01-01T00:00:03", 2, "cart", 10.00),
    ])
    drain()
    _write_events(inbox, "b.json", [
        _ev(4, "2024-01-01T00:10:00", 3, "view", 0.25),
        _ev(5, "2024-01-01T00:11:00", 3, "purchase", 99.99),
    ])
    drain()   # restart: new query, same checkpoint

    got = {(r.event_type, r.n_rows, r.sum_value_cents)
           for r in sink.read().collect()}
    everything = spark.read.schema(EVENT_SCHEMA).json(inbox)
    want = {(r.event_type, r.n_rows, r.sum_value_cents)
            for r in compute_aggregate(
                to_cents(everything), ["event_type"], ["value_cents"]
            ).collect()}
    assert got == want == {("view", 3, 400), ("cart", 1, 1000),
                           ("purchase", 1, 9999)}
    # replayed epoch: same (or older) batch_id must change nothing
    last = sink.last_batch_id()
    replay = to_cents(everything)
    sink.apply(replay, last)
    assert {(r.event_type, r.n_rows, r.sum_value_cents)
            for r in sink.read().collect()} == want
    assert sink.last_batch_id() == last
    # disk footprint is bounded: current + one superseded snapshot
    versions = [d for d in os.listdir(sink.path) if d.startswith("v-")]
    assert len(versions) <= 2
    # a corrupt pointer must raise loudly, never reseed an empty rollup
    with open(sink._pointer(), "w") as f:
        f.write("{truncated")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sink.read()


def test_streaming_scd2_dimension_equals_batch_rebuild(spark, tmp_path):
    """Scd2Sink maintains the SCD2 dimension per microbatch; across a
    restart it equals the full batch rebuild over everything ingested,
    a replayed batch id is a no-op, and the disk footprint stays at two
    snapshots."""
    from data_ingestion_worker_spark.operators.temporal import _scd2_build
    from data_ingestion_worker_spark.streaming.rollup import Scd2Sink

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    sink = Scd2Sink(spark, str(tmp_path / "dim"))

    def drain():
        q = (
            spark.readStream.schema(EVENT_SCHEMA).json(inbox)
            .writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # Batch 1: user 1 flips view->cart (2 intervals), user 2 stays view.
    _write_events(inbox, "a.json", [
        _ev(1, "2024-01-01T00:00:01", 1, "view", 0.0),
        _ev(2, "2024-01-01T00:00:02", 1, "cart", 0.0),
        _ev(3, "2024-01-01T00:00:03", 2, "view", 0.0),
    ])
    drain()
    # Batch 2 (restart): user 1 repeats cart (no-op), user 2 flips to
    # purchase, user 3 appears.
    _write_events(inbox, "b.json", [
        _ev(4, "2024-01-01T00:10:00", 1, "cart", 0.0),
        _ev(5, "2024-01-01T00:11:00", 2, "purchase", 0.0),
        _ev(6, "2024-01-01T00:12:00", 3, "view", 0.0),
    ])
    drain()

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    everything = spark.read.schema(EVENT_SCHEMA).json(inbox)
    want = canon(_scd2_build(everything))
    assert canon(sink.read()) == want
    # Sanity on the shape itself: 2 intervals for user 1, 2 for user 2,
    # 1 for user 3; exactly one open interval per user.
    rows = sink.read().collect()
    per_user = {u: sorted(r.version for r in rows if r.user_id == u)
                for u in (1, 2, 3)}
    assert per_user == {1: [1, 2], 2: [1, 2], 3: [1]}
    assert sum(r.is_current for r in rows) == 3

    # replayed epoch: same batch_id must change nothing
    last = sink.last_batch_id()
    sink.apply(everything, last)
    assert canon(sink.read()) == want
    assert sink.last_batch_id() == last
    versions = [d for d in os.listdir(sink.path) if d.startswith("v-")]
    assert len(versions) <= 2


def test_streaming_scd2_ignores_malformed_state_records(spark, tmp_path):
    """A stream record whose event_type parses to NULL (malformed JSON
    field) must be dropped as a non-observation — the maintained
    dimension stays equal to the rebuild over the well-formed records
    (row-level error isolation on the dimension path)."""
    from data_ingestion_worker_spark.operators.temporal import _scd2_build
    from data_ingestion_worker_spark.streaming.rollup import Scd2Sink

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inbox)
    sink = Scd2Sink(spark, str(tmp_path / "dim"))

    _write_events(inbox, "a.json", [
        _ev(1, "2024-01-01T00:00:01", 1, "view", 0.0),
        {"event_id": 2, "ts": "2024-01-01T00:00:02", "user_id": 1,
         "value": 0.0},                      # missing event_type -> NULL
        _ev(3, "2024-01-01T00:00:03", 1, "view", 0.0),
        _ev(4, "2024-01-01T00:00:04", 1, "cart", 0.0),
    ])
    q = (
        spark.readStream.schema(EVENT_SCHEMA).json(inbox)
        .writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = sorted(tuple(r) for r in sink.read().collect())
    clean = spark.read.schema(EVENT_SCHEMA).json(inbox) \
        .filter(F.col("event_type").isNotNull())
    assert rows == sorted(tuple(r) for r in _scd2_build(clean).collect())
    # The NULL record neither created an interval nor broke the 'view'
    # run: exactly view -> cart for user 1.
    states = [(r.state, r.version) for r in sorted(
        sink.read().collect(), key=lambda r: r.version)]
    assert states == [("view", 1), ("cart", 2)]


def test_psi_stream_matches_batch_terms(spark, tmp_path):
    """Streaming PSI: bucket counts finalized per day must equal a
    batch recompute over the same rows, and psi_report's terms must
    equal the batch-twin formula applied to those counts (one shared
    fragment — verified here end to end through a real file stream)."""
    import math

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.stats import (
        PSI_BUCKETS, psi_cuts, _PSI_BUCKET,
    )
    from data_ingestion_worker_spark.streaming.windows import (
        psi_buckets_stream, psi_report,
    )

    # Reference: cents 100..10000 in steps of 100 -> clean deciles.
    ref = spark.createDataFrame(
        [(i * 100,) for i in range(1, 101)], "cents bigint"
    )
    cuts = psi_cuts(ref)
    ref_dist = (
        ref.crossJoin(F.broadcast(cuts))
        .select(F.expr(_PSI_BUCKET).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_ref"))
        .crossJoin(F.broadcast(
            ref.agg(F.count(F.lit(1)).alias("tr"))))
    )
    assert ref_dist.count() == PSI_BUCKETS

    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # Day 1: drifted low (values 1.00-20.00); day 2: uniform-ish.
    day1 = [_ev(i, f"2026-01-01 0{i % 10}:00:0{i % 6}", i, "click",
                float(i))
            for i in range(1, 21)]
    day2 = [_ev(100 + i, f"2026-01-02 0{i % 10}:30:0{i % 6}", i, "view",
                float(i * 5))
            for i in range(1, 21)]
    _write_events(inbox, "b1.json", day1 + day2)
    _drain(spark, inbox, ckpt,
           lambda s: psi_buckets_stream(s, cuts), out, "append")
    # advance the watermark past both days to finalize their windows
    _write_events(inbox, "b2.json",
                  [_ev(999, "2026-01-05 12:00:00", 1, "click", 50.0)])
    _drain(spark, inbox, ckpt,
           lambda s: psi_buckets_stream(s, cuts), out, "append")

    counts = spark.read.parquet(out)
    got_counts = {(r.window_start.day, r.bucket): r.n_cur
                  for r in counts.collect()}
    # batch recompute of the same bucket assignment
    cut_vals = cuts.collect()[0]
    cents = {1: [int(v * 100) for v in range(1, 21)],
             2: [int(v * 5 * 100) for v in range(1, 21)]}

    def bucket(c):
        return 1 + sum(1 for k in range(1, PSI_BUCKETS)
                       if c > cut_vals[f"c{k}"])

    for day, vals in cents.items():
        for b in range(1, PSI_BUCKETS + 1):
            expect = sum(1 for c in vals if bucket(c) == b)
            assert got_counts.get((day, b), 0) == expect, (day, b)

    report = psi_report(counts, ref_dist)
    rows = {(r.window_start.day, r.bucket): r for r in report.collect()}
    assert len(rows) == 2 * PSI_BUCKETS  # dense: every bucket, both days
    for (day, b), r in rows.items():
        p = r.n_ref / 100 if r.n_ref else 1e-6
        q = r.n_cur / 20 if r.n_cur else 1e-6
        assert r.psi_term_micro == math.floor(
            1_000_000 * (q - p) * math.log(q / p)), (day, b)
    # day 1 is heavily drifted into bucket 1-2 -> its PSI must dominate
    psi = {d: sum(r.psi_term_micro for (dd, _), r in rows.items()
                  if dd == d) for d in (1, 2)}
    assert psi[1] > psi[2] >= 0 or psi[1] > 0


def test_psi_report_surfaces_zero_reference_buckets(spark):
    """A tied reference leaves interior deciles empty; current mass
    landing there must still appear (n_ref=0, 1e-6 floor term), with
    bucket counts summing to tc — the silent-drop regression guard."""
    import math

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.stats import (
        PSI_BUCKETS, psi_cuts, _PSI_BUCKET,
    )
    from data_ingestion_worker_spark.streaming.windows import psi_report

    # 90% zeros + a few large values: cuts c1..c8 = 0, so reference
    # rows occupy only the extreme buckets.
    ref = spark.createDataFrame(
        [(0,)] * 90 + [(1000,)] * 10, "cents bigint"
    )
    cuts = psi_cuts(ref)
    ref_dist = (
        ref.crossJoin(F.broadcast(cuts))
        .select(F.expr(_PSI_BUCKET).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_ref"))
        .crossJoin(F.broadcast(ref.agg(F.count(F.lit(1)).alias("tr"))))
    )
    assert ref_dist.count() < PSI_BUCKETS   # interior buckets ARE empty
    # one finalized window whose rows land in an empty-reference bucket
    import datetime as dt
    w0 = dt.datetime(2026, 1, 1)
    counts = spark.createDataFrame(
        [(w0, 9, 5), (w0, 10, 15)],
        "window_start timestamp, bucket int, n_cur bigint",
    )
    rows = {r.bucket: r for r in psi_report(counts, ref_dist).collect()}
    assert set(rows) == set(range(1, PSI_BUCKETS + 1))
    assert sum(r.n_cur for r in rows.values()) == 20
    nine = rows[9]
    assert (nine.n_ref, nine.n_cur) == (0, 5)
    q = 5 / 20
    assert nine.psi_term_micro == math.floor(
        1_000_000 * (q - 1e-6) * math.log(q / 1e-6))


def test_cms_stream_matches_batch_registers(spark, tmp_path):
    """Streaming CMS: finalized per-day registers must equal a batch
    recompute over the same rows (shared hash grid), probes must match
    a python min-over-registers, and every estimate must over-estimate
    one-sidedly (CMS contract) — end to end through a real file stream."""
    import json
    import os

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.functions.hashing import hash64
    from data_ingestion_worker_spark.functions.text import tokens
    from data_ingestion_worker_spark.operators.sketches import CMS_D
    from data_ingestion_worker_spark.streaming.windows import (
        cms_probe, cms_registers_stream,
    )

    doc_schema = "doc_id bigint, ts timestamp, text string"
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(inbox, exist_ok=True)

    day1 = [{"doc_id": i, "ts": f"2026-01-01 0{i % 10}:00:00",
             "text": "spark join " + ("merge " * (i % 3))}
            for i in range(1, 21)]
    day2 = [{"doc_id": 100 + i, "ts": f"2026-01-02 0{i % 10}:00:00",
             "text": "scan filter spark"}
            for i in range(1, 11)]

    def write(name, rows):
        with open(os.path.join(inbox, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain():
        q = (
            cms_registers_stream(
                spark.readStream.schema(doc_schema).json(inbox))
            .writeStream
            .foreachBatch(
                lambda b, _e: b.write.mode("append").parquet(out))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write("b1.json", day1 + day2)
    drain()
    # advance the watermark past both days to finalize their windows
    write("b2.json", [{"doc_id": 999, "ts": "2026-01-05 12:00:00",
                       "text": "tail"}])
    drain()

    regs = spark.read.parquet(out)
    got = {(r.window_start.day, r.j, r.bucket): r.cnt
           for r in regs.collect()}

    # batch recompute of the same grid over the same rows
    batch = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["text"]) for r in day1 + day2],
        "doc_id bigint, ts string, text string")
    from data_ingestion_worker_spark.operators.sketches import CMS_W
    bucket = (hash64(F.concat(F.col("j").cast("string"), F.lit(":"),
                              F.col("token"))) % CMS_W)
    expect = {(r.day, r.j, r.bucket): r.cnt for r in (
        batch.select(F.to_timestamp("ts").alias("ts"),
                     F.explode(tokens(F.col("text"))).alias("token"))
        .select(F.dayofmonth("ts").alias("day"), "token",
                F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1)))
                .alias("j"))
        .select("day", "j", bucket.alias("bucket"))
        .groupBy("day", "j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .collect())}
    assert got == expect

    # probe: estimates = python min over the register table; one-sided
    probe = cms_probe(regs, spark.createDataFrame(
        [("spark",), ("merge",), ("absent",)], "token string"))
    est = {(r.window_start.day, r.token): r.cms_est
           for r in probe.collect()}
    exact = {(1, "spark"): 20, (1, "merge"): sum(i % 3 for i in
                                                 range(1, 21)),
             (2, "spark"): 10, (2, "merge"): 0,
             (1, "absent"): 0, (2, "absent"): 0}
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert est[k] >= e, k


def test_hist_quantile_stream_matches_batch_readout(spark, tmp_path):
    """Streaming histogram-quantile twin: finalized per-window registers
    must equal a batch recompute of the same binning, and the report's
    estimates must equal the batch sketch's midpoint readout formula —
    one sketch definition across planes, verified through a real file
    stream."""
    import math

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.stats import HIST_BINS
    from data_ingestion_worker_spark.streaming.windows import (
        hist_quantile_report,
        hist_registers_stream,
    )

    bounds = spark.createDataFrame([(0.0, 128.0)], "lo double, hi double")
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # Day 1: values 1..40; day 2: 60..99 plus out-of-range 500 (clamps
    # to the top bin) and -3 (clamps to bin 0).
    day1 = [_ev(i, f"2026-02-01 0{i % 10}:00:0{i % 6}", i, "click",
                float(i)) for i in range(1, 41)]
    day2 = [_ev(100 + i, f"2026-02-02 0{i % 10}:30:0{i % 6}", i, "view",
                float(60 + i)) for i in range(40)]
    day2 += [_ev(900, "2026-02-02 09:00:00", 1, "click", 500.0),
             _ev(901, "2026-02-02 09:00:01", 1, "click", -3.0)]
    _write_events(inbox, "b1.json", day1 + day2)
    _drain(spark, inbox, ckpt,
           lambda s: hist_registers_stream(s, bounds), out, "append")
    _write_events(inbox, "b2.json",
                  [_ev(999, "2026-02-05 12:00:00", 1, "click", 1.0)])
    _drain(spark, inbox, ckpt,
           lambda s: hist_registers_stream(s, bounds), out, "append")

    counts = spark.read.parquet(out)
    got = {(r.window_start.day, r.bin): r.n for r in counts.collect()}

    def pybin(v):
        return max(0, min(HIST_BINS - 1,
                          math.floor((v - 0.0) / 128.0 * HIST_BINS)))

    vals = {1: [float(i) for i in range(1, 41)],
            2: [float(60 + i) for i in range(40)] + [500.0, -3.0]}
    for day, vs in vals.items():
        for b in range(HIST_BINS):
            expect = sum(1 for v in vs if pybin(v) == b)
            assert got.get((day, b), 0) == expect, (day, b)

    report = hist_quantile_report(counts, bounds)
    rows = {(r.window_start.day, r.pct): r.est_value
            for r in report.collect()}
    for day, vs in vals.items():
        n = len(vs)
        bins = sorted(pybin(v) for v in vs)
        for pct, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # first bin whose cumulative count reaches p*n
            cum, qbin = 0, None
            for b in range(HIST_BINS):
                cum += sum(1 for x in bins if x == b)
                if cum >= p * n:
                    qbin = b
                    break
            est = 0.0 + (qbin + 0.5) * 128.0 / HIST_BINS
            assert rows[(day, pct)] == math.floor(est * 10000.0) / 10000.0


def test_nb_score_stream_matches_batch_classifier(spark, tmp_path):
    """Streaming NB gate parity: documents scored on arrival under the
    batch-trained model must reproduce the batch classifier's llr_q
    bit-for-bit once their window closes (shared-model contract)."""
    from data_ingestion_worker_spark.operators.selection import (
        doc_quality_classifier,
        nb_token_model,
    )
    from data_ingestion_worker_spark.streaming.windows import (
        nb_score_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, model, totals = nb_token_model(docs)
    batch = {r.doc_id: r for r in
             doc_quality_classifier(spark, sf_dir).collect()}

    sample = [r for r in docs.limit(12).collect()
              if r.text and r.text.strip()]
    assert len(sample) >= 8
    inbox, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(inbox, "b1.json", [
        {"doc_id": int(r.doc_id), "ts": "2026-01-01 10:00:00",
         "text": r.text}
        for r in sample
    ])
    DOC_SCHEMA = "doc_id bigint, ts timestamp, text string"

    def drain():
        stream = spark.readStream.schema(DOC_SCHEMA).json(inbox)
        q = (
            nb_score_stream(stream, model, totals).writeStream
            .foreachBatch(
                lambda b, _e: b.write.mode("append").parquet(out)
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert _rows(spark, out) == []        # window still open

    # A next-day doc advances the watermark past the first window.
    _write_events(inbox, "b2.json", [
        {"doc_id": 999_999, "ts": "2026-01-03 10:00:00",
         "text": "watermark advancer"},
    ])
    drain()
    emitted = {r["doc_id"]: r for r in _rows(spark, out)}
    assert set(emitted) == {int(r.doc_id) for r in sample}
    for r in sample:
        got, want = emitted[int(r.doc_id)], batch[r.doc_id]
        assert got["llr_q"] == want.llr_q
        assert got["n_tokens"] == want.n_tokens
        assert got["pred_ref"] == want.pred_ref
