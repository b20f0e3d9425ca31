"""Event-time streaming operators: watermarked windows + custom state.

The reference's stream is a *control* stream (one SQS message per job,
src/consumer.py:55-111) with no event-time semantics at all (SURVEY.md
§2.7).  A training-data pipeline also needs the *data*-plane streaming
repertoire; this module provides it over the ``events`` shape
(event_id, ts, user_id, event_type, value):

- ``windowed_counts``   — tumbling event-time window + watermark: the
  canonical late-data-tolerant aggregation.  Append mode emits a window
  only once the watermark passes its end — exactly-once window results
  downstream.
- ``session_aggregates`` — native session windows (``F.session_window``):
  gap-based sessionization as a first-class streaming aggregation (state
  store managed by Spark, mergeable across microbatches).
- ``running_user_totals`` — ``applyInPandasWithState``: the escape hatch
  for stateful logic Spark has no built-in for.  State is per-key,
  Arrow-batched, checkpointed with the query — a crash replays the
  microbatch and lands in the same state (T2/T5 semantics, but for data
  streams).

Scale notes: all three shuffle once on their grouping key; state-store
size is bounded by (keys x state row), not by stream length; watermarks
bound how long window state is retained.  At 1000 executors the state
store partitions with the shuffle — nothing here is driver-resident.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time counts/sums per (window, event_type).

    Works identically on batch and streaming inputs; on a stream the
    watermark bounds state retention and late-data acceptance.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)"))
             .cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user (native session_window aggregation)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,2)"))
             .cast("double").alias("total_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id", "n_events", "total_value",
        )
    )


def stream_dedup_exact(events: DataFrame, keys: list[str] | None = None,
                       watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by the
    watermark horizon — duplicates arriving within the lateness window
    are dropped, state older than it is evicted.  This is the streaming
    face of the batch dedup ladder (dedup_exact): same identity-key
    semantics, bounded memory at any stream length.
    """
    key_cols = keys or ["event_id"]
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def dedup_on_arrival(docs: DataFrame, corpus_fps: DataFrame,
                     watermark: str = "2 hours") -> DataFrame:
    """Streaming incremental-ingest dedup — the streaming face of
    ``operators.dedup.dedup_incremental``.

    Arriving documents are dropped when their content fingerprint
    already exists in the ingested corpus (stream-static left-anti
    join: stateless, no watermark needed, the static side is just the
    corpus fingerprint index), then in-stream duplicates are reduced to
    their first occurrence with ``dropDuplicatesWithinWatermark`` —
    dedup state bounded by the lateness horizon, exactly like
    :func:`stream_dedup_exact` but keyed on content, not event id.

    ``docs`` needs ``(ts timestamp, text string, ...)``; ``corpus_fps``
    is a static ``(fp string)`` relation (at scale: the pre-computed,
    bucketed fingerprint index the batch operator also joins against).
    """
    from ..functions.text import fingerprint

    with_fp = docs.withColumn("fp", fingerprint(F.col("text")))
    fresh = with_fp.join(corpus_fps, "fp", "left_anti")
    return (
        fresh.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def psi_buckets_stream(events: DataFrame, ref_cuts: DataFrame,
                       window: str = "1 day",
                       watermark: str = "2 hours") -> DataFrame:
    """Streaming half of the PSI drift monitor — the on-arrival face of
    ``operators.stats.stats_psi_drift``.

    Every arriving event is assigned to its *reference* decile via the
    broadcast one-row cut frame (``operators.stats.psi_cuts`` — the
    same boundaries as the batch twin, so drift numbers are comparable
    across both planes), then finalized per-(window, bucket) counts are
    emitted in append mode once the watermark passes.  Feed a finalized
    window's counts through :func:`psi_report` together with the
    reference distribution to get the same per-bucket PSI terms the
    batch operator produces.

    State is bounded by |open windows| × PSI_BUCKETS rows; the
    stream-static cut join is stateless.
    """
    from ..operators.stats import _PSI_BUCKET

    tagged = (
        events.withColumn(
            "cents",
            (F.col("value").cast("decimal(14,2)") * 100).cast("bigint"),
        )
        .crossJoin(F.broadcast(ref_cuts))
        .withColumn("bucket", F.expr(_PSI_BUCKET))
    )
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "bucket")
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(F.col("w.start").alias("window_start"), "bucket", "n_cur")
    )


def psi_report(counts: DataFrame, ref_dist: DataFrame) -> DataFrame:
    """Per-window PSI terms from finalized streaming bucket counts.

    ``counts`` is the sink table :func:`psi_buckets_stream` produced
    (``window_start, bucket, n_cur``); ``ref_dist`` is the reference
    distribution ``(bucket, n_ref, tr)``.  The spine is windows × the
    FULL 1..PSI_BUCKETS domain — not windows × ref_dist — because a
    heavily-tied reference can leave interior buckets with zero
    reference rows, and current-window mass landing there is exactly
    the drift the report must surface (the batch twin reports those
    buckets with ``n_ref = 0`` and the 1e-6 floor; dropping them would
    both understate PSI and break ``Σ n_cur = tc``).  Every term uses
    the same shared ``_PSI_TERM`` fragment as the batch operator — one
    definition of PSI across batch and streaming.
    """
    from ..operators.stats import _PSI_TERM, PSI_BUCKETS

    windows = counts.select("window_start").distinct()
    tc = counts.groupBy("window_start").agg(F.sum("n_cur").alias("tc"))
    buckets = windows.limit(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(PSI_BUCKETS)))
        .alias("bucket")
    )
    tr_row = ref_dist.agg(F.max("tr").alias("tr"))
    spine = (
        windows.crossJoin(F.broadcast(buckets))
        .join(F.broadcast(ref_dist.select("bucket", "n_ref")),
              "bucket", "left")
        .crossJoin(F.broadcast(tr_row))
        .select("window_start", "bucket",
                F.coalesce("n_ref", F.lit(0)).alias("n_ref"), "tr")
    )
    dense = (
        spine.join(counts, ["window_start", "bucket"], "left")
        .select("window_start", "bucket", "n_ref", "tr",
                F.coalesce("n_cur", F.lit(0)).alias("n_cur"))
    )
    return dense.join(F.broadcast(tc), "window_start").select(
        "window_start", "bucket", "n_ref", "n_cur",
        F.expr(_PSI_TERM).alias("psi_term_micro"),
    )


def hist_registers_stream(events: DataFrame, ref_bounds: DataFrame,
                          window: str = "1 day",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming half of ``operators.stats.sketch_hist_quantiles`` —
    the mergeable scale path for *streaming* percentiles (round-5
    verdict ask #2 extended to the streaming plane).

    Every arriving event's ``value`` is binned into the equi-width
    ``HIST_BINS`` histogram defined by the broadcast one-row reference
    bounds (``lo``/``hi`` — same definition as the batch sketch, so
    estimates are comparable across planes; out-of-range values clamp
    to the edge bins).  Finalized per-(window, bin) register counts
    emit in append mode once the watermark passes; feed them through
    :func:`hist_quantile_report` for the same p50/p90/p99 readout
    formula the batch sketch uses.

    State is bounded by |open windows| × HIST_BINS rows; the
    stream-static bounds join is stateless.
    """
    from ..operators.stats import HIST_BINS

    raw_bin = F.floor(
        (F.col("value") - F.col("lo"))
        / (F.col("hi") - F.col("lo")) * HIST_BINS
    )
    bin_ = F.greatest(F.lit(0), F.least(F.lit(HIST_BINS - 1), raw_bin)) \
        .cast("int")
    tagged = events.crossJoin(F.broadcast(ref_bounds)) \
        .withColumn("bin", bin_)
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
    )


def hist_quantile_report(counts: DataFrame, ref_bounds: DataFrame,
                         pcts=None) -> DataFrame:
    """Per-window quantile estimates from finalized histogram registers.

    Identical readout to the batch sketch: the estimate is the midpoint
    of the first bin whose cumulative count reaches ``p·n``, floor-
    quantized to 4 decimals — one definition of the sketch across batch
    and streaming.  The cumulative window runs over ≤ HIST_BINS rows
    per window (bounded domain, never data).
    """
    from pyspark.sql import Window as W

    from ..operators.stats import HIST_BINS, HQ_PCTS

    pcts = pcts or HQ_PCTS
    totals = counts.groupBy("window_start").agg(F.sum("n").alias("nw"))
    wc = W.partitionBy("window_start").orderBy("bin")
    pp = F.explode(F.array(*[
        F.struct(F.lit(name).alias("pct"), F.lit(p).alias("p"))
        for name, p in pcts
    ])).alias("pp")
    hit = (
        counts.withColumn("cum", F.sum("n").over(wc))
        .join(F.broadcast(totals), "window_start")
        .select("window_start", "bin", "cum", "nw", pp)
        .select("window_start", "bin", "cum", "pp.pct",
                (F.col("pp.p") * F.col("nw")).alias("target"))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("window_start", "pct")
        .agg(F.min("bin").alias("qbin"))
    )
    est_raw = (
        F.col("lo") + (F.col("qbin") + 0.5)
        * (F.col("hi") - F.col("lo")) / HIST_BINS
    )
    return hit.crossJoin(F.broadcast(ref_bounds)).select(
        "window_start", "pct",
        (F.floor(est_raw * 10000.0) / 10000.0).alias("est_value"),
    )


def cms_registers_stream(docs: DataFrame, window: str = "1 day",
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming Count-Min registers — the on-arrival face of
    ``operators.sketches.sketch_countmin_tokens``.

    Arriving documents explode to tokens, each token lands in the SAME
    d × w grid as the batch twin (shared ``hash64('j:token') % CMS_W``
    definition, so register tables from either plane merge by plain
    addition), and finalized per-(window, j, bucket) counts are emitted
    in append mode once the watermark passes.  State is bounded by
    |open windows| × CMS_D × CMS_W rows — constant per window no matter
    the vocabulary, which is the whole point of sketching the stream
    instead of counting it.
    """
    from ..functions.hashing import hash64
    from ..functions.text import tokens
    from ..operators.sketches import CMS_D, CMS_W

    tok = docs.select(
        "ts", F.explode(tokens(F.col("text"))).alias("token"))
    with_j = tok.select(
        "ts", "token",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j"))
    bucket = (
        hash64(F.concat(F.col("j").cast("string"), F.lit(":"),
                        F.col("token"))) % CMS_W
    )
    return (
        with_j.select("ts", "j", bucket.alias("bucket"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "j", "bucket",
                "cnt")
    )


def cms_probe(registers: DataFrame, probe_tokens: DataFrame) -> DataFrame:
    """Point-query finalized streaming CMS registers: the estimate for
    a token in a window is ``min_j cnt[j][bucket(j, token)]`` — the
    same min-over-depth probe as the batch twin, with absent registers
    reading as zero (token never seen in that window).  ``probe_tokens``
    is a small static ``(token)`` relation; the probe side broadcasts.
    """
    from ..functions.hashing import hash64
    from ..operators.sketches import CMS_D, CMS_W

    bucket = (
        hash64(F.concat(F.col("j").cast("string"), F.lit(":"),
                        F.col("token"))) % CMS_W
    )
    probe = probe_tokens.select(
        "token",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j"),
    ).select("token", "j", bucket.alias("bucket"))
    windows = registers.select("window_start").distinct()
    spine = windows.crossJoin(F.broadcast(probe))
    return (
        spine.join(registers, ["window_start", "j", "bucket"], "left")
        .select("window_start", "token",
                F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy("window_start", "token")
        .agg(F.min("cnt").alias("cms_est"))
    )


def attribute_clicks(clicks: DataFrame, purchases: DataFrame,
                     horizon: str = "30 minutes",
                     watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: clicks within ``horizon`` after a
    purchase by the same user (purchase-to-click attribution).

    Both sides carry watermarks and the join condition bounds event time
    on both ends, so Spark can size the join state and evict rows once
    the watermark passes — the canonical bounded-state stream-stream
    join.  Works identically on batch inputs (watermarks are no-ops).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts"))
        & (F.col("click_ts") <= F.col("purchase_ts")
           + F.expr(f"interval {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id", "purchase_ts", "click_id", "click_ts",
        "purchase_value",
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame,
                          key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream is
    joined against a static dimension snapshot.

    The static side is broadcast (re-read per micro-batch only if its
    source supports it, e.g. a Delta table picking up dimension
    updates); the stream side never shuffles, carries no join state and
    needs no watermark — stream-static inner joins are stateless by
    definition.  This is the canonical "attach user profile to the
    event firehose" shape; at 100 TB/day the only cost that grows is
    the stream scan itself.
    """
    return events.join(F.broadcast(dim), key, "inner")


_RUNNING_STATE_SCHEMA = "n bigint, total double"
_RUNNING_OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def _running_totals_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an arbitrary-stateful operator.

    Demonstrates the ``applyInPandasWithState`` pattern for operators the
    built-in library lacks: per-key state rows survive across
    microbatches via the checkpoint, and each batch emits the refreshed
    totals for the keys it touched (update semantics).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=_RUNNING_OUT_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM: the batch change-point detector
# (operators/profiling.ev_cusum_changepoint) deployed on a live stream.
# ---------------------------------------------------------------------------

#: Input contract: finalized hourly counts, e.g. the append-mode output
#: of a watermarked ``windowed_counts`` stage (append mode emits each
#: window once, in watermark order per key — the in-order assumption the
#: prefix-sum state relies on).
HOURLY_SCHEMA = "event_type string, hour timestamp, c bigint"

_CUSUM_STATE_SCHEMA = "p bigint, minp bigint"
_CUSUM_OUT_SCHEMA = ("event_type string, hour timestamp, "
                     "hour_count bigint, cusum_scaled bigint, alarm boolean")


def _cusum_alarm_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import math

    p, minp = state.get if state.exists else (0, 0)
    frames = list(pdfs)
    out: list[tuple] = []
    if frames:
        rows = pd.concat(frames).sort_values("hour")
        for r in rows.itertuples():
            d = int(r.n) * int(r.c) - int(r.sx)
            p += d
            minp = min(minp, p)
            s = p - min(0, minp)
            sigma = math.sqrt(float(int(r.n) * int(r.sxx)
                                    - int(r.sx) * int(r.sx)))
            out.append((key[0], r.hour, int(r.c), int(s),
                        float(s) > 3.0 * sigma))
    state.update((int(p), int(minp)))
    yield pd.DataFrame(
        out, columns=["event_type", "hour", "hour_count",
                      "cusum_scaled", "alarm"])


def cusum_alarms_stream(hourly: DataFrame,
                        baseline: DataFrame) -> DataFrame:
    """Streaming upper-CUSUM alarms over finalized hourly counts.

    The batch twin (``ev_cusum_changepoint``) computes
    ``S_t = P_t − min(0, min_{j≤t} P_j)`` with two windows; on a stream
    the same statistic needs only TWO integers of per-key state — the
    prefix sum and its running min — carried across microbatches by
    ``applyInPandasWithState``.  The baseline power sums (n, sx, sxx
    per type, from the batch profile of the reference period) arrive as
    a static frame via a stream-static broadcast join, so every
    incoming row is self-contained; types with zero variance are
    filtered out exactly as the batch twin does.

    State is 2 bigints per event type — independent of stream length;
    a crash replays the microbatch into the same state (the T2/T5
    exactly-once story applied to a detector).
    """
    rad_ok = baseline.filter(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
    )
    joined = hourly.join(F.broadcast(rad_ok), "event_type")
    return joined.groupBy("event_type").applyInPandasWithState(
        _cusum_alarm_fn,
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def nb_score_stream(docs: DataFrame, model: DataFrame,
                    totals: DataFrame, window: str = "1 day",
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming face of the NB quality gate
    (``operators.selection.doc_quality_classifier``): score documents
    *on arrival* under a batch-trained token model — the standard
    deployment split where the classifier trains offline on the corpus
    and gates the live ingest stream.

    ``model``/``totals`` come from
    ``operators.selection.nb_token_model`` (static relations), so both
    planes share exactly one model definition and the stream's ``llr_q``
    for a document equals the batch classifier's bit-for-bit.  The
    token join is stream-static (stateless); per-document score state
    lives only until the watermark passes its window.  Tokens unseen at
    training time drop out of the inner join — the OOV convention of
    the batch twin, whose model (trained on the same corpus) covers
    every token by construction.

    ``docs`` needs ``(doc_id bigint, ts timestamp, text string)``.
    """
    from ..functions.text import tokens
    from ..operators.selection import _NB_TERM

    # The watermark attaches BEFORE the model join: an arriving batch
    # whose tokens are all OOV still advances event time (the join
    # would otherwise swallow the rows the watermark tracker needs).
    toks = docs.withWatermark("ts", watermark).select(
        "ts", "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    scored = (
        toks.join(model, "token")            # stream-static, stateless
        .crossJoin(F.broadcast(totals))
        .select("ts", "doc_id", F.expr(_NB_TERM).alias("term"))
    )
    return (
        scored
        .groupBy(F.window("ts", window).alias("w"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("term").alias("llr_q"),
        )
        .select(
            F.col("w.start").alias("window_start"), "doc_id",
            "n_tokens", "llr_q",
            (F.col("llr_q") > 0).alias("pred_ref"),
        )
    )
