"""Temporal joins Spark has no single-operator form for: as-of and range.

The reference has no temporal joins at all (SURVEY.md §2.3 lists the
absence); these are the standard time-series repertoire a pipeline engine
needs, built as *compositions of existing DataFrame ops* (the preferred
implementation ladder — no UDF, no mapPartitions):

- **as-of join** — "latest right row at or before each left row" —
  re-expressed as a tagged UNION + one ordered window with
  ``last(..., ignorenulls=True)``.  One shuffle on (key, time); no
  equality-join fan-out, no per-row search.  This is the classic
  union-sort formulation (cf. pandas merge_asof / QuestDB ASOF JOIN
  semantics); DuckDB's native ``ASOF LEFT JOIN`` is the oracle.
- **range (interval) join** — "pairs within a time band" — re-expressed
  as a bucketed equi-join: each left row explodes to its bucket ± 1
  (bucket width = the band), the join key is (user, bucket), and the
  exact band predicate filters after the hash join.  Work scales with
  true pair density, never |left| x |right| per user.  DuckDB's
  range-predicate join is the oracle.

Scale notes: both operators shuffle once on the user/time key; AQE's
skew-join splitting handles hot users.  The bucketed range join is the
same trick Spark itself uses for watermarked stream-stream interval
joins — here made explicit for batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..spec import QuerySpec
from ..tables import load_table

from .events import _epoch_s
from ..functions.checkpoint import cut_lineage

RANGE_BAND_S = 300     # range-join band (seconds)


def asof_join_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at or before it.

    UNION both sides tagged (purchases sort before clicks at equal ts so
    'at or before' is inclusive), then one window per user carrying the
    last-seen purchase forward.  Output: click identity + matched
    purchase event_id/value (NULL when no purchase precedes).
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    # One purchase per (user, ts) — max event_id wins.  Equal-ts ties are
    # otherwise engine-ambiguous (DuckDB's ASOF picks an unspecified row
    # among tied timestamps), so the dedup is part of the operator spec.
    wp = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    tagged = purchases.select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id", "value"
    ).unionByName(clicks.select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("double").alias("value"),
    ))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_purchase = F.col("side") == 0
    carried_id = F.last(F.when(is_purchase, F.col("event_id")),
                        ignorenulls=True).over(w)
    carried_val = F.last(F.when(is_purchase, F.col("value")),
                         ignorenulls=True).over(w)
    return (
        tagged.withColumn("purchase_event_id", carried_id)
        .withColumn("purchase_value", carried_val)
        .filter(~is_purchase)
        .select("event_id", "user_id", "ts",
                "purchase_event_id", "purchase_value")
    )


ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT event_id, user_id, ts, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts,
       p.event_id AS purchase_event_id, p.value AS purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of events of the same user within RANGE_BAND_S seconds.

    Bucketed interval join: bucket width = the band, the left side
    explodes to bucket-1/bucket/bucket+1, the join is a plain hash
    equi-join on (user_id, bucket), and the exact |Δt| <= band predicate
    filters the survivors.  A band pair has bucket distance <= 1, so
    coverage is exact and each pair matches exactly one exploded bucket.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", _epoch_s(F.col("ts")).alias("sec")
    )
    a = e.select(
        F.col("event_id").alias("a_id"), "user_id",
        F.col("sec").alias("a_sec"),
        F.explode(F.array(
            (F.col("sec") / RANGE_BAND_S).cast("long") - 1,
            (F.col("sec") / RANGE_BAND_S).cast("long"),
            (F.col("sec") / RANGE_BAND_S).cast("long") + 1,
        )).alias("bucket"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"), "user_id",
        F.col("sec").alias("b_sec"),
        (F.col("sec") / RANGE_BAND_S).cast("long").alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_sec") - F.col("b_sec")) <= RANGE_BAND_S)
        )
        .select("user_id", "a_id", "b_id",
                F.abs(F.col("a_sec") - F.col("b_sec")).alias("gap_s"))
    )


RANGE_ORACLE = f"""
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       abs(CAST(floor(epoch(a.ts)) AS BIGINT)
           - CAST(floor(epoch(b.ts)) AS BIGINT)) AS gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(CAST(floor(epoch(a.ts)) AS BIGINT)
         - CAST(floor(epoch(b.ts)) AS BIGINT)) <= {RANGE_BAND_S}
"""


N_RESAMPLE_USERS = 5


def _resample_tagged(e: DataFrame) -> DataFrame:
    """Shared base of the hourly resamples: per-(user, ts) deduped
    observations (side 0, max event_id wins — the as-of tie spec)
    unioned with each user's hourly spine (side 1; sequence between the
    hour-truncated min/max event times).  Observations sort BEFORE the
    spine point at equal time (side 0 < 1), so a forward pass treats an
    on-the-hour observation as "at or before"."""
    wo = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    obs = (
        e.select("user_id", "ts", "event_id", "value")
        .withColumn("_rn", F.row_number().over(wo))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "event_id")
    )
    spine = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("t0"),
            F.date_trunc("hour", F.max("ts")).alias("t1"),
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(t0, t1, interval 1 hour)"))
            .alias("hour_ts"),
        )
    )
    return obs.select(
        "user_id", F.col("ts").alias("t"), F.lit(0).alias("side"), "value"
    ).unionByName(spine.select(
        "user_id", F.col("hour_ts").alias("t"), F.lit(1).alias("side"),
        F.lit(None).cast("double").alias("value"),
    ))


def ev_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill for the first N users.

    Gap-filling: build each user's hourly spine (sequence between the
    hour-truncated min/max event times), then carry the last observed
    value forward onto every spine point — the same tagged-UNION window
    as the as-of join, so spine generation is the only new machinery.
    Hours before the first observation stay NULL.

    Scale shape: the spine explode is per-user and bounded by the time
    range; the fill is one window over (user, time) — no self-join, no
    per-row lookups.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < N_RESAMPLE_USERS
    )
    tagged = _resample_tagged(e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(F.when(F.col("side") == 0, F.col("value")),
                    ignorenulls=True).over(w)
    return (
        tagged.withColumn("ffill_value", filled)
        .filter(F.col("side") == 1)
        .select("user_id", F.col("t").alias("hour_ts"), "ffill_value")
    )


RESAMPLE_ORACLE = f"""
WITH obs AS (
  SELECT user_id, ts, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
              ORDER BY event_id DESC) AS rn
    FROM events WHERE user_id < {N_RESAMPLE_USERS}
  ) WHERE rn = 1
),
spine AS (
  SELECT user_id, unnest(generate_series(
           date_trunc('hour', tmin), date_trunc('hour', tmax),
           INTERVAL 1 HOUR)) AS hour_ts
  FROM (SELECT user_id, min(ts) AS tmin, max(ts) AS tmax
        FROM events WHERE user_id < {N_RESAMPLE_USERS} GROUP BY user_id)
)
SELECT s.user_id, s.hour_ts, o.value AS ffill_value
FROM spine s ASOF LEFT JOIN obs o
  ON s.user_id = o.user_id AND s.hour_ts >= o.ts
"""


#: Backward look-back horizon for the tolerance-bounded as-of join.
ASOF_TOLERANCE_S = 3600


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance: each click matches the user's most
    recent purchase within the preceding hour, NULL beyond it (pandas
    ``merge_asof(tolerance=...)`` semantics).

    The tolerance changes the scalable formulation: the carry-forward
    window of :func:`asof_join_purchase` must remember the last
    purchase indefinitely (state = one row per user, but a full
    per-user history sort), while a *bounded* look-back admits a range
    join whose fan-out is capped by event density within the horizon —
    the same bounded-state trick watermarked stream-stream joins use.
    Candidates come from one equi-join on user plus the band predicate;
    a per-click argmax window (latest ts, event_id tie-break) picks the
    winner.  Purchases are deduped per (user, ts) first — equal-ts ties
    are engine-ambiguous otherwise, same spec as the plain as-of.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    wp = Window.partitionBy("user_id", "p_ts").orderBy(
        F.col("p_id").desc()
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), "user_id",
                F.col("ts").alias("p_ts"), F.col("value").alias("p_val"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    gap = _epoch_s(F.col("c.ts")) - _epoch_s(F.col("p.p_ts"))
    # Band predicate lives IN the join: the equi-part hashes on user,
    # the range conditions filter at the join, so a click fans out only
    # to in-horizon purchases (bounded by event density, not history
    # length).  A left join emits exactly one all-NULL row for clicks
    # with no in-band purchase, so the argmax window never ranks a NULL
    # row against real candidates.
    cand = c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.p_ts") <= F.col("c.ts"))
        & (gap <= ASOF_TOLERANCE_S),
        "left",
    )
    wc = Window.partitionBy("c.event_id").orderBy(
        F.desc("p.p_ts"), F.desc("p.p_id")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("c.event_id").alias("event_id"),
            F.col("c.user_id").alias("user_id"),
            F.col("c.ts").alias("ts"),
            F.col("p.p_id").alias("purchase_event_id"),
            F.col("p.p_val").alias("purchase_value"),
        )
    )


ASOF_TOLERANCE_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT event_id, user_id, ts, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
cand AS (
  SELECT c.event_id, c.user_id, c.ts,
         p.event_id AS pid, p.value AS pval,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM clicks c LEFT JOIN purch p
    ON p.user_id = c.user_id
   AND p.ts <= c.ts
   AND date_diff('second', p.ts, c.ts) <= {ASOF_TOLERANCE_S}
)
SELECT event_id, user_id, ts,
       pid AS purchase_event_id, pval AS purchase_value
FROM cand WHERE rn = 1
"""


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join: each click pairs with the user's
    closest purchase in EITHER direction within the tolerance (pandas
    ``merge_asof(direction='nearest')``) — the sensor-fusion /
    clock-skew-tolerant alignment the backward-only join can't express.

    Tie-break is fully pinned: smaller |gap| wins, an exact tie between
    a backward and a forward candidate prefers the backward one, then
    the larger purchase id.  Same bounded band-join shape as
    :func:`asof_join_tolerance` — the horizon caps fan-out in both
    directions.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    wp = Window.partitionBy("user_id", "p_ts").orderBy(
        F.col("p_id").desc()
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), "user_id",
                F.col("ts").alias("p_ts"), F.col("value").alias("p_val"))
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    gap = _epoch_s(F.col("c.ts")) - _epoch_s(F.col("p.p_ts"))
    cand = c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.abs(gap) <= ASOF_TOLERANCE_S),
        "left",
    ).withColumn("abs_gap", F.abs(gap)) \
        .withColumn("is_fwd",
                    F.when(F.col("p.p_ts") > F.col("c.ts"), 1)
                    .otherwise(0))
    wc = Window.partitionBy("c.event_id").orderBy(
        "abs_gap", "is_fwd", F.desc("p.p_id")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("c.event_id").alias("event_id"),
            F.col("c.user_id").alias("user_id"),
            F.col("c.ts").alias("ts"),
            F.col("p.p_id").alias("purchase_event_id"),
            F.col("abs_gap").alias("gap_s"),
            F.col("p.p_val").alias("purchase_value"),
        )
    )


ASOF_NEAREST_ORACLE = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT event_id, user_id, ts, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
cand AS (
  SELECT c.event_id, c.user_id, c.ts,
         p.event_id AS pid, p.value AS pval,
         abs(date_diff('second', p.ts, c.ts)) AS abs_gap,
         CASE WHEN p.ts > c.ts THEN 1 ELSE 0 END AS is_fwd,
         row_number() OVER (PARTITION BY c.event_id
            ORDER BY abs(date_diff('second', p.ts, c.ts)),
                     CASE WHEN p.ts > c.ts THEN 1 ELSE 0 END,
                     p.event_id DESC) AS rn
  FROM clicks c LEFT JOIN purch p
    ON p.user_id = c.user_id
   AND abs(date_diff('second', p.ts, c.ts)) <= {ASOF_TOLERANCE_S}
)
SELECT event_id, user_id, ts,
       pid AS purchase_event_id,
       CAST(abs_gap AS BIGINT) AS gap_s,
       pval AS purchase_value
FROM cand WHERE rn = 1
"""


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from the event stream.

    Treats each user's ``event_type`` as a slowly-changing state and
    compresses the stream into validity intervals: keep only CHANGE rows
    (lag-compare per user), then derive ``valid_from`` = change time,
    ``valid_to`` = next change time (NULL = open), ``version`` = change
    ordinal, ``is_current`` = open-interval flag.  This is the standard
    warehouse history-table shape (Kimball SCD2) the reference's
    Postgres-backed status columns flatten away (it keeps only the
    latest status — SURVEY.md §2.1 S11); the interval form supports
    point-in-time joins (see :func:`asof_join_purchase` for the
    scalable PIT formulation).

    Scale shape: one shuffle on user_id; the change filter runs on the
    first window pass so the lead/row_number pass sees only the (much
    smaller) change set.  Both windows share partitioning and order, so
    Catalyst plans a single sort.  No self-join, no explode.
    """
    return _scd2_build(load_table(spark, sf_dir, "events"))


def _scd2_build(e: DataFrame) -> DataFrame:
    # A NULL state is "no observation", not a state: NULL-safe equality
    # would make it a real interval, while plain lag-compare both drops
    # the NULL row AND flags the repeat after it as a change (NULL !=
    # 'a' is NULL, filtered) — breaking incremental == full.  Dropping
    # NULLs up front (here AND in the merge's batch leg) keeps the two
    # paths identical and the well-formed-history invariant intact.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.filter(F.col("event_type").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull()
                | (F.col("_prev") != F.col("event_type")))
        .drop("_prev")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, event_type, ts, event_id FROM (
    SELECT user_id, event_type, ts, event_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events WHERE event_type IS NOT NULL
  ) WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS INTEGER) AS version,
       lead(ts) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def scd2_merge_batch(dim: DataFrame, batch: DataFrame) -> DataFrame:
    """Apply a batch of NEWER events to an existing SCD2 dimension.

    The production maintenance shape: instead of rebuilding history from
    all events, only the batch is change-compressed — each user's open
    interval seeds the lag-compare (so a batch whose first event repeats
    the current state is a no-op), the open interval closes at the
    user's first new change, and new intervals continue the version
    numbering.  Work is O(|batch| + |affected open rows|); the closed
    history is touched only by a broadcast-size join on the per-user
    first-change time.  Pinned equal to the full rebuild by
    :func:`scd2_incremental_merge`'s oracle and the contract tests.

    ``batch`` must be strictly newer than every event already folded
    into ``dim`` (the caller's watermark contract, same as any
    incremental ingest).
    """
    # dim feeds both the seed/version join and the close-out join, and
    # `changes` below feeds both the new-interval window and the
    # first-change aggregate; Catalyst does not reuse differently-
    # parented subtrees (same finding as pagerank/triangle-count — §8 in
    # PERF.md), so each multiply-referenced tier is materialized once.
    dim = dim.transform(cut_lineage)
    cur = dim.filter("is_current").select(
        "user_id", "state", "valid_from", "version"
    )
    # Seed each user's lag-compare with their open state.  Seeds sort
    # first (their ts predates the batch by the watermark contract;
    # side breaks any residual tie), batch events follow in stream
    # order.
    tagged = cur.select(
        "user_id", "state", F.col("valid_from").alias("ts"),
        F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("side"),
    ).unionByName(
        # NULL states are non-observations, dropped exactly as in
        # _scd2_build — a malformed stream record (e.g. bad JSON parsed
        # to NULL event_type) must not corrupt the dimension.
        batch.filter(F.col("event_type").isNotNull()).select(
            "user_id", F.col("event_type").alias("state"), "ts",
            "event_id", F.lit(1).alias("side"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "side", "event_id")
    changes = (
        tagged.withColumn("_prev", F.lag("state").over(w))
        .filter((F.col("side") == 1)
                & (F.col("_prev").isNull()
                   | (F.col("_prev") != F.col("state"))))
        .select("user_id", "state", "ts", "event_id")
        .transform(cut_lineage)
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_rows = (
        changes
        .join(cur.select("user_id", F.col("version").alias("_base")),
              "user_id", "left")
        .select(
            "user_id", "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(wc).alias("valid_to"),
            (F.coalesce(F.col("_base"), F.lit(0))
             + F.row_number().over(wc)).cast("int").alias("version"),
            F.lead("ts").over(wc).isNull().alias("is_current"),
        )
    )
    first_change = changes.groupBy("user_id").agg(
        F.min("ts").alias("_first_ts")
    )
    updated_old = (
        dim.join(first_change, "user_id", "left")
        .select(
            "user_id", "state", "valid_from",
            F.when(F.col("is_current") & F.col("_first_ts").isNotNull(),
                   F.col("_first_ts")).otherwise(F.col("valid_to"))
            .alias("valid_to"),
            "version",
            (F.col("is_current") & F.col("_first_ts").isNull())
            .alias("is_current"),
        )
    )
    return updated_old.unionByName(new_rows)


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension: each purchase
    event gets the user's state valid AT that moment.

    The consume half of the SCD2 story (build → maintain → PIT join —
    the feature-store / audit-query shape).  The scalable formulation
    is NOT the interval join the semantics suggest (``valid_from <= ts
    < valid_to`` fans out per interval): because intervals partition
    time, "the interval containing ts" is "the latest valid_from at or
    before ts" — the as-of carry-forward.  One tagged UNION of interval
    starts and events, one (user, time) window, no join at all.  The
    oracle IS the interval join, so parity proves the rewrite.
    """
    e = load_table(spark, sf_dir, "events")
    dim = _scd2_build(e)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    tagged = dim.select(
        "user_id", F.col("valid_from").alias("t"), F.lit(0).alias("side"),
        "state", F.lit(None).cast("long").alias("event_id"),
    ).unionByName(purchases.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("side"),
        F.lit(None).cast("string").alias("state"), "event_id",
    ))
    # Interval starts sort before events at equal time (side 0 < 1), so
    # an event at exactly valid_from lands in the NEW interval — the
    # half-open [valid_from, valid_to) contract of the oracle join.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.when(F.col("side") == 0, F.col("state")),
                     ignorenulls=True).over(w)
    return (
        tagged.withColumn("state_at", carried)
        .filter(F.col("side") == 1)
        .select("event_id", "user_id", F.col("t").alias("ts"), "state_at")
    )


SCD2_PIT_ORACLE = f"""
WITH dim AS ({SCD2_ORACLE})
SELECT p.event_id, p.user_id, p.ts, d.state AS state_at
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
JOIN dim d
  ON d.user_id = p.user_id AND p.ts >= d.valid_from
 AND (d.valid_to IS NULL OR p.ts < d.valid_to)
"""


#: Batch boundary for the incremental-merge registry query (mid-range of
#: the generated January 2024 event window at every SF).
SCD2_SPLIT = "2024-01-16 00:00:00"


def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance, graded against the FULL rebuild.

    Builds the dimension from events at or before :data:`SCD2_SPLIT`,
    then folds the rest in via :func:`scd2_merge_batch`.  The oracle is
    the full-history rebuild (same SQL as ``scd2_user_state``), so a
    green row proves incremental == full — the contract that lets a
    100 TB deployment maintain history per-batch instead of
    recomputing it.
    """
    e = load_table(spark, sf_dir, "events")
    split = F.expr(f"TIMESTAMP_NTZ '{SCD2_SPLIT}'")
    dim = _scd2_build(e.filter(F.col("ts") <= split))
    batch = e.filter(F.col("ts") > split)
    return scd2_merge_batch(dim, batch)


def ev_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation for the first N users.

    The gap-filling sibling of :func:`ev_resample_ffill`: each spine
    hour gets ``v_prev + (v_next - v_prev) * (h - t_prev)/(t_next -
    t_prev)`` from its bracketing observations.  Hours outside the
    observed range stay NULL; a spine hour landing exactly on an
    observation returns that observation.  One tagged UNION carries all
    four bracketing columns (prev/next value and time) through two
    frames of the SAME (user, time) sort — forward ``last(...,
    ignorenulls)`` and backward ``first(..., ignorenulls)`` — so the
    whole operator is one shuffle and one sort, no self-join.

    Determinism: bracketing times are truncated epoch seconds (the
    established cross-engine grain) and the arithmetic is the same
    IEEE-double expression on both engines, floor-truncated (never
    round-half — Spark rounds the shortest decimal rendering, DuckDB
    the binary value, and they disagree on ties) to 6 dp.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < N_RESAMPLE_USERS
    )
    tagged = _resample_tagged(e)
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_obs = F.col("side") == 0
    obs_v = F.when(is_obs, F.col("value"))
    obs_s = F.when(is_obs, _epoch_s(F.col("t")))
    prev_v = F.last(obs_v, ignorenulls=True).over(fwd)
    prev_s = F.last(obs_s, ignorenulls=True).over(fwd)
    next_v = F.first(obs_v, ignorenulls=True).over(bwd)
    next_s = F.first(obs_s, ignorenulls=True).over(bwd)
    h_s = _epoch_s(F.col("t"))
    frac = (h_s - F.col("_ps")).cast("double") / \
        (F.col("_ns") - F.col("_ps")).cast("double")
    interp = (
        F.when(F.col("_ps") == h_s, F.col("_pv"))
        .when(F.col("_ps").isNull() | F.col("_ns").isNull(),
              F.lit(None).cast("double"))
        .otherwise(F.floor(
            (F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac)
            * 1000000.0) / 1000000.0)
    )
    return (
        tagged
        .withColumn("_pv", prev_v).withColumn("_ps", prev_s)
        .withColumn("_nv", next_v).withColumn("_ns", next_s)
        .filter(~is_obs)
        .select("user_id", F.col("t").alias("hour_ts"),
                interp.alias("interp_value"))
    )


INTERPOLATE_ORACLE = f"""
WITH obs AS (
  SELECT user_id, ts, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
              ORDER BY event_id DESC) AS rn
    FROM events WHERE user_id < {N_RESAMPLE_USERS}
  ) WHERE rn = 1
),
spine AS (
  SELECT user_id, unnest(generate_series(
           date_trunc('hour', tmin), date_trunc('hour', tmax),
           INTERVAL 1 HOUR)) AS hour_ts
  FROM (SELECT user_id, min(ts) AS tmin, max(ts) AS tmax
        FROM events WHERE user_id < {N_RESAMPLE_USERS} GROUP BY user_id)
),
tagged AS (
  SELECT user_id, ts AS t, 0 AS side, value FROM obs
  UNION ALL
  SELECT user_id, hour_ts AS t, 1 AS side, NULL AS value FROM spine
),
bracketed AS (
  SELECT user_id, t, side,
         last(CASE WHEN side = 0 THEN value END IGNORE NULLS)
           OVER wf AS pv,
         last(CASE WHEN side = 0
                   THEN CAST(floor(epoch(t)) AS BIGINT) END IGNORE NULLS)
           OVER wf AS ps,
         first(CASE WHEN side = 0 THEN value END IGNORE NULLS)
           OVER wb AS nv,
         first(CASE WHEN side = 0
                    THEN CAST(floor(epoch(t)) AS BIGINT) END IGNORE NULLS)
           OVER wb AS ns
  FROM tagged
  WINDOW wf AS (PARTITION BY user_id ORDER BY t, side
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wb AS (PARTITION BY user_id ORDER BY t, side
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t AS hour_ts,
       CASE WHEN ps = CAST(floor(epoch(t)) AS BIGINT) THEN pv
            WHEN ps IS NULL OR ns IS NULL THEN NULL
            ELSE floor((pv + (nv - pv)
                 * (CAST(CAST(floor(epoch(t)) AS BIGINT) - ps AS DOUBLE)
                    / CAST(ns - ps AS DOUBLE))) * 1000000.0) / 1000000.0
       END AS interp_value
FROM bracketed WHERE side = 1
"""


SPECS: dict[str, QuerySpec] = {
    "asof_join_purchase": QuerySpec(asof_join_purchase, ASOF_ORACLE),
    "asof_join_nearest": QuerySpec(asof_join_nearest,
                                   ASOF_NEAREST_ORACLE),
    "asof_join_tolerance": QuerySpec(asof_join_tolerance,
                                     ASOF_TOLERANCE_ORACLE),
    "range_join_pairs": QuerySpec(range_join_pairs, RANGE_ORACLE),
    "ev_resample_ffill": QuerySpec(ev_resample_ffill, RESAMPLE_ORACLE),
    "ev_resample_interpolate": QuerySpec(ev_resample_interpolate,
                                         INTERPOLATE_ORACLE),
    "scd2_user_state": QuerySpec(scd2_user_state, SCD2_ORACLE),
    "scd2_incremental_merge": QuerySpec(scd2_incremental_merge,
                                        SCD2_ORACLE),
    "scd2_point_in_time": QuerySpec(scd2_point_in_time, SCD2_PIT_ORACLE),
}
