"""Corpus-quality operators: the composed "what goes into the training
run" decision layer over ``documents``.

- :func:`doc_unigram_logprob` — a perplexity proxy: per-doc mean token
  surprisal against the corpus unigram model, in integer log2 bits so
  the score is engine-exact (no ln(), no float accumulation order).
  This is the CCNet-style "LM quality" filter reduced to its
  deterministic core.
- :func:`pipeline_pretrain_filter` — the composite keep/reject decision
  (length -> language -> near-dup -> quality, first-failure-wins), the
  document-corpus analogue of the reference's validation CASE precedence
  (reference ``src/services/row_validator.py`` — one codified rule
  order, every branch visible).
- :func:`pipeline_filter_stats` — the per-reason survival report a
  pipeline owner reads before launching the 100 TB job.

Scale shape: the unigram frequencies ride ONE window shuffle on the
token; the corpus total is attached lazily as a broadcast one-row cross
join (no eager count at plan-construction time); the near-dup side is
the already-sub-quadratic inverted-index Jaccard join from
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, STOPWORDS, marker_count, tokens, \
    ws_token_count
from ..spec import QuerySpec
from ..tables import load_table
from .dedup import _SHINGLES_SQL, _jaccard_pairs, _shingles
from .text import _TOKENS_SQL, _WS_COUNT_SQL, _floor4, _marker_sql
from ..functions.checkpoint import cut_lineage

MIN_TOKENS = 20         # too_short cutoff
QUALITY_MIN = 0.38      # low_quality cutoff (median corpus score ~0.44)


def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token surprisal vs the corpus unigram model, in integer bits.

    surprisal(token) = floor_log2(total_tokens) - floor_log2(freq) — an
    integer per instance, so the per-doc sum has no accumulation order
    and the only double is the final mean.  Rare-token-heavy documents
    score high (gibberish), boilerplate scores low — the standard LM
    quality signal without a libm ``ln`` in sight.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    wt = Window.partitionBy("token")
    scored = tok.withColumn("freq", F.count(F.lit(1)).over(wt))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    bits = (
        F.length(F.conv(F.col("total").cast("string"), 10, 2))
        - F.length(F.conv(F.col("freq").cast("string"), 10, 2))
    ).cast("bigint")
    return (
        scored.crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).alias("bits_total"),
        )
        .select(
            "doc_id", "n_tokens", "bits_total",
            _floor4(F.col("bits_total").cast("double") / F.col("n_tokens"))
            .alias("bits_per_token"),
        )
    )


UNIGRAM_LOGPROB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
),
freqs AS (
  SELECT doc_id, count(*) OVER (PARTITION BY token) AS freq FROM tok
),
tot AS (SELECT count(*) AS total FROM tok)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(length(bin(total)) - length(bin(freq))) AS BIGINT)
       AS bits_total,
       floor(CAST(sum(length(bin(total)) - length(bin(freq))) AS DOUBLE)
             / count(*) * 10000.0) / 10000.0 AS bits_per_token
FROM freqs CROSS JOIN tot
GROUP BY doc_id
"""


def _lang_pred() -> F.Column:
    """Marker-word language prediction (same precedence as doc_lang_id)."""
    s = {code: marker_count(F.col("text"), m)
         for code, m in LANG_MARKERS.items()}
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"])
               & (s["en"] >= s["fr"]) & (s["en"] > 0), F.lit("en"))
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0),
              F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def _quality_score() -> F.Column:
    """The doc_quality_score formula (pinned weighted sum)."""
    n_tok = ws_token_count(F.col("text"))
    stop = marker_count(F.col("text"), STOPWORDS)
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    return (
        (stop.cast("double") / n_tok) * 0.4
        + (alpha.cast("double") / F.length("text")) * 0.3
        + F.least(F.lit(1.0), n_tok.cast("double") / 100.0) * 0.3
    )


def pipeline_pretrain_filter(spark: SparkSession, sf_dir: str,
                             sh: DataFrame | None = None) -> DataFrame:
    """The composed pretrain admission decision, first-failure-wins:

    too_short (< MIN_TOKENS) -> non_english (marker-word lang-ID) ->
    near_dup (higher-id side of an exact-Jaccard >= 0.2 pair — keep-first
    semantics) -> low_quality (< QUALITY_MIN) -> kept.

    One CASE codifies the precedence (the corpus twin of the reference
    validator's severity order); the near-dup set arrives as a left-join
    marker from the inverted-index Jaccard pairs, so the expensive leg is
    the same sub-quadratic plan the dedup operator already runs.
    """
    d = load_table(spark, sf_dir, "documents")
    dups = (
        _jaccard_pairs(_shingles(spark, sf_dir) if sh is None else sh,
                       shared=sh is not None)
        .select(F.col("d2").alias("doc_id")).distinct()
        .withColumn("is_dup", F.lit(1))
    )
    n_tok = ws_token_count(F.col("text"))
    reason = (
        F.when(n_tok < MIN_TOKENS, F.lit("too_short"))
        .when(_lang_pred() != "en", F.lit("non_english"))
        .when(F.col("is_dup").isNotNull(), F.lit("near_dup"))
        .when(_quality_score() < QUALITY_MIN, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return (
        d.join(dups, "doc_id", "left")
        .select(
            "doc_id", n_tok.alias("n_tokens"), reason.alias("reason"),
            (reason == "kept").alias("keep"),
        )
    )


_LANG_PRED_SQL = f"""
  CASE
    WHEN {_marker_sql(LANG_MARKERS['en'])} >= {_marker_sql(LANG_MARKERS['de'])}
     AND {_marker_sql(LANG_MARKERS['en'])} >= {_marker_sql(LANG_MARKERS['es'])}
     AND {_marker_sql(LANG_MARKERS['en'])} >= {_marker_sql(LANG_MARKERS['fr'])}
     AND {_marker_sql(LANG_MARKERS['en'])} > 0 THEN 'en'
    WHEN {_marker_sql(LANG_MARKERS['de'])} >= {_marker_sql(LANG_MARKERS['es'])}
     AND {_marker_sql(LANG_MARKERS['de'])} >= {_marker_sql(LANG_MARKERS['fr'])}
     AND {_marker_sql(LANG_MARKERS['de'])} > 0 THEN 'de'
    WHEN {_marker_sql(LANG_MARKERS['es'])} >= {_marker_sql(LANG_MARKERS['fr'])}
     AND {_marker_sql(LANG_MARKERS['es'])} > 0 THEN 'es'
    WHEN {_marker_sql(LANG_MARKERS['fr'])} > 0 THEN 'fr'
    ELSE 'und'
  END
"""

_QUALITY_SQL = f"""
  ((CAST({_marker_sql(STOPWORDS)} AS DOUBLE) / {_WS_COUNT_SQL}) * 0.4
   + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      / length(text)) * 0.3
   + least(1.0, CAST({_WS_COUNT_SQL} AS DOUBLE) / 100.0) * 0.3)
"""

_PIPELINE_CORE_SQL = f"""
{_SHINGLES_SQL.strip()},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
jp AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT d2 AS doc_id, 1 AS is_dup FROM jp
  JOIN sizes sa ON d1 = sa.doc_id
  JOIN sizes sb ON d2 = sb.doc_id
  WHERE floor(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) * 10000.0)
        / 10000.0 >= 0.2
),
decided AS (
  SELECT d.doc_id, CAST(len({_TOKENS_SQL}) AS INT) AS n_tokens,
         CASE
           WHEN len({_TOKENS_SQL}) < {MIN_TOKENS} THEN 'too_short'
           WHEN ({_LANG_PRED_SQL.strip()}) <> 'en' THEN 'non_english'
           WHEN dups.is_dup IS NOT NULL THEN 'near_dup'
           WHEN {_QUALITY_SQL.strip()} < {QUALITY_MIN} THEN 'low_quality'
           ELSE 'kept'
         END AS reason
  FROM documents d LEFT JOIN dups ON dups.doc_id = d.doc_id
)
"""

PIPELINE_FILTER_ORACLE = f"""
WITH {_PIPELINE_CORE_SQL.strip()}
SELECT doc_id, n_tokens, reason, reason = 'kept' AS keep FROM decided
"""


def pipeline_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-reason survival report: doc counts, token mass, corpus share."""
    decided = pipeline_pretrain_filter(spark, sf_dir)
    agg = decided.groupBy("reason").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    # The share window runs over the <= 5-row aggregate, not the corpus.
    wall = Window.partitionBy()
    return agg.select(
        "reason", "n_docs", "sum_tokens",
        _floor4(F.col("n_docs").cast("double")
                / F.sum("n_docs").over(wall)).alias("share"),
    )


PIPELINE_STATS_ORACLE = f"""
WITH {_PIPELINE_CORE_SQL.strip()},
agg AS (
  SELECT reason, count(*) AS n_docs, sum(n_tokens) AS sum_tokens
  FROM decided GROUP BY 1
)
SELECT reason, n_docs, CAST(sum_tokens AS BIGINT) AS sum_tokens,
       floor(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () * 10000.0)
       / 10000.0 AS share
FROM agg
"""


def pipeline_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel as ONE declarative plan:
    pretrain filter -> exact-dedup (keep-first) -> train/val/test hash
    split -> per-(split, source) corpus stats.

    This is the query a pipeline owner actually launches against 100 TB;
    composing it as a single DataFrame lets Catalyst share the scan and
    pipeline the stages (filter predicates and the fingerprint both
    compute in the same pass over ``text``), instead of materializing
    three intermediate corpora.  Stage costs: the filter's near-dup leg
    is the sub-quadratic inverted-index join; dedup adds one fingerprint
    shuffle; split is a pure per-row hash; the final aggregate is
    |splits|x|sources| rows.
    """
    from ..functions.hashing import hash64
    from ..functions.text import fingerprint
    from .curation import _SPLIT_SALT, _TRAIN_CUT, _VAL_CUT

    d = load_table(spark, sf_dir, "documents")
    decided = pipeline_pretrain_filter(spark, sf_dir) \
        .filter(F.col("keep")).select("doc_id", "n_tokens")
    kept = d.join(decided, "doc_id")
    first = F.min("doc_id").over(
        Window.partitionBy(fingerprint(F.col("text"))))
    canon = kept.withColumn("first_id", first) \
        .filter(F.col("doc_id") == F.col("first_id"))
    bucket = F.pmod(
        hash64(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(100))
    split = (
        F.when(bucket < _TRAIN_CUT, F.lit("train"))
        .when(bucket < _VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        canon.select(split.alias("split"), "source", "n_tokens")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


def _curation_e2e_oracle() -> str:
    from .curation import _BUCKET_SQL as bucket
    from .curation import _TRAIN_CUT, _VAL_CUT
    from .dedup import _NORM_SQL

    return f"""
WITH {_PIPELINE_CORE_SQL.strip()},
kept AS (
  SELECT d.doc_id, d.source, d.text, dec.n_tokens
  FROM decided dec JOIN documents d ON dec.doc_id = d.doc_id
  WHERE dec.reason = 'kept'
),
canon AS (
  SELECT doc_id, source, n_tokens
  FROM (
    SELECT doc_id, source, n_tokens,
           min(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS first_id
    FROM kept
  ) WHERE doc_id = first_id
),
labeled AS (
  SELECT CASE WHEN {bucket} < {_TRAIN_CUT} THEN 'train'
              WHEN {bucket} < {_VAL_CUT} THEN 'val'
              ELSE 'test' END AS split,
         source, n_tokens
  FROM canon
)
SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM labeled GROUP BY 1, 2
"""


def pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel, second generation — still ONE declarative
    plan: pretrain filter → policy-lexicon gate (drop flagged docs) →
    LM-fluency gate (drop the worst decile by bigram-LM cross-entropy;
    the p90 cut is a one-row broadcast scalar) → exact-dedup keep-first
    → hash split → per-(split, source) corpus stats.

    A document must carry an LM score to survive (< 2 tokens ⇒ no
    bigrams ⇒ dropped) — deliberate: un-scorable fragments are exactly
    what a pretraining mix excludes.  Stage costs on top of
    ``pipeline_curation_e2e``: the policy gate is a free per-row
    expression in the same scan; the LM gate adds the bigram-model
    joins (bigram-partitioned, never a funnel) plus the scalar cut.
    """
    from ..functions.hashing import hash64
    from ..functions.text import fingerprint
    from .curation import _SPLIT_SALT, _TRAIN_CUT, _VAL_CUT
    from .text import doc_lm_xent_proxy, doc_policy_flags

    d = load_table(spark, sf_dir, "documents")
    # ONE tokenization pass for the funnel's shingle (near-dup) and
    # bigram-LM legs: the regex split is the CPU-heaviest leaf and both
    # legs derive from the same (doc_id, t) arrays.
    tok_arrays = d.select("doc_id", tokens(F.col("text")).alias("t")) \
        .transform(cut_lineage)
    sh = _shingles(spark, sf_dir, toks=tok_arrays) \
        .transform(cut_lineage)
    decided = pipeline_pretrain_filter(spark, sf_dir, sh=sh) \
        .filter(F.col("keep")).select("doc_id", "n_tokens")
    unflagged = doc_policy_flags(spark, sf_dir) \
        .filter(F.col("flagged") == 0).select("doc_id")
    # Checkpoint: x feeds both the p90 cut and the gate join below —
    # without it the whole bigram-LM subtree would execute twice.
    x = doc_lm_xent_proxy(spark, sf_dir, toks=tok_arrays) \
        .select("doc_id", "mean_xent_q") \
        .transform(cut_lineage)
    # p90 via the distributed order-statistic helper: bit-identical to
    # the percentile aggregate, but the cut no longer buffers every
    # distinct quantized-xent value in one task (round-5 verdict's one
    # flagged scale weakness in this funnel).  The near-dup and policy
    # legs stay LAZY: they compile once inside the final action's
    # single plan and their stages already overlap there — r11 measured
    # that checkpointing them separately pays a per-subtree physical
    # compile (seconds of driver time for these expression trees) that
    # outweighs any §2.6 thread overlap at bench scale.
    from ..functions.quantiles import distributed_exact_quantiles
    cut = distributed_exact_quantiles(x, "mean_xent_q", [("p90", 0.9)])
    fluent = (
        x.crossJoin(F.broadcast(cut))
        .filter(F.expr("CAST(mean_xent_q AS DOUBLE) <= p90"))
        .select("doc_id")
    )
    kept = d.join(decided, "doc_id").join(unflagged, "doc_id") \
        .join(fluent, "doc_id")
    first = F.min("doc_id").over(
        Window.partitionBy(fingerprint(F.col("text"))))
    canon = kept.withColumn("first_id", first) \
        .filter(F.col("doc_id") == F.col("first_id"))
    bucket = F.pmod(
        hash64(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(100))
    split = (
        F.when(bucket < _TRAIN_CUT, F.lit("train"))
        .when(bucket < _VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        canon.select(split.alias("split"), "source", "n_tokens")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


def _curation_v2_oracle() -> str:
    from .curation import _BUCKET_SQL as bucket
    from .curation import _TRAIN_CUT, _VAL_CUT
    from .dedup import _NORM_SQL
    from .text import LM_XENT_ORACLE, POLICY_FLAGS_ORACLE

    return f"""
WITH {_PIPELINE_CORE_SQL.strip()},
policy AS ({POLICY_FLAGS_ORACLE.strip()}),
xent AS ({LM_XENT_ORACLE.strip()}),
cut AS (SELECT quantile_cont(CAST(mean_xent_q AS DOUBLE), 0.9) AS p90
        FROM xent),
kept AS (
  SELECT d.doc_id, d.source, d.text, dec.n_tokens
  FROM decided dec
  JOIN documents d ON dec.doc_id = d.doc_id
  JOIN policy p ON p.doc_id = d.doc_id AND p.flagged = 0
  JOIN xent x ON x.doc_id = d.doc_id
  CROSS JOIN cut
  WHERE dec.reason = 'kept'
    AND CAST(x.mean_xent_q AS DOUBLE) <= cut.p90
),
canon AS (
  SELECT doc_id, source, n_tokens
  FROM (
    SELECT doc_id, source, n_tokens,
           min(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS first_id
    FROM kept
  ) WHERE doc_id = first_id
),
labeled AS (
  SELECT CASE WHEN {bucket} < {_TRAIN_CUT} THEN 'train'
              WHEN {bucket} < {_VAL_CUT} THEN 'val'
              ELSE 'test' END AS split,
         source, n_tokens
  FROM canon
)
SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM labeled GROUP BY 1, 2
"""


#: Minimum DISTINCT shared shingles for the v3 decontamination drop.
#: Production decontamination thresholds overlap (long n-grams or a
#: minimum shared count) because a single short-shingle collision is
#: noise, not leakage — on this fixture's tiny synthetic vocabulary a
#: ≥1 rule would drop ~94% of sf0.1 (every 3-gram collides somewhere
#: in the eval slice); ≥8 drops the genuinely-overlapping tail (885 of
#: 4948 docs at sf0.1).  ``doc_decontaminate`` stays the per-doc
#: any-overlap REPORT; the funnel's drop rule is the thresholded one.
DECON_MIN_SHARED = 8


def pipeline_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel, third generation — the full pretraining
    corpus build: pretrain filter → policy gate → LM-fluency gate →
    eval-set DECONTAMINATION (drop the held-out slice and every
    training doc sharing ≥ DECON_MIN_SHARED distinct 3-grams with it) →
    exact-dedup keep-first → CLUSTER-KEYED leakage-free split (near-dup
    cluster labels from the dedup ladder's connected components;
    near-twins land in the same split by construction) →
    per-(split, source) corpus stats.

    v2 remains one declarative Catalyst plan; v3 adds the two
    eval-integrity stages a production corpus build cannot skip.  The
    plan is still declarative end-to-end except the bounded CC label
    loop (graph-diameter rounds over edge-incident docs only).  Stage
    cost on top of v2: the decontamination semi-join (eval shingles
    broadcast — the corpus is never shuffled for it) and the LSH+CC
    chain (collision-bounded, shared verbatim with
    ``dedup_connected_components``).

    Concurrency (guide §2.6 "overlap independent jobs"): the CC label
    loop is a chain of small sequential supersteps that leaves most of
    the cluster idle, and the scoring legs — the near-dup jaccard
    verification, the xent p90 cut, the decontamination semi-join — do
    not depend on it.  Those legs materialize from a 2-worker thread
    pool while the loop runs on the calling thread, so their tasks
    back-fill the executors the loop cannot fill; the final plan then
    joins already-materialized frames.  Values are unaffected (each leg
    is the same deterministic frame, just computed concurrently); a leg
    failure propagates through ``Future.result``.

    Scale caveat (r7 verdict #4): the fixture's eval slice is a ~1%
    MODULUS of the corpus, so the decontamination broadcast grows
    linearly with the corpus — it holds only while the eval shingle
    set fits the broadcast threshold.  A real benchmark suite is
    fixed-size (broadcast stays right); if the eval side scales with
    the corpus, drop the ``F.broadcast`` hint and let AQE pick a
    shuffle semi-join on ``shingle`` (keys move, documents never do).
    """
    from ..functions.hashing import hash64
    from ..functions.text import fingerprint
    from .curation import _SPLIT_SALT_CLUSTER, _TRAIN_CUT, _VAL_CUT
    from .dedup import dedup_connected_components
    from .text import doc_lm_xent_proxy, doc_policy_flags

    from .dedup import EVAL_MOD

    d = load_table(spark, sf_dir, "documents")
    # ONE tokenization pass for every token-derived leg, and ONE
    # tokenize+explode shingle frame for the three shingle consumers
    # (near-dup leg, decontamination leg, MinHash/CC chain): the lazy
    # checkpoints materialize each once; without them every leg re-runs
    # the regex tokenization — the CPU-heaviest leaf — from scratch
    # (measured ~0.56 s per shingle build at sf0.1).
    tok_arrays = d.select("doc_id", tokens(F.col("text")).alias("t")) \
        .transform(cut_lineage)
    sh = _shingles(spark, sf_dir, toks=tok_arrays) \
        .transform(cut_lineage)
    decided = pipeline_pretrain_filter(spark, sf_dir, sh=sh) \
        .filter(F.col("keep")).select("doc_id", "n_tokens")
    unflagged = doc_policy_flags(spark, sf_dir) \
        .filter(F.col("flagged") == 0).select("doc_id")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    # Thresholded decontamination (eval shingles broadcast; the corpus
    # is never shuffled for it): keep training docs sharing fewer than
    # DECON_MIN_SHARED distinct shingles with the eval slice, and drop
    # the eval slice itself.
    contaminated = (
        sh.filter(~is_eval)
        .join(F.broadcast(sh.filter(is_eval).select("shingle")
                          .distinct()), "shingle", "left_semi")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= DECON_MIN_SHARED)
        .select("doc_id")
    )
    # §2.6 overlap — of the two EAGER phases only.  This operator's
    # plan-construction runs two driver-orchestrated chains that each
    # serialize small jobs and plan compiles: the CC label loop and the
    # xent p90 order statistic.  They are independent, so the fluency
    # leg runs on one worker thread while the CC loop runs here; both
    # finish before the returned plan is assembled.  The scoring legs
    # that are NOT eager (near-dup jaccard, decontamination, policy)
    # deliberately stay lazy: they compile once inside the final
    # action's single plan and Spark already overlaps their stages
    # there — r11 measured that checkpointing them separately pays a
    # per-subtree physical compile (seconds of driver time for these
    # expression trees) that outweighs the thread overlap.
    from concurrent.futures import ThreadPoolExecutor

    from ..functions.quantiles import distributed_exact_quantiles

    sc = spark.sparkContext
    # Both threads consume sh — materialize it once before forking so
    # they reuse blocks instead of racing to build them.
    sc.setJobDescription("curation_v3: shared shingle frame")
    sh.count()

    def _fluency_leg() -> tuple[DataFrame, DataFrame]:
        sc.setJobDescription("curation_v3: xent p90 cut")
        xf = doc_lm_xent_proxy(spark, sf_dir, toks=tok_arrays) \
            .select("doc_id", "mean_xent_q") \
            .transform(cut_lineage)
        return xf, distributed_exact_quantiles(xf, "mean_xent_q",
                                               [("p90", 0.9)])

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut_flu = pool.submit(_fluency_leg)
        sc.setJobDescription("curation_v3: CC label loop")
        cc = dedup_connected_components(spark, sf_dir, sh=sh)
        x, cut = fut_flu.result()
    sc.setJobDescription(None)
    fluent = (
        x.crossJoin(F.broadcast(cut))
        .filter(F.expr("CAST(mean_xent_q AS DOUBLE) <= p90"))
        .select("doc_id")
    )
    clean = d.filter(~is_eval).select("doc_id") \
        .join(contaminated, "doc_id", "left_anti")
    kept = d.join(decided, "doc_id").join(unflagged, "doc_id") \
        .join(fluent, "doc_id").join(clean, "doc_id")
    first = F.min("doc_id").over(
        Window.partitionBy(fingerprint(F.col("text"))))
    canon = kept.withColumn("first_id", first) \
        .filter(F.col("doc_id") == F.col("first_id")) \
        .select("doc_id", "source", "n_tokens")
    bucket = F.pmod(
        hash64(F.concat(F.lit(_SPLIT_SALT_CLUSTER),
                        F.col("cluster_id").cast("string"))),
        F.lit(100))
    split = (
        F.when(bucket < _TRAIN_CUT, F.lit("train"))
        .when(bucket < _VAL_CUT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        canon.join(cc, "doc_id")
        .select(split.alias("split"), "source", "n_tokens")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )


def _curation_v3_oracle() -> str:
    from ..functions.hashing import hash64_sql
    from .curation import _SPLIT_SALT_CLUSTER, _TRAIN_CUT, _VAL_CUT
    from .dedup import _CC_ORACLE_WITH, _NORM_SQL, _SHINGLES_SQL, EVAL_MOD
    from .text import LM_XENT_ORACLE, POLICY_FLAGS_ORACLE

    # The CC chain and the pipeline core both embed the shingles CTE;
    # compose by taking the full CC WITH-block and appending the core
    # with its duplicate shingles definition stripped.
    cc_body = _CC_ORACLE_WITH.strip()
    assert cc_body.startswith("WITH ")
    cc_body = cc_body[len("WITH "):]
    core = _PIPELINE_CORE_SQL.strip()
    prefix = _SHINGLES_SQL.strip() + ","
    assert core.startswith(prefix)
    core_rest = core[len(prefix):].strip()
    expr = f"'{_SPLIT_SALT_CLUSTER}' || CAST(cluster_id AS VARCHAR)"
    cbucket = f"CAST({hash64_sql(expr)} % 100 AS INT)"
    return f"""
WITH {cc_body},
{core_rest},
policy AS ({POLICY_FLAGS_ORACLE.strip()}),
xent AS ({LM_XENT_ORACLE.strip()}),
cut AS (SELECT quantile_cont(CAST(mean_xent_q AS DOUBLE), 0.9) AS p90
        FROM xent),
contaminated AS (
  SELECT doc_id FROM shingles
  WHERE doc_id % {EVAL_MOD} <> 0
    AND shingle IN (SELECT shingle FROM shingles
                    WHERE doc_id % {EVAL_MOD} = 0)
  GROUP BY doc_id HAVING count(*) >= {DECON_MIN_SHARED}
),
kept AS (
  SELECT d.doc_id, d.source, d.text, dec.n_tokens
  FROM decided dec
  JOIN documents d ON dec.doc_id = d.doc_id
  JOIN policy p ON p.doc_id = d.doc_id AND p.flagged = 0
  JOIN xent x ON x.doc_id = d.doc_id
  CROSS JOIN cut
  WHERE dec.reason = 'kept'
    AND CAST(x.mean_xent_q AS DOUBLE) <= cut.p90
    AND d.doc_id % {EVAL_MOD} <> 0
    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
canon AS (
  SELECT doc_id, source, n_tokens
  FROM (
    SELECT doc_id, source, n_tokens,
           min(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS first_id
    FROM kept
  ) WHERE doc_id = first_id
),
cl AS (
  SELECT c.doc_id, c.source, c.n_tokens,
         CASE WHEN {cbucket} < {_TRAIN_CUT} THEN 'train'
              WHEN {cbucket} < {_VAL_CUT} THEN 'val'
              ELSE 'test' END AS split
  FROM canon c JOIN labels l ON c.doc_id = l.doc_id
)
SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM cl GROUP BY 1, 2
"""


SPECS: dict[str, QuerySpec] = {
    "pipeline_curation_v3": QuerySpec(pipeline_curation_v3,
                                      _curation_v3_oracle()),
    "doc_unigram_logprob": QuerySpec(doc_unigram_logprob,
                                     UNIGRAM_LOGPROB_ORACLE),
    "pipeline_curation_v2": QuerySpec(pipeline_curation_v2,
                                      _curation_v2_oracle()),
    "pipeline_curation_e2e": QuerySpec(pipeline_curation_e2e,
                                       _curation_e2e_oracle()),
    "pipeline_pretrain_filter": QuerySpec(pipeline_pretrain_filter,
                                          PIPELINE_FILTER_ORACLE),
    "pipeline_filter_stats": QuerySpec(pipeline_filter_stats,
                                       PIPELINE_STATS_ORACLE),
}
