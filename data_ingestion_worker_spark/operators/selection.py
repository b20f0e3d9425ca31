"""Model-based training-data selection over ``documents``.

The reference (rpdevelops/data-ingestion-worker) validates rows with
hand-written predicates (src/services/validation_service.py); a 100 TB
pretraining pipeline replaces those with *learned* selectors.  This
module implements the three published selector shapes end to end, each
closed-form-trainable inside the engine (no external model artifact)
and each verifiable against a DuckDB oracle:

- :func:`doc_quality_classifier` — the GPT-3/CCNet-style quality gate:
  a multinomial Naive-Bayes classifier trained to separate a curated
  reference source from the rest of the crawl, applied back to every
  document as a log-likelihood-ratio score.
- :func:`corpus_dsir_resample` — DSIR (Xie et al., NeurIPS 2023,
  "Data Selection for Language Models via Importance Resampling"):
  hashed-bigram importance weights between a target-domain distribution
  and the raw corpus, then Gumbel top-k sampling without replacement.
- :func:`sample_priority_ppswor` — priority sampling (Duffield, Lund &
  Thorup, JACM 2007): a single bottom-k-style pass that yields a
  weight-proportional sample *and* its Horvitz–Thompson threshold
  estimator.

Determinism: every model count is an exact integer; every log term is
floor-quantized on its own row before any sum (the ``doc_lm_xent_proxy``
convention), and random draws are ``hash64`` uniforms — re-shard-stable
and reproducible bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..functions.quantiles import distributed_exact_quantiles
from ..functions.text import tokens
from ..spec import QuerySpec
from ..tables import load_table
from .text import _TOKENS_SQL
from ..functions.checkpoint import cut_lineage

#: Curated "reference corpus" source for the NB quality classifier
#: (config in a real deployment — GPT-3 used WebText as this class).
NB_REF_SOURCE = "src0"

#: Per-token NB log-likelihood-ratio term, floor-quantized to 1e-4 bits
#: on its own row — ONE fragment shared verbatim by both engines over
#: (cpos, cneg, npos, nneg, v) integer columns.  Add-one smoothing over
#: the shared vocabulary V keeps both class likelihoods proper.
_NB_TERM = (
    "CAST(floor(CAST(10000 AS DOUBLE) * ("
    "log2(CAST(cpos + 1 AS DOUBLE) / CAST(npos + v AS DOUBLE))"
    " - log2(CAST(cneg + 1 AS DOUBLE) / CAST(nneg + v AS DOUBLE))"
    ")) AS BIGINT)"
)


def nb_token_model(d: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the NB token model from a labeled ``documents`` frame.

    Returns ``(toks, model, totals)``: the exploded (doc_id, is_ref,
    token) rows (lazily checkpointed — callers that also score reuse the
    explode), the per-token class-count table, and the one-row
    (npos, nneg, v) totals.  Shared by the batch classifier and the
    streaming gate (``streaming/windows.py::nb_score_stream``) so both
    planes score under exactly one model definition.
    """
    toks = (
        d.select(
            "doc_id",
            (F.col("source") == NB_REF_SOURCE).alias("is_ref"),
            F.explode(tokens(F.col("text"))).alias("token"),
        )
        .transform(cut_lineage)   # feeds model counts AND scoring
    )
    model = toks.groupBy("token").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("cpos"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("cneg"),
    )
    tot = model.agg(
        F.sum("cpos").alias("npos"),
        F.sum("cneg").alias("nneg"),
        F.count(F.lit(1)).alias("v"),
    )
    return toks, model, tot


def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes quality score for every document: the log-likelihood
    ratio of its tokens under a "curated reference" unigram model vs a
    "rest of crawl" model — the classifier-based quality gate of the
    GPT-3 / CCNet data pipelines, trained and applied in one job.

    Training is two exact hash aggregates (per-token class counts);
    the vocabulary size and class totals are a one-row broadcast
    scalar.  Scoring joins each token occurrence back to its model row
    on the token key — the same partitioning the count aggregate just
    produced, so at 100 TB the model table shards by token and never
    funnels.  Each token's LLR term is floor-quantized to 1e-4 bits on
    its own row; per-document sums are therefore shuffle-order-proof.
    """
    d = load_table(spark, sf_dir, "documents")
    toks, model, tot = nb_token_model(d)
    scored = (
        toks.join(model, "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(_NB_TERM).alias("term"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("term").alias("llr_q"),
        (F.sum("term") > 0).alias("pred_ref"),
    )


QUALITY_CLASSIFIER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, (source = '{NB_REF_SOURCE}') AS is_ref,
         unnest({_TOKENS_SQL}) AS token
  FROM documents
),
model AS (
  SELECT token,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cpos,
         sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cneg
  FROM toks GROUP BY 1
),
tot AS (
  SELECT sum(cpos) AS npos, sum(cneg) AS nneg, count(*) AS v FROM model
),
scored AS (
  SELECT doc_id, {_NB_TERM} AS term
  FROM toks JOIN model USING (token) CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(term) AS BIGINT) AS llr_q,
       sum(term) > 0 AS pred_ref
FROM scored GROUP BY 1
"""


#: DSIR hashed-feature space size (the paper's memory-bounding trick:
#: model size is B buckets regardless of corpus vocabulary).
DSIR_BUCKETS = 4096
#: Documents drawn by the Gumbel top-k resample.
DSIR_K = 16
#: Target-domain predicate: which documents define p_target (config —
#: the paper uses the downstream task's distribution).
DSIR_TARGET_LANG = "en"

#: Per-feature-occurrence importance term (log₂ p_target − log₂ p_raw,
#: add-one smoothing over the B buckets), floor-quantized to 1e-4 bits.
_DSIR_TERM = (
    "CAST(floor(CAST(10000 AS DOUBLE) * ("
    f"log2(CAST(ct + 1 AS DOUBLE) / CAST(nt + {DSIR_BUCKETS} AS DOUBLE))"
    f" - log2(CAST(cr + 1 AS DOUBLE) / CAST(nr + {DSIR_BUCKETS} AS DOUBLE))"
    ")) AS BIGINT)"
)

#: Gumbel-top-k sampling key over (logw_q, h): ln w + Gumbel(0,1) with
#: the Gumbel drawn from the 60-bit hash uniform u ∈ (0,1] — sampling
#: without replacement with probability ∝ w (Efraimidis–Spirakis via
#: the Gumbel-max trick), floor-quantized to 1e-4.
_DSIR_KEY = (
    "CAST(floor(("
    "CAST(logw_q AS DOUBLE) / CAST(10000 AS DOUBLE)"
    " * CAST(0.6931471805599453 AS DOUBLE)"
    " - ln(-ln(CAST(h + 1 AS DOUBLE)"
    " / CAST(1152921504606846976 AS DOUBLE)))"
    ") * CAST(10000 AS DOUBLE)) AS BIGINT)"
)


def corpus_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: importance-resample the corpus toward a target domain.

    Importance weights: each document's hashed-word-bigram features are
    scored under two add-one-smoothed multinomials — p_target (bigrams
    of the target-language documents) and p_raw (bigrams of the whole
    corpus) — giving ``log w(doc) = Σ_features log(p_t/p_r)``; then
    Gumbel top-k selects ``DSIR_K`` documents without replacement with
    probability ∝ w (the paper's resampling step, derandomized through
    the ``hash64`` uniform so both engines draw identical samples).

    Scale shape: the feature model is AT MOST ``DSIR_BUCKETS`` rows no
    matter the corpus size (the paper's hashing trick) — it broadcasts
    to the scoring scan, so the whole weight computation is one explode
    + one constant-size-broadcast join + one per-doc sum; the top-k is
    TakeOrderedAndProject.  Documents with fewer than 2 tokens have no
    features and are excluded (their weight is undefined).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    bigs = (
        toks.select(
            "doc_id",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_t"),
            F.explode(F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat_ws(' ', element_at(t, i), "
                "element_at(t, i + 1)))"
            )).alias("bg"),
        )
        .select(
            "doc_id", "is_t",
            (hash64(F.col("bg")) % DSIR_BUCKETS).alias("b"),
        )
        .transform(cut_lineage)   # feeds the model AND scoring
    )
    model = bigs.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tot = model.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    weights = (
        bigs.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr(_DSIR_TERM).alias("term"))
        .groupBy("doc_id")
        .agg(F.sum("term").alias("logw_q"))
    )
    keyed = (
        weights.join(d.select("doc_id", "lang"), "doc_id")
        .withColumn(
            "h",
            hash64(F.concat(F.lit("dsir:"),
                            F.col("doc_id").cast("string"))),
        )
        .select("doc_id", "lang", "logw_q",
                F.expr(_DSIR_KEY).alias("key_q"))
    )
    return keyed.orderBy(
        F.col("key_q").desc(), F.col("doc_id").asc()
    ).limit(DSIR_K)


DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_TOKENS_SQL} AS t FROM documents
),
bigs AS (
  SELECT doc_id, (lang = '{DSIR_TARGET_LANG}') AS is_t,
         {hash64_sql("t[i] || ' ' || t[i + 1]")} % {DSIR_BUCKETS} AS b
  FROM toks, unnest(range(1, len(t))) AS gs(i)
  WHERE len(t) >= 2
),
model AS (
  SELECT b,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM bigs GROUP BY 1
),
tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM model),
weights AS (
  SELECT doc_id, CAST(sum(term) AS BIGINT) AS logw_q FROM (
    SELECT doc_id, {_DSIR_TERM} AS term
    FROM bigs JOIN model USING (b) CROSS JOIN tot
  ) GROUP BY 1
),
keyed AS (
  SELECT w.doc_id, d.lang, w.logw_q,
         {hash64_sql("'dsir:' || CAST(w.doc_id AS VARCHAR)")} AS h
  FROM weights w JOIN documents d ON w.doc_id = d.doc_id
)
SELECT doc_id, lang, logw_q, {_DSIR_KEY} AS key_q
FROM keyed
ORDER BY key_q DESC, doc_id ASC
LIMIT {DSIR_K}
"""


#: Priority-sample size.
PPSWOR_K = 12

#: Log-space priority: ln(w) − ln(u) with u the 60-bit hash uniform in
#: (0,1] — the log of Duffield–Lund–Thorup's w/u priority (monotone, so
#: selection and threshold are unchanged; log keeps magnitudes finite).
_PPSWOR_LPRI = (
    "ln(CAST(greatest(n_chars, 1) AS DOUBLE))"
    " - ln(CAST(h + 1 AS DOUBLE)"
    " / CAST(1152921504606846976 AS DOUBLE))"
)


def sample_priority_ppswor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (PPSWOR): a size-``PPSWOR_K``
    weight-proportional without-replacement sample of the corpus with
    its Horvitz–Thompson estimator, in one pass.

    Each document gets priority ``w/u`` (w = ``n_chars``, u a
    deterministic hash uniform); the k highest priorities are the
    sample and the (k+1)-th priority τ is the estimation threshold:
    ``max(w, τ)`` is the unbiased per-item weight estimate (Duffield,
    Lund & Thorup, JACM 2007 — variance-optimal among k+1-sparse
    schemes).  Everything is carried in log space (monotone), and both
    readouts are floor-quantized at 1e-4.

    Scale shape: both the sample and the threshold come from
    TakeOrderedAndProject heads (k and k+1 rows) over one scan — each
    partition keeps a local top-k, the driver merges k·P rows; τ
    re-attaches as a one-row broadcast scalar.  No global sort, no
    window.
    """
    d = load_table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id", "n_chars",
            hash64(F.concat(F.lit("pri:"),
                            F.col("doc_id").cast("string"))).alias("h"),
        )
        .select("doc_id", "n_chars", F.expr(_PPSWOR_LPRI).alias("lpri"))
        .transform(cut_lineage)   # feeds the k and k+1 heads
    )
    ordered = base.orderBy(F.col("lpri").desc(), F.col("doc_id").asc())
    tau = ordered.limit(PPSWOR_K + 1).agg(F.min("lpri").alias("tau_l"))
    return (
        ordered.limit(PPSWOR_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id", "n_chars",
            F.expr("CAST(floor(lpri * CAST(10000 AS DOUBLE)) AS BIGINT)")
            .alias("lpri_q"),
            F.expr(
                "CAST(floor(greatest("
                "ln(CAST(greatest(n_chars, 1) AS DOUBLE)), tau_l)"
                " * CAST(10000 AS DOUBLE)) AS BIGINT)"
            ).alias("est_lnw_q"),
        )
    )


PPSWOR_ORACLE = f"""
WITH base AS (
  SELECT doc_id, n_chars, {_PPSWOR_LPRI} AS lpri FROM (
    SELECT doc_id, n_chars,
           {hash64_sql("'pri:' || CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
  )
),
topk1 AS (
  SELECT * FROM base ORDER BY lpri DESC, doc_id ASC LIMIT {PPSWOR_K + 1}
),
tau AS (SELECT min(lpri) AS tau_l FROM topk1),
sel AS (
  SELECT * FROM base ORDER BY lpri DESC, doc_id ASC LIMIT {PPSWOR_K}
)
SELECT doc_id, n_chars,
       CAST(floor(lpri * CAST(10000 AS DOUBLE)) AS BIGINT) AS lpri_q,
       CAST(floor(greatest(ln(CAST(greatest(n_chars, 1) AS DOUBLE)),
            tau_l) * CAST(10000 AS DOUBLE)) AS BIGINT) AS est_lnw_q
FROM sel CROSS JOIN tau
"""


#: Calibration deciles of the classifier score.
CAL_CUTS = 9

_CAL_BUCKET = "1 + " + " + ".join(
    f"CAST(llr_q > c{k} AS INT)" for k in range(1, CAL_CUTS + 1)
)


def corpus_quality_calibration(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Calibration curve of :func:`doc_quality_classifier`: bucket every
    scored document into a decile of the LLR score, then report the
    actual reference-class rate per bucket — the reliability diagram a
    pipeline owner reads before trusting the classifier as a filter
    (a well-ranked score shows ``ref_rate_ppm`` rising monotonically
    with the bucket).

    Scale shape: decile cuts come from the distributed order-statistic
    helper (range repartition + offset broadcast, no corpus-wide
    single-reducer buffer) and re-attach as a one-row broadcast scalar;
    the curve itself is a 10-row aggregate.
    """
    scored = doc_quality_classifier(spark, sf_dir).select(
        "doc_id", "llr_q"
    )
    labels = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("source") == NB_REF_SOURCE).alias("is_ref")
    )
    j = scored.join(labels, "doc_id") \
        .transform(cut_lineage)   # feeds the cut row + assignment
    cuts = distributed_exact_quantiles(
        j, "llr_q",
        [(f"c{k}", k / (CAL_CUTS + 1)) for k in range(1, CAL_CUTS + 1)],
    )
    b = j.crossJoin(F.broadcast(cuts)).select(
        "is_ref", F.expr(_CAL_BUCKET).alias("bucket")
    )
    out = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
    )
    return out.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_docs", "n_ref",
        F.expr("(n_ref * 1000000) div n_docs").alias("ref_rate_ppm"),
    )


QUALITY_CALIBRATION_ORACLE = f"""
WITH scored AS ({QUALITY_CLASSIFIER_ORACLE}),
j AS (
  SELECT s.doc_id, s.llr_q, (d.source = '{NB_REF_SOURCE}') AS is_ref
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id
),
cuts AS (
  SELECT {", ".join(
      f"quantile_cont(llr_q, {k / (CAL_CUTS + 1)}) AS c{k}"
      for k in range(1, CAL_CUTS + 1))}
  FROM j
),
b AS (SELECT is_ref, {_CAL_BUCKET} AS bucket FROM j CROSS JOIN cuts),
agg AS (
  SELECT bucket, count(*) AS n_docs,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref
  FROM b GROUP BY 1
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_ref * 1000000 // n_docs AS BIGINT) AS ref_rate_ppm
FROM agg
"""


#: Out-of-fold target encoding: fold count and the hash salt (distinct
#: from the split/kfold salts so encodings never correlate with splits).
TE_FOLDS = 5
_TE_SALT = "te:"


def feat_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold out-of-fold target encoding of ``event_type`` against the
    milli-quantized event value — the leakage-free categorical feature
    every tabular training pipeline ships: a row's own fold is EXCLUDED
    from the mean it receives, so the encoding never memorizes the row's
    target.  Output is the (category × fold) encoding table itself (the
    broadcast-join artifact, constant-size per category), with the
    global out-of-fold prior as the fallback for categories absent from
    the out-fold — the standard cold-start rule.

    Exactness: out-of-fold mean = (S_cat − S_cat,fold) / (n_cat −
    n_cat,fold) from integer milli sums — subtraction instead of a
    second pass, one aggregate over (category, fold) rows.  Integer
    div (floor) keeps the readout bit-identical cross-engine.

    Scale: one hash aggregate on (category, fold) — combiner-friendly,
    output is k × |categories| rows however large the fact table is.
    """
    ev = load_table(spark, sf_dir, "events")
    milli = F.floor(F.col("value") * 1000).cast("long")
    fold = F.pmod(
        hash64(F.concat(F.lit(_TE_SALT), F.col("event_id").cast("string"))),
        F.lit(TE_FOLDS),
    ).cast("int")
    cells = (
        ev.select(F.col("event_type").alias("category"),
                  fold.alias("fold"), milli.alias("v"))
        .groupBy("category", "fold")
        .agg(F.count(F.lit(1)).alias("n_infold"),
             F.sum("v").alias("s_infold"))
        .transform(cut_lineage)  # consumed twice (cells + prior)
    )
    w_cat = Window.partitionBy("category")
    glob = cells.agg(F.sum("n_infold").alias("gn"),
                     F.sum("s_infold").alias("gs"))
    with_tot = cells.crossJoin(F.broadcast(glob)).select(
        "category", "fold", "n_infold",
        (F.sum("n_infold").over(w_cat) - F.col("n_infold"))
        .alias("n_outfold"),
        (F.sum("s_infold").over(w_cat) - F.col("s_infold"))
        .alias("s_outfold"),
        (F.col("gn") - F.col("n_infold")).alias("n_gout"),
        (F.col("gs") - F.col("s_infold")).alias("s_gout"),
    )
    oof = F.when(
        F.col("n_outfold") > 0,
        F.expr("s_outfold div n_outfold"),
    ).otherwise(F.expr("s_gout div n_gout"))
    return with_tot.select(
        "category", "fold",
        F.col("n_infold").cast("long").alias("n_infold"),
        F.col("n_outfold").cast("long").alias("n_outfold"),
        oof.cast("long").alias("oof_mean_milli"),
    )


TARGET_ENCODE_ORACLE = f"""
WITH cells AS (
  SELECT event_type AS category,
         CAST({hash64_sql("'" + _TE_SALT + "' || CAST(event_id AS VARCHAR)")}
              % {TE_FOLDS} AS INT) AS fold,
         count(*) AS n_infold,
         sum(CAST(floor(value * 1000) AS BIGINT)) AS s_infold
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT category, fold, n_infold,
         sum(n_infold) OVER (PARTITION BY category) - n_infold AS n_outfold,
         sum(s_infold) OVER (PARTITION BY category) - s_infold AS s_outfold,
         sum(n_infold) OVER () - n_infold AS n_gout,
         sum(s_infold) OVER () - s_infold AS s_gout
  FROM cells
)
SELECT category, fold,
       CAST(n_infold AS BIGINT) AS n_infold,
       CAST(n_outfold AS BIGINT) AS n_outfold,
       CAST(CASE WHEN n_outfold > 0 THEN s_outfold // n_outfold
                 ELSE s_gout // n_gout END AS BIGINT) AS oof_mean_milli
FROM tot
"""


def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value of
    ``o_orderpriority`` against the binary target "order contains a
    returned line" — the credit-scoring-standard categorical encoder
    and its feature-screening companion (IV rule-of-thumb: <0.02
    useless, 0.1–0.3 medium, >0.5 suspicious).  Complements
    :func:`feat_target_encode_oof`: target-encoding ships a mean, WOE
    ships a log-odds SHIFT, which is what logistic-family models
    consume, and IV says whether the feature is worth a slot at all.

    Exactness: bin counts are exact integers from one aggregate;
    ``WOE_b = ln g_b − ln G − ln b_b + ln B`` is ln of exact BIGINTs
    (the MI/Theil transcendental convention, floored at 6 per row);
    each bin's IV term ``(g_b/G − b_b/B)·WOE_b`` is floored to micro
    units on its own row so the IV total is an order-free BIGINT sum.
    Bins with a zero class count would need Laplace smoothing (WOE is
    undefined there) — such bins are excluded and would surface via
    ``n_bins``; the 5-priority domain never triggers it.

    Scale: one semi-join flag (returned lines → orders, shuffle on the
    FK), one 5-row aggregate; everything after is constant-size.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey")).distinct()
    )
    flagged = o.join(
        returned.withColumn("bad", F.lit(1)), "o_orderkey", "left"
    ).select("o_orderpriority", F.coalesce("bad", F.lit(0)).alias("bad"))
    bins = flagged.groupBy("o_orderpriority").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    ).filter((F.col("n_good") > 0) & (F.col("n_bad") > 0))
    tot = bins.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"),
                   F.count(F.lit(1)).cast("int").alias("n_bins"))
    j = bins.crossJoin(F.broadcast(tot))
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    woe = (ln(F.col("n_good")) - ln(F.col("g"))
           - ln(F.col("n_bad")) + ln(F.col("b")))
    share = (F.col("n_good").cast("double") / F.col("g").cast("double")
             - F.col("n_bad").cast("double") / F.col("b").cast("double"))
    iv_micro = F.floor(share * woe * 1000000.0).cast("long")
    f6 = lambda c: F.floor(c * 1000000.0) / 1000000.0  # noqa: E731
    terms = j.select(
        "o_orderpriority", "n_good", "n_bad", "n_bins",
        f6(woe).alias("woe"), iv_micro.alias("iv_micro"),
    ).transform(cut_lineage)    # feeds rows AND the total
    iv_tot = terms.agg(F.sum("iv_micro").alias("iv_sum"))
    return terms.crossJoin(F.broadcast(iv_tot)).select(
        "o_orderpriority", "n_good", "n_bad", "n_bins",
        "woe",
        (F.col("iv_micro").cast("double") / 1000000.0).alias("iv_term"),
        (F.col("iv_sum").cast("double") / 1000000.0).alias("iv_total"),
    )


WOE_IV_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
  WHERE l_returnflag = 'R'
),
flagged AS (
  SELECT o.o_orderpriority,
         CASE WHEN r.o_orderkey IS NULL THEN 0 ELSE 1 END AS bad
  FROM orders o LEFT JOIN returned r USING (o_orderkey)
),
bins AS (
  SELECT o_orderpriority,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM flagged GROUP BY 1
  HAVING sum(1 - bad) > 0 AND sum(bad) > 0
),
tot AS (
  SELECT CAST(sum(n_good) AS BIGINT) AS g,
         CAST(sum(n_bad) AS BIGINT) AS b,
         CAST(count(*) AS INT) AS n_bins
  FROM bins
),
terms AS (
  SELECT o_orderpriority, n_good, n_bad, n_bins,
         floor((ln(CAST(n_good AS DOUBLE)) - ln(CAST(g AS DOUBLE))
                - ln(CAST(n_bad AS DOUBLE)) + ln(CAST(b AS DOUBLE)))
               * 1000000.0) / 1000000.0 AS woe,
         floor((CAST(n_good AS DOUBLE) / CAST(g AS DOUBLE)
                - CAST(n_bad AS DOUBLE) / CAST(b AS DOUBLE))
               * (ln(CAST(n_good AS DOUBLE)) - ln(CAST(g AS DOUBLE))
                  - ln(CAST(n_bad AS DOUBLE)) + ln(CAST(b AS DOUBLE)))
               * 1000000.0)::BIGINT AS iv_micro
  FROM bins CROSS JOIN tot
)
SELECT o_orderpriority, n_good, n_bad, n_bins, woe,
       CAST(iv_micro AS DOUBLE) / 1000000.0 AS iv_term,
       CAST(sum(iv_micro) OVER () AS DOUBLE) / 1000000.0 AS iv_total
FROM terms
"""


SPECS: dict[str, QuerySpec] = {
    "feat_woe_iv": QuerySpec(feat_woe_iv, WOE_IV_ORACLE),
    "feat_target_encode_oof": QuerySpec(feat_target_encode_oof,
                                        TARGET_ENCODE_ORACLE),
    "doc_quality_classifier": QuerySpec(doc_quality_classifier,
                                        QUALITY_CLASSIFIER_ORACLE),
    "corpus_quality_calibration": QuerySpec(corpus_quality_calibration,
                                            QUALITY_CALIBRATION_ORACLE),
    "corpus_dsir_resample": QuerySpec(corpus_dsir_resample, DSIR_ORACLE),
    "sample_priority_ppswor": QuerySpec(sample_priority_ppswor,
                                        PPSWOR_ORACLE),
}
