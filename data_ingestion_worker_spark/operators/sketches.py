"""Mergeable sketch operators — the 100 TB path for distinct counts,
heavy hitters, membership and reproducible sampling.

At warehouse scale the exact forms of these queries all funnel through a
giant shuffle on the full key domain; the sketch forms are *algebraic
aggregates* (each partition builds a partial sketch, partials merge
associatively), so the shuffle carries kilobytes instead of the key
domain:

- **KMV (k minimum values)** distinct estimator: the k smallest 60-bit
  hashes of a key set; union of sketches = k smallest of the union;
  estimate = (k-1) * 2^60 / h_k.
- **Count-Min**: d x w counter grid; counters add pointwise; point query
  = min over d rows — always an overestimate, never under.
- **Bloom filter**: m-bit membership; bits OR pointwise; the classic
  pre-join filter (Spark's own runtime bloom pruning is the built-in
  twin; this operator makes the false-positive contract *visible* and
  verifiable).
- **Bottom-k hash sample**: the k smallest keyed hashes — a deterministic,
  merge-friendly sample (union = k smallest of union), which is how a
  pipeline pins a reproducible eval subset of a 100 TB corpus.

Everything is built on the md5-derived :func:`hash64` so the DuckDB
oracles reproduce each sketch bit-for-bit (engine-native murmur hashes
would be faster but unverifiable across engines; swapping
``xxhash64`` in is a one-line change per operator at deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash64, hash64_sql
from ..functions.text import tokens
from ..spec import QuerySpec
from ..tables import load_table
from ..functions.checkpoint import cut_lineage

KMV_K = 64          # KMV sketch size
CMS_D, CMS_W = 4, 256   # Count-Min depth x width
BLOOM_M, BLOOM_K = 4096, 3  # Bloom bits / hash functions
SAMPLE_K = 100      # bottom-k sample size
TOP_N = 20          # heavy hitters reported

_TWO60 = float(1 << 60)   # 63 * 2^60 is exactly representable in a double

_TOKENS_SQL = ("CASE WHEN length(trim(lower(text))) = 0 THEN []::VARCHAR[] "
               "ELSE string_split_regex(trim(lower(text)), '\\s+') END")

#: (source, shingle) distinct word-3-grams — the KMV key domain.
_SRC_SHINGLES_SQL = f"""
sh AS (
  SELECT DISTINCT source,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (SELECT source, {_TOKENS_SQL} AS toks FROM documents),
       unnest(range(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 3
)
"""


def _src_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.expr(
        "CASE WHEN length(trim(lower(text))) = 0 THEN array() "
        "ELSE split(trim(lower(text)), '\\\\s+') END"
    )
    sh = F.expr(
        "transform(sequence(0, size(toks) - 3), "
        "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    )
    return (
        d.select("source", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("source", F.explode(F.array_distinct(sh)).alias("shingle"))
        .distinct()
    )


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-shingle estimate from a KMV sketch, with the
    exact count and relative error alongside.

    Two-phase bounded top-k, one scan, no rank window: phase 1 groups by
    (source, spark_partition_id()) and keeps each group's k smallest
    hashes plus its row count; phase 2 merges the k-sized sorted states
    per source and sums the counts.  ``source`` is low-cardinality, so a
    per-source rank window would funnel every shingle hash of a source
    into ONE task's sort; grouping by the *physical partition id* instead
    caps every phase-1 group at one input partition (maxPartitionBytes
    governs it — no salt constant to outgrow), the partial aggregation
    completes map-side (each task holds exactly its own pid), and the
    shuffle carries only |sources| × |partitions| k-sized states.  The
    pid is run-dependent, but the merged k-minima of a union are
    grouping-invariant, so the output is deterministic — the sketch's
    merge property doing the work.
    """
    sh = _src_shingles(spark, sf_dir).select(
        "source", hash64(F.col("shingle")).alias("h")
    )
    mins = (
        sh.groupBy("source", F.spark_partition_id().alias("salt"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.slice(F.array_sort(F.collect_list("h")), 1, KMV_K)
            .alias("mins"),
        )
    )
    kth = (
        mins.groupBy("source")
        .agg(
            F.sum("c").alias("exact_distinct"),
            F.get(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("mins"))),
                    1, KMV_K,
                ),
                KMV_K - 1,
            ).alias("hk"),
        )
        .filter(F.col("hk").isNotNull())
        .select("source", "exact_distinct", "hk")
    )
    est = F.floor(
        F.lit(float(KMV_K - 1) * _TWO60) / F.col("hk").cast("double")
    ).cast("bigint")
    return kth.select(
        "source", "exact_distinct", est.alias("kmv_est"),
        (F.floor(
            F.abs(est.cast("double") - F.col("exact_distinct"))
            / F.col("exact_distinct") * 10000.0
        ) / 10000.0).alias("rel_err"),
    )


KMV_ORACLE = f"""
WITH {_SRC_SHINGLES_SQL.strip()},
hashed AS (
  SELECT source, {hash64_sql('shingle')} AS h FROM sh
),
exact AS (SELECT source, count(*) AS exact_distinct FROM sh GROUP BY 1),
kth AS (
  SELECT source, h AS hk FROM (
    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r
    FROM hashed
  ) WHERE r = {KMV_K}
),
scored AS (
  SELECT exact.source AS source,
         CAST(exact_distinct AS BIGINT) AS exact_distinct,
         CAST(floor({float(KMV_K - 1)} * {_TWO60} / CAST(hk AS DOUBLE))
              AS BIGINT) AS kmv_est
  FROM exact JOIN kth ON kth.source = exact.source
)
SELECT source, exact_distinct, kmv_est,
       floor(abs(CAST(kmv_est AS DOUBLE) - exact_distinct)
             / exact_distinct * 10000.0) / 10000.0 AS rel_err
FROM scored
"""


HLL_P = 8                    # register-index bits
HLL_M = 1 << HLL_P           # 256 registers
HLL_REST_BITS = 60 - HLL_P   # 52 bits feed the leading-zero count
#: alpha_m * m^2, pre-scaled by 2^52 to cancel the integer-scaled
#: harmonic sum below; one double literal shared verbatim by both engines.
HLL_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M \
    * float(1 << HLL_REST_BITS)


def _hll_rho_buckets(hashed: DataFrame, *keys: str) -> DataFrame:
    """(keys..., bucket, rho) from a frame carrying hash column ``h``.

    The single codification of the register rule — bucket = low HLL_P
    hash bits, rho = leading zeros of the remaining bits + 1 — shared by
    the per-source sketch and the union merge (their oracle CTEs mirror
    this expression verbatim).
    """
    return hashed.select(
        *keys,
        F.pmod("h", F.lit(HLL_M)).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rest"),
    ).select(
        *keys, "bucket",
        F.when(F.col("rest") == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
            F.lit(HLL_REST_BITS + 1)
            - F.length(F.conv(F.col("rest").cast("string"), 10, 2))
        ).cast("int").alias("rho"),
    )


def _hll_z_present() -> F.Column:
    """Aggregate for the integer-scaled harmonic sum over present
    registers (built lazily — Column exprs need an active session)."""
    return F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), {HLL_REST_BITS} - r)")
    )


def _hll_estimate(z_present: F.Column, n_buckets: F.Column) -> F.Column:
    """Raw HLL estimate from the present-register sum + register count
    (absent registers contribute 2^HLL_REST_BITS each)."""
    z = (z_present
         + (F.lit(HLL_M) - n_buckets)
         * F.lit(1 << HLL_REST_BITS).cast("bigint"))
    return F.floor(F.lit(HLL_ALPHA_NUM) / z.cast("double")).cast("bigint")


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source HyperLogLog distinct-shingle estimate, engine-exact.

    The classic register computation — bucket = low HLL_P hash bits,
    register = max over the bucket of (leading zeros of the remaining
    bits + 1) — is a single groupBy(source, bucket) max: the sketch is an
    algebraic aggregate whose merged state is HLL_M bytes per source, the
    canonical 100 TB distinct-count plan (Spark's own
    ``approx_count_distinct`` is the built-in twin; this form makes the
    registers *visible* and verifiable cross-engine).

    Determinism: rho comes from the binary-string length of the hash
    remainder (exact in both engines), and the harmonic sum is kept as
    the INTEGER sum( 2^(HLL_REST_BITS - rho) ) so no float accumulation
    order exists; the estimate is one double division at the end.  The
    standard small-range linear-counting correction is intentionally
    omitted (it needs ln(), which IEEE does not pin across libms) — at
    the scales this sketch exists for, n >> m and the raw estimator is
    the right branch anyway.
    """
    sh = _src_shingles(spark, sf_dir).select(
        "source", hash64(F.col("shingle")).alias("h")
    )
    buckets = _hll_rho_buckets(sh, "source")
    regs = buckets.groupBy("source", "bucket").agg(
        F.max("rho").alias("r"), F.count(F.lit(1)).alias("c")
    )
    per_source = regs.groupBy("source").agg(
        F.sum("c").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_buckets"),
        _hll_z_present().alias("z_present"),
    )
    est = _hll_estimate(F.col("z_present"), F.col("n_buckets"))
    return per_source.select(
        "source", "exact_distinct",
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
        est.alias("hll_est"),
        (F.floor(
            F.abs(est.cast("double") - F.col("exact_distinct"))
            / F.col("exact_distinct") * 10000.0
        ) / 10000.0).alias("rel_err"),
    )


HLL_ORACLE = f"""
WITH {_SRC_SHINGLES_SQL.strip()},
hashed AS (
  SELECT source, {hash64_sql('shingle')} AS h FROM sh
),
buckets AS (
  SELECT source, h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
              ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
         END AS rho
  FROM hashed
),
regs AS (
  SELECT source, bucket, max(rho) AS r, count(*) AS c
  FROM buckets GROUP BY 1, 2
),
per_source AS (
  SELECT source, sum(c) AS exact_distinct, count(*) AS n_buckets,
         sum(1::BIGINT << ({HLL_REST_BITS} - r)) AS z_present
  FROM regs GROUP BY 1
),
scored AS (
  SELECT source, CAST(exact_distinct AS BIGINT) AS exact_distinct,
         CAST(n_buckets AS BIGINT) AS n_buckets,
         CAST(floor({HLL_ALPHA_NUM!r} / CAST(z_present
              + ({HLL_M} - n_buckets) * (1::BIGINT << {HLL_REST_BITS})
              AS DOUBLE)) AS BIGINT) AS hll_est
  FROM per_source
)
SELECT source, exact_distinct, n_buckets, hll_est,
       floor(abs(CAST(hll_est AS DOUBLE) - exact_distinct)
             / exact_distinct * 10000.0) / 10000.0 AS rel_err
FROM scored
"""


def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source HLL union: per-source register sets merged by a
    bucketwise max into one corpus-wide distinct-shingle estimate.

    This is the *mergeability* half of the sketch story — the property
    that makes HLL the 100 TB distinct-count plan: each source (or
    executor, or day of ingest) reduces to HLL_M registers, and the
    union of any number of sketches is a constant-size bucketwise max,
    never a re-scan.  Because max is associative, the merged registers
    are bit-identical to sketching the concatenated corpus directly
    (pinned by test_sketches contract); the operator keeps the
    per-source stage explicit so the plan *is* the merge.

    Plan: one groupBy(source, bucket) shuffle -> one groupBy(bucket)
    merge of |sources| x HLL_M rows -> one-row scalar register sum,
    cross-joined (broadcast) with the one-row exact count — the two
    scalars are constant-size whatever the corpus.
    """
    sh = _src_shingles(spark, sf_dir).select(
        "source", hash64(F.col("shingle")).alias("h")
    )
    per_source_regs = _hll_rho_buckets(sh, "source") \
        .groupBy("source", "bucket").agg(F.max("rho").alias("r"))
    merged = per_source_regs.groupBy("bucket").agg(F.max("r").alias("r"))
    regs_row = merged.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        _hll_z_present().alias("z_present"),
    )
    exact_row = sh.agg(
        F.countDistinct("h").alias("exact_distinct"),
        F.countDistinct("source").alias("n_sources"),
    )
    est = _hll_estimate(F.col("z_present"), F.col("n_buckets"))
    return exact_row.crossJoin(F.broadcast(regs_row)).select(
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
        est.alias("hll_est"),
        (F.floor(
            F.abs(est.cast("double") - F.col("exact_distinct"))
            / F.col("exact_distinct") * 10000.0
        ) / 10000.0).alias("rel_err"),
    )


HLL_UNION_ORACLE = f"""
WITH {_SRC_SHINGLES_SQL.strip()},
hashed AS (
  SELECT source, {hash64_sql('shingle')} AS h FROM sh
),
buckets AS (
  SELECT source, h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
              ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
         END AS rho
  FROM hashed
),
per_source_regs AS (
  SELECT source, bucket, max(rho) AS r FROM buckets GROUP BY 1, 2
),
merged AS (
  SELECT bucket, max(r) AS r FROM per_source_regs GROUP BY 1
),
regs_row AS (
  SELECT count(*) AS n_buckets,
         sum(1::BIGINT << ({HLL_REST_BITS} - r)) AS z_present
  FROM merged
),
exact_row AS (
  SELECT count(DISTINCT h) AS exact_distinct,
         count(DISTINCT source) AS n_sources
  FROM hashed
),
scored AS (
  SELECT n_sources, exact_distinct, n_buckets,
         CAST(floor({HLL_ALPHA_NUM!r} / CAST(z_present
              + ({HLL_M} - n_buckets) * (1::BIGINT << {HLL_REST_BITS})
              AS DOUBLE)) AS BIGINT) AS hll_est
  FROM exact_row CROSS JOIN regs_row
)
SELECT CAST(n_sources AS BIGINT) AS n_sources,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST(n_buckets AS BIGINT) AS n_buckets, hll_est,
       floor(abs(CAST(hll_est AS DOUBLE) - exact_distinct)
             / exact_distinct * 10000.0) / 10000.0 AS rel_err
FROM scored
"""


def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for the corpus's top heavy-hitter tokens.

    The d x w grid is a groupBy over (row, bucket) — w*d counters total,
    so the aggregate output is constant-size no matter the corpus.  The
    probe side is TOP_N rows and broadcasts.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    jcol = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j")
    bucket = (
        hash64(F.concat(F.col("j").cast("string"), F.lit(":"),
                        F.col("token"))) % CMS_W
    )
    cms = (
        tok.select("token", jcol)
        .select("j", bucket.alias("bucket"))
        .groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    top = (
        exact.withColumn(
            "r", F.row_number().over(
                Window.orderBy(F.col("freq").desc(), F.col("token"))
            )
        ).filter(F.col("r") <= TOP_N).drop("r")
    )
    probe = top.select("token", "freq", jcol).select(
        "token", "freq", "j", bucket.alias("bucket")
    )
    return (
        F.broadcast(probe).join(cms, ["j", "bucket"])
        .groupBy("token")
        .agg(F.max("freq").alias("exact_freq"), F.min("cnt").alias("cms_est"))
        .select(
            "token", "exact_freq", "cms_est",
            (F.col("cms_est") - F.col("exact_freq")).alias("overestimate"),
        )
    )


_CMS_HASH = hash64_sql("CAST(j AS VARCHAR) || ':' || token")
_CMS_BUCKET_SQL = f"{_CMS_HASH} % {CMS_W}"

CMS_ORACLE = f"""
WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS token FROM documents),
cms AS (
  SELECT j, {_CMS_BUCKET_SQL} AS bucket, count(*) AS cnt
  FROM tok, unnest(range(0, {CMS_D})) AS jj(j)
  GROUP BY 1, 2
),
exact AS (SELECT token, count(*) AS freq FROM tok GROUP BY 1),
top AS (
  SELECT token, freq FROM (
    SELECT *, row_number() OVER (ORDER BY freq DESC, token) AS r FROM exact
  ) WHERE r <= {TOP_N}
),
probe AS (
  SELECT token, freq, j, {_CMS_BUCKET_SQL} AS bucket
  FROM top, unnest(range(0, {CMS_D})) AS jj(j)
)
SELECT probe.token AS token,
       CAST(max(freq) AS BIGINT) AS exact_freq,
       CAST(min(cnt) AS BIGINT) AS cms_est,
       CAST(min(cnt) - max(freq) AS BIGINT) AS overestimate
FROM probe JOIN cms USING (j, bucket)
GROUP BY 1
"""


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe with its error contract visible.

    Build side: BUILDING-segment customers (the small dimension slice);
    probe side: every customer that placed an order.  Output per probe
    key: what the bloom says, the truth, and whether it's one of the
    bounded false positives (false negatives are impossible — the
    operator's defining guarantee, asserted by the oracle match).

    The built bit set is tiny (<= m bits) and broadcasts; at scale this
    is the manual twin of Spark's runtime-filter join pruning.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    build = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k")).distinct()
    )
    icol = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i")
    bit = (
        hash64(F.concat(F.col("i").cast("string"), F.lit(":"),
                        F.col("k").cast("string"))) % BLOOM_M
    )
    bits = build.select(icol, "k").select(bit.alias("bit")).distinct()
    probe = o.select(F.col("o_custkey").alias("k")).distinct()
    probe_bits = probe.select("k", icol).select("k", bit.alias("bit"))
    hits = (
        probe_bits.join(F.broadcast(bits.withColumn("set_", F.lit(1))),
                        "bit", "left")
        .groupBy("k")
        .agg(F.count("set_").alias("nb"))
    )
    return (
        hits.join(F.broadcast(build.withColumn("member_", F.lit(1))),
                  "k", "left")
        .select(
            F.col("k").alias("custkey"),
            (F.col("nb") == BLOOM_K).alias("bloom_maybe"),
            F.col("member_").isNotNull().alias("is_member"),
            ((F.col("nb") == BLOOM_K) & F.col("member_").isNull())
            .alias("false_positive"),
        )
    )


_BLOOM_HASH = hash64_sql("CAST(i AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
_BLOOM_BIT_SQL = f"{_BLOOM_HASH} % {BLOOM_M}"

BLOOM_ORACLE = f"""
WITH build AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT {_BLOOM_BIT_SQL} AS bit
  FROM build, unnest(range(0, {BLOOM_K})) AS ii(i)
),
probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
probe_bits AS (
  SELECT k, {_BLOOM_BIT_SQL} AS bit
  FROM probe, unnest(range(0, {BLOOM_K})) AS ii(i)
),
hits AS (
  SELECT pb.k, count(b.bit) AS nb
  FROM probe_bits pb LEFT JOIN bits b USING (bit)
  GROUP BY 1
)
SELECT h.k AS custkey,
       (nb = {BLOOM_K}) AS bloom_maybe,
       (bu.k IS NOT NULL) AS is_member,
       (nb = {BLOOM_K} AND bu.k IS NULL) AS false_positive
FROM hits h LEFT JOIN build bu ON bu.k = h.k
"""


def sample_hash_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k hash sample of the document corpus.

    The k smallest keyed hashes form a uniform sample that is stable
    across runs, engines and partitionings — and mergeable: the bottom-k
    of a union is the bottom-k of the partial bottom-k's, so at scale
    each partition contributes at most k candidates to a tiny final
    reduction (the global sort never materializes).
    """
    d = load_table(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    w = Window.orderBy(h.asc(), F.col("doc_id"))
    return (
        d.select("doc_id")
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
    )


SAMPLE_ORACLE = f"""
SELECT doc_id, CAST(r AS INT) AS sample_rank FROM (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY {hash64_sql("'sample:' || CAST(doc_id AS VARCHAR)")},
                    doc_id) AS r
  FROM documents
) WHERE r <= {SAMPLE_K}
"""


def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source similarity *from the sketches alone* — KMV set
    algebra (Beyer et al., SIGMOD 2007): for each source pair, merge
    the two bottom-K sketches into the union sketch, count how many of
    its members live in BOTH input sketches (``cnt``), and estimate
    Jaccard = cnt/K and |A∩B| = cnt·|A∪B|_est/K.  This is what makes
    sketches a *algebra* rather than a counter: at 100 TB the per-source
    sketches are built once (the bounded two-phase of
    ``sketch_kmv_distinct``) and every pairwise comparison afterwards
    touches only K-sized arrays — no re-scan, no shingle self-join.
    The exact intersection is computed alongside purely as the error
    report (the sketch path never needs it).

    Determinism: sketches are k-minima of a keyed hash — grouping-
    invariant; all array ops are sorted-integer manipulations; the two
    estimates divide/floor exact integers.
    """
    sh = _src_shingles(spark, sf_dir)
    hashed = sh.select("source", hash64(F.col("shingle")).alias("h")) \
        .transform(cut_lineage)   # sketch build + both exact sides
    mins = (
        hashed.groupBy("source", F.spark_partition_id().alias("salt"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.slice(F.array_sort(F.collect_list("h")), 1, KMV_K)
            .alias("mins"),
        )
    )
    sk = (
        mins.groupBy("source")
        .agg(
            F.sum("c").alias("n"),
            F.slice(F.array_sort(F.flatten(F.collect_list("mins"))),
                    1, KMV_K).alias("arr"),
        )
        .transform(cut_lineage)   # consumed as both pair sides
    )
    a = sk.select(F.col("source").alias("s1"),
                  F.col("arr").alias("arr1"), F.col("n").alias("n1"))
    b = sk.select(F.col("source").alias("s2"),
                  F.col("arr").alias("arr2"), F.col("n").alias("n2"))
    pairs = a.join(F.broadcast(b), F.col("s1") < F.col("s2")) \
        .withColumn(
            "merged",
            F.expr(f"slice(array_sort(array_union(arr1, arr2)), "
                   f"1, {KMV_K})"),
        )
    hk_u = F.element_at(F.col("merged"), KMV_K)
    cnt = F.size(F.array_intersect(
        F.array_intersect(F.col("merged"), F.col("arr1")), F.col("arr2")
    ))
    union_est = F.floor(
        F.lit(float(KMV_K - 1) * _TWO60) / hk_u.cast("double")
    ).cast("bigint")
    x = hashed.select(F.col("source").alias("s1"), "h")
    y = hashed.select(F.col("source").alias("s2"), F.col("h").alias("h2"))
    ex = (
        x.join(y, (F.col("h") == F.col("h2")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    scored = (
        pairs.filter(hk_u.isNotNull())
        .select("s1", "s2", "n1", "n2",
                cnt.alias("cnt"), union_est.alias("union_est"))
        .join(ex, ["s1", "s2"], "left")
        .withColumn("exact_inter",
                    F.coalesce(F.col("exact_inter"), F.lit(0))
                    .cast("bigint"))
    )
    return scored.select(
        "s1", "s2", "n1", "n2", "exact_inter",
        (F.floor(F.col("exact_inter").cast("double")
                 / (F.col("n1") + F.col("n2") - F.col("exact_inter"))
                 * 1000000.0) / 1000000.0).alias("exact_jaccard"),
        (F.floor(F.col("cnt").cast("double") / KMV_K * 1000000.0)
         / 1000000.0).alias("kmv_jaccard"),
        F.expr(f"(cnt * union_est) div {KMV_K}").alias("kmv_inter_est"),
    )


KMV_JACCARD_ORACLE = f"""
WITH {_SRC_SHINGLES_SQL.strip()},
hashed AS (
  SELECT source, {hash64_sql('shingle')} AS h FROM sh
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM hashed GROUP BY 1),
rk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS r
    FROM hashed
  ) WHERE r <= {KMV_K}
),
prs AS (
  SELECT a.source AS s1, b.source AS s2, a.n AS n1, b.n AS n2
  FROM sz a JOIN sz b ON a.source < b.source
),
uh AS (
  SELECT DISTINCT p.s1, p.s2, s.h
  FROM prs p JOIN rk s ON s.source = p.s1 OR s.source = p.s2
),
uk AS (
  SELECT s1, s2, h FROM (
    SELECT s1, s2, h,
           row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS r
    FROM uh
  ) WHERE r <= {KMV_K}
),
ust AS (
  SELECT u.s1, u.s2, max(u.h) AS hk_u, count(*) AS m,
         CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS cnt
  FROM uk u
  LEFT JOIN rk a ON a.source = u.s1 AND a.h = u.h
  LEFT JOIN rk b ON b.source = u.s2 AND b.h = u.h
  GROUP BY 1, 2
),
ex AS (
  SELECT x.source AS s1, y.source AS s2, CAST(count(*) AS BIGINT)
           AS exact_inter
  FROM hashed x JOIN hashed y ON x.h = y.h AND x.source < y.source
  GROUP BY 1, 2
)
SELECT p.s1, p.s2, p.n1, p.n2,
       COALESCE(ex.exact_inter, 0) AS exact_inter,
       floor(CAST(COALESCE(ex.exact_inter, 0) AS DOUBLE)
             / (p.n1 + p.n2 - COALESCE(ex.exact_inter, 0))
             * 1000000.0) / 1000000.0 AS exact_jaccard,
       floor(CAST(cnt AS DOUBLE) / {KMV_K} * 1000000.0) / 1000000.0
         AS kmv_jaccard,
       CAST((cnt * CAST(floor({float(KMV_K - 1)} * {_TWO60}
                              / CAST(hk_u AS DOUBLE)) AS BIGINT))
            // {KMV_K} AS BIGINT) AS kmv_inter_est
FROM prs p
JOIN ust ON ust.s1 = p.s1 AND ust.s2 = p.s2
LEFT JOIN ex ON ex.s1 = p.s1 AND ex.s2 = p.s2
WHERE m >= {KMV_K}
"""


#: Sliding-window width in hours (window = this hour + the 2 before it).
HLL_WIN_HOURS = 3


def ev_sliding_uniques_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-hour distinct users per hour via HLL register merge.

    Windowed COUNT(DISTINCT) is the canonical 100 TB streaming killer:
    exact distinct state grows with the key universe and every slide
    re-scans overlapping data.  The sketch plan is O(1) per window
    instead — build the 256-register HLL of each hour ONCE (one partial
    agg), then every sliding window is a register-wise max-merge of the
    ≤3 hourly sketches it spans.  Register replication uses the same
    offset trick as Spark's own sliding ``F.window``: each hour's
    registers are fanned to the ≤3 window anchors they serve (bounded
    ×3 blowup of the tiny register table, never of the events).

    The exact distinct per window is also computed (same offset fan-out
    of the deduped (hour, user) pairs) purely as the verification
    yardstick for ``rel_err`` at test scale — at production scale one
    runs only the register half.  Windows are anchored at hours that
    exist in the data.

    Determinism: identical to ``sketch_hll_distinct`` — integer rho /
    harmonic sums, one final double division, floor-quantized rel_err.
    """
    from .events import _epoch_s

    e = load_table(spark, sf_dir, "events").select(
        (_epoch_s(F.col("ts")) / F.lit(3600)).cast("long").alias("hour_id"),
        hash64(F.col("user_id").cast("string")).alias("h"),
    )
    buckets = _hll_rho_buckets(e, "hour_id")
    regs = buckets.groupBy("hour_id", "bucket").agg(
        F.max("rho").alias("r")
    ).transform(cut_lineage)  # reused: fan-out + anchor set
    hours = regs.select("hour_id").distinct().transform(cut_lineage)
    offs = spark.range(HLL_WIN_HOURS).select(F.col("id").alias("off"))

    def _fan(df: DataFrame, *cols: str) -> DataFrame:
        fanned = df.crossJoin(F.broadcast(offs)).select(
            (F.col("hour_id") + F.col("off")).alias("win_hour"), *cols
        )
        return fanned.join(
            hours.withColumnRenamed("hour_id", "win_hour"),
            "win_hour", "left_semi",
        )

    merged = _fan(regs, "bucket", "r").groupBy("win_hour", "bucket").agg(
        F.max("r").alias("r")
    )
    per_win = merged.groupBy("win_hour").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        _hll_z_present().alias("z"),
    )
    exact = _fan(e.distinct(), "h").groupBy("win_hour").agg(
        F.count_distinct("h").alias("exact_uniques")
    )
    n_hours = _fan(hours, "hour_id").groupBy("win_hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours")
    )
    est = _hll_estimate(F.col("z"), F.col("n_buckets"))
    return (
        per_win.join(exact, "win_hour").join(n_hours, "win_hour")
        .select(
            "win_hour", "n_hours", "exact_uniques",
            est.alias("hll_est"),
            (F.floor(
                F.abs(est.cast("double") - F.col("exact_uniques"))
                / F.col("exact_uniques") * 10000.0
            ) / 10000.0).alias("rel_err"),
        )
    )


EV_SLIDING_HLL_ORACLE = f"""
WITH e AS MATERIALIZED (
  SELECT date_diff('second', TIMESTAMP '1970-01-01', ts) // 3600
           AS hour_id,
         {hash64_sql('CAST(user_id AS VARCHAR)')} AS h
  FROM events
),
buckets AS (
  SELECT hour_id, h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_REST_BITS + 1}
              ELSE {HLL_REST_BITS + 1} - length(bin(h // {HLL_M}))
         END AS rho
  FROM e
),
regs AS MATERIALIZED (
  SELECT hour_id, bucket, max(rho) AS r FROM buckets GROUP BY 1, 2
),
hours AS MATERIALIZED (SELECT DISTINCT hour_id FROM regs),
offs AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(off)),
merged AS (
  SELECT g.hour_id + o.off AS win_hour, g.bucket, max(g.r) AS r
  FROM regs g CROSS JOIN offs o
  WHERE EXISTS (SELECT 1 FROM hours x WHERE x.hour_id = g.hour_id + o.off)
  GROUP BY 1, 2
),
per_win AS (
  SELECT win_hour, count(*) AS n_buckets,
         sum(1::BIGINT << ({HLL_REST_BITS} - r)) AS z
  FROM merged GROUP BY 1
),
uexact AS (
  SELECT u.hour_id + o.off AS win_hour,
         CAST(count(DISTINCT u.h) AS BIGINT) AS exact_uniques
  FROM (SELECT DISTINCT hour_id, h FROM e) u CROSS JOIN offs o
  WHERE EXISTS (SELECT 1 FROM hours x WHERE x.hour_id = u.hour_id + o.off)
  GROUP BY 1
),
nh AS (
  SELECT hh.hour_id + o.off AS win_hour, CAST(count(*) AS BIGINT) AS n_hours
  FROM hours hh CROSS JOIN offs o
  WHERE EXISTS (SELECT 1 FROM hours x WHERE x.hour_id = hh.hour_id + o.off)
  GROUP BY 1
),
scored AS (
  SELECT p.win_hour, nh.n_hours, u.exact_uniques,
         CAST(floor({HLL_ALPHA_NUM!r} / CAST(p.z
              + ({HLL_M} - p.n_buckets) * (1::BIGINT << {HLL_REST_BITS})
              AS DOUBLE)) AS BIGINT) AS hll_est
  FROM per_win p
  JOIN uexact u ON u.win_hour = p.win_hour
  JOIN nh ON nh.win_hour = p.win_hour
)
SELECT win_hour, n_hours, exact_uniques, hll_est,
       floor(abs(CAST(hll_est AS DOUBLE) - exact_uniques)
             / exact_uniques * 10000.0) / 10000.0 AS rel_err
FROM scored
"""


SPECS: dict[str, QuerySpec] = {
    "sketch_kmv_distinct": QuerySpec(sketch_kmv_distinct, KMV_ORACLE),
    "sketch_kmv_jaccard": QuerySpec(sketch_kmv_jaccard, KMV_JACCARD_ORACLE),
    "sketch_hll_distinct": QuerySpec(sketch_hll_distinct, HLL_ORACLE),
    "sketch_hll_union": QuerySpec(sketch_hll_union, HLL_UNION_ORACLE),
    "sketch_countmin_tokens": QuerySpec(sketch_countmin_tokens, CMS_ORACLE),
    "sketch_bloom_membership": QuerySpec(sketch_bloom_membership,
                                         BLOOM_ORACLE),
    "sample_hash_bottomk": QuerySpec(sample_hash_bottomk, SAMPLE_ORACLE),
    "ev_sliding_uniques_hll": QuerySpec(ev_sliding_uniques_hll,
                                        EV_SLIDING_HLL_ORACLE),
}
