"""Curation-operator contracts beyond oracle parity.

The oracle sweep proves Spark and DuckDB compute the same answer; these
tests pin the properties a pretraining pipeline *relies on*: split
stability under re-partitioning, pack budget bounds, exactly one
canonical doc per duplicate group, and quantization range guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_worker_spark.operators.curation import (
    PACK_BUDGET,
    PMI_TOP_K,
    dedup_keep_best,
    emb_int8_quantize,
    pack_sequences,
    split_train_holdout,
    token_bigram_pmi,
)


def test_split_is_repartition_invariant(spark, sf_dir):
    """The split must be a pure function of doc_id: reshuffling the
    input (the 100 TB re-shard case) may not move any document across
    splits — that is the eval-leakage guarantee."""
    base = split_train_holdout(spark, sf_dir).select("doc_id", "split")
    again = {r.doc_id: r.split for r in base.collect()}
    assert len(again) > 0
    redo = {r.doc_id: r.split
            for r in split_train_holdout(spark, sf_dir)
            .repartition(13).collect()}
    assert again == redo


def test_split_proportions_and_disjointness(spark, sf_dir):
    rows = split_train_holdout(spark, sf_dir).collect()
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert set(by) <= {"train", "val", "test"}
    # Disjoint and exhaustive.
    assert sum(len(v) for v in by.values()) == n
    # Hash split at 96/2/2 — allow generous tolerance at 500 docs.
    assert len(by["train"]) / n > 0.85


def test_pack_offsets_within_budget_and_contiguous(spark, sf_dir):
    """Offsets live in [0, budget); within a (source, shard) the packs
    are a contiguous concat-and-split layout: exclusive cumsum mod /
    div relations hold exactly."""
    rows = pack_sequences(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.pack_offset < PACK_BUDGET
        assert r.pack_id >= 0
    # Re-derive the exclusive cumsum per (source, shard) and re-check.
    from collections import defaultdict
    groups = defaultdict(list)
    for r in rows:
        groups[(r.source, r.shard)].append(r)
    for g in groups.values():
        g.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in g:
            assert r.pack_id == cum // PACK_BUDGET
            assert r.pack_offset == cum % PACK_BUDGET
            cum += r.n_tok


def test_keep_best_exactly_one_winner_per_group(spark, sf_dir):
    rows = dedup_keep_best(spark, sf_dir).collect()
    from collections import defaultdict
    groups = defaultdict(list)
    for r in rows:
        groups[r.fp].append(r)
    for fp, g in groups.items():
        kept = [r for r in g if r.kept]
        assert len(kept) == 1, fp
        assert all(r.group_size == len(g) for r in g)
        # The winner has max quality; doc_id breaks exact ties.
        best = max(g, key=lambda r: (r.quality, -r.doc_id))
        assert kept[0].quality == best.quality


def test_pmi_rank_is_dense_and_bounded(spark, sf_dir):
    rows = token_bigram_pmi(spark, sf_dir).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    ranks = sorted(r.r for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # PMI is non-increasing along the rank.
    by_rank = sorted(rows, key=lambda r: r.r)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.pmi >= b.pmi


def test_quantize_range_and_roundtrip_bound(spark, sf_dir):
    """|q_i| <= 127 always (max-abs scaling guarantees it), q_max hits
    127 for any non-degenerate vector, and dequantized values sit
    within scale/254-ish of the original (half-step bound)."""
    rows = emb_int8_quantize(spark, sf_dir).limit(50).collect()
    assert rows
    for r in rows:
        qs = [int(x) for x in r.q_vec.split(",")]
        assert max(abs(q) for q in qs) <= 127
        assert r.q_max == max(abs(q) for q in qs)
        assert r.q_l1 == sum(abs(q) for q in qs)
        assert r.q_max == 127  # max-abs scaling saturates one component


def test_pack_window_is_sharded_not_per_source(spark, sf_dir):
    """The packing sort must be keyed by (source, shard) — a plan whose
    window partitions only by source serializes whole sources through
    single tasks at 100 TB."""
    plan = (pack_sequences(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "shard" in plan


def test_incremental_lsh_consistent_with_full_pairing(spark, sf_dir):
    """A batch document is near-dup-of-corpus iff the full LSH pairing
    links it to some src0 document, and the reported first match is the
    smallest such partner."""
    from collections import defaultdict

    from data_ingestion_worker_spark.operators.dedup import (
        dedup_incremental_lsh,
        dedup_minhash_lsh,
    )

    src = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source").collect()
    }
    partners = defaultdict(set)
    for p in dedup_minhash_lsh(spark, sf_dir).collect():
        partners[p.d1].add(p.d2)
        partners[p.d2].add(p.d1)
    expected = {}
    for doc, source in src.items():
        if source == "src0":
            continue
        corpus_hits = {o for o in partners[doc] if src[o] == "src0"}
        expected[doc] = (len(corpus_hits),
                         min(corpus_hits) if corpus_hits else None)
    rows = dedup_incremental_lsh(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(expected)
    for r in rows:
        n, first = expected[r.doc_id]
        assert r.n_corpus_candidates == n
        assert r.first_corpus_match == first
        assert r.is_near_dup == (n > 0)
    assert any(r.is_near_dup for r in rows), "no corpus near-dups - vacuous"


def test_split_leakage_check_matches_composition(spark, sf_dir):
    """The leakage matrix must equal the composition of the pair set and
    the split assignment, aggregated by unordered split combination."""
    from collections import Counter

    from data_ingestion_worker_spark.operators.curation import (
        split_leakage_check,
    )
    from data_ingestion_worker_spark.operators.dedup import (
        _jaccard_pairs,
        _shingles,
    )

    splits = {r.doc_id: r.split
              for r in split_train_holdout(spark, sf_dir).collect()}
    expected: Counter = Counter()
    for p in _jaccard_pairs(_shingles(spark, sf_dir)).collect():
        a, b = sorted((splits[p.d1], splits[p.d2]))
        expected[(a, b)] += 1
    rows = split_leakage_check(spark, sf_dir).collect()
    assert {(r.split_a, r.split_b): r.n_pairs for r in rows} == dict(expected)
    for r in rows:
        assert r.is_leak == (r.split_a != r.split_b)


def test_prefix_filter_candidates_are_a_strict_subset(spark, sf_dir):
    """The point of prefix filtering: fewer candidate postings than the
    full inverted index, with identical final pairs."""
    from data_ingestion_worker_spark.operators.dedup import (
        _shingles,
        dedup_jaccard_prefix_filter,
        dedup_ngram_jaccard,
    )

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # prefix postings (replicates the operator's prefix selection)
    from pyspark.sql import Window

    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = sh.join(df_tab, "shingle").select(
        "doc_id", "shingle", F.row_number().over(w).alias("rn")
    )
    prefix_n = (
        ranked.join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.expr("(n + 4) div 5") + 1)
        .count()
    )
    full_n = sh.count()
    assert prefix_n < full_n, "prefix kept every posting — no pruning"
    got = {(r.d1, r.d2, r.jaccard)
           for r in dedup_jaccard_prefix_filter(spark, sf_dir).collect()}
    want = {(r.d1, r.d2, r.jaccard)
            for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    assert got == want, "prefix filter changed the result set"


def test_cluster_representative_is_longest_then_smallest_id(spark, sf_dir):
    from collections import defaultdict

    from data_ingestion_worker_spark.operators.dedup import (
        dedup_cluster_representative,
    )

    rows = dedup_cluster_representative(spark, sf_dir).collect()
    docs = {r.doc_id: r.n_chars
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "n_chars").collect()}
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    for cid, members in clusters.items():
        reps = {m.rep_doc_id for m in members}
        assert len(reps) == 1, f"cluster {cid} has {len(reps)} reps"
        rep = reps.pop()
        best = min(members, key=lambda m: (-docs[m.doc_id], m.doc_id))
        assert rep == best.doc_id
        for m in members:
            assert m.is_dup == (m.doc_id != rep)


def test_token_budget_plan_is_a_valid_allocation(spark, sf_dir):
    from data_ingestion_worker_spark.operators.curation import (
        TOKEN_BUDGET,
        corpus_token_budget_plan,
    )

    rows = corpus_token_budget_plan(spark, sf_dir).collect()
    assert rows
    share_sum = sum(r.target_share for r in rows)
    assert 0.99 <= share_sum <= 1.0 + 1e-9   # floored shares undershoot
    for r in rows:
        assert 0.0 <= r.sampling_rate <= 1.0
        assert r.expected_tokens <= r.n_tokens
        if r.oversubscribed:
            assert r.sampling_rate == 1.0
    # a non-oversubscribed plan never draws more than the budget
    if not any(r.oversubscribed for r in rows):
        assert sum(r.expected_tokens for r in rows) <= TOKEN_BUDGET


def test_prefix_filter_lemma_holds_on_random_sets():
    """Property: under any global token order, two sets with Jaccard >=
    0.2 share an element inside their per-set prefixes of length
    n - ceil(0.2 n) + 1 — the lemma dedup_jaccard_prefix_filter's
    candidate pruning rests on (pure-python check, no Spark)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.sets(st.integers(0, 40), min_size=1, max_size=25),
        st.sets(st.integers(0, 40), min_size=1, max_size=25),
        st.randoms(),
    )
    def check(a, b, rng):
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        if jac < 0.2:
            return
        universe = sorted(a | b)
        rng.shuffle(universe)          # arbitrary global order
        rank = {t: i for i, t in enumerate(universe)}

        def prefix(s):
            n = len(s)
            keep = n - math.ceil(0.2 * n) + 1
            return set(sorted(s, key=lambda t: rank[t])[:keep])

        assert prefix(a) & prefix(b), (
            f"lemma violated: a={sorted(a)} b={sorted(b)} jac={jac:.3f}"
        )

    check()


def test_kfold_assignment_is_stable_and_balanced(spark, sf_dir):
    """Folds cover 0..K-1, are hashlib-reproducible per doc, stay
    disjoint from the train/val/test split hash (different salt), and
    no fold is pathologically unbalanced."""
    import hashlib
    from collections import Counter

    from data_ingestion_worker_spark.operators.curation import (
        KFOLD_K, split_kfold_assign,
    )

    rows = split_kfold_assign(spark, sf_dir).collect()
    assert rows
    folds = Counter()
    for r in rows:
        h = int(hashlib.md5(
            f"kfold:v1:{r.doc_id}".encode()).hexdigest()[:15], 16)
        assert r.fold == h % KFOLD_K, r.doc_id
        folds[r.fold] += 1
    assert set(folds) == set(range(KFOLD_K))
    n = len(rows)
    for f, c in folds.items():
        assert abs(c - n / KFOLD_K) < 5 * (n ** 0.5), (f, c)


def test_bloom_prefilter_statuses_equal_incremental_dedup(spark, sf_dir):
    """The Bloom fast path must be invisible in the verdicts (no false
    negatives): statuses equal dedup_incremental's row for row, pruned
    rows are exactly the bloom-negative ones, and false positives are
    maybe-but-absent."""
    from data_ingestion_worker_spark.operators.dedup import (
        dedup_bloom_prefilter, dedup_incremental,
    )

    got = {r.doc_id: r for r in
           dedup_bloom_prefilter(spark, sf_dir).collect()}
    base = {r.doc_id: r.status for r in
            dedup_incremental(spark, sf_dir).collect()}
    assert {d: r.status for d, r in got.items()} == base
    for r in got.values():
        if r.bloom_pruned:
            # definite negative: must not be a corpus dup, no FP flag
            assert r.status != "dup_of_corpus"
            assert not r.bloom_false_positive
        if r.status == "dup_of_corpus":
            assert not r.bloom_pruned       # no false negatives, ever
    n_pruned = sum(r.bloom_pruned for r in got.values())
    n_fp = sum(r.bloom_false_positive for r in got.values())
    # the filter must actually prune on this corpus, and FPs stay rare
    assert n_pruned > 0
    assert n_fp <= max(2, len(got) // 20)


def test_dedup_rate_estimate_error_bound(spark):
    """Sampled dup-pair estimator accuracy on a synthetic corpus with a
    known duplicate structure: 1200 docs, 200 clusters of 2 and 40
    clusters of 5 -> exact pairs = 200*1 + 40*10 = 600.  The md5 coin
    is deterministic, so the bound is stable, not statistical."""
    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.dedup import (
        _dup_rate_estimate,
    )

    rows = []
    did = 0
    for c in range(200):                    # 200 pair-clusters
        for _ in range(2):
            rows.append((did, f"pair cluster text {c}"))
            did += 1
    for c in range(40):                     # 40 five-clusters
        for _ in range(5):
            rows.append((did, f"big cluster text {c}"))
            did += 1
    for u in range(600):                    # unique filler
        rows.append((did, f"unique text {u} {u * 31}"))
        did += 1
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    est = _dup_rate_estimate(d).collect()[0]
    exact = 200 * 1 + 40 * 10
    assert est.n_docs == len(rows)
    # ~25% of docs sampled (binomial concentration, deterministic here).
    assert abs(est.n_docs_sampled / est.n_docs - 0.25) < 0.05
    # Pair estimate within 40% of truth (pairs survive at p^2 = 1/16,
    # so ~37 sampled pairs; observed deviation is well inside this).
    assert abs(est.dup_pairs_est - exact) <= 0.4 * exact


def test_split_by_cluster_has_zero_leakage(spark, sf_dir):
    """The cluster-keyed split must leave the leakage checker's own
    pair set with ZERO straddling pairs — the guarantee the doc-keyed
    split cannot give (split_leakage_check exists because of that)."""
    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.curation import (
        split_by_cluster,
    )
    from data_ingestion_worker_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    split = split_by_cluster(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir).select("d1", "d2")
    a = split.select(F.col("doc_id").alias("d1"),
                     F.col("split").alias("s1"))
    b = split.select(F.col("doc_id").alias("d2"),
                     F.col("split").alias("s2"))
    straddle = pairs.join(a, "d1").join(b, "d2") \
        .filter(F.col("s1") != F.col("s2"))
    assert straddle.count() == 0
    # And the split still covers every document exactly once.
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs


def test_ngram_coverage_matches_python_sets(spark, sf_dir):
    """Coverage recomputed with plain Python sets over the same
    shingles; ppm is the exact integer floor, bounded by [0, 1e6],
    and n_covered never exceeds n_shingles."""
    from data_ingestion_worker_spark.operators.dedup import (
        EVAL_MOD, _shingles, corpus_ngram_coverage,
    )

    got = {r.doc_id: r for r in
           corpus_ngram_coverage(spark, sf_dir).collect()}
    pairs = [(r.doc_id, r.shingle)
             for r in _shingles(spark, sf_dir).collect()]
    eval_docs: dict[int, set] = {}
    train_shingles = set()
    for d, s in pairs:
        if d % EVAL_MOD == 0:
            eval_docs.setdefault(d, set()).add(s)
        else:
            train_shingles.add(s)
    assert set(got) == set(eval_docs)
    for d, sh in eval_docs.items():
        r = got[d]
        n_cov = len(sh & train_shingles)
        assert (r.n_shingles, r.n_covered) == (len(sh), n_cov)
        assert r.coverage_ppm == (1000000 * n_cov) // len(sh)
        assert 0 <= r.coverage_ppm <= 1000000
        assert r.n_covered <= r.n_shingles


def test_substring_spans_exact_lengths(spark, tmp_path):
    """dedup_substring_spans must report the exact longest shared span:
    two docs sharing one 45-char span (longest run = 45 - L + 1 anchor
    grams on one diagonal) and a third doc with no >= L overlap."""
    from data_ingestion_worker_spark.operators.dedup import (
        SUBSTR_L,
        dedup_substring_spans,
    )

    span = "the quick brown fox jumps over the lazy dog."  # 44 chars
    assert len(span) == 44 >= SUBSTR_L
    # The shared region extends one space on EACH side of `span` (both
    # prefixes end in ' ', both tails start with ' ') -> 46 chars.
    texts = [
        (0, "AAAA " + span + " unique tail zero " + "x" * 40),
        (1, "BB " + span + " different tail one " + "y" * 40),
        (2, "completely unrelated text " + "z" * 60),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "s", len(t), len(t.split())) for i, t in texts],
        "doc_id long, text string, source string, n_chars long, "
        "n_tokens long",
    ).write.parquet(f"{sf}/documents.parquet")

    rows = dedup_substring_spans(spark, sf).collect()
    assert [(r["d1"], r["d2"]) for r in rows] == [(0, 1)]
    r = rows[0]
    assert r["longest_span_chars"] == 46
    assert r["n_shared_grams"] == 46 - SUBSTR_L + 1


def test_winnowing_detection_contract(spark, sf_dir):
    """Winnowing's two-sided contract against the exact variant on the
    real fixture corpus: (a) every winnowed pair shares a real anchor
    (winnowed ⊆ exact pairs), (b) every exact pair whose longest shared
    span meets the guarantee (>= SUBSTR_L + WINNOW_W - 1 chars) is
    still detected after winnowing — the Schleimer et al. guarantee,
    which holds only for per-window selection."""
    from data_ingestion_worker_spark.operators.dedup import (
        SUBSTR_L,
        WINNOW_W,
        dedup_substring_spans,
        dedup_substring_winnowed,
    )

    exact = {(r["d1"], r["d2"]): r["longest_span_chars"]
             for r in dedup_substring_spans(spark, sf_dir).collect()}
    winnowed = {(r["d1"], r["d2"])
                for r in dedup_substring_winnowed(spark, sf_dir).collect()}
    assert winnowed, "fixture corpus must contain duplicated spans"
    assert winnowed <= set(exact)
    guarantee = SUBSTR_L + WINNOW_W - 1
    must_detect = {p for p, span in exact.items() if span >= guarantee}
    assert must_detect <= winnowed, (
        f"pairs with span >= {guarantee} missed: "
        f"{sorted(must_detect - winnowed)[:5]}")
