"""Semantic contracts for the regression/mode/index/sample/seasonal
operators — each pinned against an independent recomputation (numpy /
pandas / hashlib), not against the DuckDB oracle (tools/check_oracle.py
and test_oracle_parity.py already cover engine parity)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from data_ingestion_worker_spark.operators.stats import (
    agg_mode_deterministic,
    stats_linreg_exact,
)
from data_ingestion_worker_spark.operators.events import ev_seasonal_profile
from data_ingestion_worker_spark.operators.text import (
    INDEX_MIN_DF,
    INDEX_POSTINGS_HEAD,
    SAMPLE_WEIGHTED_K,
    doc_inverted_index,
    sample_weighted_bottomk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_linreg_matches_numpy_lstsq(spark):
    rows = stats_linreg_exact(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
        .select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    assert rows
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        slope, intercept = np.polyfit(g.l_quantity, g.l_extendedprice, 1)
        assert r.n == len(g)
        assert r.slope == pytest.approx(slope, abs=1e-4)
        assert r.intercept == pytest.approx(intercept, abs=1e-2)


def test_mode_matches_pandas_value_counts(spark):
    rows = {r.o_orderstatus: r for r in
            agg_mode_deterministic(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_orderstatus", "o_orderpriority").toPandas()
    assert rows
    for status, g in o.groupby("o_orderstatus"):
        counts = g.o_orderpriority.value_counts()
        best = counts.max()
        # pinned tie-break: smallest value among the max-count candidates
        expect = min(v for v, c in counts.items() if c == best)
        assert rows[status].modal_priority == expect
        assert rows[status].modal_count == best


def test_inverted_index_contract(spark):
    rows = doc_inverted_index(spark, SF_DIR).collect()
    docs = dict(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    assert rows
    for r in rows:
        assert r.df >= INDEX_MIN_DF
        assert r.tf_total >= r.df          # tf counts repeats, df doesn't
        head = [int(x) for x in r.postings_head.split(",")]
        assert head == sorted(head)
        assert len(head) == min(r.df, INDEX_POSTINGS_HEAD)
        for doc_id in head:                # every posting really has it
            assert r.token in docs[doc_id].lower().split()


def test_weighted_sample_is_the_global_bottom_k(spark):
    rows = sample_weighted_bottomk(spark, SF_DIR).collect()
    assert len(rows) == SAMPLE_WEIGHTED_K
    # recompute every priority driver-side with hashlib
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "n_chars").collect()
    pri = {
        d.doc_id: int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:15],
                      16) // max(d.n_chars, 1)
        for d in docs
    }
    expect = sorted(pri, key=lambda i: (pri[i], i))[:SAMPLE_WEIGHTED_K]
    assert [r.doc_id for r in rows] == expect
    for r in rows:
        assert r.priority == pri[r.doc_id]


def test_seasonal_profile_shares_and_domain(spark):
    rows = ev_seasonal_profile(spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, float] = {}
    for r in rows:
        assert 0 <= r.hod <= 23
        assert r.n > 0
        by_type[r.event_type] = by_type.get(r.event_type, 0.0) + r.hour_share
    for share_sum in by_type.values():   # shares partition the type total
        assert share_sum == pytest.approx(1.0, abs=1e-4)


def test_welch_ttest_matches_numpy(spark):
    from data_ingestion_worker_spark.operators.stats import stats_welch_ttest

    rows = stats_welch_ttest(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_type", "value").toPandas()
    ev["q"] = np.floor(ev.value * 1000.0)
    assert len(rows) == 10   # C(5,2) unordered type pairs
    for r in rows:
        a = ev[ev.event_type == r.type_a].q.to_numpy()
        b = ev[ev.event_type == r.type_b].q.to_numpy()
        se_a = a.var(ddof=1) / len(a)
        se_b = b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / np.sqrt(se_a + se_b)
        dof = (se_a + se_b) ** 2 / (
            se_a**2 / (len(a) - 1) + se_b**2 / (len(b) - 1)
        )
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.t_stat == pytest.approx(t, abs=1e-4)
        assert r.welch_df == pytest.approx(dof, abs=1e-2)


def test_two_proportion_z_matches_numpy(spark):
    from data_ingestion_worker_spark.operators.stats import (
        PROP_THRESHOLD, stats_two_proportion_z,
    )

    rows = stats_two_proportion_z(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_type", "value").toPandas()
    ev["c"] = (ev.value > PROP_THRESHOLD).astype(int)
    assert len(rows) == 10   # C(5,2) unordered type pairs
    for r in rows:
        a = ev[ev.event_type == r.type_a].c.to_numpy()
        b = ev[ev.event_type == r.type_b].c.to_numpy()
        pa, pb = a.mean(), b.mean()
        pp = (a.sum() + b.sum()) / (len(a) + len(b))
        z = (pa - pb) / np.sqrt(pp * (1 - pp) * (1 / len(a) + 1 / len(b)))
        assert r.n_a == len(a) and r.n_b == len(b)
        assert r.p_a == pytest.approx(pa, abs=1e-6)
        assert r.p_b == pytest.approx(pb, abs=1e-6)
        assert r.z_pooled == pytest.approx(z, abs=1e-5)


def test_diff_in_diff_matches_numpy(spark):
    from data_ingestion_worker_spark.operators.stats import (
        CUPED_SPLIT, stats_diff_in_diff,
    )

    [r] = stats_diff_in_diff(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("user_id", "ts", "value").toPandas()
    ev["q"] = np.floor(ev.value * 1000.0)
    ev["t"] = (ev.user_id % 2 == 1).astype(int)
    ev["post"] = (ev.ts >= pd.Timestamp(CUPED_SPLIT)).astype(int)

    def cell(t, p):
        return ev[(ev.t == t) & (ev.post == p)].q.to_numpy()

    c00, c01, c10, c11 = cell(0, 0), cell(0, 1), cell(1, 0), cell(1, 1)
    did = (c11.mean() - c10.mean()) - (c01.mean() - c00.mean())
    se = np.sqrt(sum(c.var(ddof=1) / len(c) for c in (c00, c01, c10, c11)))
    assert r.n_ctrl_pre == len(c00) and r.n_treat_post == len(c11)
    assert r.did_estimate == pytest.approx(did / 1000.0, abs=1e-5)
    assert r.did_se == pytest.approx(se / 1000.0, abs=1e-5)
    assert r.did_z == pytest.approx(did / se, abs=1e-4)


def test_markov_rows_are_probability_distributions(spark):
    from data_ingestion_worker_spark.operators.events import (
        ev_markov_transitions,
    )

    rows = ev_markov_transitions(spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("user_id", "ts", "event_id", "event_type").toPandas() \
        .sort_values(["user_id", "ts", "event_id"])
    ev["next"] = ev.groupby("user_id").event_type.shift(-1)
    pairs = ev.dropna(subset=["next"]).groupby(
        ["event_type", "next"]
    ).size()
    by_from: dict[str, float] = {}
    for r in rows:
        assert r.n == pairs[(r.from_type, r.to_type)]
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    for s in by_from.values():   # each matrix row sums to 1
        assert s == pytest.approx(1.0, abs=1e-4)


def test_bm25_matches_pure_python(spark):
    from data_ingestion_worker_spark.operators.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
        doc_bm25_rank,
    )

    rows = doc_bm25_rank(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    toks = {d.doc_id: d.text.lower().split() for d in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in BM25_QUERY
    }
    scores = {}
    for did, t in toks.items():
        s = 0.0
        for q in BM25_QUERY:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = (n - df[q] + 0.5) / (df[q] + 0.5)
            s += idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(t) / avgdl)
            )
        scores[did] = s
    expect = sorted(scores, key=lambda i: (-scores[i], i))[:BM25_TOPK]
    assert [r.doc_id for r in rows] == expect
    for r in rows:
        assert r.score == pytest.approx(scores[r.doc_id], abs=1e-3)


def test_skyline_is_exactly_the_undominated_set(spark):
    from data_ingestion_worker_spark.operators.tpch_ext import skyline_pareto

    rows = skyline_pareto(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_custkey", "o_totalprice").toPandas()
    per = o.groupby("o_custkey").agg(
        n=("o_totalprice", "size"), spend=("o_totalprice", "sum")
    ).reset_index()
    pts = list(per.itertuples(index=False))
    frontier = {
        p.o_custkey
        for p in pts
        if not any(
            q.n >= p.n and q.spend >= p.spend
            and (q.n > p.n or q.spend > p.spend)
            for q in pts
        )
    }
    assert {r.custkey for r in rows} == frontier


def test_mannwhitney_matches_scipy_style_recompute(spark):
    """U and z recomputed from raw values with numpy average ranks
    (the textbook formulation the bucketed plan must equal)."""
    from data_ingestion_worker_spark.operators.stats import (
        MW_TYPE_A,
        MW_TYPE_B,
        stats_mannwhitney_u,
    )

    row = stats_mannwhitney_u(spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_type", "value").toPandas()
    a = np.floor(ev[ev.event_type == MW_TYPE_A].value.values * 1000.0)
    b = np.floor(ev[ev.event_type == MW_TYPE_B].value.values * 1000.0)
    pooled = np.concatenate([a, b])
    order = pooled.argsort(kind="stable")
    ranks = np.empty(len(pooled))
    # average ranks with ties
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2.0
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u_x2 == round(2 * u1)
    # z against the tie-corrected normal approximation
    n = len(a) + len(b)
    _, counts = np.unique(pooled, return_counts=True)
    t = float((counts.astype(np.int64) ** 3 - counts).sum())
    assert row.tie_term == round(t)
    var = len(a) * len(b) / 12.0 * ((n + 1) - t / (n * (n - 1)))
    z = (u1 - len(a) * len(b) / 2.0) / np.sqrt(var)
    assert abs(row.z - z) < 1e-4 + 1e-12


def test_rfm_scores_partition_users_into_bands(spark):
    from data_ingestion_worker_spark.operators.events import (
        ev_rfm_segmentation,
    )

    rows = ev_rfm_segmentation(spark, SF_DIR).collect()
    assert rows, "no purchase users"
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 \
            and 1 <= r.m_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
        assert r.recency_days >= 0
    # quintile cutoffs: each frequency band is non-empty only if enough
    # distinct values exist, but band assignment must be monotone in the
    # metric: sort by frequency and check scores never decrease.
    by_f = sorted(rows, key=lambda r: r.frequency)
    for lo, hi in zip(by_f, by_f[1:]):
        assert lo.f_score <= hi.f_score
    by_m = sorted(rows, key=lambda r: r.monetary)
    for lo, hi in zip(by_m, by_m[1:]):
        assert lo.m_score <= hi.m_score
    # recency: larger recency_days (older) must never score higher
    by_r = sorted(rows, key=lambda r: r.recency_days)
    for lo, hi in zip(by_r, by_r[1:]):
        assert lo.r_score >= hi.r_score


def test_path_topk_is_bounded_and_ordered(spark):
    from data_ingestion_worker_spark.operators.events import ev_path_topk

    rows = ev_path_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert (a.n_users, a.path) != (b.n_users, b.path)
        assert a.n_users > b.n_users or (
            a.n_users == b.n_users and a.path < b.path
        )
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 5


def test_quality_quantile_norm_is_a_valid_rank_transform(spark):
    from collections import defaultdict

    from data_ingestion_worker_spark.operators.text import (
        doc_quality_quantile_norm,
    )

    rows = doc_quality_quantile_norm(spark, SF_DIR).collect()
    per_source = defaultdict(list)
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0 <= r.decile <= 9
        per_source[r.source].append(r)
    for src, rs in per_source.items():
        rs.sort(key=lambda r: r.quality)
        # pct_rank monotone in quality, ties share a rank
        for lo, hi in zip(rs, rs[1:]):
            if lo.quality == hi.quality:
                assert lo.pct_rank == hi.pct_rank
            else:
                assert lo.pct_rank < hi.pct_rank
        if len(rs) > 1:
            assert rs[-1].pct_rank == 1.0
            assert rs[0].pct_rank == 0.0


def test_pca_top_component_matches_numpy_eigh(spark):
    """Power-iteration loadings vs numpy's full eigendecomposition of
    the same integer Gram matrix (sign-aligned, tolerance covers the
    fixed-iteration truncation)."""
    from data_ingestion_worker_spark.operators.similarity import (
        emb_gram_matrix,
        emb_pca_top_component,
    )

    g_rows = emb_gram_matrix(spark, SF_DIR).collect()
    d = max(r.j for r in g_rows) + 1
    g = np.zeros((d, d))
    for r in g_rows:
        g[r.i, r.j] = r.g
        g[r.j, r.i] = r.g
    vals, vecs = np.linalg.eigh(g)
    top = vecs[:, np.argmax(vals)]
    pivot = int(np.argmax(np.abs(top)))
    if top[pivot] < 0:
        top = -top
    got = emb_pca_top_component(spark, SF_DIR).collect()
    loadings = np.array([r.loading for r in sorted(got, key=lambda r: r.i)])
    assert np.allclose(loadings, top, atol=1e-6)
    assert abs(np.linalg.norm(loadings) - 1.0) < 1e-9


def test_auc_matches_rank_recompute(spark):
    """AUC recomputed from raw quality quanta with numpy average ranks
    (the probabilistic definition: P(s+ > s-) + 0.5 P(tie))."""
    from data_ingestion_worker_spark.operators.text import (
        stats_auc_quality_lang,
    )

    row = stats_auc_quality_lang(spark, SF_DIR).collect()[0]
    import pandas as pd

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .selectExpr("text", "lang").toPandas()
    d = d[d.text.str.len() > 0]
    stopwords = ["the", "a", "and", "of", "to", "in", "is"]

    def quanta(t):
        toks = t.strip().lower().split()
        n_tok = len(toks)
        stop = sum(1 for w in toks if w in stopwords)
        alpha = sum(1 for c in t if c.isascii() and c.isalpha())
        raw = (stop / n_tok) * 0.4 + (alpha / len(t)) * 0.3 \
            + min(1.0, n_tok / 100.0) * 0.3
        return int(np.floor(raw * 10000.0))

    scores = d.text.map(quanta).values
    pos = (d.lang == "en").values
    # pairwise definition on the small fixture
    s_pos, s_neg = scores[pos], scores[~pos]
    wins = (s_pos[:, None] > s_neg[None, :]).sum()
    ties = (s_pos[:, None] == s_neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(s_pos) * len(s_neg))
    assert row.n_pos == len(s_pos) and row.n_neg == len(s_neg)
    assert abs(row.auc - auc) < 2e-6


def test_spearman_matches_scipy_style_recompute(spark):
    """rho recomputed with numpy average ranks (tie-aware
    Pearson-on-ranks definition)."""
    from data_ingestion_worker_spark.operators.stats import (
        stats_spearman_corr,
    )

    row = stats_spearman_corr(spark, SF_DIR).collect()[0]
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .selectExpr("o_orderkey", "CAST(o_totalprice AS DOUBLE) p") \
        .toPandas()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
        .groupBy("l_orderkey").count().toPandas()
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")

    def avg_ranks(v):
        import pandas as pd
        return pd.Series(v).rank(method="average").values

    rx = avg_ranks(np.round(m.p.values * 100))
    ry = avg_ranks(m["count"].values)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row.n == len(m)
    assert abs(row.rho - rho) < 2e-6


def test_markov_stationary_matches_python_power_iteration(spark, sf_dir):
    """The integer-scaled power iteration must be reproducible exactly
    from the transition counts with plain Python bigint arithmetic —
    the operator's determinism claim, checked end to end."""
    from data_ingestion_worker_spark.operators.events import (
        MS_ITERS,
        MS_SCALE,
        ev_markov_stationary,
        ev_markov_transitions,
    )

    trans = ev_markov_transitions(spark, sf_dir).collect()
    states = sorted({r.from_type for r in trans})
    sset = set(states)
    c = {(r.from_type, r.to_type): r.n for r in trans if r.to_type in sset}
    r_tot = {s: sum(n for (f, _), n in c.items() if f == s) for s in states}
    pi = {s: MS_SCALE // len(states) for s in states}
    for _ in range(MS_ITERS):
        nxt: dict[str, int] = {}
        for (f, t), n in c.items():
            nxt[t] = nxt.get(t, 0) + (pi.get(f, 0) * n) // r_tot[f]
        pi = nxt
    got = {r.event_type: r.pi_scaled
           for r in ev_markov_stationary(spark, sf_dir).collect()}
    assert got == {s: m for s, m in pi.items() if s in got or m != 0}
    # mass is conserved up to integer truncation (never created)
    assert sum(got.values()) <= MS_SCALE
    assert sum(got.values()) >= MS_SCALE - MS_ITERS * len(states) * len(states)


def test_dup_quality_profile_buckets_partition_the_corpus(spark, sf_dir):
    """Bucket doc counts must add up to the scored corpus, cluster
    counts must agree with the underlying components, and each bucket's
    mean must lie within the per-doc quality range."""
    from collections import Counter

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.dedup import (
        corpus_dup_quality_profile,
        dedup_connected_components,
    )
    from data_ingestion_worker_spark.tables import load_table

    prof = {r.size_bucket: r for r in
            corpus_dup_quality_profile(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .filter(F.length("text") > 0)
    assert sum(r.n_docs for r in prof.values()) == docs.count()
    cc = dedup_connected_components(spark, sf_dir).collect()
    sizes = Counter(r.cluster_id for r in cc)

    def bucket(n: int) -> str:
        return ("unique" if n == 1 else "pair" if n == 2
                else "small" if n <= 4 else "large")

    expect = Counter(bucket(n) for n in sizes.values())
    assert {b: r.n_clusters for b, r in prof.items()} == dict(expect)
    for r in prof.values():
        assert 0 <= r.mean_q <= 10000  # quality formula is bounded by 1.0


def test_benford_shares_sum_and_digit_extraction(spark, sf_dir):
    """Digit shares must cover every order exactly once and the digit
    must equal the leading digit of the formatted total; expectations
    are the Benford constants."""
    import math

    from data_ingestion_worker_spark.operators.stats import (
        BENFORD,
        stats_benford,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = {r.digit: r for r in stats_benford(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice") \
        .collect()
    from collections import Counter
    expect = Counter(str(round(r.o_totalprice, 2))[0] for r in orders)
    for d, r in rows.items():
        assert r.n == expect[str(d)], d
        assert abs(r.benford - round(math.log10(1 + 1 / d), 6)) < 1e-12
        assert abs(r.delta - round(r.share - r.benford, 6)) < 1e-12
    assert sum(r.n for r in rows.values()) == len(orders)


def test_ngram_novelty_first_doc_claims_everything(spark, sf_dir):
    """The smallest doc_id (first corpus doc with >=3 tokens) is 100%
    novel; every novelty is in [0, 1]; novel counts never exceed the
    shingle counts; and summing n_novel over docs equals the number of
    distinct shingles in the corpus (each shingle is novel exactly
    once)."""
    from data_ingestion_worker_spark.operators.dedup import (
        _shingles,
        doc_ngram_novelty,
    )

    rows = doc_ngram_novelty(spark, sf_dir).collect()
    assert rows
    first = min(r.doc_id for r in rows)
    by_id = {r.doc_id: r for r in rows}
    assert by_id[first].n_novel == by_id[first].n_shingles
    assert by_id[first].novelty == 1.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert 0.0 <= r.novelty <= 1.0
    n_distinct = _shingles(spark, sf_dir).select("shingle") \
        .distinct().count()
    assert sum(r.n_novel for r in rows) == n_distinct


def test_growth_curve_buckets_and_totals(spark, sf_dir):
    """Deciles partition the corpus; the final cumulative vocabulary is
    exactly the distinct shingle count; per-bucket vocab agrees with the
    novelty operator's first-occurrence attribution."""
    from data_ingestion_worker_spark.operators.dedup import (
        _shingles,
        corpus_growth_curve,
        doc_ngram_novelty,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = sorted(corpus_growth_curve(spark, sf_dir).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(10))
    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    n_shingles = _shingles(spark, sf_dir).select("shingle") \
        .distinct().count()
    assert rows[-1].vocab_cum == n_shingles
    assert sum(r.vocab_added for r in rows) == n_shingles
    cum = 0
    for r in rows:
        cum += r.vocab_added
        assert r.vocab_cum == cum
    # cross-check one bucket against the novelty attribution
    mx = max(d.doc_id for d in docs)
    nov = doc_ngram_novelty(spark, sf_dir).collect()
    b0 = sum(r.n_novel for r in nov if (r.doc_id * 10) // (mx + 1) == 0)
    assert rows[0].vocab_added == b0


def test_forecast_linear_matches_numpy_ols(spark, sf_dir):
    """Slope/intercept/forecast must match an independent numpy
    polyfit-free OLS on the collected daily counts."""
    from collections import Counter

    from data_ingestion_worker_spark.operators.events import (
        ev_forecast_linear,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = {r.event_type: r for r in
            ev_forecast_linear(spark, sf_dir).collect()}
    assert rows
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "ts").collect()
    daily: Counter = Counter((r.event_type, r.ts.date()) for r in ev)
    by_type: dict[str, dict] = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, {})[day] = c
    for et, m in by_type.items():
        days = sorted(m)
        xs = [(d - days[0]).days for d in days]
        ys = [m[d] for d in days]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = n * sxx - sx * sx
        if den <= 0:
            assert et not in rows
            continue
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        r = rows[et]
        assert abs(r.slope - slope) < 1e-4, et
        assert abs(r.intercept - intercept) < 1e-2, et
        assert abs(r.forecast_next
                   - (intercept + slope * (max(xs) + 1))) < 1e-2, et


def test_bpe_merges_match_python_counter(spark, sf_dir):
    """The top merge-candidate counts must equal a plain-Python counter
    over the token stream (pair count weighted by word frequency), with
    the (count DESC, pair ASC) cutoff."""
    from collections import Counter

    from data_ingestion_worker_spark.operators.text import (
        BPE_TOP_K,
        corpus_bpe_merges,
    )
    from data_ingestion_worker_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    pair_counts: Counter = Counter()
    for r in docs:
        for w in (r.text or "").strip().lower().split():
            for i in range(len(w) - 1):
                pair_counts[w[i:i + 2]] += 1
    expect = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    expect = expect[:BPE_TOP_K]
    got = [(r.pair, r.merge_count)
           for r in corpus_bpe_merges(spark, sf_dir).collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_user_streaks_match_python_islands(spark, sf_dir):
    """The streak-length distribution must equal a plain-Python
    consecutive-day scan, and user counts must cover every active
    user exactly once."""
    from collections import Counter
    from datetime import timedelta

    from data_ingestion_worker_spark.operators.events import ev_user_streaks
    from data_ingestion_worker_spark.tables import load_table

    got = {r.streak_len: r.n_users
           for r in ev_user_streaks(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts").collect()
    days_by_user: dict[int, set] = {}
    for r in ev:
        days_by_user.setdefault(r.user_id, set()).add(r.ts.date())
    expect: Counter = Counter()
    for days in days_by_user.values():
        best = cur = 1
        prev = None
        for d in sorted(days):
            if prev is not None and d - prev == timedelta(days=1):
                cur += 1
            else:
                cur = 1
            best = max(best, cur)
            prev = d
        expect[best] += 1
    assert got == dict(expect)
    assert sum(got.values()) == len(days_by_user)


def test_mba_lift_matches_python_counter(spark, sf_dir):
    """Support/confidence/lift recomputed with plain-Python counters
    over the distinct (order, part) pairs, including the floor-6 and
    the (lift DESC, pa, pb) cutoff."""
    import math
    from collections import Counter

    from data_ingestion_worker_spark.operators.tpch_ext import (
        MBA_MIN_PAIR,
        MBA_TOP_K,
        mba_part_lift,
    )
    from data_ingestion_worker_spark.tables import load_table

    lo = {(r.l_orderkey, r.l_partkey)
          for r in load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").collect()}
    by_order: dict[int, list[int]] = {}
    for ok, p in lo:
        by_order.setdefault(ok, []).append(p)
    n = len(by_order)
    item: Counter = Counter(p for _, p in lo)
    pair: Counter = Counter()
    for parts in by_order.values():
        parts.sort()
        for i, pa in enumerate(parts):
            for pb in parts[i + 1:]:
                pair[(pa, pb)] += 1

    def f6(x: float) -> float:
        return math.floor(x * 1e6) / 1e6

    expect = sorted(
        ((pa, pb, cp, f6(cp / n), f6(cp / item[pa]),
          f6(cp * n / (item[pa] * item[pb])))
         for (pa, pb), cp in pair.items() if cp >= MBA_MIN_PAIR),
        key=lambda t: (-t[5], t[0], t[1]),
    )[:MBA_TOP_K]
    got = [(r.pa, r.pb, r.cp, r.support, r.confidence, r.lift)
           for r in mba_part_lift(spark, sf_dir).collect()]
    assert sorted(got, key=lambda t: (-t[5], t[0], t[1])) == expect


def test_hhi_bounds_and_python_mirror(spark, sf_dir):
    """Each nation's HHI must equal the Python-exact share-squares sum
    and respect the 1/n..1 bounds."""
    from collections import defaultdict
    from decimal import Decimal

    from data_ingestion_worker_spark.operators.stats import (
        stats_hhi_concentration,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.n_name: r for r in
           stats_hhi_concentration(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_suppkey", "l_extendedprice").collect()
    sup = {r.s_suppkey: r.s_nationkey for r in
           load_table(spark, sf_dir, "supplier").collect()}
    nat = {r.n_nationkey: r.n_name for r in
           load_table(spark, sf_dir, "nation").collect()}
    rev: dict = defaultdict(Decimal)
    for r in li:
        key = (nat[sup[r.l_suppkey]], r.l_suppkey)
        rev[key] += Decimal(str(round(r.l_extendedprice, 2)))
    by_nation: dict = defaultdict(list)
    for (nm, _), v in rev.items():
        by_nation[nm].append(v)
    assert set(got) == set(by_nation)
    for nm, vals in by_nation.items():
        tot = sum(vals)
        expect = float(sum(v * v for v in vals)) / float(tot * tot)
        r = got[nm]
        assert r.n_suppliers == len(vals)
        assert abs(r.hhi - expect) < 1e-5, nm
        assert 1.0 / len(vals) - 1e-9 <= r.hhi <= 1.0 + 1e-9


def test_gini_matches_sorted_python_formula(spark, sf_dir):
    """Per-type Gini recomputed from the individually-sorted per-user
    counts with the classic rank formula; bounds respected."""
    from collections import Counter

    from data_ingestion_worker_spark.operators.events import (
        ev_gini_user_activity,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r for r in
           ev_gini_user_activity(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "user_id").collect()
    per: Counter = Counter((r.event_type, r.user_id) for r in ev)
    by_type: dict[str, list[int]] = {}
    for (et, _), c in per.items():
        by_type.setdefault(et, []).append(c)
    assert set(got) == set(by_type)
    for et, xs in by_type.items():
        xs.sort()
        n, w = len(xs), sum(xs)
        s = sum(i * x for i, x in enumerate(xs, start=1))
        expect = 2 * s / (n * w) - (n + 1) / n
        r = got[et]
        assert (r.n_users, r.n_events) == (n, w)
        assert abs(r.gini - expect) < 1e-5, et
        assert 0.0 - 1e-9 <= r.gini < 1.0


def test_attribution_conserves_value_and_mirrors_python(spark, sf_dir):
    """Linear attribution recomputed with a plain-Python 24 h scan; the
    credited total must equal the purchase total minus only the
    documented per-touch floor loss (< 1 cent per credited touch)."""
    from collections import defaultdict
    from datetime import timedelta
    from decimal import Decimal

    from data_ingestion_worker_spark.operators.events import (
        ev_attribution_linear,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.channel: (r.n_credits, r.attributed_cents)
           for r in ev_attribution_linear(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_type", "value").collect()
    touches = defaultdict(list)
    for r in ev:
        if r.event_type in ("click", "view"):
            touches[r.user_id].append((r.ts, r.event_type))
    expect: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    total_cents = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        total_cents += cents
        hits = [ch for (ts, ch) in touches[r.user_id]
                if ts < r.ts and ts >= r.ts - timedelta(hours=24)]
        if not hits:
            expect["direct"][0] += 1
            expect["direct"][1] += cents
            continue
        for ch in hits:
            expect[ch][0] += 1
            expect[ch][1] += cents // len(hits)
    assert got == {ch: tuple(v) for ch, v in expect.items()}
    credited = sum(v[1] for v in got.values())
    touched_credits = sum(v[0] for ch, v in got.items() if ch != "direct")
    assert credited <= total_cents
    assert total_cents - credited < max(touched_credits, 1)


def test_user_entropy_bounds_and_python_mirror(spark, sf_dir):
    """Entropy/Simpson recomputed row-by-row with the same quantization;
    single-type users sit at exactly zero on both measures and every
    entropy is within the log2(n_types) ceiling."""
    import math
    from collections import Counter

    from data_ingestion_worker_spark.operators.events import ev_user_entropy
    from data_ingestion_worker_spark.tables import load_table

    got = {r.user_id: r for r in ev_user_entropy(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "event_type").collect()
    counts: Counter = Counter((r.user_id, r.event_type) for r in ev)
    by_user: dict[int, list[int]] = {}
    for (u, _), c in counts.items():
        by_user.setdefault(u, []).append(c)
    assert set(got) == set(by_user)
    for u, cs in by_user.items():
        n = sum(cs)
        ent = sum(math.floor(-1e6 * (c / n) * math.log2(c / n))
                  for c in cs)
        simpson = (1_000_000 * (n * n - sum(c * c for c in cs))) \
            // (n * n)
        r = got[u]
        assert (r.n_events, r.n_types) == (n, len(cs))
        assert r.entropy_microbits == ent
        assert r.simpson_micro == simpson
        if len(cs) == 1:
            assert r.entropy_microbits == 0 and r.simpson_micro == 0
        assert r.entropy_microbits <= math.log2(len(cs)) * 1e6 + len(cs)


def test_ewma_daily_matches_python_recursion(spark, sf_dir):
    """The truncated power-of-two EWMA must equal a plain-Python lag sum
    over the dense calendar, and a constant series must be flat at
    1000·n once the 8-lag window is full."""
    from collections import defaultdict
    from datetime import timedelta

    from data_ingestion_worker_spark.operators.events import (
        EWMA_LAGS, ev_ewma_daily,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = ev_ewma_daily(spark, sf_dir).collect()
    got = {(r.day, r.event_type): (r.n, r.ewma_milli) for r in rows}
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "event_type").collect()
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r.ts.date(), r.event_type)] += 1
    d0 = min(k[0] for k in daily)
    d1 = max(k[0] for k in daily)
    types = sorted({k[1] for k in daily})
    n_days = (d1 - d0).days + 1
    assert len(got) == n_days * len(types)
    for et in types:
        series = [daily.get((d0 + timedelta(days=i), et), 0)
                  for i in range(n_days)]
        for i in range(n_days):
            num = den = 0
            for k in range(EWMA_LAGS):
                w = 2 ** (EWMA_LAGS - 1 - k)
                if i - k >= 0:
                    num += series[i - k] * w
                    den += w
            key = (d0 + timedelta(days=i), et)
            assert got[key] == (series[i], (1000 * num) // den), key


def test_bootstrap_means_python_mirror_and_concentration(spark, sf_dir):
    """One full replicate recomputed with hashlib (same md5 path, same
    thresholds, same floor mean) plus distributional sanity: every
    replicate's effective N stays within 5σ of the row count."""
    import hashlib
    from decimal import Decimal

    from data_ingestion_worker_spark.operators.stats import (
        B_RESAMPLES, _POISSON1_T, stats_bootstrap_means,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.b: (r.n_eff, r.mean_microcents)
           for r in stats_bootstrap_means(spark, sf_dir).collect()}
    assert set(got) == set(range(1, B_RESAMPLES + 1))
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_totalprice").collect()
    n = len(orders)
    # Poisson(1): Var(n_eff) = n — a 5σ band is a ~1e-6 false-alarm test
    for b, (n_eff, _) in got.items():
        assert abs(n_eff - n) <= 5 * max(n, 1) ** 0.5, (b, n_eff, n)
    for b in (1, B_RESAMPLES):
        sw = swc = 0
        blk = (b - 1) // 8
        off = 4 * ((b - 1) % 8)
        for r in orders:
            cents = int(Decimal(str(r.o_totalprice))
                        .quantize(Decimal("0.01")) * 100)
            digest = hashlib.md5(
                f"boot:{blk}:{r.o_orderkey}".encode()).hexdigest()
            h = int(digest[off:off + 4], 16)
            w = 6
            for k, t in enumerate(_POISSON1_T):
                if h < t:
                    w = k
                    break
            sw += w
            swc += w * cents
        assert got[b] == (sw, (1_000_000 * swc) // sw), b


def test_zipf_fit_matches_numpy_ols(spark, sf_dir):
    """Slope/intercept recomputed with numpy lstsq over the same
    quantized log points (quantization bias < 1e-4 per point, so the
    fits agree to ~1e-3); ranking and count must match exactly."""
    import math
    from collections import Counter

    import numpy as np

    from data_ingestion_worker_spark.operators.text import (
        ZIPF_TOP, _ZIPF_QUANT, corpus_zipf_fit,
    )
    from data_ingestion_worker_spark.tables import load_table

    row = corpus_zipf_fit(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freqs: Counter = Counter()
    for r in docs:
        freqs.update(r.text.strip().lower().split())
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
    assert row.n_tokens == len(top)
    xq = np.array([math.floor(_ZIPF_QUANT * math.log(i + 1))
                   for i in range(len(top))], dtype=np.int64)
    yq = np.array([math.floor(_ZIPF_QUANT * math.log(f))
                   for _, f in top], dtype=np.int64)
    a = np.vstack([xq, np.ones_like(xq)]).T.astype(np.float64)
    slope, icpt = np.linalg.lstsq(a, yq.astype(np.float64), rcond=None)[0]
    assert abs(row.slope - slope) < 1e-3
    assert abs(row.intercept_ln - icpt / _ZIPF_QUANT) < 1e-3
    assert row.slope < 0  # frequency must fall with rank


def test_psi_drift_partitions_and_python_mirror(spark, sf_dir):
    """Bucket counts must partition both halves exactly; each PSI term
    recomputed in python from the same decile cuts and quantization."""
    import math

    from data_ingestion_worker_spark.operators.stats import (
        PSI_BUCKETS, stats_psi_drift,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = {r.bucket: r for r in stats_psi_drift(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, PSI_BUCKETS + 1))
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    import datetime as dt
    from decimal import Decimal

    epoch = dt.datetime(1970, 1, 1)
    pts = [(int((r.ts - epoch).total_seconds()),
            int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100))
           for r in ev]
    s0, s1 = min(s for s, _ in pts), max(s for s, _ in pts)
    ref = sorted(c for s, c in pts if 2 * s < s0 + s1)
    cur = [c for s, c in pts if not 2 * s < s0 + s1]
    assert sum(r.n_ref for r in rows.values()) == len(ref)
    assert sum(r.n_cur for r in rows.values()) == len(cur)

    def q_cont(xs, p):  # linear-interpolation percentile (both engines)
        h = (len(xs) - 1) * p
        lo = math.floor(h)
        return xs[lo] + (h - lo) * (xs[min(lo + 1, len(xs) - 1)] - xs[lo])

    cuts = [q_cont(ref, k / PSI_BUCKETS) for k in range(1, PSI_BUCKETS)]

    def bucket(c):
        return 1 + sum(1 for t in cuts if c > t)

    tr, tc = len(ref), len(cur)
    for b, r in rows.items():
        n_ref = sum(1 for c in ref if bucket(c) == b)
        n_cur = sum(1 for c in cur if bucket(c) == b)
        assert (r.n_ref, r.n_cur) == (n_ref, n_cur), b
        p = n_ref / tr if n_ref else 1e-6
        q = n_cur / tc if n_cur else 1e-6
        assert r.psi_term_micro == math.floor(
            1_000_000 * (q - p) * math.log(q / p)), b


def test_anomaly_mad_matches_python_medians(spark, sf_dir):
    """Median/MAD/flag recomputed with statistics.median over the same
    daily counts; the doubled/quadrupled integer encoding must equal
    the float rule exactly."""
    from collections import defaultdict
    from statistics import median

    from data_ingestion_worker_spark.operators.events import ev_anomaly_mad
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.event_type, r.day): r
           for r in ev_anomaly_mad(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "event_type").collect()
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts.date())] += 1
    assert set(got) == set(daily)
    by_type: dict[str, list] = defaultdict(list)
    for (et, day), n in daily.items():
        by_type[et].append(n)
    for et, ns in by_type.items():
        med = median(ns)
        mad = median(abs(x - med) for x in ns)
        for (t, day), n in daily.items():
            if t != et:
                continue
            r = got[(t, day)]
            assert r.n == n
            assert r.dev2 == round(abs(2 * n - 2 * med))
            assert r.is_anomaly == int(abs(n - med) > 3 * mad), (t, day)


def test_rec_item_topk_matches_python_counter(spark, sf_dir):
    """The per-item neighbor list recomputed with plain-Python counters
    under the same (cooc desc, rec asc) order and min-cooc floor."""
    from collections import Counter, defaultdict

    from data_ingestion_worker_spark.operators.tpch_ext import (
        REC_MIN_COOC, REC_PER_ITEM, rec_item_cooccur_topk,
    )
    from data_ingestion_worker_spark.tables import load_table

    got: dict = defaultdict(list)
    for r in rec_item_cooccur_topk(spark, sf_dir).collect():
        got[r.item].append((r.rank, r.rec, r.cooc, r.confidence))
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").collect()
    baskets: dict = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    cooc: Counter = Counter()
    item_n: Counter = Counter()
    for parts in baskets.values():
        for p in parts:
            item_n[p] += 1
            for q in parts:
                if q != p:
                    cooc[(p, q)] += 1
    expect: dict = defaultdict(list)
    neighbors: dict = defaultdict(list)
    for (p, q), c in cooc.items():
        if c >= REC_MIN_COOC:
            neighbors[p].append((q, c))
    for p, ns in neighbors.items():
        ns.sort(key=lambda t: (-t[1], t[0]))
        for rank, (q, c) in enumerate(ns[:REC_PER_ITEM], start=1):
            conf = int(c / item_n[p] * 1e6) / 1e6
            expect[p].append((rank, q, c, conf))
    assert {k: sorted(v) for k, v in got.items()} == \
        {k: sorted(v) for k, v in expect.items()}


def test_interarrival_burstiness_matches_numpy(spark, sf_dir):
    """CV²/burstiness recomputed with numpy over the same per-(user,
    type) gap series; Poisson-ish synthetic arrivals must sit near
    B≈0 rather than at the bursty extreme."""
    from collections import defaultdict

    import numpy as np

    from data_ingestion_worker_spark.operators.events import (
        ev_interarrival_burstiness,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r
           for r in ev_interarrival_burstiness(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "event_type").collect()
    series: dict = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        series[(r.user_id, r.event_type)].append(r.ts)
    gaps: dict = defaultdict(list)
    for (u, et), ts in series.items():
        for a, b in zip(ts, ts[1:]):
            gaps[et].append(int(b.timestamp()) - int(a.timestamp()))
    for et, gs in gaps.items():
        if len(gs) < 2:
            assert et not in got
            continue
        g = np.array(gs, dtype=np.float64)
        mean = g.mean()
        var = g.var(ddof=1)
        r = got[et]
        assert r.n_gaps == len(gs)
        assert abs(r.mean_gap_s - mean) < 0.011
        assert abs(r.cv2 - var / mean**2) < 1e-4
        b = (var**0.5 - mean) / (var**0.5 + mean)
        assert abs(r.burstiness - b) < 1e-4
        assert -1.0 <= r.burstiness <= 1.0


def test_churn_features_match_python_rollup(spark, sf_dir):
    """Features + label recomputed with plain-Python dicts; the label
    must flip exactly at the CHURN_DAYS boundary."""
    from collections import defaultdict
    from decimal import Decimal

    from data_ingestion_worker_spark.operators.events import (
        CHURN_DAYS, ev_churn_features,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.user_id: r for r in ev_churn_features(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").collect()
    per: dict = defaultdict(lambda: {"last": 0, "n": 0,
                                     "mon": Decimal(0), "days": set(),
                                     "types": set()})
    ref = 0
    for r in ev:
        s = int(r.ts.timestamp())
        ref = max(ref, s)
        u = per[r.user_id]
        u["last"] = max(u["last"], s)
        u["n"] += 1
        u["mon"] += Decimal(str(r.value)).quantize(Decimal("0.01"))
        u["days"].add(r.ts.date())
        u["types"].add(r.event_type)
    assert set(got) == set(per)
    for uid, u in per.items():
        r = got[uid]
        rec = (ref - u["last"]) // 86400
        assert (r.recency_days, r.frequency, r.active_days, r.n_types) \
            == (rec, u["n"], len(u["days"]), len(u["types"]))
        assert r.monetary == float(u["mon"])
        assert r.churned == int(rec > CHURN_DAYS)


def test_policy_flags_match_python_lexicon(spark, sf_dir):
    """Category counts and the per-category flag rule recomputed with
    plain-Python token counting."""
    from data_ingestion_worker_spark.operators.text import (
        POLICY_FLAG_MIN, POLICY_LEXICON, doc_policy_flags,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.doc_id: r for r in doc_policy_flags(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    assert set(got) == {d.doc_id for d in docs}
    any_flagged = False
    for d in docs:
        toks = d.text.strip().lower().split()
        r = got[d.doc_id]
        counts = {}
        for cat, terms in POLICY_LEXICON.items():
            counts[cat] = sum(1 for t in toks if t in terms)
            assert getattr(r, f"n_{cat}") == counts[cat], (d.doc_id, cat)
        assert r.n_policy_hits == sum(counts.values())
        flag = int(any(c >= POLICY_FLAG_MIN for c in counts.values()))
        assert r.flagged == flag
        any_flagged = any_flagged or bool(flag)
    assert any_flagged   # the lexicon must actually fire on this corpus


def test_lm_xent_proxy_matches_python_bigram_lm(spark, sf_dir):
    """Cross-entropy recomputed with plain-Python Counters (same
    smoothing, same quantization); fluency ordering must hold: a doc's
    mean xent is within the corpus term range."""
    import math
    from collections import Counter

    from data_ingestion_worker_spark.operators.text import (
        _LM_QUANT, doc_lm_xent_proxy,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.doc_id: r for r in doc_lm_xent_proxy(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    toks = {d.doc_id: d.text.strip().lower().split() for d in docs}
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    for did, t in toks.items():
        if len(t) < 2:
            assert did not in got
            continue
        terms = [math.floor(-_LM_QUANT * math.log2(
            (c12[(a, b)] + 1) / (c1[a] + v)))
            for a, b in zip(t, t[1:])]
        r = got[did]
        assert r.n_bigrams == len(terms)
        assert r.xent_q == sum(terms), did
        assert r.mean_xent_q == sum(terms) // len(terms)
        assert r.mean_xent_q >= 0


def test_strict_funnel_bounds_and_python_mirror(spark, sf_dir):
    """The bounded funnel recomputed with a plain-Python per-user scan;
    the strict counts can never exceed the unbounded funnel's."""
    from collections import defaultdict
    from datetime import timedelta

    from data_ingestion_worker_spark.operators.events import (
        ev_funnel_stages, ev_funnel_strict_window,
    )
    from data_ingestion_worker_spark.tables import load_table

    row = ev_funnel_strict_window(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_type").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_type))
    n_view = n_click = n_buy = 0
    for evs in by_user.values():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        n_view += 1
        tv = min(views)
        clicks = [t for t, e in evs if e == "click"
                  and tv < t <= tv + timedelta(hours=1)]
        if not clicks:
            continue
        n_click += 1
        tc = min(clicks)
        buys = [t for t, e in evs if e == "purchase"
                and tc < t <= tc + timedelta(hours=24)]
        if buys:
            n_buy += 1
    assert (row.n_users, row.n_viewed, row.n_clicked_1h,
            row.n_purchased_24h) == (len(by_user), n_view, n_click, n_buy)
    assert row.view_to_click == int(n_click / n_view * 1e4) / 1e4
    unbounded = ev_funnel_stages(spark, sf_dir).collect()
    loose_click = sum(1 for r in unbounded if r.t_click is not None)
    loose_buy = sum(1 for r in unbounded if r.t_purchase is not None)
    assert row.n_clicked_1h <= loose_click
    assert row.n_purchased_24h <= loose_buy


def test_partition_balance_covers_and_mirrors_hash(spark, sf_dir):
    """Partition counts recomputed with hashlib; counts must cover the
    table and load factors must average ~1."""
    import hashlib
    from collections import Counter

    from data_ingestion_worker_spark.operators.profiling import (
        PB_PARTITIONS, profile_partition_balance,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.partition_id: (r.n_rows, r.load_factor)
           for r in profile_partition_balance(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey").collect()
    expect: Counter = Counter()
    for r in li:
        h = int(hashlib.md5(
            f"pb:{r.l_orderkey}".encode()).hexdigest()[:15], 16)
        expect[h % PB_PARTITIONS] += 1
    assert {p: n for p, (n, _) in got.items()} == dict(expect)
    total = sum(expect.values())
    for p, (n, lf) in got.items():
        assert lf == int(n * PB_PARTITIONS / total * 1e4) / 1e4
    assert sum(n for n, _ in got.values()) == total


def test_power_analysis_matches_scipy_formula(spark, sf_dir):
    """needed_per_arm recomputed with numpy from the same quantized
    values; monotonicity: noisier metrics need more samples."""
    import math

    import numpy as np

    from data_ingestion_worker_spark.operators.stats import (
        POWER_MDE_FRACTION, _POWER_Z_ALPHA, _POWER_Z_BETA,
        stats_power_analysis,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r
           for r in stats_power_analysis(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(
            math.floor(r.value * 1000.0))
    assert set(got) == {t for t, v in by_type.items() if len(v) >= 2}
    for et, qs in by_type.items():
        a = np.array(qs, dtype=np.float64)
        mean, var = a.mean(), a.var(ddof=1)
        z = _POWER_Z_ALPHA + _POWER_Z_BETA
        expect_n = math.ceil(2 * var * z * z
                             / (POWER_MDE_FRACTION * mean) ** 2)
        r = got[et]
        assert r.n_events == len(qs)
        assert abs(r.needed_per_arm - expect_n) <= 1, et
        assert abs(r.mean_value - mean / 1000) < 1e-3


def test_quality_xent_corr_matches_numpy(spark, sf_dir):
    """r recomputed with numpy over the same quantized signals."""
    import math
    from collections import Counter

    import numpy as np

    from data_ingestion_worker_spark.operators.text import (
        _LM_QUANT, corpus_quality_xent_corr,
    )
    from data_ingestion_worker_spark.tables import load_table

    row = corpus_quality_xent_corr(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    toks = {d.doc_id: d.text.strip().lower().split() for d in docs}
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    v = len(vocab)
    xs, ys = [], []
    from data_ingestion_worker_spark.functions.text import STOPWORDS
    for d in docs:
        t = toks[d.doc_id]
        if len(t) < 2:
            continue
        terms = [math.floor(-_LM_QUANT * math.log2(
            (c12[(a, b)] + 1) / (c1[a] + v)))
            for a, b in zip(t, t[1:])]
        ys.append(sum(terms) // len(terms))
        n_tok = len(t)
        stop_n = sum(1 for w in t if w in STOPWORDS)
        alpha = sum(1 for ch in d.text if ch.isalpha())
        q = (stop_n / n_tok) * 0.4 + (alpha / len(d.text)) * 0.3 \
            + min(1.0, n_tok / 100.0) * 0.3
        xs.append(math.floor(q * 1e6))
    assert row.n_docs == len(xs)
    r = np.corrcoef(np.array(xs, dtype=np.float64),
                    np.array(ys, dtype=np.float64))[0, 1]
    assert abs(row.corr - r) < 1e-4
    assert -1.0 <= row.corr <= 1.0


def test_profile_drift_daily_matches_python_rollup(spark, sf_dir):
    """Daily profile + deltas recomputed with plain-Python dicts."""
    from collections import defaultdict
    from decimal import Decimal

    from data_ingestion_worker_spark.operators.profiling import (
        profile_drift_daily,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.day: r for r in profile_drift_daily(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "user_id", "value").collect()
    agg: dict = defaultdict(lambda: {"n": 0, "nulls": 0,
                                     "users": set(), "cents": 0})
    for r in ev:
        a = agg[r.ts.date()]
        a["n"] += 1
        if r.value is None:
            a["nulls"] += 1
        else:
            a["cents"] += int(Decimal(str(r.value))
                              .quantize(Decimal("0.01")) * 100)
        a["users"].add(r.user_id)
    assert set(got) == set(agg)
    prev = None
    for day in sorted(agg):
        a = agg[day]
        r = got[day]
        mean = (1000 * a["cents"]) // a["n"]
        assert (r.n, r.n_null_value, r.n_users, r.mean_millicents) == \
            (a["n"], a["nulls"], len(a["users"]), mean), day
        if prev is None:
            assert r.d_n is None and r.d_users is None
        else:
            assert r.d_n == a["n"] - prev["n"]
            assert r.d_users == len(a["users"]) - len(prev["users"])
        prev = a


def test_rolling_median_matches_python_windows(spark, sf_dir):
    """Trailing 7-day medians recomputed with statistics.median over
    the dense zero-filled series; clipped early windows count fewer
    days; medians must damp single-day spikes the mean would follow."""
    from collections import defaultdict
    from datetime import timedelta
    from statistics import median

    from data_ingestion_worker_spark.operators.events import (
        ROLLMED_DAYS, ev_rolling_median_7d,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.day, r.event_type): (r.n_days_in_window, r.median2)
           for r in ev_rolling_median_7d(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "event_type").collect()
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r.ts.date(), r.event_type)] += 1
    d0 = min(k[0] for k in daily)
    d1 = max(k[0] for k in daily)
    types = sorted({k[1] for k in daily})
    n_days = (d1 - d0).days + 1
    assert len(got) == n_days * len(types)
    for et in types:
        series = [daily.get((d0 + timedelta(days=i), et), 0)
                  for i in range(n_days)]
        for i in range(n_days):
            lo = max(0, i - ROLLMED_DAYS + 1)
            window = series[lo:i + 1]
            key = (d0 + timedelta(days=i), et)
            assert got[key] == (len(window),
                                round(2 * median(window))), key


def test_lead_lag_corr_matches_numpy(spark, sf_dir):
    """Every (pair, lag) r recomputed with numpy over the zero-filled
    series; lag 0 rows must be symmetric in the pair definition and
    every r within [-1, 1]."""
    from collections import defaultdict
    from datetime import timedelta

    import numpy as np

    from data_ingestion_worker_spark.operators.events import (
        LEADLAG_MAX, ev_lead_lag_corr,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.type_a, r.type_b, r.lag): (r.n_days, r.r)
           for r in ev_lead_lag_corr(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "event_type").collect()
    daily: dict = defaultdict(int)
    for r in ev:
        daily[(r.ts.date(), r.event_type)] += 1
    d0 = min(k[0] for k in daily)
    d1 = max(k[0] for k in daily)
    types = sorted({k[1] for k in daily})
    n_days = (d1 - d0).days + 1
    series = {et: np.array([daily.get((d0 + timedelta(days=i), et), 0)
                            for i in range(n_days)], dtype=np.float64)
              for et in types}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            for lag in range(-LEADLAG_MAX, LEADLAG_MAX + 1):
                # x_t paired with y_{t+lag}: overlap window
                if lag >= 0:
                    x = series[ta][:n_days - lag]
                    y = series[tb][lag:]
                else:
                    x = series[ta][-lag:]
                    y = series[tb][:n_days + lag]
                key = (ta, tb, lag)
                if x.std() == 0 or y.std() == 0:
                    assert key not in got
                    continue
                r = np.corrcoef(x, y)[0, 1]
                n_got, r_got = got[key]
                assert n_got == len(x), key
                assert abs(r_got - r) < 1e-4, key
                assert -1.0 <= r_got <= 1.0


def test_theil_sen_matches_python_median_of_slopes(spark, sf_dir):
    """Theil–Sen recomputed in plain Python over the zero-filled daily
    spine: same micro-quantized pairwise slopes, same doubled medians,
    same residual intercept — every output integer must match."""
    import math
    from collections import Counter
    from datetime import timedelta

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.events import (
        THEIL_SCALE, ev_trend_theil_sen,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r for r in
           ev_trend_theil_sen(spark, sf_dir).collect()}

    rows = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type").collect()
    counts = Counter((r.day, r.event_type) for r in rows)
    d0, d1 = min(r.day for r in rows), max(r.day for r in rows)
    days = [d0 + timedelta(days=k) for k in range((d1 - d0).days + 1)]
    types = {r.event_type for r in rows}

    def med2(vals):
        s = sorted(vals)
        n = len(s)
        return (s[(n - 1) // 2] + s[n // 2])

    for t in types:
        series = [counts.get((d, t), 0) for d in days]
        slopes = [
            math.floor((series[j] - series[i]) * THEIL_SCALE / (j - i))
            for i in range(len(series)) for j in range(i + 1, len(series))
        ]
        slope2 = med2(slopes)
        resid = [2 * THEIL_SCALE * n - slope2 * i
                 for i, n in enumerate(series)]
        r = got[t]
        assert (r.n_days, r.n_pairs) == (len(series), len(slopes)), t
        assert r.slope2 == slope2, t
        assert r.icept4 == med2(resid), t
        assert r.slope == slope2 / (2 * THEIL_SCALE)
        assert r.intercept == med2(resid) / (4 * THEIL_SCALE)


def test_seasonal_decompose_matches_python(spark, sf_dir):
    """The STL-lite decomposition recomputed in plain Python over the
    zero-filled spine: exact trend7 window sums (interior only), exact
    (seas_sum, seas_cnt) weekly profile, and additivity — the three
    floored components must reassemble n within the 4-decimal grid."""
    from collections import Counter
    from datetime import timedelta

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.events import (
        ev_seasonal_decompose,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.event_type, r.day): r
           for r in ev_seasonal_decompose(spark, sf_dir).collect()}

    rows = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type").collect()
    counts = Counter((r.day, r.event_type) for r in rows)
    d0, d1 = min(r.day for r in rows), max(r.day for r in rows)
    days = [d0 + timedelta(days=k) for k in range((d1 - d0).days + 1)]
    types = {r.event_type for r in rows}
    assert set(got) == {(t, d) for t in types for d in days}

    for t in types:
        series = [counts.get((d, t), 0) for d in days]
        trend7 = {
            i: sum(series[i - 3:i + 4])
            for i in range(3, len(series) - 3)
        }
        seas = {}
        for i, t7 in trend7.items():
            seas.setdefault(i % 7, []).append(7 * series[i] - t7)
        for i, d in enumerate(days):
            r = got[(t, d)]
            assert r.i7 == i % 7 and r.n == series[i]
            assert r.trend7 == trend7.get(i), (t, d)
            assert (r.seas_sum, r.seas_cnt) == (
                sum(seas[i % 7]), len(seas[i % 7]))
            if r.trend7 is not None:
                # floored components reassemble n within the grid
                assert abs((r.trend + r.seasonal + r.remainder)
                           - series[i]) < 3e-4, (t, d)
        # weekly seasonal effects cancel over the interior
        total = sum(sum(v) for v in seas.values())
        assert abs(total) == abs(sum(
            7 * series[i] - t7 for i, t7 in trend7.items()))


def test_growth_accounting_matches_python(spark, sf_dir):
    """Growth accounting recomputed in plain Python: per-user active-day
    chains classified with the same gap rule, churn attributed to
    last_active + CHURN_GAP — every (day, state) count must match, and
    new + retained + resurrected must reassemble each day's DAU."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.events import (
        CHURN_GAP, ev_growth_accounting,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.day, r.state): r.n_users
           for r in ev_growth_accounting(spark, sf_dir).collect()}

    rows = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")).distinct().collect()
    end_day = max(r.day for r in rows)
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r.day)
    expect: Counter = Counter()
    dau: Counter = Counter()
    for days in by_user.values():
        days.sort()
        for i, d in enumerate(days):
            dau[d] += 1
            if i == 0:
                expect[(d, "new")] += 1
            elif (d - days[i - 1]).days > CHURN_GAP:
                expect[(d, "resurrected")] += 1
            else:
                expect[(d, "retained")] += 1
            nxt = days[i + 1] if i + 1 < len(days) else None
            if ((nxt is None and (end_day - d).days > CHURN_GAP)
                    or (nxt is not None and (nxt - d).days > CHURN_GAP)):
                from datetime import timedelta
                expect[(d + timedelta(days=CHURN_GAP), "churned")] += 1
    assert got == dict(expect)
    for d, n in dau.items():
        assert (got.get((d, "new"), 0) + got.get((d, "retained"), 0)
                + got.get((d, "resurrected"), 0)) == n, d


def test_tost_equivalence_matches_python(spark, sf_dir):
    """TOST recomputed in plain Python from the same milli-quantized
    values: same margin, same one-sided statistics, same decision —
    and the decision must imply |dm| < margin (a sanity property of
    the TOST construction)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.stats import (
        TOST_MARGIN_FRAC, TOST_Z_CRIT, stats_tost_equivalence,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.type_a, r.type_b): r
           for r in stats_tost_equivalence(spark, sf_dir).collect()}

    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(math.floor(r.value * 1000.0))
    types = sorted(by_type)
    assert set(got) == {(a, b) for i, a in enumerate(types)
                        for b in types[i + 1:]}
    for (ta, tb), r in got.items():
        xa, xb = by_type[ta], by_type[tb]
        na, nb = len(xa), len(xb)
        ma, mb = sum(xa) / na, sum(xb) / nb
        se2a = (na * sum(v * v for v in xa) - sum(xa) ** 2) \
            / (na * (na - 1)) / na
        se2b = (nb * sum(v * v for v in xb) - sum(xb) ** 2) \
            / (nb * (nb - 1)) / nb
        se = math.sqrt(se2a + se2b)
        dm, delta = ma - mb, abs(ma) * TOST_MARGIN_FRAC
        tl, tu = (dm + delta) / se, (dm - delta) / se
        assert (r.n_a, r.n_b) == (na, nb)
        assert abs(r.margin - delta) < 1e-5
        assert abs(r.t_lower - tl) < 1e-5 and abs(r.t_upper - tu) < 1e-5
        exp_eq = int(tl > TOST_Z_CRIT and tu < -TOST_Z_CRIT)
        assert r.equivalent == exp_eq, (ta, tb)
        if r.equivalent:
            assert abs(dm) < delta


def test_kendall_tau_daily_matches_python_recompute(spark):
    from data_ingestion_worker_spark.operators.events import (
        ev_kendall_tau_daily,
    )

    rows = ev_kendall_tau_daily(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .selectExpr("CAST(ts AS DATE) AS day", "event_type",
                    "CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT) "
                    "AS cents").toPandas()
    daily = ev.groupby(["event_type", "day"]).agg(
        x=("cents", "size"), y=("cents", "sum")).reset_index()
    assert len(rows) == daily.event_type.nunique()
    for r in rows:
        d = daily[daily.event_type == r.event_type]
        xs, ys = d.x.to_list(), d.y.to_list()
        n = len(xs)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                cx, cy = xs[j] - xs[i], ys[j] - ys[i]
                if cx == 0:
                    tx += 1
                if cy == 0:
                    ty += 1
                if cx * cy > 0:
                    conc += 1
                elif cx * cy < 0 and cx != 0 and cy != 0:
                    disc += 1
        n0 = n * (n - 1) // 2
        tau = (conc - disc) / ((n0 - tx) * (n0 - ty)) ** 0.5
        assert r.n_days == n
        assert (r.concordant, r.discordant) == (conc, disc)
        assert (r.ties_x, r.ties_y) == (tx, ty)
        assert r.tau_b == pytest.approx(tau, abs=2e-6)


def test_rake_phrases_are_stopword_free_and_capped(spark):
    from data_ingestion_worker_spark.functions.text import STOPWORDS
    from data_ingestion_worker_spark.operators.text import (
        RAKE_MAX_PHRASE, RAKE_TOP_K, doc_keyphrase_rake,
    )

    rows = doc_keyphrase_rake(spark, SF_DIR).collect()
    assert 0 < len(rows) <= RAKE_TOP_K
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= RAKE_MAX_PHRASE
        assert len(words) == r.n_words
        assert not set(words) & set(STOPWORDS)
        assert r.n_occurrences >= 1
        # deg >= freq for every word => each word score >= 1e6 => the
        # phrase score is at least n_words microunits-scaled.
        assert r.score_micro >= r.n_words * 1000000


def test_dq_freshness_matches_pandas_recompute(spark):
    from data_ingestion_worker_spark.operators.profiling import (
        dq_freshness_events,
    )

    rows = dq_freshness_events(spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .selectExpr("event_type", "ts", "CAST(ts AS DATE) AS day") \
        .toPandas()
    gmax, gday = ev.ts.max(), ev.day.max()
    assert len(rows) == ev.event_type.nunique()
    assert min(r.last_seen_lag_s for r in rows) == 0
    for r in rows:
        sub = ev[ev.event_type == r.event_type]
        assert r.n_rows == len(sub)
        lag = int((gmax - sub.ts.max()).total_seconds())
        assert abs(r.last_seen_lag_s - lag) <= 1   # whole-second truncation
        n_last = int((sub.day == gday).sum())
        prior = int(((sub.day < gday)
                     & (sub.day >= gday - pd.Timedelta(days=7))).sum())
        assert (r.n_last_day, r.prior7_total) == (n_last, prior)
        if prior > 0:
            assert r.completeness_micro == n_last * 7 * 1000000 // prior
        else:
            assert r.completeness_micro is None


def test_sprt_matches_python_recompute(spark):
    """Cumulative LLR and decisions recomputed with plain Python from
    the raw events; boundary constants re-derived from Wald's formulas."""
    import math

    from data_ingestion_worker_spark.operators.stats import (
        SPRT_A,
        SPRT_B,
        SPRT_C1,
        SPRT_C2,
        SPRT_P0,
        SPRT_P1,
        stats_sprt_sequential,
    )

    assert SPRT_C1 == math.floor(1e6 * math.log(SPRT_P1 / SPRT_P0))
    assert SPRT_C2 == math.floor(
        1e6 * math.log((1 - SPRT_P1) / (1 - SPRT_P0)))
    assert SPRT_A == math.floor(1e6 * math.log(0.95 / 0.05))
    assert SPRT_B == math.floor(1e6 * math.log(0.05 / 0.95))
    assert SPRT_C1 > 0 > SPRT_C2          # purchases push up, rest down

    from pyspark.sql import functions as SF

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select(SF.to_date("ts").alias("day"), "event_type").toPandas()
    daily = {}
    for _, r in ev.iterrows():
        n, k = daily.get(r.day, (0, 0))
        daily[r.day] = (n + 1, k + (1 if r.event_type == "purchase" else 0))

    rows = stats_sprt_sequential(spark, SF_DIR).orderBy("day").collect()
    assert len(rows) == len(daily)
    cum = 0
    for row in rows:
        n, k = daily[row.day]
        llr = k * SPRT_C1 + (n - k) * SPRT_C2
        cum += llr
        assert (row.n_events, row.n_purchases) == (n, k)
        assert row.llr_day_q == llr and row.cum_llr_q == cum
        want = ("accept_h1" if cum >= SPRT_A
                else "accept_h0" if cum <= SPRT_B else "continue")
        assert row.decision == want


def test_anova_f_matches_numpy(spark, sf_dir):
    """One-way ANOVA recomputed with numpy group arithmetic: same F,
    same eta², same degrees of freedom; F must also be non-negative and
    eta² in [0, 1)."""
    import numpy as np

    from data_ingestion_worker_spark.operators.stats import stats_anova_f
    from data_ingestion_worker_spark.tables import load_table

    r = stats_anova_f(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice").collect()
    groups: dict[str, list] = {}
    for row in rows:
        groups.setdefault(row.o_orderpriority, []).append(
            round(row.o_totalprice, 2))
    k, n = len(groups), sum(len(v) for v in groups.values())
    xs = [np.array(v) for v in groups.values()]
    grand = sum(float(x.sum()) for x in xs) / n
    ssb = sum(len(x) * (float(x.mean()) - grand) ** 2 for x in xs)
    ssw = sum(float(((x - x.mean()) ** 2).sum()) for x in xs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.k, r.n, r.df1, r.df2) == (k, n, k - 1, n - k)
    assert abs(r.f_stat - f) < 1e-4
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-6
    assert r.f_stat >= 0 and 0 <= r.eta_sq < 1


def test_corr_matrix_matches_numpy(spark, sf_dir):
    """All six pairwise correlations must agree with np.corrcoef on the
    same decimal-rounded inputs, and the matrix must be symmetric-
    complete (every unordered column pair exactly once)."""
    import numpy as np

    from data_ingestion_worker_spark.operators.stats import (
        _CORR_MATRIX_COLS, stats_corr_matrix,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.col_x, r.col_y): r for r in
           stats_corr_matrix(spark, sf_dir).collect()}
    cols = [c for c, _ in _CORR_MATRIX_COLS]
    assert set(got) == {(a, b) for i, a in enumerate(cols)
                        for b in cols[i + 1:]}
    pdf = load_table(spark, sf_dir, "lineitem").select(*cols).toPandas()
    mat = np.corrcoef(pdf[cols].round(2).to_numpy(), rowvar=False)
    for (cx, cy), r in got.items():
        expect = mat[cols.index(cx), cols.index(cy)]
        assert abs(r.corr - expect) < 1e-9, (cx, cy)
        assert r.n == len(pdf)


def test_char_entropy_matches_python_counter(spark, sf_dir):
    """Per-document entropy recomputed with collections.Counter and
    float math — identical milli-bit readout, and the information-
    theoretic bounds 0 ≤ H ≤ log2(alphabet) hold."""
    import math
    from collections import Counter

    from data_ingestion_worker_spark.operators.text import doc_char_entropy
    from data_ingestion_worker_spark.tables import load_table

    got = {r.doc_id: r for r in doc_char_entropy(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text").collect()
    checked = 0
    for d in docs:
        if not d.text:
            assert d.doc_id not in got
            continue
        c = Counter(d.text)
        n = sum(c.values())
        t_micro = sum(math.floor((v * math.log2(v)) * 1e6)
                      for v in c.values())
        h = math.log2(n) - (t_micro / 1e6) / n
        r = got[d.doc_id]
        assert (r.n_chars, r.alphabet) == (n, len(c))
        assert r.entropy_mbits == math.floor(h * 1000), d.doc_id
        assert 0 <= r.entropy_mbits <= math.ceil(
            math.log2(len(c)) * 1000) if len(c) > 1 else True
        checked += 1
    assert checked == len(got)


def test_conformal_interval_matches_python(spark, sf_dir):
    """Split-conformal recompute in plain Python: same train fit, same
    calibration residual order statistic, same interval — plus the
    conformal guarantee arithmetic: the chosen rank k covers at least
    (1-alpha) of the calibration scores by construction."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.events import (
        CONF_ALPHA_DEN, CONF_ALPHA_NUM, CONF_TRAIN_DEN, CONF_TRAIN_NUM,
        stats_conformal_interval,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r
           for r in stats_conformal_interval(spark, sf_dir).collect()}

    daily_rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.window("ts", "1 day").getField("start").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily_rows:
        series[r.event_type].append((r.day, r.c))
    for et, pts in series.items():
        pts.sort()
        d0 = pts[0][0]
        xs = [((d - d0).days, c) for d, c in pts]
        mx = max(x for x, _ in xs)
        x_split = (mx * CONF_TRAIN_NUM) // CONF_TRAIN_DEN
        tr = [(x, c) for x, c in xs if x <= x_split]
        ca = [(x, c) for x, c in xs if x > x_split]
        n = len(tr)
        sx = sum(x for x, _ in tr); sy = sum(c for _, c in tr)
        sxx = sum(x * x for x, _ in tr)
        sxy = sum(x * c for x, c in tr)
        den = n * sxx - sx * sx
        if den <= 0 or not ca:
            assert et not in got
            continue
        slope = (n * sxy - sx * sy) / den
        intercept = (sy - slope * sx) / n
        resid = sorted((abs(c - (intercept + slope * x)), x)
                       for x, c in ca)
        n_cal = len(ca)
        k = min(((n_cal + 1) * CONF_ALPHA_NUM + CONF_ALPHA_DEN - 1)
                // CONF_ALPHA_DEN, n_cal)
        q = resid[k - 1][0]
        fc = intercept + slope * (mx + 1)
        r = got[et]
        assert (r.n_train, r.n_cal) == (n, n_cal)
        assert abs(r.q_hat - round(q, 4)) < 1e-9
        assert abs(r.lo_next - round(fc - q, 4)) < 1e-9
        assert abs(r.hi_next - round(fc + q, 4)) < 1e-9
        assert r.lo_next < r.hi_next
        # coverage by construction: k of n_cal scores are <= q_hat
        covered = sum(1 for a, _ in resid if a <= q)
        assert covered >= k
        assert k * CONF_ALPHA_DEN >= n_cal * CONF_ALPHA_NUM  # k/n >= 1-α


def test_bh_fdr_matches_python_stepup(spark, sf_dir):
    """BH recomputed in plain Python with statistics.NormalDist as the
    INDEPENDENT normal CDF (the operator uses the A&S polynomial):
    p-values agree within the polynomial's published 7.5e-8 bound, and
    the step-up decision set is identical.  Also pins monotonicity:
    rejected pairs are exactly ranks 1..i*."""
    import math
    from statistics import NormalDist

    from data_ingestion_worker_spark.operators.stats import (
        BH_ALPHA_MICRO, stats_bh_fdr,
    )

    rows = sorted(stats_bh_fdr(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert rows
    m = rows[0].m
    assert m == len(rows)
    nd = NormalDist()
    i_star = 0
    for r in rows:
        p_exact = 2.0 * (1.0 - nd.cdf(abs(r.z)))
        assert abs(r.p_micro / 1e6 - p_exact) < 2e-7 + 1e-6, r
        if r.p_micro * m <= r.rank * BH_ALPHA_MICRO:
            i_star = max(i_star, r.rank)
    for r in rows:
        assert r.rejected == (r.rank <= i_star), r
    # p is non-decreasing in rank (the sort the step-up rule needs)
    ps = [r.p_micro for r in rows]
    assert ps == sorted(ps)


def test_fft_periodogram_matches_numpy_and_finds_injected_period(spark):
    """Spectrum recomputed with numpy's own cos/sin at full precision
    (independent of the micro literals): powers agree to the literal
    quantization, and on a synthetic series with a planted period-7
    cycle the operator must crown p=7."""
    import numpy as np

    from data_ingestion_worker_spark.operators.events import (
        FFT_PERIODS, _angle_literals,
    )

    # recompute helper mirroring the operator's exact integer algebra
    ang = {(p, k): (c, s) for p, k, c, s in _angle_literals()}

    def spectrum(counts):
        n = len(counts)
        sct = sum(counts)
        out = {}
        for p in FFT_PERIODS:
            sc = sum((n * c - sct) * ang[(p, x % p)][0]
                     for x, c in enumerate(counts))
            ss = sum((n * c - sct) * ang[(p, x % p)][1]
                     for x, c in enumerate(counts))
            out[p] = round((float(sc) ** 2 + float(ss) ** 2) / 1e18, 6)
        return out

    # planted weekly cycle + trendless noise-free base
    counts = [100 + (30 if x % 7 == 0 else 0) for x in range(70)]
    spec = spectrum(counts)
    assert max(spec, key=spec.get) == 7, spec

    # numpy cross-check (full-precision trig): the micro literals scale
    # sc/ss by 1e6, so spec[p] = (sc²+ss²)·1e12/1e18 = full_power/1e6.
    xs = np.arange(70)
    r = np.array([70 * c - sum(counts) for c in counts], dtype=float)
    for p in (7, 5):
        sc = float((r * np.cos(2 * np.pi * (xs % p) / p)).sum())
        ss = float((r * np.sin(2 * np.pi * (xs % p) / p)).sum())
        full = (sc * sc + ss * ss) / 1e6
        assert abs(spec[p] - full) <= max(1e-4 * full, 1e-2), (p, spec[p],
                                                               full)


def test_binseg_matches_python_argmax_and_finds_planted_shift(spark, sf_dir):
    """Split location recomputed with a plain Python argmax over the
    same daily series; and on a synthetic series with a planted level
    shift the standardized contrast must pick the true split."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.events import (
        ev_binseg_changepoint,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.event_type: r
           for r in ev_binseg_changepoint(spark, sf_dir).collect()}
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.window("ts", "1 day").getField("start").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.event_type].append((r.day, r.c))

    def argmax_split(counts):
        n = len(counts)
        sn = sum(counts)
        st = 0
        best = (-1.0, None)
        for t in range(1, n):
            st += counts[t - 1]
            num = t * sn - n * st
            g2 = (float(num) * float(num)) / float(t * (n - t))
            if g2 > best[0]:
                best = (g2, t)
        return best[1], best[0]

    for et, pts in series.items():
        pts.sort()
        counts = [c for _, c in pts]
        t_star, g2 = argmax_split(counts)
        r = got[et]
        assert r.split_t == t_star, et
        assert r.day == pts[t_star - 1][0]
        assert abs(r.contrast_per_n - round(g2 ** 0.5 / len(counts), 6)) \
            < 1e-9

    # planted shift: 30 days at 100, then 30 days at 160
    counts = [100] * 30 + [160] * 30
    t_star, _ = argmax_split(counts)
    assert t_star == 30


def test_kn_xent_matches_python_model(spark, sf_dir):
    """The KN model recomputed in plain Python (counts, continuation
    counts, the d=3/4 rational, per-term quantization) — identical
    per-doc sums; every smoothed probability must lie in (0, 1]."""
    import math
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.operators.text import doc_lm_xent_kn
    from data_ingestion_worker_spark.tables import load_table

    got = {r.doc_id: r for r in doc_lm_xent_kn(spark, sf_dir).collect()}

    # same tokenization as the operator (trim/lower/whitespace split)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("CASE WHEN length(trim(lower(text))) = 0 "
                         "THEN array() ELSE split(trim(lower(text)), "
                         "'\\\\s+') END").alias("t")).collect()
    bigrams = []
    per_doc = defaultdict(list)
    for d in docs:
        t = list(d.t)
        if len(t) < 2:
            assert d.doc_id not in got
            continue
        bs = list(zip(t[:-1], t[1:]))
        bigrams.extend(bs)
        per_doc[d.doc_id] = bs
    c12 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    n1f = Counter(w1 for w1, _ in c12)
    n1b = Counter(w2 for _, w2 in c12)
    b = len(c12)
    for doc, bs in per_doc.items():
        total = 0
        for w1, w2 in bs:
            num = (4 * c12[(w1, w2)] - 3) * b + 3 * n1f[w1] * n1b[w2]
            den = 4 * c1[w1] * b
            p = num / den
            assert 0.0 < p <= 1.0 + 1e-12, (w1, w2, p)
            total += math.floor(1e4 * (math.log2(float(4 * c1[w1] * b))
                                       - math.log2(float((4 * c12[(w1, w2)]
                                                          - 3) * b)
                                                   + 3.0 * n1f[w1]
                                                   * n1b[w2])))
        r = got[doc]
        assert (r.n_bigrams, r.xent_q) == (len(bs), total), doc
        assert r.mean_xent_q == total // len(bs)


def test_markov_entropy_rate_matches_python(spark, sf_dir):
    """Per-state conditional entropy and the occupancy-weighted rate
    recomputed in plain Python; information bounds hold: 0 ≤ H_i ≤
    log2(#successors), and the rate is inside [min H_i, max H_i]."""
    import math
    from collections import Counter, defaultdict

    from data_ingestion_worker_spark.operators.events import (
        ev_markov_entropy_rate,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.from_type: r
           for r in ev_markov_entropy_rate(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type").collect()
    streams = defaultdict(list)
    for r in ev:
        streams[r.user_id].append((r.ts, r.event_id, r.event_type))
    pairs = Counter()
    for u, rows in streams.items():
        rows.sort()
        for a, b in zip(rows, rows[1:]):
            pairs[(a[2], b[2])] += 1
    n_i = Counter()
    for (f, _), c in pairs.items():
        n_i[f] += c
    h = {}
    for f, nf in n_i.items():
        h[f] = sum(math.floor(c * (math.log2(nf) - math.log2(c))
                              * 1e6 / nf)
                   for (ff, _), c in pairs.items() if ff == f)
    n_tot = sum(n_i.values())
    rate = sum(n_i[f] * h[f] for f in h) // n_tot
    assert set(got) == set(h)
    for f, r in got.items():
        assert (r.n_from, r.h_cond_micro) == (n_i[f], h[f]), f
        assert r.occupancy_ppm == (1000000 * n_i[f]) // n_tot
        assert r.entropy_rate_micro == rate
        succ = sum(1 for (ff, _) in pairs if ff == f)
        assert -len(pairs) <= r.h_cond_micro \
            <= math.ceil(math.log2(succ) * 1e6) + len(pairs)
    assert min(x.h_cond_micro for x in got.values()) - 1 <= rate \
        <= max(x.h_cond_micro for x in got.values()) + 1


def test_bpe_train_matches_pure_python_reference(spark, tmp_path):
    """corpus_bpe_train's merge table must equal a from-scratch Python
    BPE (Sennrich 2016) over the same word-frequency table — pinning
    the pair counting, the (count DESC, left, right) argmax tie-break,
    and the left-to-right non-overlapping merge semantics of the
    literal-replace trick (including the 'a a a' overlap case and the
    back-to-back 'a b a b' case)."""
    from data_ingestion_worker_spark.operators.text import (
        BPE_MERGES,
        corpus_bpe_train,
    )

    texts = [
        "low lower lowest low low",
        "aaa abab lowest newer new",
        "wider new newer aaa abab",
        "abab banana bananas low",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "s", len(t), len(t.split())) for i, t in enumerate(texts)],
        "doc_id long, text string, source string, n_chars long, "
        "n_tokens long",
    ).write.parquet(f"{sf}/documents.parquet")

    # Pure-Python reference BPE.
    from collections import Counter
    freqs = Counter(w for t in texts for w in t.lower().split())
    words = {w: list(w) for w in freqs}
    expect = []
    for step in range(1, BPE_MERGES + 1):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expect.append((step, left, right, left + right, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    got = [(r["step"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
           for r in sorted(corpus_bpe_train(spark, sf).collect())]
    assert got == expect

    # corpus_bpe_encode must price each document with the SAME final
    # word encodings the Python reference reached (the `words` dict
    # after all merges).
    from data_ingestion_worker_spark.operators.text import (
        corpus_bpe_encode,
    )

    enc = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"],
                         r["saved_ppm"])
           for r in corpus_bpe_encode(spark, sf).collect()}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        n_words = len(toks)
        n_bpe = sum(len(words[w]) for w in toks)
        n_chars = sum(len(w) for w in toks)
        saved = (1000000 * (n_chars - n_bpe)) // n_chars
        assert enc[i] == (n_words, n_bpe, n_chars, saved), f"doc {i}"


def test_bpe_select_batch_guards():
    """Adversarial cases for the batched-merge independence proof
    (_bpe_select_batch): every guard exists because skipping it lets a
    batch diverge from the sequential chain on a constructible corpus."""
    from data_ingestion_worker_spark.operators.text import _bpe_select_batch

    def rows(*triples):
        return [{"l": a, "r": b, "cnt": c} for a, b, c in triples]

    # Plain disjoint prefix: all three selected.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 8), ("e", "f", 6)),
        k=8, exhausted=True, known_symbols={"a", "b", "c", "d", "e", "f"})
    assert got == [("a", "b", 10), ("c", "d", 8), ("e", "f", 6)]

    # Shared symbol STOPS selection (never skips): (b,c) shares b.
    # (e,f) below it must NOT be selected even though it is disjoint —
    # sequential might reach a different pair after merging (a,b).
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("b", "c", 8), ("e", "f", 6)),
        k=8, exhausted=True, known_symbols=set("abcef"))
    assert got == [("a", "b", 10)]

    # Boundary-tie trim: (c,d) ties the first conflicting pair (x,a) at
    # cnt 5 — a new pair created by merging (a,b) can also reach 5 and
    # win the (l, r) tie-break sequentially, so (c,d) must be dropped.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 5), ("x", "a", 5)),
        k=8, exhausted=True, known_symbols=set("abcdx"))
    assert got == [("a", "b", 10)]

    # ...but a strictly dominating second pick survives the same layout.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 6), ("x", "a", 5)),
        k=8, exhausted=True, known_symbols=set("abcdx"))
    assert got == [("a", "b", 10), ("c", "d", 6)]

    # Self-pair first: always taken, but caps the batch at one —
    # merging (a,a) can create (aa,aa) out of itself at a count no
    # conflict-rank bound covers.
    got = _bpe_select_batch(
        rows(("a", "a", 10), ("c", "d", 8)),
        k=8, exhausted=True, known_symbols=set("acd"))
    assert got == [("a", "a", 10)]

    # Self-pair later: stops the batch before it.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "c", 8), ("e", "f", 6)),
        k=8, exhausted=True, known_symbols=set("abcef"))
    assert got == [("a", "b", 10)]

    # Merged-name collision with an EXISTING symbol: "ab" is already in
    # the vocabulary, so (a,b)'s pattern would pool counts with it —
    # batch of one.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 8)),
        k=8, exhausted=True, known_symbols={"a", "b", "ab", "c", "d"})
    assert got == [("a", "b", 10)]

    # Merged-name collision between candidates: (a,bc) and (ab,c) both
    # make "abc" — counts of new pairs would pool; stop at the second.
    got = _bpe_select_batch(
        rows(("a", "bc", 10), ("ab", "c", 8), ("x", "y", 6)),
        k=8, exhausted=True, known_symbols={"a", "bc", "ab", "c", "x", "y"})
    assert got == [("a", "bc", 10)]

    # Unscanned tail (exhausted=False): the last ranked cnt bounds the
    # tail, so a selection tying it is trimmed.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 6)),
        k=8, exhausted=False, known_symbols=set("abcd"))
    assert got == [("a", "b", 10)]
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 6)),
        k=8, exhausted=True, known_symbols=set("abcd"))
    assert got == [("a", "b", 10), ("c", "d", 6)]

    # k cap.
    got = _bpe_select_batch(
        rows(("a", "b", 10), ("c", "d", 8), ("e", "f", 6)),
        k=2, exhausted=True, known_symbols=set("abcdef"))
    assert got == [("a", "b", 10), ("c", "d", 8)]


def test_bpe_batched_chain_equals_sequential(spark):
    """The batched merge chain must produce the SAME merge table and
    the SAME final word encodings as the one-merge-per-round chain —
    on corpora engineered to stress tie-breaks, self-pairs and repeated
    substrings (the cases _bpe_select_batch's guards exist for)."""
    import random

    from data_ingestion_worker_spark.operators.text import (
        _bpe_merge_chain_batched,
        _bpe_merge_chain_driver,
        _bpe_merge_chain_sequential,
        _bpe_word_symbols,
    )

    rng = random.Random(8)
    corpora = [
        # Repetition-heavy (self-pairs dominate).
        ["aaaa", "aaab", "abab", "aabb", "bbbb", "baaa"] * 3,
        # Tie-heavy small alphabet.
        [rng.choice(["ab", "ba", "abc", "cab", "bca", "aabc", "cba"])
         for _ in range(40)],
        # English-ish.
        ("low lower lowest newer new wide wider widest "
         "bananas banana band bandana").split() * 2,
    ]
    for words_list in corpora:
        from collections import Counter

        freqs = Counter(words_list)
        wdf = spark.createDataFrame(
            [(w, c) for w, c in freqs.items()], "w string, freq long")
        base = _bpe_word_symbols(wdf)
        f2, m2 = _bpe_merge_chain_sequential(base, n_merges=24)
        e2 = {r["w"]: r["s"] for r in f2.collect()}
        for chain in (_bpe_merge_chain_batched, _bpe_merge_chain_driver):
            f1, m1 = chain(base, 24)
            assert m1 == m2, \
                f"{chain.__name__} diverges on {words_list[:6]}..."
            e1 = {r["w"]: r["s"] for r in f1.collect()}
            assert e1 == e2, chain.__name__


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """ADVICE r8: the unrolled BPE oracles run exactly BPE_MERGES CTE
    steps; on a corpus that exhausts its mergeable pairs early, b{k}
    goes empty and a CROSS JOIN would empty w{k} and every later step
    (encode oracle returns zero rows while Spark keeps its final
    frame).  The w{k} fallback (LEFT JOIN ON TRUE + coalesce) must
    carry the frame, so Spark and DuckDB agree on degenerate corpora
    too — pinned here because the registry corpus never exhausts at 64
    merges."""
    import duckdb

    from data_ingestion_worker_spark.operators.text import (
        BPE_ENCODE_ORACLE,
        BPE_TRAIN_ORACLE,
        corpus_bpe_encode,
        corpus_bpe_train,
    )

    # Two tiny docs: every word fully merges after a handful of steps,
    # far short of BPE_MERGES=64.
    texts = ["aa aa ab", "ab aa b c"]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "s", len(t), len(t.split())) for i, t in enumerate(texts)],
        "doc_id long, text string, source string, n_chars long, "
        "n_tokens long",
    ).write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet/*.parquet'")

    for fn, oracle in ((corpus_bpe_train, BPE_TRAIN_ORACLE),
                       (corpus_bpe_encode, BPE_ENCODE_ORACLE)):
        sdf = fn(spark, sf)
        cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(str(r[c]) for c in cols) for r in sdf.collect())
        res = con.execute(oracle)
        names = [d[0] for d in res.description]
        duck_rows = sorted(
            tuple(str(row[names.index(c)]) for c in cols)
            for row in res.fetchall())
        assert spark_rows, f"{fn.__name__}: Spark side empty"
        assert spark_rows == duck_rows, fn.__name__


# ----------------------------------------------- unigram-LM tokenizer


def _ref_unigram_train(freqs):
    """From-scratch unigram-LM reference (hard-EM, written independently
    of operators/text.py: memo-dict Viterbi with tuple paths instead of
    back-pointer arrays, length-major seed loop).  Returns (final piece
    counts, final costs, per-word (n_pieces, cost))."""
    import math as _m

    Q = 1_000_000

    def lnq(x):
        return _m.floor(_m.log(x) * Q)

    def costs(cnts):
        t = sum(cnts.values())
        return {p: lnq(t) - lnq(c) for p, c in cnts.items()}

    def em(cost):
        use, enc = {}, {}
        for w, f0 in freqs.items():
            best = {0: (0, ())}
            for k in range(1, len(w) + 1):
                opts = []
                for piece_len in range(1, min(4, k) + 1):
                    p = w[k - piece_len:k]
                    if p in cost and (k - piece_len) in best:
                        prev_cost, prev_path = best[k - piece_len]
                        opts.append((prev_cost + cost[p], -piece_len,
                                     prev_path + (p,)))
                if opts:
                    c, _, path = min(opts)
                    best[k] = (c, path)
            c, path = best[len(w)]
            enc[w] = (len(path), c)
            for p in path:
                use[p] = use.get(p, 0) + f0
        return use, enc

    seed = {}
    for piece_len in range(1, 5):
        for w, f0 in freqs.items():
            for i in range(len(w) - piece_len + 1):
                p = w[i:i + piece_len]
                seed[p] = seed.get(p, 0) + f0
    if not seed:
        return {}, {}, {}
    alphabet = sorted(p for p in seed if len(p) == 1)
    v0 = {p: seed[p] for p in alphabet}
    for p, c in sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))[:96]:
        v0[p] = c
    u1, _ = em(costs(v0))
    v1 = {p: max(u1.get(p, 0), 1) for p in alphabet}
    for p, c in sorted(((p, c) for p, c in u1.items() if len(p) > 1),
                       key=lambda kv: (-kv[1], kv[0]))[:48]:
        v1[p] = c
    u2, _ = em(costs(v1))
    v2 = {p: max(u2.get(p, 0), 1) for p in alphabet}
    for p, c in u2.items():
        if len(p) > 1:
            v2[p] = c
    c2 = costs(v2)
    _, enc = em(c2)
    return v2, c2, enc


def test_unigram_viterbi_tiebreak():
    """At equal path cost the LONGEST piece ending at the position must
    win (the (cost ASC, plen DESC) total order all three
    implementations share)."""
    from data_ingestion_worker_spark.operators.text import (
        _unigram_viterbi_word,
    )

    # 'ab' as one piece costs exactly 'a' + 'b' -> the 2-char piece wins.
    cost = {"a": 5, "b": 7, "ab": 12}
    pieces, total = _unigram_viterbi_word("ab", cost)
    assert pieces == ["ab"] and total == 12
    # Cheaper split beats the longer piece when costs differ.
    cost = {"a": 5, "b": 7, "ab": 13}
    pieces, total = _unigram_viterbi_word("ab", cost)
    assert pieces == ["a", "b"] and total == 12
    # Greedy-longest is NOT optimal: Viterbi must pick a|bc over ab|c.
    cost = {"a": 1, "b": 9, "c": 9, "ab": 2, "bc": 3}
    pieces, total = _unigram_viterbi_word("abc", cost)
    assert pieces == ["a", "bc"] and total == 4


def test_unigram_modes_agree(spark):
    """driver == batched == from-scratch reference on corpora chosen to
    stress ties, repeats and prune boundaries (the r9 verdict ask #3
    parity pin)."""
    import random
    from collections import Counter

    from data_ingestion_worker_spark.operators.text import (
        _unigram_train_batched,
        _unigram_train_local,
    )

    rng = random.Random(10)
    corpora = [
        ["abab", "baba", "aabb", "abba", "bbaa"] * 3,
        ["aaaa", "aa", "a", "aaa"] * 5,
        [rng.choice(["ab", "ba", "abc", "cab", "bca", "aabc", "cba"])
         for _ in range(40)],
        ("low lower lowest newer new wide wider widest "
         "bananas banana band bandana").split() * 2,
    ]
    for words_list in corpora:
        freqs = Counter(words_list)
        ref_vocab, ref_cost, ref_enc = _ref_unigram_train(dict(freqs))
        loc_vocab, loc_cost, loc_enc = _unigram_train_local(
            sorted(freqs.items()))
        assert loc_vocab == ref_vocab, words_list[:4]
        assert loc_cost == ref_cost, words_list[:4]
        assert loc_enc == ref_enc, words_list[:4]
        wdf = spark.createDataFrame(
            sorted(freqs.items()), "w string, freq long")
        bat_vocab, bat_cost, bat_enc_df = _unigram_train_batched(wdf)
        assert bat_vocab == ref_vocab, words_list[:4]
        assert bat_cost == ref_cost, words_list[:4]
        bat_enc = {r["w"]: (int(r["n_pieces"]), int(r["wcost"]))
                   for r in bat_enc_df.collect()}
        assert bat_enc == ref_enc, words_list[:4]


def test_unigram_oracle_degenerate(spark, tmp_path):
    """Spark == DuckDB on degenerate corpora: single-char words, a
    word LONGER than UNIGRAM_MAX_WLEN (must be excluded by the shared
    cap convention on both engines), and repeated-substring words."""
    import duckdb

    from data_ingestion_worker_spark.operators.text import (
        UNIGRAM_ENCODE_ORACLE,
        UNIGRAM_TRAIN_ORACLE,
        corpus_unigram_encode,
        corpus_unigram_train,
    )

    texts = [
        "a b a b aaab",
        "abcdefghijklmnopqrstuvwxyz ab ab b",   # 26-char word: excluded
        "",                                      # empty doc: no tokens
        "aaaaaaaa aaaa aa",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "s", len(t), len(t.split())) for i, t in enumerate(texts)],
        "doc_id long, text string, source string, n_chars long, "
        "n_tokens long",
    ).write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet/*.parquet'")
    for fn, oracle in ((corpus_unigram_train, UNIGRAM_TRAIN_ORACLE),
                       (corpus_unigram_encode, UNIGRAM_ENCODE_ORACLE)):
        sdf = fn(spark, sf)
        cols = sorted(sdf.columns)
        spark_rows = sorted(
            tuple(str(r[c]) for c in cols) for r in sdf.collect())
        res = con.execute(oracle)
        names = [d[0] for d in res.description]
        duck_rows = sorted(
            tuple(str(row[names.index(c)]) for c in cols)
            for row in res.fetchall())
        assert spark_rows, f"{fn.__name__}: Spark side empty"
        assert spark_rows == duck_rows, fn.__name__
    # The 26-char word must not appear in the trained vocabulary's
    # coverage: every piece is <= 4 chars drawn from the CAPPED word
    # table, so 'z' (present only in the excluded word) is absent.
    pieces = {r["piece"] for r in corpus_unigram_train(spark, sf).collect()}
    assert "z" not in pieces and "a" in pieces
