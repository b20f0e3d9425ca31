"""Contract tests for the model-based data-selection operators
(operators/selection.py): each is recomputed independently in
Python/numpy from the raw parquet, so the distributed plan must equal
the textbook formulation — not just its own oracle."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from data_ingestion_worker_spark.operators.selection import (
    DSIR_BUCKETS,
    DSIR_K,
    DSIR_TARGET_LANG,
    NB_REF_SOURCE,
    PPSWOR_K,
    corpus_dsir_resample,
    doc_quality_classifier,
    sample_priority_ppswor,
)

SF_DIR = "/root/testdata/sf0.001"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str) -> list[str]:
    t = text.strip().lower()
    return t.split() if t else []


def _docs(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()


def test_quality_classifier_matches_python_naive_bayes(spark):
    """The per-document LLR equals an independent add-one-smoothed
    multinomial NB computed with plain dicts."""
    docs = _docs(spark)
    cpos: dict[str, int] = {}
    cneg: dict[str, int] = {}
    for _, r in docs.iterrows():
        tgt = cpos if r.source == NB_REF_SOURCE else cneg
        for t in _toks(r.text):
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(cpos) | set(cneg)
    npos, nneg, v = sum(cpos.values()), sum(cneg.values()), len(vocab)

    rows = {r.doc_id: r
            for r in doc_quality_classifier(spark, SF_DIR).collect()}
    checked = 0
    for _, r in docs.iterrows():
        ts = _toks(r.text)
        if not ts:
            assert r.doc_id not in rows   # no tokens -> no score row
            continue
        llr = sum(
            math.floor(10000.0 * (
                math.log2((cpos.get(t, 0) + 1) / (npos + v))
                - math.log2((cneg.get(t, 0) + 1) / (nneg + v))
            ))
            for t in ts
        )
        got = rows[r.doc_id]
        assert got.n_tokens == len(ts)
        assert got.llr_q == llr
        assert got.pred_ref == (llr > 0)
        checked += 1
    assert checked > 100
    # the classifier must actually separate: reference docs should skew
    # positive relative to the rest (sanity that training happened).
    ref_ids = set(docs[docs.source == NB_REF_SOURCE].doc_id)
    ref_scores = [r.llr_q for i, r in rows.items() if i in ref_ids]
    other = [r.llr_q for i, r in rows.items() if i not in ref_ids]
    assert np.mean(ref_scores) > np.mean(other)


def test_dsir_matches_python_importance_resample(spark):
    """Hashed-bigram importance weights + Gumbel top-k, recomputed with
    dicts and math.log — the selected set and every quantized column
    must match exactly."""
    docs = _docs(spark)
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    doc_feats: dict[int, list[int]] = {}
    for _, r in docs.iterrows():
        ts = _toks(r.text)
        if len(ts) < 2:
            continue
        bs = [_h64(f"{a} {b}") % DSIR_BUCKETS for a, b in zip(ts, ts[1:])]
        doc_feats[r.doc_id] = bs
        is_t = r.lang == DSIR_TARGET_LANG
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())

    lang_of = dict(zip(docs.doc_id, docs.lang))
    expect = []
    for doc_id, bs in doc_feats.items():
        logw = sum(
            math.floor(10000.0 * (
                math.log2((ct.get(b, 0) + 1) / (nt + DSIR_BUCKETS))
                - math.log2((cr.get(b, 0) + 1) / (nr + DSIR_BUCKETS))
            ))
            for b in bs
        )
        h = _h64(f"dsir:{doc_id}")
        u = (h + 1) / float(1 << 60)
        key = math.floor(
            (logw / 10000.0 * 0.6931471805599453 - math.log(-math.log(u)))
            * 10000.0)
        expect.append((doc_id, lang_of[doc_id], logw, key))
    expect.sort(key=lambda t: (-t[3], t[0]))
    expect = expect[:DSIR_K]

    got = [(r.doc_id, r.lang, r.logw_q, r.key_q)
           for r in corpus_dsir_resample(spark, SF_DIR).collect()]
    assert got == expect
    # resampling toward the target domain: the selected set should be
    # enriched in the target language vs the corpus base rate.
    base = (docs.lang == DSIR_TARGET_LANG).mean()
    sel = np.mean([lg == DSIR_TARGET_LANG for _, lg, _, _ in got])
    assert sel > base


def test_ppswor_matches_python_priority_sample(spark):
    """Log-priorities, the top-k set, and the (k+1)-threshold estimator
    all equal a numpy recompute of Duffield–Lund–Thorup."""
    docs = _docs(spark)
    pri = []
    for _, r in docs.iterrows():
        w = max(int(r.n_chars), 1)
        u = (_h64(f"pri:{r.doc_id}") + 1) / float(1 << 60)
        pri.append((r.doc_id, int(r.n_chars), w,
                    math.log(w) - math.log(u)))
    pri.sort(key=lambda t: (-t[3], t[0]))
    tau = pri[PPSWOR_K][3]
    expect = [
        (doc_id, n_chars,
         math.floor(lp * 10000.0),
         math.floor(max(math.log(w), tau) * 10000.0))
        for doc_id, n_chars, w, lp in pri[:PPSWOR_K]
    ]

    got = [(r.doc_id, r.n_chars, r.lpri_q, r.est_lnw_q)
           for r in sample_priority_ppswor(spark, SF_DIR).collect()]
    assert sorted(got) == sorted(expect)
    # the estimator threshold must never lower a selected item below
    # its own weight (max(w, tau) >= w).
    for (_, n_chars, _, est) in got:
        assert est >= math.floor(
            math.log(max(n_chars, 1)) * 10000.0)


def test_ppswor_weight_bias(spark):
    """Long documents must be overrepresented: the mean n_chars of the
    sample should exceed the corpus mean (weight-proportional draw)."""
    docs = _docs(spark)
    got = sample_priority_ppswor(spark, SF_DIR).toPandas()
    assert got.n_chars.mean() > docs.n_chars.mean()


def test_calibration_matches_python_and_is_informative(spark):
    """Bucket counts recomputed with numpy quantiles (linear
    interpolation — Spark percentile semantics); the top decile must be
    purer in reference docs than the bottom decile."""
    from data_ingestion_worker_spark.operators.selection import (
        corpus_quality_calibration,
    )

    docs = _docs(spark)
    batch = {r.doc_id: r.llr_q
             for r in doc_quality_classifier(spark, SF_DIR).collect()}
    ref = {r.doc_id: r.source == NB_REF_SOURCE
           for _, r in docs.iterrows()}
    scores = np.array([batch[d] for d in batch])
    cuts = [np.quantile(scores, k / 10, method="linear")
            for k in range(1, 10)]
    expect: dict[int, list[int]] = {}
    for d, s in batch.items():
        b = 1 + sum(s > c for c in cuts)
        n, r = expect.get(b, [0, 0])
        expect[b] = [n + 1, r + (1 if ref[d] else 0)]

    got = {r.bucket: r for r in
           corpus_quality_calibration(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for b, (n, r) in expect.items():
        assert got[b].n_docs == n
        assert got[b].n_ref == r
        assert got[b].ref_rate_ppm == r * 1000000 // n
    assert (got[10].ref_rate_ppm > got[1].ref_rate_ppm)


def test_winsorized_mean_matches_numpy(spark):
    """Per-type winsorized mean recomputed with numpy quantiles and
    clipping; must also sit inside [min, max] of the raw values and
    differ from the raw mean for at least one fat-tailed type."""
    from data_ingestion_worker_spark.operators.events import (
        ev_winsorized_mean,
    )
    import math

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_type", "value").toPandas()
    got = {r.event_type: r
           for r in ev_winsorized_mean(spark, SF_DIR).collect()}
    for etype, grp in ev.groupby("event_type"):
        cents = np.array([
            int(round(v * 100)) for v in grp.value.values])
        lo = np.quantile(cents, 0.05, method="linear")
        hi = np.quantile(cents, 0.95, method="linear")
        wq = np.floor(np.clip(cents.astype(float), lo, hi)).astype(int)
        r = got[etype]
        assert r.n == len(cents)
        assert r.win_sum == wq.sum()
        assert r.win_mean_milli == (int(wq.sum()) * 1000) // len(cents)
        assert math.floor(cents.min()) * 1000 <= r.win_mean_milli \
            <= math.ceil(cents.max()) * 1000


def test_jl_distance_preserve_matches_numpy(spark, sf_dir):
    """JL audit recomputed with numpy: same ±1 plane matrix (from the
    same md5 coin), same integer distances, same milli ratio — and the
    JL lemma must actually hold on the sample (mean ratio within
    ±4·sqrt(2/k) of 1, each pair within a wide sanity band)."""
    import hashlib

    import numpy as np

    from data_ingestion_worker_spark.operators.similarity import (
        JL_PAIR_STEP, K_JL, QUANT, emb_rp_distance_preserve,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = emb_rp_distance_preserve(spark, sf_dir).collect()
    assert rows

    vecs = {
        r.vec_id: np.array([round(float(x) * QUANT) for x in r.embedding],
                           dtype=np.int64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
        if r.vec_id % JL_PAIR_STEP in (0, 1)
    }
    dim = len(next(iter(vecs.values())))
    signs = np.array([
        [1 if int(hashlib.md5(f"jl:{p}:{d}".encode()).hexdigest()[:15],
                  16) % 2 == 0 else -1
         for d in range(dim)]
        for p in range(K_JL)
    ], dtype=np.int64)
    ratios = []
    for r in rows:
        va, vb = vecs[r.a_id], vecs[r.b_id]
        assert r.b_id == r.a_id + 1
        orig = int(((va - vb) ** 2).sum())
        proj = int(((signs @ va - signs @ vb) ** 2).sum())
        assert (r.orig_d2, r.proj_d2) == (orig, proj)
        assert r.ratio_milli == (1000 * proj) // (K_JL * orig)
        ratios.append(r.ratio_milli / 1000.0)
        assert 0.05 < ratios[-1] < 5.0, r.a_id
    mean = sum(ratios) / len(ratios)
    band = 4.0 * (2.0 / K_JL) ** 0.5 / len(ratios) ** 0.5
    assert abs(mean - 1.0) < max(band, 0.25), mean


def test_target_encode_oof_matches_pandas_and_is_leakage_free(spark, sf_dir):
    """Encoding recomputed independently from raw rows (dict sums):
    the recompute derives each fold's encoding from OUT-fold sums only,
    so agreement pins the leakage-free property — a fold's own rows
    never contribute to the mean it receives."""
    import hashlib
    import math

    from data_ingestion_worker_spark.operators.selection import (
        TE_FOLDS, _TE_SALT, feat_target_encode_oof,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {(r.category, r.fold): r
           for r in feat_target_encode_oof(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value").collect()

    cells: dict[tuple, list] = {}
    for r in ev:
        fold = int(hashlib.md5(
            f"{_TE_SALT}{r.event_id}".encode()).hexdigest()[:15],
            16) % TE_FOLDS
        cells.setdefault((r.event_type, fold), []).append(
            math.floor(r.value * 1000))
    assert set(got) == set(cells)
    cat_tot: dict[str, tuple] = {}
    for (c, f), vs in cells.items():
        n, s = cat_tot.get(c, (0, 0))
        cat_tot[c] = (n + len(vs), s + sum(vs))
    g_n = sum(n for n, _ in cat_tot.values())
    g_s = sum(s for _, s in cat_tot.values())
    for (c, f), vs in cells.items():
        r = got[(c, f)]
        n_out = cat_tot[c][0] - len(vs)
        s_out = cat_tot[c][1] - sum(vs)
        assert r.n_infold == len(vs) and r.n_outfold == n_out
        if n_out > 0:
            assert r.oof_mean_milli == s_out // n_out
        else:
            assert r.oof_mean_milli == (g_s - sum(vs)) // (g_n - len(vs))
