"""Contracts for the evaluation-metric operators (modularity, cluster
margins, ARI/purity) — bounds and internal-consistency checks beyond the
oracle row/value parity.
"""

from __future__ import annotations

from data_ingestion_worker_spark.operators.graph import graph_modularity
from data_ingestion_worker_spark.operators.similarity import (
    cluster_kmeans_embeddings,
    emb_cluster_ari,
    emb_cluster_margin,
)

SF_DIR = "/root/testdata/sf0.001"


def test_modularity_contributions_are_bounded(spark):
    rows = graph_modularity(spark, SF_DIR).collect()
    assert rows
    total_q = sum(r.q_contrib for r in rows)
    # Global modularity is bounded by (-0.5, 1); each community's
    # intra-edge count cannot exceed half its degree sum.
    assert -0.5 <= total_q <= 1.0
    for r in rows:
        assert 0 <= r.intra_edges * 2 <= r.degree_sum
        assert r.n_nodes >= 1


def test_cluster_margins_match_assignment_confidence(spark):
    margins = {r.cluster: r for r in emb_cluster_margin(spark, SF_DIR)
               .collect()}
    sizes = {}
    for r in cluster_kmeans_embeddings(spark, SF_DIR).collect():
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    # Same clusters, same sizes as the assignment itself.
    assert {c: m.n_vecs for c, m in margins.items()} == sizes
    for m in margins.values():
        # The argmax margin is non-negative by construction; cosine
        # differences live in [-2, 2].
        assert 0 <= m.min_margin <= m.mean_margin <= 2.0


def test_ari_and_purity_bounds(spark):
    row = emb_cluster_ari(spark, SF_DIR).collect()[0]
    assert row.n_vecs > 0
    assert -1.0 <= row.ari <= 1.0
    # Purity is at least 1/k_labels (majority >= uniform share) and at
    # most 1.
    assert 1.0 / row.n_labels <= row.purity <= 1.0


def test_curation_v2_is_a_strict_subset_of_e2e(spark, sf_dir):
    """v2 adds gates, so every (split, source) doc count must be <= the
    v1 funnel's, totals must shrink, and the output must be non-empty
    (the gates cannot nuke the corpus)."""
    from data_ingestion_worker_spark.operators.quality import (
        pipeline_curation_e2e, pipeline_curation_v2,
    )

    v1 = {(r.split, r.source): (r.n_docs, r.sum_tokens)
          for r in pipeline_curation_e2e(spark, sf_dir).collect()}
    v2 = {(r.split, r.source): (r.n_docs, r.sum_tokens)
          for r in pipeline_curation_v2(spark, sf_dir).collect()}
    assert v2 and set(v2) <= set(v1)
    for k, (n2, t2) in v2.items():
        n1, t1 = v1[k]
        assert n2 <= n1 and t2 <= t1, k
    total1 = sum(n for n, _ in v1.values())
    total2 = sum(n for n, _ in v2.values())
    assert 0 < total2 < total1   # the new gates actually drop something


def test_silhouette_matches_numpy(spark, sf_dir):
    """emb_silhouette_simplified must equal a from-scratch numpy
    centroid-silhouette over the same quantized vectors (sum-vector
    identity, per-row micro floor, truncating integer mean) — pinning
    the n²-scaled distance algebra against the textbook formula."""
    import math

    import numpy as np

    from data_ingestion_worker_spark.operators.similarity import (
        QUANT,
        emb_silhouette_simplified,
    )
    from data_ingestion_worker_spark.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array([[round(float(x) * QUANT) for x in r["embedding"]]
                  for r in rows], dtype=np.int64)
    labels = np.array([r["label"] for r in rows])
    sums = {c: X[labels == c].sum(axis=0) for c in set(labels)}
    ns = {c: int((labels == c).sum()) for c in set(labels)}
    per_label_sum = {c: 0 for c in set(labels)}
    for x, own in zip(X, labels):
        d2 = {}
        for c in sums:
            num = (ns[c] ** 2 * int(x @ x) - 2 * ns[c] * int(x @ sums[c])
                   + int(sums[c] @ sums[c]))
            d2[c] = num / (ns[c] * ns[c])
        a = math.sqrt(d2[own])
        b = math.sqrt(min(v for c, v in d2.items() if c != own))
        m = max(a, b)
        per_label_sum[own] += math.floor((b - a) / m * 1e6) if m > 0 else 0
    got = {r["label"]: r for r in emb_silhouette_simplified(spark, sf_dir)
           .collect()}
    for c in sums:
        assert got[c]["n_vecs"] == ns[c]
        assert got[c]["sil_sum_micro"] == per_label_sum[c], c
        # div truncates toward zero on both engines:
        q = abs(per_label_sum[c]) // ns[c]
        expect_mean = q if per_label_sum[c] >= 0 else -q
        assert got[c]["sil_mean_micro"] == expect_mean, c
