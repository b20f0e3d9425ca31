"""Engine-wide physical-plan hygiene.

Every registry query's executed plan is scanned for the shapes that kill
jobs at scale:

- ``BatchEvalPython`` — a row-at-a-time Python UDF (the §2.8 zero-UDF
  constraint; Arrow-batched ``MapInPandas``/``FlatMapGroupsInPandas``
  remain allowed for the multimodal stubs).
- ``CartesianProduct`` — an unbroadcast cross join; at any real scale
  this is a non-terminating job.
- ``BroadcastNestedLoopJoin`` — allowed only where a broadcast cross
  join *is* the algorithm (query-vector × corpus scans, scalar-subquery
  attachment), listed explicitly so a new accidental one fails loudly.
"""

from __future__ import annotations

import pytest

from data_ingestion_worker_spark.registry import all_specs

#: Queries whose algorithm is a deliberate broadcast cross join.
BNLJ_ALLOWED = {
    "ann_cosine_topk",     # K query vectors broadcast against the corpus
    "ann_ivf_recall",      # IVF results × brute-force results comparison
    "q22_idle_rich_customers",  # scalar subquery attached to every row
    "doc_salient_terms",   # one-row N aggregate broadcast cross join
    "doc_unigram_logprob",  # one-row corpus-total broadcast cross join
    "stats_chi2_independence",  # tiny-margin cross to generate the domain
    "token_bigram_pmi",    # one-row corpus-total broadcast cross joins
    "doc_bm25_rank",       # one-row (N, Σdl) corpus-stats broadcast cross
    "stats_welch_ttest",   # |types|-row stats table × itself (pair enum)
    "graph_pagerank",      # one-row |V| aggregate broadcast cross join
}


def test_embedding_cosine_verification_join_not_forced_broadcast(
    spark, sf_dir
):
    """The verification join must not *hint* a broadcast of embeddings.

    With the auto-broadcast threshold off, a hint-free plan degrades to
    a shuffle join; a leftover ``F.broadcast`` hint would still force a
    BroadcastExchange — the driver-memory killer at real corpus size.
    """
    spec = all_specs()["dedup_embedding_cosine"]
    # Build FIRST: operator construction (load_table) re-applies
    # ENGINE_CONF, which would clobber the -1 threshold below.  Physical
    # planning reads SQLConf lazily at executedPlan(), so setting the
    # threshold after construction still governs join selection.
    df = spec.fn(spark, sf_dir)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, (
            "embeddings relation is hint-forced into a broadcast"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_kmv_plan_has_no_rank_window(spark, sf_dir):
    """KMV must stay a two-phase bounded aggregate: a per-source rank
    window would sort every shingle hash of a source in one task."""
    spec = all_specs()["sketch_kmv_distinct"]
    plan = spec.fn(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan, "per-source rank window reintroduced"


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    spec = all_specs()[name]
    plan = spec.fn(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: unbroadcast cross join"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected broadcast nested-loop join"
        )
