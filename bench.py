"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is forced through the noop sink (full execution, no
driver-side collect overhead).  The mix covers every engine subsystem:
scan-agg (q1/q6), multiway joins (q3/q5/q10), the flagship validation
pipeline, window/sessionization, dedup (minhash), similarity (cosine
top-k), text scoring, sketches (KMV), and funnel analytics.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_worker_spark.registry import all_specs  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402
from data_ingestion_worker_spark.tables import TABLE_NAMES, load_table  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_volume_customer",
    "contacts_validation",
    "win_topn_per_group",
    "ev_sessionize",
    "asof_join_purchase",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "doc_quality_score",
    "sketch_kmv_distinct",
    "ev_funnel_stages",
    "profile_columns",
    "doc_salient_terms",
    "dedup_fuzzy_names",
    "graph_pagerank",
    "pack_sequences",
    # Round-5 additions: the real media codecs (decode is the measured
    # cost) and the two most production-representative shapes — the
    # incremental new-batch-vs-corpus dedup and the composed
    # filter->dedup->split curation funnel (one Catalyst plan).
    "mm_roundtrip_wav",
    "mm_roundtrip_avi",
    "dedup_incremental",
    "pipeline_curation_e2e",
    # The engine's heaviest analytic: oriented-wedge triangle counting
    # on the part co-order graph (~1.9M triangles at sf0.1) — wedge
    # enumeration is the measured cost, all of it joins + counts.
    "graph_triangle_count",
    # Round-5 (cont.) additions: the Arrow-batch linear-algebra seam
    # (exact d×d Gram via numpy partial sums), the lossless ssjoin
    # prefix filter (candidate pruning + verification joins), and the
    # CC + keep-longest dedup endgame (iterative label propagation).
    "emb_gram_matrix",
    "dedup_jaccard_prefix_filter",
    "dedup_cluster_representative",
    # Round-5 (cont. 4) additions: the PQ index build + ADC search path
    # (codebook training is the measured cost; search itself is a
    # broadcast-LUT join over the codes table), the shingle-attribution
    # novelty scorer (the corpus-growth shuffle shape), and the
    # dedup-vs-quality audit (LSH + connected components + quality
    # formula composed into one diagnostic).
    "ann_pq_adc_topk",
    "doc_ngram_novelty",
    "corpus_dup_quality_profile",
    # Round-5 (cont. 5) additions: bounded k-core peeling (three
    # degree-shuffle + endpoint-semi-join rounds — the graph curation
    # filter) and the sliding 3-hour distinct-users HLL merge (register
    # fan-out replaces windowed COUNT(DISTINCT) re-scans; the exact
    # yardstick half dominates the measured cost by design).
    "graph_k_core",
    "ev_sliding_uniques_hll",
    # Round-5 (cont. 6) additions: the incremental SCD2 maintenance path
    # (change compression seeded by the open intervals + history
    # close-out) — the per-batch history-table merge a production
    # deployment runs instead of full rebuilds — and the ABC Pareto
    # classification (two-phase range-partitioned global cumsum, the
    # no-SinglePartition global-ranking pattern).
    "scd2_incremental_merge",
    "abc_revenue_classes",
    # Round-5 (cont. 7) additions: the B×-fan-out Poisson bootstrap
    # (md5 draw per (row, replicate) — the uncertainty-readout cost
    # model) and the kNN label probe (broadcast query block × corpus
    # scan + vote, the standard embedding-quality eval).
    "stats_bootstrap_means",
    "emb_knn_label_vote",
    # ...plus the three promoted into the graded 50: the PSI drift
    # monitor (broadcast decile cuts + 10-row compare), the bigram-LM
    # cross-entropy quality proxy (the corpus-model build dominates),
    # and perceptual-hash image dedup through the real decode path.
    "stats_psi_drift",
    "doc_lm_xent_proxy",
    "mm_image_ahash_dedup",
    # The v2 funnel (policy + LM-fluency gates on top of e2e) — the
    # heaviest single launchable; e2e stays for the stage-cost delta.
    "pipeline_curation_v2",
    # Round-5 (cont. 8) additions: HITS on the directed purchase graph
    # (two mutual-reinforcement rounds = 4 Pregel half-steps — the
    # second iterative-graph cost model next to PageRank) and RAKE
    # keyphrase extraction (phrase chunking + the vocabulary-bounded
    # word-score join — the array-heavy text shape).
    "graph_hits",
    "doc_keyphrase_rake",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("bench")
    specs = all_specs()
    timings: dict[str, float] = {}
    # Warm-up (not timed): file indexes + parquet footers for every table,
    # and one small query to JIT the scan/agg path.  Query-specific codegen
    # still lands inside each measured run.
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    specs["q6_forecast_revenue"].fn(spark, sf_dir).count()
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        # Best of three executions: the first run of a query pays its own
        # codegen/JIT; the min reflects steady-state throughput.  The
        # recorded [min, max] spread makes machine/JVM noise attributable
        # — a real regression moves the min, noise only widens the band.
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 3,
        "spread": spread,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
