"""Pinned N-run A/B harness for the streaming lifecycle bench.

The phase-1 jobs/min metric slid 15.32 (r6) -> 12.07 (r7) across two
committed single-shot runs; the r7 verdict asks for the same treatment
the quantile helper got — a pinned N-run spread at fixed
N-jobs/rows/trigger so a future move is attributable to code, not to
the machine (VERDICT.md r7, "Next round" #1).

    python tools/ab_stream.py [runs] [label]

Each run builds a fresh inbox/control-store/checkpoint tempdir (exactly
bench._bench_streaming) inside ONE long-lived SparkSession — the same
execution shape as the committed bench, which also runs streaming after
a warm batch suite.  Prints one JSON line per run plus a summary line
{label, runs, phase1: {best, median, worst}, phase2: {...}} and appends
the summary to AB_STREAM.jsonl for PERF.md to cite.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _bench_streaming  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    label = sys.argv[2] if len(sys.argv) > 2 else "unlabeled"
    spark = get_spark("ab-stream")
    p1, p2 = [], []
    details = []
    for i in range(runs):
        t0 = time.time()
        res = _bench_streaming(spark)
        p1.append(res["jobs_per_min"])
        p2.append(res["review_phase"]["jobs_per_min"])
        row = {
            "run": i + 1,
            "jpm1": res["jobs_per_min"],
            "jpm2": res["review_phase"]["jobs_per_min"],
            "stage1": res["stage_sec"],
            "stage2": res["review_phase"]["stage_sec"],
            "wall": round(time.time() - t0, 1),
        }
        details.append(row)
        print(json.dumps(row), flush=True)

    def stats(xs: list[float]) -> dict:
        return {
            "best": max(xs),
            "median": round(statistics.median(xs), 2),
            "worst": min(xs),
            "all": xs,
        }

    summary = {
        "label": label,
        "runs": runs,
        "phase1_jpm": stats(p1),
        "phase2_jpm": stats(p2),
        # Median per-stage splits (BOTH phases) so a spread is
        # attributable — r8's committed detail showed review-phase route
        # at 12.6 s of 31.2 s with no phase-2 medians on record to
        # adjudicate it (r8 verdict ask #2).
        "phase1_stage_median": {
            k: round(statistics.median(d["stage1"].get(k, 0.0)
                                       for d in details), 2)
            for k in sorted({k for d in details for k in d["stage1"]})
        },
        "phase2_stage_median": {
            k: round(statistics.median(d["stage2"].get(k, 0.0)
                                       for d in details), 2)
            for k in sorted({k for d in details for k in d["stage2"]})
        },
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(REPO, "AB_STREAM.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
