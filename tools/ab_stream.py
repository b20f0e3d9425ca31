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

Contention context (round-10, r9 verdict ask #2: the ``r9-final-head``
record's 5.59-36.60 jobs/min phase-1 spread was only explained by
PERF.md prose): every record is now self-describing — the summary
carries the same pinned single-core probe reading and noise index the
committed bench emits (before AND after the block) plus loadavg, and
each per-run row stamps its own loadavg.  The "read the quietest
record's median" policy is adjudicable from the JSONL alone.  Probe
caveat carried from r9: the single-core probe UNDER-reads multi-core
Spark contention — read loadavg alongside it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import PROBE_REF_SEC, _bench_streaming  # noqa: E402
from bench import _calibration_probe  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def _loadavg() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-POSIX
        return None


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    label = sys.argv[2] if len(sys.argv) > 2 else "unlabeled"
    spark = get_spark("ab-stream")
    probe_pre = round(_calibration_probe(), 3)
    p1, p2 = [], []
    details = []
    for i in range(runs):
        t0 = time.time()
        load0 = _loadavg()
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
            "loadavg": load0,
        }
        details.append(row)
        print(json.dumps(row), flush=True)
    probe_post = round(_calibration_probe(), 3)

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
        # Contention stamp (r9 ask #2): same probe/noise-index semantics
        # as bench.py's compact line, measured at block start and end,
        # plus the per-run loadavg extremes (1-min component).
        "probe_sec": [probe_pre, probe_post],
        "host_noise_index": round(
            max(probe_pre, probe_post) / PROBE_REF_SEC, 2),
        "loadavg_start": details[0]["loadavg"] if details else None,
        "loadavg_end": _loadavg(),
        "loadavg1_range": [
            min(d["loadavg"][0] for d in details if d["loadavg"]),
            max(d["loadavg"][0] for d in details if d["loadavg"]),
        ] if any(d["loadavg"] for d in details) else None,
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(REPO, "AB_STREAM.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
