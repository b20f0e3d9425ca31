"""One-command scale audit: executed-plan red flags for every query.

Prints one line per registry query with the plan features that matter at
100 TB — the same properties `tests/test_plan_hygiene.py` *enforces*,
reported here as a human-readable survey (plus exchange counts, which
the tests deliberately don't pin):

    name  exchanges=N  [BNLJ] [SINGLE_PARTITION] [WINDOW/SP] [PY_UDF] [CARTESIAN]

Usage:
    python tools/scale_audit.py [sf_dir]            # default sf0.001
    python tools/scale_audit.py /root/testdata/sf0.01 dedup_minhash_lsh ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_ingestion_worker_spark.registry import all_specs  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def flags(plan: str) -> list[str]:
    from tests.test_plan_hygiene import (  # reuse the walkers/allowlist
        _has_exact_percentile,
        _sp_feeds_window,
    )

    out = []
    if "BroadcastNestedLoopJoin" in plan:
        out.append("BNLJ")
    if "Exchange SinglePartition" in plan:
        out.append("SINGLE_PARTITION")
    if _sp_feeds_window(plan):
        out.append("WINDOW/SP")
    if "BatchEvalPython" in plan:
        out.append("PY_UDF")
    if "CartesianProduct" in plan:
        out.append("CARTESIAN")
    if _has_exact_percentile(plan):
        # Reviewed allowlist: EXACT_PERCENTILE_ALLOWED in
        # tests/test_plan_hygiene.py (bounded-domain inputs only).
        out.append("EXACT_PERCENTILE")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scale-audit", shuffle_partitions=8)
    flagged = 0
    for name, spec in sorted(all_specs().items()):
        if only and name not in only:
            continue
        try:
            plan = spec.fn(spark, sf_dir)._jdf.queryExecution() \
                .executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {type(e).__name__}: {e}")
            flagged += 1
            continue
        fl = flags(plan)
        n_ex = plan.count("Exchange hashpartitioning") \
            + plan.count("Exchange rangepartitioning") \
            + plan.count("Exchange SinglePartition")
        mark = "  " + " ".join(fl) if fl else ""
        print(f"{name:36s} exchanges={n_ex}{mark}")
        if fl:
            flagged += 1
    print(f"\n{flagged} queries with audit flags "
          "(see tests/test_plan_hygiene.py allowlists for the reviewed ones)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
