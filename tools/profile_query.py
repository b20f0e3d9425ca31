"""Per-query optimization profiler (round-10 measurement workhorse).

Times registry queries through the noop sink (guide §1.4: full
execution of every column, no driver collect) best-of-N, labels each
job (guide §1.5), and optionally dumps ``explain("formatted")`` to
``plans/<round>/<query>_<tag>.txt`` (``--plans-dir``, default the
current optimization round) so plan claims in OPTIMIZATION_*.md are
checkable without running Spark.

Usage:
    python tools/profile_query.py q1_pricing_summary dedup_minhash_lsh
    python tools/profile_query.py --sf /root/testdata/sf0.1 --runs 3 \
        --plan-tag before dedup_substring_spans
    python tools/profile_query.py --top          # the bench HEADLINE set
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_ingestion_worker_spark.registry import all_specs  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-tag", default=None,
                    help="dump explain('formatted') to "
                         "plans/<plans-dir>/<query>_<tag>.txt")
    ap.add_argument("--plans-dir", default="r11",
                    help="subdirectory of plans/ for --plan-tag dumps")
    ap.add_argument("--top", action="store_true",
                    help="profile the full bench HEADLINE list")
    args = ap.parse_args()

    specs = all_specs()
    names = list(args.queries)
    if args.top:
        from bench import HEADLINE
        names = HEADLINE + [n for n in names if n not in HEADLINE]
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("profile-query")
    plans_dir = Path(__file__).resolve().parent.parent / "plans" \
        / args.plans_dir
    out: dict[str, float] = {}
    for name in names:
        if args.plan_tag:
            df = specs[name].fn(spark, args.sf)
            plans_dir.mkdir(parents=True, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.plan_tag}.txt").write_text(plan)
        runs = []
        if args.runs <= 0:
            continue
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(min(runs), 3)
        print(f"{min(runs):8.3f}  [{', '.join(f'{r:.2f}' for r in runs)}]  "
              f"{name}", flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
