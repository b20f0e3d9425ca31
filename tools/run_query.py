"""Run any registry query by name from the command line.

Usage:
    python tools/run_query.py <query> [<query> ...]
        [--sf DIR] [--limit N] [--explain] [--oracle] [--list]

Examples:
    python tools/run_query.py --list
    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_minhash_lsh --sf /root/testdata/sf0.1
    python tools/run_query.py ann_cosine_topk --explain
    python tools/run_query.py doc_quality_score --oracle   # print DuckDB SQL
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_ingestion_worker_spark.registry import all_specs  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="*", help="registry query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="table directory (default: sf0.01)")
    ap.add_argument("--limit", type=int, default=20,
                    help="max rows to show (default 20)")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead")
    ap.add_argument("--oracle", action="store_true",
                    help="print the DuckDB oracle SQL instead of running")
    ap.add_argument("--list", action="store_true", dest="list_all",
                    help="list every registry query and exit")
    args = ap.parse_args()

    specs = all_specs()
    if args.list_all:
        for name in specs:
            print(name)
        return 0
    if not args.queries:
        ap.error("no query names given (try --list)")
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        print(f"unknown queries: {unknown} (try --list)", file=sys.stderr)
        return 2

    if args.oracle:
        for name in args.queries:
            print(f"-- {name}")
            print(specs[name].oracle or "-- (no SQL oracle: rows-only op)")
        return 0

    spark = get_spark("run-query")
    for name in args.queries:
        df = specs[name].fn(spark, args.sf)
        if args.explain:
            print(f"== {name} ==")
            df.explain("formatted")
            continue
        t0 = time.time()
        # limit+1 detects truncation without a second full execution
        # (a separate count() would double the runtime of an expensive
        # query and mistime the reported elapsed seconds).
        rows = df.limit(args.limit + 1).collect()
        elapsed = time.time() - t0
        truncated = len(rows) > args.limit
        rows = rows[:args.limit]
        shown = f"{len(rows)}{'+' if truncated else ''}"
        print(f"== {name}: {shown} rows in {elapsed:.2f}s ==")
        if rows:
            cols = rows[0].__fields__
            print(" | ".join(cols))
            for r in rows:
                print(" | ".join(str(r[c]) for c in cols))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
