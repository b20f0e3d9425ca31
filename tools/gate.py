"""Machine-checkable release gate: oracle sweep + pytest -> GATE.json.

The two disciplines every round runs by hand — the full-registry DuckDB
oracle sweep (tools/check_oracle.py) and the pytest suite — become one
command whose verdict is a committed artifact (r6 verdict ask #6):

    python tools/gate.py [sf_dir]          # default /root/testdata/sf0.01

Writes GATE.json at the repo root:

    {"git_head": ..., "sf_dir": ..., "sweep": {"total": N, "oracle":
     N, "rows_only": N, "failed": [...]}, "pytest": {"passed": N,
     "failed": N, "skipped": N}, "green": bool, ...}

Exit code 0 iff green (sweep failures == 0 AND pytest failures == 0),
so CI — or the next round's driver — can gate on it directly.  The
sweep runs in-process (same comparator as check_oracle.py); pytest runs
as a subprocess so a crashing test cannot take the gate down with it.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_oracle import canon, duck_connection  # noqa: E402

from data_ingestion_worker_spark.registry import all_specs  # noqa: E402
from data_ingestion_worker_spark.session import get_spark  # noqa: E402


def run_sweep(sf_dir: str) -> dict:
    """Full-registry Spark-vs-DuckDB sweep; same comparison contract as
    the driver's correctness gate (rows, sorted columns, sorted value
    tuples)."""
    specs = all_specs()
    spark = get_spark("gate")
    con = duck_connection(sf_dir)
    failed: list[str] = []
    rows_only = 0
    for name, spec in sorted(specs.items()):
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if spec.oracle is None:
            rows_only += 1
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(dcols) or len(srows) != len(drows) \
                or canon(srows, scols) != canon(drows, dcols):
            print(f"FAIL {name}: mismatch")
            failed.append(name)
    return {
        "total": len(specs),
        "oracle": len(specs) - rows_only,
        "rows_only": rows_only,
        "failed": sorted(failed),
    }


def run_pytest() -> dict:
    """pytest as a subprocess; parse the summary counts."""
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line"],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    tail = proc.stdout.strip().splitlines()[-15:]
    counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    for line in tail:
        for key in counts:
            m = re.search(rf"(\d+) {key[:-1] if key == 'errors' else key}",
                          line)
            if m:
                counts[key] = max(counts[key], int(m.group(1)))
    counts["returncode"] = proc.returncode
    if proc.returncode != 0:
        counts["tail"] = "\n".join(tail)[-2000:]
    return counts


#: What counts as SOURCE for the attestation: a change anywhere else
#: (markdown, committed artifacts, this very GATE.json) cannot alter
#: what the gate measured.
SOURCE_PATHS = ["data_ingestion_worker_spark", "tests", "tools",
                "bench.py", "__spark_entry__.py"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()
    # r7 verdict "What's wrong #3": GATE.json inevitably lands in a
    # LATER (docs-only) commit than the head it ran at, so the head
    # alone is ambiguous.  source_head pins the last commit that touched
    # any source path — it is invariant under docs-only commits, so the
    # attestation identifies its exact code state: a GATE.json is valid
    # for any commit whose own source_head matches.  dirty_source lists
    # uncommitted source changes at gate time (must be empty for a
    # clean attestation).
    source_head = subprocess.run(
        ["git", "log", "-1", "--format=%h", "--", *SOURCE_PATHS],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", *SOURCE_PATHS],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    dirty_source = [line[3:] for line in dirty.splitlines() if line]
    t0 = time.time()
    sweep = run_sweep(sf_dir)
    t_sweep = round(time.time() - t0, 1)
    t1 = time.time()
    pytest_res = run_pytest()
    t_pytest = round(time.time() - t1, 1)
    green = not sweep["failed"] and pytest_res["returncode"] == 0
    gate = {
        "git_head": head,
        "source_head": source_head,
        "dirty_source": dirty_source,
        "sf_dir": sf_dir,
        "sweep": sweep,
        "sweep_sec": t_sweep,
        "pytest": pytest_res,
        "pytest_sec": t_pytest,
        "green": green,
    }
    out = REPO / "GATE.json"
    out.write_text(json.dumps(gate, indent=1) + "\n")
    print(json.dumps(gate, indent=1))
    print(f"\nGATE {'GREEN' if green else 'RED'} -> {out}")
    return 0 if green else 1


if __name__ == "__main__":
    raise SystemExit(main())
