"""Documentation counts must match the registry (round-5 verdict ask #3).

README.md and COVERAGE.md both quote the registry size; those numbers
drifted twice when late operators landed after the last manual sync.
Pin them to ``len(all_specs())`` so adding an operator without syncing
the docs fails CI loudly.
"""

from __future__ import annotations

import os
import re

from data_ingestion_worker_spark.registry import all_specs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _counts() -> tuple[int, int]:
    specs = all_specs()
    total = len(specs)
    with_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    return total, with_oracle


def test_readme_matches_registry_count():
    total, with_oracle = _counts()
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"registry\.py\s+(\d+) queries, (\d+) oracle-verified",
                  text)
    assert m, "README.md lost its registry count line"
    assert (int(m.group(1)), int(m.group(2))) == (total, with_oracle), (
        f"README.md says {m.group(1)}/{m.group(2)} but the registry has "
        f"{total}/{with_oracle} — sync README.md:22")
    m2 = re.search(r"`queries\(\)`/`oracle_sql\(\)` \((\d+) pairs\)", text)
    assert m2 and int(m2.group(1)) == with_oracle, (
        f"README.md pair count != {with_oracle} — sync the contract bullet")


def test_coverage_matches_registry_count():
    total, with_oracle = _counts()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"\((\d+) entries,\s*(\d+) with `oracle_sql\(\)`", text)
    assert m, "COVERAGE.md lost its registry count line"
    assert (int(m.group(1)), int(m.group(2))) == (total, with_oracle), (
        f"COVERAGE.md says {m.group(1)}/{m.group(2)} but the registry has "
        f"{total}/{with_oracle} — sync COVERAGE.md:5")
