"""Query-spec plumbing shared by every operator module.

A :class:`QuerySpec` pairs a PySpark query function with the ANSI-SQL
string a DuckDB oracle runs on the same tables (SURVEY.md §5 item 1 — the
driver's primary correctness gate).  ``oracle`` is ``None`` only for
operators whose semantics genuinely aren't SQL-expressible (custom
stateful streaming etc.); the driver then records a weaker rows-only
check.

Determinism conventions (so order-insensitive value hashes match):

- Money/measure aggregates are computed in DECIMAL (exact, order
  independent) and CAST to DOUBLE only in the final projection — both
  engines then produce bit-identical floats.
- Floating sums that can't be decimal-ized (e.g. float32 embeddings) are
  either reduced in a *fixed* left-to-right order on both sides or
  quantized to integers first.
- Every computed column is aliased identically in the Spark plan and the
  oracle SQL.
- Timestamps are compared at microsecond grain (DuckDB's native unit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One verifiable operator: Spark implementation + DuckDB oracle."""

    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""
