"""Skew mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in ``session.py``) handles most hot keys at
runtime by splitting oversized shuffle partitions.  Salting is the
explicit fallback for the cases AQE cannot fix — a single key too large
for one task even after splitting, skewed ``groupBy`` state, or
stream-stream joins where AQE does not apply.

- ``salted_join(large, small, keys, n)``: the large side gets a
  deterministic salt in [0, n); the small side is replicated n times
  (one copy per salt value); the join key becomes (keys..., salt).  One
  hot key's rows now land in n tasks instead of one.  Replication
  multiplies the small side by n — use for genuinely small build sides
  (which is also when skew hurts most).
- ``salted_count(df, keys, n)``: two-phase aggregation — count per
  (keys, salt), then re-aggregate per keys.  The first phase spreads a
  hot group across n reducers; the second phase sees at most n rows per
  group.  (Spark's partial aggregation already does this for algebraic
  aggregates when inputs are map-side-combinable; the explicit form
  covers high-cardinality-payload aggregations like collect_list.)

Both are pure DataFrame compositions; results are verified equal to the
unsalted plans in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from the full row content.

    xxhash64 over all columns: stable across retries (no rand()), no
    assumption about which columns exist.
    """
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(SALT_COL, F.pmod(h, F.lit(n_salts)).cast("int"))


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """One copy of every row per salt value (small/build side)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )


def salted_join(large: DataFrame, small: DataFrame, keys: list[str],
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: large side salted, small side replicated."""
    lg = with_salt(large, n_salts)
    sm = replicate_salts(small, n_salts)
    return lg.join(sm, [*keys, SALT_COL], how).drop(SALT_COL)


def salted_count(df: DataFrame, keys: list[str],
                 n_salts: int = 8) -> DataFrame:
    """Two-phase grouped count: (keys, salt) partial -> keys final."""
    return (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(*keys)
        .agg(F.sum("__partial").alias("n"))
    )
