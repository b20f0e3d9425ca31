"""Loaders for the driver's parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}``.

The only quirk is ``events.ts``: physically INT64 TIMESTAMP(NANOS,false),
which Spark's parquet reader rejects outright.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as a nanos
LongType; we convert to a microsecond TIMESTAMP_NTZ by integer division
(truncation toward zero for the positive epochs used here) — exactly what
DuckDB does when it reads the same file, so oracle comparisons see
identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing types to match the DuckDB view."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos long -> micros TIMESTAMP_NTZ (truncating, like DuckDB).
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register each table as a temp view so ``spark.sql`` can use it."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
