"""SparkSession factory with scale-oriented defaults.

The reference runs one process / one thread / one row at a time
(reference README.md:223-227).  Here the execution model is Spark's: the
same logical work is declared once and the planner parallelizes it.  The
defaults below are the ones that matter when the same plans run on a
1000-executor cluster over ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- Arrow for any pandas interchange (vectorized, never row-at-a-time).
- Session timezone pinned to UTC so timestamp semantics are deployment
  independent.
- Shuffle partitions default to a small local-friendly number; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as
  long as it is high enough, so production configs should raise
  ``spark.sql.shuffle.partitions`` (or set
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``) to
  ~2-3x total cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

#: Configs applied to every session this package creates. Each is safe on
#: both local[N] and a large cluster.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS) which Spark's
    # vectorized reader rejects; read them as raw nanos longs and convert
    # explicitly (tables.load_events) so the value semantics (truncate to
    # micros, like DuckDB) are pinned down in one place.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Broadcast threshold: dims like region/nation/supplier are tiny even
    # at large SF; 64 MiB keeps dimension joins shuffle-free.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Guide §3.1/§9: let the planner pick shuffled-hash over sort-merge
    # when a side's per-partition build fits memory — skips two sorts on
    # every equi-join of the wedge/posting/ADC family (measured at
    # sf0.1/local[32]: graph_hits 4.1→3.0 s, graph_triangle_count
    # 9.5→8.1 s, ann_pq_adc_topk 4.9→4.4 s; nothing regressed outside
    # noise).  Scale-safe: the planner only picks SHJ under its
    # canBuildLocalHashMap size conditions, and the AQE threshold below
    # bounds the runtime rewrite to ≤128 MiB per-partition maps.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":
        str(128 * 1024 * 1024),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "data-ingestion-worker-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults applied."""
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or cpus)
    )
    # Heap for the single local JVM (driver + all executor threads).
    # Spark's 1g default is the real ceiling on a local[32] box: a long
    # session (the 152-query oracle sweep) accumulates retained state
    # until a genuinely heavy hash join OOMs.  Launch-time only — a
    # no-op when the JVM already exists (e.g. the correctness driver's
    # own session); on a real cluster executor/driver memory comes from
    # the deployment, not this code.
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    )
    spark = builder.getOrCreate()
    configure(spark)
    return spark


def configure(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable defaults to an existing session.

    Used when the session is created by someone else (the correctness
    driver builds its own); every config in ENGINE_CONF is runtime-safe.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static confs on a started session: keep whatever is set.
            pass
    ship_package(spark)


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF stages (mapInPandas etc.) pickle their functions *by
    reference*; workers must be able to ``import data_ingestion_worker_spark``
    even when the driver process was launched from an unrelated cwd.
    Zipping the package once per session and ``addPyFile``-ing it covers
    local and cluster mode alike.
    """
    sc = spark.sparkContext
    marker = "_diw_spark_pkg_shipped"
    if getattr(sc, marker, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, marker, True)
