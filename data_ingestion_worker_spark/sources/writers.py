"""Sinks: partitioned, bucketed and idempotent parquet writers.

The reference's only sink is row-at-a-time SQLAlchemy inserts
(src/repositories/contact_repository.py:42-131 — one commit per contact).
The Spark-native sinks below are set-based and layout-aware; layout *is*
the optimizer hook at 100 TB:

- **partitionBy(date/tenant)** -> partition pruning: a filtered read
  touches only matching directories (the Spark upgrade of the reference's
  ``contacts_user_id`` index, SURVEY.md §4).
- **bucketBy(key)** -> co-located joins: two tables bucketed on the same
  key join with ZERO shuffle (SortMergeJoin without Exchange) — the
  standing fix for the staging⋈issue_items⋈contacts join family.
- **dynamic partition overwrite** -> idempotent backfills: re-running a
  day replaces exactly that day's directories, never the whole table.
- **z-order (Morton) clustering** -> multi-column file skipping: range
  predicates on ANY ordered column prune parquet footers, not just the
  one sort column (Delta ``OPTIMIZE ZORDER BY``, re-expressed as a
  bit-interleave + repartitionByRange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Partition-pruned parquet layout (one directory tree per key)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str,
                         partition_cols: list[str]) -> None:
    """Idempotent partition-level replace (dynamic partition overwrite).

    Only the partitions present in ``df`` are replaced; everything else
    is untouched — safe replay for backfills and late data.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)   # None = was unset (static default)
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int,
                   sort_col: str | None = None) -> None:
    """Hash-bucketed managed table (requires a metastore-backed session).

    Joining two tables bucketed on the same column with the same bucket
    count produces a SortMergeJoin with no Exchange on either side — the
    shuffle happens once at write time, then every future join is free.
    Size ``n_buckets`` so one bucket ~ 100-200 MB at the target scale.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table, format="parquet")


def repartition_for_output(df: DataFrame, target_file_mb: int = 256,
                           approx_row_bytes: int = 100,
                           row_count: int | None = None) -> DataFrame:
    """Coalesce to sensible output file counts (the small-files guard).

    A 1000-task job writing 1000 files per partition directory creates
    the metadata problem the scan side then pays for; aim for
    ``target_file_mb``-sized files instead.
    """
    import math
    n = row_count if row_count is not None else df.count()
    files = max(1, math.ceil(n * approx_row_bytes /
                             (target_file_mb * 1024 * 1024)))
    return df.repartition(files)


def write_tar_shards(df: DataFrame, out_dir: str, n_shards: int = 16,
                     key_col: str = "key", payload_col: str = "payload",
                     ext: str = "bin") -> int:
    """WebDataset-style tar-shard sink for multimodal training data.

    The standard layout multimodal trainers stream: N tar archives, each
    holding ``{key}.{ext}`` members, readable sequentially with no
    per-sample object-store GETs.  Spark mapping:

    - shard assignment is ``hash64(key) mod n_shards`` — a function of
      the sample alone, so re-runs and re-partitions land every sample
      in the same shard (the split_train_holdout determinism property);
    - one ``repartition(n_shards, shard)`` co-locates each shard's rows
      (a shard never spans partitions), ``sortWithinPartitions`` fixes
      member order, and each task streams its shards straight to tar —
      payloads are never collected to the driver;
    - archives are byte-deterministic (member order sorted by key,
      zeroed mtime/uid/gid, fixed mode): re-running the sink produces
      identical bytes, so shard-level checksums can gate a backfill.

    Writes to a local/shared filesystem path (one atomic rename per
    shard); an object-store deployment writes to a scratch mount and
    promotes, or swaps in a tar-over-S3A stream.  Returns the number of
    shard files written.

    Sizing: pick ``n_shards`` so one shard ~ 1-10 GB at target scale
    (100 TB of media -> tens of thousands of shards), which also bounds
    the per-task sort.
    """
    import os

    from ..functions.hashing import hash64

    staged = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(payload_col).alias("payload"),
        )
        .withColumn("shard",
                    F.pmod(hash64(F.col("key")), F.lit(n_shards))
                    .cast("int"))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "key")
    )
    os.makedirs(out_dir, exist_ok=True)

    def _write_partition(rows) -> None:
        import io
        import os as _os
        import tarfile

        tf = None
        tmp_path = None
        cur = None
        for r in rows:
            if r["shard"] != cur:
                if tf is not None:
                    tf.close()
                    _os.rename(tmp_path, tmp_path[:-4])
                cur = r["shard"]
                tmp_path = _os.path.join(out_dir,
                                         f"shard-{cur:05d}.tar.tmp")
                tf = tarfile.open(tmp_path, "w")
            data = bytes(r["payload"])
            info = tarfile.TarInfo(name=f"{r['key']}.{ext}")
            info.size = len(data)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(data))
        if tf is not None:
            tf.close()
            _os.rename(tmp_path, tmp_path[:-4])

    staged.foreachPartition(_write_partition)
    return sum(1 for n in os.listdir(out_dir)
               if n.startswith("shard-") and n.endswith(".tar"))


def compact_dir(spark: SparkSession, path: str,
                target_file_mb: int = 256) -> int:
    """Rewrite a parquet directory into ``target_file_mb``-sized files.

    The maintenance half of the small-files story: long-running ingest
    (per-microbatch appends, per-job staging writes) accumulates files
    far smaller than a scan-efficient size; footer/open overhead then
    dominates reads.  Sizing uses the *actual* on-disk bytes, so the
    target holds regardless of schema or compression ratio.

    **Local-filesystem only.** The size probe and the rename swap use
    OS-level APIs; object stores and HDFS need their own atomic-promote
    (on a real deployment this whole function is Delta/Iceberg
    ``OPTIMIZE``).  Non-local URIs are rejected up front rather than
    silently mis-sized.

    **Swap is crash-safe, not atomic.** The rewrite lands in a sibling
    ``.compacting`` dir and swaps in with two renames; between them a
    reader sees a missing directory for an instant, and a crash there
    leaves the data parked in ``.precompact``.  Both leftover dirs are
    detected at entry: a stale ``.precompact`` with no live root is
    restored (crash recovery), and stale temp dirs are cleared so the
    next run cannot trip over them.
    """
    import glob
    import math
    import os
    import shutil

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_dir is local-filesystem-only, got {path!r}; use the "
            "table format's OPTIMIZE for object stores"
        )
    root = path.removeprefix("file://").rstrip("/")
    tmp, old = root + ".compacting", root + ".precompact"
    # Crash recovery / stale-state cleanup from a previous interrupted run.
    if os.path.isdir(old) and not os.path.isdir(root):
        os.rename(old, root)               # crashed between the two renames
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    total = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True)
    )
    files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(root).repartition(files) \
        .write.mode("overwrite").parquet(tmp)
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)
    return files


def zorder_key(cols: list[str], bits: int = 8) -> F.Column:
    """Morton (Z-order) key: interleave the top ``bits`` bits of each
    rank-scaled column.  Expects companion ``_min_<c>`` / ``_max_<c>``
    scalar columns on the row (attached by :func:`write_zordered`)."""
    k = len(cols)
    scaled = []
    for c in cols:
        lo, hi = F.col(f"_min_{c}"), F.col(f"_max_{c}")
        rng = (hi - lo).cast("long")
        v = (F.col(c).cast("long") - lo.cast("long"))
        scaled.append(
            F.when(rng > 0, (v * ((1 << bits) - 1)).cast("long") / rng)
            .otherwise(F.lit(0)).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)),
                            i * k + j)
            )
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int, bits: int = 8) -> None:
    """Z-ordered parquet layout: multi-column data skipping.

    Range-partitioning on ONE column gives perfect file-level min/max
    skipping on that column and none on any other; interleaving the bit
    patterns of k columns (Morton order — Delta's ``OPTIMIZE ZORDER BY``)
    makes each file a k-dimensional tile, so a range predicate on ANY of
    the ordered columns intersects only ~N^((k-1)/k) of N files instead
    of all of them.  This is pure layout: scan-time skipping comes from
    the parquet footer min/max stats every reader already consults.

    Numeric columns only; each is scaled onto ``bits`` bits by its
    global min/max (one scalar aggregate, broadcast back).  Files are
    ranged on the interleaved key and sorted within, keeping per-file
    footer ranges tight on every dimension.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    stats = df.agg(*aggs)
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", zorder_key(cols, bits=bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_min_{c}" for c in cols],
              *[f"_max_{c}" for c in cols])
        .write.mode("overwrite").parquet(path)
    )
