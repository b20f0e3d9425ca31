"""Multimodal binary ingestion: opaque payloads + typed metadata.

The reference ingests exactly one format (CSV of contacts,
src/services/s3_service.py:37-319).  A training-data pipeline also has to
carry image/audio/video payloads; the Spark-native shape is the
``binaryFile`` source — each file becomes one row of
``(path, modificationTime, length, content: binary)`` — with all
*decoding* deferred to Arrow-batched pandas stages downstream
(operators/multimodal.py), so the scan itself stays JVM-side and
column-prunable (reading only ``path``/``length`` never loads payloads).

Scale notes (100 TB of media):

- One row per file is the right grain for media objects (a 100 KB image
  is one cell); for millions of tiny files, pack them into parquet with a
  ``binary`` column first (``pack_binary`` below) so scans read a few
  large columnar files instead of hammering the object store with
  per-file GETs.
- ``pathGlobFilter`` / ``modifiedAfter`` push file pruning into the file
  index — incremental ingest without listing the world.
- ``spark.sql.files.maxPartitionBytes`` governs how many files land in
  one task; binary rows are large, so the default 128 MB keeps tasks
  balanced without tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Extension -> modality tag (opaque payloads; decode happens downstream).
MODALITIES: dict[str, str] = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "webp": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video",
    "txt": "text", "md": "text", "json": "text",
}


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str | None = None,
                    modified_after: str | None = None) -> DataFrame:
    """S5-analog for media: directory of files -> one row per file.

    Columns: path, modificationTime, length, content (binary), plus the
    derived ``file_name``, ``ext`` and ``modality`` metadata columns.
    """
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", "true"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    df = reader.load(path)
    return attach_metadata(df)


def attach_metadata(df: DataFrame) -> DataFrame:
    """Derive typed metadata (file_name, ext, modality) from the path.

    Pure column expressions — stays inside codegen; selecting only the
    metadata columns prunes ``content`` out of the scan entirely.
    """
    file_name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(file_name, r"\."), -1))
    modality_map = F.create_map(
        *[F.lit(x) for kv in MODALITIES.items() for x in kv]
    )
    return (
        df.withColumn("file_name", file_name)
        .withColumn("ext", ext)
        .withColumn("modality",
                    F.coalesce(modality_map[ext], F.lit("unknown")))
    )


def pack_binary(df: DataFrame, out_path: str,
                partition_cols: list[str] | None = None) -> None:
    """Re-materialize a binaryFile scan as parquet with a binary column.

    The small-files fix: downstream jobs scan a handful of columnar files
    (with min/max stats on the metadata columns) instead of listing and
    GET-ing millions of objects.  Partition by ``modality`` (or a date
    column) so modality-filtered pipelines prune whole directories.
    """
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out_path)


def manifest(df: DataFrame) -> DataFrame:
    """Payload-free manifest view (path/size/modality) of a binary scan.

    Column pruning means this never reads file contents — listing 100 TB
    of media costs only the file index.
    """
    return df.select("path", "file_name", "ext", "modality", "length",
                     "modificationTime")


def write_text_files(rows: list[tuple[str, bytes]], root: str) -> str:
    """Test helper: materialize (relative_path, payload) pairs under root."""
    for rel, payload in rows:
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as f:
            f.write(payload)
    return root


#: One row per tar member: the shard file it came from, the member key
#: (name minus extension — write_tar_shards' ``{key}.{ext}`` layout),
#: the extension, and the raw payload bytes.
TAR_SCHEMA = "shard string, key string, ext string, payload binary"


def _explode_tars(batches):
    """binaryFile rows -> one row per tar member (Arrow-batched).

    Error isolation at two grains (reference T10): a shard whose tar
    header stream is unreadable is dropped whole (poison-archive
    discard), and a TRUNCATED shard yields the members parsed before
    the break — partial archives are the normal failure mode of an
    interrupted backfill, and their intact members are real data.
    """
    import io
    import os
    import tarfile

    import pandas as pd

    for pdf in batches:
        shards: list[str] = []
        keys: list[str] = []
        exts: list[str] = []
        payloads: list[bytes] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = os.path.basename(path)
            try:
                tf = tarfile.open(fileobj=io.BytesIO(bytes(content)))
            except tarfile.TarError:
                continue
            try:
                for info in tf:
                    if not info.isfile():
                        continue
                    member = tf.extractfile(info)
                    if member is None:
                        continue
                    data = member.read()
                    key, dot, ext = info.name.rpartition(".")
                    if not dot:
                        key, ext = info.name, ""
                    shards.append(name)
                    keys.append(key)
                    exts.append(ext)
                    payloads.append(data)
            except (tarfile.TarError, EOFError, OSError):
                pass                      # truncated tail: keep the rest
        yield pd.DataFrame({
            "shard": pd.Series(shards, dtype="object"),
            "key": pd.Series(keys, dtype="object"),
            "ext": pd.Series(exts, dtype="object"),
            "payload": pd.Series(payloads, dtype="object"),
        })


def read_tar_shards(spark: SparkSession, path: str,
                    glob: str = "*.tar") -> DataFrame:
    """WebDataset-style tar-shard SOURCE — the trainer-side twin of
    ``sources.writers.write_tar_shards``: a directory of tar archives
    becomes one row per ``{key}.{ext}`` member.

    ``binaryFile`` scan (one task per shard — exactly the grain the
    sink laid down, so read parallelism equals shard count with zero
    per-sample object-store GETs) exploded through an Arrow-batched
    ``mapInPandas``; downstream filters/projections stay Catalyst-side.
    Round-trip fidelity and corrupt-shard isolation are pinned in
    tests/test_sources.py.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_explode_tars, TAR_SCHEMA)
