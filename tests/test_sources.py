"""Sources & sinks: binary ingestion, partitioned/bucketed/dynamic writers.

Scale property under test: layout decisions must show up in the physical
plan — partition pruning (PartitionFilters), bucket-join shuffle
elimination (no Exchange), payload pruning (content column absent from
the ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_worker_spark.sources.binary import (
    manifest,
    read_binary_dir,
    write_text_files,
)
from data_ingestion_worker_spark.sources.writers import (
    overwrite_partitions,
    repartition_for_output,
    write_bucketed,
    write_partitioned,
    write_tar_shards,
)

FILES = [
    ("a/img1.jpg", b"\xff\xd8fakejpeg"),
    ("a/img2.PNG", b"\x89PNGfake"),
    ("b/clip.mp3", b"ID3fakemp3"),
    ("b/movie.mp4", b"\x00\x00fakemp4"),
    ("b/notes.txt", b"hello world"),
    ("b/blob.xyz", b"???"),
]


def test_binary_source_metadata(spark, tmp_path):
    root = write_text_files(FILES, str(tmp_path / "media"))
    df = read_binary_dir(spark, root)
    rows = {r["file_name"]: r for r in
            manifest(df).collect()}
    assert rows["img1.jpg"]["modality"] == "image"
    assert rows["img2.PNG"]["modality"] == "image"     # case-folded ext
    assert rows["clip.mp3"]["modality"] == "audio"
    assert rows["movie.mp4"]["modality"] == "video"
    assert rows["notes.txt"]["modality"] == "text"
    assert rows["blob.xyz"]["modality"] == "unknown"
    assert rows["notes.txt"]["length"] == len(b"hello world")


def test_binary_source_payload(spark, tmp_path):
    root = write_text_files(FILES, str(tmp_path / "media2"))
    df = read_binary_dir(spark, root, glob="*.txt")
    got = df.select("file_name", "content").collect()
    assert len(got) == 1
    assert bytes(got[0]["content"]) == b"hello world"


def test_manifest_prunes_content(spark, tmp_path):
    root = write_text_files(FILES, str(tmp_path / "media3"))
    plan = manifest(read_binary_dir(spark, root))._jdf.queryExecution() \
        .executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in read_schema  # payloads never leave the scan


def test_partitioned_write_prunes(spark, tmp_path, sf_dir):
    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan \
        or "o_orderstatus#" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()


def test_dynamic_partition_overwrite(spark, tmp_path, sf_dir):
    out = str(tmp_path / "dyn")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_partitioned(orders, out, ["o_orderstatus"])
    n_f = orders.filter("o_orderstatus = 'F'").count()
    n_all = orders.count()
    # Replace only the 'O' partition with an empty-but-schema'd subset of
    # one row; 'F' and 'P' partitions must survive untouched.
    one_o = orders.filter("o_orderstatus = 'O'").limit(1)
    overwrite_partitions(one_o, out, ["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.filter("o_orderstatus = 'O'").count() == 1
    assert back.filter("o_orderstatus = 'F'").count() == n_f
    assert back.count() < n_all


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb "
              f"LOCATION '{tmp_path / 'warehouse'}'")
    spark.sql("DROP TABLE IF EXISTS bucketdb.b_orders")
    spark.sql("DROP TABLE IF EXISTS bucketdb.b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "bucketdb.b_orders", "o_orderkey", 4,
                   sort_col="o_orderkey")
    write_bucketed(li, "bucketdb.b_lineitem", "l_orderkey", 4,
                   sort_col="l_orderkey")
    bo = spark.table("bucketdb.b_orders")
    bl = spark.table("bucketdb.b_lineitem")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
        "l_orderkey", "o_totalprice"
    )
    # At test size the planner would broadcast (also shuffle-free); force
    # the sort-merge path to show bucket co-location eliminates Exchange.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucket co-location: no shuffle
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_repartition_for_output(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = repartition_for_output(li, target_file_mb=1, approx_row_bytes=200,
                                 row_count=li.count())
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == li.count()


def test_multi_file_scan_parallelizes(spark, sf_dir, tmp_path):
    """The single-task scans at sf0.1 are a fixture artifact (one file,
    one row group — PERF.md 'known local-mode ceilings'), not an engine
    property: the same table written as multiple files scans as multiple
    input partitions, so a real multi-file dataset parallelizes the same
    plans."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    multi = str(tmp_path / "lineitem_multi")
    li.repartition(8).write.parquet(multi)
    scan = spark.read.parquet(multi)
    # >1 scan task: the read splits across files without any help from
    # maxPartitionBytes (each file is its own split at this size).
    assert scan.rdd.getNumPartitions() > 1
    # ...and the parallel scan computes the same aggregate.
    total = scan.agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
    expect = li.agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
    assert total == expect


def test_compact_dir_collapses_small_files(spark, sf_dir, tmp_path):
    """Many tiny appended files collapse to the byte-sized target; rows
    and values survive; the directory swap leaves no temp residue."""
    import glob
    import os

    from data_ingestion_worker_spark.sources.writers import compact_dir

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    path = str(tmp_path / "frag")
    li.repartition(40).write.parquet(path)
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 40
    n_rows = li.count()
    files = compact_dir(spark, path, target_file_mb=256)
    after = glob.glob(os.path.join(path, "*.parquet"))
    assert len(after) == files == 1          # tiny table -> one file
    assert spark.read.parquet(path).count() == n_rows
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".precompact")


def test_compact_dir_recovers_from_crash_leftovers(spark, sf_dir, tmp_path):
    """A crash between the two renames leaves data in .precompact and/or
    a stale .compacting; the next run must restore and proceed, and a
    non-local URI is rejected up front."""
    import os

    import pytest

    from data_ingestion_worker_spark.sources.writers import compact_dir

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity")
    path = str(tmp_path / "frag")
    li.repartition(4).write.parquet(path)
    n_rows = li.count()
    # Simulate the worst crash window: root renamed away, swap not done.
    os.rename(path, path + ".precompact")
    os.makedirs(path + ".compacting")        # stale temp from the crash
    compact_dir(spark, path, target_file_mb=256)
    assert spark.read.parquet(path).count() == n_rows
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".precompact")

    with pytest.raises(ValueError, match="local-filesystem-only"):
        compact_dir(spark, "s3://bucket/table")


def test_ivf_cell_layout_prunes_unprobed_cells(spark, sf_dir, tmp_path):
    """The ANN scale story made concrete: embeddings written partitioned
    by IVF cell; a probe of 2 cells reaches the scan as a
    PartitionFilter, so unprobed cells are never read."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_layout")
    e.withColumn("cell", F.col("label")).write.partitionBy("cell") \
        .parquet(path)
    probed = [1, 3]
    df = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    expect = e.filter(F.col("label").isin(probed)).count()
    assert df.count() == expect


def test_schema_evolution_merge(spark, tmp_path):
    """Long-lived datasets widen: files written before a column existed
    must read as NULL for it, and the union schema must come back when
    asked (mergeSchema) — the parquet half of schema evolution; a table
    format makes it metadata-only."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("v1")) \
        .write.parquet(path)
    spark.range(3, 5).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[0]["v2"] is None        # pre-evolution file -> NULL
    assert rows[4]["v2"] == 1.5
    assert merged.count() == 5


def test_format_roundtrips_preserve_rows(spark, tmp_path):
    from data_ingestion_worker_spark.sources.formats import (
        read_table,
        write_table,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    want = sorted(map(tuple, src.collect()))
    for fmt in ("orc", "json", "csv", "xml"):
        path = str(tmp_path / fmt)
        write_table(src, path, fmt)
        got = read_table(spark, path, fmt, schema=src.schema)
        assert got.schema == src.schema
        assert sorted(map(tuple, got.collect())) == want


def test_row_formats_demand_a_schema(spark, tmp_path):
    import pytest as _pytest

    from data_ingestion_worker_spark.sources.formats import read_table

    with _pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path / "x"), "json")
    with _pytest.raises(ValueError, match="unsupported"):
        read_table(spark, str(tmp_path / "x"), "avro")


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    from data_ingestion_worker_spark.sources.formats import (
        read_table,
        write_table,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_table(src, path, "orc")
    q = (
        read_table(spark, path, "orc")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderpriority" not in read_schema  # pruned


def test_tar_shards_membership_and_payload_roundtrip(spark, tmp_path):
    """Every sample lands in exactly the shard its key hashes to, with
    byte-identical payload and key-sorted member order."""
    import hashlib
    import tarfile

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select(
            F.col("doc_id").cast("string").alias("key"),
            F.encode("text", "utf-8").alias("payload"),
        )
    )
    expected = {r["key"]: bytes(r["payload"]) for r in docs.collect()}
    out = str(tmp_path / "shards")
    n = write_tar_shards(docs, out, n_shards=4, ext="txt")
    assert 1 <= n <= 4
    seen = {}
    for i in range(4):
        p = f"{out}/shard-{i:05d}.tar"
        import os
        if not os.path.exists(p):
            continue
        with tarfile.open(p) as tf:
            names = [m.name for m in tf.getmembers()]
            assert names == sorted(names)          # deterministic order
            for m in tf.getmembers():
                key = m.name[:-len(".txt")]
                # shard == hash64(key) % 4 (md5-prefix integer)
                h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
                assert h % 4 == i
                seen[key] = tf.extractfile(m).read()
    assert seen == expected


def test_tar_shards_are_byte_deterministic(spark, tmp_path):
    import hashlib
    import os

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select(
            F.col("doc_id").cast("string").alias("key"),
            F.encode("text", "utf-8").alias("payload"),
        )
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(docs, a, n_shards=4)
    # Different partitioning on the way in must not change the bytes.
    write_tar_shards(docs.repartition(7), b, n_shards=4)

    def digest(d):
        out = {}
        for name in sorted(os.listdir(d)):
            with open(os.path.join(d, name), "rb") as f:
                out[name] = hashlib.sha256(f.read()).hexdigest()
        return out

    da, db = digest(a), digest(b)
    assert da and da == db
    assert not any(name.endswith(".tmp") for name in da)


def test_zorder_layout_skips_files_on_every_ordered_column(
        spark, tmp_path):
    """A z-ordered layout makes each file a 2-D tile: a range predicate
    on EITHER ordered column intersects only a minority of the parquet
    footers' min/max ranges, while a single-column range layout skips
    only on its own sort column."""
    import glob

    import pyarrow.parquet as pq

    from data_ingestion_worker_spark.sources.writers import write_zordered

    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 2654435761) % 139).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.mode("overwrite").parquet(lpath)

    def intersecting(path: str, col: str, lo: int, hi: int) -> tuple:
        files = sorted(glob.glob(f"{path}/*.parquet"))
        hit = 0
        for f in files:
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.names.index(col)
            md = pf.metadata
            fmin = min(md.row_group(i).column(idx).statistics.min
                       for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(idx).statistics.max
                       for i in range(md.num_row_groups))
            if fmax >= lo and fmin <= hi:
                hit += 1
        return hit, len(files)

    # a ~7%-wide slab on each dimension
    zx, zn = intersecting(zpath, "x", 0, 9)
    zy, _ = intersecting(zpath, "y", 0, 9)
    lx, ln = intersecting(lpath, "x", 0, 9)
    ly, _ = intersecting(lpath, "y", 0, 9)
    assert zx <= zn // 2 and zy <= zn // 2, \
        f"z-order must skip on both dims (x {zx}/{zn}, y {zy}/{zn})"
    assert lx <= 2, "range layout skips on its own sort column"
    assert ly == ln, "range layout cannot skip on the other column"
    # layout changes bytes on disk, never rows
    assert spark.read.parquet(zpath).count() == 20_000
    got = spark.read.parquet(zpath).filter("y BETWEEN 0 AND 9").count()
    want = df.filter("y BETWEEN 0 AND 9").count()
    assert got == want


# ---------------------------------------------------------------- WARC


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    """Write N records (response + metadata types), read through the
    Spark face, and check every field — for both the plain and the
    record-per-gzip-member layouts."""
    from data_ingestion_worker_spark.sources.warc import (
        read_warc,
        write_warc,
    )

    recs = [
        {"rec_type": "response", "target_uri": "http://a.example/1",
         "body": "hello world one"},
        # Content containing blank lines AND the record magic: the
        # parser must honor Content-Length, not split on delimiters.
        {"rec_type": "response", "target_uri": "http://a.example/2",
         "body": "para one\r\n\r\npara two\r\n\r\nWARC/1.0 fake magic"},
        {"rec_type": "metadata", "target_uri": "http://a.example/2",
         "body": "fetch-time: 12ms"},
        {"rec_type": "response", "target_uri": "http://b.example/ü",
         "body": "unicode ü body"},
    ]
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(str(d / "a.warc"), recs[:2])
    write_warc(str(d / "b.warc.gz"), recs[2:])

    rows = read_warc(spark, str(d)).collect()
    assert len(rows) == 4
    by_uri_type = {(r.target_uri, r.rec_type): r for r in rows}
    r2 = by_uri_type[("http://a.example/2", "response")]
    # HTTP envelope stripped; embedded blank lines + magic intact.
    assert r2.body == "para one\r\n\r\npara two\r\n\r\nWARC/1.0 fake magic"
    assert by_uri_type[("http://a.example/2", "metadata")].body \
        == "fetch-time: 12ms"
    assert by_uri_type[("http://b.example/ü", "response")].body \
        == "unicode ü body"
    # content_length covers the HTTP envelope for response records.
    assert r2.content_length > len(r2.body)
    # archives parse independently (one row set per file).
    assert {r.archive.rsplit("/", 1)[-1] for r in rows} \
        == {"a.warc", "b.warc.gz"}


def test_warc_corrupt_record_resync(spark, tmp_path):
    """A truncated/garbled record must not sink the archive: the parser
    resyncs to the next record magic (the S3 poison-object analog)."""
    from data_ingestion_worker_spark.sources.warc import (
        parse_warc,
        write_warc,
    )

    good = {"rec_type": "response", "target_uri": "http://ok.example",
            "body": "survivor"}
    p = tmp_path / "c.warc"
    write_warc(str(p), [good])
    tail = p.read_bytes()
    garbage = b"WARC/1.0\r\nWARC-Type: response\r\nNo-Length: x\r\n\r\n"
    recs = parse_warc(garbage + tail)
    assert [r["target_uri"] for r in recs] == ["http://ok.example"]
    assert recs[0]["body"] == "survivor"


def test_warc_feeds_text_operators(spark, tmp_path):
    """End-to-end: WARC records -> documents-shaped frame -> an
    existing text operator runs on crawl content unchanged."""
    from pyspark.sql import functions as F

    from data_ingestion_worker_spark.functions.text import ws_token_count
    from data_ingestion_worker_spark.sources.warc import (
        read_warc,
        write_warc,
    )

    d = tmp_path / "w"
    d.mkdir()
    write_warc(str(d / "crawl.warc.gz"), [
        {"rec_type": "response", "target_uri": f"http://x.example/{i}",
         "body": f"page {i} body with {i % 3} extra tokens"}
        for i in range(10)
    ])
    docs = (
        read_warc(spark, str(d))
        .filter(F.col("rec_type") == "response")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("body").alias("text"),
        )
    )
    counted = docs.select("doc_id", ws_token_count(F.col("text"))
                          .alias("n")).collect()
    assert len(counted) == 10 and all(r.n >= 6 for r in counted)


def test_tar_shard_roundtrip_and_corrupt_isolation(spark, tmp_path):
    """read_tar_shards must recover exactly what write_tar_shards laid
    down (key and payload), and a corrupted shard file must poison only
    its own members: a garbage-header shard drops whole, a truncated
    shard yields the members before the break."""
    import os

    from data_ingestion_worker_spark.sources.binary import read_tar_shards
    from data_ingestion_worker_spark.sources.writers import write_tar_shards

    rows = [(f"doc{i:03d}", bytes([i]) * (50 + i)) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, payload binary")
    out = str(tmp_path / "shards")
    n = write_tar_shards(df, out, n_shards=4, ext="bin")
    assert n == 4

    got = {r["key"]: (bytes(r["payload"]), r["ext"], r["shard"])
           for r in read_tar_shards(spark, out).collect()}
    assert set(got) == {k for k, _ in rows}
    for k, payload in rows:
        assert got[k][0] == payload
        assert got[k][1] == "bin"
        assert got[k][2].startswith("shard-")

    # Corrupt one shard's header block entirely: its members vanish,
    # every other shard's members survive.
    victim = sorted(os.listdir(out))[0]
    lost = {k for k, (_, _, s) in got.items() if s == victim}
    assert lost
    with open(os.path.join(out, victim), "r+b") as f:
        f.write(b"\xff" * 512)
    after = {r["key"] for r in read_tar_shards(spark, out).collect()}
    assert after == set(got) - lost

    # Truncated shard: members before the cut survive.
    out2 = str(tmp_path / "shards2")
    write_tar_shards(df, out2, n_shards=1, ext="bin")
    shard = os.path.join(out2, sorted(os.listdir(out2))[0])
    size = os.path.getsize(shard)
    with open(shard, "r+b") as f:
        f.truncate(size // 2)
    partial = {r["key"] for r in read_tar_shards(spark, out2).collect()}
    assert partial and partial < {k for k, _ in rows}
