"""Semantic contracts for the data-layout planners (operators/layout.py)
— pinned against a pure-Python recomputation, independent of the DuckDB
oracle parity that test_oracle_parity.py already enforces."""

from __future__ import annotations

import datetime as dt

from data_ingestion_worker_spark.operators.layout import (
    COMPACT_DOCS_PER_FILE,
    COMPACT_TARGET,
    ZORDER_BITS,
    ZORDER_DAY_GRANULE,
    ZORDER_FILES,
    layout_compaction_plan,
    layout_zorder_cluster,
)

SF_DIR = "/root/testdata/sf0.001"


def _morton(cb: int, db: int) -> int:
    z = 0
    for i in range(ZORDER_BITS):
        z |= ((cb >> i) & 1) << (2 * i)
        z |= ((db >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_python_recompute_and_prunes_better(spark):
    rows = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .select("o_custkey", "o_orderdate").collect()
    epoch = dt.date(1992, 1, 1)
    nb = 2 ** ZORDER_BITS
    cells_per_file = (4 ** ZORDER_BITS) // ZORDER_FILES
    date_per_file = nb // ZORDER_FILES
    per_file: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for r in rows:
        cb = r.o_custkey % nb
        od = r.o_orderdate
        if isinstance(od, dt.datetime):
            od = od.date()
        db = ((od - epoch).days // ZORDER_DAY_GRANULE) % nb
        per_file.setdefault(
            ("zorder", _morton(cb, db) // cells_per_file), []
        ).append((cb, db))
        per_file.setdefault(("linear", db // date_per_file), []) \
            .append((cb, db))

    expect: dict[str, dict[str, int]] = {}
    for (layout, _), pts in per_file.items():
        agg = expect.setdefault(layout, {
            "n_files": 0, "n_rows": 0, "sum_span_cb": 0, "sum_span_db": 0,
        })
        agg["n_files"] += 1
        agg["n_rows"] += len(pts)
        agg["sum_span_cb"] += max(p[0] for p in pts) - \
            min(p[0] for p in pts) + 1
        agg["sum_span_db"] += max(p[1] for p in pts) - \
            min(p[1] for p in pts) + 1

    got = {r.layout: r for r in layout_zorder_cluster(spark, SF_DIR).collect()}
    assert set(got) == {"zorder", "linear"}
    for layout, e in expect.items():
        g = got[layout]
        assert g.n_files == e["n_files"]
        assert g.n_rows == e["n_rows"]
        assert g.sum_span_cb == e["sum_span_cb"]
        assert g.sum_span_db == e["sum_span_db"]
        assert g.scan_frac_cb_micro == \
            (e["sum_span_cb"] * 1_000_000) // (e["n_files"] * nb)
        assert g.scan_frac_db_micro == \
            (e["sum_span_db"] * 1_000_000) // (e["n_files"] * nb)

    # The layout argument itself: Z-order must prune the customer
    # dimension far better than the date-only layout, without giving
    # the date dimension entirely back.
    assert got["zorder"].scan_frac_cb_micro < \
        got["linear"].scan_frac_cb_micro // 4
    assert got["zorder"].scan_frac_db_micro < 1_000_000


def test_compaction_plan_is_start_offset_binning(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "source", "n_chars").collect()
    manifest: dict[tuple[str, int], int] = {}
    for r in docs:
        key = (r.source, r.doc_id // COMPACT_DOCS_PER_FILE)
        manifest[key] = manifest.get(key, 0) + r.n_chars
    expect: dict[tuple[str, int], dict[str, int]] = {}
    by_source: dict[str, list[tuple[int, int]]] = {}
    for (src, seq), size in sorted(manifest.items()):
        by_source.setdefault(src, []).append((seq, size))
    for src, files in by_source.items():
        off = 0
        for seq, size in files:           # manifest order == file_seq order
            gid = off // COMPACT_TARGET   # start-offset binning
            agg = expect.setdefault((src, gid), {
                "n_files": 0, "total_bytes": 0,
                "first_file": seq, "last_file": seq,
            })
            agg["n_files"] += 1
            agg["total_bytes"] += size
            agg["first_file"] = min(agg["first_file"], seq)
            agg["last_file"] = max(agg["last_file"], seq)
            off += size

    got = {(r.source, r.group_id): r
           for r in layout_compaction_plan(spark, SF_DIR).collect()}
    assert got.keys() == expect.keys()
    for key, e in expect.items():
        g = got[key]
        assert g.n_files == e["n_files"]
        assert g.total_bytes == e["total_bytes"]
        assert g.first_file == e["first_file"]
        assert g.last_file == e["last_file"]


def test_partition_advisor_matches_pandas_and_orders_sanely(spark, sf_dir):
    """Advisor recomputed with pandas value_counts; and the advice must
    be internally consistent: scan fraction is the value-histogram HHI
    (so 1/n_partitions ≤ scan_frac ≤ max_part share ≤ 1e6)."""
    import math

    from data_ingestion_worker_spark.operators.layout import (
        PARTITION_CANDIDATES, layout_partition_advisor,
    )
    from data_ingestion_worker_spark.tables import load_table

    got = {r.candidate: r
           for r in layout_partition_advisor(spark, sf_dir).collect()}
    assert set(got) == {name for name, _, _ in PARTITION_CANDIDATES}
    pdf = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_orderdate").toPandas()
    series = {
        "o_orderpriority": pdf.o_orderpriority,
        "o_orderstatus": pdf.o_orderstatus,
        "month(o_orderdate)": pdf.o_orderdate.astype(
            "datetime64[ns]").dt.to_period("M"),
    }
    for name, s in series.items():
        vc = s.value_counts()
        n = int(vc.sum())
        sq = int((vc.astype("int64") ** 2).sum())
        mx = int(vc.max())
        r = got[name]
        assert r.n_partitions == len(vc)
        assert r.scan_frac_ppm == math.floor(float(sq) * 1e6
                                             / (float(n) * float(n)))
        assert r.max_part_ppm == math.floor(float(mx) * 1e6 / float(n))
        assert (1000000 // r.n_partitions) <= r.scan_frac_ppm + 1
        assert r.scan_frac_ppm <= r.max_part_ppm <= 1000000
