"""DuckDB-oracle parity smoke (full sweep lives in tools/check_oracle.py).

Every registry query runs at sf0.001 against its oracle — identical
comparison discipline to the driver (row count + sorted columns +
order-insensitive values).  Kept at the smallest SF so the whole sweep
stays test-suite-fast.
"""

from __future__ import annotations

import duckdb
import pytest

from data_ingestion_worker_spark.registry import all_specs
from data_ingestion_worker_spark.tables import TABLE_NAMES

from tools.check_oracle import canon

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_query_matches_oracle(spark, duck, name):
    spec = all_specs()[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canon(srows, scols) == canon(drows, dcols)
