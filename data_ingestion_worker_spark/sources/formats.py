"""Multi-format table I/O: parquet, ORC, JSON-lines, CSV, XML.

The reference ingests exactly one format — CSV fetched from object
storage (src/services/s3_service.py) — and emits none.  A Spark engine
inherits every columnar/row format the runtime ships; this module pins
the engine's supported matrix and the per-format round-trip guarantees
so downstream code can choose by contract, not by trial:

- **parquet** (default everywhere else in the repo): full fidelity —
  nested types, DECIMAL, TIMESTAMP, binary; predicate pushdown + column
  pruning + partition pruning.
- **orc**: same fidelity class as parquet (built into the Spark
  runtime, no extra package); bring-your-own choice when the lakehouse
  standardized on ORC.  Pushdown/pruning verified by test.
- **json** (lines): schema-on-read; DECIMAL and TIMESTAMP survive only
  when the reader is given the writer's schema (JSON itself types
  neither) — ``read_table`` therefore *requires* a schema for JSON.
- **csv**: flat columns only; same explicit-schema requirement, plus
  the header/quote dialect is pinned here so every writer/reader pair
  in the engine agrees (RFC 4180, as ingest/csv_reader.py parses).
- **xml**: Spark 4 ships the (formerly external) XML source natively;
  same explicit-schema rule as the other row formats, row/root tags
  pinned here.  Interchange with XML-emitting enterprise feeds — never
  an analytics layout (full-byte scan + tag overhead).

At 100 TB the format choice is a scan-cost choice: columnar formats
(parquet/ORC) read only projected columns and push filters to stripe/
row-group level; row formats (json/csv) always pay a full-byte scan —
they are interchange formats, not analytics layouts.  Keeping them
behind one seam makes that trade explicit per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

COLUMNAR = {"parquet", "orc"}
ROW_BASED = {"json", "csv", "xml"}
FORMATS = COLUMNAR | ROW_BASED

_CSV_OPTS = {"header": "true", "quote": '"', "escape": '"'}
_XML_OPTS = {"rowTag": "row", "rootTag": "rows", "declaration": ""}


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        for k, v in _CSV_OPTS.items():
            w = w.option(k, v)
    if fmt == "xml":
        for k, v in _XML_OPTS.items():
            w = w.option(k, v)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | None = None) -> DataFrame:
    """Read a table written by :func:`write_table`.

    Columnar formats carry their own schema; row formats require the
    writer's schema (inference would silently widen/retype columns —
    the class of drift the engine's determinism contract forbids).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    if fmt in ROW_BASED and schema is None:
        raise ValueError(f"{fmt} round-trips require an explicit schema")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        for k, v in _CSV_OPTS.items():
            r = r.option(k, v)
    if fmt == "xml":
        r = r.option("rowTag", _XML_OPTS["rowTag"])
    return r.load(path)
