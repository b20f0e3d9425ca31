"""PySpark-native analytics engine with the query & data-processing
capabilities of ``rpdevelops/data-ingestion-worker`` (reference surveyed in
SURVEY.md), rebuilt Spark-first.

The reference is a single-threaded SQS->CSV->Postgres contact-ingestion
worker; this package re-expresses every one of its operators (SURVEY.md §2)
as declarative DataFrame plans that Catalyst/Tungsten can optimize, plus the
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing) it would need at 100 TB.

Layout
------
- ``session``    SparkSession factory with scale-oriented defaults.
- ``tables``     Loaders for the driver's parquet tables (nanos-ts safe).
- ``functions``  Scalar column expressions (validation F1-F9, hashing, text,
                 vector math) — zero row-at-a-time Python UDFs.
- ``operators``  Relational/dedup/similarity/event-window operators.
- ``plans``      End-to-end pipelines (the reference's §3 lifecycles as
                 single DataFrame plans).
- ``ingest``     CSV edge: encoding + delimiter sniffing, header cleanup
                 (reference src/services/s3_service.py re-specified).
- ``control``    jobs/staging/issues/issue_items/contacts control tables and
                 the set-based initial/reprocess/consolidate flows.
- ``streaming``  Structured Streaming job consumer (SQS analogue) and
                 event-time windowing.
- ``registry``   The query registry backing ``__spark_entry__.py``:
                 every operator exposed as (spark_fn, duckdb_oracle_sql).
"""

__version__ = "0.1.0"
