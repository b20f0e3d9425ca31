"""Structured-Streaming job consumer — the reference's SQS loop, Spark-first.

Reference (SURVEY.md §2.7): an infinite boto3 long-poll
(``src/consumer.py:55-111``) that JSON-parses each message
(S4, consumer.py:129-136), discards poison messages (S3,
consumer.py:180-190), processes one job at a time, and deletes the
message only on success (S2 at-least-once, consumer.py:153-176).

Spark mapping:

- queue        -> file-manifest stream (one JSON line per job message) or
                  any other streaming source; the element type is the same
                  ``{job_id, s3_key}`` record.
- long-poll    -> trigger (processingTime / availableNow for drain mode).
- ack/delete   -> the streaming checkpoint: a microbatch commits only
                  after ``foreachBatch`` returns, so a crash replays the
                  batch — at-least-once delivery, made effectively
                  exactly-once by the idempotent job flows (ADR-001:
                  row-hash anti-joins and insert-only MERGEs absorb the
                  replay). This is T2, the canonical Spark shape for the
                  reference's delivery contract.
- poison msg   -> ``from_json`` null-out + filter (bad records never
                  reach the processor and never block the stream).

The *data* plane stays fully distributed (each job's CSV is a cluster
scan); only the per-message routing (T3) is driver-side, exactly like the
reference's control flow — a control stream of one message per job is
driver-scale by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..control.processor import JobProcessor
from ..control.store import ControlStore

JOB_MESSAGE_SCHEMA = "job_id bigint, s3_key string"


def parse_job_messages(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """S4 + S3: JSON-parse message bodies; drop poison + incomplete ones."""
    parsed = raw.select(
        F.from_json(F.col(value_col), JOB_MESSAGE_SCHEMA).alias("m")
    ).select("m.*")
    return parsed.filter(
        F.col("job_id").isNotNull() & F.col("s3_key").isNotNull()
    )


class JobStreamConsumer:
    """readStream(inbox) -> foreachBatch(route + process) with checkpoint."""

    def __init__(self, spark: SparkSession, store: ControlStore,
                 inbox_dir: str, checkpoint_dir: str,
                 user_id: str = "user-1") -> None:
        self.spark = spark
        self.processor = JobProcessor(spark, store, user_id=user_id)
        self.inbox_dir = inbox_dir
        self.checkpoint_dir = checkpoint_dir
        self.results: list[tuple[int, str]] = []

    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        msgs = parse_job_messages(batch_df)
        # Control stream: one tiny row per job — the collect is bounded by
        # message count, never by data size (the CSVs are processed as
        # distributed scans inside process_job).
        for row in msgs.collect():
            job_id = int(row["job_id"])
            try:
                action = self.processor.process_job(job_id, row["s3_key"])
            except Exception as e:  # noqa: BLE001
                # Per-message error isolation (reference S3/T10): a job
                # whose CSV is missing/unreadable must not wedge the
                # stream — raising here would fail the microbatch and the
                # checkpoint would replay it forever (head-of-line
                # blocking for every later job).  The job is recorded as
                # errored; the message is consumed.
                action = f"error:{type(e).__name__}"
            self.results.append((job_id, action))

    def start(self, available_now: bool = True,
              processing_interval: str = "20 seconds") -> StreamingQuery:
        """availableNow=True drains the inbox and stops (test/batch mode);
        otherwise polls like the reference's 20 s long-poll loop (T1)."""
        raw = (
            self.spark.readStream.format("text")
            .load(self.inbox_dir)
        )
        writer = raw.writeStream.foreachBatch(self._process_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_interval)
        return writer.start()
