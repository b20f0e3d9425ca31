"""Deployable worker entrypoint (the reference's ``main.py``).

The reference is launched as ``python main.py`` (src/main.py:6 →
consumer.py:224-234): configure logging, build the SQS consumer, poll
forever.  This is the Spark-native twin, runnable as::

    python -m data_ingestion_worker_spark [--drain] [--once]

Wiring: queue client → :class:`QueueBridge` (atomic drain into the
file inbox, ack-after-durable) → :class:`JobStreamConsumer`
(readStream + foreachBatch routing/processing with checkpoint) over a
:class:`ControlStore` rooted on disk.  Configuration comes from
environment variables the way the reference's ``settings.py`` reads
SQS/DB settings, defaults mirroring its values:

==============================  =======================================
SPARK_INGEST_ROOT               base dir (control tables, inbox,
                                checkpoint live under it; default
                                ``./ingest-worker``)
SPARK_INGEST_QUEUE_DIR          file-queue directory (FileQueueClient;
                                default ``<root>/queue``)
SPARK_INGEST_SQS_QUEUE_URL      use the real SQS client instead
                                (boto3 required)
SPARK_INGEST_USER_ID            tenant id for consolidation
                                (default ``user-1``)
SPARK_INGEST_POLL_SECONDS       long-poll / trigger interval
                                (default 20, reference settings.py)
SPARK_INGEST_VISIBILITY_SEC     redelivery window (default 300)
SPARK_INGEST_MAX_MESSAGES       per-poll receive bound (default 1 —
                                the reference's
                                SQS_MAX_NUMBER_OF_MESSAGES)
SPARK_INGEST_MAX_RECEIVE_COUNT  dead-letter retry budget (default 3)
==============================  =======================================

``--drain``: empty the queue (repeat polls until a receive returns no
messages), one availableNow pass over the inbox, then exit (batch/cron
mode).  ``--once``: exactly one poll cycle + one availableNow pass,
then exit (smoke-test mode).  Without either flag the worker
long-polls like the reference's infinite loop; Ctrl-C stops the
streaming query cleanly (the reference's KeyboardInterrupt path,
consumer.py:103-111).
"""

from __future__ import annotations

import argparse
import os

from .control.store import ControlStore
from .session import get_spark
from .streaming.consumer import JobStreamConsumer
from .streaming.queue import FileQueueClient, QueueBridge


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def build_worker(spark=None):
    """Construct (bridge, consumer) from the environment, reference
    defaults.  Factored out of ``main`` so tests can drive one poll
    cycle without process-level wiring."""
    root = _env("SPARK_INGEST_ROOT", "./ingest-worker")
    queue_url = os.environ.get("SPARK_INGEST_SQS_QUEUE_URL")
    visibility = float(_env("SPARK_INGEST_VISIBILITY_SEC", "300"))
    spark = spark or get_spark("ingest-worker")
    store = ControlStore(spark, os.path.join(root, "control"))
    inbox = os.path.join(root, "inbox")
    if queue_url:
        from .streaming.queue import SqsQueueClient

        client = SqsQueueClient(queue_url,
                                visibility_timeout=int(visibility))
    else:
        qdir = _env("SPARK_INGEST_QUEUE_DIR", os.path.join(root, "queue"))
        os.makedirs(qdir, exist_ok=True)
        client = FileQueueClient(qdir, visibility_timeout=visibility)
    bridge = QueueBridge(client, inbox)
    consumer = JobStreamConsumer(
        spark, store, inbox_dir=inbox,
        checkpoint_dir=os.path.join(root, "checkpoint"),
        user_id=_env("SPARK_INGEST_USER_ID", "user-1"),
        max_receive_count=int(_env("SPARK_INGEST_MAX_RECEIVE_COUNT", "3")),
    )
    return bridge, consumer


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="data_ingestion_worker_spark",
        description="Spark-native contact-ingestion worker",
    )
    ap.add_argument("--drain", action="store_true",
                    help="empty the queue, one availableNow pass, exit")
    ap.add_argument("--once", action="store_true",
                    help="one poll cycle + one availableNow pass, exit")
    args = ap.parse_args(argv)
    poll = float(_env("SPARK_INGEST_POLL_SECONDS", "20"))
    max_messages = int(_env("SPARK_INGEST_MAX_MESSAGES", "1"))

    bridge, consumer = build_worker()
    if args.drain or args.once:
        while bridge.drain_once(max_messages=max_messages) > 0:
            if args.once:
                break
        consumer.start(available_now=True).awaitTermination()
        return 0
    query = consumer.start(available_now=False,
                           processing_interval=f"{int(poll)} seconds")
    try:
        # The reference's infinite long-poll loop (consumer.py:55-111):
        # bridge SQS->inbox forever; the streaming query picks manifests
        # up on its own trigger cadence.
        bridge.run(poll_interval=poll, max_messages=max_messages)
    except KeyboardInterrupt:
        pass
    finally:
        query.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
