"""Streaming materialized-view maintenance (incremental snapshot sinks).

The batch half lives in ``control.store``: ``maintain_aggregate`` rolls
a change-feed into a grouped count/sum rollup for the price of the
changes.  This module is the streaming half — on an append-only stream
every microbatch IS a pure insert-delta, so the same delta-propagation
rule maintains a continuously fresh snapshot.  Per-trigger cost is
O(|microbatch| + |snapshot|) — the merge re-shuffles the (small)
materialized table, never the event history; the 100 TB alternative —
recomputing from the full table per trigger — re-scans everything every
few seconds.

Two sinks share the machinery:

- :class:`RollupSink` — grouped count/sum rollup (streaming GROUP BY).
- :class:`Scd2Sink` — SCD Type-2 dimension (streaming history table):
  each microbatch folds in via ``operators.temporal.scd2_merge_batch``,
  so the continuously-maintained dimension is pinned equal to the full
  batch rebuild by the same merge the batch path grades against its
  oracle.

Exactly-once: ``foreachBatch`` delivers batches at-least-once across
restarts, with a monotonically increasing ``batch_id``.  The sink
publishes each new snapshot version with the batch id inside the pointer
record (fsync'd tmp + atomic rename), and ``apply`` is a no-op for any
batch id at or below the last applied one — the canonical epoch-id
dedup contract that upgrades replay to exactly-once.  Superseded
version directories are deleted after the pointer flips (one prior
version is retained for in-flight readers), so disk usage is bounded
at ~two snapshots regardless of stream lifetime.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..control.store import maintain_aggregate
from ..operators.temporal import _scd2_build, scd2_merge_batch


class _VersionedSnapshotSink:
    """Versioned on-disk snapshot maintained by ``foreachBatch``.

    Subclasses provide ``_seed`` (zero-row snapshot of the right schema)
    and ``_merge`` (fold one insert-only microbatch into the previous
    snapshot); this base owns the pointer protocol, the epoch-id
    idempotence guard, and snapshot GC.
    """

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- pointer ------------------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def _state(self) -> tuple[str | None, int]:
        """(current version dir, last applied batch_id).

        Only a MISSING pointer means "no snapshot yet".  A pointer that
        exists but does not parse is corruption — treating it as
        first-run would silently reseed an empty snapshot and discard
        all accumulated state, so it raises instead (the write path
        fsyncs before the atomic rename precisely so this cannot happen
        from a mere crash).
        """
        try:
            with open(self._pointer()) as f:
                rec = json.load(f)
        except FileNotFoundError:
            return None, -1
        try:
            return rec["version"], rec["batch_id"]
        except (TypeError, KeyError) as e:
            raise ValueError(
                f"snapshot pointer {self._pointer()} is corrupt: {rec!r}"
            ) from e

    def read(self) -> DataFrame | None:
        """Current snapshot, or None before the first batch."""
        version, _ = self._state()
        if version is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, version))

    def last_batch_id(self) -> int:
        return self._state()[1]

    # -- subclass surface ---------------------------------------------------

    def _seed(self, batch: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _merge(self, prev: DataFrame, batch: DataFrame) -> DataFrame:
        raise NotImplementedError

    # -- the foreachBatch body ----------------------------------------------

    def apply(self, batch: DataFrame, batch_id: int) -> None:
        """Fold one microbatch into the snapshot (idempotent per batch id).

        A replayed batch (crash after publish, before the streaming
        checkpoint commit) is skipped by the id guard, so the snapshot
        never double-counts — at-least-once delivery + idempotent apply
        = exactly-once contents.
        """
        prev_version, last = self._state()
        if batch_id <= last:
            return
        if prev_version is None:
            prev = self._seed(batch)
        else:
            prev = self.spark.read.parquet(
                os.path.join(self.path, prev_version)
            )
        merged = self._merge(prev, batch)
        new_version = f"v-{uuid.uuid4().hex[:12]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(self.path, new_version)
        )
        tmp = self._pointer() + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": new_version, "batch_id": batch_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer())
        self._gc(keep={new_version, prev_version})

    def _gc(self, keep: set) -> None:
        """Delete superseded version dirs and stale pointer tmp files.

        The just-superseded version stays (an in-flight reader may still
        be scanning it); everything older goes — the sink's steady-state
        footprint is two snapshots, not one per trigger.
        """
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("v-") and name not in keep:
                shutil.rmtree(full, ignore_errors=True)
            elif name.endswith(".tmp"):
                try:
                    os.unlink(full)
                except OSError:
                    pass


class RollupSink(_VersionedSnapshotSink):
    """Grouped count/sum rollup maintained per microbatch.

    Usage::

        sink = RollupSink(spark, path, keys=["event_type"],
                          sum_cols=["value_cents"])
        stream.writeStream.foreachBatch(sink.apply) \
              .option("checkpointLocation", ckpt).start()
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 sum_cols: list[str]) -> None:
        super().__init__(spark, path)
        self.keys = keys
        self.sum_cols = sum_cols

    def _seed(self, batch: DataFrame) -> DataFrame:
        """Zero-row rollup frame with the aggregate's schema."""
        return (
            batch.select(
                *self.keys,
                F.lit(0).cast("long").alias("n_rows"),
                *[F.lit(0).cast("long").alias(f"sum_{c}")
                  for c in self.sum_cols],
            )
            .limit(0)
        )

    def _merge(self, prev: DataFrame, batch: DataFrame) -> DataFrame:
        inserts = batch.withColumn("_change_type", F.lit("insert"))
        return maintain_aggregate(prev, inserts, self.keys, self.sum_cols)


class Scd2Sink(_VersionedSnapshotSink):
    """SCD Type-2 dimension maintained per microbatch (streaming history
    table).

    Expects microbatches of ``(user_id, event_type, ts, event_id)`` in
    event-time order across batches (the ``scd2_merge_batch`` watermark
    contract: each batch strictly newer than the folded history — an
    out-of-order source needs a watermark-delayed emit upstream).  The
    first batch merges into an empty dimension, which IS the full
    build; every later batch costs O(|batch| + |open intervals|), never
    a history rebuild.
    """

    def _seed(self, batch: DataFrame) -> DataFrame:
        # Derive the zero-row dimension from the build itself, so the
        # seed schema cannot drift from the authoritative SCD2 shape.
        return _scd2_build(
            batch.select("user_id", "event_type", "ts", "event_id")
        ).limit(0)

    def _merge(self, prev: DataFrame, batch: DataFrame) -> DataFrame:
        return scd2_merge_batch(
            prev, batch.select("user_id", "event_type", "ts", "event_id")
        )
