"""Lineage cutting for multi-consumer frames and iterative loops.

Every loop frame and shared (multi-consumer) intermediate in this
engine cuts its lineage through :func:`cut_lineage` instead of calling
``DataFrame.localCheckpoint`` directly.  The default is
``localCheckpoint``: blocks live on executors and the plan is truncated
to an RDD leaf — the right trade locally and on healthy clusters (no
distributed-FS write), but an executor loss mid-query kills the job
instead of recomputing, because the lineage needed to rebuild the lost
blocks is gone (optimization guide §5).

The swap point for deployments that cannot eat that restart is ONE
setting: give the session a checkpoint directory
(``spark.sparkContext.setCheckpointDir("hdfs://.../ckpt")`` or the
``spark.checkpoint.dir`` conf at launch) and every call site below
switches to reliable ``checkpoint()`` — same values, same plans above
the leaf, blocks re-readable after executor loss.  Nothing else in the
engine changes.

Why ``.transform(cut_lineage)`` rather than a method: it keeps builder
chains intact, so the ~150 existing call sites are a mechanical swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize-on-first-use lineage cut (``eager=True`` forces it
    now).  localCheckpoint by default; reliable checkpoint when the
    session has a checkpoint directory (see module docstring)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
