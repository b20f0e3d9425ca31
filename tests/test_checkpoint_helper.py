"""cut_lineage: the one lineage-cut swap point (functions/checkpoint.py).

Local default must be localCheckpoint (no checkpoint dir needed, no
files written); with a checkpoint directory set, the SAME call sites
must switch to reliable checkpoint() and leave recovery files on disk.
Values are identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_worker_spark.functions.checkpoint import cut_lineage


def test_local_mode_default_is_local_checkpoint(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = cut_lineage(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    # localCheckpoint truncates the plan to an RDD leaf
    assert "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_checkpoint_dir_switches_to_reliable(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    sc.setCheckpointDir(ckpt)
    try:
        df = cut_lineage(spark.range(10).withColumn("x", F.col("id") + 1),
                         eager=True)
        assert df.count() == 10
        # reliable checkpoint writes partition files under the dir
        found = []
        for root, _dirs, files in os.walk(ckpt):
            found.extend(files)
        assert found, "reliable checkpoint left no files on disk"
    finally:
        # pyspark has no unset API; clear the underlying Scala field so
        # the shared session fixture goes back to local-mode behavior.
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
        assert sc.getCheckpointDir() is None
