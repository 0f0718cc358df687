"""cut_lineage dispatch: reliable checkpoint when a checkpoint dir is
configured (cluster deployments), localCheckpoint otherwise — and identical
operator results either way."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from graphchidb_scala_spark.checkpoint import cut_lineage


def _lineage_cut(df) -> bool:
    # a checkpointed DF scans the materialized RDD — no upstream operators
    return "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_cut_lineage_local_by_default(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = cut_lineage(spark.range(10))
    assert df.count() == 10
    assert _lineage_cut(df)


def test_cut_lineage_reliable_with_checkpoint_dir(spark, chain_db):
    ckdir = tempfile.mkdtemp(prefix="ckpt_test_")
    sc = spark.sparkContext
    try:
        sc.setCheckpointDir(ckdir)
        df = cut_lineage(spark.range(10).withColumn("x", F.col("id") * 2))
        assert df.count() == 10
        assert _lineage_cut(df)
        # files actually land in the fault-tolerant dir
        found = any(files for _, _, files in os.walk(ckdir))
        assert found
        # an iterative operator runs unchanged under reliable checkpointing
        from graphchidb_scala_spark.operators import pregel

        cc = pregel.connected_components(chain_db).groupBy("cc").count()
        assert cc.count() > 0
    finally:
        # Option(null) => None on the Scala side: restores local mode for the
        # rest of the (session-scoped) fixture's tests
        sc._jsc.sc().setCheckpointDir(None)
        assert sc.getCheckpointDir() is None


def test_cut_lineage_results_identical_across_modes(spark, chain_db):
    from graphchidb_scala_spark.operators import pregel

    local_pr = pregel.pagerank(chain_db, iterations=3).collect()
    ckdir = tempfile.mkdtemp(prefix="ckpt_test2_")
    sc = spark.sparkContext
    try:
        sc.setCheckpointDir(ckdir)
        rel_pr = pregel.pagerank(chain_db, iterations=3).collect()
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    key = lambda r: r["id"]
    assert sorted(local_pr, key=key) == sorted(rel_pr, key=key)
