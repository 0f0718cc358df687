"""Lineage cutting for iterative and multi-pass operators.

Iterative DataFrame loops (Pregel supersteps, BFS hops, star-contraction
rounds) and reused mid-query materializations (minhash signatures, shingle
prefix tables) must cut lineage each round or the logical plan grows without
bound (SURVEY.md §7.4). *How* to cut it is a deployment decision:

- ``localCheckpoint`` stores blocks on executors: fastest, but blocks die
  with an executor, and a long 100-iteration job on a 1000-executor cluster
  *will* lose executors — the job then fails (a localCheckpoint's lineage is
  truncated, so Spark cannot recompute the lost partitions).
- ``checkpoint`` writes to the fault-tolerant FS configured via
  ``spark.sparkContext.setCheckpointDir`` (HDFS/S3): survives executor and
  node loss, the right choice for production-scale iterative compute.

``cut_lineage`` picks reliable checkpointing whenever the session has a
checkpoint dir configured and falls back to localCheckpoint otherwise, so
single-node runs (tests, bench, local[32]) pay no distributed-FS cost while
a cluster deployment opts in with one line:

    spark.sparkContext.setCheckpointDir("hdfs:///tmp/graphchidb-ckpt")
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage/logical plan.

    Uses a reliable ``checkpoint`` when the SparkContext has a checkpoint
    directory configured (cluster deployments), else ``localCheckpoint``
    (single-node: executor-local blocks, no distributed-FS round-trip)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
