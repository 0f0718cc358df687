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
from pyspark.storagelevel import StorageLevel


def cut_lineage(
    df: DataFrame, eager: bool = True, spill_only: bool = False
) -> DataFrame:
    """Materialize ``df`` and truncate its lineage/logical plan.

    Uses a reliable ``checkpoint`` when the SparkContext has a checkpoint
    directory configured (cluster deployments), else ``localCheckpoint``
    (single-node: executor-local blocks, no distributed-FS round-trip).

    ``spill_only`` stores the local checkpoint DISK_ONLY instead of the
    default MEMORY_AND_DISK — for data-sized intermediates (candidate
    pair tables in the many-millions) whose blocks would otherwise
    compete with broadcast hash relations and aggregation buffers for
    heap. Measured r15: the 10× replica capstone at c32 OOM'd
    deserializing the 130M-row crossing-candidate checkpoint under the
    repair verify's resident broadcasts; DISK_ONLY streams it instead
    (reliable ``checkpoint`` is already on-disk, so the flag is a no-op
    there)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    if spill_only:
        return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=eager)
