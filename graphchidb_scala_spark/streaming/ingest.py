"""Online edge ingest — the reference's LSM write path (SURVEY.md §3.1:
in-memory EdgeBuffers → sorted merge → shard tree) re-expressed as
base-Parquet + appends-union + compaction:

- ``add_batch``: append a micro-batch parquet file; immediately visible at
  read (parity with addEdge's immediate queryability, README.md:226-229).
  The appends directory is the EdgeBuffer analogue.
- ``compact``: rewrite base+appends into ``num_buckets`` files hash-bucketed
  by src and sorted within partition by (src, dst) — the LSM merge analogue
  (GraphChiDatabase.scala:622-795). Sorted-by-src row groups give parquet
  min/max pruning for point src lookups, exactly the role of the reference's
  shard pointer/skip indexes.
- upsert discipline: within the union, the newest version of an
  (etype,src,dst) key wins — the LSM newest-first read path
  (GraphChiDatabase.scala:1385-1399 probes buffers first, newest shard first).

Also provides Structured Streaming ingestion from an event-stream DataFrame
(``readStream`` → foreachBatch → add_batch), the micro-batch trigger analogue
of the reference's buffer flusher daemon (GraphChiDatabase.scala:912-938).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from graphchidb_scala_spark.db import EDGE_KEY, GraphDB


class EdgeStore:
    """Parquet-backed edge store with micro-batch appends and compaction."""

    def __init__(self, spark: SparkSession, path: str, num_buckets: int = 32):
        self.spark = spark
        self.path = path
        self.base_dir = os.path.join(path, "base")
        self.appends_dir = os.path.join(path, "appends")
        self.num_buckets = num_buckets
        self._batch_seq = 0

    # ------------------------------------------------------------------ writes

    def init_base(self, edges: DataFrame) -> None:
        (
            edges.withColumn("_v", F.lit(0).cast("long"))
            .repartition(self.num_buckets, "src")
            .sortWithinPartitions("src", "dst")
            .write.mode("overwrite")
            .parquet(self.base_dir)
        )

    def add_batch(self, edges: DataFrame) -> None:
        """Append one micro-batch (immediately visible). ``_v`` is a
        monotonically increasing batch version — the newest-wins key."""
        self._batch_seq += 1
        version = int(time.time() * 1000) * 1000 + self._batch_seq
        (
            edges.withColumn("_v", F.lit(version).cast("long"))
            .write.mode("append")
            .parquet(self.appends_dir)
        )

    # ------------------------------------------------------------------- reads

    def edges(self) -> DataFrame:
        """Current edge set: base ∪ appends with newest-version-wins per
        (etype, src, dst) — one window per read; compaction folds it away."""
        dfs = []
        for d in (self.base_dir, self.appends_dir):
            if self._exists(d):
                dfs.append(self.spark.read.parquet(d))
        if not dfs:
            raise ValueError(f"empty EdgeStore at {self.path}")
        union = dfs[0]
        for d in dfs[1:]:
            union = union.unionByName(d, allowMissingColumns=True)
        w = Window.partitionBy(*EDGE_KEY).orderBy(F.desc("_v"))
        return (
            union.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )

    def graph(self, vertices: DataFrame | None = None) -> GraphDB:
        return GraphDB(self.edges(), vertices)

    # -------------------------------------------------------------- compaction

    def compact(self) -> None:
        """Merge appends into the base: shuffle once on src buckets, sort
        within partitions — the entire LSM merge cascade of the reference in
        one job. Run when appends exceed ~25% of base (the reference's
        reconstruct threshold, GraphChiDatabase.scala:842-845)."""
        merged = (
            self.edges()
            .withColumn("_v", F.lit(0).cast("long"))
            .repartition(self.num_buckets, "src")
            .sortWithinPartitions("src", "dst")
        )
        tmp = self.base_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        self._replace(self.base_dir, tmp)
        self._rm(self.appends_dir)

    # ------------------------------------------------------------------- utils

    @staticmethod
    def _exists(d: str) -> bool:
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    @staticmethod
    def _replace(dst: str, tmp: str) -> None:
        import shutil

        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(tmp, dst)

    @staticmethod
    def _rm(d: str) -> None:
        import shutil

        if os.path.isdir(d):
            shutil.rmtree(d)


def stream_edges_from_events(
    events_stream: DataFrame,
    store: EdgeStore,
    src_col: str = "user_id",
    dst_col: str = "event_id",
    etype: int = 0,
):
    """Structured-Streaming ingestion: map an event stream to edges and append
    each micro-batch to the store (foreachBatch — the flusher-daemon analogue).
    Returns the StreamingQuery; caller owns awaitTermination/stop."""
    edges = events_stream.select(
        F.lit(int(etype)).cast("int").alias("etype"),
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store.add_batch(batch_df)

    return edges.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
