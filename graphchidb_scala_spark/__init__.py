"""graphchidb_scala_spark — a PySpark-native property-graph analytics engine.

Brand-new engine with the query and data-processing capabilities of
GraphChi-DB (GraphChi/graphchiDB-scala), re-expressed Spark-first:

- the data model is two DataFrames (``edges``: typed directed multigraph keyed
  by ``(etype, src, dst)``; ``vertices``: id + property columns) instead of the
  reference's LSM shard tree + mmap column files (see SURVEY.md §1.4);
- every query is a declarative DataFrame plan optimized by Catalyst (predicate
  pushdown, column pruning, broadcast-vs-shuffle join selection replace the
  reference's hand-coded sparse/dense heuristics, SURVEY.md §4);
- iterative graph computation (PageRank, connected components, BFS) is a
  Pregel-style loop of joins + aggregations with active-set scheduling and
  lineage checkpointing (reference: VertexCentricComputation.scala:37-54,
  Scheduler.scala:31-83);
- beyond the reference's surface, `functions/` adds the large-scale
  training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search over embeddings, text analysis, and
  multimodal column plumbing.

Scale design: all operators are shuffle-conscious (broadcast hints for small
frontiers/dimension tables, map-side partial aggregation, salting hooks for
skew) and tested locally but written for a 1000-executor cluster at ~100 TB.
"""

from graphchidb_scala_spark.db import GraphDB, MAX_EDGE_TYPE
from graphchidb_scala_spark.session import get_spark, configure

__all__ = ["GraphDB", "MAX_EDGE_TYPE", "get_spark", "configure"]
__version__ = "0.1.0"
