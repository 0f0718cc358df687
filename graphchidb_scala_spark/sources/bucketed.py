"""Bucketed persistence — the cluster-scale analogue of the reference's
src-sorted shard files (QueryShard.java:98, FastSharder.java:55-198).

The reference keeps edges in src-sorted shards so every neighborhood query
binary-searches one shard; at Spark scale the same layout is a bucketed,
sorted table: `bucketBy(src)` + `sortBy(src, dst)`. Joins and aggregations on
src then read co-located buckets and skip the exchange entirely — the shuffle
that would dominate a 100 TB frontier join simply is not in the plan
(verified in tests/test_sources.py: the bucketed self-join plan contains no
Exchange).

Hive-bucketed tables need a catalog entry (`saveAsTable`); pass ``path`` to
keep the data external.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    bucket_col: str = "src",
    sort_cols: tuple[str, ...] = ("src", "dst"),
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted parquet table (overwrite)."""
    w = (
        df.write.format("parquet")
        .bucketBy(int(buckets), bucket_col)
        .sortBy(*sort_cols)
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucketing metadata (a plain
    ``read.parquet`` of the same files would lose it)."""
    return spark.table(table)
