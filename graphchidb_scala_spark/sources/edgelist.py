"""Edge-list text/CSV ingest — parity with the reference's line-parse loops
(SocialNetworkExample.scala:102-128: LiveJournal/Twitter tab-separated lists;
MovieDatabase.scala:91-124: '::'-separated ratings).

The reference parses line-by-line on the driver and calls addEdgeOrigId per
edge; here the whole file is a distributed scan — `spark.read.csv` with a
schema, comments filtered out, malformed rows dropped. At 100 TB the read
parallelizes over file splits; no driver loop exists.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from graphchidb_scala_spark.db import GraphDB


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    etype: int = 0,
    comment: str = "#",
) -> GraphDB:
    """Read a `src<sep>dst` edge list (LiveJournal format) into a GraphDB."""
    schema = StructType(
        [StructField("src", LongType()), StructField("dst", LongType())]
    )
    df = (
        spark.read.csv(path, sep=sep, schema=schema, comment=comment, mode="DROPMALFORMED")
        .dropna(subset=["src", "dst"])
        .select(
            F.lit(int(etype)).cast("int").alias("etype"),
            F.col("src").cast("bigint"),
            F.col("dst").cast("bigint"),
        )
    )
    return GraphDB(df)
