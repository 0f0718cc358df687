"""Graph view over the driver's TPC-H-ish testdata (TESTDATA.md, FIXTURES.md §F6).

The reference's example apps build graphs from external datasets
(SocialNetworkExample.scala:102-128, MovieDatabase.scala:91-124); here the
equivalent ingest maps the star schema onto a typed directed multigraph.
Vertex-id disambiguation uses id-range offsets — the reference's own
typed-vertex workaround (MovieDatabase.scala:59-62: user ids offset by 200000).

Edge types:
    0 PLACED       customer -> order      weight=o_totalprice, ts=o_orderdate
    1 CONTAINS     order    -> part       weight=SUM(l_quantity), ts=MAX(l_shipdate)
    2 SUPPLIED_BY  part     -> supplier   weight=SUM(l_quantity), ts=MAX(l_shipdate)

Types 1/2 aggregate lineitem so the (etype, src, dst) key is unique —
multigraph key discipline per QueryShard.java:207. ``l_quantity`` is integral
in the testdata, so the SUM is exact in fp regardless of aggregation order
(safe for cross-engine hashing).

``GRAPH_SQL_CTES`` is the ANSI-SQL definition of the *same* view, used as the
CTE prefix of every DuckDB oracle query — keeping the Spark and oracle views
definitionally in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphchidb_scala_spark.db import GraphDB
from graphchidb_scala_spark.session import configure

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# 1e12 spacing: each typed-vertex id range holds a trillion keys, so the
# view survives TPC-H scale factors in the thousands (sf1 already has
# orderkeys past 1e6 — a 1e6 spacing collides part ids into the order range)
ORDER_OFFSET = 1_000_000_000_000
PART_OFFSET = 2_000_000_000_000
SUPP_OFFSET = 3_000_000_000_000

E_PLACED, E_CONTAINS, E_SUPPLIED_BY = 0, 1, 2


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    configure(spark)
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def tpch_graph(spark: SparkSession, sf_dir: str) -> GraphDB:
    """Build the GraphDB view. All plans stay lazy; filters/projections on the
    result push down into the individual parquet scans through the union."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "part", "supplier", "lineitem"))

    placed = t["orders"].select(
        F.lit(E_PLACED).cast("int").alias("etype"),
        F.col("o_custkey").cast("bigint").alias("src"),
        (F.lit(ORDER_OFFSET) + F.col("o_orderkey")).cast("bigint").alias("dst"),
        F.col("o_totalprice").cast("double").alias("weight"),
        F.col("o_orderdate").alias("ts"),
    )
    contains = (
        t["lineitem"]
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("w"), F.max("l_shipdate").alias("m"))
        .select(
            F.lit(E_CONTAINS).cast("int").alias("etype"),
            (F.lit(ORDER_OFFSET) + F.col("l_orderkey")).cast("bigint").alias("src"),
            (F.lit(PART_OFFSET) + F.col("l_partkey")).cast("bigint").alias("dst"),
            F.col("w").cast("double").alias("weight"),
            F.col("m").alias("ts"),
        )
    )
    supplied = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("w"), F.max("l_shipdate").alias("m"))
        .select(
            F.lit(E_SUPPLIED_BY).cast("int").alias("etype"),
            (F.lit(PART_OFFSET) + F.col("l_partkey")).cast("bigint").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).cast("bigint").alias("dst"),
            F.col("w").cast("double").alias("weight"),
            F.col("m").alias("ts"),
        )
    )
    edges = placed.unionAll(contains).unionAll(supplied)

    vertices = (
        t["customer"].select(
            F.col("c_custkey").cast("bigint").alias("id"),
            F.lit("customer").alias("vtype"),
            F.col("c_name").alias("name"),
        )
        .unionAll(
            t["orders"].select(
                (F.lit(ORDER_OFFSET) + F.col("o_orderkey")).cast("bigint"),
                F.lit("order"),
                F.col("o_orderkey").cast("string"),
            )
        )
        .unionAll(
            t["part"].select(
                (F.lit(PART_OFFSET) + F.col("p_partkey")).cast("bigint"),
                F.lit("part"),
                F.col("p_name"),
            )
        )
        .unionAll(
            t["supplier"].select(
                (F.lit(SUPP_OFFSET) + F.col("s_suppkey")).cast("bigint"),
                F.lit("supplier"),
                F.col("s_name"),
            )
        )
    )
    return GraphDB(edges, vertices)


#: ANSI-SQL CTEs defining the same graph view for the DuckDB oracle.
#: Prepend (inside a WITH [RECURSIVE]) to every oracle query.
GRAPH_SQL_CTES = f"""
edges AS (
  SELECT CAST(0 AS INT) AS etype, CAST(o_custkey AS BIGINT) AS src,
         CAST({ORDER_OFFSET} + o_orderkey AS BIGINT) AS dst,
         CAST(o_totalprice AS DOUBLE) AS weight, o_orderdate AS ts
  FROM orders
  UNION ALL
  SELECT CAST(1 AS INT), CAST({ORDER_OFFSET} + l_orderkey AS BIGINT),
         CAST({PART_OFFSET} + l_partkey AS BIGINT),
         CAST(SUM(l_quantity) AS DOUBLE), MAX(l_shipdate)
  FROM lineitem GROUP BY l_orderkey, l_partkey
  UNION ALL
  SELECT CAST(2 AS INT), CAST({PART_OFFSET} + l_partkey AS BIGINT),
         CAST({SUPP_OFFSET} + l_suppkey AS BIGINT),
         CAST(SUM(l_quantity) AS DOUBLE), MAX(l_shipdate)
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
vertices AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, 'customer' AS vtype, c_name AS name FROM customer
  UNION ALL
  SELECT CAST({ORDER_OFFSET} + o_orderkey AS BIGINT), 'order', CAST(o_orderkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT CAST({PART_OFFSET} + p_partkey AS BIGINT), 'part', p_name FROM part
  UNION ALL
  SELECT CAST({SUPP_OFFSET} + s_suppkey AS BIGINT), 'supplier', s_name FROM supplier
),
und AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT dst AS a, src AS b FROM edges
)
""".strip()
