"""Wikipedia SQL-dump ingest — parity with the reference's custom parsers
(WikipediaGraph.scala:90-131 + examples/util/WikipediaParsers.scala), which
line-parse MediaWiki ``page.sql`` / ``pagelinks.sql`` dumps into a pages
table and a link graph.

The reference streams the dump through a driver-side parser and calls
addEdgeOrigId per link; here the dump is a distributed ``spark.read.text``
scan: each multi-value ``INSERT INTO ... VALUES (...),(...);`` line is split
with ``regexp_extract_all`` into tuples, then fields are extracted per tuple —
all JVM-side regex, no Python loop, parallel over file splits (the 42.4M-page
ingest that takes the reference hours, WikipediaGraph.scala:41-42, becomes a
scan + two shuffles).

The name→id resolution (reference: StringToIdMap.java:33-70, a sorted string
index) is an equi-join of links against the pages table on title — SURVEY.md
§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graphchidb_scala_spark.db import GraphDB

#: one "(...)" tuple inside a VALUES list: quoted strings may contain escaped
#: quotes (\\') — the regex consumes either an escape pair or a non-quote char.
_TUPLE_RE = r"\((?:[^()']|'(?:\\.|[^'])*')*\)"


def _tuples(raw: DataFrame, table: str) -> DataFrame:
    """Explode INSERT lines of one table into single-tuple strings."""
    return (
        raw.filter(F.col("value").startswith(f"INSERT INTO `{table}` VALUES"))
        .select(F.explode(F.regexp_extract_all("value", F.lit(_TUPLE_RE), 0)).alias("t"))
    )


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``page.sql`` dump → DF(page_id, namespace, title).
    MediaWiki page tuples start ``(page_id, page_namespace, 'page_title', ...``;
    only namespace-0 (articles) is kept, like the reference
    (WikipediaParsers filters ns == 0)."""
    t = _tuples(spark.read.text(path), "page")
    parsed = t.select(
        F.regexp_extract("t", r"^\((\d+),", 1).cast("bigint").alias("page_id"),
        F.regexp_extract("t", r"^\(\d+,(-?\d+),", 1).cast("int").alias("namespace"),
        F.regexp_extract("t", r"^\(\d+,-?\d+,'((?:\\.|[^'])*)'", 1).alias("title"),
    )
    return parsed.filter(F.col("namespace") == 0).select(
        "page_id", "namespace", F.replace("title", F.lit(r"\'"), F.lit("'")).alias("title")
    )


def load_page_links(spark: SparkSession, path: str) -> DataFrame:
    """Parse a ``pagelinks.sql`` dump → DF(from_id, to_title).
    Link tuples are ``(pl_from, pl_namespace, 'pl_title', ...)``."""
    t = _tuples(spark.read.text(path), "pagelinks")
    parsed = t.select(
        F.regexp_extract("t", r"^\((\d+),", 1).cast("bigint").alias("from_id"),
        F.regexp_extract("t", r"^\(\d+,(-?\d+),", 1).cast("int").alias("namespace"),
        F.regexp_extract("t", r"^\(\d+,-?\d+,'((?:\\.|[^'])*)'", 1).alias("to_title"),
    )
    return parsed.filter(F.col("namespace") == 0).select(
        "from_id", F.replace("to_title", F.lit(r"\'"), F.lit("'")).alias("to_title")
    )


def wikipedia_graph(
    spark: SparkSession, pages_path: str, links_path: str, etype: int = 0
) -> GraphDB:
    """pages + pagelinks → GraphDB: vertices = articles, edges = resolved
    links (title join replaces the reference's StringToIdMap binary-search
    index). Unresolvable links (red links) drop out in the inner join, as in
    the reference."""
    pages = load_pages(spark, pages_path)
    links = load_page_links(spark, links_path)
    vertices = pages.select(F.col("page_id").alias("id"), "title")
    edges = (
        links.join(pages.select(F.col("title").alias("to_title"), "page_id"), "to_title")
        .select(
            F.lit(int(etype)).cast("int").alias("etype"),
            F.col("from_id").cast("bigint").alias("src"),
            F.col("page_id").cast("bigint").alias("dst"),
        )
    )
    return GraphDB(edges, vertices)
