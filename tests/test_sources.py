"""Sources: edge-list CSV, Wikipedia SQL-dump parsing, and plan-quality
checks (predicate pushdown into parquet scans)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphchidb_scala_spark.db import GraphDB
from graphchidb_scala_spark.sources import wikipedia
from graphchidb_scala_spark.sources.edgelist import read_edge_list


def test_read_edge_list(spark, tmp_path):
    p = tmp_path / "edges.txt"
    p.write_text("# comment\n1\t2\n2\t3\nbad line\n3\t1\n")
    g = read_edge_list(spark, str(p))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == {(1, 2), (2, 3), (3, 1)}


def test_wikipedia_dump_parse(spark, tmp_path):
    pages = tmp_path / "page.sql"
    pages.write_text(
        "-- MySQL dump\n"
        "INSERT INTO `page` VALUES (1,0,'Alpha',0.5,1),(2,0,'Beta_O\\'Brien',0.1,2),"
        "(3,14,'Category:Skip',0,3),(4,0,'Gamma',0,4);\n"
    )
    links = tmp_path / "pagelinks.sql"
    links.write_text(
        "INSERT INTO `pagelinks` VALUES (1,0,'Beta_O\\'Brien'),(1,0,'Gamma'),"
        "(2,0,'Gamma'),(4,0,'Missing'),(4,14,'Category:Skip');\n"
    )
    pg = wikipedia.load_pages(spark, str(pages))
    assert {(r["page_id"], r["title"]) for r in pg.collect()} == {
        (1, "Alpha"), (2, "Beta_O'Brien"), (4, "Gamma"),
    }
    g = wikipedia.wikipedia_graph(spark, str(pages), str(links))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    # red link (4 -> Missing) and non-article namespaces drop out
    assert got == {(1, 2), (1, 4), (2, 4)}


def test_point_query_pushes_filters_to_parquet(spark, tmp_path):
    path = str(tmp_path / "edges_parquet")
    df = spark.createDataFrame(
        [(0, s, s + 1, float(s)) for s in range(1000)],
        "etype int, src bigint, dst bigint, weight double",
    )
    df.repartition(4, "src").sortWithinPartitions("src", "dst").write.parquet(path)
    g = GraphDB(spark.read.parquet(path))
    plan = g.query_out(7, etype=0)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(src,7)" in plan and "EqualTo(etype,0)" in plan
    # column pruning: selecting two columns must not read the rest
    pruned = g.query_out(7, etype=0).select("dst")
    scan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "weight" not in scan.split("ReadSchema")[-1]
