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


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from graphchidb_scala_spark.sources.bucketed import load_bucketed, save_bucketed

    df = spark.createDataFrame(
        [(0, s % 50, s, float(s)) for s in range(2000)],
        "etype int, src bigint, dst bigint, weight double",
    )
    save_bucketed(df, "edges_bkt_test", buckets=4, path=str(tmp_path / "bkt"))
    t = load_bucketed(spark, "edges_bkt_test")
    # force the shuffle-join path (a table this small would broadcast, which
    # sidesteps bucketing entirely; at scale neither side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # self-join on the bucket column: both sides co-located, no shuffle
        joined = t.alias("a").join(t.alias("b"), "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == sum(40 * 40 for _ in range(50))
        # aggregation on the bucket column also skips the exchange
        agg = t.groupBy("src").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS edges_bkt_test")


def test_salted_aggregation_and_join(spark):
    from graphchidb_scala_spark.operators import skew

    # one celebrity key (90% of rows) + uniform tail
    rows = [(0, i, float(i % 7)) for i in range(1800)] + [
        (k, 10_000 + k, 1.0) for k in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "key bigint, payload bigint, val double")
    plain = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["key"]: r["cnt"] for r in skew.salted_count(df, "key").collect()}
    assert salted == plain
    plain_sum = {r["key"]: r["s"] for r in df.groupBy("key").agg(F.sum("val").alias("s")).collect()}
    salted_sum = {r["key"]: r["total"] for r in skew.salted_sum(df, "key", "val").collect()}
    assert all(abs(plain_sum[k] - salted_sum[k]) < 1e-9 for k in plain_sum)

    dim = spark.createDataFrame([(k, f"n{k}") for k in range(0, 201)], "key bigint, name string")
    j = skew.salted_join(df, dim, "key")
    assert j.count() == df.count()  # every row matches exactly one dim row
    assert j.filter(F.col("key") == 0).select("name").distinct().collect()[0]["name"] == "n0"


def test_jsonl_roundtrip_and_corrupt_audit(spark, tmp_path):
    from graphchidb_scala_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    src = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "extra": 9}',
        "this is not json at all",
        '{"doc_id": 3, "text": "", "lang": "en", "source": "books"}',
    ]
    src.write_text("\n".join(lines) + "\n")
    docs, corrupt = read_documents_jsonl(spark, str(src))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_chars"] == 11 and got[2]["lang"] == "fr"
    assert "extra" not in docs.columns  # schema projection drops unknown keys
    bad = [r["line"] for r in corrupt.collect()]
    assert bad == ["this is not json at all"]

    out = tmp_path / "export"
    write_documents_jsonl(docs, str(out))
    back, _ = read_documents_jsonl(spark, str(out))
    assert {r["doc_id"] for r in back.collect()} == {1, 2, 3}
