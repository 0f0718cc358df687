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


def _make_warc(records):
    """Byte-build a WARC file. records: list of (warc_type, record_id, url,
    body_bytes, http_headers: bool)."""
    out = bytearray()
    for wtype, rid, url, body, http in records:
        if http:
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
        hdr = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: " + rid.encode(),
            b"WARC-Date: 2024-01-01T00:00:00Z",
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(body)).encode(),
        ]
        if url:
            hdr.insert(3, b"WARC-Target-URI: " + url.encode())
        out += b"\r\n".join(hdr) + b"\r\n\r\n" + body + b"\r\n\r\n"
    return bytes(out)


def test_warc_ingest_and_strip_html(spark, tmp_path):
    """read_documents_warc: response/conversion records become documents
    (HTTP headers stripped, request/metadata records skipped), gzip and
    plain files parse identically, and strip_html's column expression
    matches a python reference on the crawled bodies."""
    import gzip
    import re as _re

    from graphchidb_scala_spark.functions.text import strip_html
    from graphchidb_scala_spark.sources.warc import (
        parse_warc_records, read_documents_warc,
    )

    html = (
        b"<html><head><style>p {color: red}</style>"
        b"<script>var x = '<p>';</script></head>"
        b"<body><!-- note --><h1>Hello &amp; welcome</h1>"
        b"<p>line one</p><p>line&nbsp;two &lt;tag&gt;</p></body></html>"
    )
    plain = b"already plain text from a conversion record"
    recs = [
        ("response", "<urn:uuid:r1>", "http://a.example/x", html, True),
        ("request", "<urn:uuid:q1>", "http://a.example/x", b"GET / HTTP/1.1", False),
        ("conversion", "<urn:uuid:r2>", "http://b.example/y", plain, False),
        ("metadata", "<urn:uuid:m1>", None, b"fetchDuration: 12", False),
    ]
    blob = _make_warc(recs)
    # stdlib parser unit: 2 documents, http headers stripped, ids stable
    docs = parse_warc_records(blob)
    assert [d["record_id"] for d in docs] == ["<urn:uuid:r1>", "<urn:uuid:r2>"]
    assert docs[0]["text"].encode() == html
    assert docs[1]["text"] == plain.decode()
    assert parse_warc_records(gzip.compress(blob)) == docs

    d = tmp_path / "warc_in"
    d.mkdir()
    (d / "a.warc").write_bytes(blob)
    (d / "b.warc.gz").write_bytes(gzip.compress(blob))
    got = read_documents_warc(spark, str(d)).collect()
    assert len(got) == 4  # 2 docs x 2 files
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)
    assert set(by_url) == {"http://a.example/x", "http://b.example/y"}

    # strip_html column op vs a python reference
    df = spark.createDataFrame([(1, html.decode())], "doc_id bigint, text string")
    got_txt = df.select(strip_html(F.col("text")).alias("t")).collect()[0]["t"]

    s = html.decode()
    s = _re.sub(r"(?is)<script[^>]*>.*?</script>", " ", s)
    s = _re.sub(r"(?is)<style[^>]*>.*?</style>", " ", s)
    s = _re.sub(r"(?s)<!--.*?-->", " ", s)
    s = _re.sub(r"<[^>]*>", " ", s)
    for ent, repl in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                      ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        s = s.replace(ent, repl)
    s = _re.sub(r"\s+", " ", s).strip()
    assert got_txt == s
    assert got_txt == "Hello & welcome line one line two <tag>"


def test_warc_to_curated_corpus_end_to_end(spark, tmp_path):
    """Crawl-to-corpus integration: WARC files -> read_documents_warc ->
    strip_html -> C4 filter + exact dedup. The duplicate page keeps one
    survivor, the junk page fails the quality gate, and the clean pages
    arrive as plain text."""
    from graphchidb_scala_spark.functions.text import filter_documents, strip_html
    from graphchidb_scala_spark.sources.warc import read_documents_warc

    page = (
        "<html><body><p>"
        + " ".join(f"clean readable sentence number {i} with plenty of words" for i in range(3))
        + "</p></body></html>"
    )
    junk = "<html><body>!!! ??? *** !!!</body></html>"
    recs = [
        ("response", "<urn:uuid:p1>", "http://a/1", page.encode(), True),
        ("response", "<urn:uuid:p2>", "http://a/2", page.encode(), True),  # dup
        ("response", "<urn:uuid:p3>", "http://a/3", junk.encode(), True),
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "crawl-00000.warc").write_bytes(_make_warc(recs))
    docs = read_documents_warc(spark, str(d)).select(
        "doc_id", "url", strip_html(F.col("text")).alias("text")
    )
    kept = filter_documents(docs, min_tokens=5, min_quality=0.3, langs=None)
    rows = kept.collect()
    assert len(rows) == 1  # one survivor of the dup pair; junk gated out
    assert rows[0]["text"].startswith("clean readable sentence number 0")
    assert "<" not in rows[0]["text"]


def test_warc_lf_only_record_with_crlf_in_payload():
    """Framing regression: an LF-only record whose HTTP payload contains a
    CRLF blank line must frame on the NEARER separator (the LF header end),
    not the first CRLF anywhere in the buffer."""
    from graphchidb_scala_spark.sources.warc import parse_warc_records

    body = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\npayload with\r\n\r\ncrlf inside"
    hdr = b"\n".join([
        b"WARC/1.0", b"WARC-Type: response", b"WARC-Record-ID: <urn:uuid:x>",
        b"WARC-Target-URI: http://e/x",
        b"Content-Length: " + str(len(body)).encode(),
    ])
    docs = parse_warc_records(hdr + b"\n\n" + body + b"\n\n")
    assert len(docs) == 1
    assert docs[0]["text"] == "payload with\r\n\r\ncrlf inside"
