"""GraphDB core ops — invariants mirror the reference's unit tests
(TestEdgeBuffer.scala:26-101: out-degree=4, wrong-type queries empty, column
invariants on every returned row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphchidb_scala_spark.db import GraphDB, MAX_EDGE_TYPE


def test_query_out_degree_and_columns(chain_db):
    for src in (0, 123, 999):
        rows = chain_db.query_out(src, etype=5).collect()
        assert len(rows) == 4  # TestEdgeBuffer invariant: out-degree 4
        for r in rows:
            assert r["col2"] == (r["src"] + r["dst"]) % 10000
            assert r["col3"] == (r["src"] - r["dst"]) % 333


def test_query_wrong_type_returns_empty(chain_db):
    assert chain_db.query_out(500, etype=3).count() == 0
    assert chain_db.query_in(500, etype=3).count() == 0


def test_query_type_wildcard(chain_db):
    # etype=None is the ignoreType wildcard (QueryShard.java:322)
    assert chain_db.query_out(0, etype=None).count() == 5  # 4 type-5 + 1 type-0


def test_query_in(chain_db):
    rows = chain_db.query_in(10, etype=5).collect()
    assert sorted(r["src"] for r in rows) == [6, 7, 8, 9]


def test_query_out_multiple_list_and_df(chain_db, spark):
    got = chain_db.query_out_multiple([1, 2, 3], etype=5)
    assert got.count() == 12
    fr = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    got_df = chain_db.query_out_multiple(fr, etype=5)
    assert got_df.count() == 12


def test_find_update_delete_edge(chain_db):
    assert chain_db.edge_exists(5, 10, 11)
    assert not chain_db.edge_exists(5, 10, 999)

    g2 = chain_db.update_edge(5, 10, 11, "col2", 77777)
    assert g2.get_edge_value(5, 10, 11, "col2").collect()[0][0] == 77777
    # other edges untouched
    assert g2.get_edge_value(5, 10, 12, "col2").collect()[0][0] == 22

    g3 = chain_db.delete_edge(5, 10, 11)
    assert not g3.edge_exists(5, 10, 11)
    assert g3.query_out(10, etype=5).count() == 3


def test_delete_vertex(chain_db):
    g2 = chain_db.delete_vertex(10)
    assert g2.query_out(10).count() == 0
    assert g2.query_in(10).count() == 0
    # edges not touching 10 survive
    assert g2.edge_exists(5, 20, 21)


def test_add_edges_upsert(chain_db, spark):
    new = spark.createDataFrame(
        [(5, 10, 11, "z", 1, 1), (5, 9000, 9001, "n", 2, 2)],
        "etype int, src bigint, dst bigint, col1 string, col2 int, col3 int",
    )
    g2 = chain_db.add_edges(new)
    # key discipline: re-added key replaced, not duplicated
    assert g2.find_edge(5, 10, 11).count() == 1
    assert g2.get_edge_value(5, 10, 11, "col1").collect()[0][0] == "z"
    assert g2.edge_exists(5, 9000, 9001)
    assert g2.num_edges() == chain_db.num_edges() + 1


def test_degrees(chain_db):
    deg = {r["id"]: (r["in_deg"], r["out_deg"]) for r in chain_db.degrees(etype=5).collect()}
    assert deg[0] == (0, 4)
    # vertex 10: in-edges from 6..9, out to 11..14
    assert deg[10] == (4, 4)


def test_counts(chain_db):
    assert chain_db.num_edges() == 4100
    # vertices derived from endpoints
    assert chain_db.num_vertices() > 1000


def test_induced_subgraph(chain_db):
    sub = chain_db.induced_subgraph([0, 1, 2, 3], etype=5)
    got = sorted((r["src"], r["dst"]) for r in sub.collect())
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_edge_type_validation(chain_db):
    with pytest.raises(ValueError):
        chain_db.query_out(0, etype=15)  # 0xf reserved
    with pytest.raises(ValueError):
        chain_db.update_edge(99, 0, 1, "col2", 0)


def test_random_vertex_deterministic(chain_db):
    a = chain_db.random_vertex(seed=7).collect()[0][0]
    b = chain_db.random_vertex(seed=7).collect()[0][0]
    assert a == b


def test_join_vertex_columns(social_db, spark):
    verts = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(500)], "id bigint, name string"
    )
    db = social_db.with_vertices(verts)
    out = db.query_out(1, etype=0)
    joined = db.join_vertex_columns(out, ["name"], on="dst")
    rows = joined.collect()
    assert all(r["name"] == f"name_{r['dst']}" for r in rows)


def test_add_edges_autofill_defaults(spark):
    """autoFillEdge parity: NULL (or missing) property columns on upserted
    edges receive the computed default; provided values are preserved and the
    base rows are untouched."""
    from graphchidb_scala_spark.db import GraphDB

    edges = spark.createDataFrame(
        [(0, 1, 2, 10.0), (0, 2, 3, 20.0)],
        "etype int, src bigint, dst bigint, weight double",
    )
    g = GraphDB(edges)
    batch = spark.createDataFrame(
        [(0, 5, 6, None), (0, 7, 8, 99.0), (0, 1, 2, None)],
        "etype int, src bigint, dst bigint, weight double",
    )
    g2 = g.add_edges(
        batch, defaults={"weight": (F.col("src") + F.col("dst")).cast("double")}
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert got[(5, 6)] == 11.0       # NULL filled with computed default
    assert got[(7, 8)] == 99.0       # provided value preserved
    assert got[(1, 2)] == 3.0        # upsert replaced base row, then filled
    assert got[(2, 3)] == 20.0       # untouched base row


def test_add_vertices_autofill_defaults(spark):
    """autoFillVertex parity (ConnectedComponentsLabelProp.scala:43-44 inits
    labels from the id; MovieDatabase.scala:76-77 derives type from id range):
    missing column materialized, NULLs filled from an id-derived expression."""
    from graphchidb_scala_spark.db import GraphDB

    edges = spark.createDataFrame(
        [(0, 1, 2)], "etype int, src bigint, dst bigint"
    )
    verts = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    g = GraphDB(edges, verts)
    batch = spark.createDataFrame([(3,), (4,)], "id bigint")  # no name column
    g2 = g.add_vertices(
        batch, defaults={"name": F.concat(F.lit("v"), F.col("id"))}
    )
    got = {r["id"]: r["name"] for r in g2.vertices.collect()}
    assert got == {1: "a", 2: "b", 3: "v3", 4: "v4"}


def test_categorical_dictionary_roundtrip(spark):
    """Column.scala:228-242 parity: deterministic dense codes in value sort
    order; encode→decode roundtrips; unseen values/codes map to NULL."""
    from graphchidb_scala_spark.db import (
        categorical_decode,
        categorical_dictionary,
        categorical_encode,
    )

    df = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "red"), (4, "green"), (5, None)],
        "id bigint, color string",
    )
    d = categorical_dictionary(df, "color")
    assert [(r["value"], r["code"]) for r in d.orderBy("code").collect()] == [
        ("blue", 0), ("green", 1), ("red", 2),
    ]
    enc = categorical_encode(df, "color", d)
    got = {r["id"]: r["color_code"] for r in enc.collect()}
    assert got == {1: 2, 2: 0, 3: 2, 4: 1, 5: None}
    dec = categorical_decode(enc, "color_code", d, out_col="color")
    back = {r["id"]: r["color"] for r in dec.collect()}
    assert back == {1: "red", 2: "blue", 3: "red", 4: "green", 5: None}
    # a value outside a supplied dictionary encodes as NULL
    df2 = spark.createDataFrame([(9, "violet")], "id bigint, color string")
    assert categorical_encode(df2, "color", d).collect()[0]["color_code"] is None
    # self-built dictionary path (no dictionary arg)
    auto = categorical_encode(df, "color")
    assert {r["id"]: r["color_code"] for r in auto.collect()} == got


def test_categorical_dictionary_cardinality_guard(spark):
    """The K ≪ N contract is enforced: a high-cardinality column raises
    (naming the column) instead of funnelling the distinct set through the
    single-partition rank window; the threshold is user-adjustable."""
    import pytest

    from graphchidb_scala_spark.db import categorical_dictionary

    df = spark.range(0, 50).selectExpr("CAST(id AS STRING) AS val")
    with pytest.raises(ValueError, match="val"):
        categorical_dictionary(df, "val", max_cardinality=10)
    # at/under the threshold it builds normally
    d = categorical_dictionary(df, "val", max_cardinality=50)
    assert d.count() == 50
