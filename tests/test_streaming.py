"""Online ingest parity: insert-immediately-visible (README.md:226-229),
newest-wins upsert, compaction preserves the edge set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphchidb_scala_spark.streaming.ingest import EdgeStore


@pytest.fixture()
def store(spark, tmp_path):
    st = EdgeStore(spark, str(tmp_path / "edgestore"), num_buckets=4)
    base = spark.createDataFrame(
        [(0, 1, 2, 1.0), (0, 1, 3, 1.0), (0, 2, 3, 1.0)],
        "etype int, src bigint, dst bigint, weight double",
    )
    st.init_base(base)
    return st


def test_insert_immediately_visible(store, spark):
    batch = spark.createDataFrame([(0, 5, 6, 2.0)], "etype int, src bigint, dst bigint, weight double")
    store.add_batch(batch)
    g = store.graph()
    assert g.edge_exists(0, 5, 6)
    assert g.num_edges() == 4


def test_newest_version_wins(store, spark):
    b1 = spark.createDataFrame([(0, 1, 2, 9.0)], "etype int, src bigint, dst bigint, weight double")
    store.add_batch(b1)
    val = store.graph().get_edge_value(0, 1, 2, "weight").collect()[0][0]
    assert val == 9.0
    b2 = spark.createDataFrame([(0, 1, 2, 11.0)], "etype int, src bigint, dst bigint, weight double")
    store.add_batch(b2)
    val = store.graph().get_edge_value(0, 1, 2, "weight").collect()[0][0]
    assert val == 11.0


def test_compaction_preserves_edges(store, spark):
    b1 = spark.createDataFrame(
        [(0, 1, 2, 9.0), (0, 7, 8, 3.0)], "etype int, src bigint, dst bigint, weight double"
    )
    store.add_batch(b1)
    before = sorted(tuple(r) for r in store.edges().collect())
    store.compact()
    after = sorted(tuple(r) for r in store.edges().collect())
    assert before == after
    # appends dir folded away
    assert not EdgeStore._exists(store.appends_dir)


def test_stream_from_events(store, spark, tmp_path):
    from graphchidb_scala_spark.streaming.ingest import stream_edges_from_events

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    spark.createDataFrame(
        [(100, 200), (101, 201)], "user_id bigint, event_id bigint"
    ).write.json(str(src_dir / "b0"))
    stream = spark.readStream.schema("user_id bigint, event_id bigint").json(
        str(src_dir / "b0")
    )
    q = stream_edges_from_events(stream, store, etype=1)
    q.awaitTermination(60)
    g = store.graph()
    assert g.edge_exists(1, 100, 200)
    assert g.edge_exists(1, 101, 201)
