"""Plan-shape assertions: the scale story must be visible in the physical
plan — pushed filters for point lookups, broadcast joins for small frontiers,
codegen for scalar pipelines. (SURVEY.md §4: these replace the reference's
hand-coded index/sparse-dense machinery.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphchidb_scala_spark import plans
from graphchidb_scala_spark.db import GraphDB
from graphchidb_scala_spark.operators.frontier import Frontier


@pytest.fixture(scope="module")
def parquet_db(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "edges.parquet")
    rows = [(0, i, i + 1, float(i)) for i in range(1000)]
    spark.createDataFrame(rows, "etype int, src bigint, dst bigint, weight double").write.parquet(p)
    return GraphDB(spark.read.parquet(p))


def test_point_lookup_pushes_filters(parquet_db):
    q = parquet_db.find_edge(0, 10, 11)
    pushed = plans.pushed_filters(q)
    assert "src" in pushed and "dst" in pushed and "etype" in pushed


def test_query_out_pushes_src(parquet_db):
    assert "src" in plans.pushed_filters(parquet_db.query_out(42, etype=0))


def test_small_frontier_broadcasts(parquet_db):
    fr = Frontier.of(parquet_db, [1, 2, 3])
    hop = parquet_db.query_out_multiple(fr.ids, etype=0)
    assert plans.uses_broadcast_join(hop)


def test_scan_prunes_columns(parquet_db):
    q = parquet_db.query_out(42, etype=0).select("dst")
    plan = plans.explain_str(q)
    assert "weight" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_codegen_covers_scalar_pipeline(spark):
    from graphchidb_scala_spark.functions import text

    df = spark.createDataFrame([(1, "hello world the and of"),], "doc_id bigint, text string")
    assert plans.wholestage_codegen_spans(text.text_stats(df)) >= 1


def test_repeated_substring_spans_plan_shape(spark):
    """The exact-substring span plan must stay set-oriented: no cartesian
    product, the gram statistics aggregate map-side-combined (partial +
    final HashAggregate pair around its exchange), and the doc scan pruned
    to the two referenced columns."""
    from graphchidb_scala_spark.functions import text

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h x y"), (3, "k l m n o p q r")],
        "doc_id bigint, text string",
    )
    plan = plans.explain_str(text.repeated_substring_spans(df, k=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_band_join_parallelism_pinned(spark):
    """The band self-join input must carry an explicitly-NUMBERED
    repartition on (band, bh): AQE coalesces the bytes-small banded table
    to 1-2 partitions otherwise, and the join's candidate expansion then
    runs near-serially however many cores the session has (the sf1 cliff
    round 7 caught live). A numbered exchange is exempt from coalescing —
    assert it survives into the optimized plan."""
    from graphchidb_scala_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(30)],
        "doc_id bigint, text string",
    )
    pairs = dedup.minhash_lsh_exact_pairs(docs, threshold=0.5)
    plan = plans.explain_str(pairs)
    # the numbered repartition shows as REPARTITION_BY_NUM on the exchange
    assert "REPARTITION_BY_NUM" in plan


def test_members_star_edges_shape(spark):
    """The members-mode star-edge builder must be a single equi-join of the
    bucket table against its per-bucket min (never a bucket self-join —
    that is the Θ(Σ group²) clique expansion members mode exists to avoid)
    and its distinct must carry the NUMBERED repartition (bytes-small AQE
    coalescing trap, same guard as the band joins)."""
    from graphchidb_scala_spark.functions import dedup
    from pyspark.sql import functions as F

    bkts = spark.createDataFrame(
        [(i, f"b{i % 5}") for i in range(30)], "id bigint, bkt string"
    ).select("id", "bkt")
    plan = plans.explain_str(dedup.band_bucket_star_edges(bkts, 8))
    assert "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # star semantics: every non-min member pairs with its bucket min
    rows = {
        (r["id_a"], r["id_b"])
        for r in dedup.band_bucket_star_edges(bkts, 8).collect()
    }
    assert rows == {(i % 5, i) for i in range(30) if i >= 5}


def test_simhash_band_join_parallelism_pinned(spark):
    """Same trap as the MinHash band join, same guard: the banded simhash
    table (id + 3 narrow ints) is bytes-small, so without an explicitly
    NUMBERED repartition AQE coalesces its exchange to 1-2 partitions and
    the chunk self-join's candidate expansion runs near-serially (sf1
    sweep: 500 s pinned at 2 tasks; 160 s after the pin)."""
    from graphchidb_scala_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(30)],
        "doc_id bigint, text string",
    )
    plan = plans.explain_str(dedup.simhash_pairs(docs, max_hamming=8))
    assert "REPARTITION_BY_NUM" in plan


def test_blocked_cosine_join_parallelism_pinned(spark):
    """cosine_pairs_blocked must pin the block-join parallelism: the
    blocked table is a few MB, AQE coalesces it, and the within-block
    quadratic dot-product expansion then runs on 1-2 cores (sf1 sweep:
    embed_neardup 85 s -> 27 s after the pin)."""
    from graphchidb_scala_spark.functions import similarity

    df = spark.createDataFrame(
        [(i, i % 3, [float(i % 5), 1.0, 2.0]) for i in range(30)],
        "vec_id bigint, label int, embedding array<float>",
    )
    plan = plans.explain_str(similarity.cosine_pairs_blocked(df, "label", 0.5))
    assert "REPARTITION_BY_NUM" in plan


def test_hybrid_rrf_pools_are_topk_not_sorts(spark):
    """hybrid_search_rrf's two retriever pools must each end in a global
    top-k (TakeOrderedAndProject), never a full Sort — at 100 TB the pools
    are the only corpus-sized stages and the fusion join must see ≤2·pool
    rows. The tiny fused frames then join broadcast-style (no sort-merge
    over corpus-sized exchanges)."""
    from graphchidb_scala_spark.functions import search

    docs = spark.createDataFrame(
        [(i, f"spark merge window alpha {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    df = search.hybrid_search_rrf(docs, emb, ["spark", "merge"], [1.0, 0.0, 0.0], k=5, pool=10)
    plan = plans.explain_str(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_cluster_balanced_sample_single_shuffle(spark):
    """cluster_balanced_sample must be one map-only assignment projection
    plus exactly ONE exchange (the cell-key window) — cell assignment may
    not join or shuffle, and no second exchange may follow the window."""
    from graphchidb_scala_spark.functions import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    cb = [(0, [0.0, 0.0]), (1, [2.0, 4.0])]
    df = similarity.cluster_balanced_sample(emb, n_per_cell=4, codebook=cb)
    plan = plans.explain_str(df)
    # formatted mode prints each node twice (tree + detail); "Exchange ("
    # matches only the tree line
    assert plan.count("Exchange (") == 1, plan
    assert "Join" not in plan
    # rank-limit pushdown: the per-cell cap must run map-side BEFORE the
    # exchange too (Partial WindowGroupLimit), so at most n rows per cell
    # per input partition ever cross the wire
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_bigram_lm_scores_no_cartesian_and_aqe_friendly(spark):
    """bigram_lm_scores: every model-table join must be an equi-join (the
    only nested-loop allowed is the broadcast 1-row V+1 constant); no
    CartesianProduct anywhere — at 100 TB the vocab/count tables ride
    AQE's broadcast-or-sort-merge choice, never a pair product."""
    from graphchidb_scala_spark.functions import text

    df = spark.createDataFrame(
        [(i, "the cat sat on the mat", "en" if i % 2 else "de") for i in range(30)],
        "doc_id bigint, text string, lang string",
    )
    plan = plans.explain_str(text.bigram_lm_scores(df))
    assert "CartesianProduct" not in plan
    # the single nested-loop node is the broadcast one-row V+1 constant
    # (formatted mode prints each node twice: tree line + detail header)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_cluster_top_terms_map_only_assignment_topk_on_types(spark):
    """cluster_top_terms: cell assignment must stay a map-only projection
    (no join/shuffle to pick a cell), and the per-cell top-k must push its
    rank limit map-side (Partial WindowGroupLimit) so only ~k (cell, term)
    TYPE rows per partition reach the final window exchange."""
    from graphchidb_scala_spark.functions import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 4}") for i in range(40)],
        "doc_id bigint, text string",
    )
    cb = [(0, [0.0, 0.0]), (1, [2.0, 4.0])]
    plan = plans.explain_str(similarity.cluster_top_terms(emb, docs, k=3, codebook=cb))
    assert "CartesianProduct" not in plan
    # one nested-loop node = the broadcast 1-row K constant (each node
    # prints twice in formatted mode)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_hard_negatives_pinned_join_no_cartesian(spark):
    """hard_negatives_ivf inherits knn_graph_ivf's plan contract: ONE
    cell-id equi-join at numbered-repartition-pinned parallelism (AQE
    can't coalesce the candidate-expansion stage onto 2 cores), no
    cartesian, label filter inside the join stage (before the window)."""
    from graphchidb_scala_spark.functions import similarity

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)], i % 2) for i in range(40)],
        "vec_id bigint, embedding array<double>, label int",
    )
    cb = [(0, [0.0, 0.0]), (1, [2.0, 4.0])]
    plan = plans.explain_str(similarity.hard_negatives_ivf(emb, k=3, codebook=cb))
    assert "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
