"""Personalized PageRank vs global PageRank on the social fixture."""


def test_personalized_pagerank_localizes_mass(social_db):
    from graphchidb_scala_spark.operators import pregel as pg

    pr = {r["id"]: r["rank"] for r in pg.personalized_pagerank(social_db, source=1, iterations=8).collect()}
    # seed holds the reset mass; far/unreachable vertices decay toward 0
    assert pr[1] == max(pr.values())
    out1 = {r["dst"] for r in social_db.query_out(1, etype=0).collect()}
    if out1:
        nbr = max(pr[v] for v in out1 if v in pr)
        others = [v for v in pr if v != 1 and v not in out1]
        assert nbr > min(pr[v] for v in others)  # neighborhood outranks the fringe
    # global pagerank differs (uniform reset): strictly more spread
    gp = {r["id"]: r["rank"] for r in pg.pagerank(social_db, iterations=8).collect()}
    assert min(gp.values()) > 0.14  # uniform reset floors everyone near 0.15
    assert min(pr.values()) < 0.01  # personalized reset does not


def test_pagerank_weighted_equal_weights_matches_uniform(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 4)]
    rows = [(0, a, b, 1.0) for a, b in pairs]
    db = GraphDB(
        spark.createDataFrame(rows, "etype int, src bigint, dst bigint, weight double")
    )
    uni = {r["id"]: r["rank"] for r in pregel.pagerank(db, iterations=4).collect()}
    wtd = {
        r["id"]: r["rank"]
        for r in pregel.pagerank_weighted(db, iterations=4).collect()
    }
    assert set(uni) == set(wtd)
    for k in uni:
        assert abs(uni[k] - wtd[k]) < 1e-12


def test_pagerank_weighted_mass_follows_weights(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    # 1 splits 9:1 between 2 and 3 → after one iteration rank(2) > rank(3)
    rows = [(0, 1, 2, 9.0), (0, 1, 3, 1.0)]
    db = GraphDB(
        spark.createDataFrame(rows, "etype int, src bigint, dst bigint, weight double")
    )
    got = {
        r["id"]: r["rank"]
        for r in pregel.pagerank_weighted(db, iterations=1).collect()
    }
    assert abs(got[2] - (0.15 + 0.85 * 0.9)) < 1e-12
    assert abs(got[3] - (0.15 + 0.85 * 0.1)) < 1e-12
    assert abs(got[1] - 0.15) < 1e-12


def test_katz_path_graph_closed_form(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    # path 1→2→3→4, alpha=0.5: katz(v) = sum_k alpha^k · paths_k ending at v
    rows = [(0, 1, 2), (0, 2, 3), (0, 3, 4)]
    db = GraphDB(spark.createDataFrame(rows, "etype int, src bigint, dst bigint"))
    got = {
        r["id"]: r["katz"]
        for r in pregel.katz_centrality(db, iterations=3, alpha=0.5).collect()
    }
    a = 0.5
    want = {1: 0.0, 2: a, 3: a + a**2, 4: a + a**2 + a**3}
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12
