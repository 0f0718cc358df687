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


def test_pagerank_warm_start_converges_faster_to_same_fixpoint(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (2, 4), (4, 5), (5, 1)]
    db = GraphDB(
        spark.createDataFrame(
            [(0, a, b) for a, b in pairs], "etype int, src bigint, dst bigint"
        )
    )
    ref = {r["id"]: r["rank"] for r in pregel.pagerank(db, iterations=40).collect()}
    # converged ranks on the same graph seed a 3-iteration warm restart
    prev = pregel.pagerank(db, iterations=40)
    warm = {
        r["id"]: r["rank"]
        for r in pregel.pagerank(db, iterations=3, initial=prev).collect()
    }
    cold = {
        r["id"]: r["rank"]
        for r in pregel.pagerank(db, iterations=3).collect()
    }
    warm_err = max(abs(warm[k] - ref[k]) for k in ref)
    cold_err = max(abs(cold[k] - ref[k]) for k in ref)
    # the 40-iter reference has residual ~0.85^40; warm start stays within
    # it while the 3-iter cold start is orders of magnitude further out
    assert warm_err < 1e-6
    assert cold_err > 100 * warm_err


def test_pagerank_warm_start_new_vertices_enter_cold(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    old = GraphDB(
        spark.createDataFrame(
            [(0, 1, 2), (0, 2, 1)], "etype int, src bigint, dst bigint"
        )
    )
    prev = pregel.pagerank(old, iterations=20)
    # appended edge introduces vertex 3; warm restart must include it
    new = GraphDB(
        spark.createDataFrame(
            [(0, 1, 2), (0, 2, 1), (0, 1, 3)], "etype int, src bigint, dst bigint"
        )
    )
    got = {
        r["id"]: r["rank"]
        for r in pregel.pagerank(new, iterations=10, initial=prev).collect()
    }
    want = {
        r["id"]: r["rank"] for r in pregel.pagerank(new, iterations=10).collect()
    }
    assert set(got) == {1, 2, 3}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_dag_layers_longest_path(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    # diamond with a long arm: longest path to 5 is 1→2→3→4→5 (layer 4)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]
    db = GraphDB(
        spark.createDataFrame(
            [(0, a, b) for a, b in pairs], "etype int, src bigint, dst bigint"
        )
    )
    got = {r["id"]: r["layer"] for r in pregel.dag_layers(db, iterations=6).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_dag_layers_cycle_caps_at_iterations(spark):
    from graphchidb_scala_spark.db import GraphDB
    from graphchidb_scala_spark.operators import pregel

    db = GraphDB(
        spark.createDataFrame(
            [(0, 1, 2), (0, 2, 1)], "etype int, src bigint, dst bigint"
        )
    )
    got = {r["id"]: r["layer"] for r in pregel.dag_layers(db, iterations=3).collect()}
    # on a 2-cycle the layering keeps rising — bounded run caps at iterations
    assert max(got.values()) == 3


def test_ppr_multi_matches_single_seed_on_reachable_set(spark, social_db):
    from graphchidb_scala_spark.operators import pregel

    multi = {
        (r["seed"], r["id"]): round(r["rank"], 9)
        for r in pregel.personalized_pagerank_multi(
            social_db, [1, 2], iterations=4
        ).collect()
    }
    for s in (1, 2):
        single = {
            r["id"]: round(r["rank"], 9)
            for r in pregel.personalized_pagerank(social_db, s, iterations=4).collect()
        }
        mine = {v: x for (sd, v), x in multi.items() if sd == s}
        # multi is sparse: every materialized row matches the dense single-seed
        # value, and every nonzero dense value is materialized
        for v, x in mine.items():
            assert abs(x - single.get(v, 0.0)) < 1e-9
        for v, x in single.items():
            if x > 1e-12:
                assert v in mine
