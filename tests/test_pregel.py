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
