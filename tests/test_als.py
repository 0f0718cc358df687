"""Correctness gate for the ALS family — the only SURVEY §2 capability with
no driver oracle (`als_recommend`/`als_rmse` are rows-only by policy, since
iterative factorization is not SQL-expressible). The reference validates its
ALS the same way these tests do: RMSE on the training ratings trending down
with iterations (ALSMatrixFactorization.scala:204-223) and top-k
recommendation recovery for a known user (MovieDatabase.scala:155-162).

Fixture: a planted low-rank ratings matrix — rating(u, i) = 5 when
u ≡ i (mod 3) else 1, an exactly rank-3-representable block structure — so a
rank-6 model must fit it nearly perfectly and the top recommendations for any
user are exactly the planted high-rating items.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphchidb_scala_spark.operators import als

N_USERS, N_ITEMS = 30, 18


@pytest.fixture(scope="module")
def ratings(spark):
    rows = [
        (u, i, 5.0 if u % 3 == i % 3 else 1.0)
        for u in range(N_USERS)
        for i in range(N_ITEMS)
    ]
    return spark.createDataFrame(rows, "src bigint, dst bigint, rating double")


@pytest.fixture(scope="module")
def model(ratings):
    return als.train_als(ratings, rank=6, max_iter=10, seed=42)


def test_als_rmse_fits_planted_low_rank(model, ratings):
    err = als.rmse(model, ratings)
    assert err < 0.5, f"rank-6 ALS should fit a rank-3 matrix; rmse={err}"


def test_als_rmse_improves_with_iterations(model, ratings):
    # the reference's own validation signal: RMSE after more sweeps is no
    # worse than after one (ALSMatrixFactorization.scala:204-223 logs the
    # trend per iteration)
    weak = als.train_als(ratings, rank=6, max_iter=1, seed=42)
    assert als.rmse(model, ratings) <= als.rmse(weak, ratings) + 1e-6


def test_als_predict_ratings_separates_planted_classes(model, ratings):
    pairs = ratings.select("src", "dst")
    pred = als.predict_ratings(model, pairs)
    got = {(r["src"], r["dst"]): r["prediction"] for r in pred.collect()}
    assert len(got) == N_USERS * N_ITEMS  # coldStart=drop must drop nothing
    # every planted-high pair must predict above every planted-low pair
    high = [p for (u, i), p in got.items() if u % 3 == i % 3]
    low = [p for (u, i), p in got.items() if u % 3 != i % 3]
    assert min(high) > max(low)


def test_als_recommend_recovers_planted_top_items(model):
    # user 0's planted favorites are the items ≡ 0 (mod 3): 6 of 18 items
    recs = als.recommend_for_user(model, user=0, k=6)
    top = [r["id"] for r in recs.orderBy(F.desc("score"), "id").collect()]
    assert len(top) == 6
    assert all(i % 3 == 0 for i in top), f"planted favorites not recovered: {top}"
