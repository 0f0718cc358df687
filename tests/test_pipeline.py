"""Corpus-assembly pipeline ops (functions/pipeline.py) vs python models."""

import pytest

from graphchidb_scala_spark.functions import pipeline


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "web"),
        (1, "the quick brown fox jumps over a sleepy cat", "web"),
        (2, "completely different words here entirely now", "web"),
        (3, "benchmark question about the quick brown fox jumps", "eval"),
        (4, "short text", "eval"),
        (5, "another unrelated document with its own phrasing", "books"),
        (6, "the lazy dog sleeps all day long quietly", "books"),
        (7, "", "books"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_split_by_hash_deterministic_and_proportional(spark):
    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in pipeline.split_by_hash(df).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in pipeline.split_by_hash(df.repartition(7)).collect()
    }
    assert a == b  # pure function of (id, seed): partitioning-invariant
    frac = {s: sum(1 for v in a.values() if v == s) / len(a) for s in set(a.values())}
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac["val"] - 0.05) < 0.02 and abs(frac["test"] - 0.05) < 0.02
    # a different seed moves rows between splits
    c = {r["doc_id"]: r["split"] for r in pipeline.split_by_hash(df, seed=7).collect()}
    assert a != c
    with pytest.raises(ValueError, match="positive"):
        pipeline.split_by_hash(df, weights={"a": 0.0})


def test_split_by_hash_membership_stable_under_append(spark):
    # the leakage-safety property: adding rows never reassigns existing ids
    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(4000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in pipeline.split_by_hash(small).collect()}
    b = {r["doc_id"]: r["split"] for r in pipeline.split_by_hash(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def _py_shingles(text, k):
    toks = text.strip().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)} if len(toks) >= k else set()


def test_contamination_hits_matches_python_model(docs):
    bench = docs.filter("source = 'eval'")
    corpus = docs.filter("source <> 'eval'")
    got = {r["doc_id"]: r["n_hits"] for r in pipeline.contamination_hits(corpus, bench, k=3).collect()}
    rows = {r["doc_id"]: (r["text"], r["source"]) for r in docs.collect()}
    bsh = set().union(*(_py_shingles(t, 3) for i, (t, s) in rows.items() if s == "eval"))
    exp = {
        i: len(_py_shingles(t, 3) & bsh)
        for i, (t, s) in rows.items()
        if s != "eval" and _py_shingles(t, 3) & bsh
    }
    assert got == exp
    assert got  # the fixture plants at least one contaminated doc


def test_decontaminate_removes_exactly_the_hit_docs(docs):
    bench = docs.filter("source = 'eval'")
    corpus = docs.filter("source <> 'eval'")
    hits = {r["doc_id"] for r in pipeline.contamination_hits(corpus, bench, k=3).collect()}
    kept = {r["doc_id"] for r in pipeline.decontaminate(corpus, bench, k=3).collect()}
    all_ids = {r["doc_id"] for r in corpus.collect()}
    assert kept == all_ids - hits


def test_stratified_sample_exact_counts_and_determinism(docs):
    out = pipeline.stratified_sample(docs, "source", 0.5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # strata sizes: web 3, eval 2, books 3 -> ceil(.5*n) = 2, 1, 2
    assert {s: len(v) for s, v in by_src.items()} == {"web": 2, "eval": 1, "books": 2}
    again = pipeline.stratified_sample(docs, "source", 0.5).collect()
    assert sorted((r["doc_id"]) for r in again) == sorted(r["doc_id"] for r in out)
    # sampled rows are a subset of the input, fraction=1.0 keeps everything
    assert {r["doc_id"] for r in out} <= {r["doc_id"] for r in docs.collect()}
    assert pipeline.stratified_sample(docs, "source", 1.0).count() == docs.count()
    with pytest.raises(ValueError, match="fraction"):
        pipeline.stratified_sample(docs, "source", 0.0)
