"""Keyword search (functions/search.py) vs python scoring models."""

import math

import pytest

from graphchidb_scala_spark.functions import search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark window"),
        (1, "merge window merge table row"),
        (2, "completely unrelated words here"),
        (3, "spark merge window spark table"),
        (4, "window"),
        (5, "table row value key"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_scores(rows, terms, mode, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    tf = {(i, w): toks[i].count(w) for i in toks for w in terms if w in toks[i]}
    df = {w: sum(1 for i in toks if (i, w) in tf) for w in terms}
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i in toks:
        s = 0.0
        for w in terms:
            if (i, w) not in tf:
                continue
            if mode == "tfidf":
                s += tf[(i, w)] * math.log((n + 1) / (df[w] + 1))
            else:
                idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * tf[(i, w)] * (k1 + 1) / (
                    tf[(i, w)] + k1 * (1 - b + b * len(toks[i]) / avgdl)
                )
        if s:
            out[i] = round(s, 6)
    return out


def test_tfidf_matches_python(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    terms = ["spark", "merge", "window"]
    got = {r["doc_id"]: r["score"] for r in search.tfidf_search(corpus, terms, k=10).collect()}
    assert got == pytest.approx(_py_scores(rows, terms, "tfidf"))
    # doc 3 mentions all three terms; doc 2 none
    assert 3 in got and 2 not in got
    with pytest.raises(ValueError, match="non-empty"):
        search.tfidf_search(corpus, [], k=5)


def test_bm25_matches_python_and_ranks_sanely(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    terms = ["spark", "merge", "window"]
    got = {r["doc_id"]: r["score"] for r in search.bm25_search(corpus, terms, k=10).collect()}
    assert got == pytest.approx(_py_scores(rows, terms, "bm25"))
    ranked = [r["doc_id"] for r in search.bm25_search(corpus, terms, k=2).collect()]
    assert len(ranked) == 2 and ranked[0] == max(got, key=got.get)


def test_postings_index_matches_live_search(spark, corpus, tmp_path):
    terms = ["spark", "merge", "window"]
    path = str(tmp_path / "pidx")
    search.save_postings_index(corpus, path, n_buckets=8)
    live_t = {(r["doc_id"], r["score"]) for r in search.tfidf_search(corpus, terms, k=10).collect()}
    idx_t = {(r["doc_id"], r["score"]) for r in search.tfidf_search_indexed(spark, path, terms, k=10).collect()}
    assert idx_t == live_t
    live_b = {(r["doc_id"], r["score"]) for r in search.bm25_search(corpus, terms, k=10).collect()}
    idx_b = {(r["doc_id"], r["score"]) for r in search.bm25_search_indexed(spark, path, terms, k=10).collect()}
    assert idx_b == live_b
    with pytest.raises(ValueError, match="non-empty"):
        search.tfidf_search_indexed(spark, path, [], k=5)


def test_hybrid_rrf_fusion_semantics(spark, corpus):
    """RRF vs a python model: ranks from the two retrievers, fused as
    1/(k_rrf+rank) summed over the lists containing the doc; docs in only
    one pool still surface (full-outer semantics)."""
    # embeddings: doc 5 is closest to the query, docs 0/3 match keywords
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.7, 0.7, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.5, 0.0, 0.5]),
        (5, [0.99, 0.1, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    terms = ["spark", "merge", "window"]
    qv = [1.0, 0.05, 0.0]
    got = search.hybrid_search_rrf(
        corpus, emb, terms, qv, k=6, pool=3, k_rrf=60
    ).collect()

    # python model
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    bm = _py_scores(rows, terms, "bm25")
    lex_rank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(bm.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        )
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(dot / (na * nb), 4)

    sims = sorted(((d, cos(v, qv)) for d, v in vecs), key=lambda kv: (-kv[1], kv[0]))
    sem_rank = {d: i + 1 for i, (d, _) in enumerate(sims[:3])}
    expect = {
        d: round(
            (1.0 / (60 + lex_rank[d]) if d in lex_rank else 0.0)
            + (1.0 / (60 + sem_rank[d]) if d in sem_rank else 0.0),
            6,
        )
        for d in set(lex_rank) | set(sem_rank)
    }
    got_map = {r["doc_id"]: r["rrf"] for r in got}
    assert got_map == expect
    # ranks surfaced correctly, nulls for absent-pool docs
    for r in got:
        assert (r["lex_rank"] is None) == (r["doc_id"] not in lex_rank)
        assert (r["sem_rank"] is None) == (r["doc_id"] not in sem_rank)
    # ordering: rrf desc, id asc
    keys = [(-r["rrf"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_append_postings_index_equals_rebuild(spark, corpus, tmp_path):
    """append_postings_index: appended index == full rebuild over the union
    corpus, SCORE-identical for tfidf and bm25 (the meta advance keeps
    idf/avgdl exact); re-delivered docs are idempotent; prior bucket files
    never rewritten."""
    import os

    base = corpus.filter("doc_id <= 3")
    extra_rows = [
        (4, "window"),
        (5, "table row value key"),
        (6, "spark window spark fresh crawl document"),
    ]
    extra = spark.createDataFrame(extra_rows, "doc_id bigint, text string")
    union = base.unionByName(extra)

    grown = str(tmp_path / "idx_grown")
    search.save_postings_index(base, grown, n_buckets=16)
    before = set(spark.read.parquet(f"{grown}/postings").inputFiles())
    assert search.append_postings_index(extra, grown) == 3
    after = set(spark.read.parquet(f"{grown}/postings").inputFiles())
    assert before <= after and len(after) > len(before)
    for f in before:
        assert os.path.exists(f.replace("file:", ""))

    rebuilt = str(tmp_path / "idx_rebuilt")
    search.save_postings_index(union, rebuilt, n_buckets=16)
    terms = ["spark", "merge", "window", "crawl"]
    for fn in (search.tfidf_search_indexed, search.bm25_search_indexed):
        g = {r["doc_id"]: r["score"] for r in fn(spark, grown, terms, k=20).collect()}
        r = {r["doc_id"]: r["score"] for r in fn(spark, rebuilt, terms, k=20).collect()}
        assert g == r and 6 in g

    # idempotent re-delivery: nothing appended, meta unchanged
    assert search.append_postings_index(extra, grown) == 0
    m = spark.read.parquet(f"{grown}/meta").collect()[0]
    assert (m["n_docs"], m["n_buckets"]) == (7, 16)

    # zero-token docs never reach the postings, but the doc LEDGER remembers
    # them: re-delivering an empty doc must not re-inflate n_docs/avgdl
    empty = spark.createDataFrame([(99, "   ")], "doc_id bigint, text string")
    assert search.append_postings_index(empty, grown) == 1
    assert search.append_postings_index(empty, grown) == 0
    m = spark.read.parquet(f"{grown}/meta").collect()[0]
    assert m["n_docs"] == 8
    # and scores still equal a rebuild over the union incl. the empty doc
    rebuilt2 = str(tmp_path / "idx_rebuilt2")
    search.save_postings_index(union.unionByName(empty), rebuilt2, n_buckets=16)
    g = {r["doc_id"]: r["score"]
         for r in search.bm25_search_indexed(spark, grown, terms, k=20).collect()}
    r = {r["doc_id"]: r["score"]
         for r in search.bm25_search_indexed(spark, rebuilt2, terms, k=20).collect()}
    assert g == r


def test_phrase_search_matches_python_and_indexed(spark, corpus, tmp_path):
    """Live codegen phrase scan == pure-Python sliding-window truth ==
    positional-postings probe (incl. an APPENDED index), for plain,
    overlapping-repeat, tail-boundary, and absent phrases."""
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]

    def py_truth(phrase, k=10):
        out = []
        for i, t in rows:
            toks = t.split()
            c = sum(
                1
                for s in range(len(toks) - len(phrase) + 1)
                if toks[s : s + len(phrase)] == phrase
            )
            if c:
                out.append((i, c))
        return sorted(out, key=lambda kv: (-kv[1], kv[0]))[:k]

    idx = str(tmp_path / "pidx")
    search.save_postings_index(corpus.filter("doc_id <= 3"), idx, n_buckets=16)
    assert search.append_postings_index(corpus.filter("doc_id > 3"), idx) == 2
    for phrase in (
        ["spark", "spark"],          # overlapping repeats in doc 0
        ["merge", "window", "merge"],
        ["window"],                  # single-word phrase == term count
        ["spark", "table"],          # tail boundary in doc 3
        ["no", "such", "phrase"],
        ["window", "spark"],
    ):
        want = py_truth(phrase)
        live = [
            (r["doc_id"], r["n_matches"])
            for r in search.phrase_search(corpus, phrase, k=10).collect()
        ]
        probed = [
            (r["doc_id"], r["n_matches"])
            for r in search.phrase_search_indexed(spark, idx, phrase, k=10).collect()
        ]
        assert live == want, phrase
        assert probed == want, phrase


def test_phrase_search_edges_and_legacy_index_raise(spark, tmp_path):
    """Empty/short docs never error under ANSI (try_element_at tail
    lookups), empty-phrase validation, and probing a positions-free legacy
    index raises instead of silently returning nothing."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "a b"), (4, "  a   b  a b  ")],
        "doc_id bigint, text string",
    )
    got = [
        (r["doc_id"], r["n_matches"])
        for r in search.phrase_search(docs, ["a", "b"], k=10).collect()
    ]
    assert got == [(4, 2), (3, 1)]
    with _pytest.raises(ValueError, match="non-empty"):
        search.phrase_search(docs, [])
    idx = str(tmp_path / "legacy")
    search.save_postings_index(docs, idx, n_buckets=8)
    legacy = spark.read.parquet(f"{idx}/postings").drop("pos")
    legacy.write.mode("overwrite").parquet(f"{tmp_path}/legacy2/postings")
    spark.read.parquet(f"{idx}/meta").write.mode("overwrite").parquet(
        f"{tmp_path}/legacy2/meta"
    )
    with _pytest.raises(ValueError, match="positions"):
        search.phrase_search_indexed(spark, f"{tmp_path}/legacy2", ["a", "b"])


def test_proximity_search_matches_python_and_indexed(spark, corpus, tmp_path):
    """NEAR/w live codegen pass == pure-Python window-pair truth ==
    positional-postings probe, incl. same-term queries and slop extremes;
    validation raises on empty terms / slop < 1."""
    import pytest as _pytest

    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]

    def py_truth(a, b, w, k=10):
        out = []
        for i, t in rows:
            toks = t.split()
            c = sum(
                1
                for pa, wa in enumerate(toks)
                if wa == a
                for pb, wb in enumerate(toks)
                if wb == b and pb != pa and abs(pa - pb) <= w
            )
            if c:
                out.append((i, c))
        return sorted(out, key=lambda kv: (-kv[1], kv[0]))[:k]

    idx = str(tmp_path / "nidx")
    search.save_postings_index(corpus, idx, n_buckets=16)
    for a, b, w in (
        ("spark", "window", 1),
        ("spark", "window", 3),
        ("merge", "merge", 2),   # same-term pairs, each counted twice
        ("table", "row", 1),
        ("spark", "absent", 2),
    ):
        want = py_truth(a, b, w)
        live = [
            (r["doc_id"], r["n_pairs"])
            for r in search.proximity_search(corpus, a, b, slop=w, k=10).collect()
        ]
        probed = [
            (r["doc_id"], r["n_pairs"])
            for r in search.proximity_search_indexed(
                spark, idx, a, b, slop=w, k=10
            ).collect()
        ]
        assert live == want, (a, b, w)
        assert probed == want, (a, b, w)
    with _pytest.raises(ValueError, match="slop"):
        search.proximity_search(corpus, "a", "b", slop=0)
    with _pytest.raises(ValueError, match="non-empty"):
        search.proximity_search(corpus, "", "b")
