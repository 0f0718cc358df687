"""Property-based tests (hypothesis): Spark operators vs pure-Python models
on randomized inputs. Few examples, small inputs — each example runs Spark
jobs; the value is randomized coverage of edge cases (hot shingles, empty
docs, self-loops, disconnected vertices), not volume."""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from graphchidb_scala_spark.db import GraphDB
from graphchidb_scala_spark.functions import dedup
from graphchidb_scala_spark.operators.frontier import Frontier

PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_ngram_jaccard_matches_bruteforce(spark, seed):
    """Prefix-filtered exact Jaccard == brute-force all-pairs on random docs
    over a tiny alphabet (forces shared/hot shingles)."""
    rng = random.Random(seed)
    k, tau = 3, 0.4
    docs = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 12))))
        for i in range(12)
    ]

    def shingles(t):
        return {t[j : j + k] for j in range(max(len(t) - k + 1, 0))}

    want = {}
    for i, ta in docs:
        for j, tb in docs:
            if i >= j:
                continue
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if round(jac, 4) >= tau:
                want[(i, j)] = round(jac, 4)

    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, k=k, threshold=tau).collect()
    }
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_frontier_traversal_matches_set_model(spark, seed):
    rng = random.Random(seed)
    n = 15
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(30)}
    df = spark.createDataFrame(
        [(0, s, d) for s, d in edges], "etype int, src bigint, dst bigint"
    )
    g = GraphDB(df)
    seeds = sorted(rng.sample(range(n), 3))
    fr = Frontier.of(g, seeds)

    # one traversal hop == set-model successor union
    model_hop = {d for s, d in edges if s in set(seeds)}
    hop = fr.traverse_out(etype=0)
    assert {r["id"] for r in hop.ids.collect()} == model_hop

    # set algebra round-trip: (hop ∪ seeds) − seeds == hop − seeds
    seeds_fr = Frontier.of(g, seeds)
    lhs = hop.union(seeds_fr).remove(seeds_fr)
    assert {r["id"] for r in lhs.ids.collect()} == model_hop - set(seeds)

    # select_out counts paths, not just reachability
    from collections import Counter

    cnt = Counter(d for s, d in edges if s in set(seeds))
    got = {r["id"]: r["cnt"] for r in fr.select_out(etype=0).collect()}
    assert got == dict(cnt)


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_connected_components_matches_union_find(spark, seed):
    rng = random.Random(seed)
    n = 20
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(15)}
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    # only vertices that appear in the edge set exist in the derived graph
    present = {v for e in edges for v in e}
    want = {
        v: min(u for u in present if find(u) == find(v)) for v in present
    }

    from graphchidb_scala_spark.operators import pregel

    df = spark.createDataFrame(
        [(0, s, d) for s, d in edges], "etype int, src bigint, dst bigint"
    )
    got = {
        r["id"]: r["cc"]
        for r in pregel.connected_components(GraphDB(df)).collect()
    }
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_members_verify_equals_pairs_cc_on_random_corpora(spark, seed):
    """The r8 equivalence claim, property-tested: minhash_cluster_members
    (verify=True, one repair pass) partitions documents exactly as the
    pair path (minhash_lsh_exact_pairs -> near_duplicate_clusters), on
    random template corpora with planted dup groups and noise docs."""
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    did = 0
    for g in range(rng.randint(2, 4)):
        base = " ".join(rng.choices(words, k=rng.randint(8, 14)))
        for r in range(rng.randint(1, 4)):
            txt = base + (" tail" if r % 2 else "")
            rows.append((did, txt))
            did += 1
    for _ in range(rng.randint(1, 3)):
        rows.append((did, " ".join(rng.choices(words, k=rng.randint(3, 6)))))
        did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.minhash_lsh_exact_pairs(df, threshold=0.5).select("id_a", "id_b")
    cc = {
        r["id"]: r["cluster"]
        for r in dedup.near_duplicate_clusters(pairs).collect()
    }
    want = {i: cc.get(i, i) for i, _ in rows}
    got = {
        r["id"]: r["cluster"]
        for r in dedup.minhash_cluster_members(
            df, threshold=0.5, verify=True
        ).collect()
    }
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_bucket_local_compact_equals_model_on_random_op_sequences(spark, seed, tmp_path_factory):
    """EdgeStore under random add/delete/compact sequences == a plain dict
    model keyed by (etype, src, dst) — with the r9 bucket-local compaction
    taking its dirty-subset path whenever the appends touch a strict
    bucket subset. Every read between ops must agree with the model."""
    import random as _random

    from graphchidb_scala_spark.streaming.ingest import EdgeStore

    rng = _random.Random(seed)
    path = str(tmp_path_factory.mktemp("prop_store") / f"s{seed % 100000}")
    st_ = EdgeStore(spark, path, num_buckets=4)
    model: dict[tuple, float] = {}
    base_rows = [(0, rng.randrange(8), rng.randrange(8) + 10, float(i)) for i in range(6)]
    for e, s, d, w in base_rows:
        model[(e, s, d)] = w  # later init rows win in the model...
    # ...but init_base dedupes nothing: keep last-write-wins consistent by
    # deduping the init batch itself
    base_rows = [(e, s, d, model[(e, s, d)]) for (e, s, d) in model]
    st_.init_base(
        spark.createDataFrame(base_rows, "etype int, src bigint, dst bigint, weight double")
    )
    for _ in range(rng.randint(2, 4)):
        op = rng.choice(["add", "delete", "compact"])
        if op == "add":
            rows = [
                (0, rng.randrange(8), rng.randrange(8) + 10, float(rng.randrange(100)))
                for _ in range(rng.randint(1, 3))
            ]
            # within one batch the newest-wins window breaks version ties by
            # key order nondeterministically — dedupe the batch like a real
            # producer would
            dedup_rows = {}
            for e, s, d, w in rows:
                dedup_rows[(e, s, d)] = w
            rows = [(e, s, d, w) for (e, s, d), w in dedup_rows.items()]
            st_.add_batch(
                spark.createDataFrame(rows, "etype int, src bigint, dst bigint, weight double")
            )
            model.update({(e, s, d): w for e, s, d, w in rows})
        elif op == "delete":
            if model:
                k = rng.choice(sorted(model))
                st_.delete_batch(spark.createDataFrame([k], "etype int, src bigint, dst bigint"))
                model.pop(k)
        else:
            st_.compact()  # bucket-local whenever dirty ⊂ buckets
        got = {
            (r["etype"], r["src"], r["dst"]): r["weight"]
            for r in st_.edges().collect()
        }
        assert got == model
    st_.compact()
    got = {(r["etype"], r["src"], r["dst"]): r["weight"] for r in st_.edges().collect()}
    assert got == model


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_neardup_index_screen_matches_python_bucket_model(spark, seed, tmp_path_factory):
    """screen_neardup_index == a pure-Python reimplementation of the
    portable banding (md5-60 shingle hash -> (2i+1)h+7919i mod 2^31-1
    permutations -> min per doc -> band strings -> min colliding ref id)
    on random template corpora: every verdict and every dup_of id exact."""
    import hashlib
    import random as _random

    from graphchidb_scala_spark.functions.dedup import (
        save_neardup_index,
        screen_neardup_index,
    )

    P = 2_147_483_647
    NH, BANDS, K = 64, 32, 5
    rpb = NH // BANDS

    def buckets(text):
        sh = {text[i:i + K] for i in range(max(len(text) - K + 1, 0))}
        if not sh:
            return set()
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P for g in sh]
        sig = [min(((2 * i + 1) * h + 7919 * i) % P for h in hs) for i in range(NH)]
        return {
            ",".join([str(b)] + [str(sig[b * rpb + r]) for r in range(rpb)])
            for b in range(BANDS)
        }

    rng = _random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    ref_rows, new_rows = [], []
    did = 0
    for _ in range(rng.randint(2, 4)):
        t = " ".join(rng.choices(words, k=rng.randint(6, 12)))
        ref_rows.append((did, t)); did += 1
        if rng.random() < 0.7:  # a near/exact copy lands in the new side
            new_rows.append((did, t + (" tail" if rng.random() < 0.5 else "")))
            did += 1
    for _ in range(rng.randint(1, 3)):
        new_rows.append((did, " ".join(rng.choices(words, k=rng.randint(2, 6)))))
        did += 1
    ref = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    new = spark.createDataFrame(new_rows, "doc_id bigint, text string")
    path = str(tmp_path_factory.mktemp("nd_prop") / f"i{seed % 100000}")
    save_neardup_index(ref, path)
    got = {r["id"]: r["dup_of"] for r in screen_neardup_index(new, path).collect()}

    ref_bk = {i: buckets(t) for i, t in ref_rows}
    want = {}
    for i, t in new_rows:
        bk = buckets(t)
        hits = [rid for rid, rbk in ref_bk.items() if bk & rbk]
        if hits:
            want[i] = min(hits)
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_containment_members_equals_pairs_cc_on_random_corpora(spark, seed):
    """The r9 equivalence claim, property-tested: containment_cluster_members
    (verified stars + one crossing-only repair pass) partitions documents
    exactly as the pair path (ngram_containment_pairs -> CC), on random
    template corpora mixing full replicas, contained quotes, and noise."""
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    did = 0
    for g in range(rng.randint(2, 4)):
        quote = " ".join(rng.choices(words, k=rng.randint(8, 14)))
        for r in range(rng.randint(1, 4)):
            # containers: quote embedded in per-doc filler (doc-in-doc),
            # plus plain replicas with a small tail tweak
            if r % 2:
                txt = (
                    " ".join(rng.choices(words, k=rng.randint(2, 4)))
                    + " " + quote + " " + quote
                )
            else:
                txt = quote + (" tail" if r % 2 == 0 and r else "")
            rows.append((did, txt))
            did += 1
    for _ in range(rng.randint(1, 3)):
        rows.append((did, " ".join(rng.choices(words, k=rng.randint(3, 6)))))
        did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = dedup.ngram_containment_pairs(df, k=5, threshold=0.8).select(
        "id_a", "id_b"
    )
    cc = {
        r["id"]: r["cluster"]
        for r in dedup.near_duplicate_clusters(pairs).collect()
    }
    want = {i: cc.get(i, i) for i, _ in rows}
    got = {
        r["id"]: r["cluster"]
        for r in dedup.containment_cluster_members(
            df, k=5, threshold=0.8
        ).collect()
    }
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_maximal_matching_matches_greedy_on_random_graphs(spark, seed):
    import hashlib

    rng = random.Random(seed)
    n = 14
    edges = {
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(16))
        if a != b
    }

    def pri(e):
        return int(hashlib.md5(f"42:{e[0]}:{e[1]}".encode()).hexdigest()[:15], 16)

    expect, used = set(), set()
    for e in sorted(edges, key=lambda e: (pri(e), e)):
        if e[0] not in used and e[1] not in used:
            expect.add(e)
            used |= set(e)

    from graphchidb_scala_spark.operators import graph_queries as gq

    df = spark.createDataFrame(
        [(0, a, b) for a, b in edges], "etype int, src bigint, dst bigint"
    )
    got = {
        (r["a"], r["b"]) for r in gq.maximal_matching(GraphDB(df)).collect()
    }
    assert got == expect


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_drop_near_duplicates_matches_union_find(spark, seed):
    """pairs -> CC clustering -> min-id survivor == a pure-Python union-find
    model: survivors are exactly one min-id doc per duplicate cluster plus
    every unpaired doc."""
    rng = random.Random(seed)
    n = 25
    ids = list(range(n))
    pairs = {
        tuple(sorted(rng.sample(ids, 2))) for _ in range(rng.randrange(0, 15))
    }
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    roots = {}
    for v in ids:
        roots.setdefault(find(v), []).append(v)
    want = {min(members) if len(members) > 1 else members[0] for members in roots.values()}

    docs_df = spark.createDataFrame([(i, f"t{i}") for i in ids], "doc_id bigint, text string")
    if pairs:
        pairs_df = spark.createDataFrame(
            [(a, b) for a, b in pairs], "id_a bigint, id_b bigint"
        )
    else:
        pairs_df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {
        r["doc_id"]
        for r in dedup.drop_near_duplicates(docs_df, pairs_df).collect()
    }
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_as_of_latest_matches_python_model(spark, seed):
    """as_of_latest == pure-Python point-in-time lookup on random event
    streams (random users, duplicate timestamps, left events before any
    right event)."""
    import datetime as dt

    from graphchidb_scala_spark.functions import events as ev

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(30):
        rows.append(
            (
                eid,
                rng.randint(0, 3),
                t0 + dt.timedelta(minutes=rng.randint(0, 20)),
                rng.choice(["click", "purchase"]),
                round(rng.uniform(0, 10), 2),
                None,
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, ts timestamp, event_type string, value double, props string",
    )
    # python model: per user, max purchase value per ts; for each click the
    # latest (<= ts) purchase ts's value
    by_user_purchases: dict[int, dict[dt.datetime, float]] = {}
    for eid, uid, ts, et, v, _ in rows:
        if et == "purchase":
            d = by_user_purchases.setdefault(uid, {})
            d[ts] = max(d.get(ts, float("-inf")), v)
    want = {}
    for eid, uid, ts, et, v, _ in rows:
        if et != "click":
            continue
        cand = [(pts, pv) for pts, pv in by_user_purchases.get(uid, {}).items() if pts <= ts]
        want[eid] = round(max(cand)[1], 4) if cand else None
    got = {r["event_id"]: r["asof_value"] for r in ev.as_of_latest(df).collect()}
    assert got == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_pack_sequences_partition_invariants(spark, seed):
    """Offset packing on random corpora: every doc appears exactly once,
    offsets stay within budget, and within each (bucket, pack) the docs
    tile the pack contiguously from offset 0 in hash order."""
    from graphchidb_scala_spark.functions import pipeline

    rng = random.Random(seed)
    budget, nb = rng.choice([8, 16, 32]), rng.choice([2, 4])
    docs = [(i, " ".join("w" for _ in range(rng.randint(0, 9)))) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = pipeline.pack_sequences(df, budget=budget, n_buckets=nb).collect()
    assert sorted(r["doc_id"] for r in got) == [i for i, _ in docs]
    for r in got:
        assert 0 <= r["pack_offset"] < budget
        assert 0 <= r["bucket"] < nb
    # per bucket: global starts (pack_id*budget + pack_offset) are exactly
    # the exclusive prefix sums of n_tokens in (pack, offset) order — docs
    # tile head-to-tail from 0 with no gaps or overlaps
    by_bucket = {}
    for r in got:
        by_bucket.setdefault(r["bucket"], []).append(
            (r["pack_id"] * budget + r["pack_offset"], r["n_tokens"])
        )
    for rows in by_bucket.values():
        rows.sort()
        pos = 0
        for start, n in rows:
            assert start == pos
            pos += n
    # determinism under repartition
    again = pipeline.pack_sequences(df.repartition(5), budget=budget, n_buckets=nb).collect()
    assert {(r["doc_id"], r["bucket"], r["pack_id"], r["pack_offset"]) for r in again} == {
        (r["doc_id"], r["bucket"], r["pack_id"], r["pack_offset"]) for r in got
    }


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_weighted_sample_is_proper_subset_race(spark, seed):
    """weighted_sample == the n smallest -ln(u)/w race keys of the python
    model for random weights; sample of everything returns everything."""
    import hashlib
    import math

    from graphchidb_scala_spark.functions import pipeline

    rng = random.Random(seed)
    rows = [(i, rng.choice([0.5, 1.0, 3.0, 10.0])) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    n = rng.randint(1, 40)
    got = {r["doc_id"] for r in pipeline.weighted_sample(df, "w", n=n).collect()}

    def key(i, w):
        h = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16)
        return -math.log((h + 1) / 2**60) / w

    expect = {i for i, w in sorted(rows, key=lambda t: (key(*t), t[0]))[:n]}
    assert got == expect


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_scrub_pii_idempotent_and_clean(spark, seed):
    """scrub(scrub(x)) == scrub(x), and scrubbed text re-detects zero PII —
    on random text interleaved with random PII instances."""
    from graphchidb_scala_spark.functions import text as textmod

    rng = random.Random(seed)
    words = ["alpha", "beta", "x9", "...", "a.b", "@", "10.2", "555-12"]
    rows = []
    for i in range(10):
        parts = [rng.choice(words) for _ in range(rng.randint(0, 8))]
        if rng.random() < 0.7:
            parts.insert(rng.randint(0, len(parts)), f"u{i}@ex{i}.org")
        if rng.random() < 0.5:
            parts.insert(0, f"10.{i}.0.{rng.randint(0, 255)}")
        if rng.random() < 0.5:
            parts.append(f"{rng.randint(100, 999)}-555-{rng.randint(1000, 9999)}")
        rows.append((i, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = df.select("doc_id", textmod.scrub_pii(F.col("text")).alias("text"))
    twice = once.select("doc_id", textmod.scrub_pii(F.col("text")).alias("text"))
    assert {r["doc_id"]: r["text"] for r in once.collect()} == {
        r["doc_id"]: r["text"] for r in twice.collect()
    }
    recount = once.select(
        *[c.alias(k) for k, c in textmod.pii_counts(F.col("text")).items()]
    ).collect()
    assert all(r["email"] == 0 and r["phone"] == 0 and r["ipv4"] == 0 for r in recount)


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_sliding_window_conserves_events(spark, seed):
    """Every event lands in exactly length/slide hopping windows, so the
    window counts sum to 3x the row count (180/60)."""
    import datetime as dt

    from graphchidb_scala_spark.functions.events import window_agg_sliding

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            rng.choice(["a", "b"]),
            base + dt.timedelta(minutes=rng.randint(0, 5000)),
            1.0,
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, ts timestamp_ntz, value double"
    )
    out = window_agg_sliding(df, 180, 60)
    assert out.agg(F.sum("n_events")).collect()[0][0] == 3 * len(rows)


def test_dsir_weights_zero_when_target_is_background(spark):
    """target == background → every log-ratio is 0 → every doc weight is 0."""
    from graphchidb_scala_spark.functions import pipeline

    rows = [(i, f"tok{i % 5} common text here") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = pipeline.dsir_weights(df, df, buckets=64).collect()
    assert len(w) == 20 and all(r["dsir_weight"] == 0.0 for r in w)


def test_semantic_dedup_idempotent(spark):
    """Dedup of the survivors drops nothing (the survivor set is stable)."""
    import random as _r

    from graphchidb_scala_spark.functions import similarity

    rng = _r.Random(4)
    rows = []
    for i in range(60):
        base = [0.0] * 8
        base[i % 2] = 1.0
        rows.append(
            (i, [v + rng.gauss(0, 0.15) for v in base], i % 2)
        )
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    cb = similarity.ivf_codebook(df)
    s1 = similarity.semantic_dedup(df, threshold=0.98, codebook=cb)
    survivors = df.join(s1.select("vec_id"), "vec_id", "semi")
    s2 = similarity.semantic_dedup(survivors, threshold=0.98, codebook=cb)
    assert {r["vec_id"] for r in s1.collect()} == {r["vec_id"] for r in s2.collect()}


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_bloom_never_false_negative_random_sets(spark, seed):
    """Bloom screens random member/non-member splits: members are ALWAYS
    flagged regardless of set contents, fill rate, or hash collisions."""
    from graphchidb_scala_spark.functions import sketches

    rng = random.Random(seed)
    universe = [f"w{rng.randrange(10_000)}" for _ in range(80)]
    members = sorted(set(universe[:40]))
    df_m = spark.createDataFrame([(v,) for v in members], "v string")
    bits = sketches.bloom_build(df_m, "v", m=1 << 12, k=3)
    probe = spark.createDataFrame([(v, v) for v in members], "key string, v string")
    out = sketches.bloom_probe(probe, ["key"], "v", bits, m=1 << 12, k=3)
    assert out.filter(~F.col("maybe_member")).count() == 0


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_corpus_overlap_matches_exact_minhash_model(spark, seed):
    """j_est equals the pure-Python MinHash estimator over the same hash
    family (not just 'close to true J') — the estimator itself is the
    deterministic contract the oracle hashes."""
    import hashlib

    from graphchidb_scala_spark.functions import sketches

    rng = random.Random(seed)
    a = sorted({f"t{rng.randrange(60)}" for _ in range(40)})
    b = sorted({f"t{rng.randrange(60)}" for _ in range(40)})
    nh = 16

    def h(i, v):
        return int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:15], 16)

    matches = sum(
        1 for i in range(nh) if min(h(i, v) for v in a) == min(h(i, v) for v in b)
    )
    want = round(matches / nh, 4)
    da = spark.createDataFrame([(v,) for v in a], "v string")
    db_ = spark.createDataFrame([(v,) for v in b], "v string")
    row = sketches.corpus_overlap(da, db_, "v", num_hashes=nh, p=12).collect()[0]
    assert row["j_est"] == want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_ktruss_subset_of_kcore_edges_and_nested(spark, seed):
    """Structural invariants on random graphs: (k+1)-truss ⊆ k-truss, and
    every k-truss edge endpoint has ≥ k-1 neighbors within the truss."""
    from graphchidb_scala_spark.operators import graph_queries as gq

    rng = random.Random(seed)
    n = 14
    pairs = sorted(
        {
            (a, b)
            for _ in range(50)
            for a, b in [sorted((rng.randrange(n), rng.randrange(n)))]
            if a != b
        }
    )
    db = GraphDB(
        spark.createDataFrame(
            [(0, a, b) for a, b in pairs], "etype int, src bigint, dst bigint"
        )
    )
    t3 = {(r["x"], r["y"]) for r in gq.k_truss(db, 3).collect()}
    t4 = {(r["x"], r["y"]) for r in gq.k_truss(db, 4).collect()}
    assert t4 <= t3
    for k, truss in ((3, t3), (4, t4)):
        nbrs = {}
        for x, y in truss:
            nbrs.setdefault(x, set()).add(y)
            nbrs.setdefault(y, set()).add(x)
        for v, ns in nbrs.items():
            assert len(ns) >= k - 1


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_progressive_crosscorpus_filter_survivor_parity(spark, seed):
    """The r10 membership claim, property-tested: the progressive
    rank-escalation filter (cross_corpus_dup_members via
    drop_cross_corpus_duplicates(progressive=True)) keeps EXACTLY the
    documents the one-shot pairs-based filter keeps, on random two-corpus
    template sets with planted cross-dup groups, new-side-only dup groups
    (must survive: a transitive new-new link is not a ref partner — the
    over-drop trap a clustering formulation would hit), and noise docs.
    Membership is schedule-independent, so both escalation factors agree."""
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    new_rows, ref_rows = [], []
    did = 0
    # planted cross groups: template appears on both sides
    for _ in range(rng.randint(1, 3)):
        base = " ".join(rng.choices(words, k=rng.randint(8, 14)))
        for r in range(rng.randint(1, 3)):
            new_rows.append((did, base + (" tail" if r % 2 else "")))
            did += 1
        for r in range(rng.randint(1, 3)):
            ref_rows.append((did, base + (" coda" if r % 2 else "")))
            did += 1
    # new-side-only dup group: near-dups of each other, absent from ref
    base = " ".join(rng.choices(words, k=rng.randint(8, 14))) + " unseen marker"
    for r in range(rng.randint(2, 3)):
        new_rows.append((did, base + (" tail" if r % 2 else "")))
        did += 1
    # noise on both sides
    for _ in range(rng.randint(1, 3)):
        new_rows.append((did, " ".join(rng.choices(words, k=rng.randint(3, 6)))))
        did += 1
        ref_rows.append((did, " ".join(rng.choices(words, k=rng.randint(3, 6)))))
        did += 1
    dn = spark.createDataFrame(new_rows, "doc_id bigint, text string")
    dr = spark.createDataFrame(ref_rows, "doc_id bigint, text string")
    want = sorted(
        r["doc_id"]
        for r in dedup.drop_cross_corpus_duplicates(dn, dr, threshold=0.5).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in dedup.drop_cross_corpus_duplicates(
            dn, dr, threshold=0.5, progressive=True
        ).collect()
    )
    assert got == want
    # schedule independence: a different escalation factor, same membership
    got2 = sorted(
        r["id"]
        for r in dedup.cross_corpus_dup_members(
            dn, dr, threshold=0.5, escalation=2
        ).collect()
    )
    dup_want = sorted(set(i for i, _ in new_rows) - set(want))
    assert got2 == dup_want


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_ktruss_delta_peel_equals_recompute(spark, seed):
    """The r10 delta peel == the per-round edge_support recompute it
    replaced, for both the fixpoint and every fixed round count, on random
    graphs dense enough to carry triangles through several peels."""
    from graphchidb_scala_spark.checkpoint import cut_lineage
    from graphchidb_scala_spark.operators import graph_queries as gq

    rng = random.Random(seed)
    n = 12
    pairs = sorted(
        {
            (a, b)
            for _ in range(55)
            for a, b in [sorted((rng.randrange(n), rng.randrange(n)))]
            if a != b
        }
    )
    db = GraphDB(
        spark.createDataFrame(
            [(0, a, b) for a, b in pairs], "etype int, src bigint, dst bigint"
        )
    )

    def recompute_truss(k, rounds):
        cur = gq._canonical_undirected(db._typed(None).select("src", "dst"))
        before = cur.count() if rounds is None else None
        r = 0
        while rounds is None or r < rounds:
            sup = gq.edge_support(cur)
            nxt = cut_lineage(sup.filter(F.col("sup") >= k - 2).select("x", "y"))
            if rounds is None:
                after = nxt.count()
                cur = nxt
                if after == before:
                    break
                before = after
            else:
                cur = nxt
            r += 1
        return sorted((r_["x"], r_["y"]) for r_ in cur.collect())

    for k, rounds in ((3, None), (4, None), (4, 1), (4, 2), (4, 3)):
        want = recompute_truss(k, rounds)
        got = sorted(
            (r_["x"], r_["y"]) for r_ in gq.k_truss(db, k, rounds=rounds).collect()
        )
        assert got == want, (k, rounds)


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_salted_crossing_candidates_enumerate_each_pair_once(spark, seed):
    """salted_label_crossing_candidates == the unsalted brute-force pair
    set, with NO duplicates from the salting (each unordered pair must
    match at exactly one (salt(a), salt(b)) block), on random labeled
    bucket tables with hot buckets."""
    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(8, 25)):
        for b in rng.sample(["b0", "b1", "b2", "hot"], rng.randint(1, 3)):
            rows.append((i, b, i % rng.randint(2, 4)))
    lb = spark.createDataFrame(rows, "id bigint, bkt string, _lbl bigint")
    want = []
    seenb = {}
    for i, b, l in set(rows):
        seenb.setdefault(b, []).append((i, l))
    for b, mem in seenb.items():
        for (i, li) in mem:
            for (j, lj) in mem:
                if i < j and li != lj:
                    want.append((i, j, li, lj))
    # salted (G=3) and degenerate (G=1, the adaptive probe's no-hot-bucket
    # path) must BOTH equal the brute-force set — equality AND multiplicity
    for g in (3, 1):
        got_rows = dedup.salted_label_crossing_candidates(lb, 4, salts=g).collect()
        got = [(r["id_a"], r["id_b"], r["_la"], r["_lb"]) for r in got_rows]
        assert sorted(got) == sorted(want), g


def test_crossing_salt_factor_probe(spark):
    """crossing_salt_factor: G=1 on flat bucket tables, G=salts when one
    bucket's pair mass dominates (both the absolute floor and the 4x
    fair-share criterion must trip)."""
    flat = spark.createDataFrame(
        [(i, f"b{i % 64}", i % 7) for i in range(1024)],
        "id bigint, bkt string, _lbl bigint",
    )
    assert dedup.crossing_salt_factor(flat, 32) == 1
    # one hot bucket of 3000 members (9M pairs > 4M floor) vs a flat tail:
    # fair share is ~9M*4/32 ≈ 1.1M < 9M -> hot
    hot = spark.createDataFrame(
        [(i, "hot", i % 7) for i in range(3000)]
        + [(10_000 + i, f"b{i % 64}", i % 7) for i in range(1024)],
        "id bigint, bkt string, _lbl bigint",
    )
    assert dedup.crossing_salt_factor(hot, 32) == 8
    # big-but-balanced: every bucket the same size -> max² == tot/nbkts,
    # fair-share criterion keeps G=1 even above the absolute floor
    bal = spark.createDataFrame(
        [(b * 10_000 + i, f"b{b}", i % 7) for b in range(32) for i in range(2048)],
        "id bigint, bkt string, _lbl bigint",
    )
    assert dedup.crossing_salt_factor(bal, 32) == 1
    empty = spark.createDataFrame([], "id bigint, bkt string, _lbl bigint")
    assert dedup.crossing_salt_factor(empty, 32) == 1


@PROP
@given(seed=st.integers(0, 2**31 - 1))
def test_bigram_lm_scores_ref_determined_and_grouped_consistency(spark, seed):
    """Two LM invariants on random tiny-vocab corpora: (1) with an explicit
    ref, a document's score depends ONLY on (its text, the ref) — adding or
    removing OTHER scored docs never moves it; (2) grouped mode over a
    single-group corpus equals global mode with the same ref."""
    from graphchidb_scala_spark.functions import text as T

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd"]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6)))

    ref_rows = [(1000 + i, doc(), "en") for i in range(4)]
    core = [(0, doc(), "en"), (1, doc(), "en")]
    extra = [(2, doc(), "en"), (3, doc(), "en")]
    schema = "doc_id bigint, text string, lang string"
    ref = spark.createDataFrame(ref_rows, schema)
    small = spark.createDataFrame(core, schema)
    big = spark.createDataFrame(core + extra, schema)
    s_small = {
        r["doc_id"]: r["lm_xent"]
        for r in T.bigram_lm_scores(small, ref=ref, alpha=0.1).collect()
    }
    s_big = {
        r["doc_id"]: r["lm_xent"]
        for r in T.bigram_lm_scores(big, ref=ref, alpha=0.1).collect()
    }
    for i, _, _ in core:
        assert s_small[i] == s_big[i]
    # grouped(single group, ref=ref) == global(ref=ref)
    s_grouped = {
        r["doc_id"]: r["lm_xent"]
        for r in T.bigram_lm_scores(big, ref=ref, alpha=0.1, group_col="lang").collect()
    }
    s_global = {
        r["doc_id"]: r["lm_xent"]
        for r in T.bigram_lm_scores(big, ref=ref, alpha=0.1).collect()
    }
    assert s_grouped == s_global


@PROP
@given(seed=st.integers(0, 2**31 - 1), share=st.sampled_from([0.02, 0.1, 0.3]))
def test_frequent_items_matches_counter_model(spark, seed, share):
    """Sketch-then-verify frequent items == the pure-Python Counter model on
    random skewed multisets (geometric-ish key draw forces hot keys), across
    a random repartitioning, exact and MG-capped arms."""
    import math
    from collections import Counter

    from graphchidb_scala_spark.functions import sketches

    rng = random.Random(seed)
    vals = []
    for _ in range(rng.randint(1, 400)):
        # skewed draw: small keys vastly more likely
        vals.append(str(min(int(rng.expovariate(0.5)), 30)))
    truth = Counter(vals)
    n = len(vals)
    t = max(1, math.ceil(share * n))
    want = sorted(
        ((k, c) for k, c in truth.items() if c >= t),
        key=lambda kv: (-kv[1], kv[0]),
    )
    df = spark.createDataFrame(
        [(v,) for v in vals], "k string"
    ).repartition(rng.choice([1, 3, 7]))
    got = [(r["k"], r["cnt"]) for r in sketches.frequent_items(df, "k", share).collect()]
    assert got == want
    # capped arm: the universe is ≤ 31 distinct keys, so capacity 64 never
    # evicts (dropped stays 0) and the capped pass is the exact pass —
    # same answer, bit for bit
    got_capped = [
        (r["k"], r["cnt"])
        for r in sketches.frequent_items(df, "k", share, capacity=64).collect()
    ]
    assert got_capped == want
