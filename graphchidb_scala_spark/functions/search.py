"""Keyword search over the document corpus: TF-IDF / BM25 scoring, exact
phrase match, and NEAR/w proximity — live scans and a persisted positional
inverted index.

The retrieval half of a training-data pipeline (find docs matching an eval
query, audit what the corpus says about a topic, build weak labels). Same
design rules as the rest of the repo: whitespace tokenization identical to
``text.token_count``, no rand(), no Python in the hot path, and every score
is a deterministic expression with an exact DuckDB twin.

Scale shape, live tier: the ONLY full pass over the corpus is the token
explode (bag-of-words scoring) or the codegen sliding-window/proximity
match (phrase/NEAR — no explode at all); everything that shuffles is
proportional to matching (doc, term) pairs, not corpus size. Top-k is a
TakeOrderedAndProject — no global sort.

Indexed tier: :func:`save_postings_index` / :func:`append_postings_index`
persist token-bucketed positional postings (partitionBy on the token-hash
bucket, sorted per-(token, doc) position arrays, one-row meta for exact
idf/avgdl). Probes — tfidf, bm25, phrase, NEAR — read only their terms'
bucket directories via partition pruning, so repeated queries never rescan
the corpus; position intersections are bounded by the rarest term's
postings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from graphchidb_scala_spark.functions.text import token_count


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col), F.explode(toks).alias("tok")
    ).filter(F.col("tok") != "")


def term_stats(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) term frequency for the query's terms only —
    DF(id, tok, tf). The term filter sits directly on the exploded tokens,
    before any shuffle, so the aggregate's input is matching pairs only."""
    if not terms:
        raise ValueError("terms must be non-empty")
    return (
        _doc_tokens(docs, id_col, text_col)
        .filter(F.col("tok").isin(*[str(t) for t in terms]))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def tfidf_search(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by TF-IDF against a bag of query terms:
    score(d) = Σ_t tf(t,d) · ln((N+1)/(df(t)+1)) (smoothed idf; natural
    log, portable bit-for-bit). Returns DF(id, score) ordered by
    (score DESC, id ASC), score rounded to 6 for cross-engine hashing.

    N is one count; df(t) aggregates the already-term-filtered pair table;
    the idf side is a handful of rows and broadcast-joins back."""
    n_docs = docs.count()
    pairs = term_stats(docs, terms, id_col, text_col)
    df_t = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.select(
        "tok", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)).alias("idf")
    )
    return (
        pairs.join(F.broadcast(idf), "tok")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def save_postings_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist an inverted index: per-(token, doc) postings written
    ``partitionBy("_tb")`` where ``_tb = md5_hash60(token) % n_buckets`` —
    the text analogue of the IVF vector index (same role as the reference's
    shard skip-index, ShardIndex.java:33-101). A term query reads ONLY its
    terms' bucket directories via partition pruning; the 100 TB corpus is
    scanned exactly once, at build time.

    Each posting row carries (tok, doc_id, tf, dl) — dl duplicated per row
    so BM25 needs no second corpus-sized table at query time. A one-row
    meta sidecar holds (n_docs, sum_dl) so idf/avgdl are exact at probe
    time. Set ``n_buckets`` ≳ cluster cores at scale; one shuffle on the
    bucket key gives one file per bucket."""
    from graphchidb_scala_spark.functions.dedup import md5_hash60

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # id cast to bigint HERE so postings, ledger, and every future
    # append_postings_index batch (which casts the same way) share one
    # parquet physical type — mixed INT32/INT64 doc_id files in the same
    # postings directory break the vectorized reader at probe time.
    lens = docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        token_count(F.col(text_col)).alias("dl"),
        F.col(text_col),
    )
    # positional postings (v2): per-(token, doc) sorted 0-based position
    # arrays ride along with tf — Σ|pos| = dl, so the index grows by one
    # int per token occurrence and phrase queries become position
    # intersections instead of corpus rescans
    postings = (
        lens.select(F.col(id_col), "dl", F.posexplode(toks).alias("pos", "tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok", id_col, "dl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("pos"),
        )
        .withColumn("_tb", F.pmod(md5_hash60(F.col("tok")), F.lit(int(n_buckets))))
    )
    (
        postings.repartition("_tb")
        .write.partitionBy("_tb")
        .mode("overwrite")
        .parquet(f"{path}/postings")
    )
    row = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    docs.sparkSession.createDataFrame(
        [(int(row["n_docs"]), int(row["sum_dl"] or 0), int(n_buckets))],
        "n_docs bigint, sum_dl bigint, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    # (id, dl) ledger: EVERY indexed document, including zero-token ones
    # that never appear in the postings — the append path's idempotency
    # screen (and a cheaper one: 2 narrow columns instead of the postings)
    lens.select(F.col(id_col), "dl").write.mode("overwrite").parquet(
        f"{path}/docs"
    )


def append_postings_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    skip_existing: bool = True,
) -> int:
    """Incrementally grow a persisted inverted index
    (:func:`save_postings_index`) WITHOUT rebuilding: the new documents'
    postings are bucketed with the index's OWN ``n_buckets`` (read from the
    meta sidecar) and ``mode("append")``-ed into their ``_tb`` partition
    directories — prior files never rewritten, probes keep partition
    pruning — and the one-row meta is advanced by the batch's (docs,
    token-length) totals, so idf/avgdl stay EXACT: a probe of the appended
    index returns score-identical results to a full rebuild over the union
    corpus (pytest-pinned). Returns the number of documents appended.

    ``skip_existing=True`` anti-joins the batch against the index's doc
    LEDGER (the narrow (id, dl) sidecar — which, unlike the postings,
    also remembers zero-token documents, so re-delivering an empty doc
    can't re-inflate n_docs/avgdl) — re-delivered documents are
    idempotent; pass ``False`` when the source guarantees unique ids.
    The crawl-loop pattern: `stream_neardup_ingest` accepts survivors →
    this appends them to the search index, one micro-batch at a time.

    Crash window: the three writes (ledger → postings → meta) are not
    atomic. The ledger is written FIRST, so a retry after any mid-append
    failure is screened out by ``skip_existing`` and can never duplicate
    postings (duplicated postings would silently inflate tf/df — the
    worse failure). The residual window is the benign direction: a crash
    between the ledger and postings writes leaves the batch's documents
    ledgered but unsearchable, and a crash before the meta write leaves
    idf/avgdl computed from the pre-batch totals — both under-count,
    neither corrupts existing results; recovery from either is a full
    rebuild via :func:`save_postings_index` over the union corpus."""
    from graphchidb_scala_spark.checkpoint import cut_lineage
    from graphchidb_scala_spark.functions.dedup import md5_hash60

    spark = docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets = int(meta["n_buckets"])
    batch = docs.select(F.col(id_col).cast("bigint").alias(id_col), F.col(text_col))
    if skip_existing:
        batch = batch.join(
            spark.read.parquet(f"{path}/docs").select(id_col),
            id_col,
            "anti",
        )
    batch = cut_lineage(batch)
    lens = batch.select(
        F.col(id_col), token_count(F.col(text_col)).alias("dl"), F.col(text_col)
    )
    row = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_new = int(row["n_docs"])
    if n_new == 0:
        return 0
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    postings = (
        lens.select(F.col(id_col), "dl", F.posexplode(toks).alias("pos", "tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok", id_col, "dl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("pos"),
        )
        .withColumn("_tb", F.pmod(md5_hash60(F.col("tok")), F.lit(n_buckets)))
    )
    # Ledger BEFORE postings: see the crash-window contract in the
    # docstring — a retried batch must be screened out, never re-posted.
    lens.select(F.col(id_col), "dl").write.mode("append").parquet(f"{path}/docs")
    (
        postings.repartition("_tb")
        .write.partitionBy("_tb")
        .mode("append")
        .parquet(f"{path}/postings")
    )
    spark.createDataFrame(
        [
            (
                int(meta["n_docs"]) + n_new,
                int(meta["sum_dl"]) + int(row["sum_dl"] or 0),
                n_buckets,
            )
        ],
        "n_docs bigint, sum_dl bigint, n_buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return n_new


def _probe_postings(spark, path: str, terms: Sequence[str]):
    import hashlib

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    buckets = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % meta["n_buckets"]
            for t in terms
        }
    )
    pairs = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("_tb").isin(buckets))
        .filter(F.col("tok").isin(*[str(t) for t in terms]))
    )
    return meta, pairs


def tfidf_search_indexed(
    spark,
    path: str,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF top-k over a *persisted* postings index
    (:func:`save_postings_index`): bucket selection is driver-side md5
    arithmetic; the ``_tb`` filter is a partition-column predicate, so the
    scan plans only the terms' bucket directories (PartitionFilters,
    plan-asserted) — per-query cost is O(corpus/n_buckets · |terms|) rows
    read, no corpus scan, no tokenization. Result is identical to the live
    :func:`tfidf_search` (same tf/df/N), so the same SQL oracle verifies
    both."""
    if not terms:
        raise ValueError("terms must be non-empty")
    meta, pairs = _probe_postings(spark, path, terms)
    df_t = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.select(
        "tok",
        F.log(F.lit(float(meta["n_docs"] + 1)) / (F.col("df") + 1)).alias("idf"),
    )
    return (
        pairs.join(F.broadcast(idf), "tok")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def bm25_search_indexed(
    spark,
    path: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k over the persisted postings index: dl rides on each
    posting row and (n_docs, sum_dl) come from the meta sidecar, so the
    probe touches nothing but the terms' buckets. Same scores as the live
    :func:`bm25_search` (identical avgdl arithmetic)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    meta, pairs = _probe_postings(spark, path, terms)
    n_docs = meta["n_docs"]
    avgdl = meta["sum_dl"] / meta["n_docs"]
    df_t = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.select(
        "tok",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
    )
    return (
        pairs.join(F.broadcast(idf), "tok")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("idf") * tf * F.lit(float(k1 + 1)) / denom), 6
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def bm25_search(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 (Robertson/Okapi):
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Doc lengths |d| are a pure
    projection; avgdl is one scalar agg. Returns DF(id, score),
    (score DESC, id ASC), rounded to 6.

    The standard ranking function, expressed entirely in Catalyst: the only
    corpus-sized work is the token explode + the length projection."""
    n_docs = docs.count()
    lens = docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("dl")
    )
    # exact integer sum/count, ONE double division: bit-identical to any
    # engine computing sum(dl)/count(*) (a running double `avg` is
    # accumulation-order-dependent and would not hash-match the oracle)
    row = lens.agg(F.sum("dl").alias("s"), F.count(F.lit(1)).alias("c")).collect()[0]
    if not row["s"]:
        raise ValueError("corpus has no tokens")
    avgdl = row["s"] / row["c"]
    pairs = term_stats(docs, terms, id_col, text_col)
    df_t = pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.select(
        "tok",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.lit(avgdl)
    )
    return (
        pairs.join(F.broadcast(idf), "tok")
        .join(lens, id_col)
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("idf") * tf * F.lit(float(k1 + 1)) / denom), 6
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    query_vec: Sequence[float],
    k: int = 10,
    pool: int = 50,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR'09)
    of a BM25 keyword pool and a cosine embedding pool over the same ids
    (``vec_id == doc_id``).  rrf(d) = Σ_lists 1/(k_rrf + rank_list(d)),
    summing only over the lists whose top-``pool`` contains d.  Returns
    DF(id, lex_rank, sem_rank, rrf) ordered by (rrf DESC, id ASC), top-k,
    rrf rounded to 6 for cross-engine hashing.

    Scale shape: each retriever ends in a TakeOrderedAndProject, so
    everything after the two corpus passes operates on ≤2·pool rows — the
    rank windows and the full-outer fusion join run on a driver-sized
    frame no matter the corpus size.  Ranks are assigned over the ROUNDED
    retriever scores (the same 6/4-dp keys the bm25/ann oracles hash on),
    with the id as tie-break, so rank assignment is engine-portable even
    when two pool members tie after rounding."""
    lex = bm25_search(docs, terms, k=pool, id_col=id_col, text_col=text_col)
    # pool-sized frames: a partition-less window over ≤pool rows is fine
    lex_r = lex.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc(id_col)))
        .cast("bigint")
        .alias("lex_rank"),
    )
    # local import: similarity imports nothing from search, no cycle risk
    from graphchidb_scala_spark.functions.similarity import cosine_topk

    sem = cosine_topk(emb, query_vec, k=pool, id_col=vec_id_col, vec_col=vec_col)
    sem_r = sem.select(
        F.col(vec_id_col).cast("bigint").alias(id_col),
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc(vec_id_col)))
        .cast("bigint")
        .alias("sem_rank"),
    )
    fused = lex_r.join(sem_r, id_col, "full_outer")
    contrib = lambda rank: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rank)), F.lit(0.0)
    )
    return (
        fused.select(
            id_col,
            "lex_rank",
            "sem_rank",
            # fixed two-term sum: addition order is literal in the plan,
            # so the double result is bit-identical across engines
            F.round(contrib("lex_rank") + contrib("sem_rank"), 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(int(k))
    )


def phrase_count(text_col, phrase: Sequence[str]):
    """Column: number of occurrences of the exact token ``phrase`` in a
    whitespace-tokenized text — one sliding-window pass entirely inside
    whole-stage codegen (higher-order ``filter`` over a position
    ``sequence``; no UDF, no explode, no shuffle). The k-term conjunction
    unrolls to literal array lookups, so the comparison chain is fixed at
    plan time."""
    words = [str(w) for w in phrase]
    if not words or any(w == "" for w in words):
        raise ValueError("phrase must be non-empty words")
    toks = F.split(F.trim(text_col), r"\s+")

    def _hit(i):
        # try_element_at: past-the-end lookups are NULL (never an ANSI
        # error), so the conjunction simply fails near the text's tail and
        # no explicit size-kk bound is needed
        cond = F.try_element_at(toks, i) == words[0]
        for j in range(1, len(words)):
            cond = cond & (F.try_element_at(toks, i + F.lit(j)) == words[j])
        return cond

    # 1-based start positions; sequence(1, size) is always non-empty and
    # ascending (split never yields a 0-length array)
    return F.size(F.filter(F.sequence(F.lit(1), F.size(toks)), _hit))


def phrase_search(
    docs: DataFrame,
    phrase: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search, unindexed: top-``k`` documents by occurrence
    count of the consecutive-token ``phrase`` — DF(id, n_matches),
    (n_matches DESC, id ASC). One perfectly-parallel corpus scan with the
    whole sliding-window match in codegen (:func:`phrase_count`), then a
    TakeOrdered top-k — no shuffle of anything doc-sized. This is the
    right UNINDEXED plan at any scale; for repeated queries against a
    static corpus, :func:`phrase_search_indexed` probes the positional
    postings instead of rescanning."""
    return (
        docs.select(
            F.col(id_col),
            phrase_count(F.col(text_col), phrase).cast("bigint").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
        .orderBy(F.desc("n_matches"), F.asc(id_col))
        .limit(int(k))
    )


def phrase_search_indexed(
    spark,
    path: str,
    phrase: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search against the persisted positional postings index
    (:func:`save_postings_index` writes per-(token, doc) sorted position
    arrays; requires an index written by this version — probing a
    positions-free legacy index raises). Result is identical to
    :func:`phrase_search` over the indexed corpus.

    Plan (the classic IR positional intersection): partition-pruned read
    of ONLY the phrase terms' bucket directories; the terms are chained by
    ascending document frequency — the RAREST term anchors, so every
    subsequent equi-join's probe side is already bounded by the rarest
    term's postings, not the commonest — with each join on
    (doc, anchor_pos + relative_offset). Occurrences = one count per
    surviving (doc, anchor position). A repeated phrase word reuses the
    same pruned posting rows under a different alias (its positions just
    join at two offsets), costing nothing extra at scan time."""
    words = [str(w) for w in phrase]
    if not words or any(w == "" for w in words):
        raise ValueError("phrase must be non-empty words")
    meta, pairs = _probe_postings(spark, path, sorted(set(words)))
    if "pos" not in pairs.columns:
        raise ValueError(
            "postings index has no positions (built by a pre-positional "
            "version) — rebuild with save_postings_index to phrase-probe"
        )
    # document frequency per term over the pruned rows only (≤ k terms;
    # the collect is k numbers, not data)
    dfreq = {
        r["tok"]: r["df"]
        for r in pairs.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    if any(w not in dfreq for w in set(words)):
        return spark.createDataFrame([], f"{id_col} bigint, n_matches bigint")
    order = sorted(range(len(words)), key=lambda j: (dfreq[words[j]], j))
    anchor = order[0]
    exploded = {
        w: pairs.filter(F.col("tok") == w).select(
            F.col(id_col), F.explode("pos").alias("p")
        )
        for w in set(words)
    }
    cur = exploded[words[anchor]].select(
        F.col(id_col), (F.col("p") - F.lit(anchor)).alias("_start")
    )
    for j in order[1:]:
        nxt = exploded[words[j]].select(
            F.col(id_col), (F.col("p") - F.lit(j)).alias("_start")
        )
        cur = cur.join(nxt, [id_col, "_start"])
    return (
        cur.filter(F.col("_start") >= 0)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
        .orderBy(F.desc("n_matches"), F.asc(id_col))
        .limit(int(k))
    )


def phrase_search_sql(
    table: str, phrase: Sequence[str], k: int = 10, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`phrase_search` / :func:`phrase_search_indexed`
    (1-based list indexing; lambda closes over the token array)."""
    words = [str(w) for w in phrase]
    kk = len(words)
    conj = " AND ".join(
        f"t[i+{j}] = '{w}'" if j else f"t[i] = '{w}'"
        for j, w in enumerate(words)
    )
    return (
        f"WITH tk AS (SELECT {id_col}, regexp_split_to_array(trim(text),"
        " '\\s+') AS t FROM " + table + "),\n"
        f"m AS (SELECT {id_col}, len(list_filter(range(1, len(t) - {kk} + 2),"
        f" i -> {conj})) AS n_matches FROM tk)\n"
        f"SELECT {id_col}, CAST(n_matches AS BIGINT) AS n_matches FROM m "
        f"WHERE n_matches > 0 ORDER BY n_matches DESC, {id_col} LIMIT {int(k)}"
    )


def near_count(text_col, term_a: str, term_b: str, slop: int = 3):
    """Column: number of position pairs (p_a, p_b) with
    ``|p_a − p_b| ≤ slop`` (and p_a ≠ p_b) in a whitespace-tokenized text —
    the classic NEAR/w proximity operator. One pass over the token array
    entirely in codegen: for each ``term_a`` position, count ``term_b``
    positions inside the window (nested higher-order filters, no UDF, no
    explode). ``term_a == term_b`` is allowed (each unordered same-term
    pair then counts twice — symmetric, deterministic)."""
    a, b = str(term_a), str(term_b)
    if not a or not b:
        raise ValueError("terms must be non-empty")
    w = int(slop)
    if w < 1:
        raise ValueError("slop must be >= 1")
    toks = F.split(F.trim(text_col), r"\s+")
    positions = F.sequence(F.lit(1), F.size(toks))

    def _pairs_at(i):
        window = F.filter(
            positions,
            lambda j: (j >= i - w)
            & (j <= i + w)
            & (j != i)
            & (F.try_element_at(toks, j) == b),
        )
        return F.when(F.try_element_at(toks, i) == a, F.size(window)).otherwise(
            F.lit(0)
        )

    return F.aggregate(
        positions, F.lit(0), lambda acc, i: acc + _pairs_at(i)
    )


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    slop: int = 3,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR/w search, unindexed: top-``k`` documents by within-``slop``
    co-occurrence count of two terms — DF(id, n_pairs),
    (n_pairs DESC, id ASC). Same plan shape as :func:`phrase_search`: one
    perfectly-parallel codegen scan, TakeOrdered top-k, nothing doc-sized
    shuffled."""
    return (
        docs.select(
            F.col(id_col),
            near_count(F.col(text_col), term_a, term_b, slop)
            .cast("bigint")
            .alias("n_pairs"),
        )
        .filter(F.col("n_pairs") > 0)
        .orderBy(F.desc("n_pairs"), F.asc(id_col))
        .limit(int(k))
    )


def proximity_search_indexed(
    spark,
    path: str,
    term_a: str,
    term_b: str,
    slop: int = 3,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR/w against the positional postings index — identical results to
    :func:`proximity_search`. The rarer term's positions explode (bounded
    by its postings); the other term's positions stay PACKED as one array
    row per doc, so the only join is a doc-id equi-join between the two
    pruned posting sets, and the window count runs as an array filter in
    codegen on the joined row. Per-pair work is O(|pos_b| log-free scan)
    — positions are short arrays; at 100 TB the cost is bounded by the
    rarest term's corpus frequency, exactly like the phrase probe."""
    a, b = str(term_a), str(term_b)
    if not a or not b:
        raise ValueError("terms must be non-empty")
    w = int(slop)
    if w < 1:
        raise ValueError("slop must be >= 1")
    meta, pairs = _probe_postings(spark, path, sorted({a, b}))
    if "pos" not in pairs.columns:
        raise ValueError(
            "postings index has no positions (built by a pre-positional "
            "version) — rebuild with save_postings_index to proximity-probe"
        )
    dfreq = {
        r["tok"]: r["df"]
        for r in pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    if a not in dfreq or b not in dfreq:
        return spark.createDataFrame([], f"{id_col} bigint, n_pairs bigint")
    rare, dense = (a, b) if dfreq[a] <= dfreq[b] else (b, a)
    rare_pos = pairs.filter(F.col("tok") == rare).select(
        F.col(id_col), F.explode("pos").alias("p")
    )
    dense_pos = pairs.filter(F.col("tok") == dense).select(
        F.col(id_col), F.col("pos").alias("_parr")
    )
    per_pair = rare_pos.join(dense_pos, id_col).select(
        F.col(id_col),
        F.size(
            F.filter(
                F.col("_parr"),
                lambda x: (x >= F.col("p") - w)
                & (x <= F.col("p") + w)
                & (x != F.col("p")),
            )
        ).alias("_c"),
    )
    return (
        per_pair.groupBy(id_col)
        .agg(F.sum("_c").cast("bigint").alias("n_pairs"))
        .filter(F.col("n_pairs") > 0)
        .orderBy(F.desc("n_pairs"), F.asc(id_col))
        .limit(int(k))
    )


def proximity_search_sql(
    table: str,
    term_a: str,
    term_b: str,
    slop: int = 3,
    k: int = 10,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`proximity_search` /
    :func:`proximity_search_indexed` (nested list_filter window count)."""
    a, b, w = str(term_a), str(term_b), int(slop)
    return (
        f"WITH tk AS (SELECT {id_col}, regexp_split_to_array(trim(text),"
        " '\\s+') AS t FROM " + table + "),\n"
        f"pa AS (SELECT {id_col}, unnest(list_filter(range(1, len(t)+1),"
        f" i -> t[i] = '{a}')) AS p, t FROM tk),\n"
        f"hit AS (SELECT {id_col}, len(list_filter(range(greatest(1, p-{w}),"
        f" p+{w}+1), j -> j <= len(t) AND j <> p AND t[j] = '{b}')) AS c"
        " FROM pa)\n"
        f"SELECT {id_col}, CAST(sum(c) AS BIGINT) AS n_pairs FROM hit "
        f"GROUP BY {id_col} HAVING sum(c) > 0 "
        f"ORDER BY n_pairs DESC, {id_col} LIMIT {int(k)}"
    )
