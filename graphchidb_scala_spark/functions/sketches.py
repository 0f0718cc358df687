"""Distributed sketches with cross-engine-exact results.

The usual objection to oracle-checking sketch operators is that every engine
seeds its hash differently, so estimates never match. Here the HyperLogLog
is built from the repo's portable 60-bit md5 hash
(:func:`~graphchidb_scala_spark.functions.dedup.md5_hash60` — DuckDB computes
the identical value), and the estimator arithmetic sticks to IEEE-double
operations both engines evaluate the same way, so the *estimate itself* is
deterministic and hash-match verifiable, not just "close".

Scale shape (the point of a sketch): per group, at most ``m = 2**p`` register
rows survive the first aggregation — the data-sized shuffle carries
(group, bucket, partial-max) triples with map-side combine, and the second
aggregation sees ≤ m rows per group regardless of corpus size. This is the
count-distinct that works when exact ``count(distinct)`` would shuffle the
full key universe at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from graphchidb_scala_spark.functions.dedup import md5_hash60


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias correction for m >= 128
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_cols(value_col: str, p: int):
    """(bucket, rho) Column pair for one value — the per-row half of the
    sketch, shared by the batch aggregate and the streaming stateful op."""
    tail_bits = 60 - p
    h = md5_hash60(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    bitlen = F.when(tail == F.lit(0), F.lit(0)).otherwise(
        F.length(F.conv(tail, 10, 2))
    )
    return bucket, F.lit(tail_bits + 1) - bitlen


def hll_estimate_py(registers, p: int) -> float:
    """Python-side estimator over a dense register array (missing buckets =
    0) — the same arithmetic as the SQL/Column form, used by the streaming
    stateful op where the registers live in group state."""
    m = 1 << p
    s = sum(2.0 ** (-int(r)) for r in registers)
    zeros = sum(1 for r in registers if int(r) == 0)
    raw = _alpha(m) * m * m / s
    if raw <= 2.5 * m and zeros > 0:
        import math

        return round(m * math.log(m / zeros), 4)
    return round(raw, 4)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group — DF(*group_cols,
    out_col), estimate rounded to 4dp. ``p`` register bits (m = 2**p
    registers, ~1.04/sqrt(m) relative error); includes the small-range
    linear-counting correction, so it is accurate from tens to billions.

    bucket = top ``p`` bits of the 60-bit md5 hash; rho = leading-zero count
    of the remaining ``60-p`` bits + 1 (computed exactly via the binary
    digit-length, no floating log on the hot path)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    bucket, rho_col = hll_register_cols(value_col, p)
    rho = rho_col.alias("_rho")
    gb = [F.col(c) for c in group_cols]
    registers = (
        df.select(*gb, bucket.alias("_bkt"), rho)
        .groupBy(*gb, "_bkt")
        .agg(F.max("_rho").alias("_mr"))
    )
    agg = registers.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("_v"),
        F.sum(F.pow(F.lit(2.0), -F.col("_mr"))).alias("_s"),
    )
    zeros = (F.lit(m) - F.col("_v")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / (F.col("_s") + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*gb, F.round(est, 4).alias(out_col))


def hll_distinct_sql(
    table: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct",
) -> str:
    """The DuckDB twin of :func:`hll_distinct` — identical hash, identical
    register math, identical float literals, so the estimates hash-match."""
    m = 1 << p
    tail_bits = 60 - p
    mask = (1 << tail_bits) - 1
    gsel = ", ".join(group_cols)
    gpre = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    return f"""
WITH h AS (
  SELECT {gpre}CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM {table}
),
b AS (
  SELECT {gpre}hv >> {tail_bits} AS bkt, hv & {mask} AS tail FROM h
),
r AS (
  SELECT {gpre}bkt,
         max({tail_bits + 1} - (CASE WHEN tail = 0 THEN 0 ELSE length(to_base(tail, 2)) END)) AS mr
  FROM b GROUP BY {gpre}bkt
),
agg AS (
  SELECT {gpre}CAST(count(*) AS DOUBLE) AS v, sum(power(2.0, -mr)) AS s
  FROM r {gby}
),
est AS (
  SELECT {gpre}{m} - v AS zeros, {_alpha(m) * m * m!r} / (s + ({m} - v)) AS raw
  FROM agg
)
SELECT {gpre}round(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
             THEN {float(m)!r} * ln({float(m)!r} / zeros) ELSE raw END, 4) AS {out_col}
FROM est
""".strip()


def seeded_hash60(col: Column, seed: int) -> Column:
    """Seed-``i`` member of the portable 60-bit hash family:
    ``md5("{seed}:" + value)`` truncated to 60 bits. DuckDB computes the
    identical value (``('0x'||substr(md5(seed||':'||x),1,15))::BIGINT``),
    which is what makes the MinHash / Bloom sketches below hash-match
    verifiable cross-engine (xxhash64's seeds are Spark-only)."""
    return md5_hash60(F.concat(F.lit(f"{seed}:"), col.cast("string")))


def seeded_hash60_sql(expr: str, seed: int) -> str:
    """DuckDB twin of :func:`seeded_hash60` over a SQL expression."""
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, 15)) "
        "AS BIGINT)"
    )


def set_signature(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    num_hashes: int = 64,
) -> DataFrame:
    """Classic k-hash MinHash signature of the SET of values in ``value_col``
    (per group): DF(*group_cols, i, minh) with one row per hash function,
    ``minh = min over values of seeded_hash60(value, i)``.

    This is the corpus-level twin of per-document
    :func:`~graphchidb_scala_spark.functions.dedup.minhash_signatures`: the
    "document" is an entire corpus slice, and the signature supports
    resemblance estimates BETWEEN corpora (train/test overlap) without ever
    joining the full key universes.

    Scale shape: all ``num_hashes`` mins are partial aggregates with
    map-side combine — per-mapper state is ``num_hashes`` longs per group,
    and ONE shuffle moves just ``num_hashes`` longs per (mapper, group)
    regardless of corpus size. No distinct, no sort, no value shuffle.
    Duplicated values cost nothing (min is idempotent), so no pre-dedup pass
    is needed. Reference analogue: the sketch/summary role of
    ShardIndex.java:33-101 (skip data, keep a tiny summary)."""
    gb = [F.col(c) for c in group_cols]
    v = F.col(value_col)
    aggs = [
        F.min(seeded_hash60(v, i)).alias(f"_h{i}") for i in range(num_hashes)
    ]
    wide = df.groupBy(*gb).agg(*aggs)
    return wide.select(
        *gb,
        F.posexplode(
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)])
        ).alias("i", "minh"),
    )


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    num_hashes: int = 64,
    p: int = 12,
) -> DataFrame:
    """Set-resemblance estimates between two corpora from sketches only:
    1-row DF(j_est, distinct_a, distinct_b, union_est, inter_est,
    contain_a_in_b, contain_b_in_a), all rounded to 4dp.

    ``j_est`` is the unbiased MinHash estimator (fraction of agreeing
    signature positions); distinct counts come from the cross-engine-exact
    HyperLogLog; the set sizes follow from inclusion-exclusion:
    ``|A∪B| = (|A|+|B|)/(1+J)`` and ``|A∩B| = J·|A∪B|``. This answers the
    decontamination-planning question ("how much of the test set's vocab /
    n-grams already appear in train?") with two sketch scans — the exact
    join (:func:`~graphchidb_scala_spark.functions.pipeline.contamination_hits`)
    shuffles the full n-gram universe; this shuffles ``num_hashes + 2^p``
    rows per side, a constant, at any corpus size.

    Estimator determinism: agreeing-position counts are integers,
    ``j = matches/num_hashes`` is exact binary for power-of-two
    ``num_hashes``, and the HLL estimates are rounded before use, so the
    derived arithmetic is reproducible cross-engine bit-for-bit."""
    sig_a = set_signature(df_a, value_col, num_hashes=num_hashes)
    sig_b = set_signature(df_b, value_col, num_hashes=num_hashes)
    matches = (
        sig_a.alias("a")
        .join(sig_b.alias("b"), "i")
        .agg(
            F.sum(
                (F.col("a.minh") == F.col("b.minh")).cast("int")
            ).alias("_m")
        )
    )
    da = hll_distinct(df_a, value_col, p=p, out_col="distinct_a")
    db = hll_distinct(df_b, value_col, p=p, out_col="distinct_b")
    j = F.col("_m") / F.lit(float(num_hashes))
    union = (F.col("distinct_a") + F.col("distinct_b")) / (F.lit(1.0) + j)
    inter = j * union
    return (
        matches.crossJoin(da)
        .crossJoin(db)
        .select(
            F.round(j, 4).alias("j_est"),
            F.col("distinct_a"),
            F.col("distinct_b"),
            F.round(union, 4).alias("union_est"),
            F.round(inter, 4).alias("inter_est"),
            F.round(inter / F.col("distinct_a"), 4).alias("contain_a_in_b"),
            F.round(inter / F.col("distinct_b"), 4).alias("contain_b_in_a"),
        )
    )


def corpus_overlap_sql(
    table_a: str,
    table_b: str,
    value_expr: str,
    num_hashes: int = 64,
    p: int = 12,
) -> str:
    """DuckDB twin of :func:`corpus_overlap` — identical hash family,
    identical estimator arithmetic, identical rounding, so the estimates
    hash-match. ``table_a``/``table_b`` are FROM-clauses (may be
    subqueries), ``value_expr`` the element expression."""

    def sig(tbl: str) -> str:
        arms = " UNION ALL ".join(
            f"SELECT {i} AS i, min({seeded_hash60_sql(value_expr, i)}) AS minh FROM {tbl}"
            for i in range(num_hashes)
        )
        return arms

    ha = hll_distinct_sql(table_a, value_expr, (), p, "distinct_a")
    hb = hll_distinct_sql(table_b, value_expr, (), p, "distinct_b")
    return f"""
WITH sig_a AS ({sig(table_a)}),
sig_b AS ({sig(table_b)}),
m AS (
  SELECT sum(CASE WHEN sig_a.minh = sig_b.minh THEN 1 ELSE 0 END) AS _m
  FROM sig_a JOIN sig_b USING (i)
),
da AS ({ha}),
db AS ({hb}),
est AS (
  SELECT _m / {float(num_hashes)!r} AS j, distinct_a, distinct_b,
         (distinct_a + distinct_b) / (1.0 + _m / {float(num_hashes)!r}) AS un
  FROM m, da, db
)
SELECT round(j, 4) AS j_est, distinct_a, distinct_b,
       round(un, 4) AS union_est, round(j * un, 4) AS inter_est,
       round(j * un / distinct_a, 4) AS contain_a_in_b,
       round(j * un / distinct_b, 4) AS contain_b_in_a
FROM est
""".strip()


def bloom_positions(col: Column, m: int, k: int) -> Column:
    """The ``k`` bit positions (deduplicated, sorted) a value sets in an
    ``m``-bit Bloom filter — ``seeded_hash60(value, j) mod m`` for
    ``j = 0..k-1``."""
    return F.array_distinct(
        F.array(*[F.pmod(seeded_hash60(col, j), F.lit(m)) for j in range(k)])
    )


def bloom_build(
    df: DataFrame, value_col: str, m: int = 1 << 18, k: int = 3
) -> DataFrame:
    """Build a Bloom filter of the values as a DF(pos) of set bit positions
    (≤ ``m`` rows however large the input corpus). The fixed-memory
    membership sketch: where
    :func:`~graphchidb_scala_spark.functions.pipeline.contamination_hits`
    semi-joins the full reference n-gram set (shuffle grows with the
    reference corpus), the Bloom position table is capped at ``m`` rows —
    broadcastable to every executor at any reference scale, at the price of
    a bounded false-positive rate (~``(1-e^{-kn/m})^k``; zero false
    negatives)."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(value_col), m, k)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    bits: DataFrame,
    m: int = 1 << 18,
    k: int = 3,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe rows of ``df`` (unique per ``key_cols``) against a Bloom
    position table from :func:`bloom_build`: DF(*key_cols, out_col bool).
    A row is a (possible) member iff ALL of its ``k`` positions are set —
    counted against the deduplicated position array so intra-key position
    collisions can't produce false negatives.

    The ``bits`` side is broadcast when ``m`` is broadcast-sized (≤ 2^24)
    and joined LEFT, so every probe row survives in ONE pass — zero-match
    rows come out False from the same aggregation, with no second scan of
    ``df`` and no distinct/shuffle over the probe key universe (the shape
    that lets a 100 TB train scan screen against a test set in one pass)."""
    pos = bloom_positions(F.col(value_col), m, k)
    probes = df.select(
        *[F.col(c) for c in key_cols],
        F.size(pos).alias("_need"),
        F.explode(pos).alias("pos"),
    )
    bits_side = F.broadcast(bits) if m <= (1 << 24) else bits
    joined = probes.join(
        bits_side.select("pos", F.lit(1).alias("_hit")), "pos", "left"
    )
    return (
        joined.groupBy(*[F.col(c) for c in key_cols])
        .agg(
            F.max("_need").alias("_need"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_got"),
        )
        .select(*key_cols, (F.col("_got") == F.col("_need")).alias(out_col))
    )


def bloom_positions_sql(expr: str, m: int, k: int) -> str:
    """DuckDB twin of :func:`bloom_positions` (a LIST expression)."""
    arms = ", ".join(
        f"(({seeded_hash60_sql(expr, j)}) % {m} + {m}) % {m}" for j in range(k)
    )
    return f"list_distinct([{arms}])"


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: Sequence[float],
    rate: float = 1.0 / 16,
    seed: int = 7,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic hash-sampled quantiles: keep rows whose
    ``seeded_hash60(key) < rate·2^60`` (a pure pushed-down filter — the
    repo's seeded-sampling idiom, no rand(), reproducible across engines
    and runs), then EXACT interpolated percentiles over the sample.
    DF(*group_cols, p<prob>..., n_sampled).

    The scale story: exact percentiles over 100 TB shuffle/sort the full
    value column; the hash filter bounds the aggregation input to
    ``rate·N`` rows at scan time, with sampling error ~1/sqrt(rate·N) —
    at any realistic N the sample is still millions of rows and the
    quantile error is negligible, but the shuffle is 1/rate smaller.
    Keyed (not row-random) sampling also keeps all rows of one key
    together, so per-entity re-aggregation before the quantile remains
    valid."""
    thr = int(rate * (1 << 60))
    s = df.filter(seeded_hash60(F.col(key_col), seed) < F.lit(thr))
    gb = [F.col(c) for c in group_cols]

    def _name(p: float) -> str:
        return "p" + f"{p * 100:g}".replace(".", "_")

    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 4).alias(_name(p))
        for p in probs
    ] + [F.count(F.lit(1)).cast("bigint").alias("n_sampled")]
    return s.groupBy(*gb).agg(*aggs)


def sampled_quantiles_sql(
    table: str,
    value_col: str,
    key_col: str,
    probs: Sequence[float],
    rate: float = 1.0 / 16,
    seed: int = 7,
    group_cols: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`sampled_quantiles` (quantile_cont matches
    Spark's interpolated percentile)."""
    thr = int(rate * (1 << 60))
    gsel = ", ".join(group_cols)
    gpre = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""

    def _name(p: float) -> str:
        return "p" + f"{p * 100:g}".replace(".", "_")

    cols = ", ".join(
        f"round(quantile_cont({value_col}, {p!r}), 4) AS {_name(p)}" for p in probs
    )
    return (
        f"SELECT {gpre}{cols}, CAST(count(*) AS BIGINT) AS n_sampled FROM {table} "
        f"WHERE {seeded_hash60_sql(key_col, seed)} < {thr} {gby}"
    )


def frequent_items(
    df: DataFrame,
    key_col: str,
    min_share: float,
    capacity: int | None = None,
    n_total: int | None = None,
) -> DataFrame:
    """EXACT frequent-items (heavy hitters): every distinct ``key_col``
    value occurring in at least ``min_share`` of the rows, with its exact
    count — DF(``key_col``, cnt), (cnt DESC, key ASC). The φ-frequent-items
    problem of Misra–Gries 1982 / Metwally SpaceSaving, solved with the
    sketch-then-verify shape that stays exact:

    1. **Candidate pass (no shuffle, ONE scan).** One Arrow-batched
       ``mapInPandas`` over the input partitions; each partition counts its
       own keys (vectorized ``value_counts``) and emits the keys whose
       LOCAL share reaches φ: ``c_p ≥ φ·n_p``. Weighted-average
       pigeonhole: if a key's global share c/n ≥ φ, some partition has
       c_p/n_p ≥ c/n ≥ φ (were every local ratio below φ, the total would
       be too), so the emitted set is a GUARANTEED superset of the answer
       — ≤ ⌊1/φ⌋ keys per partition, and the full key universe never
       reaches a shuffle. The local-share rule needs NO global row count,
       so there is no pre-count scan; each partition also emits one marker
       row carrying its n_p, and t = max(1, ceil(φ·Σn_p)) comes from
       aggregating the (tiny, lineage-cut) candidate output itself.
    2. **Verify pass (exact).** Broadcast the (≤ P/φ-row) candidate set
       back over the data, count ONLY candidate rows with a
       map-side-combined groupBy, keep ``cnt ≥ t``.

    With ``capacity=m`` the per-partition counter is Misra–Gries-bounded:
    whenever it exceeds m keys, the (m+1)-th-largest count d is subtracted
    from every key and non-positive keys are dropped (batched MG
    decrement). Invariants: stored ≥ true − D and evicted ⇒ true ≤ D,
    where D = Σ subtracted offsets ≤ n_p/(m+1). Eviction is therefore safe
    while ``D < φ·n_p`` — the classic MG bound: any ``capacity ≥ 1/φ``
    satisfies it unconditionally. The pass CHECKS the condition per
    partition and raises ValueError naming the safe capacity instead of
    silently missing a heavy key — a sketch that can be wrong must say
    so. Candidates are emitted on ``stored + D ≥ φ·n_p`` (an upper bound
    on the true local count, so no key the uncapped pass would emit is
    lost).

    Scale shape: at 100 TB the exact `groupBy(key).count()` answer
    shuffles every distinct key (URLs, user ids: billions of
    combiner-resistant rows). Here the data is scanned exactly TWICE —
    candidate pass + verify pass, the two-pass frequent-items optimum —
    and the only shuffle carries rows matching the broadcast candidate
    list. ``n_total`` (the row count, when the caller already knows it)
    skips the marker aggregation and keeps the whole composition lazy —
    useful for plan inspection; results are identical. NULL keys are
    ignored (no NULL is ever a heavy hitter of interest; the oracle twin
    drops them identically).

    Candidate-pass memory: exact mode holds one (key → int) entry per
    distinct key per partition — bounded by partition size, the same
    envelope as any hash aggregate's map side; ``capacity`` is the knob
    when a partition's key universe itself outgrows memory.

    The guarantee is per-partition-local (no cross-partition constant),
    so it is indifferent to AQE coalescing, skewed partition sizes, or
    the planned-vs-runtime partition count."""
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(key_col).filter(F.col(key_col).isNotNull())
    key_field = src.schema[key_col]
    out_schema = StructType(
        [
            StructField(key_col, key_field.dataType, True),
            StructField("_np", LongType(), True),
        ]
    )
    cap = capacity
    share = float(min_share)

    def _candidates(batches):
        from collections import Counter

        import pandas as pd

        c: Counter = Counter()
        dropped = 0  # Σ uniform MG offsets subtracted so far (exact mode: 0)
        n_local = 0
        for pdf in batches:
            vals = pdf[key_col]
            n_local += len(vals)
            c.update(vals.value_counts().to_dict())
            if cap is not None and len(c) > cap:
                d = sorted(c.values(), reverse=True)[cap]
                dropped += d
                c = Counter({k: v - d for k, v in c.items() if v > d})
        # dropped > 0 guard precondition: an EMPTY partition has
        # dropped == n_local == 0 and must not trip the epsilon compare
        if cap is not None and dropped > 0 and dropped >= share * n_local - 1e-9:
            raise ValueError(
                "frequent_items capacity too small for the superset "
                f"guarantee: partition of {n_local} rows subtracted "
                f"{dropped} >= phi*n_p = {share * n_local:.1f}; any "
                f"capacity >= {math.ceil(1.0 / share)} (= 1/phi) is safe "
                f"(have {cap})"
            )
        keep = [
            k for k, v in c.items() if v + dropped >= share * n_local - 1e-9
        ]
        if keep or n_local:
            # object/Int64 dtypes so a numeric key column with the trailing
            # None marker row arrow-converts to (typed, nullable) columns
            # instead of float64-with-NaN
            yield pd.DataFrame(
                {
                    key_col: pd.Series(keep + [None], dtype=object),
                    "_np": pd.Series(
                        [None] * len(keep) + [n_local], dtype="Int64"
                    ),
                }
            )

    cand_out = src.mapInPandas(_candidates, out_schema)
    if n_total is not None:
        n = n_total
        cands = cand_out.filter(F.col(key_col).isNotNull()).select(key_col)
    else:
        from graphchidb_scala_spark.checkpoint import cut_lineage

        # materialize the (tiny: ≤ 1/φ keys + 1 marker per partition)
        # candidate output once; the marker sum is the exact row count, so
        # no separate full-scan count job ever runs
        pinned = cut_lineage(cand_out)
        n = pinned.agg(F.sum("_np")).collect()[0][0] or 0
        cands = pinned.filter(F.col(key_col).isNotNull()).select(key_col)
    t = max(1, math.ceil(share * n))
    return (
        src.join(F.broadcast(cands.distinct()), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= t)
        .orderBy(F.desc("cnt"), F.asc(key_col))
    )


def frequent_items_sql(
    table_expr: str, key_col: str, min_share: float
) -> str:
    """DuckDB twin of :func:`frequent_items`: the plain exact formulation
    (the sketch-then-verify plan returns exactly this relation)."""
    return (
        f"WITH src AS (SELECT {key_col} FROM {table_expr} "
        f"WHERE {key_col} IS NOT NULL),\n"
        "n AS (SELECT count(*) AS v FROM src)\n"
        f"SELECT {key_col}, CAST(count(*) AS BIGINT) AS cnt FROM src "
        f"GROUP BY {key_col}\n"
        f"HAVING count(*) >= greatest(1, CAST(ceil({min_share!r} * "
        "(SELECT v FROM n)) AS BIGINT))\n"
        f"ORDER BY cnt DESC, {key_col}"
    )


def frequent_items_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    min_share: float,
    capacity: int | None = None,
) -> DataFrame:
    """Per-group EXACT frequent items: every (group, key) whose count is at
    least ``min_share`` of its GROUP's rows — DF(group, key, cnt, n_group),
    (group ASC, cnt DESC, key ASC). Same two-scan local-share design as
    :func:`frequent_items`, applied per group: a key at share ≥ φ within
    its group has local-within-partition group share ≥ φ somewhere
    (weighted-average pigeonhole per group), so per-partition emission at
    local group share φ is a guaranteed superset — ≤ 1/φ candidates per
    (partition, group). Marker rows carry per-partition GROUP row counts;
    their sum is each group's exact size, so neither the thresholds nor
    the final ``n_group`` column need any extra scan. ``capacity`` bounds
    each per-group counter with the same batched MG decrement and the same
    classic ``1/φ`` safety floor, raising when violated.

    The corpus-analysis workhorse ("top terms per language", "hot URLs per
    domain"): per-group heavy keys at 100 TB without ever shuffling a
    (group × key) universe — the shuffle carries broadcast-candidate
    matches plus one ≤#groups-row total per partition."""
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    src = df.select(group_col, key_col).filter(
        F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
    )
    out_schema = StructType(
        [
            StructField(group_col, src.schema[group_col].dataType, True),
            StructField(key_col, src.schema[key_col].dataType, True),
            StructField("_np", LongType(), True),
        ]
    )
    cap = capacity
    share = float(min_share)

    def _candidates(batches):
        from collections import Counter

        import pandas as pd

        per_g: dict = {}
        n_g: Counter = Counter()
        drop_g: Counter = Counter()
        for pdf in batches:
            for g, sub in pdf.groupby(group_col, sort=False):
                c = per_g.setdefault(g, Counter())
                n_g[g] += len(sub)
                c.update(sub[key_col].value_counts().to_dict())
                if cap is not None and len(c) > cap:
                    d = sorted(c.values(), reverse=True)[cap]
                    drop_g[g] += d
                    per_g[g] = Counter(
                        {k: v - d for k, v in c.items() if v > d}
                    )
        gs, ks, ns = [], [], []
        for g, c in per_g.items():
            dropped, nl = drop_g[g], n_g[g]
            if cap is not None and dropped > 0 and dropped >= share * nl - 1e-9:
                raise ValueError(
                    "frequent_items_grouped capacity too small for the "
                    f"superset guarantee in group {g!r}: subtracted "
                    f"{dropped} >= phi*n_p = {share * nl:.1f}; any "
                    f"capacity >= {math.ceil(1.0 / share)} (= 1/phi) is "
                    f"safe (have {cap})"
                )
            for k, v in c.items():
                if v + dropped >= share * nl - 1e-9:
                    gs.append(g)
                    ks.append(k)
                    ns.append(None)
            gs.append(g)
            ks.append(None)
            ns.append(nl)
        if gs:
            yield pd.DataFrame(
                {
                    group_col: pd.Series(gs, dtype=object),
                    key_col: pd.Series(ks, dtype=object),
                    "_np": pd.Series(ns, dtype="Int64"),
                }
            )

    from graphchidb_scala_spark.checkpoint import cut_lineage

    pinned = cut_lineage(src.mapInPandas(_candidates, out_schema))
    totals = pinned.filter(F.col(key_col).isNull()).groupBy(group_col).agg(
        F.sum("_np").cast("bigint").alias("n_group")
    )
    cands = (
        pinned.filter(F.col(key_col).isNotNull())
        .select(group_col, key_col)
        .distinct()
    )
    return (
        src.join(F.broadcast(cands), [group_col, key_col])
        .groupBy(group_col, key_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .join(F.broadcast(totals), group_col)
        .filter(
            F.col("cnt")
            >= F.greatest(F.lit(1), F.ceil(F.lit(share) * F.col("n_group")))
        )
        .orderBy(F.asc(group_col), F.desc("cnt"), F.asc(key_col))
    )


def frequent_items_grouped_sql(
    table_expr: str, group_col: str, key_col: str, min_share: float
) -> str:
    """DuckDB twin of :func:`frequent_items_grouped` (plain exact per-group
    GROUP BY … HAVING against the group totals)."""
    return (
        f"WITH src AS (SELECT {group_col}, {key_col} FROM {table_expr} "
        f"WHERE {key_col} IS NOT NULL AND {group_col} IS NOT NULL),\n"
        f"tot AS (SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_group "
        f"FROM src GROUP BY {group_col})\n"
        f"SELECT s.{group_col}, s.{key_col}, CAST(count(*) AS BIGINT) AS cnt,"
        " t.n_group\n"
        f"FROM src s JOIN tot t USING ({group_col})\n"
        f"GROUP BY s.{group_col}, s.{key_col}, t.n_group\n"
        f"HAVING count(*) >= greatest(1, CAST(ceil({min_share!r} * t.n_group)"
        " AS BIGINT))\n"
        f"ORDER BY s.{group_col}, cnt DESC, s.{key_col}"
    )
