"""Custom stateful streaming operators.

The reference is online-but-not-a-stream-processor (SURVEY.md §2.12): its
only "streaming" behaviors are immediately-visible inserts and a continuous
background recompute (GraphChiDatabase.scala:2260-2283 ``runIteration(comp,
continuous=true)``, started at SocialNetworkExample.scala:99). Here both get
first-class Structured Streaming forms, plus the stateful-session operator a
training-data pipeline needs:

- :func:`sessionize_stream` — per-user session assembly with
  ``applyInPandasWithState``: Arrow-batched per-group state, event-time
  timeout driven by the watermark. This is the custom-stateful-operator path
  (state that ``session_window`` can't express, e.g. carrying arbitrary
  per-session aggregates).
- :func:`continuous_recompute` — ``foreachBatch`` hook that appends each
  micro-batch to an :class:`~graphchidb_scala_spark.streaming.ingest.EdgeStore`
  and re-runs a computation over the updated graph, the reference's
  continuous-PageRank pattern ("results may lag mutations", README.md:72).

Scale: state is partitioned by the group key across executors; each
micro-batch shuffles once on the key. State size is O(open sessions), not
O(events) — closed sessions are emitted and dropped. The recompute hook runs
a full computation per micro-batch by design (parity with the reference's
continuous mode); incremental variants belong to the computation itself.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
# open-session carryover: (start_us, end_us, n_events)
_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _session_fn(gap_us: int) -> Callable[..., Iterable[pd.DataFrame]]:
    def fn(key: tuple[Any, ...], pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed the open session's end + gap: it can no longer
            # grow — flush it (the append-mode close condition)
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts = pd.concat([pdf["ts"] for pdf in pdf_iter]).sort_values()
        ts_us = [int(t) for t in (ts.astype("int64") // 1000).to_numpy()]  # ns → µs
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_us, end_us, n = state.get
            # within-watermark out-of-order events that precede the open
            # session: sessionize them on their own, then merge the trailing
            # run into the open session when it falls within the gap (the
            # batch twin would have seen them in order — session_start must
            # move backward, not stay pinned at state-creation time)
            before = [t for t in ts_us if t < start_us]
            ts_us = [t for t in ts_us if t >= start_us]
            if before:
                s0, e0, n0 = before[0], before[0], 1
                for t in before[1:]:
                    if t - e0 > gap_us:
                        closed.append((s0, e0, n0))
                        s0, e0, n0 = t, t, 1
                    else:
                        e0, n0 = t, n0 + 1
                if start_us - e0 <= gap_us:
                    start_us, n = s0, n + n0
                else:
                    closed.append((s0, e0, n0))
        else:
            start_us = end_us = ts_us[0]
            n = 0
        for t in ts_us:
            if n > 0 and t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        state.update((start_us, end_us, n))
        # close the open session once event time passes end + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization with explicit per-user state.

    ``events`` is a streaming DF with (user_id, ts, ...). Sessions close when
    the watermark passes ``last_event + gap`` (event-time timeout); each
    closed session is emitted exactly once (append semantics). The batch
    twin (same session boundaries) is
    :func:`graphchidb_scala_spark.functions.events.sessionize`.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def continuous_recompute(
    edge_stream: DataFrame,
    store,
    compute_fn: Callable[[Any], DataFrame],
    sink_path: str,
    etype: int = 0,
    checkpoint_dir: str | None = None,
):
    """Continuous background computation over an evolving graph — the
    reference's ``runIteration(comp, continuous=true)``
    (GraphChiDatabase.scala:2260-2283): after every micro-batch of edges is
    appended (immediately queryable), re-run ``compute_fn(GraphDB)`` and
    overwrite the result table. Readers of ``sink_path`` see the newest
    completed result; results may lag mutations by one micro-batch, exactly
    the reference's documented semantics (README.md:72).

    ``edge_stream`` must have (etype, src, dst [, props...]) columns or
    (user_id, event_id) pairs convertible by the caller beforehand.
    Returns the StreamingQuery.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            store.add_batch(batch_df)
        result = compute_fn(store.graph())
        result.write.mode("overwrite").parquet(sink_path)

    writer = edge_stream.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_drop_exact_duplicates(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival of each content
    fingerprint across micro-batches (state = seen md5 hashes — the streaming
    face of dedup.drop_exact_duplicates, whose batch form remains the exact
    final pass at compaction time).

    State discipline at 100 TB/day: without ``ts_col`` the hash state grows
    with distinct content — acceptable for bounded backfills only. With
    ``ts_col`` an event-time watermark bounds state via
    ``dropDuplicatesWithinWatermark`` (hashes older than the allowance are
    evicted; duplicates separated by more than the watermark can both
    survive, which the batch pass cleans up)."""
    h = docs_stream.withColumn("_h", F.md5(F.col(text_col)))
    if ts_col is not None:
        return (
            h.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_h"])
            .drop("_h")
        )
    return h.dropDuplicates(["_h"]).drop("_h")


# ---------------------------------------------------------------- streaming HLL

def _hll_fn(p: int, group_col: str) -> Callable[..., Iterable[pd.DataFrame]]:
    m = 1 << p

    def fn(key: tuple[Any, ...], pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        from graphchidb_scala_spark.functions.sketches import hll_estimate_py

        if state.exists:
            regs_list, n = state.get
            regs = np.asarray(regs_list, dtype=np.int32)
        else:
            regs, n = np.zeros(m, dtype=np.int32), 0
        for pdf in pdf_iter:
            n += len(pdf)
            np.maximum.at(
                regs,
                pdf["_bkt"].to_numpy(dtype=np.int64),
                pdf["_rho"].to_numpy(dtype=np.int32),
            )
        state.update(([int(r) for r in regs], int(n)))
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "approx_distinct": [hll_estimate_py(regs, p)],
                "n_rows": [int(n)],
            }
        )

    return fn


def stream_hll_distinct(
    events_stream: DataFrame,
    value_col: str,
    group_col: str = "event_type",
    p: int = 12,
) -> DataFrame:
    """Streaming approximate distinct per group: the per-row (bucket, rho)
    projection runs in codegen on each micro-batch; group state holds the
    2^p register maxima, merged across batches with an elementwise max —
    the associative/commutative merge that makes HLL a *sketch* (state is
    2^p ints per group forever, never the key universe). Emits the group's
    refreshed estimate every batch it appears in (update mode). The final
    estimate equals the batch :func:`~graphchidb_scala_spark.functions.
    sketches.hll_distinct` over the union of all batches, exactly — same
    registers, same estimator."""
    from graphchidb_scala_spark.functions.sketches import hll_register_cols

    bucket, rho = hll_register_cols(value_col, p)
    rows = events_stream.select(
        F.col(group_col), bucket.alias("_bkt"), rho.alias("_rho")
    )
    return rows.groupBy(group_col).applyInPandasWithState(
        _hll_fn(p, group_col),
        outputStructType=f"{group_col} string, approx_distinct double, n_rows bigint",
        stateStructType="registers array<int>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _set_sig_fn(num_hashes: int, group_col: str) -> Callable[..., Iterable[pd.DataFrame]]:
    def fn(key: tuple[Any, ...], pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            sig_list, n = state.get
            sig = np.asarray(sig_list, dtype=np.int64)
        else:
            sig, n = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64), 0
        for pdf in pdf_iter:
            n += len(pdf)
            for i in range(num_hashes):
                col = pdf[f"_h{i}"].to_numpy(dtype=np.int64)
                if len(col):
                    sig[i] = min(sig[i], int(col.min()))
        state.update(([int(v) for v in sig], int(n)))
        yield pd.DataFrame(
            {
                group_col: [key[0]],
                "sig": [[int(v) for v in sig]],
                "n_rows": [int(n)],
            }
        )

    return fn


def stream_set_signature(
    stream: DataFrame,
    value_col: str,
    group_col: str,
    num_hashes: int = 64,
) -> DataFrame:
    """Streaming corpus MinHash signature: per-row the ``num_hashes`` seeded
    md5-60 hashes run in codegen on each micro-batch; group state holds the
    running elementwise MINIMUM — the associative/commutative merge that
    makes the signature a sketch (state is ``num_hashes`` longs per group
    forever). Emits the refreshed signature each batch (update mode); the
    final signature equals the batch
    :func:`~graphchidb_scala_spark.functions.sketches.set_signature` over
    the union of all batches EXACTLY, so a continuously-ingested corpus can
    be overlap-compared against a static reference at any moment without
    rescanning history."""
    from graphchidb_scala_spark.functions.sketches import seeded_hash60

    v = F.col(value_col)
    # NULL values hash to NULL and would reach pandas as NaN floats (the
    # batch set_signature's F.min skips them silently) — drop them up front
    # so the streaming signature stays the exact batch equal
    rows = stream.filter(v.isNotNull()).select(
        F.col(group_col),
        *[seeded_hash60(v, i).alias(f"_h{i}") for i in range(num_hashes)],
    )
    return rows.groupBy(group_col).applyInPandasWithState(
        _set_sig_fn(num_hashes, group_col),
        outputStructType=f"{group_col} string, sig array<bigint>, n_rows bigint",
        stateStructType="sig array<bigint>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_bloom_flag(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    bits: DataFrame,
    m: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Stream-static Bloom screen: each micro-batch's (key, value) rows are
    checked against a STATIC Bloom position table (from
    :func:`~graphchidb_scala_spark.functions.sketches.bloom_build`) —
    positions explode in codegen, the stream-static join broadcasts the
    ≤ m-row bits side, and a running aggregation per key counts matched
    positions (update mode). ``maybe_member`` = all positions hit; zero
    false negatives, so a False row is provably clean as it streams past.
    Keys whose positions match NOTHING never reach the inner join and emit
    no row at all — absence is also "provably clean" (the batch
    :func:`~graphchidb_scala_spark.functions.sketches.bloom_probe` restores
    them; a streaming restore would need the full key universe as state,
    which defeats the screen).

    Each key must carry ONE value (e.g. doc_id#gram): the per-key state
    would pool positions across values otherwise. Duplicate rows and
    cross-batch re-sends are made exactly-once by aggregating the DISTINCT
    matched positions (``collect_set``, state ≤ k ints per key) rather
    than a running count — a raw count would let a 2-of-3-position
    non-member seen twice accumulate 4 ≥ 3 and flag a false positive
    beyond the Bloom bound. The decontamination gate that keeps up with
    ingestion instead of re-scanning the corpus."""
    from graphchidb_scala_spark.functions.sketches import bloom_positions

    pos = bloom_positions(F.col(value_col), m, k)
    probes = stream.select(
        F.col(key_col),
        F.size(pos).alias("_need"),
        F.explode(pos).alias("pos"),
    )
    bits_side = F.broadcast(bits) if m <= (1 << 24) else bits
    return (
        probes.join(bits_side, "pos")
        .groupBy(key_col, "_need")
        .agg(F.size(F.collect_set("pos")).alias("_got"))
        .select(key_col, (F.col("_got") == F.col("_need")).alias("maybe_member"))
    )


def _mg_fn(
    capacity: int, min_share: float, group_col: str, value_col: str
) -> Callable[..., Iterable[pd.DataFrame]]:
    def fn(key: tuple[Any, ...], pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            keys_list, cnts_list, dropped, n = state.get
            c = dict(zip(keys_list, cnts_list))
        else:
            c, dropped, n = {}, 0, 0
        for pdf in pdf_iter:
            vals = pdf[value_col]
            n += len(vals)
            for v, k in vals.value_counts().items():
                c[v] = c.get(v, 0) + int(k)
            if len(c) > capacity:
                d = sorted(c.values(), reverse=True)[capacity]
                dropped += d
                c = {kk: vv - d for kk, vv in c.items() if vv > d}
        import math

        state.update((list(c), [int(v) for v in c.values()], int(dropped), int(n)))
        t = max(1, math.ceil(min_share * n))
        keep = sorted(
            ((kk, vv) for kk, vv in c.items() if vv + dropped >= t),
            key=lambda kv: (-kv[1], kv[0]),
        )
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(keep),
                value_col: [kk for kk, _ in keep],
                "count_lo": [vv for _, vv in keep],
                "count_hi": [vv + dropped for _, vv in keep],
                "n_rows": [int(n)] * len(keep),
            }
        )

    return fn


def stream_frequent_items(
    stream: DataFrame,
    value_col: str,
    group_col: str = "event_type",
    min_share: float = 0.01,
    capacity: int = 1024,
) -> DataFrame:
    """Streaming Misra–Gries frequent items per group: state is ONE
    capacity-bounded (key → count) summary plus the scalar offset total —
    never the key universe — merged across micro-batches by the same
    batched MG decrement the batch
    :func:`~graphchidb_scala_spark.functions.sketches.frequent_items`
    candidate pass uses. Every batch the group appears in re-emits its
    current candidate set (update mode): keys whose count UPPER bound
    ``count_hi = stored + dropped`` reaches ``ceil(min_share · n_rows)``.

    Contract (the streaming twin of the batch operator's pass 1, which has
    no pass-2 rescan available): ``count_lo ≤ true ≤ count_hi`` for every
    emitted key, every key with true count ≥ ceil(min_share·n) IS emitted
    while ``dropped < ceil(min_share·n)`` (the same superset condition the
    batch arm enforces — size ``capacity`` to keep n/(capacity+1) below
    the threshold), and ``count_hi − count_lo = dropped ≤ n/(capacity+1)``
    bounds the count error. Pipe the emitted candidates through an exact
    batch recount over cold storage when exactness is needed — the
    sketch's job is to keep the candidate set small at stream rate."""
    rows = stream.select(F.col(group_col), F.col(value_col).cast("string"))
    return rows.groupBy(group_col).applyInPandasWithState(
        _mg_fn(capacity, min_share, group_col, value_col),
        outputStructType=(
            f"{group_col} string, {value_col} string, count_lo bigint, "
            "count_hi bigint, n_rows bigint"
        ),
        stateStructType=(
            "keys array<string>, counts array<bigint>, dropped bigint, n bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
