"""Scale-sanity data generator: replicate an sf directory N× into disjoint
id spaces, producing a dataset one scale step up from the largest the driver
ships (sf0.1 × 10 ≈ sf1) without synthesizing new distributions.

Each replica k offsets every key column by k·1e6 (the typed-vertex offsets
in sources/tpch.py are 1e12 apart, so ten replicas of sf0.1 fit with nine
orders of magnitude to spare). The graph becomes 10 disjoint copies —
point/frontier queries keep their replica-0 seeds while every scan, shuffle,
and global analytic sees 10× the rows, which is exactly what a scaling
factor should measure. Documents get a per-replica suffix token and
embeddings a per-replica circular dimension shift so the dedup/ANN
workloads don't drown in artificial cross-replica duplicates (a real 10×
corpus is new text, not ten carbon copies).

Usage: python tools/make_scale_replica.py [src_dir] [out_dir] [n_replicas]
Defaults: /root/testdata/sf0.1 /tmp/sf1_replica 10
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 1_000_000

# key columns to offset by replica * STRIDE, per table
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ("region", "nation")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_replica"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM parquet_scan('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{src}/{t}.parquet')"
        ).fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + k * {STRIDE} AS {c}")
            elif t == "documents" and c == "text":
                # per-word replica suffix (replica 0 verbatim): replicas get
                # disjoint vocabularies, so no shingle matches across
                # replicas — near-dup structure exists within each replica
                # only, like genuinely new text (a single appended token
                # leaves copies as true near-duplicates and inflates the
                # near-dedup pair output ~10x, measuring the data artifact
                # instead of the operator)
                sel.append(
                    "CASE WHEN k = 0 THEN text ELSE array_to_string("
                    "list_transform(string_split(text, ' '), "
                    "w -> w || 'q' || CAST(k AS VARCHAR)), ' ') END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                # circular shift by 7k dims: decorrelates replicas (cosine
                # vs the original ≈ chance) while preserving norms/moments
                sel.append(
                    "CAST(CASE WHEN k = 0 THEN embedding ELSE "
                    "list_concat(embedding[(k * 7) % len(embedding) + 1:], "
                    "embedding[1:(k * 7) % len(embedding)]) END AS FLOAT[]) AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM parquet_scan('{src}/{t}.parquet'), range({n}) r(k)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        rows = con.execute(
            f"SELECT count(*) FROM parquet_scan('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")


if __name__ == "__main__":
    main()
