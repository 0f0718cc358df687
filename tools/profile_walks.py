"""A/B the random_walks hop kernel at sf0.1: the PRE-r15 kernel (edge
join + groupBy argmin per hop, inlined below as walks_old) vs production
gq.random_walks (r15 grouped-adjacency: one collect_list build, then
per-hop broadcast join + array_min(transform(...)) — no per-hop exchange).

Both arms must return IDENTICAL rows (asserted) — the argmin is over the
same md5 step hash either way. Interleaved reps, alternating order.

Usage: python tools/profile_walks.py [sf_dir] [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphchidb_scala_spark.checkpoint import cut_lineage
from graphchidb_scala_spark.operators import graph_queries as gq
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import tpch_graph


def walks_old(db, seeds, walk_length, n_walks=1, etype=None):
    """Pre-r15 production kernel: per-hop edge join + groupBy argmin."""
    spark = db.spark
    rows = [(int(s) * n_walks + j, int(s)) for s in seeds for j in range(n_walks)]
    cur = cut_lineage(spark.createDataFrame(rows, "walk_id bigint, id bigint"))
    visited = [cur.withColumn("step", F.lit(0).cast("bigint"))]
    e = db._typed(etype).select("src", "dst")
    for step in range(1, int(walk_length) + 1):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("walk_id"), F.lit(step), F.col("dst"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        nxt = (
            e.join(cur.withColumnRenamed("id", "src"), "src")
            .select("walk_id", F.col("dst"), h.alias("h"))
            .groupBy("walk_id")
            .agg(F.min(F.struct("h", "dst")).alias("_p"))
            .select("walk_id", F.col("_p.dst").alias("id"))
        )
        cur = cut_lineage(nxt)
        visited.append(cur.withColumn("step", F.lit(step).cast("bigint")))
    out = visited[0]
    for v in visited[1:]:
        out = out.unionAll(v)
    return out.select("walk_id", "step", "id")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("walks-ab")
    spark.sparkContext.setLogLevel("ERROR")
    g = tpch_graph(spark, sf_dir)
    g.edges.cache().count()
    seeds = list(range(1, 10_001))

    # equality gate first (cheap): same rows both arms
    a = walks_old(g, seeds[:500], walk_length=4)
    b = gq.random_walks(g, seeds[:500], walk_length=4)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), "arms differ!"
    print("equality gate: identical rows", file=sys.stderr, flush=True)

    res = {"old": [], "adj": []}
    for rep in range(pairs):
        order = ["old", "adj"] if rep % 2 == 0 else ["adj", "old"]
        for arm in order:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            fn = walks_old if arm == "old" else gq.random_walks
            t0 = time.time()
            n = fn(g, seeds, walk_length=10).count()
            dt = round(time.time() - t0, 2)
            res[arm].append(dt)
            print(f"rep{rep} {arm}: {dt}s ({n} rows)", file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
