"""A/B the md5 char-gram bucketing kernel at sf0.1: per-occurrence md5
(the pre-r15 kernel, inlined below) vs the distinct-gram dictionary now in
`_char_gram_buckets` (md5 once per DISTINCT gram + broadcast probe). Bucket ids are identical
by construction (same md5 over the same gram strings), asserted on the
per-doc histograms.

Also times the full doc_langid bench query under each kernel.

Usage: python tools/profile_gram_dict.py [sf_dir] [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphchidb_scala_spark.checkpoint import cut_lineage
from graphchidb_scala_spark.functions import text as T
from graphchidb_scala_spark.functions.dedup import md5_hash60
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import load_tables


def gram_buckets_occurrence(frame, keep, text_col, ngram_sizes, buckets):
    """Pre-r15 kernel: md5 per gram OCCURRENCE (the former production
    _char_gram_buckets body, kept here as the A/B baseline arm)."""
    t = F.concat(
        F.lit(" "), F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(" ")
    )

    def _gram_arr(n: int):
        cnt = F.length(t) - F.lit(n - 1)
        return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
            F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substring(t, i, F.lit(n)))
        )

    arrs = [_gram_arr(int(n)) for n in ngram_sizes]
    grams = arrs[0] if len(arrs) == 1 else F.concat(*arrs)
    return frame.select(
        *[F.col(c) for c in keep], F.explode(grams).alias("_g")
    ).select(
        *[F.col(c) for c in keep],
        F.pmod(md5_hash60(F.col("_g")), F.lit(int(buckets))).alias("_b"),
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("gramdict-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n_par = spark.sparkContext.defaultParallelism
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .repartition(n_par)
        .cache()
    )
    docs.count()

    # equality gate: identical per-doc histograms on a slice
    sl = docs.limit(200)
    h_old = (
        gram_buckets_occurrence(sl, ["doc_id"], "text", (2, 3), 256)
        .groupBy("doc_id", "_b")
        .count()
    )
    h_new = T._char_gram_buckets(sl, ["doc_id"], "text", (2, 3), 256).groupBy(
        "doc_id", "_b"
    ).count()
    assert h_old.exceptAll(h_new).isEmpty() and h_new.exceptAll(h_old).isEmpty()
    print("equality gate: identical histograms", file=sys.stderr, flush=True)

    res = {"old_hist": [], "dict_hist": []}
    for rep in range(pairs):
        order = (
            ["old_hist", "dict_hist"] if rep % 2 == 0 else ["dict_hist", "old_hist"]
        )
        for arm in order:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            if arm == "old_hist":
                noop(
                    gram_buckets_occurrence(docs, ["doc_id"], "text", (2, 3), 256)
                    .groupBy("doc_id", "_b")
                    .agg(F.count(F.lit(1)).alias("_c"))
                )
            else:
                noop(
                    T._char_gram_buckets(docs, ["doc_id"], "text", (2, 3), 256)
                    .groupBy("doc_id", "_b")
                    .agg(F.count(F.lit(1)).alias("_c"))
                )
            dt = round(time.time() - t0, 2)
            res[arm].append(dt)
            print(f"rep{rep} {arm}: {dt}s", file=sys.stderr, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
