"""Interleaved A/B of curate_corpus_v3 WITH vs WITHOUT the third (scored)
lineage cut, same session, alternating reps so weather averages out.

Usage: python tools/ab_v3_cut.py [sf_dir] [pairs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from graphchidb_scala_spark.checkpoint import cut_lineage
from graphchidb_scala_spark.functions.dedup import (
    drop_near_duplicates_keep_best,
    minhash_cluster_members,
)
from graphchidb_scala_spark.functions.pipeline import cap_per_group
from graphchidb_scala_spark.functions.text import (
    bigram_lm_scores,
    detect_language,
    filter_documents,
    strip_html,
)
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import load_tables

from __spark_entry__ import _HTML_PRE, _HTML_POST, _V3_LM_MAX


def run_v3(crawled, use_cut: bool) -> int:
    clean = cut_lineage(
        crawled.select("doc_id", "source", strip_html(F.col("text")).alias("text"))
    )
    det = detect_language(clean, buckets=256)
    tagged = cut_lineage(clean.join(det.select("doc_id", "lang"), "doc_id"))
    lm = bigram_lm_scores(tagged, alpha=0.1, group_col="lang")
    keep = lm.filter(F.col("lm_xent") <= float(_V3_LM_MAX)).select("doc_id")
    gated = tagged.join(keep, "doc_id", "semi")
    filt = filter_documents(gated, min_tokens=5, min_quality=0.3, langs=None)
    scored = filt.withColumn("_len", F.length(F.col("text")).cast("bigint"))
    if use_cut:
        scored = cut_lineage(scored)
    clusters = minhash_cluster_members(
        scored, id_col="doc_id", text_col="text", threshold=0.5, verify=True
    )
    survivors = drop_near_duplicates_keep_best(
        scored, clusters=clusters, score_col="_len"
    )
    return (
        cap_per_group(survivors, "source", cap=15)
        .select(F.col("doc_id").cast("bigint"), "source", "lang")
        .count()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("v3-ab")
    spark.sparkContext.setLogLevel("ERROR")
    n_par = spark.sparkContext.defaultParallelism
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .repartition(n_par).cache()
    )
    docs.count()
    crawled = docs.select(
        "doc_id", "source",
        F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)).alias("text"),
    )
    results: dict[bool, list[float]] = {True: [], False: []}
    for p in range(pairs):
        for use_cut in (p % 2 == 0, p % 2 == 1):  # alternate order each pair
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            n = run_v3(crawled, use_cut)
            dt = time.time() - t0
            results[use_cut].append(dt)
            print(f"pair{p} cut={use_cut}: {dt:.1f}s rows={n}", flush=True)
    for k, v in results.items():
        v = sorted(v)
        print(f"cut={k}: median={v[len(v)//2]:.1f} all={[round(x,1) for x in v]}")


if __name__ == "__main__":
    main()
