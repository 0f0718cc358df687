"""Stage-level wall-clock profile of pipeline.curate_corpus_v3 at sf0.1,
with the bench entry's exact inputs (HTML-wrapped docs, buckets=256,
_V3_LM_MAX, cap=15). Each stage is forced with the noop sink (guide §1.4)
so the numbers are computation, not sink cost; cut_lineage stages are
already eager so their cost lands where it is paid.

Usage: python tools/profile_v3.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("v3-profile")
    spark.sparkContext.setLogLevel("ERROR")
    n_par = spark.sparkContext.defaultParallelism
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .repartition(n_par)
        .cache()
    )
    docs.count()
    crawled = docs.select(
        "doc_id",
        "source",
        F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)).alias("text"),
    )

    all_stages: list[dict[str, float]] = []
    for rep in range(reps):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        stages: dict[str, float] = {}

        def mark(name, t0):
            stages[name] = round(time.time() - t0, 2)
            print(f"  rep{rep} {name}: {stages[name]:.1f}s", file=sys.stderr, flush=True)

        sc = spark.sparkContext
        t = time.time()
        sc.setJobDescription("v3: strip+cut")
        clean = cut_lineage(
            crawled.select(
                F.col("doc_id"), F.col("source"), strip_html(F.col("text")).alias("text")
            )
        )
        mark("strip_cut", t)

        # detector cost lands inside the tagged cut, exactly as in prod
        # (det has no standalone action there)
        t = time.time()
        sc.setJobDescription("v3: detect_language + tagged cut")
        det = detect_language(clean, buckets=256)
        tagged = cut_lineage(clean.join(det.select("doc_id", "lang"), "doc_id"))
        mark("detect_tagged_cut", t)

        # prod does NOT cut after the LM gate (its repeats are shuffle-
        # aligned); the profiler cuts here so downstream stage times do not
        # re-bill the LM chain — attribution over fidelity.
        t = time.time()
        sc.setJobDescription("v3: lm gate + screen (cut)")
        lm = bigram_lm_scores(tagged, alpha=0.1, group_col="lang")
        keep = lm.filter(F.col("lm_xent") <= float(_V3_LM_MAX)).select("doc_id")
        gated = tagged.join(keep, "doc_id", "semi")
        filt = filter_documents(gated, min_tokens=5, min_quality=0.3, langs=None)
        scored = cut_lineage(
            filt.withColumn("_len", F.length(F.col("text")).cast("bigint"))
        )
        mark("lm_gate_screen_cut", t)

        t = time.time()
        sc.setJobDescription("v3: minhash_cluster_members verify")
        clusters = minhash_cluster_members(scored, threshold=0.5, verify=True)
        noop(clusters)
        mark("cluster_members_noop", t)

        t = time.time()
        sc.setJobDescription("v3: keep_best + cap")
        survivors = drop_near_duplicates_keep_best(
            scored, clusters=clusters, score_col="_len"
        )
        out = cap_per_group(survivors, "source", cap=15).select(
            F.col("doc_id").cast("bigint"), "source", "lang"
        )
        n = out.count()
        mark("keepbest_cap_count", t)
        stages["_total"] = round(sum(v for k, v in stages.items() if k != "_total"), 2)
        stages["_rows"] = n
        all_stages.append(stages)
        sc.setJobDescription(None)

    print(json.dumps(all_stages, indent=1))


if __name__ == "__main__":
    main()
