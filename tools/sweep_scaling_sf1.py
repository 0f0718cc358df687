"""Strong-scaling sweep for the heavy dedup/curation family at the 10×
replica (judge r14 'Next round #8'): time the three heaviest bench-entry
workloads at the session's $SPARK_GRAFT_CPUS and record one JSON row per
entry, so a c8 run and a c32 run can be compared (ratio > 2 demonstrates
the plans actually scale with cores once the data is big enough to
saturate them; sf0.1 cannot show this — 21/29 entries are
scheduling-bound there).

Usage:
  python tools/make_scale_replica.py /root/testdata/sf0.1 /tmp/sf1_replica 10
  SPARK_GRAFT_CPUS=32 python tools/sweep_scaling_sf1.py /tmp/sf1_replica out32.json
  SPARK_GRAFT_CPUS=8  python tools/sweep_scaling_sf1.py /tmp/sf1_replica out8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphchidb_scala_spark.functions import dedup, pipeline
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import load_tables

from __spark_entry__ import _HTML_PRE, _HTML_POST, _V3_LM_MAX


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_replica"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_scaling.json"
    spark = get_spark("sf1-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_par = spark.sparkContext.defaultParallelism
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .repartition(n_par)
        .cache()
    )
    docs.count()

    entries = {
        "dedup_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
            docs, block_col="source", threshold=0.5
        ).count(),
        "dedup_containment_clusters": lambda: dedup.containment_cluster_members(
            docs, block_col="source", k=5, threshold=0.8
        ).count(),
        "crawl_curate_v3": lambda: pipeline.curate_corpus_v3(
            docs.select(
                "doc_id", "source",
                F.concat(
                    F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)
                ).alias("text"),
            ),
            langid_buckets=256, lm_xent_max=_V3_LM_MAX, cap=15,
        ).count(),
    }
    res: dict[str, dict] = {"_cpus": cpus, "_sf_dir": sf_dir}
    for name, fn in entries.items():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        t0 = time.time()
        n = fn()
        res[name] = {"s": round(time.time() - t0, 1), "rows": n}
        print(f"KEY {name}: {res[name]['s']}s rows={n}", flush=True)
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
