"""Micro-bench: cost of building the 192-hash est2 table on the capstone's
`scored` corpus, four ways:

  A string family, one 192-min agg           (current _minhash_sig2_table)
  B md5-long family, one 192-min agg         (input = sh._arr longs)
  C md5-long family, two 96-min aggs joined  (each under codegen maxFields)
  D md5-long family, one 192-min agg, spark.sql.codegen.maxFields=256

Usage: python tools/profile_sig2_build.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import graphchidb_scala_spark.functions.dedup as D
from graphchidb_scala_spark.checkpoint import cut_lineage
from graphchidb_scala_spark.functions.text import (
    bigram_lm_scores,
    detect_language,
    filter_documents,
    strip_html,
)
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import load_tables

from __spark_entry__ import _HTML_PRE, _HTML_POST, _V3_LM_MAX

N = D._EST2_HASHES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("sig2-build")
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
    clean = cut_lineage(
        crawled.select("doc_id", "source", strip_html(F.col("text")).alias("text"))
    )
    det = detect_language(clean, buckets=256)
    tagged_df = cut_lineage(clean.join(det.select("doc_id", "lang"), "doc_id"))
    lm = bigram_lm_scores(tagged_df, alpha=0.1, group_col="lang")
    keep = lm.filter(F.col("lm_xent") <= float(_V3_LM_MAX)).select("doc_id")
    gated = tagged_df.join(keep, "doc_id", "semi")
    filt = filter_documents(gated, min_tokens=5, min_quality=0.3, langs=None)
    scored = cut_lineage(
        filt.withColumn("_len", F.length(F.col("text")).cast("bigint"))
    )
    k = 5
    sh = cut_lineage(
        scored.select(
            F.col("doc_id").cast("bigint").alias("id"),
            F.transform(D.char_shingles(F.col("text"), k), D.md5_hash60).alias("_arr"),
        )
    )
    sh.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        t0 = time.time()
        fn()
        print(f"{name}: {time.time()-t0:.1f}s", flush=True)

    expl_str = scored.select(
        F.col("doc_id").cast("bigint").alias("id"),
        F.explode(D.char_shingles(F.col("text"), k)).alias("sh"),
    )
    expl_long = sh.select("id", F.explode("_arr").alias("e"))

    def arm_a():
        aggs = [
            F.min(F.shiftright(F.xxhash64("sh", F.lit(64 + i)), 32).cast("int")).alias(f"_g{i}")
            for i in range(N)
        ]
        noop(expl_str.groupBy("id").agg(*aggs))

    def arm_b():
        aggs = [
            F.min(F.shiftright(F.xxhash64("e", F.lit(64 + i)), 32).cast("int")).alias(f"_g{i}")
            for i in range(N)
        ]
        noop(expl_long.groupBy("id").agg(*aggs))

    def arm_c():
        h = N // 2
        a1 = expl_long.groupBy("id").agg(*[
            F.min(F.shiftright(F.xxhash64("e", F.lit(64 + i)), 32).cast("int")).alias(f"_g{i}")
            for i in range(h)
        ])
        a2 = expl_long.groupBy("id").agg(*[
            F.min(F.shiftright(F.xxhash64("e", F.lit(64 + i)), 32).cast("int")).alias(f"_g{i}")
            for i in range(h, N)
        ])
        noop(a1.join(a2, "id"))

    def arm_d():
        spark.conf.set("spark.sql.codegen.maxFields", "256")
        try:
            arm_b()
        finally:
            spark.conf.set("spark.sql.codegen.maxFields", "100")

    def arm_e():
        # array-of-mins via a single aggregate on a transformed array:
        # min_by-free formulation — explode-free: per doc, transform the
        # (already distinct) md5 array N ways inside one projection, then
        # array_min each; no shuffle at all (arrays already per-doc).
        cols = [
            F.array_min(
                F.transform("_arr", lambda e: F.shiftright(F.xxhash64(e, F.lit(64 + i)), 32).cast("int"))
            ).alias(f"_g{i}")
            for i in range(N)
        ]
        noop(sh.select("id", *cols))

    for r in range(reps):
        print(f"--- rep {r}", flush=True)
        t("A string 192x1", arm_a)
        t("B long   192x1", arm_b)
        t("C long    96x2", arm_c)
        t("D long 192x1 maxFields=256", arm_d)
        t("E long  per-doc transform (no shuffle)", arm_e)


if __name__ == "__main__":
    main()
