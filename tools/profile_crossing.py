"""Measure the crossing-repair candidate mass tiers inside
minhash_cluster_members(verify=True) on the capstone's scored input:
raw crossing candidates -> sig-prune survivors -> est2 survivors ->
distinct -> exact-verified, with wall seconds per tier.

Usage: python tools/profile_crossing.py [sf_dir]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("crossing-profile")
    spark.sparkContext.setLogLevel("ERROR")
    n_par = spark.sparkContext.defaultParallelism
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .repartition(n_par)
        .cache()
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
    tagged = cut_lineage(clean.join(det.select("doc_id", "lang"), "doc_id"))
    lm = bigram_lm_scores(tagged, alpha=0.1, group_col="lang")
    keep = lm.filter(F.col("lm_xent") <= float(_V3_LM_MAX)).select("doc_id")
    gated = tagged.join(keep, "doc_id", "semi")
    filt = filter_documents(gated, min_tokens=5, min_quality=0.3, langs=None)
    scored = cut_lineage(
        filt.withColumn("_len", F.length(F.col("text")).cast("bigint"))
    )

    id_col, text_col, num_hashes, bands, k, threshold = (
        "doc_id", "text", 64, 32, 5, 0.5,
    )
    rows_per_band = num_hashes // bands
    sig_arr = cut_lineage(
        D.minhash_signatures(scored, id_col=id_col, text_col=text_col,
                             num_hashes=num_hashes, k=k)
    )
    bucket_cols = [
        F.concat_ws(
            ",", F.lit(str(b)),
            F.xxhash64(
                *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
            ).cast("string"),
        )
        for b in range(bands)
    ]
    bkts = cut_lineage(
        sig_arr.select("id", F.explode(F.array(*bucket_cols)).alias("bkt"))
    )
    parallelism = n_par
    edges = D.band_bucket_star_edges(bkts, parallelism)
    print("star edges:", edges.count(), flush=True)

    sh = cut_lineage(
        scored.select(
            F.col(id_col).cast("bigint").alias("id"),
            F.transform(D.char_shingles(F.col(text_col), k), D.md5_hash60).alias("_arr"),
        ).withColumn("n", F.size("_arr"))
    )
    n_docs = sh.filter(F.col("n") > 0).count()
    print("n_docs:", n_docs, flush=True)
    sigs_m = sig_arr.select("id", "sig")
    sigs_v = F.broadcast(sigs_m)
    est_agree = F.aggregate(
        F.zip_with("_siga", "_sigb", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    )

    def sig_prune(cand):
        return (
            cand.join(sigs_v.select(F.col("id").alias("id_a"), F.col("sig").alias("_siga")), "id_a")
            .join(sigs_v.select(F.col("id").alias("id_b"), F.col("sig").alias("_sigb")), "id_b")
            .filter(est_agree >= float(threshold) / 2.0 * F.size("_siga"))
            .drop("_siga", "_sigb")
        )

    # star round (verified) + labels, as the operator does
    sh_v, _b = D._verify_side(sh)
    sh_v = sh_v.drop("n")

    def verify(cand):
        c = sig_prune(cand)
        return (
            c.join(sh_v.select(F.col("id").alias("id_a"), F.col("_arr").alias("_sa")), "id_a")
            .join(sh_v.select(F.col("id").alias("id_b"), F.col("_arr").alias("_sb")), "id_b")
            .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
            .filter(
                F.round(F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4)
                >= threshold
            )
            .select("id_a", "id_b")
        )

    star_lbl = D.near_duplicate_clusters(cut_lineage(verify(edges)))
    bkts_m = cut_lineage(bkts.select(F.col("id").cast("bigint").alias("id"), "bkt"))
    labels = cut_lineage(
        bkts_m.select("id").distinct()
        .join(D._broadcast_if_small_ids(star_lbl), "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
    )
    print("distinct star labels:", labels.select("cluster").distinct().count(), flush=True)
    lb = cut_lineage(
        bkts_m.join(D._broadcast_if_small_ids(labels), "id").select(
            "id", "bkt", F.col("cluster").alias("_lbl")
        )
    )
    G = D.crossing_salt_factor(lb, parallelism)
    print("salt factor G:", G, flush=True)

    t0 = time.time()
    cross_raw = D.salted_label_crossing_candidates(lb, parallelism, salts=G)
    n_raw = cross_raw.count()
    print(f"raw crossing candidates: {n_raw} ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    n_pruned = sig_prune(cross_raw).count()
    print(f"after sig_prune (tau/2 agreement): {n_pruned} ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    n_dist = sig_prune(cross_raw).distinct().count()
    print(f"after distinct: {n_dist} ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    pruned = sig_prune(cross_raw).distinct().repartition(parallelism)
    n_ver = (
        pruned.join(sh_v.select(F.col("id").alias("id_a"), F.col("_arr").alias("_sa")), "id_a")
        .join(sh_v.select(F.col("id").alias("id_b"), F.col("_arr").alias("_sb")), "id_b")
        .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
        .filter(
            F.round(F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4)
            >= threshold
        )
        .count()
    )
    print(f"exact-verified: {n_ver} ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
