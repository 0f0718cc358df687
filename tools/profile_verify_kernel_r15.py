"""r15 kernel A/B on the capstone's crossing candidates (production shape:
ratio bound in-join, distinct-first, broadcast regime, est2 engaged).

Arms over the SAME materialized distinct candidate table:
  E  (production r14): est1 sig_prune -> est2 prune -> exact       (4 joins)
  S  (skip est1):      est2 prune -> exact                         (2 joins)
  C  (combined bcast): ONE join pair fetching struct(t1, t2),
                       filter est1 bar then est2 bar -> exact      (2 joins)
All arms must return the same verified row count (exact verify absorbs
any prune-superset difference).

Also times the distinct-candidate materialization variants:
  rr   distinct().repartition(P)            (production: round-robin + sort)
  hash distinct().repartition(P, id_a,id_b) (numbered hash pin, no sort)
  none distinct()                           (AQE-coalesced)

Usage: python tools/profile_verify_kernel_r15.py [sf_dir] [reps]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("verify-kernel-r15")
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

    num_hashes, bands, k, threshold = 64, 32, 5, 0.5
    rows_per_band = num_hashes // bands
    ratio_tau = D._prefilter_tau(threshold)
    sig_arr = cut_lineage(
        D.minhash_signatures(scored, id_col="doc_id", text_col="text",
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
    sh = cut_lineage(
        scored.select(
            F.col("doc_id").cast("bigint").alias("id"),
            F.transform(D.char_shingles(F.col("text"), k), D.md5_hash60).alias("_arr"),
        ).withColumn("n", F.size("_arr"))
    )

    edges = D.band_bucket_star_edges(bkts, n_par)
    sh_v, _ = D._verify_side(sh)
    sh_vm = sh_v.drop("n")
    sigs_v = F.broadcast(sig_arr.select("id", "sig"))
    tag = D._pos_tagged_sig(F.col("sig"), width=num_hashes)

    def sig_prune(cand):
        return (
            cand.join(sigs_v.select(F.col("id").alias("id_a"), tag.alias("_ta")), "id_a")
            .join(sigs_v.select(F.col("id").alias("id_b"), tag.alias("_tb")), "id_b")
            .filter(
                F.size(F.array_intersect("_ta", "_tb"))
                >= float(threshold) / 2.0 * F.size("_ta")
            )
            .drop("_ta", "_tb")
        )

    def exact(cand):
        return (
            cand.join(sh_vm.select(F.col("id").alias("id_a"), F.col("_arr").alias("_sa")), "id_a")
            .join(sh_vm.select(F.col("id").alias("id_b"), F.col("_arr").alias("_sb")), "id_b")
            .filter(
                (F.size("_sb") >= ratio_tau * F.size("_sa"))
                & (F.size("_sa") >= ratio_tau * F.size("_sb"))
            )
            .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
            .filter(
                F.round(F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4)
                >= threshold
            )
        )

    star_lbl = D.near_duplicate_clusters(
        cut_lineage(exact(sig_prune(edges)).select("id_a", "id_b"))
    )
    bkts_m = cut_lineage(bkts.select(F.col("id").cast("bigint").alias("id"), "bkt"))
    labels = cut_lineage(
        bkts_m.select("id").distinct()
        .join(D._broadcast_if_small_ids(star_lbl), "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
    )
    sh_n = sh.select("id", "n")
    lb = cut_lineage(
        bkts_m.join(D._broadcast_if_small_ids(labels), "id")
        .join(F.broadcast(sh_n), "id")
        .select("id", "bkt", "n", F.col("cluster").alias("_lbl"))
    )
    raw = D.salted_label_crossing_candidates(lb, n_par, salts=1, ratio_tau=ratio_tau)

    # ---- distinct-materialization variants (cut + count, interleaved)
    for r in range(reps):
        for name, frame in (
            ("rr  ", raw.distinct().repartition(n_par)),
            ("hash", raw.distinct().repartition(n_par, "id_a", "id_b")),
            ("none", raw.distinct()),
        ):
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.time()
            d = cut_lineage(frame)
            n = d.count()
            print(f"dist[{name}] rep{r}: rows={n} {time.time()-t0:.1f}s", flush=True)

    dist = cut_lineage(raw.distinct().repartition(n_par))
    n_dist = dist.count()
    print(f"candidates: {n_dist}", flush=True)

    # production est2 input: the md5-60 pre-hashed longs from sh
    t0 = time.time()
    sig2 = D._minhash_sig2_table(
        sh.select("id", F.explode("_arr").alias("sh")), seed_offset=num_hashes
    )
    sig2_b = F.broadcast(sig2)
    print(f"sig2 build: {time.time()-t0:.1f}s", flush=True)

    # combined broadcast: one table carrying BOTH tagged arrays
    tag2 = D._pos_tagged_sig(F.col("sig2"), mask_bits=32, width=D._EST2_HASHES)
    comb = F.broadcast(
        cut_lineage(
            sig_arr.select("id", tag.alias("_t1"))
            .join(sig2.select("id", tag2.alias("_t2")), "id")
        )
    )
    bar2 = D._est2_cut(threshold)

    def combined(cand):
        return (
            cand.join(
                comb.select(F.col("id").alias("id_a"),
                            F.col("_t1").alias("_ta"), F.col("_t2").alias("_t2a")),
                "id_a",
            )
            .join(
                comb.select(F.col("id").alias("id_b"),
                            F.col("_t1").alias("_tb"), F.col("_t2").alias("_t2b")),
                "id_b",
            )
            .filter(
                F.size(F.array_intersect("_ta", "_tb"))
                >= float(threshold) / 2.0 * F.size("_ta")
            )
            .filter(
                F.size(F.array_intersect("_t2a", "_t2b"))
                >= F.lit(bar2) * F.size("_t2a")
            )
            .drop("_ta", "_tb", "_t2a", "_t2b")
        )

    def t(name, df):
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        t0 = time.time()
        n = df.count()
        print(f"{name}: rows={n} {time.time()-t0:.1f}s", flush=True)

    for r in range(reps):
        print(f"--- rep {r}", flush=True)
        t("E prod est1->est2->exact", exact(D._sig2_prune(sig_prune(dist), sig2_b, threshold)))
        t("S est2-only->exact      ", exact(D._sig2_prune(dist, sig2_b, threshold)))
        t("C combined->exact       ", exact(combined(dist)))


if __name__ == "__main__":
    main()
