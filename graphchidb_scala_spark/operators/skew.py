"""Skew mitigation for hot keys (celebrity vertices).

A power-law graph has vertices whose degree is orders of magnitude above the
mean; hashing by vertex id then sends a whole hot neighborhood to one
partition and the stage runs at the speed of that straggler. Two standard
remedies, both deterministic (no rand() — results must hash-match oracles):

- salted two-stage aggregation: spread each key over ``salt`` sub-keys via a
  hash of the remaining columns, partial-aggregate, then merge. The partial
  shuffle is uniform; the final shuffle carries ``salt`` rows per key.
- salted broadcast-replicated join: replicate the small side ``salt`` times
  and split the big side's hot keys across the replicas.

AQE's skew-join handling (spark.sql.adaptive.skewJoin, on by default in our
sessions) already splits oversized partitions at runtime; these helpers are
for the aggregation case AQE does not cover and for forcing a known-skewed
layout instead of waiting for runtime detection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salt_col(df_cols: Sequence[str], n: int) -> Column:
    """Deterministic salt in [0, n): hash of all non-key columns."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df_cols]), F.lit(int(n)))


def salted_count(
    df: DataFrame, key: str, salt: int = 16, out_col: str = "cnt"
) -> DataFrame:
    """groupBy(key).count() in two stages so a hot key cannot pin one
    reducer: partial counts over (key, salt), then a merge over key whose
    input is at most ``salt`` rows per key."""
    other = [c for c in df.columns if c != key]
    salted = df.withColumn("_salt", salt_col(other or [key], salt))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias(out_col))


def salted_sum(
    df: DataFrame, key: str, value: str, salt: int = 16, out_col: str = "total"
) -> DataFrame:
    """groupBy(key).sum(value), salted two-stage (see salted_count)."""
    other = [c for c in df.columns if c != key]
    salted = df.withColumn("_salt", salt_col(other or [key], salt))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_s"))
    return partial.groupBy(key).agg(F.sum("_s").alias(out_col))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 16
) -> DataFrame:
    """Shuffle join big ⋈ small on ``key`` with the smaller side replicated
    ``salt`` times and the big side's rows deterministically spread across
    replicas, so a hot key's rows shuffle to ``salt`` partitions instead of
    pinning one reducer. (If the small side fits in a broadcast there is no
    skew problem — use a plain broadcast join; this is for when it doesn't.)
    Inner join; columns = big's then small's non-key columns."""
    replicas = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1)))
    )
    other = [c for c in big.columns if c != key]
    salted_big = big.withColumn("_salt", salt_col(other or [key], salt))
    return salted_big.join(replicas, [key, "_salt"], "inner").drop("_salt")
