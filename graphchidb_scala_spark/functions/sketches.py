"""Distributed sketches with cross-engine-exact results.

The usual objection to oracle-checking sketch operators is that every engine
seeds its hash differently, so estimates never match. Here the HyperLogLog
is built from the repo's portable 60-bit md5 hash
(:func:`~graphchidb_scala_spark.functions.dedup.md5_hash60` — DuckDB computes
the identical value), and the estimator arithmetic sticks to IEEE-double
operations both engines evaluate the same way, so the *estimate itself* is
deterministic and hash-match verifiable, not just "close".

Scale shape (the point of a sketch): per group, at most ``m = 2**p`` register
rows survive the first aggregation — the data-sized shuffle carries
(group, bucket, partial-max) triples with map-side combine, and the second
aggregation sees ≤ m rows per group regardless of corpus size. This is the
count-distinct that works when exact ``count(distinct)`` would shuffle the
full key universe at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from graphchidb_scala_spark.functions.dedup import md5_hash60


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias correction for m >= 128
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_cols(value_col: str, p: int):
    """(bucket, rho) Column pair for one value — the per-row half of the
    sketch, shared by the batch aggregate and the streaming stateful op."""
    tail_bits = 60 - p
    h = md5_hash60(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, tail_bits)
    tail = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    bitlen = F.when(tail == F.lit(0), F.lit(0)).otherwise(
        F.length(F.conv(tail, 10, 2))
    )
    return bucket, F.lit(tail_bits + 1) - bitlen


def hll_estimate_py(registers, p: int) -> float:
    """Python-side estimator over a dense register array (missing buckets =
    0) — the same arithmetic as the SQL/Column form, used by the streaming
    stateful op where the registers live in group state."""
    m = 1 << p
    s = sum(2.0 ** (-int(r)) for r in registers)
    zeros = sum(1 for r in registers if int(r) == 0)
    raw = _alpha(m) * m * m / s
    if raw <= 2.5 * m and zeros > 0:
        import math

        return round(m * math.log(m / zeros), 4)
    return round(raw, 4)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group — DF(*group_cols,
    out_col), estimate rounded to 4dp. ``p`` register bits (m = 2**p
    registers, ~1.04/sqrt(m) relative error); includes the small-range
    linear-counting correction, so it is accurate from tens to billions.

    bucket = top ``p`` bits of the 60-bit md5 hash; rho = leading-zero count
    of the remaining ``60-p`` bits + 1 (computed exactly via the binary
    digit-length, no floating log on the hot path)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    bucket, rho_col = hll_register_cols(value_col, p)
    rho = rho_col.alias("_rho")
    gb = [F.col(c) for c in group_cols]
    registers = (
        df.select(*gb, bucket.alias("_bkt"), rho)
        .groupBy(*gb, "_bkt")
        .agg(F.max("_rho").alias("_mr"))
    )
    agg = registers.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("_v"),
        F.sum(F.pow(F.lit(2.0), -F.col("_mr"))).alias("_s"),
    )
    zeros = (F.lit(m) - F.col("_v")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / (F.col("_s") + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*gb, F.round(est, 4).alias(out_col))


def hll_distinct_sql(
    table: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 12,
    out_col: str = "approx_distinct",
) -> str:
    """The DuckDB twin of :func:`hll_distinct` — identical hash, identical
    register math, identical float literals, so the estimates hash-match."""
    m = 1 << p
    tail_bits = 60 - p
    mask = (1 << tail_bits) - 1
    gsel = ", ".join(group_cols)
    gpre = f"{gsel}, " if group_cols else ""
    gby = f"GROUP BY {gsel}" if group_cols else ""
    return f"""
WITH h AS (
  SELECT {gpre}CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM {table}
),
b AS (
  SELECT {gpre}hv >> {tail_bits} AS bkt, hv & {mask} AS tail FROM h
),
r AS (
  SELECT {gpre}bkt,
         max({tail_bits + 1} - (CASE WHEN tail = 0 THEN 0 ELSE length(to_base(tail, 2)) END)) AS mr
  FROM b GROUP BY {gpre}bkt
),
agg AS (
  SELECT {gpre}CAST(count(*) AS DOUBLE) AS v, sum(power(2.0, -mr)) AS s
  FROM r {gby}
),
est AS (
  SELECT {gpre}{m} - v AS zeros, {_alpha(m) * m * m!r} / (s + ({m} - v)) AS raw
  FROM agg
)
SELECT {gpre}round(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
             THEN {float(m)!r} * ln({float(m)!r} / zeros) ELSE raw END, 4) AS {out_col}
FROM est
""".strip()
