"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed through Arrow-batched mapInPandas.

The decode step itself is STUBBED — the image/audio libraries are not in this
container — behind ``decoder`` callables: the default ``fake_decoder`` is a
deterministic pure-Python stand-in (size + byte-hash features) so the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature) is real
and tested; swap in a real decoder (PIL/librosa/ffmpeg) by passing
``decoder=``. A strict ``not_implemented_decoder`` raises, documenting the
production contract.

Scale: media rows are large — repartition by byte-size budget before decode so
each Arrow batch fits executor memory; keep ``spark.sql.execution.arrow.
maxRecordsPerBatch`` low for multi-MB blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),   # opaque encoded bytes
        StructField("meta", StringType()),      # JSON sidecar (format, dims, …)
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def not_implemented_decoder(payload: bytes, kind: str) -> list[float]:
    raise NotImplementedError(
        "real media decoding requires PIL/librosa/ffmpeg — not available in "
        "this container; inject a decoder via extract_features(decoder=...)"
    )


def fake_decoder(payload: bytes, kind: str, n_features: int = 8) -> list[float]:
    """Deterministic stand-in 'decode': md5-derived feature vector. Exercises
    the full Arrow round-trip with stable outputs for tests."""
    h = hashlib.md5(payload or b"").digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65535.0 for i in range(n_features)]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = fake_decoder,
    batch_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """media DF (MEDIA_SCHEMA) → features DF (FEATURE_SCHEMA) via
    mapInPandas. The iterator form keeps memory at one Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(bytes(p) if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* stub: emits (media_id, frame_idx) rows for
    frames 0, n, 2n… based on the meta JSON's frame_count — the distributed
    bookkeeping half of frame extraction (the pixel half needs ffmpeg)."""
    fc = F.coalesce(
        F.get_json_object("meta", "$.frame_count").cast("bigint"), F.lit(0)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(fc - 1, F.lit(0)), F.lit(every_n))).alias(
            "frame_idx"
        ),
    ).filter(F.col("frame_idx") < fc)
