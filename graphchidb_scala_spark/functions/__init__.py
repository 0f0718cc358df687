"""Large-scale training-data pipeline functions: text analysis, dedup,
similarity search, multimodal column plumbing. These go beyond the reference's
surface (which has no scalar-function library, SURVEY.md §2.11) and are
first-class operators of this engine."""

from graphchidb_scala_spark.functions import (
    dedup,
    events,
    multimodal,
    pipeline,
    search,
    similarity,
    sketches,
    text,
)

__all__ = [
    "dedup",
    "events",
    "multimodal",
    "pipeline",
    "search",
    "similarity",
    "sketches",
    "text",
]
