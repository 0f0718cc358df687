"""JSONL document ingest — the wire format training corpora actually arrive
in (one JSON object per line: web crawls, API dumps, annotation exports).

Spark-first: `spark.read.json` with an EXPLICIT schema — never inferred.
Schema inference reads the data twice and silently unions divergent shapes;
at 100 TB the second pass alone is the whole job. Unknown keys are dropped by
the schema projection; corrupt lines land in `_corrupt_record` (PERMISSIVE)
so ingest never dies mid-scan and bad lines are auditable instead of lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: the documents-table shape (TESTDATA.md): doc_id, text, lang, source
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document corpus. Returns (docs, corrupt): `docs` has the
    schema's typed columns with `n_chars` appended (parity with the parquet
    documents table); `corrupt` holds the raw text of unparseable lines for
    auditing. Both come from ONE distributed scan — the corrupt split is a
    filter, not a second read. The scan is cached because Spark refuses
    queries that reference only `_corrupt_record` on a raw file scan (the
    documented pattern); the cache is lazy, so a caller that never touches
    `corrupt` pays nothing extra beyond first materialization."""
    raw = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path).cache()
    good = raw.filter(F.col("_corrupt_record").isNull() & F.col("doc_id").isNotNull())
    docs = good.select(
        F.col("doc_id").cast("bigint"),
        "text",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("line")
    )
    return docs, corrupt


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Write a documents DF back out as JSONL (the export half: curated
    corpus → training-job input). Plain `df.write.json` — one file per
    partition, parallel, no driver serialization loop."""
    docs.write.mode("overwrite").json(path)
