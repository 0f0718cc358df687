"""WARC (Web ARChive, ISO 28500) ingest — the format web-crawl training
corpora ship in (Common Crawl publishes ~100 TB crawls as millions of ~1 GB
WARC files). Spark-first shape: ONE binaryFile row per WARC file, records
parsed inside an Arrow mapInPandas pass — at crawl scale the natural
parallelism IS the file count (each task owns whole records, no record ever
spans tasks), so no custom Hadoop input format is needed.

The parser is pure stdlib: WARC/1.0–1.1 header blocks, Content-Length-framed
payloads, whole-file gzip transparently inflated (magic-byte check; Common
Crawl's per-record-member gzip concatenation inflates to the same byte
stream under zlib's multi-member decompress). Only ``response`` /
``conversion`` records become documents; the HTTP header block (when the
payload is an HTTP response) is stripped so ``text`` is the raw body —
compose with :func:`~..functions.text.strip_html` to get clean text
JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

WARC_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),      # stable hash of WARC-Record-ID
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("text", StringType()),      # raw payload body (HTTP headers stripped)
    ]
)

_DOC_TYPES = {"response", "conversion"}


def parse_warc_records(blob: bytes) -> list[dict]:
    """Parse one WARC file's bytes into document dicts (pure stdlib, no
    Spark) — the unit the tests pin. Gzip files (including concatenated
    per-record members, the Common Crawl layout) are inflated first."""
    import hashlib
    import zlib

    if blob[:2] == b"\x1f\x8b":
        # wbits=47 = gzip-or-zlib auto; loop over concatenated members
        out = bytearray()
        d = zlib.decompressobj(47)
        data = blob
        while data:
            out += d.decompress(data)
            if not d.eof:
                break
            data = d.unused_data
            d = zlib.decompressobj(47)
            if not data.strip(b"\x00"):
                break
        blob = bytes(out)
    docs: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and blob[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2 if blob[pos : pos + 2] == b"\r\n" else 1
        if not blob[pos : pos + 5] == b"WARC/":
            nxt = blob.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
        # NEARER separator wins: an LF-only record whose payload contains
        # a CRLF blank line must not have its header block swallow the
        # payload head (first-match-of-CRLF-anywhere would mis-frame it)
        crlf = blob.find(b"\r\n\r\n", pos)
        lf = blob.find(b"\n\n", pos)
        if crlf < 0 and lf < 0:
            break
        if lf < 0 or (0 <= crlf <= lf):
            hdr_end, sep = crlf, 4
        else:
            hdr_end, sep = lf, 2
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].decode("utf-8", "replace").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body = blob[hdr_end + sep : hdr_end + sep + length]
        pos = hdr_end + sep + length
        if headers.get("warc-type", "") not in _DOC_TYPES:
            continue
        # HTTP response payloads carry their own header block before the body
        if body[:5] in (b"HTTP/",):
            crlf = body.find(b"\r\n\r\n")
            lf = body.find(b"\n\n")
            if lf < 0 or (0 <= crlf <= lf):
                be, bsep = crlf, 4
            else:
                be, bsep = lf, 2
            if be >= 0:
                body = body[be + bsep :]
        rid = headers.get("warc-record-id", "")
        docs.append(
            {
                "doc_id": int.from_bytes(
                    hashlib.md5(rid.encode()).digest()[:8], "big", signed=True
                ),
                "record_id": rid,
                "url": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "text": body.decode("utf-8", "replace"),
            }
        )
    return docs


def read_documents_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC corpus → documents DataFrame (WARC_DOC_SCHEMA). One binaryFile
    row per WARC file; record parsing runs distributed inside mapInPandas
    (Arrow batches of whole files). At 100 TB the crawl is millions of
    ~1 GB files, so file-granular parallelism saturates any executor count;
    set ``spark.sql.files.maxPartitionBytes``/``binaryFile`` packing so one
    task holds a handful of files at a time."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_DOC_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_records(bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(run, WARC_DOC_SCHEMA)
