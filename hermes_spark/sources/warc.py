"""WARC / WET web-archive reader — the Common-Crawl ingestion format.

Extension beyond reference parity (the reference reads tabular formats
only; SURVEY.md §2 extension table).  Web-scale LLM corpora start life
as WARC shards (raw HTTP captures) or WET shards (extracted text), and
a curation engine that cannot open them forces a pre-processing hop
through another system.  This reader is dependency-free: the WARC
envelope is a simple header block + ``Content-Length`` payload, and
``.gz`` shards are concatenated gzip members, which Python's ``gzip``
decompresses natively.

Spark shape: one task per SHARD (``binaryFile`` source → ``mapInPandas``
record parser).  That is the standard parallelism unit for WARC work —
shards are ~1 GiB by convention, so a 100 TB crawl is ~100k tasks, and
no shard ever splits mid-record.  The parser is generator-based (one
record in memory at a time, payloads truncated at ``max_payload``), so
executor memory stays bounded regardless of record sizes.  Downstream,
``payload`` feeds ``strip_html`` → the C4/Gopher gates for WARC
responses, or decodes directly for WET conversion records.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    BinaryType,
)

WARC_SCHEMA = StructType([
    StructField("file", StringType()),
    StructField("record_id", StringType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("truncated", BooleanType()),
])


def parse_warc_records(
    raw: bytes, max_payload: int = 1 << 20
) -> Iterator[dict]:
    """Yield WARC records from one shard's bytes (gzip or plain).

    Tolerant of trailing garbage and malformed tails: parsing stops at
    the first record whose envelope cannot be read, yielding everything
    before it (a truncated shard loses its tail record, not the batch).
    """
    if raw[:2] == b"\x1f\x8b":  # gzip magic; members concatenate
        try:
            raw = gzip.decompress(raw)
        except Exception:
            return
    buf = io.BytesIO(raw)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost framing: stop rather than misparse
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(length)
        if len(payload) < length:
            return  # truncated shard tail
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "payload": payload[:max_payload],
            "n_bytes": length,
            "truncated": length > max_payload,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] = ("response", "conversion"),
    max_payload: int = 1 << 20,
) -> DataFrame:
    """DataFrame of WARC/WET records under ``path`` (``*.warc[.gz]``,
    ``*.wet[.gz]``).

    ``types`` filters on ``WARC-Type`` IN THE PARSER (request/metadata
    records are dropped before they ever reach Spark rows); pass ``()``
    to keep everything.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                out = []
                for rec in parse_warc_records(row["content"], max_payload):
                    if types and rec["warc_type"] not in types:
                        continue
                    rec["file"] = row["path"]
                    out.append(rec)
                if out:
                    yield pd.DataFrame(out, columns=[f.name for f in WARC_SCHEMA])

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def wet_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode WET conversion payloads to a ``text`` column (UTF-8,
    invalid bytes replaced) — the entry point into the text-curation
    operators (``c4_clean``, ``gopher_quality_flags``, dedup)."""
    return df.withColumn(
        "text",
        F.decode(F.col(payload_col), "UTF-8"),
    )
