"""WARC / WET web-archive reader — the Common-Crawl ingestion format.

Extension beyond reference parity (the reference reads tabular formats
only; SURVEY.md §2 extension table).  Web-scale LLM corpora start life
as WARC shards (raw HTTP captures) or WET shards (extracted text), and
a curation engine that cannot open them forces a pre-processing hop
through another system.  This reader is dependency-free: the WARC
envelope is a simple header block + ``Content-Length`` payload, and
``.gz`` shards are concatenated gzip members, which Python's
``gzip.GzipFile`` decompresses as a stream.

Spark shape: one task per SHARD (``binaryFile`` source → ``mapInPandas``
record parser).  That is the standard parallelism unit for WARC work —
shards are ~1 GiB by convention, so a 100 TB crawl is ~100k tasks, and
no shard ever splits mid-record.  The parser streams records off the
decompressor (peak memory = compressed shard + one record, payloads
truncated at ``max_payload``); a shard whose gzip stream is cut off
mid-download yields every record decompressed before the cut — the
tail record is lost, never the batch.  Downstream, ``payload`` feeds
``strip_html`` → the C4/Gopher gates for WARC responses, or decodes
directly for WET conversion records (``wet_text`` sanitizes invalid
UTF-8 — real crawl payloads routinely mis-declare charsets, and an
ANSI-strict decode would kill the whole job on the first bad record).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
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

#: Hadoop glob matching conventional WARC/WET shard names; pass
#: ``glob=None`` to read every file under the path.
WARC_GLOB = "*.{warc,wet}*"


def parse_warc_records(
    raw: bytes, max_payload: int = 1 << 20
) -> Iterator[dict]:
    """Yield WARC records from one shard's bytes (gzip or plain).

    Streaming and damage-tolerant: records are read one at a time off
    the (possibly gzip) stream, and ANY mid-record failure — truncated
    gzip member, cut-off payload, lost framing — ends iteration AFTER
    the records already yielded.  A corrupt shard therefore loses its
    tail, not the whole batch, and complete leading gzip members of a
    partially-downloaded shard survive.
    """
    if raw[:2] == b"\x1f\x8b":  # gzip magic; members concatenate
        buf = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        buf = io.BytesIO(raw)
    try:
        while True:
            line = buf.readline()
            while line in (b"\r\n", b"\n"):  # inter-record blank lines
                line = buf.readline()
            if not line or not line.startswith(b"WARC/"):
                return  # end of stream, or lost framing: stop cleanly
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
                return  # truncated tail record
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
    except (EOFError, OSError):
        # gzip stream cut off mid-record: keep what was yielded
        return


def _shard_parser(types: tuple[str, ...], max_payload: int):
    """The mapInPandas record loop shared VERBATIM by the batch and
    streaming readers — one implementation is what keeps their pinned
    equivalence true by construction."""

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

    return parse


#: Spark's ``binaryFile`` source materializes each file as ONE binary
#: column value, and byte arrays on the JVM cap at 2^31 - 1 bytes — a
#: larger shard fails mid-job with an opaque executor error.
BINARYFILE_MAX_BYTES = (1 << 31) - 1


def _check_shard_sizes(files: DataFrame) -> None:
    """Fail fast (clearly) on shards over the binaryFile 2 GiB column
    cap. Metadata-only: selecting ``path``/``length`` never loads file
    contents (binaryFile prunes the ``content`` column), so this is one
    cheap file-listing job at construction time instead of an opaque
    executor crash hours into the ingest."""
    over = (
        files.select("path", "length")
        .filter(F.col("length") > BINARYFILE_MAX_BYTES)
        .limit(5)
        .collect()
    )
    if over:
        names = ", ".join(f"{r['path']} ({r['length']} B)" for r in over)
        raise ValueError(
            "WARC shard(s) exceed Spark's binaryFile 2 GiB single-file "
            f"cap ({BINARYFILE_MAX_BYTES} bytes): {names}. Re-split the "
            "shards (the WARC convention is ~1 GiB) or pass "
            "check_sizes=False to attempt the read anyway."
        )


def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] = ("response", "conversion"),
    max_payload: int = 1 << 20,
    glob: str | None = WARC_GLOB,
    check_sizes: bool = True,
) -> DataFrame:
    """DataFrame of WARC/WET records under ``path``.

    ``glob`` (default ``*.{warc,wet}*``) keeps ``binaryFile`` from
    loading stray files (``_SUCCESS`` markers, checksums, unrelated
    blobs) into executor memory; ``types`` filters on ``WARC-Type`` IN
    THE PARSER (request/metadata records are dropped before they ever
    become Spark rows); pass ``()`` to keep everything.
    ``check_sizes`` (default on) runs one metadata-only listing job and
    raises a clear error if any shard exceeds the binaryFile 2 GiB
    column cap, instead of an opaque executor failure mid-ingest.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path)
    if check_sizes:
        _check_shard_sizes(files)
    return files.select("path", "content").mapInPandas(
        _shard_parser(types, max_payload), WARC_SCHEMA
    )


def stream_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] = ("response", "conversion"),
    max_payload: int = 1 << 20,
    glob: str | None = WARC_GLOB,
    max_files_per_trigger: int | None = None,
    check_sizes: bool = True,
) -> DataFrame:
    """Streaming variant of :func:`read_warc`: new shards landing under
    ``path`` are parsed incrementally (one micro-batch task per shard,
    exactly the batch parallelism), so a crawl drop-zone feeds the
    curation pipeline continuously.  ``max_files_per_trigger`` bounds
    the shards per micro-batch (ingestion backpressure).  Compose with
    ``wet_text`` and the zero-shuffle gates, then any streaming sink —
    the parser and record schema are identical to the batch path, which
    is what the batch/stream equivalence test pins.

    ``check_sizes`` validates the shards ALREADY in the drop-zone
    against the binaryFile 2 GiB cap at setup (a batch metadata
    listing); shards arriving later are necessarily unchecked — an
    oversized late arrival still fails its micro-batch, so keep the
    producer on the ~1 GiB shard convention.
    """
    if check_sizes:
        batch_reader = spark.read.format("binaryFile")
        if glob:
            batch_reader = batch_reader.option("pathGlobFilter", glob)
        try:
            _check_shard_sizes(batch_reader.load(path))
        except ValueError:
            raise
        except Exception:
            pass  # empty drop-zone at setup is fine; the stream waits
    reader = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(
        _shard_parser(types, max_payload), WARC_SCHEMA
    )


def wet_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode WET conversion payloads to a ``text`` column.

    ``CAST(binary AS STRING)`` + ``make_valid_utf8`` replaces invalid
    byte sequences with U+FFFD instead of failing — ``F.decode(...,
    'UTF-8')`` is ANSI-strict on Spark 4 and would abort the job on the
    first mis-encoded crawl payload.
    """
    return df.withColumn(
        "text",
        F.expr(f"make_valid_utf8(CAST({payload_col} AS STRING))"),
    )


def http_response_text(
    df: DataFrame,
    payload_col: str = "payload",
    extractor: str = "strip",
    keep_body: bool = False,
) -> DataFrame:
    """Turn raw WARC ``response`` payloads (HTTP envelope + HTML body)
    into ``(status_code, http_content_type, text)`` columns — the raw-
    crawl twin of :func:`wet_text`.

    The HTTP envelope is split at the first blank line with pure string
    expressions (no http library), the body is UTF-8-sanitized and
    converted to text, and the result pipes into the same curation
    gates as WET text.  Non-HTTP payloads yield a null status and the
    whole sanitized payload as text.

    ``extractor`` picks the markup-to-text strategy:

    * ``"strip"`` (default) — ``functions.text.strip_html``: the whole
      page flattened, WET-equivalent (navigation/footer chrome stays
      in, to be caught by downstream line/rule gates);
    * ``"main"`` — ``operators.maincontent.main_text_column``:
      jusText-style block classification, chrome dropped at the source
      (the higher-precision choice for training-corpus builds).

    Both are zero-shuffle scan expressions.

    ``keep_body=True`` additionally retains the sanitized HTML body as
    an ``html`` column — feed it to ``operators.weblinks`` (outlink /
    host-graph extraction for an authority prior) without re-parsing
    the WARC bytes.
    """
    from ..functions.text import strip_html
    from ..operators.maincontent import main_text_column

    if extractor not in ("strip", "main"):
        raise ValueError(f"extractor must be 'strip' or 'main', got {extractor!r}")

    s = F.expr(f"make_valid_utf8(CAST({payload_col} AS STRING))")
    # lenient servers emit LF-only headers (seen in real crawls): use
    # whichever blank-line separator occurs FIRST ("\n\n" cannot occur
    # inside "\r\n\r\n", so the earlier positive index is unambiguous)
    sep_crlf = F.instr(s, "\r\n\r\n")
    sep_lf = F.instr(s, "\n\n")
    use_lf = (sep_lf > 0) & ((sep_crlf == 0) | (sep_lf < sep_crlf))
    sep = F.when(use_lf, sep_lf).otherwise(sep_crlf)
    width = F.when(use_lf, F.lit(2)).otherwise(F.lit(4))
    header = F.when(sep > 0, F.substring(s, F.lit(1), (sep - 1).cast("int")))
    body = F.when(sep > 0, F.substring(s, (sep + width).cast("int"), F.length(s))).otherwise(s)
    status = F.regexp_extract(header, r"^HTTP/[0-9.]+ (\d{3})", 1)
    ctype = F.lower(F.regexp_extract(header, r"(?i)content-type:\s*([^;\r\n]+)", 1))
    out = (
        df.withColumn(
            "status_code",
            F.when(status != "", status.cast("int")),
        )
        .withColumn(
            # null (not '') when absent, matching status_code's sentinel
            "http_content_type",
            F.when(ctype != "", F.trim(ctype)),
        )
        .withColumn(
            "text",
            strip_html(body) if extractor == "strip" else main_text_column(body),
        )
    )
    if keep_body:
        out = out.withColumn("html", body)
    return out
