"""Continuous curated ingestion: WET drop-zone → gated documents.

Extension (the reference has no streaming surface, SURVEY.md §2.8).
Composes the round-6 pieces into the one-call streaming form of
``examples/wet_pipeline.py``: shards landing under a path are parsed
(:func:`hermes_spark.sources.warc.stream_warc`), sanitized
(``wet_text``), line-cleaned (``c4_clean``) and rule-gated
(``gopher_quality_flags``) — all stateless expression stages, so the
stream never shuffles and batch/stream equivalence is exact (pinned by
test).

Deduplication is deliberately NOT fused in: exact/near dedup needs
state, and the right variant is deployment-specific — chain
``hermes_spark.streaming.stream_exact_dedup`` (watermarked) or
``stream_minhash_dedup`` (persistent signature store) on the returned
stream, keyed on ``doc_fingerprint(text)`` or
``canonical_url(target_uri)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.c4 import c4_clean
from ..operators.gopher import gopher_filter
from ..sources.warc import WARC_GLOB, stream_warc, wet_text


def curated_wet_stream(
    spark: SparkSession,
    path: str,
    min_line_words: int = 3,
    gopher_thresholds: dict | None = None,
    max_payload: int = 1 << 20,
    glob: str | None = WARC_GLOB,
    max_files_per_trigger: int | None = None,
    script_aware: bool = False,
) -> DataFrame:
    """Streaming DataFrame ``(doc_id, target_uri, warc_date, text,
    n_lines_in, n_lines_kept)`` of cleaned, gate-passing WET documents.

    ``script_aware=True`` switches the C4/Gopher gates to the
    character word proxy for Han/Kana/Thai documents (round 11 — a
    multilingual crawl is exactly where a streaming drop-zone shows
    up; without the flag its unsegmented-script share gates to ~0%).
    Latin documents are judged identically either way, and the gates
    stay pure scan expressions, so the stream stays stateless.

    Attach any sink/trigger::

        curated_wet_stream(spark, dropzone)\\
            .writeStream.format("parquet").option("path", out)\\
            .option("checkpointLocation", ckpt)\\
            .trigger(availableNow=True).start()
    """
    records = stream_warc(
        spark,
        path,
        types=("conversion",),
        max_payload=max_payload,
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )
    docs = wet_text(records).select(
        F.col("record_id").alias("doc_id"),
        "target_uri",
        "warc_date",
        "text",
    )
    cleaned = c4_clean(
        docs, "doc_id", "text",
        min_line_words=min_line_words,
        keep_cols=("target_uri", "warc_date"),  # a re-join would be a
        # stateful stream-stream join; carried through the projection
        script_aware=script_aware,
    )
    return gopher_filter(
        cleaned, "doc_id", "text", script_aware=script_aware,
        **(gopher_thresholds or {})
    ).select(
        "doc_id", "target_uri", "warc_date", "text",
        "n_lines_in", "n_lines_kept",
    )
