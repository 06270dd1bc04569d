"""Streaming exact deduplication across micro-batches.

For continuously-ingested corpora: drop any document whose normalized
fingerprint was already seen, with state bounded by a watermark (a
duplicate arriving later than the watermark horizon is not caught —
the retention/recall trade every streaming dedup makes; set the
watermark to the realistic duplicate-arrival window).

Built on ``dropDuplicates`` over the same ``doc_fingerprint`` the batch
``exact_dedup`` uses, so batch and streaming agree on what counts as a
duplicate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit only first-seen documents (by normalized-text fingerprint).

    With ``ts_col`` the dedup state is watermark-bounded
    (``dropDuplicatesWithinWatermark``): safe on unbounded streams.
    Without it, state grows with distinct documents — only for bounded
    backfills.
    """
    keyed = stream.withColumn("__fp", doc_fingerprint(F.col(text_col)))
    if ts_col is not None:
        deduped = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__fp"]
        )
    else:
        deduped = keyed.dropDuplicates(["__fp"])
    return deduped.drop("__fp")
