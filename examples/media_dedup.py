"""Perceptual media dedup example: the image/audio/video near-dup
family end-to-end on synthesized-but-really-encoded media.

Composes the round-12 perceptual operators the way a crawl pipeline
would:

  1. batch IMAGE near-dup pairs (pHash + banded hamming join) on a
     corpus with planted recompressed/brightness-shifted copies;
  2. cross-batch incremental dedup against a persisted banded
     fingerprint store (`fingerprint_dedup_against`) — month 2 of a
     crawl never re-decodes month 1;
  3. AUDIO near-dup pairs (spectral band-difference fingerprint) on
     gain-changed re-encodes;
  4. VIDEO near-dup pairs (frame-hash containment) on re-encoded and
     trimmed copies.

All media are REAL encoded bytes (PNG/JPEG/WAV via operators/codecs);
only the video container is synthetic (no video codec ships here —
`synthetic_frame_decoder` marks the ffmpeg swap point).

Usage (from the repo root):

    python examples/media_dedup.py
"""

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.operators import (
    audio_near_dup_pairs,
    fingerprint_banded_rows,
    fingerprint_dedup_against,
    image_near_dup_pairs,
    image_phash,
    video_near_dup_pairs,
)
from hermes_spark.operators.codecs import (
    encode_jpeg,
    encode_png,
    encode_wav,
    synthetic_audio,
    synthetic_image,
)
from hermes_spark.operators.multimodal import (
    synthetic_frame_decoder,
    synthetic_video_bytes,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("media-dedup-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. batch image near-dup ------------------------------------------
    rows = []
    for i in range(40):
        base = synthetic_image(i)
        rows.append((i * 3, bytearray(encode_png(base))))
        rows.append((i * 3 + 1, bytearray(encode_jpeg(base))))  # recompressed
        bright = np.clip(base.astype(np.int64) + 15, 0, 255).astype(np.uint8)
        rows.append((i * 3 + 2, bytearray(encode_png(bright))))  # edited copy
    images = spark.createDataFrame(rows, ["img_id", "media"])
    pairs = image_near_dup_pairs(images, "img_id", "media", max_hamming=6)
    print(f"image near-dup pairs: {pairs.count()} "
          f"(120 images, 80 planted copies)")

    # -- 2. incremental store: month 2 against month 1 --------------------
    tmp = tempfile.mkdtemp(prefix="media_dedup_")
    try:
        month1 = image_phash(images, "img_id", "media").select(
            "img_id", "phash"
        ).filter(F.col("phash").isNotNull())
        empty = fingerprint_banded_rows(month1.limit(0), "img_id", "phash")
        surv1, store_rows = fingerprint_dedup_against(
            month1, empty, "img_id", "phash", max_hamming=6
        )
        store_rows.write.mode("overwrite").parquet(f"{tmp}/store")
        print(f"month 1 accepted: {surv1.count()} unique images")

        m2_rows = [
            (1000 + i, bytearray(encode_jpeg(synthetic_image(i))))  # re-post
            for i in range(20)
        ] + [
            (2000 + i, bytearray(encode_png(synthetic_image(500 + i))))  # new
            for i in range(10)
        ]
        month2 = image_phash(
            spark.createDataFrame(m2_rows, ["img_id", "media"]),
            "img_id", "media",
        ).select("img_id", "phash").filter(F.col("phash").isNotNull())
        store = spark.read.parquet(f"{tmp}/store")
        surv2, _ = fingerprint_dedup_against(
            month2, store, "img_id", "phash", max_hamming=6
        )
        print(f"month 2: {len(m2_rows)} arrivals -> {surv2.count()} "
              f"survivors (20 re-posts dropped without re-decoding month 1)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # -- 3. audio near-dup -------------------------------------------------
    arows = []
    for i in range(20):
        clip = synthetic_audio(i)
        arows.append((i * 2, bytearray(encode_wav(clip, 16000))))
        arows.append((i * 2 + 1, bytearray(encode_wav(clip * 0.4, 16000))))
    audio = spark.createDataFrame(arows, ["clip_id", "media"])
    apairs = audio_near_dup_pairs(audio, "clip_id", "media", max_hamming=10)
    print(f"audio near-dup pairs: {apairs.count()} (20 gain-changed twins)")

    # -- 4. video near-dup -------------------------------------------------
    vrows = [
        (0, bytearray(synthetic_video_bytes(7))),
        (1, bytearray(synthetic_video_bytes(7, jpeg=True))),   # re-encode
        (2, bytearray(synthetic_video_bytes(7, start=2))),      # trimmed
        (3, bytearray(synthetic_video_bytes(99))),              # unrelated
    ]
    videos = spark.createDataFrame(vrows, ["vid", "media"])
    vpairs = video_near_dup_pairs(
        videos, "vid", "media", frame_decoder=synthetic_frame_decoder,
        min_overlap_frac=0.5,
    )
    print("video containment pairs:")
    vpairs.orderBy("id_a", "id_b").show()

    spark.stop()


if __name__ == "__main__":
    main()
