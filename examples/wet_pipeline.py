"""Web-corpus pipeline example: WET shards → cleaned, gated, deduped,
budget-mixed training shards — the full round-6 ingestion story.

Stages (each a zero- or one-shuffle pass):

  1. ``read_warc`` + ``wet_text`` — synthetic ``.wet.gz`` shards parsed
     one-task-per-shard, invalid UTF-8 sanitized;
  2. ``c4_clean`` — boilerplate lines dropped, poisoned docs removed;
  3. ``gopher_quality_flags`` — rule gate on the CLEANED text;
  4. ``exact_dedup`` — fingerprint keep-one;
  5. ``plan_epochs`` + ``epoch_mix`` — hit a token budget at a target
     source mix (upsampling scarce sources by fractional epochs);
  6. ``write_training_shards`` — bounded shard files + manifest.

Usage (from the repo root):

    python examples/wet_pipeline.py [n_shards] [--raw]

``--raw`` starts one step earlier in the crawl lifecycle: RAW WARC
``response`` shards (HTML body behind an HTTP envelope, the format
crawlers actually write) instead of pre-extracted WET text.  Stage 1
becomes ``read_warc`` + ``http_response_text(extractor="main")`` —
HTTP split, charset sanitation, and jusText-style main-content
extraction fused into the same one-task-per-shard scan — and the
chrome (nav/footer/cookie banners) never reaches the gates at all.
Every stage after that is IDENTICAL to the WET path, which is the
point: the engine ingests either crawl format into one pipeline.
"""

import gzip
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.operators import (
    c4_clean,
    epoch_mix,
    exact_dedup,
    gopher_quality_flags,
    gopher_repetition_filter,
    plan_epochs,
)
from hermes_spark.sources import read_warc, wet_text
from hermes_spark.sources.warc import http_response_text
from hermes_spark.sources.io import write_training_shards


def _record(uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:uuid:{uri}>\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def synthesize_shards(root: str, n_shards: int) -> None:
    """Deterministic fake crawl: two 'sources' with different volumes,
    some boilerplate lines, some exact duplicates."""
    for s in range(n_shards):
        recs = []
        for j in range(200):
            src = "blog" if (s * 200 + j) % 4 else "wiki"  # wiki is scarce
            if j % 10 == 0:  # mirrored syndicated page: exact duplicate
                body = (
                    f"The {src} syndicated article is byte-identical on every mirror.\n"
                    "Home | About | Contact\n"
                    f"It keeps the same second sentence on all of the {src} mirrors.\n"
                )
            else:
                body = (
                    f"The {src} article {s}-{j} has a first good sentence of the usual kind.\n"
                    "Home | About | Contact\n"
                    f"It also has that second sentence to keep the word count of doc {j} healthy.\n"
                    "We use cookies, see our cookie policy.\n"
                )
            recs.append(_record(f"http://{src}.example/{s}/{j}", body.encode()))
        with open(f"{root}/shard-{s:05d}.wet.gz", "wb") as f:
            f.write(b"".join(gzip.compress(r) for r in recs))


def _response_record(uri: str, html: str) -> bytes:
    body = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html
    ).encode()
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{uri}>\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def synthesize_raw_shards(root: str, n_shards: int) -> None:
    """The same fake crawl as :func:`synthesize_shards`, one lifecycle
    step earlier: full HTML pages (chrome included) behind HTTP
    envelopes in WARC ``response`` records."""
    nav = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    footer = ('<div><a href="/p">Privacy policy</a> We use cookies, '
              "see our cookie policy.</div>")
    for s in range(n_shards):
        recs = []
        for j in range(200):
            src = "blog" if (s * 200 + j) % 4 else "wiki"
            if j % 10 == 0:  # mirrored syndicated page: exact duplicate
                body = (
                    f"<p>The {src} syndicated article is byte-identical on "
                    "every mirror.</p><p>It keeps the same second sentence "
                    f"on all of the {src} mirrors.</p>"
                )
            else:
                body = (
                    f"<p>The {src} article {s}-{j} has a first good sentence "
                    "of the usual kind.</p><p>It also has that second "
                    f"sentence to keep the word count of doc {j} healthy.</p>"
                )
            html = f"<html><body>{nav}{body}{footer}</body></html>"
            recs.append(
                _response_record(f"http://{src}.example/{s}/{j}", html)
            )
        with open(f"{root}/shard-{s:05d}.warc.gz", "wb") as f:
            f.write(b"".join(gzip.compress(r) for r in recs))


def main() -> int:
    raw = "--raw" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_shards = int(args[0]) if args else 4
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("wet-pipeline-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="wet_pipeline_")
    try:
        if raw:
            synthesize_raw_shards(root, n_shards)
            recs = read_warc(spark, root, types=("response",))
            docs = http_response_text(recs, extractor="main").select(
                F.col("record_id").alias("doc_id"),
                F.regexp_extract("target_uri", r"http://(\w+)\.", 1).alias("source"),
                "text",
            )
            print(f"ingested (raw WARC, main-content extracted): "
                  f"{docs.count()} records from {n_shards} shards")
        else:
            synthesize_shards(root, n_shards)
            docs = wet_text(read_warc(spark, root, types=("conversion",))).select(
                F.col("record_id").alias("doc_id"),
                F.regexp_extract("target_uri", r"http://(\w+)\.", 1).alias("source"),
                "text",
            )
            print(f"ingested: {docs.count()} records from {n_shards} shards")

        cleaned = c4_clean(docs, "doc_id", "text", min_line_words=4)
        print(f"after c4_clean: {cleaned.count()} docs "
              f"(boilerplate lines stripped)")

        flags = gopher_quality_flags(cleaned, "doc_id", "text",
                                     min_words=15, min_stopwords=1)
        keep_ids = flags.filter("keep").select("doc_id")
        gated = cleaned.join(keep_ids, "doc_id", "left_semi")
        print(f"after gopher quality gate: {gated.count()} docs")

        # repetition gate LAST of the rule gates: it is the only one
        # that shuffles (per-doc gram frequencies), so it should see
        # the smallest corpus
        gated = gopher_repetition_filter(gated, "doc_id", "text")
        print(f"after gopher repetition gate: {gated.count()} docs")

        with_src = gated.join(docs.select("doc_id", "source"), "doc_id")
        deduped = exact_dedup(with_src, "doc_id", text_col="text")
        print(f"after exact dedup: {deduped.count()} docs")

        counts = {
            r["source"]: r["t"]
            for r in deduped.groupBy("source")
            .agg(F.sum(F.length("text")).alias("t"))
            .collect()
        }
        budget = int(sum(counts.values()) * 1.2)
        plan = plan_epochs(counts, {"wiki": 0.5, "blog": 0.5}, budget, max_epochs=4)
        print(f"token counts {counts} -> epoch plan {plan}")
        mixed = epoch_mix(deduped, "doc_id", "source", plan)
        print(f"after epoch mix: {mixed.count()} rows "
              f"(wiki upsampled toward the 50/50 target)")

        out = f"{root}/shards"
        sharded = mixed.select(
            "doc_id", "source", "epoch", "text",
            F.pmod(F.xxhash64("doc_id", "epoch"), F.lit(8)).alias("shard"),
        )
        manifest = write_training_shards(sharded, out, max_records_per_file=5000)
        print(f"wrote {manifest['n_shards']} shards, "
              f"total rows {manifest['total_rows']}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
