"""WARC/WET reader: record parsing, type filtering, gzip members,
truncation tolerance, and the pipe into the text-curation operators."""

import gzip

import pytest
from pyspark.sql import functions as F

from hermes_spark.sources.warc import parse_warc_records, read_warc, wet_text


def _record(warc_type: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{warc_type}-{len(payload)}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


SHARD = (
    _record("warcinfo", "", b"software: test")
    + _record("request", "http://a.example/", b"GET / HTTP/1.1")
    + _record("response", "http://a.example/", b"<html><body>Hello page A.</body></html>")
    + _record("conversion", "http://b.example/", "Extracted text. With two sentences.".encode())
)


def test_parse_all_records():
    recs = list(parse_warc_records(SHARD))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "conversion",
    ]
    assert recs[2]["target_uri"] == "http://a.example/"
    assert recs[2]["payload"].startswith(b"<html>")
    assert recs[3]["n_bytes"] == len("Extracted text. With two sentences.")


def test_parse_concatenated_gzip_members():
    # one gzip member per record is the on-disk Common-Crawl convention
    shard = b"".join(
        gzip.compress(_record("response", f"http://m{i}.example/", b"Page."))
        for i in range(3)
    )
    recs = list(parse_warc_records(shard))
    assert [r["target_uri"] for r in recs] == [
        "http://m0.example/", "http://m1.example/", "http://m2.example/",
    ]


def test_truncated_tails_keep_leading_records():
    # plain shard cut mid-payload: whole leading records survive
    cut = SHARD + _record("response", "http://c.example/", b"0123456789")[:-14]
    kept = list(parse_warc_records(cut))
    assert [r["warc_type"] for r in kept] == [
        "warcinfo", "request", "response", "conversion",
    ]
    # gzip shard cut mid-download (second member truncated): every
    # record of the complete first member survives, nothing raises
    two = gzip.compress(SHARD) + gzip.compress(
        _record("response", "http://c.example/", b"tail record data")
    )
    cut_gz = two[: len(gzip.compress(SHARD)) + 20]
    kept_gz = list(parse_warc_records(cut_gz))
    assert len(kept_gz) == 4


def test_payload_truncation_flag():
    recs = list(parse_warc_records(_record("response", "u", b"x" * 100), max_payload=10))
    assert recs[0]["truncated"] and len(recs[0]["payload"]) == 10
    assert recs[0]["n_bytes"] == 100


def test_read_warc_filters_types(spark, tmp_path):
    p = tmp_path / "shard-00000.warc.gz"
    p.write_bytes(gzip.compress(SHARD))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert sorted(r["warc_type"] for r in rows) == ["conversion", "response"]
    everything = read_warc(spark, str(tmp_path), types=()).count()
    assert everything == 4


def test_wet_text_sanitizes_invalid_utf8(spark, tmp_path):
    p = tmp_path / "bad.wet.gz"
    wet = _record("conversion", "http://bad.example/", b"good text \xff\xfe more")
    p.write_bytes(gzip.compress(wet))
    rows = wet_text(read_warc(spark, str(tmp_path), types=("conversion",))).collect()
    assert len(rows) == 1 and "good text" in rows[0]["text"]  # no ANSI crash


def test_glob_skips_stray_files(spark, tmp_path):
    (tmp_path / "shard.warc.gz").write_bytes(gzip.compress(SHARD))
    (tmp_path / "_SUCCESS").write_bytes(b"")
    (tmp_path / "notes.bin").write_bytes(b"\x00" * 128)
    assert read_warc(spark, str(tmp_path), types=()).count() == 4


def test_wet_text_into_curation_ops(spark, tmp_path):
    from hermes_spark.operators import c4_line_stats

    p = tmp_path / "shard.wet.gz"
    wet = _record(
        "conversion", "http://x.example/",
        "A good first sentence.\nMenu | Nav\nAnother full sentence here.".encode(),
    )
    p.write_bytes(gzip.compress(wet))
    docs = wet_text(read_warc(spark, str(tmp_path), types=("conversion",)))
    stats = c4_line_stats(docs, "record_id", "text").collect()[0]
    assert stats["n_lines_in"] == 3 and stats["n_lines_kept"] == 2


def test_stream_warc_matches_batch(spark, tmp_path):
    """New shards landing in the drop-zone stream through the same
    parser; the accumulated sink equals the batch read of everything."""
    src = tmp_path / "drop"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    from hermes_spark.sources.warc import stream_warc

    def run_stream():
        q = (
            wet_text(stream_warc(spark, str(src), types=("conversion",)))
            .select("record_id", "target_uri", "text")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "a.wet.gz").write_bytes(gzip.compress(
        _record("conversion", "http://a/", b"First doc text here.")))
    run_stream()
    (src / "b.wet.gz").write_bytes(gzip.compress(
        _record("conversion", "http://b/", b"Second doc text here.")
        + _record("request", "http://b/", b"GET /")))
    run_stream()

    streamed = spark.read.parquet(out)
    batch = wet_text(read_warc(spark, str(src), types=("conversion",))).select(
        "record_id", "target_uri", "text"
    )
    assert streamed.count() == 2
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_curated_wet_stream_matches_batch_pipeline(spark, tmp_path):
    """The one-call streaming ingest equals running the same stages in
    batch, and never plans a stateful join (all stages stateless)."""
    from hermes_spark.operators import c4_clean, gopher_filter
    from hermes_spark.streaming import curated_wet_stream

    src = tmp_path / "drop"
    src.mkdir()
    body = (
        "The article has a first good sentence with the usual words of that kind.\n"
        "Home | About\n"
        "It has that second sentence to keep the word count of the page healthy.\n"
    )
    shard = b"".join(
        _record("conversion", f"http://s.example/{j}", (body + f"Tail sentence {j} is here of course.\n").encode())
        for j in range(30)
    )
    (src / "a.wet.gz").write_bytes(gzip.compress(shard))

    out = str(tmp_path / "out")
    q = (
        curated_wet_stream(
            spark, str(src),
            gopher_thresholds={"min_words": 15, "min_stopwords": 1},
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(out).select("doc_id", "text")

    docs = wet_text(read_warc(spark, str(src), types=("conversion",))).select(
        F.col("record_id").alias("doc_id"), "text"
    )
    batch = gopher_filter(
        c4_clean(docs, "doc_id", "text"), "doc_id", "text",
        min_words=15, min_stopwords=1,
    ).select("doc_id", "text")
    assert streamed.count() == 30  # every synthetic doc passes the gate
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_http_response_text(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"\r\n"
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><p>Real page text.</p><p>Second paragraph here.</p></body></html>"
    )
    shard = _record("response", "http://page.example/", http)
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(shard))
    out = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",))
    ).collect()[0]
    assert out["status_code"] == 200
    assert out["http_content_type"] == "text/html"
    assert "Real page text." in out["text"] and "Second paragraph" in out["text"]
    assert "script" not in out["text"] and "<p>" not in out["text"]


def test_http_response_text_keep_body(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    html = (
        b"<html><body><p>Body text.</p>"
        b'<a href="https://other.example/x">link</a></body></html>'
    )
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    shard = _record("response", "http://page.example/", http)
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(shard))
    out = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",)), keep_body=True
    ).collect()[0]
    # the html column is the raw (sanitized) body — feeds weblinks
    assert out["html"] == html.decode()
    assert "Body text." in out["text"] and "<p>" not in out["text"]
    # default keeps the narrow schema
    cols = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",))
    ).columns
    assert "html" not in cols


def test_http_response_text_non_http_payload(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    shard = _record("response", "http://odd.example/", b"just plain bytes, no envelope")
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(shard))
    out = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",))
    ).collect()[0]
    assert out["status_code"] is None
    assert "plain bytes" in out["text"]


def test_http_response_lf_only_headers(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    http = (b"HTTP/1.1 301 Moved\nContent-Type: text/html\n\n"
            b"<html><body>LF-only server page text.</body></html>")
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(
        _record("response", "http://lf.example/", http)))
    out = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",))
    ).collect()[0]
    assert out["status_code"] == 301
    assert out["http_content_type"] == "text/html"
    assert "HTTP/1.1" not in out["text"] and "LF-only server page" in out["text"]


def test_http_response_missing_content_type_is_null(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    http = b"HTTP/1.1 200 OK\r\n\r\nbody text here"
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(
        _record("response", "http://x/", http)))
    out = http_response_text(
        read_warc(spark, str(tmp_path), types=("response",))
    ).collect()[0]
    assert out["status_code"] == 200 and out["http_content_type"] is None


def test_shard_size_guard_raises_clearly(spark):
    """r7: a shard over the binaryFile 2 GiB column cap fails FAST with
    the offending path in the message, not mid-job."""
    import pytest

    from hermes_spark.sources.warc import (
        BINARYFILE_MAX_BYTES,
        _check_shard_sizes,
    )

    fake = spark.createDataFrame(
        [("/crawl/shard-big.warc.gz", BINARYFILE_MAX_BYTES + 1),
         ("/crawl/shard-ok.warc.gz", 1 << 30)],
        "path string, length long",
    )
    with pytest.raises(ValueError, match="shard-big.warc.gz"):
        _check_shard_sizes(fake)
    # all-under-cap listing passes silently
    _check_shard_sizes(fake.filter("length <= %d" % BINARYFILE_MAX_BYTES))


def test_shard_size_guard_on_real_read(spark, tmp_path):
    """The default read path runs the guard (cheap metadata job) and
    still parses normal shards."""
    p = tmp_path / "shard.warc.gz"
    p.write_bytes(gzip.compress(SHARD))
    assert read_warc(spark, str(tmp_path)).count() > 0          # guard on
    assert read_warc(spark, str(tmp_path), check_sizes=False).count() > 0


def test_http_response_text_main_extractor(spark, tmp_path):
    from hermes_spark.sources.warc import http_response_text

    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"\r\n"
        b'<html><body><nav><a href="/">Home</a> <a href="/a">About us</a> '
        b'<a href="/c">Contact the sales team</a></nav>'
        b"<p>The real article body has plenty of words and it reads like "
        b"prose that a curation pipeline wants to keep.</p>"
        b'<footer><a href="/p">Privacy policy</a> <a href="/t">Terms</a> '
        b"<a>Contact</a> chrome</footer></body></html>"
    )
    shard = _record("response", "http://page.example/", http)
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(shard))
    pages = read_warc(spark, str(tmp_path), types=("response",))
    main = http_response_text(pages, extractor="main").collect()[0]
    strip = http_response_text(pages, extractor="strip").collect()[0]
    # main extraction drops the nav/footer chrome, strip keeps it
    assert main["text"].startswith("The real article body")
    assert "Home" not in main["text"] and "Privacy" not in main["text"]
    assert "Home" in strip["text"] and "Privacy policy" in strip["text"]
    assert main["status_code"] == 200

    import pytest

    with pytest.raises(ValueError, match="extractor"):
        http_response_text(pages, extractor="nope")


def test_curated_wet_stream_script_aware(spark, tmp_path):
    """A multilingual drop-zone: script_aware=True lets fluent zh pages
    through the streaming gates; without it they gate to zero (the
    round-11 trap, streaming edition)."""
    from hermes_spark.streaming import curated_wet_stream

    zh = (
        "机器学习是人工智能的一个分支，它使计算机能够从数据中学习。\n"
        "这些方法在图像识别和自然语言处理等领域得到了广泛的应用！\n"
    ).encode()
    en = (
        "The article has a first good sentence with the usual words of that kind.\n"
        "It has that second sentence to keep the word count of the page healthy.\n"
    ).encode()
    src = tmp_path / "drop"
    src.mkdir()
    shard = b"".join(
        _record("conversion", f"http://s.example/{j}", zh if j % 2 else en)
        for j in range(10)
    )
    (src / "a.wet.gz").write_bytes(gzip.compress(shard))

    for aware, expect in ((False, 5), (True, 10)):
        out = str(tmp_path / f"out{aware}")
        q = (
            curated_wet_stream(
                spark, str(src),
                gopher_thresholds={"min_words": 15, "min_stopwords": 1},
                script_aware=aware,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ckpt{aware}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == expect, aware
