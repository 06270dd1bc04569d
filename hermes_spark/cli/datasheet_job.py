"""The datasheet job: one-command dataset card for a text corpus.

An extension command (SURVEY.md §7.1): before a corpus enters a
training mix, someone asks "how big, how clean, how duplicated, what
languages, what lengths?" — this job answers all of it in one pass
over the corpus plus three tiny aggregates, printing JSON-lines
sections built from the engine's existing operators:

* ``corpus``    — docs, chars, whitespace tokens, BPE-ish token
  estimate, distinct sources (HLL);
* ``lang_mix``  — per-language doc share (heuristic ``lang_id`` when no
  label column is present);
* ``dup``       — exact + order/repetition-blind duplicate rates
  (``doc_fingerprint`` / ``bag_fingerprint``);
* ``quality``   — Gopher rule pass-rate, per-rule failure rates, and C4
  line-survival stats;
* ``length``    — token-count quantiles from the q-digest sketch.

Usage::

    python -m hermes_spark.cli datasheet --format parquet --path /data/docs \\
        --id-col doc_id --text-col text [--source-col source] \\
        [--lang-col lang] [--script-aware true]

Scale notes: the heavy signals (quality flags, fingerprints, token
counts) all derive from ONE corpus scan each of which is a pure
expression pass; the aggregates are map-side-combined and bounded
(sketch states, per-language counts).  At 100 TB you would persist the
intermediate flags frame once and point the aggregates at it.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hermes_spark.cli.parser import _args_to_map
from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.io import load_dataframe
from hermes_spark.sources.parameters import Parameters

_RESERVED = ("id-col", "text-col", "source-col", "lang-col", "script-aware")


def run(spark: SparkSession, argv: list[str]) -> list[dict]:
    from hermes_spark.functions.text import (
        bag_fingerprint,
        bpe_token_count,
        doc_fingerprint,
        quality_score,
        quality_score_multilingual,
        token_count,
        word_units,
    )
    from hermes_spark.operators import (
        c4_line_stats,
        gopher_quality_flags,
        qdigest_quantiles,
        qdigest_state,
    )

    options = _args_to_map(argv)
    id_col = options.get("id-col", "doc_id")
    text_col = options.get("text-col", "text")
    source_col = options.get("source-col")
    lang_col = options.get("lang-col")
    # --script-aware true: judge Han/Kana/Thai documents by the char
    # word proxy in the Gopher/C4 sections (round 11) — without it a
    # multilingual corpus's card reports a bogus near-zero pass rate
    # for its unsegmented-script share (the same trap the gates had)
    script_aware = options.get("script-aware", "").lower() in ("true", "1")
    reader_opts = {k: v for k, v in options.items() if k not in _RESERVED}
    df = load_dataframe(spark, Parameters.validate_and_create(reader_opts))
    for required in (id_col, text_col, source_col, lang_col):
        if required is not None and required not in df.columns:
            raise MissingArgumentException(
                f"column {required!r} not in source (have {df.columns})"
            )

    records: list[dict] = []

    # -- corpus totals (one scan, one row out) -----------------------------
    # The base projection is CPU-bound (lang_id's script-count cascade
    # is ~5000x the per-byte cost of a columnar scan — 40 regex counts
    # per doc); a funnel-output input is typically AQE-coalesced to a
    # handful of files, which starves the scan (round-11 probe: 90.5 s
    # narrow vs 20.4 s wide on the same 15k docs).  Widen with a LOW
    # byte floor: rebalance_for_cpu's default 256 MB floor is
    # calibrated for ~100x-per-byte text stages, but for lang_id even
    # a 10 MB narrow input leaves cores idle for tens of seconds.
    from hermes_spark.plans import rebalance_for_cpu

    df = rebalance_for_cpu(df, min_bytes=4 * 1024 * 1024)
    if lang_col is None:
        # materialize-once lang tagging: the Column-cascade lang_id()
        # re-evaluates its 19 marker ratios per CASE branch (~2x the
        # cost of its parts, measured round 11) — the DataFrame helper
        # computes each intermediate exactly once, same labels
        from hermes_spark.functions.text import add_lang_id

        df = add_lang_id(df, text_col, "__lang_auto")
    text = F.col(text_col)
    # script-aware cards (r12): whitespace token totals and length
    # quantiles undercount an unsegmented-script share ~100x and the
    # English-calibrated quality composite floors it near 0.3 — swap
    # both for their script-fair twins (word_units /
    # quality_score_multilingual; Latin values identical)
    tok_expr = word_units(text) if script_aware else token_count(text)
    q_expr = (
        quality_score_multilingual(text) if script_aware
        else quality_score(text)
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.length(text).alias("__chars"),
        tok_expr.alias("__toks"),
        bpe_token_count(text, script_aware=script_aware).alias("__bpe"),
        q_expr.alias("__q"),
        doc_fingerprint(text).alias("__fp"),
        bag_fingerprint(text).alias("__bag"),
        (F.col(lang_col) if lang_col else F.col("__lang_auto")).alias("__lang"),
        (F.col(source_col) if source_col else F.lit("all")).alias("__src"),
    )
    base = base.persist()
    try:
        totals = base.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__chars").alias("total_chars"),
            F.sum("__toks").alias("total_tokens_ws"),
            F.sum("__bpe").alias("total_tokens_bpe"),
            # HLL (approx_count_distinct) — sources can be millions of
            # domains; 2% error is fine for a card and avoids a
            # distinct-volume shuffle
            F.approx_count_distinct("__src", 0.02).alias("n_sources"),
        ).collect()[0]
        records.append({"report": "corpus", **totals.asDict()})
        if totals["n_docs"] == 0:
            records.append({"report": "empty", "note": "corpus has no rows"})
            return records

        # -- language mix --------------------------------------------------
        n = totals["n_docs"]
        for row in (
            base.groupBy("__lang").count().orderBy(F.desc("count")).collect()
        ):
            records.append({
                "report": "lang_mix",
                "lang": row["__lang"],
                "n_docs": row["count"],
                "share": round(row["count"] / n, 4),
            })

        # -- duplicate rates (exact and order/repetition-blind) -----------
        def dup_rate(col: str) -> float:
            distinct = base.select(col).distinct().count()
            return round(1.0 - distinct / n, 4)

        records.append({
            "report": "dup",
            "exact_dup_rate": dup_rate("__fp"),
            "bag_dup_rate": dup_rate("__bag"),
        })

        # -- per-source dup + volume (only if a real source col) ----------
        if source_col:
            per_src = base.groupBy("__src").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("__fp").alias("n_distinct"),
            )
            for row in per_src.orderBy(F.desc("n_docs")).collect():
                records.append({
                    "report": "source",
                    "source": row["__src"],
                    "n_docs": row["n_docs"],
                    "exact_dup_rate": round(1.0 - row["n_distinct"] / row["n_docs"], 4),
                })

        # -- length quantiles from the sketch ------------------------------
        ls = qdigest_state(
            base.withColumn("__g", F.lit("all")), ["__g"], "__toks"
        )
        for row in qdigest_quantiles(
            ls, ["__g"], [0.1, 0.5, 0.9, 0.99]
        ).collect():
            records.append({
                "report": "length_tokens",
                "q": row["q"],
                "est": row["est"],
            })

        # -- composite quality distribution, per language ------------------
        # (script-fair when --script-aware; the per-lang rows make a
        # cross-script corpus's card readable — a low-scoring language
        # slice is visible instead of dissolving into the global mean)
        for row in (
            base.groupBy("__lang")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("__q"), 4).alias("avg"),
                F.round(F.percentile_approx("__q", 0.5), 4).alias("p50"),
            )
            .orderBy(F.desc("n"))
            .collect()
        ):
            records.append({
                "report": "quality_composite",
                "lang": row["__lang"],
                "n_docs": row["n"],
                "avg": row["avg"],
                "p50": row["p50"],
            })
    finally:
        base.unpersist()

    # -- quality gates (second expression scan of the corpus) --------------
    flags = gopher_quality_flags(
        df, id_col, text_col, min_stopwords=1, script_aware=script_aware
    )
    rule_cols = [
        "n_words", "mean_word_len", "symbol_ratio", "bullet_ratio",
        "ellipsis_ratio", "alpha_word_ratio", "n_stopwords",
    ]
    gq = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        *[F.round(F.avg(c), 4).alias(f"avg_{c}") for c in rule_cols],
    ).collect()[0]
    records.append({
        "report": "gopher",
        "pass_rate": round(gq["n_keep"] / gq["n"], 4),
        **{k: gq[k] for k in gq.asDict() if k.startswith("avg_")},
    })

    c4 = (
        c4_line_stats(df, id_col, text_col, script_aware=script_aware)
        .agg(
            F.round(F.avg("keep_ratio"), 4).alias("avg_line_keep_ratio"),
            F.round(
                F.avg(F.col("doc_poisoned").cast("double")), 4
            ).alias("poisoned_doc_rate"),
        )
        .collect()[0]
    )
    records.append({"report": "c4", **c4.asDict()})
    return records


def main(argv: list[str]) -> int:
    try:
        spark = SparkSession.builder.appName("Dataset datasheet").getOrCreate()
        for record in run(spark, argv):
            print(json.dumps(record, default=str))
    except MissingArgumentException as exc:
        print(exc, file=sys.stderr)
        return 2
    return 0
