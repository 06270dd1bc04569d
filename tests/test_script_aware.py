"""Script-aware quality gates (round 11): Han/Kana/Thai documents get
a character-based word proxy instead of whitespace tokens, so CJK/Thai
corpora flow through the Gopher/C4 gates instead of being silently
discarded (the round-10 verdict's #1 real-user trap).  Latin documents
must be judged BYTE-IDENTICALLY with the flag on or off."""

import random

from pyspark.sql import functions as F

from hermes_spark.operators import (
    c4_clean,
    c4_line_stats,
    gopher_filter,
    gopher_quality_flags,
)
from hermes_spark.plans import count_exchanges, plan_operators

# realistic prose, repeated to clear the (scaled) min_words gates
ZH = (
    "机器学习是人工智能的一个分支，它使计算机能够从数据中学习。"
    "这种方法已经在许多领域得到了广泛的应用，包括图像识别和自然语言处理。"
) * 3
JA = (
    "これは日本語の文章です。機械学習は人工知能の一分野であり、"
    "データから学習する能力を計算機に与える技術である。"
) * 3
TH = (
    "การเรียนรู้ของเครื่องเป็นสาขาหนึ่งของปัญญาประดิษฐ์"
    "ที่ทำให้คอมพิวเตอร์สามารถเรียนรู้ได้จากข้อมูลโดยตรง "
) * 4
EN_GOOD = "the cat and the dog have fun with all of that stuff here. " * 5
EN_BAD = "tiny"
# garbage CJK: symbol-heavy (symbol_ratio) / particle-free rare chars
ZH_SYMBOLS = "的是" + "#" * 60 + "一二三" * 4
ZH_NO_PARTICLES = "龘齉龍" * 40  # rare chars, no function particles


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cjk_docs_survive_script_aware_gate(spark):
    rows = [(1, ZH), (2, JA), (3, TH), (4, EN_GOOD),
            (5, EN_BAD), (6, ZH_SYMBOLS), (7, ZH_NO_PARTICLES)]
    flags = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            _frame(spark, rows), "doc_id", "text",
            min_words=20, script_aware=True,
        ).collect()
    }
    # good CJK/Thai prose AND good English pass together
    for i in (1, 2, 3, 4):
        assert flags[i]["keep"], (i, flags[i])
    assert flags[1]["unsegmented"] and flags[3]["unsegmented"]
    assert not flags[4]["unsegmented"]
    # the char proxy yields a sane word-equivalent count
    assert flags[1]["n_words"] >= 20
    # garbage still gated: short EN, symbol-laden CJK, particle-free CJK
    assert not flags[5]["keep"]
    assert not flags[6]["keep"] and flags[6]["symbol_ratio"] > 0.1
    assert not flags[7]["keep"] and flags[7]["n_stopwords"] < 2


def test_cjk_docs_are_lost_without_script_aware(spark):
    """The documented trap: whitespace tokenization sees ~1 giant
    token, so plain gates reject fluent zh/ja/th prose."""
    rows = [(1, ZH), (2, JA), (3, TH)]
    flags = gopher_quality_flags(
        _frame(spark, rows), "doc_id", "text", min_words=20,
    ).collect()
    assert all(not r["keep"] for r in flags)
    assert all(r["n_words"] <= 8 for r in flags)  # vs >=20 units above


def test_latin_path_byte_identical(spark):
    """script_aware=True must not change a single metric value or keep
    decision for segmented documents — randomized over the rule
    surface (bullets, ellipses, symbols, short/long words)."""
    rng = random.Random(11)
    words = ["the", "of", "and", "zq", "supercalifragilistic", "x",
             "word...", "#tag", "- item", "1", "café", "naïve"]
    rows = []
    for i in range(40):
        n = rng.randrange(1, 120)
        body = " ".join(rng.choice(words) for _ in range(n))
        if rng.random() < 0.3:
            body = body.replace(" ", "\n", 5)
        rows.append((i, body))
    base = gopher_quality_flags(
        _frame(spark, rows), "doc_id", "text", min_words=10
    ).collect()
    aware = gopher_quality_flags(
        _frame(spark, rows), "doc_id", "text", min_words=10,
        script_aware=True,
    ).collect()
    by_id = {r["doc_id"]: r for r in aware}
    assert not any(r["unsegmented"] for r in aware)
    for r in base:
        a = by_id[r["doc_id"]]
        for c in r.asDict():
            assert a[c] == r[c], (r["doc_id"], c, a[c], r[c])


def test_filter_agrees_with_flags_script_aware(spark):
    rows = [(1, ZH), (2, JA), (3, TH), (4, EN_GOOD), (5, EN_BAD),
            (6, ZH_SYMBOLS), (7, ZH_NO_PARTICLES)]
    df = _frame(spark, rows)
    via_filter = sorted(
        r["doc_id"] for r in gopher_filter(
            df, "doc_id", "text", min_words=20, script_aware=True
        ).collect()
    )
    via_flags = sorted(
        r["doc_id"] for r in gopher_quality_flags(
            df, "doc_id", "text", min_words=20, script_aware=True
        ).filter("keep").collect()
    )
    assert via_filter == via_flags == [1, 2, 3, 4]


def test_script_aware_flags_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_quality_flags(docs, "doc_id", "text", script_aware=True)
    assert count_exchanges(out) == 0
    assert not any("Join" in op or "Window" in op for op in plan_operators(out))
    flt = gopher_filter(docs, "doc_id", "text", script_aware=True)
    assert count_exchanges(flt) == 0
    assert sum("Scan parquet" in op for op in plan_operators(flt)) == 1


def test_c4_script_aware_lines(spark):
    zh_doc = (
        "机器学习使计算机能够从数据中学习并不断改进自身的性能。\n"  # keeps: 。 + long
        "首页\n"                                                      # drops: too short
        "这些方法在图像识别和自然语言处理等领域得到了广泛应用！\n"      # keeps: ！
        "关于我们 联系方式 版权所有"                                   # drops: no terminal
    )
    th_doc = (
        "การเรียนรู้ของเครื่องทำให้คอมพิวเตอร์สามารถเรียนรู้ได้จากข้อมูลโดยตรง\n"  # keeps: long Thai clause
        "หน้าแรก"                                                                 # drops: short
    )
    en_doc = "This English line survives with punctuation.\nmenu item\n"
    rows = [(1, zh_doc), (2, th_doc), (3, en_doc)]
    out = {
        r["doc_id"]: r
        for r in c4_clean(
            _frame(spark, rows), "doc_id", "text",
            min_line_words=3, script_aware=True,
        ).collect()
    }
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_in"] == 4
    assert "首页" not in out[1]["text"] and "机器学习" in out[1]["text"]
    assert out[2]["n_lines_kept"] == 1
    assert out[3]["n_lines_kept"] == 1

    # without script awareness the same zh/th docs lose every line
    plain = {
        r["doc_id"]: r
        for r in c4_line_stats(
            _frame(spark, rows), "doc_id", "text", min_line_words=3
        ).collect()
    }
    assert plain[1]["n_lines_kept"] == 0 and plain[2]["n_lines_kept"] == 0


def test_c4_latin_lines_identical_both_modes(spark):
    rng = random.Random(7)
    frags = ["Real sentence ends here.", "menu", "cookie policy text here.",
             "Another good long line with words!", "short", "x y z?",
             "ends without punct words many here"]
    rows = [
        (i, "\n".join(rng.choice(frags) for _ in range(rng.randrange(1, 8))))
        for i in range(30)
    ]
    a = c4_line_stats(
        _frame(spark, rows), "doc_id", "text", min_line_words=3
    ).collect()
    b = {
        r["doc_id"]: r
        for r in c4_line_stats(
            _frame(spark, rows), "doc_id", "text", min_line_words=3,
            script_aware=True,
        ).collect()
    }
    for r in a:
        assert b[r["doc_id"]].asDict() == r.asDict()


def test_c4_clean_script_aware_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = c4_clean(docs, "doc_id", "text", script_aware=True)
    assert count_exchanges(out) == 0
    assert not any("Join" in op for op in plan_operators(out))


def test_word_units_latin_identical_and_cjk_sane(spark):
    from hermes_spark.functions.text import token_count, word_units

    rows = [(1, "the cat sat on the mat"), (2, ""), (3, "  a  b  "),
            (4, ZH), (5, TH), (6, "机器学习 is very cool")]
    df = _frame(spark, rows)
    got = {
        r["doc_id"]: (r["tc"], r["wu"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("tc"),
            word_units(F.col("text")).alias("wu"),
        ).collect()
    }
    for i in (1, 2, 3):  # pure-Latin: identical
        assert got[i][0] == got[i][1]
    # unsegmented docs: ws counting sees ~1 token, units see the chars
    assert got[4][0] <= 2 and got[4][1] >= 50
    assert got[5][0] <= 8 and got[5][1] > got[5][0] * 5
    assert got[6][1] > got[6][0]  # mixed: units add the Han chars


def test_pack_sequences_script_aware_budget(spark):
    """A CJK corpus packed with whitespace counting crams ~everything
    into sequence 0 (each doc 'costs' 1 token); script-aware packing
    respects the budget."""
    from hermes_spark.operators import pack_sequences

    rows = [(i, ZH) for i in range(40)]  # each ~100 word-units
    df = _frame(spark, rows)
    naive = pack_sequences(df, "doc_id", text_col="text", budget=256,
                           num_shards=1)
    aware = pack_sequences(df, "doc_id", text_col="text", budget=256,
                           num_shards=1, script_aware=True)
    n_seq_naive = naive.select("seq_in_shard").distinct().count()
    n_seq_aware = aware.select("seq_in_shard").distinct().count()
    assert n_seq_naive == 1          # 40 docs x "1 token" < 256
    assert n_seq_aware >= 10         # ~76 units/doc, 256 budget
    # Latin corpora: byte-identical either way
    lat = [(i, EN_GOOD) for i in range(10)]
    a = pack_sequences(_frame(spark, lat), "doc_id", text_col="text",
                       budget=256, num_shards=2).collect()
    b = pack_sequences(_frame(spark, lat), "doc_id", text_col="text",
                       budget=256, num_shards=2, script_aware=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_length_curriculum_script_aware(spark):
    from hermes_spark.operators import length_curriculum

    rows = [(i, ZH) for i in range(10)] + [(100 + i, EN_GOOD) for i in range(10)]
    df = _frame(spark, rows)
    naive = {r["length_bin"]: r["n_docs"]
             for r in length_curriculum(df, "doc_id").collect()}
    aware = {r["length_bin"]: r["n_docs"]
             for r in length_curriculum(df, "doc_id",
                                        script_aware=True).collect()}
    # naive: all CJK docs in bin 0 (1 "token"); aware: none there
    assert naive.get(0, 0) == 10 and aware.get(0, 0) == 0


def test_duplicate_spans_script_aware(spark):
    """Two zh docs sharing a long verbatim run: plain span dedup sees
    one giant token (no grams); script_aware finds the character-level
    span with correct char offsets."""
    from hermes_spark.operators import duplicate_spans, span_dedup_stats

    shared = "机器学习是人工智能的一个重要分支领域"  # 18 chars
    rows = [(1, "前言" + shared + "结语甲"), (2, "另外" + shared + "结尾乙丙")]
    df = _frame(spark, rows)
    assert duplicate_spans(df, "doc_id", "text", min_tokens=8).count() == 0
    spans = duplicate_spans(
        df, "doc_id", "text", min_tokens=8, script_aware=True
    ).collect()
    assert len(spans) == 1
    sp = spans[0]
    # both docs prefix 2 chars before the shared run; "结语/结尾" extends
    # the match by one char ("结")
    assert (sp["start_a"], sp["start_b"]) == (2, 2)
    assert sp["span_tokens"] == len(shared) + 1
    stats = {r["doc_id"]: r for r in span_dedup_stats(
        df, "doc_id", "text", min_tokens=8, script_aware=True).collect()}
    assert stats[1]["n_tokens"] == len(rows[0][1])  # char tokens
    assert stats[1]["dup_span_tokens"] == len(shared) + 1


def test_decontaminate_script_aware(spark):
    """A zh benchmark passage contaminating a corpus doc: invisible to
    word n-grams, caught at character level."""
    from hermes_spark.operators import decontaminate

    bench_text = "这个基准测试问题的标准答案是完全固定的内容"
    corpus = _frame(spark, [
        (1, "正文开头" + bench_text + "正文结尾"),
        (2, "这是一篇完全无关的文档内容与基准毫无重叠之处"),
        (3, EN_GOOD),
    ])
    bench = _frame(spark, [(100, bench_text)])
    plain = {r["doc_id"]: r["contaminated"] for r in decontaminate(
        corpus, bench, "doc_id", "text", n=8).collect()}
    aware = {r["doc_id"]: r["contaminated"] for r in decontaminate(
        corpus, bench, "doc_id", "text", n=8, script_aware=True).collect()}
    assert plain == {1: False, 2: False, 3: False}  # the trap
    assert aware == {1: True, 2: False, 3: False}


def test_spans_latin_identical_both_modes(spark):
    from hermes_spark.operators import duplicate_spans

    shared = "one two three four five six seven eight nine ten"
    rows = [(1, "intro " + shared + " outro"), (2, "alt " + shared + " end")]
    df = _frame(spark, rows)
    a = sorted(map(tuple, duplicate_spans(
        df, "doc_id", "text", min_tokens=8).collect()))
    b = sorted(map(tuple, duplicate_spans(
        df, "doc_id", "text", min_tokens=8, script_aware=True).collect()))
    assert a == b and len(a) == 1


def test_conversation_stats_script_aware(spark):
    from hermes_spark.operators import conversation_stats, turns_from_text

    df = _frame(
        spark, [(1, "问题是什么呢。请详细解释这个概念的全部含义和应用")]
    ).select(
        "doc_id", turns_from_text(F.col("text"), sep="。").alias("turns")
    )
    plain = conversation_stats(df).collect()[0]
    aware = conversation_stats(df, script_aware=True).collect()[0]
    # structural flags identical; token weights become real
    assert plain["n_turns"] == aware["n_turns"]
    assert plain["total_tokens"] <= 2 and aware["total_tokens"] >= 10
