"""Per-language LM training/scoring/filtering (round 11, CCNet's
per-language-model design): each language slice must match the
single-language operators bit-for-bit, both engines must agree, and
the quantile filter must cut each language against its OWN
distribution."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    lm_quantile_filter_by_lang,
    lm_score,
    lm_score_by_lang,
    lm_train,
    lm_train_by_lang,
    perplexity_ntile,
)
from hermes_spark.plans import count_exchanges

ROWS = [
    # lang en: natural-ish
    (0, "en", "the cat sat on the mat and the dog sat too"),
    (1, "en", "the dog ate the fish on the mat"),
    (2, "en", "the cat and the dog and the fish"),
    (3, "en", "zz qq xx yy the cat"),
    # lang de: different vocabulary entirely
    (10, "de", "der hund sitzt auf der matte und der hund"),
    (11, "de", "die katze und der hund auf der matte"),
    (12, "de", "der fisch und die katze und der fisch"),
    (13, "de", "blorp gnarf der hund zz"),
    # lang with one doc
    (20, "fr", "le chat et le chien et le poisson"),
    # unscoreable
    (30, "en", "one"),
    (31, "de", "   "),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, lang string, text string")


def test_per_lang_slices_match_single_lang_model(spark, corpus):
    """lm_train_by_lang + lm_score_by_lang on the full frame ==
    lm_train + lm_score run per language slice, value for value."""
    lm_all = lm_train_by_lang(corpus, vocab_size=50)
    scored_all = {
        (r["doc_id"]): (r["lang"], r["n_bigrams"], r["avg_logprob"])
        for r in lm_score_by_lang(corpus, lm_all, broadcast_model=True,
                                  score_engine="join").collect()
    }
    combined = {}
    for lang in ("en", "de", "fr"):
        sl = corpus.filter(F.col("lang") == lang)
        lm1 = lm_train(sl, vocab_size=50)
        for r in lm_score(sl, lm1, broadcast_model=True,
                          score_engine="join").collect():
            combined[r["doc_id"]] = (lang, r["n_bigrams"], r["avg_logprob"])
    assert scored_all == combined and len(scored_all) == 9


def test_arrow_and_join_engines_agree(spark, corpus):
    lm = lm_train_by_lang(corpus, vocab_size=50)
    join_rows = sorted(
        tuple(r) for r in lm_score_by_lang(
            corpus, lm, score_engine="join").collect()
    )
    arrow_rows = sorted(
        tuple(r) for r in lm_score_by_lang(
            corpus, lm, score_engine="arrow").collect()
    )
    assert join_rows == arrow_rows and len(join_rows) == 9


def test_unknown_lang_docs_omitted(spark, corpus):
    lm = lm_train_by_lang(corpus.filter(F.col("lang") != "fr"), vocab_size=50)
    scored = lm_score_by_lang(corpus, lm, score_engine="arrow")
    langs = {r["lang"] for r in scored.collect()}
    assert langs == {"en", "de"}  # fr has no model -> omitted


def test_arrow_engine_zero_shuffle(spark, corpus):
    lm = lm_train_by_lang(corpus, vocab_size=50)
    out = lm_score_by_lang(corpus, lm, score_engine="arrow")
    assert count_exchanges(out) == 0


def test_quantile_filter_cuts_per_language(spark, corpus):
    """keep_frac=0.5 keeps ~half of EACH language — the junk doc of
    each language is the one dropped (its score is the language's
    tail), proving the cutoff is per-language, not global.  The model
    trains on the clean docs only (CCNet trains on a TRUSTED corpus),
    so the junk docs are genuinely out-of-model."""
    lm = lm_train_by_lang(
        corpus.filter(~F.col("doc_id").isin(3, 13)), vocab_size=50
    )
    kept = lm_quantile_filter_by_lang(
        corpus, lm, keep_frac=0.5, broadcast_model=True,
        score_engine="arrow",
    )
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    # junk docs 3 (en) and 13 (de) fall below their language cutoffs;
    # unscoreable 30/31 never kept; fr's single doc is its own median
    assert 3 not in kept_ids and 13 not in kept_ids
    assert 30 not in kept_ids and 31 not in kept_ids
    assert 20 in kept_ids
    en_kept = [i for i in kept_ids if 0 <= i < 10]
    de_kept = [i for i in kept_ids if 10 <= i < 20]
    assert 1 <= len(en_kept) <= 3 and 1 <= len(de_kept) <= 3


def test_quantile_filter_empty_scoreable(spark):
    df = spark.createDataFrame(
        [(1, "en", "x"), (2, "en", "")], "doc_id long, lang string, text string"
    )
    lm = lm_train_by_lang(
        spark.createDataFrame([(9, "en", "a b c a b")],
                              "doc_id long, lang string, text string"),
        vocab_size=10,
    )
    assert lm_quantile_filter_by_lang(df, lm, keep_frac=0.5).count() == 0


def test_per_lang_ntile(spark, corpus):
    lm = lm_train_by_lang(corpus, vocab_size=50)
    scored = lm_score_by_lang(corpus, lm, score_engine="arrow")
    buckets = perplexity_ntile(scored, by=("lang",))
    rows = buckets.collect()
    # each language's docs are ranked within the language: en has 4
    # scoreable docs -> heads present per lang
    for lang, n in (("en", 4), ("de", 4), ("fr", 1)):
        sub = [r for r in rows if r["lang"] == lang]
        assert len(sub) == n
        assert any(r["ppl_bucket"] == "head" for r in sub)
    # global ntile unchanged when by is omitted (regression guard)
    g = perplexity_ntile(scored).collect()
    assert sum(r["ppl_bucket"] == "head" for r in g) == 3


ZH_DOCS = [
    (50, "zh", "机器学习是人工智能的一个分支它使计算机能够从数据中学习"),
    (51, "zh", "这些方法在图像识别和自然语言处理等领域得到了广泛的应用"),
    (52, "zh", "计算机能够从数据中学习是机器学习的核心思想之一"),
    (53, "zh", "龘齉龍龘齉龍龘齉龍龘齉龍龘齉龍龘齉龍"),  # junk: rare chars
]


def test_script_aware_lm_scores_cjk(spark):
    """Unsegmented zh docs whitespace-tokenize to <2 tokens and are
    unscoreable; script_aware=True segments per character (char-level
    LM) and scores them — train and score share the flag, arrow and
    join engines agree."""
    df = spark.createDataFrame(
        ROWS[:4] + ZH_DOCS, "doc_id long, lang string, text string"
    )
    blind = lm_train_by_lang(df, vocab_size=100)
    assert lm_score_by_lang(
        df, blind, score_engine="join"
    ).filter(F.col("lang") == "zh").count() == 0  # the trap

    lm = lm_train_by_lang(df, vocab_size=100, script_aware=True)
    j = sorted(tuple(r) for r in lm_score_by_lang(
        df, lm, score_engine="join", script_aware=True).collect())
    a = sorted(tuple(r) for r in lm_score_by_lang(
        df, lm, score_engine="arrow", script_aware=True).collect())
    assert j == a
    zh = {r[0]: r for r in j if r[1] == "zh"}
    assert set(zh) == {50, 51, 52, 53}
    # char bigrams: n_bigrams = chars-1 for a pure-CJK doc
    assert zh[50][2] == len(ZH_DOCS[0][2]) - 1
    # (no junk-ranking claim here: doc 53 is IN this training set and
    # repeated bigrams are low-perplexity by construction — the
    # out-of-model ranking is pinned in the quantile-filter test below)


def test_script_aware_lm_quantile_filter_keeps_cjk(spark):
    df = spark.createDataFrame(
        ROWS[:4] + ZH_DOCS, "doc_id long, lang string, text string"
    )
    lm = lm_train_by_lang(
        df.filter(~F.col("doc_id").isin(3, 53)), vocab_size=100,
        script_aware=True,
    )
    kept = sorted(r["doc_id"] for r in lm_quantile_filter_by_lang(
        df, lm, keep_frac=0.5, broadcast_model=True,
        score_engine="arrow", script_aware=True,
    ).collect())
    zh_kept = [i for i in kept if i >= 50]
    assert zh_kept and 53 not in zh_kept  # fluent zh in, junk zh out


def test_model_bytes_guard_fails_loudly(spark, corpus):
    """r12: the arrow engine estimates the driver-side model footprint
    from distributed counts BEFORE collecting; a breach is a
    ValueError naming sizes and knobs, not a driver OOM.  The join
    engine never drivers the model and is exempt."""
    lm = lm_train_by_lang(corpus, vocab_size=100)
    with pytest.raises(ValueError, match="max_model_bytes"):
        lm_score_by_lang(
            corpus, lm, broadcast_model=True, max_model_bytes=10
        ).collect()
    # join engine unaffected by the cap
    rows = lm_score_by_lang(
        corpus, lm, score_engine="join", max_model_bytes=10
    ).count()
    assert rows > 0
    # generous cap: arrow engine proceeds and matches the join engine
    a = sorted(
        (r["doc_id"], r["avg_logprob"])
        for r in lm_score_by_lang(
            corpus, lm, broadcast_model=True, max_model_bytes=2**31
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["avg_logprob"])
        for r in lm_score_by_lang(
            corpus, lm, score_engine="join"
        ).collect()
    )
    assert a == b
