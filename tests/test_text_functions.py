from pyspark.sql import functions as F

from hermes_spark.functions import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from hermes_spark.functions.hashing import portable_hash64, shingles


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  ",), ("one",), ("x\ty\nz w",)], "t string"
    )
    out = [r[0] for r in df.select(token_count(F.col("t"))).collect()]
    assert out == [3, 0, 1, 4]


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    values = ["abc", "hello world", "", "äöü"]
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    for v in values:
        expected = duckdb.sql(
            "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", params=[v]
        ).fetchone()[0]
        assert got[v] == expected, v


def test_shingles(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("aaaa",)], "t string")
    rows = [r[0] for r in df.select(shingles(F.col("t"), 3)).collect()]
    assert rows[0] == ["abc", "bcd"]
    assert rows[1] == ["ab"]
    assert rows[2] == ["aaa"]  # distinct


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der Hund und die Katze ist nicht da",),
            ("le chat et la maison est une belle",),
            ("xyzzy plugh qwerty",),
        ],
        "t string",
    )
    out = [r[0] for r in df.select(lang_id(F.col("t"))).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_lang_id_30_languages(spark):
    """One sentence per supported language, incl. the hard pairs:
    da/no (overlapping function words, distinctive af/av + hvad/hva),
    ru/uk (shared Cyrillic, unique letters), zh/ja (kana presence),
    ar/fa (Persian-only letters)."""
    samples = [
        ("en", "the cat and the dog is in the house that they have"),
        ("de", "der Hund und die Katze ist nicht da und auch nicht zu sehen"),
        ("fr", "le chat et la maison est une belle chose pour les gens qui"),
        ("es", "el perro y los gatos es una cosa que pasa por la casa pero"),
        ("it", "il cane e il gatto che corre per la casa non sono anche qui"),
        ("pt", "o cão e o gato que não para de correr em uma casa para se"),
        ("nl", "de hond en het huis is een ding van de kat dat niet zijn"),
        ("sv", "och det är som att det inte går att säga på av för med den"),
        ("da", "og det er ikke til at sige hvad der sker på hvor jeg kan"),
        ("no", "og det er ikke til å si hva som skjer på hvor jeg kan fra"),
        ("fi", "ja se on että hän ei ole mutta kun niin joka myös tämä"),
        ("pl", "i w nie na się jest z do że to po ale jak co tak"),
        ("cs", "a je se na není to že s do ale jako pro za byl jsem"),
        ("ro", "și de în la cu este nu pe un o că se din mai sunt"),
        ("tr", "ve bir bu için de ile çok daha ama gibi en ne var"),
        ("id", "yang dan di itu dengan untuk tidak ini dari dalam akan pada"),
        ("vi", "và của là có không được trong cho người này với các một đã"),
        ("hu", "a az és nem hogy is egy van de el meg már csak mint volt"),
        ("ca", "i és amb els això també dels més però com per una aquest són"),
        ("ru", "это было на самом деле тяжёлый день и мы не знали что делать"),
        ("uk", "це був дійсно важкий день і ми не знали що робити далі"),
        ("zh", "今天天气很好我们决定去公园散步然后吃午饭"),
        ("ja", "今日は天気がいいので公園へ散歩に行きました"),
        ("ko", "오늘은 날씨가 좋아서 공원에 산책하러 갔습니다"),
        ("ar", "كان يوما جميلا وذهبنا الى الحديقة لنمشي قليلا"),
        ("fa", "امروز هوا خوب بود و ما به پارک رفتیم تا کمی قدم بزنیم"),
        ("he", "היום היה יום יפה והלכנו לפארק לטייל קצת"),
        ("el", "σήμερα ήταν μια όμορφη μέρα και πήγαμε στο πάρκο"),
        ("hi", "आज मौसम बहुत अच्छा था और हम पार्क में टहलने गए"),
        ("th", "วันนี้อากาศดีมากเราเลยไปเดินเล่นที่สวนสาธารณะ"),
        ("und", "xyzzy plugh qwerty"),
    ]
    df = spark.createDataFrame(samples, "lang string, t string")
    rows = df.select("lang", lang_id(F.col("t")).alias("g")).collect()
    wrong = [(r["lang"], r["g"]) for r in rows if r["lang"] != r["g"]]
    assert not wrong, wrong


def test_lang_id_script_edge_cases(spark):
    from hermes_spark.functions.text import lang_id as lid

    df = spark.createDataFrame(
        [
            # mixed script below the 30% bar falls through to Latin
            ("mostly english text with one word 日本 inside it and the rest", "en"),
            # empty / whitespace-only
            ("", "und"),
            ("   \t\n", "und"),
            # kana alone (no han) still counts toward the CJK group -> ja
            ("こんにちはせかいきょうはいいてんきですね", "ja"),
        ],
        "t string, want string",
    )
    rows = df.select("want", lid(F.col("t")).alias("g")).collect()
    assert all(r["want"] == r["g"] for r in rows), [
        (r["want"], r["g"]) for r in rows
    ]


def test_quality_score_bounds(spark, documents):
    out = documents.select(quality_score(F.col("text")).alias("q"))
    row = out.agg(F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0


def test_doc_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("  Hello   World ", "hello world")], "a string, b string")
    row = df.select(
        doc_fingerprint(F.col("a")).alias("fa"), doc_fingerprint(F.col("b")).alias("fb")
    ).collect()[0]
    assert row["fa"] == row["fb"]


def test_scrub_pii_and_match_count(spark):
    from pyspark.sql import functions as F

    from hermes_spark.functions.text import pii_match_count, scrub_pii

    rows = [
        (1, "contact me at alice@example.com or 12345678901"),
        (2, "clean text with short 1234 number"),
        (3, "two mails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: (r.scrubbed, r.n) for r in df.select(
        "id",
        scrub_pii(F.col("text")).alias("scrubbed"),
        pii_match_count(F.col("text")).alias("n"),
    ).collect()}
    assert out[1] == ("contact me at <EMAIL> or <LONG_NUMBER>", 2)
    assert out[2] == ("clean text with short 1234 number", 0)
    assert out[3] == ("two mails <EMAIL> <EMAIL>", 2)


def test_repetition_ratio(spark):
    from pyspark.sql import functions as F

    from hermes_spark.functions.text import repetition_ratio

    rows = [
        (1, "buy now buy now buy now"),
        (2, "all distinct words here friend"),
        (3, ""),
        (4, "word"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: (r.r1, r.r2) for r in df.select(
        "id",
        repetition_ratio(F.col("text"), 1).alias("r1"),
        repetition_ratio(F.col("text"), 2).alias("r2"),
    ).collect()}
    # 6 tokens, 2 distinct -> 1 - 2/6; 5 bigrams, 2 distinct -> 1 - 2/5
    assert out[1] == (round(1 - 2 / 6, 6), round(1 - 2 / 5, 6))
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)
    assert out[4] == (0.0, 0.0)


def test_strip_boilerplate_lines(spark):
    from pyspark.sql import functions as F

    from hermes_spark.operators import boilerplate_lines, strip_boilerplate_lines

    footer = "FOOTER: buy premium"
    rows = [
        (1, f"unique alpha\n{footer}\nbody one"),
        (2, f"unique beta\n{footer}"),
        (3, f"{footer}\nunique gamma"),
        (4, "no boilerplate here"),
        (5, footer),  # doc that is ONLY boilerplate -> drops out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    boiler = {r.line for r in boilerplate_lines(df, "doc_id", "text", 3).collect()}
    assert boiler == {footer.lower()}

    out = {r.doc_id: r.text for r in strip_boilerplate_lines(
        df, "doc_id", "text", min_docs=3
    ).collect()}
    assert out[1] == "unique alpha\nbody one"   # order preserved
    assert out[2] == "unique beta"
    assert out[3] == "unique gamma"
    assert out[4] == "no boilerplate here"
    assert 5 not in out


def test_tfidf_topk_terms(spark):
    from hermes_spark.operators import tfidf_topk_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # blank doc produces no rows
    assert 4 not in by_doc
    # doc 1: apple (tf=2, df=1) must outrank banana (tf=1, df=2)
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert top1[0].term == "apple" and top1[0].tf == 2
    # doc 3: cherry tf=2 but df=2; durian tf=1 df=1 -> cherry score
    # 2*(ln(5/3)+1) ≈ 3.02 > durian 1*(ln(5/2)+1) ≈ 1.92
    top3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert top3[0].term == "cherry"
    assert all(r.rank <= 2 for r in out)


def test_unigram_logprob(spark):
    import math

    from hermes_spark.operators import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the"), (2, "the zyzzyva"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert 3 not in got  # empty doc omitted
    # corpus: the x4, zyzzyva x1, total 5
    assert got[1].n_tokens == 3
    assert abs(got[1].avg_logprob - round(math.log(4 / 5), 4)) < 1e-9
    expected2 = (math.log(4 / 5) + math.log(1 / 5)) / 2
    assert abs(got[2].avg_logprob - round(expected2, 4)) < 1e-4
    # the rare-token doc scores lower (worse)
    assert got[2].avg_logprob < got[1].avg_logprob


def test_vocab_stats(spark):
    from hermes_spark.operators import vocab_stats

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b")], "doc_id long, text string"
    )
    rows = vocab_stats(docs, top_n=2).collect()
    assert [(r.term, r.cnt, r.doc_freq, r.rank) for r in rows] == [
        ("a", 3, 2, 1),
        ("b", 2, 2, 2),
    ]


def test_bigram_logprob_rewards_natural_order(spark):
    from hermes_spark.operators import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "mat the on sat cat the"),  # same words, scrambled
            (4, "single"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert 4 not in got  # < 2 tokens
    assert got[1].n_bigrams == 5
    # natural order repeated twice -> its bigrams are frequent;
    # the scrambled doc's bigrams are singletons -> lower logprob
    assert got[1].avg_logprob > got[3].avg_logprob


def test_hashing_vectorize_feeds_ann(spark):
    from hermes_spark.operators import (
        brute_force_cosine_topk,
        hashing_vectorize,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join spark"),
            (2, "spark shuffle join"),        # near-dup of 1
            (3, "completely unrelated words entirely"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    vecs = hashing_vectorize(docs, dim=32)
    got = {r.doc_id: r.features for r in vecs.collect()}
    assert 4 not in got
    assert sum(got[1]) == 4.0 and sum(got[2]) == 3.0  # token counts
    # cosine over hashed features finds the near-dup first
    out = brute_force_cosine_topk(
        vecs, vecs.filter("doc_id = 1"), id_col="doc_id", vec_col="features", k=2
    ).collect()
    ranked = [r.vec_id for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2]


def test_bm25_ranks_relevant_docs_first(spark):
    from hermes_spark.operators.tfidf import bm25_scores

    rows = [
        (1, "spark join optimizer join join"),     # heavy on 'join'
        (2, "spark shuffle partition"),            # no query terms
        (3, "join once in a very long document " + "filler " * 50),
        (4, "merge join"),                         # two query terms, short doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_scores(df, ["merge", "join"], k=10).collect()
    ranked = [r["doc_id"] for r in out]
    assert 2 not in ranked                 # no query terms -> no score
    assert ranked[0] == 4                  # both terms + short doc wins
    assert set(ranked) == {1, 3, 4}
    # length normalization: doc 3's lone 'join' in a long doc scores
    # below doc 1's three 'join's in a short doc
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[1] > scores[3]


def test_bm25_requires_terms(spark):
    from hermes_spark.operators.tfidf import bm25_scores
    import pytest as _pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_scores(df, [])


def test_word_ngrams_binds_tokenizer_once(spark):
    """Regression: passing a raw split expression into word_ngrams must
    not re-tokenize per gram (lambda free-variable inlining). The bound
    shape leaves exactly one split(...) in the analyzed plan."""
    from pyspark.sql import functions as F

    from hermes_spark.functions.text import tokens, word_ngrams

    df = spark.createDataFrame([("a b c d e",)], ["text"])
    out = df.select(word_ngrams(tokens(F.lower(F.col("text"))), 2).alias("g"))
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("split(") == 1, plan


def test_bind_once_evaluates_once_and_preserves_value(spark):
    from pyspark.sql import functions as F

    from hermes_spark.functions.text import bind_once

    df = spark.createDataFrame([(4,)], ["x"])
    out = df.select(
        bind_once(F.col("x") * 10, lambda v: v + v).alias("y")
    ).first()
    assert out.y == 80


def test_strip_html_tags_scripts_entities(spark):
    from hermes_spark.functions.text import strip_html

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ('<script>var x = "<p>";</script>keep', "keep"),
        ("<style>p {color: red}</style>text", "text"),
        ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;", "a & b <tag> \"q\" 's'"),
        # double-decode guard: &amp;lt; is the LITERAL string "&lt;"
        ("x &amp;lt; y", "x &lt; y"),
        ("  lots\n\nof\t whitespace  ", "lots of whitespace"),
        ("<SCRIPT>upper();</SCRIPT>ok", "ok"),
        ("<div\nclass='x'>multi\nline tag</div>", "multi line tag"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], ["i", "s"])
    got = {r["i"]: r["out"] for r in df.select("i", strip_html(F.col("s")).alias("out")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_luhn_valid(spark):
    from hermes_spark.functions.text import luhn_valid

    rows = [
        (1, "4532015112830366", True),    # valid test number
        (2, "4532015112830367", False),   # checksum off by one
        (3, "pay 4111 1111 1111 1111 now", True),  # digits scattered
        (4, "79927398713", True),         # classic Luhn example
        (5, "1234567", False),            # too short (< 8 digits)
        (6, "no digits at all", False),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], ["i", "t"])
    got = {r["i"]: r["ok"] for r in df.select("i", luhn_valid(F.col("t")).alias("ok")).collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, got[i])


def test_luhn_python_parity(spark):
    """Expression Luhn agrees with a reference Python implementation on
    arbitrary digit strings."""
    from hermes_spark.functions.text import luhn_valid

    def py_luhn(s):
        ds = [int(c) for c in s if c.isdigit()]
        if len(ds) < 8:
            return False
        total = 0
        for i, d in enumerate(reversed(ds)):
            if i % 2:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    vals = [str(4532015112830300 + i) for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], ["t"])
    got = {r["t"]: r["ok"] for r in df.select("t", luhn_valid(F.col("t")).alias("ok")).collect()}
    assert got == {v: py_luhn(v) for v in vals}
    # exactly ~1 in 10 random numbers passes
    assert 2 <= sum(got.values()) <= 6


def test_blocklist_hits(spark):
    from hermes_spark.functions.text import blocklist_hits

    df = spark.createDataFrame(
        [(1, "the casino bonus"), (2, "clean text"), (3, "CASINO and poker site"),
         (4, "casinos are not a whole-word match")],
        ["i", "t"],
    )
    got = {r["i"]: r["n"] for r in df.select(
        "i", blocklist_hits(F.col("t"), ["casino", "poker"]).alias("n")).collect()}
    assert got == {1: 1, 2: 0, 3: 2, 4: 0}
    # empty blocklist is a no-op literal
    assert df.select(blocklist_hits(F.col("t"), []).alias("n")).first()["n"] == 0


def test_canonical_url_collapses_variants(spark):
    from hermes_spark.functions.text import canonical_url

    variants = [
        "https://www.Example.com/a/b/?utm_source=x&id=2&gclid=zzz",
        "http://example.com/a/b?id=2",
        "https://example.com/a/b/?id=2&utm_campaign=y#frag",
        "https://EXAMPLE.com/a/b?fbclid=abc&id=2",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "u string")
    keys = {r["c"] for r in df.select(canonical_url(F.col("u")).alias("c")).collect()}
    assert keys == {"example.com/a/b?id=2"}


def test_canonical_url_param_order_and_edge_cases(spark):
    from hermes_spark.functions.text import canonical_url

    rows = [
        (1, "https://s.example/p?b=2&a=1"),
        (2, "https://s.example/p?a=1&b=2"),
        (3, "https://other.com/"),
        (4, "not a url"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    assert got[1] == got[2] == "s.example/p?a=1&b=2"  # params sorted
    assert got[3] == "other.com"
    assert got[4] is None and got[5] is None  # no ANSI crash


def test_canonical_url_keeps_nondefault_port_and_ref(spark):
    from hermes_spark.functions.text import canonical_url

    rows = [
        (1, "http://example.com:8080/a"),
        (2, "http://example.com/a"),
        (3, "http://example.com:80/a"),
        (4, "https://example.com:443/a"),
        (5, "https://github.com/o/r/find?ref=main"),
        (6, "https://github.com/o/r/find?ref=dev"),
        (7, "https://user:pw@example.com/a"),
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    got = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()}
    assert got[1] == "example.com:8080/a"        # distinct origin kept
    assert got[2] == got[3] == got[4] == "example.com/a"  # default ports dropped
    assert got[5] != got[6]                       # ref selects content
    assert got[7] == "example.com/a"              # userinfo stripped


def test_luhn_null_is_false(spark):
    from hermes_spark.functions.text import luhn_valid

    df = spark.createDataFrame([(1, None), (2, "4532015112830366")], "i long, t string")
    got = {r["i"]: r["ok"] for r in df.select("i", luhn_valid(F.col("t")).alias("ok")).collect()}
    assert got[1] is False and got[2] is True
    # the negated filter keeps null-text rows instead of dropping them
    assert df.filter(~luhn_valid(F.col("t"))).count() == 1


def test_add_lang_id_matches_column_lang_id(spark):
    """The materialize-once DataFrame helper (round 11) must label
    every document identically to the Column cascade — fuzzed over
    mixed-script strings plus the 30-language sentences."""
    import random

    from hermes_spark.functions.text import add_lang_id
    from hermes_spark.functions.text import lang_id as lid

    rng = random.Random(11)
    pieces = [
        "the and of to", "der und die", "le la les et", "el los y",
        "и в не на се", "这是一个中文句子", "これは日本語です",
        "한국어 문장입니다", "ما هو هذا", "این چیست", "מה זה",
        "τι είναι αυτό", "यह क्या है", "นี่คืออะไร", "і ї є ґ", "ы э ъ ё",
        "xyzzy plugh", "", "   ", "a", "π", "\t\n",
    ]
    rows = [
        (i, " ".join(rng.choice(pieces) for _ in range(rng.randrange(1, 6))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    col_out = {
        r["i"]: r["g"] for r in df.select("i", lid(F.col("t")).alias("g")).collect()
    }
    frame_out = {
        r["i"]: r["lang"]
        for r in add_lang_id(df, "t", "lang").select("i", "lang").collect()
    }
    assert frame_out == col_out
    # pass-through: original columns and row count intact
    got = add_lang_id(df, "t", "lang")
    assert got.columns == ["i", "t", "lang"] and got.count() == 60
