"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, vectorizable, no Python UDFs) and
all reproducible in ANSI SQL so each operator has a DuckDB oracle:

* ``tokens`` / ``token_count`` — whitespace tokenization
* ``lang_id`` — two-tier heuristic: Unicode-script detection for
  non-Latin languages, then marker-word ratios over fixed
  per-language lists for Latin scripts (30 languages, deterministic,
  portable — no model download, no UDF)
* ``quality_score`` — length / punctuation / stopword-ratio composite
* ``doc_fingerprint`` — md5 of whitespace-normalized lowercased text
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed marker vocabularies (function words from public frequency
# lists). Deterministic and engine-portable by design: the SQL oracle
# regenerates the exact same cascade from these tables.  Lists stay
# small and lean DISTINCTIVE (accented/unique function words) so close
# language pairs (es/ca, da/no) separate on more than shared Romance/
# Scandinavian cores; da vs no remains the known-hard pair (their
# function words genuinely overlap — ties resolve to 'da' by code
# order, documented precision boundary).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that",
           "it", "was", "for", "with", "they", "this", "not"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu",
           "mit", "den", "von", "auf", "sich", "auch", "eine"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que",
           "des", "dans", "pour", "qui", "pas", "sur", "avec"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que",
           "las", "por", "con", "para", "su", "como", "pero"),
    "it": ("il", "la", "di", "che", "e", "un", "una", "per",
           "non", "sono", "con", "del", "si", "come", "anche"),
    "pt": ("o", "a", "de", "que", "e", "um", "uma", "para",
           "não", "com", "os", "do", "da", "em", "se"),
    "nl": ("de", "het", "een", "van", "en", "is", "niet", "dat",
           "op", "te", "zijn", "voor", "met", "ook", "maar"),
    "sv": ("och", "att", "det", "som", "är", "på", "av", "för",
           "inte", "med", "den", "till", "har", "om", "så"),
    "da": ("og", "det", "er", "til", "af", "ikke", "der", "på",
           "som", "jeg", "hvad", "hvor", "også", "være", "kan"),
    "no": ("og", "det", "er", "til", "av", "ikke", "som", "på",
           "jeg", "hva", "hvor", "også", "være", "kan", "fra"),
    "fi": ("ja", "on", "ei", "että", "se", "hän", "oli", "mutta",
           "kun", "niin", "joka", "myös", "tämä", "ovat", "jos"),
    "pl": ("i", "w", "nie", "na", "się", "jest", "z", "do",
           "że", "to", "po", "ale", "jak", "co", "tak"),
    "cs": ("a", "je", "se", "na", "není", "to", "že", "s",
           "do", "ale", "jako", "pro", "za", "byl", "jsem"),
    "ro": ("și", "de", "în", "la", "cu", "este", "nu", "pe",
           "un", "o", "că", "se", "din", "mai", "sunt"),
    "tr": ("ve", "bir", "bu", "için", "de", "da", "ile", "çok",
           "daha", "ama", "gibi", "en", "ne", "var", "olarak"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "ke", "ada"),
    "vi": ("và", "của", "là", "có", "không", "được", "trong", "cho",
           "người", "này", "với", "các", "một", "đã", "khi"),
    "hu": ("a", "az", "és", "nem", "hogy", "is", "egy", "van",
           "de", "el", "meg", "már", "csak", "mint", "volt"),
    "ca": ("i", "és", "amb", "els", "això", "també", "dels", "més",
           "però", "com", "per", "una", "aquest", "són", "ha"),
}

#: Unicode script character classes as LITERAL ranges — portable
#: between Java regex (Spark) and RE2 (DuckDB), unlike \p{Script=...}
#: whose spelling differs per engine.  Tier 1 of :func:`lang_id`: a
#: dominant non-Latin script decides the language before any
#: tokenization (marker words cannot exist for unsegmented scripts).
SCRIPT_CLASSES: dict[str, str] = {
    "hangul": "[가-힣ᄀ-ᇿ㄰-㆏]",
    "kana": "[぀-ゟ゠-ヿ]",
    "han": "[一-鿿㐀-䶿]",
    "cyr": "[Ѐ-ӿ]",
    "arab": "[؀-ۿݐ-ݿ]",
    "heb": "[֐-׿]",
    "grek": "[Ͱ-Ͽ]",
    "deva": "[ऀ-ॿ]",
    "thai": "[฀-๿]",
    # r12: the remaining space-free SE-Asian / Tibetan scripts (full
    # blocks — detection wants every char of the script, unlike the
    # letters-only classes the word proxy uses)
    "khmer": "[ក-៿]",
    "lao": "[຀-໿]",
    "mymr": "[က-႟]",
    "tibt": "[ༀ-࿿]",
}

#: within-script discriminators: letters (near-)unique to one language
#: of a shared script.  Cyrillic: і/ї/є/ґ exist in Ukrainian but not
#: Russian; ы/э/ъ/ё exist in Russian but not Ukrainian.  Arabic script:
#: پ/چ/ژ/گ are Persian-only additions.  bg/sr fold into 'ru' and ur
#: into 'ar'/'fa' — the documented one-level-deeper precision boundary.
UK_ONLY_CHARS = "[іїєґ]"
RU_ONLY_CHARS = "[ыэъё]"
FA_ONLY_CHARS = "[پچژگ]"

#: a script must cover this fraction of non-whitespace chars to decide
SCRIPT_MIN_RATIO = 0.30

#: Scripts written WITHOUT word-separating whitespace (round 11; round
#: 12 extends the surface beyond Han/Kana/Thai).  Such a page
#: whitespace-tokenizes to ~1 giant token, so every word-based quality
#: rule (Gopher min_words / mean word length, C4 words-per-line) gates
#: those corpora to near-zero — the word PROXY must switch per script.
#: Hangul is space-segmented (Korean writes with spaces) and stays on
#: the whitespace path.  Literal ranges, portable Java/RE2/Python.
#:
#: Letter classes (letters + vowel/tone signs, excluding each script's
#: digits and punctuation):
#:
#: * Han + Hiragana/Katakana — the conventional ~2 chars/word.
#: * Thai U+0E01-0E3A, U+0E40-0E4E — round 12 extends the old
#:   ``เ-ๅ`` upper bound to U+0E4E so maiyamok ๆ, mai tai khu ็, the
#:   tone marks ่ ้ ๊ ๋, thanthakhat ์ and nikhahit ํ count as word
#:   material (they are integral to Thai words; excluding them both
#:   undercounted units and inflated the letter-ratio denominator).
#:   Digits ๐-๙ (U+0E50+) stay excluded.  ~4 chars/word.
#: * Lao U+0E81-0EBD, U+0EC0-0EC6, U+0EC8-0ECD — Thai's sister
#:   orthography, same ~4 chars/word.
#: * Khmer U+1780-17D2 (consonants, independent + dependent vowels,
#:   signs, coeng) plus ៗ — long clustered words, ~6 chars/word.
#:   Punctuation ។ ៕ ៖ and digits ០-៩ excluded.
#: * Myanmar U+1000-103F (consonants, vowels, medials, asat) —
#:   ~5 chars/word.  Digits ၀-၉ and sections ၊ ။ excluded.
#: * Tibetan U+0F40-0F6C + U+0F71-0FBC (letters, vowel signs,
#:   subjoined letters) PLUS the tshegs ་ ༌ (U+0F0B/0F0C) —
#:   tsheg-delimited SYLLABLES, not words, so whitespace tokenization
#:   still fails.  The tsheg counts as word material: it is
#:   orthographically required (~25% of real Tibetan prose chars —
#:   measured on the r12 fixtures), and excluding it both deflated
#:   alpha_word_ratio below the 0.8 gate on FLUENT text and broke the
#:   5-chars-per-word calibration (letters+tshegs per hand-counted
#:   word ≈ 5; letters alone ≈ 3.7).  Shad ། stays punctuation.
HAN_KANA_CLASS = "[一-鿿㐀-䶿぀-ゟ゠-ヿ]"
THAI_LETTER_CLASS = "[ก-ฺเ-๎]"  # r12: extended to U+0E4E (ADVICE r11)
LAO_LETTER_CLASS = "[ກ-ຽເ-ໆ່-ໍ]"
KHMER_LETTER_CLASS = "[ក-្ៗ]"
MYANMAR_LETTER_CLASS = "[က-ဿ]"
TIBETAN_LETTER_CLASS = "[ཀ-ཬཱ-ྼ་༌]"

#: script name -> (letter char class, chars-per-word divisor).  THE
#: single source of truth for the unsegmented word proxy: the Spark
#: expressions, the arrow-kernel Python mirrors and the DuckDB oracle
#: SQL are all generated from this table, so adding a script here
#: extends every script-aware operator at once.
UNSEGMENTED_SCRIPTS: dict[str, tuple[str, int]] = {
    "han_kana": (HAN_KANA_CLASS, 2),
    "thai": (THAI_LETTER_CLASS, 4),
    "lao": (LAO_LETTER_CLASS, 4),
    "khmer": (KHMER_LETTER_CLASS, 6),
    "myanmar": (MYANMAR_LETTER_CLASS, 5),
    "tibetan": (TIBETAN_LETTER_CLASS, 5),
}

#: chars-per-word for embedded ASCII words inside an unsegmented doc
#: (charged like Han by the gates' unit proxy)
ASCII_CHARS_PER_WORD = 2

#: exact-integer unit arithmetic: every per-script division is scaled
#: by lcm(divisors) so ``floor(sum(weight*count) / lcm)`` is computed
#: identically (and exactly) by Spark, DuckDB and numpy.
import math as _math

UNSEG_UNIT_LCM = _math.lcm(
    ASCII_CHARS_PER_WORD, *(d for _, d in UNSEGMENTED_SCRIPTS.values())
)
UNSEG_UNIT_WEIGHTS: dict[str, int] = {
    name: UNSEG_UNIT_LCM // d for name, (_, d) in UNSEGMENTED_SCRIPTS.items()
}
ASCII_UNIT_WEIGHT = UNSEG_UNIT_LCM // ASCII_CHARS_PER_WORD

UNSEGMENTED_CLASS = "[" + "".join(
    cls[1:-1] for cls, _ in UNSEGMENTED_SCRIPTS.values()
) + "]"

#: scripts that write NO terminal punctuation at all (Thai and Lao end
#: sentences with nothing) — C4's "line must end in terminal
#: punctuation" rule is length-gated instead for lines these dominate.
#: Khmer (។), Myanmar (။), Tibetan (།) have native terminals and keep
#: the punctuation rule.
NO_TERMINAL_SCRIPTS: tuple[str, ...] = ("thai", "lao")

#: back-compat aliases (pre-r12 names; the lcm machinery supersedes
#: the hard-coded pair)
HAN_KANA_CHARS_PER_WORD = UNSEGMENTED_SCRIPTS["han_kana"][1]
THAI_CHARS_PER_WORD = UNSEGMENTED_SCRIPTS["thai"][1]

#: High-frequency function particles per unsegmented script — the
#: analogue of GOPHER_STOPWORDS' "is this natural language" check.
#: Substring presence (no tokenization possible); zh: genitive 的,
#: aspect 了, copula 是, locative 在, conjunction 和; ja: case markers
#: の/は/を/に/が; th: relativizer ที่, genitive ของ, conjunction และ,
#: locative ใน, perfective ได้; lo: the Lao cognates ແລະ (and), ຂອງ
#: (of), ທີ່ (rel.), ໃນ (in), ໄດ້ (perf.); km: នៃ (of), និង (and),
#: ជា (copula), បាន (perf.), ដែល (rel.); my: သည် (subject/copula),
#: ကို (object), နှင့် (with/and), မှာ (locative), ၏ (genitive);
#: bo: དང (and), ཡིན (copula), གི (genitive), ནི (topic), ལས
#: (ablative).
UNSEGMENTED_PARTICLES: tuple[str, ...] = (
    "的", "了", "是", "在", "和",
    "の", "は", "を", "に", "が",
    "ที่", "ของ", "และ", "ใน", "ได้",
    "ແລະ", "ຂອງ", "ທີ່", "ໃນ", "ໄດ້",
    "នៃ", "និង", "ជា", "បាន", "ដែល",
    "သည်", "ကို", "နှင့်", "မှာ", "၏",
    "དང", "ཡིན", "གི", "ནི", "ལས",
)


def has_unsegmented_chars(col: Column) -> Column:
    """Layered screen for "does this text contain ANY unsegmented-script
    char" (r12): ``octet_length != length`` first — byte length equals
    char length iff the text is pure ASCII, a one-pass length compare
    that is FREE next to a regex scan (measured 0.6 vs 3.5 s per 1M
    docs) — then one ``rlike`` over the union class for the non-ASCII
    remainder (accented Latin pays the rlike; unsegmented text
    proceeds).  Exactly equivalent to the plain rlike: pure-ASCII text
    cannot contain a >U+007F char.  Used by every script-aware gate to
    keep the Latin hot path at parity with the plain gates."""
    return F.when(
        F.octet_length(col) != F.length(col), col.rlike(UNSEGMENTED_CLASS)
    ).otherwise(F.lit(False))


def unsegmented_script_counts(col: Column) -> dict[str, Column]:
    """Per-script letter-char counts (``long``) for a text column —
    the inputs to the unsegmented word proxy, one ``regexp_extract_all``
    per script.  Pure expressions; both engines count code points
    identically on these BMP ranges."""
    return {
        name: F.size(F.regexp_extract_all(col, F.lit(cls), 0)).cast("long")
        for name, (cls, _) in UNSEGMENTED_SCRIPTS.items()
    }


def units_from_counts(
    counts: dict[str, Column], ascii_count: Column | None = None
) -> Column:
    """Word-equivalent units from per-script counts:
    ``floor(sum(count_s / divisor_s))`` in exact lcm-scaled integer
    arithmetic.  ``ascii_count`` (optional) charges embedded ASCII
    letters at :data:`ASCII_CHARS_PER_WORD`."""
    total = None
    for name in UNSEGMENTED_SCRIPTS:
        term = counts[name] * F.lit(UNSEG_UNIT_WEIGHTS[name])
        total = term if total is None else total + term
    if ascii_count is not None:
        total = total + ascii_count * F.lit(ASCII_UNIT_WEIGHT)
    return F.floor(total / F.lit(UNSEG_UNIT_LCM)).cast("long")


def unsegmented_char_counts(col: Column) -> tuple[Column, Column]:
    """``(han_kana_chars, thai_letter_chars)`` counts for a text column
    (pre-r12 helper, kept for back-compat — new code should use
    :func:`unsegmented_script_counts`, which also covers Lao, Khmer,
    Myanmar and Tibetan)."""
    hk = F.size(F.regexp_extract_all(col, F.lit(HAN_KANA_CLASS), 0))
    th = F.size(F.regexp_extract_all(col, F.lit(THAI_LETTER_CLASS), 0))
    return hk.cast("long"), th.cast("long")


def word_units(col: Column) -> Column:
    """Script-aware token-count proxy (round 11, extended round 12):
    whitespace tokens PLUS the unsegmented-script character
    word-equivalents ``floor(sum(chars_s / divisor_s))`` over
    :data:`UNSEGMENTED_SCRIPTS` (exact lcm-scaled integer arithmetic).

    ``token_count`` sees an unsegmented-script document as ~1 token,
    which silently breaks every budget keyed on it — ``pack_sequences``
    overpacks CJK docs ~100x, ``length_curriculum`` bins them all as
    tiny.  For pure-Latin text this is EXACTLY ``token_count`` (the
    script counts are zero); for mixed text the unsegmented chars add
    their word-equivalents on top of the whitespace tokens (a
    space-delimited CJK run is counted once as a token and once as
    units — an accepted upper-bias of the proxy, documented here).
    SQL-portable: both engines compute the identical integer.  The
    per-script counts hide behind the free
    :func:`has_unsegmented_chars` screen (r12): an all-ASCII document
    pays one length compare instead of six regex scans, with identical
    values (zero unsegmented chars contribute zero units)."""
    return F.when(
        has_unsegmented_chars(col),
        token_count(col) + units_from_counts(unsegmented_script_counts(col)),
    ).otherwise(token_count(col)).cast("long")


def segment_unsegmented(col: Column) -> Column:
    """Space-delimit every Han/Kana/Thai character so whitespace
    tokenizers see PER-CHARACTER tokens — the standard char-level
    fallback for unsegmented scripts (CCNet trains char-ish
    SentencePiece models for zh/ja/th for the same reason).  Latin
    text passes through byte-identical (no such chars).  Pure
    expression, portable: Java/RE2 spell the group ref ``$1``/``\\1``
    respectively, Python ``\\1`` — each engine's caller uses its own
    spelling over the SAME literal char class."""
    return F.regexp_replace(
        col, "(" + UNSEGMENTED_CLASS + ")", " $1 "
    )


def unsegmented_ratio(col: Column) -> Column:
    """Fraction of non-whitespace characters in an unsegmented script
    (Han/Kana/Thai letters), 6-dp rounded.  ``>= SCRIPT_MIN_RATIO``
    is the document-level "switch the word proxy" test used by the
    script-aware Gopher/C4 gates."""
    nonspace = F.greatest(
        F.length(F.regexp_replace(col, EXPLICIT_WS + "+", "")), F.lit(1)
    )
    n = F.size(F.regexp_extract_all(col, F.lit(UNSEGMENTED_CLASS), 0))
    return F.round(n.cast("double") / nonspace.cast("double"), 6)

#: explicit whitespace class — Java \s and RE2 \s disagree on \x0b, so
#: oracle-mirrored expressions never use the shorthand
EXPLICIT_WS = "[ \t\n\f\r\x0b]"

ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by",
)


def tokens(col: Column) -> Column:
    """Whitespace tokens as ``array<string>`` (empty for blank strings)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


#: GPT-style pre-tokenization chunks: word / number / punctuation runs
#: (leading space folded into the chunk). Portable to DuckDB's
#: regexp_extract_all.
BPE_CHUNK_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

#: ~4 chars/token is the usual BPE rule of thumb; chunks longer than this
#: count as multiple subword pieces.
BPE_CHARS_PER_PIECE = 6


#: chars per BPE piece for unsegmented-script runs — real BPEs spend
#: ~1-2 chars/token on CJK (much denser than the Latin ~4-6)
BPE_UNSEG_CHARS_PER_PIECE = 2


def bpe_token_count(col: Column, script_aware: bool = False) -> Column:
    """BPE-ish token estimate, pure expressions (no tokenizer library):
    pre-tokenize into word/number/punct chunks with
    :data:`BPE_CHUNK_PATTERN`, then charge ``ceil(len/6)`` pieces per
    chunk — long words split into several subwords, as a real BPE would.
    Deterministic and SQL-portable (oracle-checked).

    Known approximation of the default path (round 11): an unsegmented
    Han/Kana/Thai run is ONE punct-class chunk charged len/6 pieces,
    while real BPEs spend ~1-2 chars/token on CJK — an ~5-10x
    undercount for those scripts.  ``script_aware=True`` (round 12)
    closes it: unsegmented-script chars are charged separately at
    ``ceil(chars/2)`` pieces and REMOVED from the chunk stream (blanked
    to spaces, which splits surrounding Latin chunks exactly where a
    script boundary splits real pre-tokenizers).  Latin text counts
    identically either way (no such chars, and the blanking is a
    no-op), behind the free :func:`has_unsegmented_chars` screen."""
    text = F.trim(col)
    if script_aware:
        unseg_n = F.size(
            F.regexp_extract_all(text, F.lit(UNSEGMENTED_CLASS), 0)
        ).cast("long")
        blanked = F.trim(F.regexp_replace(text, UNSEGMENTED_CLASS, " "))
        latin_pieces = bpe_token_count(blanked)
        aware = (
            latin_pieces
            + F.ceil(unseg_n / F.lit(BPE_UNSEG_CHARS_PER_PIECE)).cast("long")
        ).cast("long")
        return F.when(has_unsegmented_chars(text), aware).otherwise(
            bpe_token_count(text)
        )
    chunks = F.regexp_extract_all(text, F.lit(BPE_CHUNK_PATTERN), 0)
    pieces = F.transform(
        chunks,
        lambda c: F.greatest(
            F.ceil(F.length(F.trim(c)) / F.lit(BPE_CHARS_PER_PIECE)), F.lit(1)
        ),
    )
    return F.coalesce(
        F.aggregate(pieces, F.lit(0).cast("long"), lambda acc, v: acc + v),
        F.lit(0).cast("long"),
    )


def _marker_ratio(toks: Column, markers: tuple[str, ...]) -> Column:
    in_list = F.size(F.filter(toks, lambda t: t.isin(*markers)))
    return in_list / F.greatest(F.size(toks), F.lit(1))


def lang_id(
    col: Column,
    min_ratio: float = 0.05,
    script_min_ratio: float = SCRIPT_MIN_RATIO,
) -> Column:
    """Two-tier language identification, pure expressions (no model,
    no UDF), 30 languages, or ``'und'``.

    Tier 1 — Unicode script: when a non-Latin script covers
    ``script_min_ratio`` of the non-whitespace characters, the script
    decides (unsegmented scripts have no marker words to count).
    Hangul → ko; Han+Kana with any Kana → ja, Han alone → zh (Japanese
    prose always mixes kana in; Chinese never does); Cyrillic → uk/ru
    by each language's unique letters; Arabic script → fa when
    Persian-only letters appear, else ar; Hebrew/Greek/Devanagari/Thai
    are one-language scripts here.

    Tier 2 — Latin: highest marker-word ratio over
    :data:`LANG_MARKERS` wins, gated at ``min_ratio``; ties break by
    language-code order (deterministic).  The max-then-first-match
    cascade is O(languages) expression size — each ratio is computed
    once and compared against the shared ``greatest(...)``.

    Both tiers are the exact CASE cascade the DuckDB oracle
    regenerates from the same tables (``_sql_lang_id`` in
    ``__spark_entry__``); arithmetic shapes are kept identical (counts
    divided by the same denominator, same association) so borderline
    doubles compare the same way in both engines.
    """
    text = F.trim(col)
    lowered = F.lower(text)
    nonspace = F.greatest(
        F.length(F.regexp_replace(text, EXPLICIT_WS + "+", "")), F.lit(1)
    )

    def cnt(cls: str, src: Column = text) -> Column:
        return F.size(F.regexp_extract_all(src, F.lit(cls), 0))

    c = {name: cnt(cls) for name, cls in SCRIPT_CLASSES.items()}
    sigma = F.lit(float(script_min_ratio))

    # tier 2 first (the otherwise-branch of the script cascade)
    toks = tokens(lowered)
    ratios = {lang: _marker_ratio(toks, m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    gmax = F.greatest(*[ratios[lang] for lang in langs])
    latin = None
    for lang in langs:  # first match in code order = tie-break
        hit = ratios[lang] == gmax
        latin = (
            F.when(hit, F.lit(lang))
            if latin is None
            else latin.when(hit, F.lit(lang))
        )
    latin = F.when(
        gmax >= F.lit(float(min_ratio)), latin.otherwise(F.lit("und"))
    ).otherwise(F.lit("und"))

    return (
        F.when(c["hangul"] / nonspace >= sigma, F.lit("ko"))
        .when(
            ((c["han"] + c["kana"]) / nonspace >= sigma) & (c["kana"] > 0),
            F.lit("ja"),
        )
        .when(c["han"] / nonspace >= sigma, F.lit("zh"))
        .when(
            c["cyr"] / nonspace >= sigma,
            F.when(
                cnt(UK_ONLY_CHARS, lowered) > cnt(RU_ONLY_CHARS, lowered),
                F.lit("uk"),
            ).otherwise(F.lit("ru")),
        )
        .when(
            c["arab"] / nonspace >= sigma,
            F.when(cnt(FA_ONLY_CHARS, lowered) > 0, F.lit("fa")).otherwise(
                F.lit("ar")
            ),
        )
        .when(c["heb"] / nonspace >= sigma, F.lit("he"))
        .when(c["grek"] / nonspace >= sigma, F.lit("el"))
        .when(c["deva"] / nonspace >= sigma, F.lit("hi"))
        .when(c["thai"] / nonspace >= sigma, F.lit("th"))
        .when(c["khmer"] / nonspace >= sigma, F.lit("km"))
        .when(c["lao"] / nonspace >= sigma, F.lit("lo"))
        .when(c["mymr"] / nonspace >= sigma, F.lit("my"))
        .when(c["tibt"] / nonspace >= sigma, F.lit("bo"))
        .otherwise(latin)
    )


def add_lang_id(
    df,
    text_col: str,
    out_col: str = "lang",
    min_ratio: float = 0.05,
    script_min_ratio: float = SCRIPT_MIN_RATIO,
):
    """DataFrame-level :func:`lang_id`: same labels, materialize-once
    plan (round 11).

    The Column cascade re-evaluates each of the 19 marker-ratio
    subtrees (token split + filter + isin) once inside ``greatest``
    and once per CASE branch — ~40 evaluations of the token array per
    document (measured 11.8 s vs the 5.3 s sum of its parts on 15k
    docs).  Here the token array, script counts and ratios land in
    prior projections and the cascade compares COLUMN REFS, so each
    is computed exactly once.  Arithmetic shapes are identical to
    :func:`lang_id` (property-tested label equality), so the same
    DuckDB oracle covers both.  Returns ``df`` plus ``out_col``; all
    other columns pass through.  Zero shuffles."""
    names = list(df.columns)
    # name-collision guard (r12, ADVICE r11): an existing out_col would
    # duplicate in the final select (breaking later F.col(out_col) with
    # an ambiguity error), and an existing __li_* scratch name would be
    # shadowed by the helper projections — fail loudly instead.
    if out_col in names:
        raise ValueError(
            f"add_lang_id: output column {out_col!r} already exists in the"
            " input DataFrame — drop or rename it first"
        )
    clash = [n for n in names if n.startswith("__li_")]
    if clash:
        raise ValueError(
            f"add_lang_id: input columns {clash} collide with the __li_*"
            " scratch namespace"
        )
    text = F.trim(F.col(text_col))
    lowered = F.lower(text)
    p0 = df.select(
        *[F.col(c) for c in names],
        lowered.alias("__li_low"),
        tokens(lowered).alias("__li_toks"),
        F.greatest(
            F.length(F.regexp_replace(text, EXPLICIT_WS + "+", "")), F.lit(1)
        ).alias("__li_ns"),
    )

    def cnt(cls: str, src: Column) -> Column:
        return F.size(F.regexp_extract_all(src, F.lit(cls), 0))

    toks = F.col("__li_toks")
    low = F.col("__li_low")
    p1 = p0.select(
        *[F.col(c) for c in names],
        F.col("__li_ns"),
        *[cnt(cls, text).alias(f"__li_c_{k}")
          for k, cls in SCRIPT_CLASSES.items()],
        cnt(UK_ONLY_CHARS, low).alias("__li_uk"),
        cnt(RU_ONLY_CHARS, low).alias("__li_ru"),
        cnt(FA_ONLY_CHARS, low).alias("__li_fa"),
        *[_marker_ratio(toks, m).alias(f"__li_r_{lang}")
          for lang, m in LANG_MARKERS.items()],
    )

    nonspace = F.col("__li_ns")
    c = {k: F.col(f"__li_c_{k}") for k in SCRIPT_CLASSES}
    ratios = {lang: F.col(f"__li_r_{lang}") for lang in LANG_MARKERS}
    sigma = F.lit(float(script_min_ratio))
    langs = sorted(LANG_MARKERS)
    gmax = F.greatest(*[ratios[lang] for lang in langs])
    latin = None
    for lang in langs:
        hit = ratios[lang] == gmax
        latin = (
            F.when(hit, F.lit(lang))
            if latin is None
            else latin.when(hit, F.lit(lang))
        )
    latin = F.when(
        gmax >= F.lit(float(min_ratio)), latin.otherwise(F.lit("und"))
    ).otherwise(F.lit("und"))
    cascade = (
        F.when(c["hangul"] / nonspace >= sigma, F.lit("ko"))
        .when(
            ((c["han"] + c["kana"]) / nonspace >= sigma) & (c["kana"] > 0),
            F.lit("ja"),
        )
        .when(c["han"] / nonspace >= sigma, F.lit("zh"))
        .when(
            c["cyr"] / nonspace >= sigma,
            F.when(F.col("__li_uk") > F.col("__li_ru"), F.lit("uk"))
            .otherwise(F.lit("ru")),
        )
        .when(
            c["arab"] / nonspace >= sigma,
            F.when(F.col("__li_fa") > 0, F.lit("fa")).otherwise(F.lit("ar")),
        )
        .when(c["heb"] / nonspace >= sigma, F.lit("he"))
        .when(c["grek"] / nonspace >= sigma, F.lit("el"))
        .when(c["deva"] / nonspace >= sigma, F.lit("hi"))
        .when(c["thai"] / nonspace >= sigma, F.lit("th"))
        .when(c["khmer"] / nonspace >= sigma, F.lit("km"))
        .when(c["lao"] / nonspace >= sigma, F.lit("lo"))
        .when(c["mymr"] / nonspace >= sigma, F.lit("my"))
        .when(c["tibt"] / nonspace >= sigma, F.lit("bo"))
        .otherwise(latin)
    )
    return p1.select(*[F.col(n) for n in names], cascade.alias(out_col))


def quality_score(col: Column) -> Column:
    """Composite quality score in [0, 1] (higher = better), rounded to 6dp.

    Components (equal-weighted):
    * length score: ``least(n_chars, 2000) / 2000``
    * alpha ratio: alphabetic+space chars / total chars
    * stopword ratio clamped to [0, 0.5] then scaled to [0, 1]
    * mean token length in the sweet spot [3, 10] -> 1, else decays

    ENGLISH-CENTRIC BY DESIGN (the stopword list and the [A-Za-z]
    alpha class): a Han/Kana/Thai document bottoms out near ~0.3
    regardless of fluency.  For multilingual corpora use
    :func:`quality_score_multilingual` (r12 — same composite, script-
    fair components for unsegmented docs, byte-identical here for
    Latin text), or the script-aware hard gates
    (``gopher_filter(script_aware=True)``) plus per-language LM
    scoring (``lm_score_by_lang(script_aware=True)``) when a trained,
    per-language signal is wanted — a single cross-script composite
    can rank within a script family but must not be compared across
    unrelated corpora.
    """
    text = F.trim(col)
    n_chars = F.length(text)
    toks = tokens(F.lower(text))
    n_toks = F.greatest(F.size(toks), F.lit(1))

    length_score = F.least(n_chars.cast("double"), F.lit(2000.0)) / F.lit(2000.0)

    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z ]", ""))
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1))

    stop_ratio = _marker_ratio(toks, ENGLISH_STOPWORDS)
    stop_score = F.least(stop_ratio, F.lit(0.5)) * 2.0

    mean_len = (n_chars - (F.size(toks) - 1)) / n_toks
    word_score = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )

    score = (length_score + alpha_ratio + stop_score + word_score) / 4.0
    return F.round(score, 6)


def quality_score_multilingual(col: Column) -> Column:
    """Script-fair :func:`quality_score` (round 12): same four
    equal-weighted components, with each English-calibrated component
    swapped for its script-aware analogue when the document is
    unsegmented-script dominant (``unsegmented_ratio >=
    SCRIPT_MIN_RATIO``, behind the free :func:`has_unsegmented_chars`
    screen).  Latin documents score BYTE-IDENTICALLY to
    :func:`quality_score` (property-tested), so existing rankings are
    unaffected; a fluent Chinese/Thai/Khmer page now scores in the
    same band as fluent English instead of bottoming out near 0.3.

    Unsegmented substitutions:

    * alpha ratio -> (script letters + ASCII letters + spaces) / chars
      — same "mostly language" meaning with the script's own letters;
    * stopword score -> distinct function particles present
      (:data:`UNSEGMENTED_PARTICLES`), 5+ saturating to 1.0 — the
      particle analogue of the 0.5-clamped stopword ratio;
    * word-shape score -> 1.0 when the word-unit proxy finds at least
      ``min`` words' worth of letters (the [3,10] mean-token-length
      band is a Latin shape with no unsegmented analogue), else 0.5;
    * length score unchanged.

    Like the base score this RANKS within a corpus; cross-language
    absolute comparisons should still prefer the per-language LM
    percentile (``lm_quantile_filter_by_lang``).  SQL-portable — the
    oracle regenerates both branches from the same tables."""
    text = F.trim(col)
    n_chars = F.length(text)
    base = quality_score(col)

    length_score = F.least(n_chars.cast("double"), F.lit(2000.0)) / F.lit(2000.0)
    counts = unsegmented_script_counts(text)
    script_letters = None
    for c in counts.values():
        script_letters = c if script_letters is None else script_letters + c
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z ]", ""))
    alpha_ratio_u = (
        (script_letters + alpha_chars).cast("double")
        / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    n_particles = None
    for p in UNSEGMENTED_PARTICLES:
        c = text.contains(p).cast("long")
        n_particles = c if n_particles is None else n_particles + c
    stop_score_u = F.least(n_particles.cast("double") / F.lit(5.0), F.lit(1.0))
    word_score_u = F.when(
        units_from_counts(counts) >= F.lit(3), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score_u = F.round(
        (length_score + alpha_ratio_u + stop_score_u + word_score_u) / 4.0, 6
    )
    unseg = F.when(
        has_unsegmented_chars(text),
        unsegmented_ratio(text) >= F.lit(float(SCRIPT_MIN_RATIO)),
    ).otherwise(F.lit(False))
    return F.when(unseg, score_u).otherwise(base)


def bind_once(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE per row and hand the bound value to ``fn``.

    Spark inlines a lambda's free variables into the lambda body, so a
    sliding-window ``transform`` whose lambda slices a raw ``split(...)``
    expression re-tokenizes the document once per window — a silent
    O(tokens²) in what reads as an O(tokens) expression (measured 5.7×
    on bigram mining at 50k docs). Routing the expression through a
    single-element ``transform`` turns it into a bound lambda variable,
    which IS evaluated once. Zero-cost otherwise; works for any types.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_ngrams(toks: Column, n: int) -> Column:
    """Sliding word n-grams of a token array, space-joined, as
    ``array<string>``. Arrays shorter than ``n`` yield an empty array.
    Pure expressions — ``sequence`` + ``transform`` over the token array;
    SQL-portable (DuckDB: ``list_transform(range(1, len(t)-n+2),
    i -> array_to_string(t[i:i+n-1], ' '))``). The input expression is
    bound once per row (see :func:`bind_once`) — callers may pass a raw
    ``split``/``tokens`` expression without a per-gram re-tokenize."""

    def grams(t: Column) -> Column:
        n_tokens = F.size(t)
        return F.when(n_tokens < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_tokens - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            )
        )

    return bind_once(toks, grams)


def repetition_ratio(col: Column, n: int = 2, script_aware: bool = False) -> Column:
    """Fraction of repeated word n-grams: ``1 - distinct/total`` in
    [0, 1] (0 = no repetition). The classic boilerplate/spam signal from
    Gopher-style quality filtering — pages that loop the same phrases
    score high. Pure expressions over the token array; ``n=1`` measures
    repeated words, ``n=2``/``n=3`` repeated phrases.

    ``script_aware=True`` (r12) char-tokenizes unsegmented-script runs
    first (:func:`segment_unsegmented` — the spans/LM convention:
    applied to any such run, no doc-level ratio switch), so a looping
    CJK page scores high instead of collapsing to ~1 token and
    repetition 0.  Latin text is byte-identical either way."""
    low = F.lower(col)
    if script_aware:
        low = segment_unsegmented(low)
    grams = word_ngrams(tokens(low), n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.round(
        F.when(total <= 0, F.lit(0.0)).otherwise(
            1.0 - distinct / total.cast("double")
        ),
        6,
    )


#: simple, RE2-compatible patterns (portable between Spark's Java regex
#: and DuckDB's RE2) — the defaults a curation pass masks before training
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "long_number": r"[0-9]{8,}",
}


def scrub_pii(col: Column, patterns: dict[str, str] | None = None) -> Column:
    """Mask PII-like spans with ``<TYPE>`` placeholders (``<EMAIL>``,
    ``<LONG_NUMBER>``, ...). Chained ``regexp_replace`` — stays in
    whole-stage codegen, no UDF."""
    out = col
    for name, pattern in sorted((patterns or PII_PATTERNS).items()):
        out = F.regexp_replace(out, pattern, f"<{name.upper()}>")
    return out


def pii_match_count(col: Column, patterns: dict[str, str] | None = None) -> Column:
    """Total count of PII-like matches in the text (for filtering docs
    with heavy PII density rather than scrubbing them)."""
    total = F.lit(0)
    for _, pattern in sorted((patterns or PII_PATTERNS).items()):
        total = total + F.size(F.regexp_extract_all(col, F.lit(pattern), 0))
    return total.cast("long")


def doc_fingerprint(col: Column) -> Column:
    """md5 of lowercased, whitespace-collapsed text — exact-dup key."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)


def bag_fingerprint(col: Column) -> Column:
    """md5 of the SORTED DISTINCT token set — an order/repetition-blind
    dup key: token-permuted or re-repeated rewrites of the same content
    collide, which plain :func:`doc_fingerprint` misses. Portable
    (DuckDB: md5(array_to_string(list_sort(list_distinct(tokens)), ' '))).
    """
    bag = F.array_sort(F.array_distinct(tokens(F.lower(F.trim(col)))))
    return F.md5(F.concat_ws(" ", bag))


#: URL matcher shared with link_stats — deliberately simple (scheme +
#: non-whitespace) so the identical pattern runs under Java regex and
#: DuckDB's RE2 with the same matches
URL_PATTERN = r"https?://[^\s]+"
_DOMAIN_PATTERN = r"https?://([^/\s]+)"


def extract_urls(col: Column) -> Column:
    """All ``http(s)://`` URLs in the text, as ``array<string>`` (in
    document order, duplicates kept). Pure ``regexp_extract_all``."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)


def url_domains(col: Column) -> Column:
    """Distinct registered hosts of the text's URLs (lowercased), as
    ``array<string>`` sorted ascending — the spam/link-farm signal is
    usually 'how many DISTINCT domains', not raw link count."""
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.regexp_extract_all(col, F.lit(_DOMAIN_PATTERN), 1),
                F.lower,
            )
        )
    )


def link_density(col: Column) -> Column:
    """URLs per whitespace token (0.0 for empty docs) — documents that
    are mostly links are navigation/boilerplate, not prose."""
    n_toks = F.size(tokens(col))
    return F.when(n_toks <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.size(F.regexp_extract_all(col, F.lit(URL_PATTERN), 0))
            / n_toks.cast("double"),
            6,
        )
    )


#: HTML entities decoded by strip_html (the handful that appear in
#: text-bearing positions; full entity tables belong to a real parser)
_HTML_ENTITIES = [
    # &amp; decodes LAST: "&amp;lt;" must yield the literal "&lt;", not "<"
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def strip_html(col: Column) -> Column:
    """Markup-to-text for crawled documents: drop ``<script>``/``<style>``
    blocks wholesale, remove every remaining tag, decode the common
    entities, and collapse whitespace.

    A regex strip, not a DOM parse — the honest scan-side approximation
    (boilerplate/link-density operators downstream handle what a parser
    would have classified structurally). Patterns are RE2-compatible (no
    backreferences) and avoid ``(?i)`` (Java/RE2 disagree on exotic case
    folds — see operators/maincontent._ci), so a SQL oracle reproduces
    the output byte-for-byte and the same expression runs in any engine
    Spark pushes it to.
    """
    out = F.regexp_replace(
        col, r"(?s)<[sS][cC][rR][iI][pP][tT][^>]*>.*?</[sS][cC][rR][iI][pP][tT]>", " "
    )
    out = F.regexp_replace(
        out, r"(?s)<[sS][tT][yY][lL][eE][^>]*>.*?</[sS][tT][yY][lL][eE]>", " "
    )
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for entity, repl in _HTML_ENTITIES:
        out = F.regexp_replace(out, entity, repl)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def luhn_valid(col: Column) -> Column:
    """Luhn checksum over the digits of a string — true iff the digit
    sequence passes (the card-number check).  Use to verify
    ``long_number`` PII candidates before scrubbing/flagging: random
    8-16 digit runs (order ids, timestamps) fail ~90% of the time, so
    gating on Luhn cuts false "payment card" hits an order of
    magnitude.  Pure expressions: digits reversed, doubled at odd
    positions via ``transform`` index arithmetic, folded with
    ``aggregate`` — no UDF.
    """
    digits = F.regexp_replace(col, r"[^0-9]", "")
    rev = F.split(F.reverse(digits), "")
    # position i (0-based in reversed order): even keeps d, odd doubles
    # (summing the two digits of 2d as 2d>9 ? 2d-9 : 2d)
    terms = F.zip_with(
        rev,
        F.sequence(F.lit(0), F.greatest(F.length(digits), F.lit(1)) - 1),
        lambda d, i: F.when(
            i % 2 == 0, d.cast("int")
        ).otherwise(
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(
                d.cast("int") * 2
            )
        ),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, t: acc + F.coalesce(t, F.lit(0)))
    # null text must be FALSE, not null: a negated predicate would
    # otherwise silently drop null rows
    return F.coalesce((F.length(digits) >= 8) & (total % 10 == 0), F.lit(False))


def blocklist_hits(col: Column, terms: list[str]) -> Column:
    """Count of blocklisted terms present in the text (case-insensitive
    whole-word matches).  The standard keyword-exclusion stage (domain
    or content blocklists); one compiled alternation regex, RE2-portable
    (no backreferences), whole-stage codegen.  Filter with
    ``blocklist_hits(...) == 0`` or keep the count as a feature.
    """
    if not terms:
        return F.lit(0)
    import re as _re

    alternation = "|".join(_re.escape(t.lower()) for t in sorted(terms))
    pattern = rf"(?i)\b(?:{alternation})\b"
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


#: Query parameters stripped by canonical_url: tracking/session noise
#: that makes byte-distinct URLs point at the same resource.
#: NOTE: plain ``ref`` is deliberately NOT stripped — many sites use it
#: as a content-determining parameter (branch/variant selectors), so
#: removing it would merge distinct resources; ``ref_src`` (social
#: share tracking) is safe.
TRACKING_PARAMS = (
    "utm_[a-z]+", "fbclid", "gclid", "msclkid", "mc_[ce]id", "igshid",
    "ref_src", "spm",
)


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL for dedup keys: lowercased host without
    ``www.``, path without its trailing slash, query with tracking
    parameters removed and the survivors SORTED (param order is
    presentation noise), scheme and fragment dropped.

    URL dedup is the first dedup of any web pipeline — it collapses the
    crawl frontier before a byte of content is compared.  Pure
    ``parse_url`` + array expressions, whole-stage codegen.
    """
    # try_parse_url: plain parse_url is ANSI-strict and would abort the
    # job on the first malformed URL in a crawl.  AUTHORITY (not HOST)
    # keeps a non-default port — dropping it would merge distinct
    # origins; userinfo and the default :80/:443 are presentation noise.
    host = F.lower(F.try_parse_url(col, F.lit("AUTHORITY")))
    host = F.regexp_replace(host, r"^[^@/]*@", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/$", "")
    query = F.try_parse_url(col, F.lit("QUERY"))
    tracking = "|".join(TRACKING_PARAMS)
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(rf"^(?:{tracking})="),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(host, path, qtail)
    )
