"""Fixed-weight linear quality classifier over cheap text features.

Extension beyond reference parity (the reference has no text analytics;
see ``SURVEY.md`` §2 extension table). The standard shape of a
first-pass corpus quality filter (C4 / Gopher / fastText-style): a
handful of interpretable per-document features, a linear model, a
sigmoid, a threshold. The *weights* here are deliberately simple
defaults — the operator's contract is the feature extraction and the
scoring plumbing; callers drop in weights trained offline.

Features (all exact, engine-portable):

* ``n_tokens``        — whitespace token count
* ``mean_tok_len``    — non-space characters / tokens
* ``distinct_ratio``  — type-token ratio (templates score low)
* ``stopword_ratio``  — fraction of tokens in a small function-word set
  (natural prose sits in a band; keyword-stuffed spam sits near 0)

Scale design (100 TB):

* Entirely per-row column expressions — one token-array split reused by
  every feature, no explode, no shuffle, no Python. The whole operator
  fuses into the scan's whole-stage-codegen span, so scoring a corpus
  costs one pass over the text column and nothing else.
* The model is a literal folded into the plan (no join against a
  weights table); swapping weights re-plans, which is the right
  trade-off for a model with four coefficients.
* Scores are ``sigmoid(w·x + b)`` rounded to 6 dp — reproducible in
  ANSI SQL, so the operator is oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["QUALITY_WEIGHTS", "STOPWORDS", "quality_features", "linear_quality_score"]

#: Small function-word set shared with the SQL oracle. Lowercase match.
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Default model: favors mid-length, lexically diverse prose with a
#: plausible function-word rate. Intercept chosen so a typical clean
#: document lands above 0.5.
QUALITY_WEIGHTS: dict[str, float] = {
    "bias": -2.0,
    "log_n_tokens": 0.55,
    "mean_tok_len": 0.12,
    "distinct_ratio": 1.6,
    "stopword_ratio": 2.4,
}


def quality_features(text_col: Column) -> dict[str, Column]:
    """The four feature expressions, keyed by name. One tokenization,
    shared; every feature is a pure column expression. NULL text is
    treated as empty (``n_tokens = 0``, ratios 0) — without the
    coalesce, ``size(null)`` is -1 and the whole score row goes null.

    ENGLISH-CALIBRATED like ``quality_score`` (whitespace tokens +
    English stopwords): for unsegmented-script corpora use the
    script-aware gates and per-language LM, or
    ``quality_score_multilingual``, as the quality signal instead."""
    text_col = F.coalesce(text_col, F.lit(""))
    toks = tokens(F.lower(text_col))
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1)).cast("double")
    non_space = F.length(F.regexp_replace(text_col, r"\s", ""))
    is_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    return {
        "n_tokens": n.cast("long"),
        "mean_tok_len": F.round(non_space.cast("double") / nd, 6),
        "distinct_ratio": F.round(F.size(F.array_distinct(toks)).cast("double") / nd, 6),
        "stopword_ratio": F.round(is_stop.cast("double") / nd, 6),
    }


def linear_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a fixed-weight logistic model.

    Returns ``(id, n_tokens, mean_tok_len, distinct_ratio,
    stopword_ratio, quality, keep)`` where ``quality =
    round(sigmoid(b + w·x), 6)`` and ``keep = quality >= threshold``.
    ``log_n_tokens`` (natural log of ``n_tokens + 1``) is the model's
    length feature so the score saturates instead of growing without
    bound on long documents.
    """
    w = dict(QUALITY_WEIGHTS)
    if weights:
        w.update(weights)
    feats = quality_features(F.col(text_col))
    z = (
        F.lit(w["bias"])
        + F.lit(w["log_n_tokens"]) * F.log(feats["n_tokens"].cast("double") + 1.0)
        + F.lit(w["mean_tok_len"]) * feats["mean_tok_len"]
        + F.lit(w["distinct_ratio"]) * feats["distinct_ratio"]
        + F.lit(w["stopword_ratio"]) * feats["stopword_ratio"]
    )
    quality = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.select(
        F.col(id_col),
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_tok_len"].alias("mean_tok_len"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality.alias("quality"),
        (quality >= F.lit(threshold)).alias("keep"),
    )
