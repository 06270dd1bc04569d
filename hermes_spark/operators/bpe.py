"""Byte-pair-encoding tokenizer: distributed-count training, broadcast
merge table, Arrow-batched distributed encoding.

Extension beyond reference parity (the reference has no tokenizer
surface; see ``SURVEY.md`` §2 extension table). Upgrades the package's
token accounting from the regex ESTIMATE in
``functions/text.py::bpe_token_count`` to a REAL learned subword
tokenizer — the thing a token-budget mixing plan
(``operators/packing.py``, ``plan_epochs``) actually needs to be
denominated in.

Algorithm (Sennrich et al. 2016, word-frequency variant):

* Training operates on the aggregated (word, count) table, not the
  corpus: ONE distributed lowercase-word count (map-side combined),
  then the iterative merge loop runs driver-side on that table, capped
  at ``max_words`` by frequency. This is the honest scale design, not
  a shortcut — the distinct-word table of even a 100 TB corpus is
  millions of rows (Heaps' law), and every production BPE trainer
  (subword-nmt, HuggingFace, SentencePiece) trains single-node on
  exactly this aggregate. The 100 TB part of the job is the count, and
  that is distributed.
* Each merge step picks the most frequent adjacent symbol pair
  (ties: lexicographic on the pair — fully deterministic) and fuses it
  everywhere; words carry an end-of-word marker ``</w>`` fused into
  the final symbol so mid-word and word-final pieces are distinct.
* Encoding is distributed and Arrow-batched: the learned merge ranks
  broadcast as one small dict; ``mapInPandas`` applies greedy
  lowest-rank-first merging per word. Per-word results are memoized
  per batch (Zipf makes the hit rate enormous). No per-row Python UDF;
  this is the Pandas-batch path the multimodal kernels already use.

Non-goals: byte-level fallback alphabets and special-token handling
(delegate to a real tokenizer library in production); this is the
engine-side reference implementation with exact, pinned semantics.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import tokens

__all__ = ["bpe_train_merges", "bpe_encode", "bpe_token_counts", "EOW"]

EOW = "</w>"


def _word_counts(
    df: DataFrame, text_col: str, max_words: int
) -> list:
    wc = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(max_words)
    )
    return [(r.w, r.cnt) for r in wc.collect()]


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 200_000,
) -> list:
    """Learn an ordered BPE merge list from a corpus.

    Returns ``[(left, right), ...]`` in merge order (rank = position).
    Distributed word count; driver-side merge loop over the capped
    (word, count) aggregate (see module docstring for why that is the
    right scale split). Deterministic: count desc, pair asc ties."""
    vocab = {}
    for w, cnt in _word_counts(df, text_col, max_words):
        vocab[tuple(list(w) + [EOW])] = cnt
    merges = []
    for _ in range(num_merges):
        pair_counts = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        # deterministic argmax: max count, ties to the lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        if pair_counts[best] < 2:
            break
        merges.append(best)
        fused = best[0] + best[1]
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict, cache: dict) -> list:
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    cache[word] = syms
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed greedy BPE encode: ``(doc_id, pieces, n_pieces)``
    with ``pieces`` the subword array (word-final pieces end in
    ``</w>``). Merge ranks ship to executors once via task-closure
    broadcast; encoding runs in Arrow batches with a per-batch word
    memo. Blank docs yield an empty array."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField("doc_id", df.schema[id_col].dataType),
            StructField("pieces", ArrayType(StringType())),
            StructField("n_pieces", LongType()),
        ]
    )
    # lowercase JVM-side (F.lower) so encode-time case folding is the
    # SAME fold used at training time (_word_counts); Python str.lower()
    # disagrees on a few code points (e.g. 'İ' -> 'i' + U+0307) and
    # such words would miss merges learned at train time
    src = df.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    )

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import re

        import pandas as pd

        # ASCII \s+ to match the Java-regex split used at TRAINING time
        # (functions/text.py tokens()); Python str.split() would split
        # on unicode whitespace and disagree on what a word is
        ws = re.compile(r"\s+", re.ASCII)
        cache: dict = {}
        for b in batches:
            pieces_col, counts = [], []
            for t in b["__t"]:
                ps = []
                # already lowercased JVM-side in the src select
                for w in ws.split(str(t or "")):
                    if not w:
                        continue
                    ps.extend(_encode_word(w, ranks, cache))
                pieces_col.append(ps)
                counts.append(len(ps))
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "pieces": pieces_col,
                    "n_pieces": pd.Series(counts, dtype="int64"),
                }
            )

    return src.mapInPandas(process, schema=schema)


def bpe_token_counts(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_pieces)`` — the real-tokenizer replacement for the
    regex estimate, for token-budget planning."""
    return bpe_encode(df, merges, id_col, text_col).select("doc_id", "n_pieces")
