"""Round-6: prefix filtering must actually PRUNE on a realistic
(Zipfian, >=10k-term) vocabulary.

The bundled documents corpus has ~31 distinct tokens, so every prefix
token is a corpus-wide bucket and candidate generation degenerates to
near-all-pairs (honest output, useless evidence).  These tests measure
candidate counts on a Zipf corpus and pin the scale-shape claim in
operators/setjoin.py:19-28.
"""

from pyspark.sql import functions as F

from hermes_spark.operators import containment_join, jaccard_set_join
from hermes_spark.synth import zipf_documents


def test_zipf_corpus_shape(spark):
    docs = zipf_documents(spark, 500, vocab_size=20_000, doc_len=60, seed=1)
    n_terms = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .select("t").distinct().count()
    )
    # log-uniform ranks over 20k terms: a 30k-token sample draws several
    # thousand distinct terms (every magnitude equally likely)
    assert n_terms > 3_000
    # determinism
    a = docs.orderBy("doc_id").limit(3).collect()
    b = zipf_documents(spark, 500, vocab_size=20_000, doc_len=60, seed=1) \
        .orderBy("doc_id").limit(3).collect()
    assert a == b


def test_jaccard_prefix_filter_prunes_on_realistic_vocab(spark):
    n = 2_000
    docs = zipf_documents(
        spark, n, vocab_size=20_000, doc_len=60, seed=2, near_dup_every=50
    )
    stats: dict = {}
    pairs = jaccard_set_join(docs, min_jaccard=0.7, stats=stats).collect()
    all_pairs = n * (n - 1) // 2
    ratio = stats["candidates"] / all_pairs
    # the point of the round-6 probe: candidates MUST be a tiny fraction
    # of the quadratic pair space on a realistic vocabulary (measured
    # ~1.6% = ~60x below all-pairs on this corpus; the bound leaves
    # headroom for hash jitter across Spark versions)
    assert ratio < 0.03, (stats, ratio)
    # and the planted near-dups are all found (lossless filter)
    planted = {(i - 1, i) for i in range(50, n, 50)}
    got = {(r.id_a, r.id_b) for r in pairs}
    assert planted <= got, planted - got
    # every reported pair really clears the threshold
    assert all(r.jaccard >= 0.7 for r in pairs)


def test_containment_prefix_filter_prunes_on_realistic_vocab(spark):
    n = 1_000
    docs = zipf_documents(
        spark, n, vocab_size=20_000, doc_len=60, seed=3, near_dup_every=100
    )
    stats: dict = {}
    out = containment_join(
        docs, min_containment=0.8, ngram=3, stats=stats
    ).collect()
    # directional candidates: compare against the n*(n-1) ordered space
    ratio = stats["candidates"] / (n * (n - 1))
    assert ratio < 0.01, (stats, ratio)
    # word-3-grams of a 90%-shared token stream: the shared PREFIX run
    # (~53 of 58 grams) is intact, so containment >= 0.8 pairs exist
    got = {(r.id_a, r.id_b) for r in out}
    planted_found = sum(
        1 for i in range(100, n, 100)
        if (i, i - 1) in got or (i - 1, i) in got
    )
    assert planted_found >= (n // 100) - 1, (planted_found, sorted(got)[:5])
