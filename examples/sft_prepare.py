"""End-to-end SFT (instruction-tuning) data preparation example.

Composes the round-6 late-session operators into the pipeline an SFT
data team actually runs:

  read documents -> cross-corpus LM perplexity filter (train on the
  trusted half, keep head+middle of the target half) -> synthesize
  conversations (stand-in for real chat ingestion) -> structural
  audit + well-formed gate -> whitespace-normalized conversation
  dedup -> extract the target completion -> fuzzy near-dup check on
  completions (edit-distance blocking) -> real-BPE token accounting
  against a budget -> write shards + a summary report

Usage (from the repo root):

    python examples/sft_prepare.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=/tmp/sft_prep.
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from hermes_spark.operators import (
    bpe_token_counts,
    bpe_train_merges,
    conversation_stats,
    dedup_conversations,
    edit_distance_pairs,
    last_assistant_reply,
    lm_score,
    lm_train,
    perplexity_ntile,
    turns_from_text,
)

TOKEN_BUDGET = 200_000


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sft_prep"
    t_start = time.time()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sft-prepare")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. Perplexity filter: the even half plays the trusted reference
    #    corpus, the odd half is the candidate pool; drop the tail.
    lm = lm_train(docs.filter(F.col("doc_id") % 2 == 0), vocab_size=500)
    scored = lm_score(
        docs.filter(F.col("doc_id") % 2 == 1), lm, broadcast_model=True
    )
    kept_ids = (
        perplexity_ntile(scored)
        .filter(F.col("ppl_bucket") != "tail")
        .select("doc_id")
    )
    pool = docs.join(kept_ids, "doc_id")
    n1 = pool.count()

    # 2. Conversations: split each doc into alternating turns (the
    #    corpus has no punctuation, so split on the modal token; real
    #    chat data arrives already structured).
    convs = pool.select(
        "doc_id",
        turns_from_text(F.col("text"), sep=r"\s+the\s+").alias("turns"),
    )

    # 3. Structural gate: user-first, alternating, assistant-final,
    #    nothing empty.
    stats = conversation_stats(convs)
    convs = convs.join(
        stats.filter("well_formed").select("doc_id"), "doc_id"
    )
    n2 = convs.count()

    # 4. Exact dedup up to whitespace.
    convs = dedup_conversations(convs).localCheckpoint(eager=True)
    n3 = convs.count()

    # 5. Target completions + near-dup diagnostics on them.
    targets = convs.select(
        "doc_id", last_assistant_reply(F.col("turns")).alias("completion")
    ).filter(F.col("completion").isNotNull())
    near_pairs = edit_distance_pairs(
        targets, "doc_id", "completion",
        max_distance=5, prefix_len=8, match_len=40,
    ).count()

    # 6. Token accounting with a real learned tokenizer; cap to budget
    #    in deterministic doc_id order.
    merges = bpe_train_merges(pool, num_merges=100, max_words=10_000)
    counts = bpe_token_counts(
        convs.join(pool, "doc_id").select("doc_id", "text"), merges
    )
    w = F.sum("n_pieces").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    )
    budgeted = (
        counts.withColumn("cum_pieces", w)
        .filter(F.col("cum_pieces") <= TOKEN_BUDGET)
        .select("doc_id", "n_pieces")
    )
    n4 = budgeted.count()
    total_tokens = (
        budgeted.agg(F.sum("n_pieces")).collect()[0][0] or 0
    )

    # 7. Ship: conversations for the budgeted ids.
    final = convs.join(budgeted.select("doc_id"), "doc_id")
    final.write.mode("overwrite").parquet(f"{out_dir}/conversations")

    wall = time.time() - t_start
    print(
        f"docs {n0} -> lm-filtered pool {n1} -> well-formed {n2} -> "
        f"deduped {n3} -> budgeted {n4} "
        f"({total_tokens} BPE tokens <= {TOKEN_BUDGET}); "
        f"completion near-dup pairs flagged: {near_pairs}; "
        f"{wall:.1f}s -> {out_dir}/conversations"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
