"""Chat/SFT conversation operators (operators/chatformat.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hermes_spark.operators import (
    conversation_fingerprint,
    conversation_stats,
    dedup_conversations,
    last_assistant_reply,
    turns_from_text,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField(
            "turns",
            ArrayType(
                StructType(
                    [
                        StructField("role", StringType()),
                        StructField("content", StringType()),
                    ]
                )
            ),
        ),
    ]
)

CONVS = [
    # well-formed: user/assistant/user/assistant
    (1, [("user", "hi there"), ("assistant", "hello"),
         ("user", "more words here"), ("assistant", "ok bye")]),
    # starts with assistant
    (2, [("assistant", "hello"), ("user", "hi")]),
    # broken alternation (two user turns)
    (3, [("user", "a"), ("user", "b"), ("assistant", "c")]),
    # ends on user
    (4, [("user", "q"), ("assistant", "a"), ("user", "thanks")]),
    # empty content turn
    (5, [("user", "q"), ("assistant", "   ")]),
    # single turn
    (6, [("user", "alone")]),
    # empty conversation
    (7, []),
]


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(CONVS, SCHEMA)


@pytest.fixture(scope="module")
def stats(convs):
    return {r.doc_id: r.asDict() for r in conversation_stats(convs).collect()}


def test_well_formed_flags(stats):
    assert stats[1]["well_formed"] is True
    assert [stats[i]["well_formed"] for i in (2, 3, 4, 5, 6, 7)] == [False] * 6


def test_individual_flags(stats):
    assert stats[2]["starts_with_user"] is False and stats[2]["alternates"]
    assert stats[3]["alternates"] is False
    assert stats[4]["ends_with_assistant"] is False
    assert stats[5]["all_nonempty"] is False
    assert stats[6]["n_turns"] == 1 and stats[6]["alternates"] is True
    assert stats[7]["n_turns"] == 0 and stats[7]["alternates"] is False
    assert stats[7]["all_nonempty"] is True  # vacuous


def test_token_shares(stats):
    # conv 1: assistant "hello"(1) + "ok bye"(2) = 3; total 2+1+3+2 = 8
    assert stats[1]["assistant_tokens"] == 3
    assert stats[1]["total_tokens"] == 8
    assert stats[1]["assistant_share"] == pytest.approx(0.375)
    assert stats[7]["assistant_share"] == 0.0


def test_fingerprint_whitespace_invariance(spark):
    a = spark.createDataFrame(
        [(1, [("user", "hi  there"), ("assistant", " ok ")]),
         (2, [("user", "hi there"), ("assistant", "ok")]),
         (3, [("user", "hi there x"), ("assistant", "ok")])],
        SCHEMA,
    ).select(conversation_fingerprint(F.col("turns")).alias("fp"))
    fps = [r.fp for r in a.collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_dedup_conversations(spark):
    df = spark.createDataFrame(
        [(10, [("user", "hi"), ("assistant", "yo")]),
         (11, [("user", " hi "), ("assistant", "yo")]),  # dup of 10
         (12, [("user", "different"), ("assistant", "yo")])],
        SCHEMA,
    )
    kept = sorted(r.doc_id for r in dedup_conversations(df).collect())
    assert kept == [10, 12]


def test_last_assistant_reply(convs):
    out = {
        r.doc_id: r.reply
        for r in convs.select(
            "doc_id", last_assistant_reply(F.col("turns")).alias("reply")
        ).collect()
    }
    assert out[1] == "ok bye"
    assert out[4] == "a"
    assert out[6] is None and out[7] is None


def test_turns_from_text(spark):
    df = spark.createDataFrame(
        [(1, "hello there. ok. next one. fin.")], "doc_id long, text string"
    )
    rows = df.select(turns_from_text(F.col("text")).alias("t")).collect()[0].t
    assert [(x.role, x.content) for x in rows] == [
        ("user", "hello there"), ("assistant", "ok"),
        ("user", "next one"), ("assistant", "fin"),
    ]


def test_stats_plan_has_no_shuffle(convs):
    plan = (
        conversation_stats(convs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
