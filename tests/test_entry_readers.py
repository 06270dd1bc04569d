"""Fixture tests for the __spark_entry__ readers against REAL testdata
parquet.

The rest of the suite builds its own in-memory frames, so a reader shim
in __spark_entry__.py that breaks only on the driver's actual parquet
(e.g. the round-1/2 `ts div 1000` bug on an already-timestamp column)
was invisible to pytest.  These tests read the real files.
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_read_events_ts_is_timestamp(spark):
    events = entry._read_events(spark, SF_DIR)
    assert dict(events.dtypes)["ts"] == "timestamp_ntz"
    row = events.select(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    assert row["n"] > 0
    # sane epoch range, catches a nanos-as-micros (×1000) misparse
    assert row["lo"].year >= 2000 and row["hi"].year < 2100


def test_read_events_idempotent_under_nanos_conf(spark):
    # _read_events sets nanosAsLong itself; calling twice must not
    # double-convert or flip dtypes between calls
    a = entry._read_events(spark, SF_DIR)
    b = entry._read_events(spark, SF_DIR)
    assert a.dtypes == b.dtypes
    assert a.count() == b.count()


def test_read_core_tables(spark):
    for table in ("orders", "lineitem", "documents", "embeddings"):
        df = entry._read(spark, SF_DIR, table)
        assert df.count() > 0, table


def test_docs_with_dups_adds_rekeyed_copies(spark):
    docs = entry._read(spark, SF_DIR, "documents")
    base = docs.count()
    dup_src = docs.filter(F.col("doc_id") < 50).count()
    combined = entry._docs_with_dups(spark, SF_DIR)
    assert combined.count() == base + dup_src
    # re-keyed ids sit in the 100000+ namespace
    assert combined.filter(F.col("doc_id") >= 100000).count() == dup_src


def test_entry_flagship_runs(spark):
    df = entry.entry(spark)
    assert df.columns  # stable, non-empty schema
    assert df.count() >= 0
