"""Headline query suites (driver-facing, oracle-paired).

``tpch`` — the 15 adapted TPC-H patterns not covered by the original
driver queries; see tpch.py's module docstring for the adaptation map.
"""

from hermes_spark.queries.tpch import TPCH_EXTRA_QUERIES, TPCH_EXTRA_SQL

__all__ = ["TPCH_EXTRA_QUERIES", "TPCH_EXTRA_SQL"]
