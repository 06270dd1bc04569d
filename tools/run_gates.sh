#!/bin/sh
# Full local gate: unit tests + DuckDB oracle equivalence + benchmark.
# Usage: sh tools/run_gates.sh   (from the repo root)
set -e
echo "== oracle-window rotation =="
python tools/rotate_window.py --gate
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle equivalence (sf0.01) =="
python tools/check_oracles.py /root/testdata/sf0.01
echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py
