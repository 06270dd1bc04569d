"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, schema
(column names) and values (column-name-sorted, row-sorted, exact).

Usage: python tools/check_oracles.py [--record] [sf_dir] [query ...]

``--record`` writes each checked query's verdict into LOCAL_CHECK.json
(with the latest driver CORRECTNESS round at check time).  The rotation
gate (tools/rotate_window.py --gate) accepts a NEVER-driver-checked
query below the 50-entry window only when a current recorded local
check covers it — the window-saturation escape hatch for rounds that
register more new queries than free slots.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            mism = ~(np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))
            if mism.any():
                exact = (av != bv) & ~(av.isna() & bv.isna())
                md = float(np.nanmax(np.abs(av - bv)))
                problems.append(
                    f"column {c}: {int(exact.sum())} mismatched floats, max abs diff {md:.3e}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"column {c}: {int((~eq).sum())} mismatches, first at row {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r}"
                )
    return problems


def _latest_driver_round() -> int:
    """Latest CORRECTNESS_r{N}.json round ON DISK at check time.

    INTENTIONALLY LAGGED: the builder records local checks DURING round
    N, before the round-N driver artifacts exist, so verdicts carry
    ``driver_round_at_check = N-1``.  The rotation gate's "same-round"
    requirement is defined relative to this lagged convention — do NOT
    "fix" this to N, or every recorded verdict would look one round
    fresher than it is (round-10 verdict, watch item #3)."""
    import glob
    import re

    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
        if re.search(r"r(\d+)", os.path.basename(p))
    ]
    return max(rounds, default=0)


def _record_results(results: dict, sf_dir: str) -> None:
    """``results`` maps name -> (ok, values_checked).  ``values_checked``
    is False for rows-only queries (no oracle) — the rotation gate only
    accepts a below-fold newcomer on a VALUES-checked local verdict, so
    an oracle-less query cannot launder itself through this file."""
    import json

    path = "LOCAL_CHECK.json"
    try:
        data = json.load(open(path))
    except Exception:
        data = {}
    # purge verdicts for deregistered queries so the ledger always
    # matches the live registry (round-9 verdict: stale bpe_token_stats
    # entry survived its deregistration)
    import __spark_entry__ as entry

    registered = set(entry.queries())
    data = {k: v for k, v in data.items() if k in registered}
    rnd = _latest_driver_round()
    for name, (ok, values_checked) in results.items():
        data[name] = {
            "ok": ok,
            "values_checked": values_checked,
            "sf_dir": sf_dir,
            "driver_round_at_check": rnd,
            "checked_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"recorded {len(results)} verdicts to {path} (driver round r{rnd})")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv[1:]
    # default sf0.01: the documented Tier-B scale (SURVEY §8.6) — the
    # round-9 verdict flagged a silent sf0.001 downgrade here.
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    results: dict[str, tuple[bool, bool]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            results[name] = (False, False)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = (True, False)
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            results[name] = (False, False)
            continue
        problems = compare_frames(sdf, odf)
        if problems:
            failures += 1
            results[name] = (False, True)
            print(f"FAIL  {name} ({len(sdf)} vs {len(odf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems[:6]:
                print(f"      {p}")
        else:
            results[name] = (True, True)
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    if record:
        _record_results(results, sf_dir)
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
