"""The sketch job: maintain / query mergeable sketch states from the
command line.

An extension command (the reference CLI has no sketching; SURVEY.md
§7.1): the operational entry point for the bounded-state analytics in
:mod:`hermes_spark.operators.sketch` — nightly distinct-count /
quantile dashboards that fold each day's batch into a persistent state
store instead of rescanning history.

Usage::

    # one-shot estimates printed as JSON lines
    python -m hermes_spark.cli sketch distinct --format parquet \\
        --path /data/events --group-by segment --value user_id [--p 12]
    python -m hermes_spark.cli sketch quantiles --format parquet \\
        --path /data/events --group-by segment --value latency \\
        [--qs 0.5,0.95,0.99] [--k 64]
    python -m hermes_spark.cli sketch heavy --format parquet \\
        --path /data/events --value url --threshold 10000 [--depth 3] [--width 8192]

    # incremental: fold this batch into a state store, then estimate
    python -m hermes_spark.cli sketch distinct ... --state /stores/dau

``--state`` makes ``distinct``/``quantiles`` read the existing state
(if any), merge the batch's state in, overwrite the store, and print
estimates over the MERGED state — history is never rescanned.  The
default hash is xxhash64 (production); pass ``--portable true`` for
the md5 engine-portable variant (all options are ``--key value``
pairs, matching the reference CLI convention).
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql.utils import AnalysisException

from hermes_spark.cli.parser import _args_to_map
from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.io import load_dataframe
from hermes_spark.sources.parameters import Parameters

#: Sidecar recording the parameters a state store was built with; Spark
#: ignores underscore-prefixed files inside a parquet directory.  (Local
#: filesystem I/O — for object stores, ship the sidecar with the same
#: fsspec mechanism ``infofile`` uses.)
_PARAMS_FILE = "_SKETCH_PARAMS.json"

_RESERVED = (
    "group-by", "value", "p", "k", "qs", "depth", "width", "threshold",
    "state", "portable",
)


def _load(spark: SparkSession, options: dict):
    reader_opts = {k: v for k, v in options.items() if k not in _RESERVED}
    return load_dataframe(spark, Parameters.validate_and_create(reader_opts))


def _require(options: dict, key: str) -> str:
    if key not in options:
        raise MissingArgumentException(f"--{key} is required")
    return options[key]


def _parse_bool(options: dict, key: str, default: bool = False) -> bool:
    """Strict boolean option: a typo like ``--portable yes`` must not
    silently mean False when the user asked for the portable hash."""
    raw = options.get(key)
    if raw is None:
        return default
    v = raw.strip().lower()
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    raise MissingArgumentException(
        f"--{key} must be true/false (got {raw!r})"
    )


def _check_store_params(path: str, params: dict) -> None:
    """Refuse to merge into a store built with different parameters —
    mixed register widths / hash variants merge without error and
    produce silently wrong estimates."""
    sidecar = os.path.join(path, _PARAMS_FILE)
    if os.path.exists(sidecar):
        stored = json.load(open(sidecar))
        if stored != params:
            raise MissingArgumentException(
                f"state store {path} was built with {stored}, "
                f"refusing to merge with {params} — pass matching options "
                f"or use a new --state path"
            )
    elif os.path.isdir(path):  # store predates sidecars: stamp it now
        with open(sidecar, "w") as f:
            json.dump(params, f, sort_keys=True)


def _stamp_store_params(path: str, params: dict) -> None:
    if os.path.isdir(path):
        with open(os.path.join(path, _PARAMS_FILE), "w") as f:
            json.dump(params, f, sort_keys=True)


def _is_missing_path(exc: AnalysisException) -> bool:
    msg = str(exc)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def run(spark: SparkSession, kind: str, argv: list[str]) -> list[dict]:
    """Execute one sketch command; returns the printed records (also a
    library entry point, mirroring the other job modules)."""
    from hermes_spark.operators import (
        cms_heavy_hitters,
        hll_estimate,
        hll_merge,
        hll_state,
        qdigest_merge,
        qdigest_quantiles,
        qdigest_state,
    )

    options = _args_to_map(argv)
    portable = _parse_bool(options, "portable", default=False)
    df = _load(spark, options)
    records: list[dict] = []

    if kind == "distinct":
        groups = _require(options, "group-by").split(",")
        value = _require(options, "value")
        p = int(options.get("p", "12"))
        state = hll_state(df, groups, value, p=p, portable=portable)
        store = options.get("state")
        if store:
            params = {"kind": "hll", "p": p, "portable": portable,
                      "group_by": groups}
            _check_store_params(store, params)
            state = _merge_into_store(
                spark, store, state, lambda a, b: hll_merge(groups, a, b)
            )
            _stamp_store_params(store, params)
        for row in hll_estimate(state, groups, p=p).collect():
            records.append({"report": "hll_distinct", **row.asDict()})
    elif kind == "quantiles":
        groups = _require(options, "group-by").split(",")
        value = _require(options, "value")
        k = int(options.get("k", "64"))
        qs = [float(q) for q in options.get("qs", "0.5,0.95,0.99").split(",")]
        state = qdigest_state(df, groups, value, k=k)
        store = options.get("state")
        if store:
            params = {"kind": "qdigest", "k": k, "group_by": groups}
            _check_store_params(store, params)
            state = _merge_into_store(
                spark, store, state, lambda a, b: qdigest_merge(groups, a, b)
            )
            _stamp_store_params(store, params)
        for row in qdigest_quantiles(state, groups, qs, k=k).collect():
            records.append({"report": "quantiles", **row.asDict()})
    elif kind == "heavy":
        value = _require(options, "value")
        threshold = int(_require(options, "threshold"))
        hh = cms_heavy_hitters(
            df,
            value,
            threshold,
            depth=int(options.get("depth", "3")),
            width=int(options.get("width", "8192")),
            portable=portable,
        )
        for row in hh.collect():
            records.append({"report": "heavy_hitters", **row.asDict()})
    else:
        raise MissingArgumentException(
            f"unknown sketch subcommand: {kind!r} (distinct|quantiles|heavy)"
        )
    return records


def _merge_into_store(spark, path: str, batch_state, merge_fn):
    """Fold ``batch_state`` into the parquet store at ``path`` (created
    on first use) and return the merged state.  localCheckpoint cuts the
    read-what-you-overwrite dependency before the store rewrite.

    Only a MISSING path counts as "first batch" — any other read error
    (corrupt store, schema trouble, permissions) re-raises instead of
    silently overwriting the accumulated history with today's batch.
    """
    try:
        existing = spark.read.parquet(path)
        merged = merge_fn(existing, batch_state)
    except AnalysisException as exc:
        if not _is_missing_path(exc):
            raise
        merged = batch_state
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(path)
    return merged


def main(argv: list[str]) -> int:
    if not argv:
        print("usage: sketch {distinct|quantiles|heavy} ...", file=sys.stderr)
        return 2
    try:
        spark = SparkSession.builder.appName("Sketch job").getOrCreate()
        for record in run(spark, argv[0], argv[1:]):
            print(json.dumps(record, default=str))
    except MissingArgumentException as exc:
        print(exc, file=sys.stderr)
        return 2
    return 0
