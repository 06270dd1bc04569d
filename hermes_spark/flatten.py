"""Schema flattening: nested structs -> ``a_b`` leaves, arrays -> positional
``arr_0 .. arr_{maxLen-1}`` columns.

Behavioral parity with ``utils/.../HelperFunctions.scala:45-148``
(naming: struct path joined with ``_``; array element ``i`` contributes
``_{i}`` to the name; array-of-struct yields ``arr_0_field``...), with one
deliberate performance fix flagged by the reference itself
(``HelperFunctions.scala:37-39``): instead of ONE Spark job per array field
per DataFrame (``agg(max(size(path)))`` + ``collect``), all array paths at
the same nesting depth are measured in a SINGLE ``agg`` job across all
participating DataFrames.  Total jobs = array nesting depth (0 for flat
schemas, 1 for the common top-level-array case) instead of
``2 × #array_fields``.

Scale note: positional flattening multiplies column count by the maximum
array length; ``max_array_width`` guards against a skewed row exploding the
projection into tens of thousands of columns (a real hazard at 100 TB —
see SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType


class ArrayWidthExceeded(Exception):
    def __init__(self, path: str, width: int, cap: int) -> None:
        self.path, self.width, self.cap = path, width, cap
        super().__init__(
            f"array at {path!r} has maximum length {width}, above the "
            f"flattening cap {cap}; raise max_array_width or exclude the column"
        )


class _SizeOracle:
    """Batched max-array-length measurement across several DataFrames."""

    def __init__(self, dfs: list[DataFrame]):
        self._dfs = dfs
        self._cache: dict[str, int] = {}

    def prefetch(self, paths: list[str]) -> None:
        need = [p for p in paths if p not in self._cache]
        if not need:
            return
        maxes = [0] * len(need)
        for df in self._dfs:
            row = df.agg(
                *[
                    F.max(F.size(F.expr(p))).alias(f"_s{i}")
                    for i, p in enumerate(need)
                ]
            ).collect()[0]
            for i in range(len(need)):
                v = row[i]
                if v is not None and v > maxes[i]:
                    maxes[i] = v
        for p, m in zip(need, maxes):
            self._cache[p] = m

    def get(self, path: str) -> int:
        if path not in self._cache:
            self.prefetch([path])
        return self._cache[path]


def _collect_static_array_paths(schema: StructType, path: str = "") -> list[str]:
    """Array paths reachable without indexing through another array."""
    out: list[str] = []
    for f in schema.fields:
        fpath = f"{path}`{f.name}`"
        if isinstance(f.dataType, ArrayType):
            out.append(fpath)
        elif isinstance(f.dataType, StructType):
            out.extend(_collect_static_array_paths(f.dataType, path=f"{fpath}."))
    return out


def flatten_selector(
    df: DataFrame,
    *dfs_for_array_length: DataFrame,
    max_array_width: int = 1024,
) -> list[Column]:
    """List of Columns that flattens ``df``'s schema (see module docstring).

    ``dfs_for_array_length`` participate in the max-array-length
    measurement so two DataFrames flattened with the same formula get
    identical column sets (cf. ``HelperFunctions.scala:45-60``).
    """
    oracle = _SizeOracle([df, *dfs_for_array_length])
    oracle.prefetch(_collect_static_array_paths(df.schema))

    fields: list[Column] = []

    def flatten_group(path: str, prefix: str, schema: StructType) -> None:
        for f in schema.fields:
            child_prefix = f"{prefix}{f.name}_"
            if isinstance(f.dataType, StructType):
                flatten_group(f"{path}`{f.name}`.", child_prefix, f.dataType)
            elif isinstance(f.dataType, ArrayType):
                flatten_array(f"{path}`{f.name}`", child_prefix, f.dataType)
            else:
                fields.append(F.expr(f"{path}`{f.name}`").alias(f"{prefix}{f.name}"))

    def flatten_array(path: str, prefix: str, arr: ArrayType) -> None:
        """``path`` addresses the array itself (no trailing separator)."""
        max_len = oracle.get(path)
        if max_len > max_array_width:
            raise ArrayWidthExceeded(path, max_len, max_array_width)
        elem = arr.elementType
        if isinstance(elem, ArrayType):
            # nested arrays: measure the inner level in one batch
            oracle.prefetch([f"get({path}, {i})" for i in range(max_len)])
        for i in range(max_len):
            # get() (not [i]) so an out-of-range index yields NULL under
            # ANSI mode, matching the reference's Spark 2/3 semantics
            elem_path = f"get({path}, {i})"
            elem_prefix = f"{prefix}{i}_"
            if isinstance(elem, StructType):
                flatten_group(f"{elem_path}.", elem_prefix, elem)
            elif isinstance(elem, ArrayType):
                flatten_array(elem_path, elem_prefix, elem)
            else:
                fields.append(F.expr(elem_path).alias(f"{prefix}{i}"))

    flatten_group("", "", df.schema)
    return fields


def flatten_dataframe(df: DataFrame, max_array_width: int = 1024) -> DataFrame:
    """Flattened ``df`` (public one-liner, cf. ``HelperFunctions.scala:145-148``)."""
    return df.select(*flatten_selector(df, max_array_width=max_array_width))


def flat_column_names(
    schema: StructType, array_widths: dict[str, int] | None = None
) -> list[str]:
    """Leaf column names the flattener would produce (driver-side preview;
    arrays need ``array_widths`` keyed by backticked path)."""
    widths = array_widths or {}
    out: list[str] = []

    def walk(path: str, prefix: str, dt: DataType, name: str) -> None:
        fpath = f"{path}`{name}`"
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(f"{fpath}.", f"{prefix}{name}_", f.dataType, f.name)
        elif isinstance(dt, ArrayType):
            for i in range(widths.get(fpath, 0)):
                if isinstance(dt.elementType, StructType):
                    for f in dt.elementType.fields:
                        walk(f"{fpath}[{i}].", f"{prefix}{name}_{i}_", f.dataType, f.name)
                else:
                    out.append(f"{prefix}{name}_{i}")
        else:
            out.append(f"{prefix}{name}")

    for f in schema.fields:
        walk("", "", f.dataType, f.name)
    return out
