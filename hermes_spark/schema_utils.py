"""Schema utilities: sort-aligned selectors, equivalence / subset / diff.

Re-implements (from its observable behavior, not its code) the subset of
``za.co.absa:spark-commons`` the reference relies on
(``DatasetComparator.scala:24,74-78,148-173``):

* ``sorted_selector`` — a list of Columns that selects every field sorted
  alphabetically by name, recursively inside structs (and inside structs
  nested in arrays).  Both compare sides are passed through it so that
  positional set operations (``EXCEPT``) see identical column order.
* ``schemas_equivalent`` — order-insensitive, metadata-stripped equality.
* ``is_subset`` — every field of ``sub`` exists (same type) in ``schema``.
* ``diff_schema`` — human-readable field-level difference list; message
  format matches the reference's golden test output
  ("<field> cannot be found in both schemas",
  ``DatasetComparatorJobSuite.scala:141-143``).

Scale note: everything here is driver-side schema manipulation — zero Spark
jobs.  The selector compiles to a plain projection, which Catalyst folds
into the scan (column pruning still applies).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructField, StructType


def strip_metadata(schema: StructType) -> StructType:
    """Schema without metadata, recursively (cf. ``DatasetComparator.scala:315-317``)."""
    return StructType(
        [StructField(f.name, _strip_type(f.dataType), f.nullable) for f in schema.fields]
    )


def _strip_type(dt: DataType) -> DataType:
    if isinstance(dt, StructType):
        return strip_metadata(dt)
    if isinstance(dt, ArrayType):
        return ArrayType(_strip_type(dt.elementType), dt.containsNull)
    if isinstance(dt, MapType):
        return MapType(_strip_type(dt.keyType), _strip_type(dt.valueType), dt.valueContainsNull)
    return dt


def _normalize_type(dt: DataType) -> DataType:
    """Canonical form for equivalence: sorted struct fields, nullable=True."""
    if isinstance(dt, StructType):
        return StructType(
            sorted(
                (StructField(f.name, _normalize_type(f.dataType), True) for f in dt.fields),
                key=lambda f: f.name,
            )
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_normalize_type(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_normalize_type(dt.keyType), _normalize_type(dt.valueType), True)
    return dt


def schemas_equivalent(a: StructType, b: StructType) -> bool:
    """Order-insensitive, metadata- and nullability-insensitive equality."""
    return _normalize_type(a) == _normalize_type(b)


def is_subset(sub: StructType, schema: StructType) -> bool:
    """True when every field of ``sub`` exists in ``schema`` with an
    equivalent type (recursively; used for cherry-pick schemas,
    cf. ``DatasetComparator.scala:165-173``)."""
    by_name = {f.name: f for f in schema.fields}
    for f in sub.fields:
        other = by_name.get(f.name)
        if other is None:
            return False
        if isinstance(f.dataType, StructType):
            if not isinstance(other.dataType, StructType):
                return False
            if not is_subset(f.dataType, other.dataType):
                return False
        elif _normalize_type(f.dataType) != _normalize_type(other.dataType):
            return False
    return True


def intersect_schemas(a: StructType, b: StructType) -> StructType:
    """The largest schema that is a subset of BOTH inputs: fields present
    in both with equivalent leaf types; struct fields intersect
    recursively (a struct shared by name but with zero shared leaves is
    dropped). Field order follows ``a``.

    Extension beyond the reference (which aborts on any schema drift):
    feeding this to the comparator as a cherry-pick schema compares two
    snapshots across additive schema evolution — new/retired columns
    are ignored instead of fatal.
    """
    by_name = {f.name: f for f in b.fields}
    fields = []
    for f in a.fields:
        other = by_name.get(f.name)
        if other is None:
            continue
        if isinstance(f.dataType, StructType) and isinstance(
            other.dataType, StructType
        ):
            inner = intersect_schemas(f.dataType, other.dataType)
            if inner.fields:
                fields.append(StructField(f.name, inner, True))
        elif _normalize_type(f.dataType) == _normalize_type(other.dataType):
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


def diff_schema(a: StructType, b: StructType, prefix: str = "") -> list[str]:
    """Fields of ``a`` missing from (or typed differently in) ``b``.

    One line per differing field; same sentence shape as the reference's
    golden output ("_c5 cannot be found in both schemas").
    """
    out: list[str] = []
    b_by_name = {f.name: f for f in b.fields}
    for f in a.fields:
        path = f"{prefix}{f.name}"
        other = b_by_name.get(f.name)
        if other is None:
            out.append(f"{path} cannot be found in both schemas")
        elif isinstance(f.dataType, StructType) and isinstance(other.dataType, StructType):
            out.extend(diff_schema(f.dataType, other.dataType, prefix=f"{path}."))
        elif _normalize_type(f.dataType) != _normalize_type(other.dataType):
            out.append(
                f"{path} data type doesn't match "
                f"({f.dataType.simpleString()} vs {other.dataType.simpleString()})"
            )
    return out


# ---------------------------------------------------------------------------
# Sort-aligned selector (cf. spark-commons getDataFrameSelector, used at
# DatasetComparator.scala:74-78)
# ---------------------------------------------------------------------------


def _contains_struct(dt: DataType) -> bool:
    if isinstance(dt, StructType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_struct(dt.elementType)
    if isinstance(dt, MapType):
        return _contains_struct(dt.keyType) or _contains_struct(dt.valueType)
    return False


def _needs_rewrite(dt: DataType) -> bool:
    """Does the selector have to rebuild this value? True for structs
    (field order), and for maps anywhere (normalized to sorted entry
    arrays — see :func:`_reorder`)."""
    if isinstance(dt, (StructType, MapType)):
        return True
    if isinstance(dt, ArrayType):
        return _needs_rewrite(dt.elementType)
    return False


def _reorder(col: Column, dt: DataType) -> Column:
    """Rebuild ``col`` with struct fields sorted by name, recursively.

    MapType columns are normalized to ``array_sort(map_entries(col))`` —
    an ``array<struct<key,value>>`` sorted by key. The reference has no
    map handling at all (a map column would hit Spark's "<=> on map"
    error, SURVEY.md §1.2); the normalized form is deterministic,
    groupable and null-safe-comparable, which is what the single-shuffle
    compare needs (Spark forbids grouping by raw map columns).
    """
    if isinstance(dt, StructType):
        return F.struct(
            *[
                _reorder(col.getField(f.name), f.dataType).alias(f.name)
                for f in sorted(dt.fields, key=lambda f: f.name)
            ]
        )
    if isinstance(dt, MapType):
        entries = F.map_entries(col)
        if _needs_rewrite(dt.keyType) or _needs_rewrite(dt.valueType):
            key_t, value_t = dt.keyType, dt.valueType
            entries = F.transform(
                entries,
                lambda e: F.struct(
                    _reorder(e.getField("key"), key_t).alias("key"),
                    _reorder(e.getField("value"), value_t).alias("value"),
                ),
            )
        return F.array_sort(entries)
    if isinstance(dt, ArrayType) and _needs_rewrite(dt.elementType):
        elem = dt.elementType
        return F.transform(col, lambda x: _reorder(x, elem))
    return col


def sorted_selector(schema: StructType) -> list[Column]:
    """Columns selecting all fields sorted by name, recursively in structs."""
    out: list[Column] = []
    for f in sorted(schema.fields, key=lambda f: f.name):
        col = F.col(f"`{f.name}`")
        if _needs_rewrite(f.dataType):
            out.append(_reorder(col, f.dataType).alias(f.name))
        else:
            out.append(col)
    return out


def sorted_selector_names(schema: StructType) -> list[str]:
    """Top-level column order the selector produces (for tests/logging)."""
    return sorted(f.name for f in schema.fields)
