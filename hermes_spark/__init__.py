"""hermes_spark — a PySpark-native dataset-comparison and data-pipeline
analytics engine with the capabilities of AbsaOSS/Hermes, rebuilt
Spark-first (DataFrame/Catalyst), plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from .comparator import DatasetComparator, compare, compare_common_columns
from .incremental import (
    IncrementalResult,
    incremental_compare,
    partition_digests,
    probe_compare,
)
from .config import ComparisonConfig, DEFAULT_CONFIG
from .exceptions import (
    BadProvidedSchema,
    DatasetComparisonException,
    DatasetsDifferException,
    DuplicateRowsInDF,
    InfoFilesDifferException,
    MissingArgumentException,
    SchemasDifferException,
)
from .flatten import flatten_dataframe, flatten_selector
from .result import ComparisonResult

__version__ = "0.1.0"

#: Spark versions the engine is validated against (cf. the reference's
#: SparkVersionGuard at DatasetComparisonJob.scala:32 / E2ERunnerJob.scala:38)
MIN_SPARK_VERSION = (3, 4)


def ensure_spark_version(spark) -> None:
    """Fail fast on unsupported Spark versions (needs zip_with/transform
    HOFs, AQE, and — for stateful streaming — applyInPandasWithState)."""
    parts = tuple(int(p) for p in spark.version.split(".")[:2])
    if parts < MIN_SPARK_VERSION:
        raise RuntimeError(
            f"hermes_spark requires Spark >= "
            f"{'.'.join(map(str, MIN_SPARK_VERSION))}, got {spark.version}"
        )


__all__ = [
    "MIN_SPARK_VERSION",
    "ensure_spark_version",
    "DatasetComparator",
    "compare",
    "compare_common_columns",
    "IncrementalResult",
    "incremental_compare",
    "partition_digests",
    "probe_compare",
    "ComparisonConfig",
    "DEFAULT_CONFIG",
    "ComparisonResult",
    "flatten_dataframe",
    "flatten_selector",
    "BadProvidedSchema",
    "DatasetComparisonException",
    "DatasetsDifferException",
    "DuplicateRowsInDF",
    "InfoFilesDifferException",
    "MissingArgumentException",
    "SchemasDifferException",
]
