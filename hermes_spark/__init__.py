"""hermes_spark — a PySpark-native dataset-comparison and data-pipeline
analytics engine with the capabilities of AbsaOSS/Hermes, rebuilt
Spark-first (DataFrame/Catalyst), plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from .comparator import DatasetComparator, compare
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

__all__ = [
    "DatasetComparator",
    "compare",
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
