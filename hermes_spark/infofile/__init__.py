"""Control-measure (`_INFO` file) document diff — driver-side, no Spark.

Python re-expression of the reference's ``infoFileComparison`` module
(SURVEY.md §2.10): a recursive field-wise diff of two Atum control-measure
JSON documents, producing JSONPath-like ``ModelDifference`` records.
"""

from hermes_spark.infofile.model import ModelDifference, differences_as_json
from hermes_spark.infofile.compare import compare_control_measures
from hermes_spark.infofile.config import InfoFileComparisonConfig
from hermes_spark.infofile.job import execute, load_control_measure, save_data_to_file

__all__ = [
    "InfoFileComparisonConfig",
    "ModelDifference",
    "compare_control_measures",
    "differences_as_json",
    "execute",
    "load_control_measure",
    "save_data_to_file",
]
