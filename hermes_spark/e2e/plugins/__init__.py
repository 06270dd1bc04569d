"""Bundled plugins (reference ``e2eRunner/.../plugins/``): Bash,
DatasetComparison, InfoFileComparison — plus the Profile data-quality
gate (extension). Importing this package registers them."""

from hermes_spark.e2e.plugins.bash import BashPlugin
from hermes_spark.e2e.plugins.dataset_comparison import DatasetComparisonPlugin
from hermes_spark.e2e.plugins.info_comparison import InfoFileComparisonPlugin
from hermes_spark.e2e.plugins.profile_gate import ProfilePlugin

__all__ = [
    "BashPlugin",
    "DatasetComparisonPlugin",
    "InfoFileComparisonPlugin",
    "ProfilePlugin",
]
