"""Exception hierarchy of the dataset-comparison engine.

Message formats mirror the reference implementation
(``datasetComparison/.../Exceptions.scala:18-63``) because downstream CI
pipelines pattern-match on them (golden-tested in the reference's
``DatasetComparatorJobSuite.scala:73-77,141-143,165-169,194-196``).
"""

from __future__ import annotations


class DatasetComparisonException(Exception):
    """Base for all dataset-comparison errors."""


class DatasetsDifferException(DatasetComparisonException):
    """Raised by the CLI job when the compared datasets differ.

    cf. reference ``Exceptions.scala:22-35``.
    """

    def __init__(
        self,
        ref_path: str,
        std_path: str,
        out_path: str,
        expected_count: int,
        actual_count: int,
    ) -> None:
        self.ref_path = ref_path
        self.std_path = std_path
        self.out_path = out_path
        self.expected_count = expected_count
        self.actual_count = actual_count
        super().__init__(
            "Expected and actual datasets differ.\n"
            f"Reference path: {ref_path}\n"
            f"Actual dataset path: {std_path}\n"
            f"Difference written to: {out_path}\n"
            f"Count Expected( {expected_count} ) vs Actual( {actual_count} )"
        )


class SchemasDifferException(DatasetComparisonException):
    """cf. reference ``Exceptions.scala:37-43``."""

    def __init__(self, diff_schema: str) -> None:
        self.diff_schema = diff_schema
        super().__init__(
            "Expected and actual datasets differ in schemas. Difference is:\n"
            f"{diff_schema}"
        )


class BadProvidedSchema(DatasetComparisonException):
    """cf. reference ``Exceptions.scala:45-51``."""

    def __init__(self, diff_schema: str) -> None:
        self.diff_schema = diff_schema
        super().__init__(
            "Provided schema is not a subset of Expected and Actual dataset's "
            "schemas. Difference is:\n"
            f"{diff_schema}"
        )


class DuplicateRowsInDF(DatasetComparisonException):
    """cf. reference ``Exceptions.scala:53-57``."""

    def __init__(self, count_ref: int, count_new: int) -> None:
        self.count_ref = count_ref
        self.count_new = count_new
        super().__init__(
            "Provided datasets have duplicate rows.\n"
            f"Reference Dataset has {count_ref} duplicates\n"
            f"New Dataset has {count_new} duplicates"
        )


class MissingArgumentException(DatasetComparisonException):
    """cf. reference ``Exceptions.scala:59-60``."""


class InfoFilesDifferException(Exception):
    """Raised by the info-file comparison job when documents differ.

    cf. reference ``infoFileComparison/.../InfoFileComparisonJob.scala``.
    """

    def __init__(self, ref_path: str, new_path: str, out_path: str) -> None:
        super().__init__(
            "Expected and actual info files differ.\n"
            f"Reference path: {ref_path}\n"
            f"Actual dataset path: {new_path}\n"
            f"Difference written to: {out_path}"
        )
