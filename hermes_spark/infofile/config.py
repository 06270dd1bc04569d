"""Info-file comparison config.

Defaults mirror the reference's
``infoFileComparison/src/main/resources/reference.conf:17-31``:
``versionMetaKeys`` are only logged (never diffed), ``ignoredMetaKeys``
are skipped entirely.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_VERSION_META_KEYS = [
    "std_enceladus_version",
    "conform_enceladus_version",
]

DEFAULT_IGNORED_META_KEYS = [
    "std_application_id",
    "conform_application_id",
    "conform_input_dir_size",
    "std_input_dir_size",
    "std_output_dir_size",
    "conform_output_dir_size",
]


@dataclass(frozen=True)
class InfoFileComparisonConfig:
    version_meta_keys: list[str] = field(
        default_factory=lambda: list(DEFAULT_VERSION_META_KEYS)
    )
    keys_to_ignore: list[str] = field(
        default_factory=lambda: list(DEFAULT_IGNORED_META_KEYS)
    )

    def loggable_string(self) -> str:
        return (
            "Effective InfoFileComparison configuration:\n"
            f" Version meta keys (logged only) -> {self.version_meta_keys}\n"
            f" Ignored meta keys -> {self.keys_to_ignore}"
        )


DEFAULT_INFO_CONFIG = InfoFileComparisonConfig()
