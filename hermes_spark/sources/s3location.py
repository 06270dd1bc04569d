"""S3 path parsing / early validation.

Mirrors the reference's ``datasetComparison/.../dataFrame/S3Location.scala:28-43``
(protocol + bucket-name regex per the AWS bucket naming rules) and the
scheme-dispatch half of ``PathResolver.scala:49-62``.  Without this, a
malformed ``s3://`` URI only fails deep inside Hadoop with an opaque
stack trace; here it fails fast at parameter-validation time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

#: ``s3``, ``s3n`` and ``s3a`` protocols; bucket names are 3-63 chars of
#: lowercase letters, digits, hyphens and dots (AWS bucket naming rules)
S3_LOCATION_RX = re.compile(r"(s3[an]?)://([-a-z0-9.]{3,63})/(.*)")


@dataclass(frozen=True)
class S3Location:
    protocol: str
    bucket: str
    path: str

    @property
    def s3_string(self) -> str:
        return f"{self.protocol}://{self.bucket}/{self.path}"


def to_s3_location(path: str) -> Optional[S3Location]:
    """Parse an S3 URI; ``None`` when ``path`` is not a well-formed S3 URI."""
    m = S3_LOCATION_RX.fullmatch(path)
    if m is None:
        return None
    return S3Location(*m.groups())


def is_valid_s3_path(path: str) -> bool:
    return S3_LOCATION_RX.fullmatch(path) is not None


def looks_like_s3(path: str) -> bool:
    """True when the path *claims* the s3/s3n/s3a scheme (even malformed)."""
    return bool(re.match(r"s3[an]?://", path))


def validate_path(path: str) -> str:
    """Pass non-S3 paths through; for S3-schemed paths require a valid
    bucket name, raising ``ValueError`` early otherwise."""
    if looks_like_s3(path) and not is_valid_s3_path(path):
        raise ValueError(
            f"Invalid S3 path: {path!r}. Expected "
            "s3[an]://<bucket>/<path> with a 3-63 char bucket of "
            "lowercase letters, digits, '-' and '.'"
        )
    return path
