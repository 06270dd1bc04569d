"""S3 path validation parity (reference ``S3Location.scala:28-43`` and its
``S3LocationSuite.scala`` accept/reject cases)."""

import pytest

from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.parameters import Parameters
from hermes_spark.sources.s3location import (
    S3Location,
    is_valid_s3_path,
    looks_like_s3,
    to_s3_location,
    validate_path,
)

VALID = [
    ("s3://my-cool-bucket1/path/to/file/on/s3.txt", "s3", "my-cool-bucket1"),
    ("s3n://my-cool-bucket1/path/to/file", "s3n", "my-cool-bucket1"),
    ("s3a://my-cool-bucket1/path", "s3a", "my-cool-bucket1"),
    ("s3a://buck.et-123/", "s3a", "buck.et-123"),
]

INVALID = [
    "s3x://my-bucket/path",      # bad protocol
    "s3://My-Bucket/path",       # uppercase in bucket
    "s3://ab/path",              # bucket too short
    "s3://" + "a" * 64 + "/p",   # bucket too long
    "s3://my_bucket/path",       # underscore not allowed
    "s3://my-bucket",            # no trailing slash / object path
]


@pytest.mark.parametrize("path,protocol,bucket", VALID)
def test_valid_s3_paths(path, protocol, bucket):
    assert is_valid_s3_path(path)
    loc = to_s3_location(path)
    assert loc == S3Location(protocol, bucket, loc.path)
    assert loc.s3_string == path
    assert validate_path(path) == path


@pytest.mark.parametrize("path", INVALID)
def test_invalid_s3_paths(path):
    assert not is_valid_s3_path(path)
    assert to_s3_location(path) is None


@pytest.mark.parametrize("path", INVALID)
def test_s3_schemed_but_malformed_raises_early(path):
    if looks_like_s3(path):
        with pytest.raises(ValueError, match="Invalid S3 path"):
            validate_path(path)
    else:
        assert validate_path(path) == path  # not claiming s3 -> passthrough


def test_non_s3_paths_pass_through():
    for p in ("/local/path", "hdfs://nn/path", "file:///tmp/x", "relative/p"):
        assert validate_path(p) == p


def test_parameters_rejects_malformed_s3():
    with pytest.raises(ValueError, match="Invalid S3 path"):
        Parameters.validate_and_create(
            {"format": "parquet", "path": "s3://Bad_Bucket/x"}
        )


def test_parameters_accepts_valid_s3():
    p = Parameters.validate_and_create(
        {"format": "parquet", "path": "s3a://my-bucket/data/part"}
    )
    assert p.path == "s3a://my-bucket/data/part"


def test_parameters_still_requires_path():
    with pytest.raises(MissingArgumentException):
        Parameters.validate_and_create({"format": "parquet"})
