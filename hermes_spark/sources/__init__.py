"""Source/sink layer: generic Spark DataSource readers and writers.

Covers SURVEY.md §2.1 S1–S11: generic format reader (incl. JDBC),
generic writer (parquet default), collision-free unique-path writer,
``_METRICS`` sink, and path resolution over any Hadoop-supported
filesystem (local, HDFS, s3a).
"""

from hermes_spark.sources.parameters import CliParameters, Parameters
from hermes_spark.sources.warc import (
    http_response_text,
    parse_warc_records,
    read_warc,
    stream_warc,
    wet_text,
)
from hermes_spark.sources.io import (
    get_unique_file_path,
    load_dataframe,
    read_json_strings,
    read_text_file,
    write_dataframe,
    write_metrics_file,
    write_next_dataframe,
    write_text_file,
)

__all__ = [
    "CliParameters",
    "http_response_text",
    "parse_warc_records",
    "read_warc",
    "stream_warc",
    "wet_text",
    "Parameters",
    "get_unique_file_path",
    "load_dataframe",
    "read_json_strings",
    "read_text_file",
    "write_dataframe",
    "write_metrics_file",
    "write_next_dataframe",
    "write_text_file",
]
