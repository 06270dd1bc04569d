"""Generic DataFrame IO over any Spark DataSource, plus driver-side file
helpers that work on every Hadoop-supported filesystem (file://, HDFS,
s3a://).

Mirrors the behavior of ``datasetComparison/.../dataFrame/Utils.scala``:
- ``load_dataframe``  — ``spark.read.format(f).options(o).load(path?)``
  (jdbc loads with no path; ``dbtable`` is an option)    (Utils.scala:48-52)
- ``write_dataframe`` — ``df.write.format(f).options(o).save(path?)``
                                                         (Utils.scala:54-59)
- ``write_next_dataframe`` / ``get_unique_file_path`` — collision-free
  output path: if the target exists, suffix ``_<currentTimeMillis>``
                                                         (Utils.scala:38-46,61-68)
- ``write_metrics_file`` — pretty-JSON ``_METRICS`` file next to the diff
  output, written through the Hadoop FileSystem API
                                               (DatasetComparisonJob.scala:97-109)

Driver-side file access goes through ``spark._jvm`` Hadoop ``FileSystem``
so the same code path serves local disk, HDFS and S3 — on a 1000-executor
cluster the driver cannot assume a POSIX view of the data.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from hermes_spark.sources.parameters import Parameters


# ---------------------------------------------------------------------------
# DataFrame readers / writers
# ---------------------------------------------------------------------------


def load_dataframe(spark: SparkSession, parameters: Parameters) -> DataFrame:
    """Read a DataFrame via any Spark DataSource format.

    ``format == "fixed-width"`` routes to the expression-based reader in
    :mod:`hermes_spark.sources.fixed_width` (option ``widths`` =
    ``"name:width,..."``; optional ``trimValues``)."""
    if parameters.format == "fixed-width":
        from hermes_spark.sources.fixed_width import (
            parse_widths_option,
            read_fixed_width,
        )

        widths = parse_widths_option(parameters.options["widths"])
        trim = parameters.options.get("trimValues", "true").lower() == "true"
        return read_fixed_width(spark, parameters.path, widths, trim=trim)
    reader = spark.read.format(parameters.format)
    if parameters.options:
        reader = reader.options(**parameters.options)
    if parameters.format == "jdbc":
        return reader.option("dbtable", parameters.path).load()
    return reader.load(parameters.path)


def write_dataframe(
    df: DataFrame, parameters: Parameters, path_suffix: str = "", mode: str = "error"
) -> None:
    """Write a DataFrame via any Spark DataSource format."""
    writer = df.write.format(parameters.format).mode(mode)
    if parameters.options:
        writer = writer.options(**parameters.options)
    if parameters.format == "jdbc":
        writer.option("dbtable", parameters.path).save()
    else:
        writer.save(f"{parameters.path}{path_suffix}")


def write_next_dataframe(
    df: DataFrame, parameters: Parameters, path_suffix: str = ""
) -> str:
    """Write to a collision-free path; returns the path actually used."""
    spark = df.sparkSession
    target = get_unique_file_path(spark, f"{parameters.path}{path_suffix}")
    writer = df.write.format(parameters.format)
    if parameters.options:
        writer = writer.options(**parameters.options)
    writer.save(target)
    return target


def get_unique_file_path(spark: SparkSession, path: str) -> str:
    """If ``path`` exists on its filesystem, suffix ``_<millis>``."""
    if _fs_exists(spark, path):
        return f"{path}_{int(time.time() * 1000)}"
    return path


# ---------------------------------------------------------------------------
# Hadoop FileSystem helpers (driver-side small files on any FS)
# ---------------------------------------------------------------------------


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark._jsc.hadoopConfiguration()
    return hpath.getFileSystem(conf), hpath, jvm


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def write_text_file(spark: SparkSession, path: str, content: str) -> None:
    """Create/overwrite a small driver-side text file on any Hadoop FS."""
    fs, hpath, _ = _hadoop_fs(spark, path)
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(content, "utf-8"))
        stream.flush()
    finally:
        stream.close()


def read_text_file(spark: SparkSession, path: str) -> str:
    """Read a small driver-side text file from any Hadoop FS.

    Used for the cherry-pick schema JSON (reference reads it via
    ``wholeTextFiles``, ``DatasetComparisonJob.scala:84-89``)."""
    rdd = spark.sparkContext.wholeTextFiles(path)
    return rdd.collect()[0][1]


def write_metrics_file(spark: SparkSession, diff_path: str, metrics_json: str) -> str:
    """Write the pretty-JSON ``_METRICS`` file next to the diff output."""
    metrics_path = diff_path.rstrip("/") + "/_METRICS"
    write_text_file(spark, metrics_path, metrics_json + "\n")
    return metrics_path


def read_json_strings(spark: SparkSession, strings: list[str]) -> DataFrame:
    """DataFrame from in-memory JSON strings (reference
    ``utils/.../HelperFunctions.scala:156-159``)."""
    return spark.read.json(spark.sparkContext.parallelize(strings))


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    max_records_per_file: int | None = None,
    manifest: bool = True,
) -> dict:
    """Materialize a training dataset partitioned by ``shard_col`` with
    bounded file sizes and a ``_MANIFEST`` JSON.

    - ``partitionBy(shard_col)`` makes each shard independently
      consumable (a loader reads ``shard=K/`` without touching the
      rest; partition pruning verified for split outputs in
      ``tests/test_plans.py``).
    - ``maxRecordsPerFile`` bounds every file so loader workers get
      even-sized chunks regardless of upstream partitioning — the knob
      that matters at 100 TB, where one fat output file stalls a whole
      data-loader rank.
    - the manifest records per-shard row counts (a shard-cardinality
      digest, not data) so consumers can size epochs/schedules without
      listing or scanning the dataset.

    Returns the manifest dict.
    """
    writer = df.write.mode("overwrite").partitionBy(shard_col)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    info: dict = {}
    if manifest:
        # Count from the files just written, not from `df`: counting the
        # input would re-run the entire upstream lineage a second time
        # (for a curation pipeline that means re-deduping everything
        # just to count rows). The written parquet scan is footer-cheap.
        # Explicit schema: an EMPTY write leaves no data files, and
        # schema inference would fail where an empty manifest is the
        # correct answer.
        rows = (
            df.sparkSession.read.schema(df.schema)
            .parquet(path)
            .groupBy(shard_col)
            .count()
            .collect()
        )
        shards = {str(r[shard_col]): r["count"] for r in rows}
        info = {
            "shard_col": shard_col,
            "n_shards": len(shards),
            "total_rows": sum(shards.values()),
            "rows_per_shard": dict(sorted(shards.items())),
        }
        write_text_file(
            df.sparkSession, path.rstrip("/") + "/_MANIFEST",
            json.dumps(info, indent=2) + "\n",
        )
    return info
