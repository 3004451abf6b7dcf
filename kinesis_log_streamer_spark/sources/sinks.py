"""Batch file sinks: partitioned parquet, CSV, JSON-lines, text.

The reference's only sink is Kinesis ``PutRecords``
(basestreamer.go:65–87 — see ``streaming/kinesis_sink.py``); an
analytics engine also needs durable columnar output.  These helpers
encode the 100 TB layout conventions:

* **Partitioned parquet** is the canonical table format: partition by
  a low-cardinality time-derived column (date/hour for logs) so
  readers get partition pruning, and size output files via a
  pre-write ``repartition`` on the partition columns — one shuffle,
  then each task writes whole files (no tiny-file explosion, no
  per-task × per-partition fan-out).
* CSV/JSON-lines exist for interchange; they are line-splittable on
  read but row-oriented and schema-light — documented as the
  non-preferred path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Write parquet partitioned by ``partition_cols``.

    The ``repartition`` on the partition columns co-locates each
    output partition's rows, so the directory layout is
    pruning-friendly AND file counts stay bounded (at 1000 executors
    an unshaped write emits up to tasks × partitions files).  Pass
    ``files_per_partition > 1`` to cap total output tasks instead
    (for very hot partition values).
    """
    if files_per_partition == 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        shaped = df.repartition(files_per_partition, *[F.col(c) for c in partition_cols])
    shaped.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_events_by_date(df: DataFrame, path: str) -> None:
    """Canonical log layout: events partitioned by event date."""
    dated = df.withColumn("event_date", F.to_date("ts"))
    write_partitioned_parquet(dated, path, ["event_date"])


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with header; interchange only — prefer parquet at scale."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit CSV read (inference double-scans the data)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines (one object per line; splittable on read)."""
    df.write.mode(mode).json(path)


def read_json_lines_typed(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_text(df: DataFrame, path: str, column: str = "value", mode: str = "overwrite") -> None:
    """Single-string-column text sink (the ingest pipelines' raw tap)."""
    df.select(F.col(column).cast("string").alias("value")).write.mode(mode).text(path)
