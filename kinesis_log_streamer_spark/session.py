"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship on a 1000-executor cluster (AQE on, skew-join
handling on, UTC session timezone so results are comparable across
engines, Arrow enabled for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kinesis_log_streamer_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are tuned for correctness-at-any-scale rather than a
    particular cluster size:

    * AQE enabled — runtime coalescing of shuffle partitions and skew
      join splitting mean ``spark.sql.shuffle.partitions`` is a ceiling,
      not a fixed fan-out, so the same code serves sf0.001 and 100 TB.
    * UTC session timezone — timestamps compare bit-for-bit against
      external oracles (DuckDB is UTC-naive).
    * Arrow on — Pandas UDFs move batches, not rows.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(MICROS) without tz metadata loads as LTZ
        # (instant) rather than NTZ: the whole engine + its DuckDB
        # oracles compare in UTC instants, and LTZ keeps epoch casts
        # (`cast(ts as double)`) legal.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
