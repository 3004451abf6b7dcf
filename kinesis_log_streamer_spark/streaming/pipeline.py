"""End-to-end ingest pipelines: the reference's three entry points as
Structured Streaming (and batch-twin) dataflows.

Entry points reproduced (SURVEY.md §3):
1. line → string passthrough        (main.go:62-170, T1)
2. JSON mode with enrichment        (jsonstreamer.go:34-81, T3+T4)
3. line → JSON wrap with entries    (linestreamer.go:92-99, T2+T4)

Streaming semantics mapping:
* flush-on-idle / EOF drain (B1) → ``Trigger.AvailableNow`` drains all
  pending input then stops; ``processingTime`` triggers approximate
  the idle-flush cadence (documented delta, SURVEY §7 risk 3).
* bounded channel backpressure → ``maxFilesPerTrigger``.
* per-host partition key ordering → constant partitionKey column +
  repartition in the sink.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kinesis_log_streamer_spark.hostid import get_host_id
from kinesis_log_streamer_spark.operators.transforms import (
    enrich_json_objects,
    filter_empty_lines,
    line_passthrough,
    stamp_partition_key_per_executor,
    strip_cr,
    to_sink_records,
    wrap_line_as_json,
)


def build_line_pipeline(
    lines: DataFrame,
    output_format: str = "string",
    output_key: str = "LogEntry",
    entries: Mapping[str, str] | None = None,
    host_id: str | None = None,
    per_executor_identity: bool = False,
    probe_network: bool = False,
) -> DataFrame:
    """Entry points 1 & 3: line records → sink records.

    ``output_format='string'`` → T1 passthrough;
    ``'json'`` → T2 wrap + T4 enrichment.
    Works identically on batch and streaming DataFrames (same logical
    plan; the micro-batch engine re-plans per trigger).

    ``per_executor_identity=True`` stamps E1 inside each executor
    (closer to the reference's one-key-per-producing-host semantics on
    a real cluster, SURVEY §2.1 E1) instead of the driver-side
    constant; ``host_id`` is ignored in that mode.  ``probe_network``
    reaches the executor-side cascade too, so driver and per-executor
    modes resolve identity through the SAME levels on a real run
    (ADVICE r06: per-executor used to pin probe_network=False while
    driver mode probed, letting the two modes disagree on one host).
    """
    clean = filter_empty_lines(strip_cr(lines))
    if output_format == "json":
        projected = wrap_line_as_json(clean, "value", output_key, entries)
    else:
        projected = line_passthrough(clean)
    if per_executor_identity:
        return stamp_partition_key_per_executor(projected, probe_network)
    return to_sink_records(projected, host_id or get_host_id())


def build_json_pipeline(
    values: DataFrame,
    entries: Mapping[str, str] | None = None,
    host_id: str | None = None,
    per_executor_identity: bool = False,
    probe_network: bool = False,
) -> DataFrame:
    """Entry point 2: JSON value records → enriched sink records
    (F2 null skip + T4 objects-only enrichment + T3 re-serialize).
    ``per_executor_identity`` / ``probe_network`` as in
    :func:`build_line_pipeline`."""
    nonnull = values.filter(values["value"].isNotNull()).filter(
        values["value"] != "null"
    )
    projected = enrich_json_objects(nonnull, "value", entries)
    if per_executor_identity:
        return stamp_partition_key_per_executor(projected, probe_network)
    return to_sink_records(projected, host_id or get_host_id())


def run_stream(
    records: DataFrame,
    sink,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Attach a sink via foreachBatch and start the query.

    ``available_now=True`` reproduces the reference's EOF drain
    (process everything pending, flush, stop — basestreamer.go:27-33);
    a ``processing_time`` trigger gives the continuous-tail mode.
    """
    writer = (
        records.writeStream.foreachBatch(sink.write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed aggregation with late-data handling: the
    engine's requests-per-window primitive over the events stream."""
    from pyspark.sql import functions as F

    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )


def sessionized_event_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming session windows (gap-close semantics) per user."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def events_ts_stored_as_nanos(src_path: str) -> bool:
    """Probe the parquet footer: does ``ts`` carry TIMESTAMP(NANOS)?

    Spark's vectorized reader rejects nano timestamps (they must be
    read as long via ``legacy.parquet.nanosAsLong``), while micro/milli
    timestamps read natively.  The driver's generated data has shipped
    both encodings across rounds, so every events reader probes instead
    of assuming."""
    import os

    import pyarrow.parquet as pq

    # Spark-written tables are DIRECTORIES of part files (the 10x
    # scalecheck replica is one); every part shares the writer's
    # schema, so probing any one footer is authoritative.
    if os.path.isdir(src_path):
        parts = sorted(
            f
            for f in os.listdir(src_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not parts:
            return False
        src_path = os.path.join(src_path, parts[0])
    # The check must read the PARQUET schema, not the arrow view:
    # pyarrow surfaces INT96 (Spark's default timestamp encoding) as
    # timestamp[ns] too, but INT96 reads natively in Spark — only a
    # true INT64/TIMESTAMP(NANOS) column needs nanosAsLong.
    sch = pq.ParquetFile(src_path).schema
    col = sch.column(sch.names.index("ts"))
    if col.physical_type != "INT64":
        return False
    return "nano" in str(col.logical_type).lower()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming twin of the events table (for tests: a
    bounded directory drained with AvailableNow)."""
    import os

    from pyspark.sql import functions as F

    # Pin the timezone like sources/tables.py:load_table — timestamps
    # must be oracle-comparable from a bare driver session too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if events_ts_stored_as_nanos(os.path.join(sf_dir, "events.parquet")):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = (
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        raw = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("basePath", sf_dir)
            .load(f"{sf_dir}/events*.parquet")
        )
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("basePath", sf_dir)
        .load(f"{sf_dir}/events*.parquet")
    )
