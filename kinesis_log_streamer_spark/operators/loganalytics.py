"""Log-analytics query surface over ingested Apache access records —
the queries the reference's pipeline exists to feed (SURVEY.md §2.2).

The reference ships records to Kinesis and answers nothing
(README.md:1–8); the analytics below are the standard consumer-side
rollups, expressed so they pipeline inside the scan stage and
aggregate with map-side partials:

* typed parsing of the JSON access record (FIXTURES.md §A1)
* RequestLine decomposition (method/path/protocol via regexp_extract)
* status-class rollups, windowed error rates, top-k URLs, latency
  percentiles per handler, per-client sessionization

All work on either a batch DataFrame or a streaming one (same logical
plan), except the windowed rollups which need an event-time column
(`start_ts`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.model import APACHE_ACCESS_SCHEMA


def access_records_from_events(events: DataFrame) -> DataFrame:
    """Deterministic Apache access-log JSON records derived from the
    driver's ``events`` table — the adapter that lets oracle-checked
    queries drive the full JSON parse path (FIXTURES.md §A1 shape)
    without an Apache corpus.  Every derived field is integer-exact so
    a DuckDB oracle can recompute the same values from ``events``
    directly."""
    m = F.col("event_id") % 10
    status = (
        F.when(m <= 5, 200)
        .when(m == 6, 301)
        .when(m == 7, 404)
        .when(m == 8, 500)
        .otherwise(503)
        .cast("int")
    )
    path = F.concat(
        F.lit("/"),
        F.col("event_type"),
        F.lit("/"),
        (F.col("user_id") % 20).cast("string"),
    )
    rec = F.struct(
        F.concat(F.lit("10.0."), (F.col("user_id") % 256).cast("string"), F.lit(".1")).alias("ClientAddress"),
        F.col("event_type").alias("RequestHandler"),
        F.concat(F.lit("GET "), path, F.lit(" HTTP/1.1")).alias("RequestLine"),
        ((F.col("event_id") * 101) % 500000).alias("RequestTimeMicroseconds"),
        ((F.col("event_id") * 37) % 10000).alias("ResponseBodySize"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("StartTime"),
        status.alias("Status"),
        path.alias("UrlPath"),
    )
    return events.select(F.to_json(rec).alias("value"))


def parse_access_logs(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Typed access-log rows from raw JSON strings.

    ``from_json`` with the declared schema (never inference — at
    100 TB, schema inference is an extra full scan); the ISO-8601
    ``StartTime`` string becomes the ``start_ts`` event-time column.
    Malformed records yield a null struct (permissive default —
    SURVEY.md §7 risk 2) and are kept under ``is_corrupt`` for a
    dead-letter split.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col), APACHE_ACCESS_SCHEMA).alias("r"),
        F.col(value_col).alias("_raw"),
    )
    # PERMISSIVE from_json yields an all-null struct for malformed
    # input (not a null struct) — detect corruption on the fields a
    # real access record always carries.
    corrupt = (
        F.col("r").isNull()
        | (
            F.col("r.RequestLine").isNull()
            & F.col("r.Status").isNull()
            & F.col("r.StartTime").isNull()
        )
    )
    return parsed.select(
        "r.*",
        F.to_timestamp("r.StartTime").alias("start_ts"),
        corrupt.alias("is_corrupt"),
        "_raw",
    )


def split_request_line(df: DataFrame) -> DataFrame:
    """Decompose ``RequestLine`` ("GET /path HTTP/1.1") into
    method/path/protocol — the log-parsing string-function workout."""
    rl = F.col("RequestLine")
    return df.withColumns(
        {
            "req_method": F.regexp_extract(rl, r"^(\S+)", 1),
            "req_path": F.regexp_extract(rl, r"^\S+\s+(\S+)", 1),
            "req_protocol": F.regexp_extract(rl, r"(\S+)$", 1),
        }
    )


def status_class_rollup(df: DataFrame) -> DataFrame:
    """Requests/bytes/latency by status class (2xx/3xx/4xx/5xx)."""
    cls = F.concat((F.col("Status") / 100).cast("int").cast("string"), F.lit("xx"))
    return (
        df.groupBy(cls.alias("status_class"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("ResponseBodySize").alias("bytes_sent"),
            F.round(F.avg("RequestTimeMicroseconds"), 1).alias("avg_us"),
        )
        .orderBy("status_class")
    )


def windowed_error_rate(
    df: DataFrame, window: str = "5 minutes"
) -> DataFrame:
    """Per-window total/error counts + error rate (works batch or
    streaming; add a watermark upstream for streaming append mode)."""
    is_err = (F.col("Status") >= 500).cast("long")
    return (
        df.groupBy(F.window("start_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(is_err).alias("n_5xx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_requests",
            "n_5xx",
            F.round(F.col("n_5xx") / F.col("n_requests"), 4).alias("error_rate"),
        )
    )


def topk_urls(df: DataFrame, k: int = 10) -> DataFrame:
    """Top-k URL paths by hits (tie → path asc, deterministic).

    Aggregate first (map-side partials shrink the shuffle to
    |distinct paths|), then a bounded sort — never a global sort of
    raw requests."""
    return (
        df.groupBy("UrlPath")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.sum("ResponseBodySize").alias("bytes_sent"),
        )
        .orderBy(F.desc("hits"), F.asc("UrlPath"))
        .limit(k)
    )


def latency_percentiles_by_handler(df: DataFrame) -> DataFrame:
    """p50/p95/p99 request latency per handler.

    ``percentile_approx`` (t-digest-style sketch) — mergeable partial
    aggregates, so the shuffle carries one sketch per handler rather
    than every latency sample; the exact-percentile twin would gather
    per-group value lists."""
    return (
        df.groupBy("RequestHandler")
        .agg(
            F.percentile_approx("RequestTimeMicroseconds", 0.5).alias("p50_us"),
            F.percentile_approx("RequestTimeMicroseconds", 0.95).alias("p95_us"),
            F.percentile_approx("RequestTimeMicroseconds", 0.99).alias("p99_us"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("RequestHandler")
    )


def sessionize_clients(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-client sessions via ``session_window`` over event time."""
    return (
        df.groupBy(
            F.session_window("start_ts", gap).alias("sw"), "ClientAddress"
        )
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .select(
            "ClientAddress",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_requests",
        )
    )
