"""Canonical record schemas (FIXTURES.md §A).

The reference never declares schemas (schema-on-read,
jsonstreamer.go:42–43); these are the de-facto shapes its canonical
deployment produces — the Apache access-log LogFormat
(reference README.md:13–20, functest/apachelogs/httpd.conf:192–201)
and the error-log line wrap (httpd.conf:182, linestreamer.go:92–99) —
declared once here so every source/operator agrees.
"""

from __future__ import annotations

from pyspark.sql import types as T

# FIXTURES.md §A1 — the 15-field JSON access-log record.  Unquoted
# LogFormat specifiers (%D, %B, %>s) are numeric; StartTime arrives as
# an ISO-8601 string with microseconds and is parsed to timestamp by
# operators/loganalytics.parse_access_logs.
APACHE_ACCESS_SCHEMA = T.StructType(
    [
        T.StructField("ClientAddress", T.StringType()),
        T.StructField("PeerAddress", T.StringType()),
        T.StructField("Protocol", T.StringType()),
        T.StructField("QueryString", T.StringType()),
        T.StructField("RequestHandler", T.StringType()),
        T.StructField("RequestLine", T.StringType()),
        T.StructField("RequestMethod", T.StringType()),
        T.StructField("RequestTimeMicroseconds", T.LongType()),
        T.StructField("ResponseBodySize", T.LongType()),
        T.StructField("Referer", T.StringType()),
        T.StructField("StartTime", T.StringType()),
        T.StructField("Status", T.IntegerType()),
        T.StructField("User", T.StringType()),
        T.StructField("UserAgent", T.StringType()),
        T.StructField("UrlPath", T.StringType()),
    ]
)

# FIXTURES.md §A2 — error-log wrap output (default output key
# `LogEntry`, main.go:68; static columns from --add-entry).
WRAPPED_LINE_SCHEMA = T.StructType(
    [
        T.StructField("LogEntry", T.StringType()),
        T.StructField("LogFile", T.StringType()),
    ]
)

# FIXTURES.md §A5 — the engine's canonical sink contract
# (kinesis.PutRecordsRequestEntry: linestreamer.go:100–103).
SINK_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StringType()),
        T.StructField("partitionKey", T.StringType()),
    ]
)
