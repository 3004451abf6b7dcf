"""Sources: table scans, line-record sources, concatenated-JSON sources."""

from kinesis_log_streamer_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
