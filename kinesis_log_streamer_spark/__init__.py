"""kinesis_log_streamer_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``dacut/kinesis-log-streamer`` (a Go stdin→Kinesis log-streaming CLI;
see /root/reference) as an idiomatic Apache Spark engine:

* **Ingest layer** (reference parity): line / concatenated-JSON record
  sources, passthrough / JSON-wrap / re-serialize projections,
  static-column enrichment, host-identity partition keys, adaptive
  micro-batching, and a Kinesis ``PutRecords``-shaped sink — expressed
  as DataFrame transformations + Structured Streaming
  (`sources/`, `operators/transforms.py`, `streaming/`).

* **Analytics layer** (the query surface the reference exists to feed):
  the full relational operator set — scans, filters, joins of every
  type, aggregations, windows, set ops, string/date/JSON functions —
  plus LLM-data-pipeline operators: exact & fuzzy deduplication
  (MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text analysis, and multimodal-column plumbing
  (`operators/`, `functions/`).

Everything is declared through the DataFrame/SQL API so Catalyst and
Tungsten choose physical strategies (broadcast vs sort-merge joins,
partial aggregation, whole-stage codegen); Python UDFs appear only as
Arrow-vectorized Pandas UDFs where built-ins cannot express the
semantics.
"""

from kinesis_log_streamer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
