"""Structured-Streaming layer: ingest pipelines, micro-batching, sinks."""
