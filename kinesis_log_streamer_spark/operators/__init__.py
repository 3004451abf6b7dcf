"""Custom operators: ingest transforms, as-of joins, sessionization,
top-k, dedup (exact/MinHash/SimHash/Jaccard), similarity search, text
analysis, multimodal-column plumbing."""
