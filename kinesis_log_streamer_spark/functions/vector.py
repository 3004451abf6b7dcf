"""Vector math over ``array<float>`` embedding columns.

Pure higher-order column expressions (``zip_with`` + ``aggregate``):
they run JVM-side inside whole-stage codegen — no Python, no UDF, no
serialization. This is the hot path for similarity search, so staying
out of Python matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (sequential left fold — the
    same accumulation order DuckDB's list_dot_product uses, so results
    are bit-comparable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0 for zero-norm inputs instead of NaN."""
    d = dot(a, b)
    n = l2_norm(a) * l2_norm(b)
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))
