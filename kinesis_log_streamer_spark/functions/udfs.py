"""User-defined function surface: scalar pandas UDF, grouped-agg
pandas UDF (UDAF), and a Python UDTF (SURVEY.md §2.2 "UDF / UDAF /
UDTF").

The engine's rule (README): built-ins first — every hot-path operator
in this repo is JVM-side.  When an extension point is genuinely
needed, these are the shapes to use, ordered by cost:

1. **pandas_udf scalar** — Arrow-batched columnar transfer, numpy
   vector math; ~10–100× over row-at-a-time Python UDFs.
2. **pandas_udf grouped-agg** — one pandas Series per group per
   column; partial aggregation does NOT apply (the whole group ships
   to Python), so keep groups bounded.
3. **@udtf** — table function; one output table per input row.  Used
   where a row legitimately expands into variable-length typed rows.

Factories (not module-level decorators): registering a pandas UDF /
UDTF parses its DDL return type, which requires an active
SparkSession — build them lazily so importing this module never
creates one.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd


@lru_cache(maxsize=1)
def vec_norm_pd():
    """Scalar pandas UDF: L2 norm of a numeric-array column via numpy.

    Kept as the documented Arrow-path example; the production cosine /
    norm operators use JVM expressions (functions/vector.py) which
    avoid the Python worker entirely.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm(arrs: pd.Series) -> pd.Series:
        import numpy as np

        def norm(a):
            # Widen float32 embeddings to f64 BEFORE accumulating — the
            # result must match a double-precision oracle bit-for-bit.
            v = np.asarray(a, dtype=np.float64)
            return float(np.sqrt(np.dot(v, v)))

        return arrs.map(norm)

    return _norm


@lru_cache(maxsize=1)
def median_agg_pd():
    """Grouped-agg pandas UDF (UDAF): exact in-group median.

    The whole group's values ship to the Python worker — no map-side
    partials — so this is for bounded-cardinality groups; unbounded
    groups should use percentile_approx (mergeable sketch) instead.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:  # type: ignore[misc]
        return float(v.median())

    return _median


class _ParseKvEntries:
    """Python UDTF: explode a ``k=v,k2=v2`` entry list into typed rows.

    The CLI's ``--add-entry`` grammar (reference main.go:102–122):
    split on the FIRST '=' only — values may contain '='.  A UDTF (not
    explode+split) because each input row yields a variable number of
    typed rows with per-row validation.
    """

    def eval(self, entries: str):  # noqa: D102
        if not entries:
            return
        for item in entries.split(","):
            if "=" not in item:
                continue  # permissive: skip malformed entries
            k, _, v = item.partition("=")
            if k:
                yield (k, v)


@lru_cache(maxsize=1)
def parse_kv_entries_udtf():
    """The ``ParseKvEntries`` UDTF wrapped with its output schema."""
    from pyspark.sql.functions import udtf

    return udtf(_ParseKvEntries, returnType="entry_key string, entry_value string")


@lru_cache(maxsize=1)
def _digit_sum_arrow_udf():
    """Arrow-optimized scalar Python UDF (``useArrow=True``).

    Plain row-signature Python, but Spark ships the column through
    Arrow record batches instead of pickled rows — the modern default
    for Python UDFs that cannot be expressed vectorized.  The kernel
    (decimal digit sum) is integer-exact, so an external engine can
    replay it and hash-match (u06)."""
    from pyspark.sql.functions import udf

    def digit_sum(n) -> int | None:
        if n is None:
            return None
        return sum(int(c) for c in str(abs(int(n))))

    return udf(digit_sum, "int", useArrow=True)


def digit_sum_arrow(col):
    """Apply the Arrow-optimized digit-sum UDF to ``col``."""
    return _digit_sum_arrow_udf()(col)


@lru_cache(maxsize=1)
def _char_count_iter_udf():
    """Iterator-of-Series pandas UDF (``SCALAR_ITER``).

    The iterator signature lets a worker pay one-time setup (model
    load, dictionary mmap) once per PARTITION instead of once per
    Arrow batch — the shape production scoring UDFs take.  The kernel
    is an integer-exact codepoint count so u07 can hash-match it."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def char_count(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition setup would go here
        for s in it:
            yield s.str.len().astype("int64")

    return char_count


def char_count_iter(col):
    """Apply the SCALAR_ITER codepoint-count UDF to ``col``."""
    return _char_count_iter_udf()(col)


@lru_cache(maxsize=1)
def split_fields_udtf():
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` API): output
    schema is computed at PLAN time from the constant field-count
    argument — ``split_fields(s, 3)`` yields columns f0..f2.  The
    eighth Python extension shape: u03's UDTF has a fixed schema;
    this one is schema-on-call, the shape generic text-splitting
    tools need."""
    from pyspark.sql.functions import (
        AnalyzeArgument,
        AnalyzeResult,
        udtf,
    )
    from pyspark.sql.types import StringType, StructField, StructType

    class SplitFields:
        @staticmethod
        def analyze(
            s: AnalyzeArgument, n: AnalyzeArgument, sep: AnalyzeArgument
        ) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"f{i}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, s, n: int, sep: str):
            parts = (s or "").split(sep)
            yield tuple(
                (parts[i] if i < len(parts) else None) for i in range(n)
            )

    return udtf(SplitFields)
