"""Round-14 optimization equivalence tests.

The r14 optimization round rewrote several operator INTERNALS for
speed with a bit-identical-output contract (OPTIMIZATION_r14.md):
n-gram/shingle builders (zip-of-slices instead of per-position
transform), the SWAR SimHash builders (SQL expr strings instead of
per-term Column algebra), and s21's scan-local IVF cell assignment.
These tests pin that contract independently of the DuckDB oracles —
pure-Python references for the portable builders, the pre-rewrite
Column-algebra construction for the JVM-hash builder, and a plan-shape
pin for s21.
"""

from __future__ import annotations

import hashlib
import re
from functools import reduce
from operator import add

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators import dedup as D
from kinesis_log_streamer_spark.operators import text as TX

EDGE_TEXTS = [
    "",                                  # empty → one empty token
    "one",                               # shorter than any n ≥ 2
    "two words",                         # exactly n for n=2
    "alpha beta gamma",                  # exactly n for n=3
    "a  b\t c \n d",                     # multi-space / tab / newline
    "  padded   both  ends  ",           # trim + inner runs
    "UPPER Case MiXeD tokens here",      # lowering
    "ünï çødé tökens räin",              # non-ASCII
    "x " * 40 + "y",                     # long repetitive tail
    "the quick brown fox jumps over the lazy dog",
]


def _ref_tokens(text: str) -> list[str]:
    # Mirror tokens_col: split(lower(trim(text)), '\s+') — Spark's
    # split of "" yields [""], re.split does the same.
    return re.split(r"\s+", text.strip().lower())


def _ref_grams(text: str, n: int) -> list[str]:
    toks = _ref_tokens(text)
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


class TestGramBuilderEquivalence:
    """ngrams_col / shingles_col (zip-of-slices form) vs a pure-Python
    reference over edge-case texts."""

    @pytest.mark.parametrize("n", [2, 3, 4])
    def test_ngrams_col_matches_reference(self, spark, n):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id int, t string"
        )
        got = {
            r.id: r.g
            for r in df.select(
                "id", TX.ngrams_col(F.col("t"), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == _ref_grams(t, n), (n, t)

    @pytest.mark.parametrize("n", [2, 3])
    def test_shingles_col_matches_reference(self, spark, n):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(EDGE_TEXTS)], "id int, t string"
        )
        got = {
            r.id: r.g
            for r in df.select(
                "id",
                D.shingles_col(D.tokens_col(F.col("t")), n).alias("g"),
            ).collect()
        }
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == _ref_grams(t, n), (n, t)


_ODD = set("13579bdf")


def _ref_portable_sig(text: str) -> int:
    toks = [t for t in _ref_tokens(text)]
    distinct = list(dict.fromkeys(toks))
    n = len(distinct)
    sig = 0
    for i in range(32):
        cnt = sum(
            1
            for tok in distinct
            if hashlib.md5(tok.encode()).hexdigest()[i] in _ODD
        )
        if 2 * cnt >= n:
            sig += 1 << i
    return sig


class TestSwarExprEquivalence:
    """The r14 SQL-expr-string SWAR builders must produce the exact
    signatures of (a) a pure-Python md5 reference and (b) the
    pre-rewrite Column-algebra construction for the xxhash64 family."""

    def test_portable_sigs_match_python_reference(self, spark):
        texts = [t for t in EDGE_TEXTS if t.strip()]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.id: r.sig
            for r in D._portable_simhash_sigs(
                df, "text", "doc_id"
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _ref_portable_sig(t), t

    def test_fingerprints_match_column_algebra_form(self, spark):
        texts = [t for t in EDGE_TEXTS if t.strip()]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        new = {
            r.id: r.simhash
            for r in D.simhash_fingerprints(df).collect()
        }

        # The pre-r14 construction, verbatim (reduce over per-term
        # Column algebra) — same semantics, built differently.
        lane_mask = 0x0001000100010001
        toks = df.select(
            F.col("doc_id").alias("id"),
            F.explode(D.tokens_col(F.col("text"))).alias("tok"),
        ).select("id", F.xxhash64("tok").alias("h"))
        counters = toks.groupBy("id").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.shiftright("h", g).bitwiseAND(F.lit(lane_mask))
                ).alias(f"acc{g}")
                for g in range(16)
            ],
        )
        packed = None
        for b in range(64):
            g, j = b % 16, b // 16
            s = F.shiftright(F.col(f"acc{g}"), 16 * j).bitwiseAND(
                F.lit(0xFFFF)
            )
            bit = F.when(
                s * 2 > F.col("n"),
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
            packed = bit if packed is None else packed.bitwiseOR(bit)
        old = {
            r.id: r.old for r in counters.select(
                "id", packed.alias("old")
            ).collect()
        }
        assert new == old


class TestS21ScanLocalPlan:
    """s21's IVF cell assignment is scan-local since r14: no
    sort-merge or nested-loop join may reappear, and the shuffle
    budget is pinned at the post-rewrite count (PLANS.md row: 5)."""

    def test_plan_shape(self, spark):
        from kinesis_log_streamer_spark.plans import queries as Q

        df = Q.REGISTRY["s21_ivf_maxsim_rerank"](
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("Exchange") <= 6
