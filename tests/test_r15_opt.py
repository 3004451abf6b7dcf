"""Round-15 optimization equivalence tests.

The r15 optimization round rewrote query INTERNALS for speed with an
identical-output contract (OPTIMIZATION_r15.md).  These tests pin that
contract independently of the DuckDB oracles, the same way
tests/test_r14_opt.py pinned the r14 rewrites.

l09_rolling_anomaly: the sliding-frame avg/stddev (O(rows·100) buffer
rebuilds in Spark's SlidingWindowFunctionFrame) was replaced by exact
decimal prefix sums differenced at the frame edges (O(1)/row).  The
pre-rewrite sliding-frame form is reproduced inline here and compared
row-for-row on real testdata AND on synthetic 2-decimal data, plus a
boundary-margin audit showing every z sits far from the round(z, 3)
half-up boundaries and the |z| > 3 cut where the two arithmetics could
disagree.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_log_streamer_spark.plans import queries as Q

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _l09_sliding_frame(ev):
    """The pre-r15 l09 form: sliding-frame window aggregates."""
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
    )
    scored = ev.select(
        "event_id",
        "event_type",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("value").over(w).alias("n_hist"),
    )
    return (
        scored.filter(F.col("n_hist") == 100)
        .withColumn("z", (F.col("value") - F.col("mu")) / F.col("sd"))
        .filter(F.abs("z") > 3)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round("z", 3).alias("z"),
        )
        .orderBy("event_id")
    )


def _l09_prefix_z(ev):
    """The r15 prefix-sum internals, stopping BEFORE rounding: every
    (event_id, unrounded z) with a full 100-row history."""
    word = W.partitionBy("event_type").orderBy("ts", "event_id")
    w1 = word.rowsBetween(W.unboundedPreceding, -1)
    w101 = word.rowsBetween(W.unboundedPreceding, -101)
    dv = F.col("value").cast("decimal(18,2)")
    dv2 = dv * dv
    zero2 = F.lit(0).cast("decimal(28,2)")
    zero4 = F.lit(0).cast("decimal(38,4)")
    scored = ev.select(
        "event_id",
        "value",
        (F.sum(dv).over(w1) - F.coalesce(F.sum(dv).over(w101), zero2))
        .cast("decimal(12,2)")
        .alias("sumv"),
        (F.sum(dv2).over(w1) - F.coalesce(F.sum(dv2).over(w101), zero4))
        .cast("decimal(16,4)")
        .alias("sumv2"),
        (F.count("value").over(w1) - F.count("value").over(w101)).alias(
            "n_hist"
        ),
    )
    sd = F.sqrt(
        (F.lit(100) * F.col("sumv2") - F.col("sumv") * F.col("sumv"))
        .cast("double")
        / F.lit(9900.0)
    )
    mu = (F.col("sumv") / 100).cast("double")
    return scored.filter(F.col("n_hist") == 100).select(
        "event_id", ((F.col("value") - mu) / sd).alias("z")
    )


def _synthetic_events(spark, n_rows=6000, n_types=3, seed=1715):
    """Deterministic 2-decimal synthetic events: mostly-normal values
    with injected outliers so the |z| > 3 filter actually fires."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        et = f"type_{i % n_types}"
        if rng.random() < 0.02:
            v = round(rng.uniform(300.0, 480.0), 2)  # outlier band
        else:
            v = round(rng.gauss(100.0, 15.0), 2)
        rows.append((i, i * 1000, et, max(v, 0.01)))
    return spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double"
    )


def _t22_window_form(spark, sf):
    """The pre-r15 t22 form: df as count() OVER (PARTITION BY g) on
    the exploded rows — the shape whose per-gram window partition
    buffers a hot gram in one task at scale."""
    from kinesis_log_streamer_spark.operators import text as TX

    docs = Q._t(spark, sf, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.ngrams_col(F.col("text"), 3))
        ).alias("g"),
    )
    with_df = grams.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("g"))
    )
    per_doc = with_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("df") >= 2, 1)).alias("n_shared"),
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_shared",
        F.expr("(2*1000*n_shared + n_grams) div (2*n_grams)").alias(
            "shared_permille"
        ),
    ).orderBy("doc_id")


class TestT22SkewSafeDf:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_window_form(self, spark, sf):
        old = _t22_window_form(spark, sf).collect()
        new = Q.t22_ngram_novelty(spark, sf).collect()
        assert [tuple(r) for r in new] == [tuple(r) for r in old]
        assert len(new) > 0

    def test_plan_has_no_per_gram_window_or_doc_broadcast(self, spark):
        """The scale contract: no Window over raw gram rows (the skew
        bound the rewrite removes), partial aggregation below every
        gram exchange, and no broadcast of the |docs|-sized unique-
        count side."""
        import io
        from contextlib import redirect_stdout

        df = Q.t22_ngram_novelty(spark, SFS[0])
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert ") Window" not in plan
        assert "BroadcastExchange" not in plan
        assert "partial_count" in plan
        assert "partial_min" in plan
        assert "SortMergeJoin" in plan


class TestL09PrefixSumEquivalence:
    @pytest.mark.parametrize("sf", SFS)
    def test_matches_sliding_frame_on_testdata(self, spark, sf):
        ev = Q._t(spark, sf, "events")
        old = _l09_sliding_frame(ev).collect()
        new = Q.l09_rolling_anomaly(spark, sf).collect()
        assert [tuple(r) for r in new] == [tuple(r) for r in old]
        assert len(new) > 0  # the comparison must not be vacuous

    def test_matches_sliding_frame_on_synthetic(self, spark):
        ev = _synthetic_events(spark)
        old = _l09_sliding_frame(ev).collect()

        # Run the shipped internals over the synthetic frame by
        # rebuilding the query's final projection on top of the
        # prefix-sum z (identical expressions to the query body).
        word = W.partitionBy("event_type").orderBy("ts", "event_id")
        w1 = word.rowsBetween(W.unboundedPreceding, -1)
        w101 = word.rowsBetween(W.unboundedPreceding, -101)
        dv = F.col("value").cast("decimal(18,2)")
        dv2 = dv * dv
        zero2 = F.lit(0).cast("decimal(28,2)")
        zero4 = F.lit(0).cast("decimal(38,4)")
        scored = ev.select(
            "event_id",
            "event_type",
            "value",
            (F.sum(dv).over(w1) - F.coalesce(F.sum(dv).over(w101), zero2))
            .cast("decimal(12,2)")
            .alias("sumv"),
            (F.sum(dv2).over(w1) - F.coalesce(F.sum(dv2).over(w101), zero4))
            .cast("decimal(16,4)")
            .alias("sumv2"),
            (
                F.count("value").over(w1) - F.count("value").over(w101)
            ).alias("n_hist"),
        )
        sd = F.sqrt(
            (F.lit(100) * F.col("sumv2") - F.col("sumv") * F.col("sumv"))
            .cast("double")
            / F.lit(9900.0)
        )
        mu = (F.col("sumv") / 100).cast("double")
        new = (
            scored.filter(F.col("n_hist") == 100)
            .withColumn("z", (F.col("value") - mu) / sd)
            .filter(F.abs("z") > 3)
            .select(
                "event_id",
                "event_type",
                F.round("value", 2).alias("value"),
                F.round("z", 3).alias("z"),
            )
            .orderBy("event_id")
            .collect()
        )
        assert [tuple(r) for r in new] == [tuple(r) for r in old]
        assert len(new) > 10

    @pytest.mark.parametrize("sf", SFS)
    def test_round_boundary_margin(self, spark, sf):
        """No unrounded z sits near a round(z, 3) half-up boundary or
        the |z| > 3 cut — the only places where the exact-decimal and
        the sliding-double arithmetic (a few ulp apart) could diverge
        after rounding.  Both arithmetics are within ~1e-10 relative
        of the true z; a 1e-6 observed margin is therefore >1000x the
        disagreement band."""
        zs = [r.z for r in _l09_prefix_z(Q._t(spark, sf, "events")).collect()]
        assert zs
        for z in zs:
            # distance to the |z| > 3 filter cut (every candidate row)
            assert abs(abs(z) - 3.0) > 1e-6, z
            if abs(z) > 3.0:
                # distance to the x.xxx5 half-up rounding boundary
                # (output rows only — the rounding exists only there)
                scaled = abs(z) * 1000.0
                frac = scaled - math.floor(scaled)
                assert abs(frac - 0.5) > 1e-6, z
