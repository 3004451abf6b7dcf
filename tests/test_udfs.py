"""UDF-surface tests: scalar pandas UDF, grouped-agg pandas UDF, UDTF."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_log_streamer_spark.functions.udfs import (
    median_agg_pd,
    parse_kv_entries_udtf,
    vec_norm_pd,
)


class TestScalarPandasUdf:
    def test_vec_norm(self, spark):
        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [1.0, 0.0])], "id long, v array<double>"
        )
        got = {r.id: r.n for r in df.select("id", vec_norm_pd()("v").alias("n")).collect()}
        assert math.isclose(got[1], 5.0) and math.isclose(got[2], 1.0)


class TestGroupedAggPandasUdf:
    def test_median_per_group(self, spark):
        rows = [("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 5.0), ("b", 7.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        got = {
            r.k: r.med
            for r in df.groupBy("k").agg(median_agg_pd()("v").alias("med")).collect()
        }
        assert got == {"a": 2.0, "b": 6.0}


class TestUdtf:
    def test_parse_kv_entries(self, spark):
        spark.udtf.register("parse_kv", parse_kv_entries_udtf())
        out = spark.sql(
            "SELECT * FROM parse_kv('LogFile=AccessLog,Env=prod=east,bad,=x')"
        ).collect()
        got = [(r.entry_key, r.entry_value) for r in out]
        # first-'=' split (values may contain '='); malformed/keyless skipped
        assert got == [("LogFile", "AccessLog"), ("Env", "prod=east")]

    def test_lateral_join_usage(self, spark):
        spark.udtf.register("parse_kv", parse_kv_entries_udtf())
        df = spark.createDataFrame(
            [(1, "a=1,b=2"), (2, "c=3")], "id long, entries string"
        )
        df.createOrReplaceTempView("kv_src")
        out = spark.sql(
            """
            SELECT id, entry_key, entry_value
            FROM kv_src, LATERAL parse_kv(entries)
            ORDER BY id, entry_key
            """
        ).collect()
        assert [(r.id, r.entry_key, r.entry_value) for r in out] == [
            (1, "a", "1"), (1, "b", "2"), (2, "c", "3"),
        ]
