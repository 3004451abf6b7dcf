"""Round-3 extension queries: mergeable sketches, XML/VARIANT
surfaces, runtime bloom-filter pruning, Arrow-optimized UDF.

Value-level Spark⇌DuckDB equivalence is covered by selfcheck and the
driver; these tests pin the MECHANISMS — sketch mergeability, plan
injection, escaping survival, UDF edge cases — that a hash match
alone would not attribute."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_log_streamer_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


class TestHllPartialUnion:
    def test_sharded_union_equals_single_sketch(self, spark):
        """Mergeability: 8 partial sketches unioned give the SAME
        estimate as one sketch over the whole column — the property
        that makes per-partition sketching correct, not just close."""
        orders = Q._t(spark, SF, "orders")
        whole = orders.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
        ).collect()[0]["e"]
        merged = (
            orders.withColumn("shard", F.col("o_orderkey") % 8)
            .groupBy("shard")
            .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
            .collect()[0]["e"]
        )
        assert whole == merged

    def test_gate_holds(self, spark):
        rows = Q.q64_hll_partial_union(spark, SF).collect()
        assert rows and all(r["est_ok"] == 1 for r in rows)


class TestXmlRoundtrip:
    def test_escaping_survives(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 'a&b<c>"d"'), (2, "plain")], "id bigint, s string"
        )
        p = str(tmp_path / "xml")
        df.write.format("xml").option("rowTag", "r").save(p)
        back = (
            spark.read.format("xml")
            .option("rowTag", "r")
            .schema("id bigint, s string")
            .load(p)
        )
        assert {(r["id"], r["s"]) for r in back.collect()} == {
            (1, 'a&b<c>"d"'),
            (2, "plain"),
        }


class TestVariantShred:
    def test_typed_extraction_and_missing_path(self, spark):
        df = spark.createDataFrame(
            [('{"k": 7, "s": "x"}',), ('{"s": "y"}',), ("[1,2]",)],
            "props string",
        )
        out = df.select(
            F.variant_get(F.parse_json("props"), "$.k", "int").alias("k")
        ).collect()
        assert [r["k"] for r in out] == [7, None, None]


class TestBloomFilterJoin:
    def test_plan_carries_might_contain_and_confs_restored(self, spark):
        before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        out = Q.q65_bloom_filter_join(spark, SF)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
        # cached plan keeps the filter: values still match a plain join
        plain = (
            Q._t(spark, SF, "lineitem")
            .join(
                Q._t(spark, SF, "part").filter(F.col("p_size") >= 44),
                F.col("l_partkey") == F.col("p_partkey"),
            )
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"))
        )
        got = {(r["p_brand"], r["n_items"]) for r in out.collect()}
        exp = {(r["p_brand"], r["n_items"]) for r in plain.collect()}
        assert {k: v for k, v in got} == {k: v for k, v in exp}


class TestArrowUdf:
    def test_digit_sum_edges(self, spark):
        from kinesis_log_streamer_spark.functions.udfs import digit_sum_arrow

        df = spark.createDataFrame(
            [(0,), (9,), (1001,), (None,)], "n bigint"
        )
        out = df.select(digit_sum_arrow(F.col("n")).alias("d")).collect()
        assert [r["d"] for r in out] == [0, 9, 2, None]
