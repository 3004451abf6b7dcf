"""Round-7 query tests: f24 (Avro round trip), st17 (statestore
reader), q135 (approx_top_k), t27 (BM25)."""

from __future__ import annotations

import math

import pytest

from kinesis_log_streamer_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


class TestF24AvroRoundtrip:
    def test_roundtrip_rollup_matches_direct(self, spark):
        got = {
            r.o_orderpriority: (r.n_orders, r.n_keys, r.total)
            for r in Q.f24_avro_roundtrip(spark, SF).collect()
        }
        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.sources.tables import load_table

        want = {
            r.p: (r.n, r.k, r.t)
            for r in load_table(spark, SF, "orders")
            .groupBy(F.col("o_orderpriority").alias("p"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("o_orderkey").alias("k"),
                F.round(F.sum("o_totalprice"), 2).alias("t"),
            )
            .collect()
        }
        assert got == want

    def test_wire_column_is_binary(self, spark):
        # The round trip must put real serialized bytes on the wire —
        # both the avro and the fallback codec produce a BINARY column.
        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.plans.queries import (
            _avro_available,
        )

        probe = spark.range(1).select(
            F.to_json(F.struct("id")).cast("binary").alias("b")
        )
        assert dict(probe.dtypes)["b"] == "binary"
        # _avro_available must answer (either way) without raising.
        assert _avro_available(spark) in (True, False)


class TestSt17StatestoreReader:
    def test_state_reconciles_with_batch(self, spark):
        rows = Q.st17_statestore_reader(spark, SF).collect()
        assert rows, "no event types"
        assert all(r.state_ok == 1 for r in rows), rows

    def test_statestore_format_is_real_here(self, spark, tmp_path):
        # The query's PRIMARY path reads state rows back with
        # spark.read.format("statestore"); this pin fails loudly if a
        # Spark upgrade drops the format and st17 silently degrades to
        # its memory-sink fallback (probed REAL in this image, r7).
        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.streaming.pipeline import (
            read_events_stream,
        )

        ev = read_events_stream(spark, SF)
        agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        ckpt = str(tmp_path / "ckpt")
        q = (
            agg.writeStream.format("memory")
            .queryName("st17_pin")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        state = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias("state_n"),
            )
            .collect()
        )
        assert state, "statestore reader returned no state rows"
        want = {
            r.event_type: r.n for r in spark.table("st17_pin").collect()
        }
        got = {r.event_type: r.state_n for r in state}
        assert got == want


class TestQ135ApproxTopK:
    def test_matches_exact_topk(self, spark):
        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.sources.tables import load_table

        got = [(r.rnk, r.item, r.cnt) for r in
               Q.q135_approx_top_k(spark, SF).collect()]
        exact = (
            load_table(spark, SF, "events")
            .select(
                F.concat_ws(
                    "/", "event_type",
                    (F.col("user_id") % 20).cast("string"),
                ).alias("item")
            )
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("item"))
            .limit(10)
            .collect()
        )
        want = [(i + 1, r.item, r.cnt) for i, r in enumerate(exact)]
        assert got == want


class TestT27Bm25:
    def _write_docs(self, spark, tmp_path, rows):
        path = str(tmp_path / "documents.parquet")
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(path)
        return str(tmp_path)

    @staticmethod
    def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl)
        )

    def test_scores_match_formula(self, spark, tmp_path):
        # q1 probes (spark, join, table).  doc 10 matches all three,
        # doc 11 repeats one term, doc 12 matches nothing.
        docs = [
            (10, "spark join table"),
            (11, "spark spark spark filter"),
            (12, "other words entirely here"),
        ]
        sf = self._write_docs(spark, tmp_path, docs)
        out = {
            (r.qid, r.doc_id): r
            for r in Q.t27_bm25_topk(spark, sf).collect()
        }
        n, avgdl = 3, (3 + 4 + 4) / 3.0
        want10 = (
            self._bm25(1, 2, n, 3, avgdl)      # spark, df=2
            + self._bm25(1, 1, n, 3, avgdl)    # join
            + self._bm25(1, 1, n, 3, avgdl)    # table
        )
        want11 = self._bm25(3, 2, n, 4, avgdl)  # spark x3 only
        assert out[("q1", 10)].score == pytest.approx(want10, abs=1e-3)
        assert out[("q1", 10)].n_terms == 3
        assert out[("q1", 11)].score == pytest.approx(want11, abs=1e-3)
        assert out[("q1", 11)].n_terms == 1
        assert ("q1", 12) not in out
        # saturating tf + all-terms coverage must outrank repetition
        assert out[("q1", 10)].rnk == 1 and out[("q1", 11)].rnk == 2

    def test_topk_shape_on_corpus(self, spark):
        rows = Q.t27_bm25_topk(spark, SF).collect()
        by_q: dict[str, list] = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        for qid, rs in by_q.items():
            assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
            scores = [r.score for r in rs]
            assert scores == sorted(scores, reverse=True), qid
            assert all(1 <= r.n_terms <= 3 for r in rs)
