"""Streaming-semantics tests: AvailableNow drain (EOF flush), batch
boundaries, windowed/sessionized aggregation (SURVEY §5.2 item 3)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.streaming.kinesis_sink import (
    CollectingSink,
    chunk_records,
)
from kinesis_log_streamer_spark.streaming.pipeline import (
    build_line_pipeline,
    run_stream,
    windowed_event_counts,
)


class TestChunking:
    def test_flush_at_max_records(self):
        # B1 at batch size 5 (basestreamer.go:20,37)
        rows = [(f"r{i}".encode(), "k") for i in range(12)]
        batches = list(chunk_records(rows, max_records=5))
        assert [len(b) for b in batches] == [5, 5, 2]  # EOF drain flushes tail

    def test_flush_at_max_bytes(self):
        rows = [(b"x" * 600, "k") for _ in range(4)]
        batches = list(chunk_records(rows, max_records=500, max_bytes=1500))
        assert [len(b) for b in batches] == [2, 2]

    def test_order_preserved(self):
        rows = [(str(i).encode(), "k") for i in range(7)]
        flat = [r for b in chunk_records(rows, max_records=3) for r in b]
        assert [d for d, _ in flat] == [str(i).encode() for i in range(7)]

    def test_oversized_record_rejected(self):
        # A >1 MiB record is rejected by the API on every attempt — it
        # must fail fast, not burn retries and silently vanish.
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            MAX_BYTES_PER_RECORD,
        )

        rows = [(b"x" * (MAX_BYTES_PER_RECORD + 1), "k")]
        with pytest.raises(ValueError, match="per-record limit"):
            list(chunk_records(rows))


class _AlwaysFailingClient:
    """put_records stub that fails the last record of every call."""

    def __init__(self):
        self.calls = 0

    def put_records(self, StreamName, Records):
        self.calls += 1
        results = [{} for _ in Records]
        results[-1] = {"ErrorCode": "ProvisionedThroughputExceededException"}
        return {"FailedRecordCount": 1, "Records": results}


class TestPutRecordsRetry:
    def test_exhausted_retries_raise_by_default(self):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_with_retry,
        )

        client = _AlwaysFailingClient()
        batch = [(b"a", "k1"), (b"b", "k2")]
        with pytest.raises(RuntimeError, match="still failing"):
            put_records_with_retry(
                client, "s", batch, max_retries=2, backoff_s=0.0
            )
        assert client.calls == 3  # initial + 2 retries

    def test_on_drop_receives_dead_letters(self):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_with_retry,
        )

        dropped: list = []
        batch = [(b"a", "k1"), (b"b", "k2")]
        n = put_records_with_retry(
            _AlwaysFailingClient(),
            "s",
            batch,
            max_retries=1,
            backoff_s=0.0,
            on_drop=dropped.extend,
        )
        assert n == 1
        assert dropped == [(b"b", "k2")]


class _ErroringClient:
    """put_records stub whose call itself raises (API/transport error —
    the reference's ``err != nil`` branch, basestreamer.go:73-75)."""

    def __init__(self):
        self.calls = 0

    def put_records(self, StreamName, Records):
        self.calls += 1
        raise ConnectionError("simulated transport failure")


class TestAtMostOnceParity:
    """Strict-parity delivery mode vs basestreamer.go:64-87: one call,
    no retry, log-and-drop, never raise."""

    def test_partial_failure_drops_failed_only_no_retry(self):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_at_most_once,
        )

        client = _AlwaysFailingClient()
        dropped: list = []
        batch = [(b"a", "k1"), (b"b", "k2")]
        n = put_records_at_most_once(
            client, "s", batch, on_drop=dropped.extend
        )
        assert n == 1  # only the failed record is lost
        assert client.calls == 1  # the reference NEVER retries
        assert dropped == [(b"b", "k2")]

    def test_call_error_drops_whole_batch_without_raising(self):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_at_most_once,
        )

        client = _ErroringClient()
        dropped: list = []
        batch = [(b"a", "k1"), (b"b", "k2")]
        n = put_records_at_most_once(
            client, "s", batch, on_drop=dropped.extend
        )
        assert n == 0  # whole buffer dropped (stderr log is the only trace)
        assert client.calls == 1
        assert dropped == batch

    def test_sink_delivery_flag_validated_and_dispatched(self):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            KinesisSink,
        )

        sink = KinesisSink(
            "s", client_factory=_ErroringClient, delivery="at_most_once"
        )
        assert sink.delivery == "at_most_once"
        with pytest.raises(ValueError, match="delivery"):
            KinesisSink("s", delivery="exactly_once")


class TestAvailableNowDrain:
    def test_stream_drains_and_flushes(self, spark, tmp_path):
        # EOF drain: all pending input processed, tail flushed
        # (basestreamer.go:27-33 ≙ Trigger.AvailableNow)
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.log").write_text("l1\nl2\n\nl3\n")
        (src / "b.log").write_text("l4\r\nl5\r\n")
        lines = spark.readStream.format("text").load(str(src))
        records = build_line_pipeline(
            lines, output_format="json",
            entries={"LogFile": "T"}, host_id="h1",
        )
        sink = CollectingSink(max_records=5)
        q = run_stream(records, sink, str(tmp_path / "ckpt"), available_now=True)
        q.awaitTermination(120)
        payloads = sorted(
            json.loads(d.decode())["LogEntry"] for d, _ in sink.records
        )
        assert payloads == ["l1", "l2", "l3", "l4", "l5"]
        assert all(k == "h1" for _, k in sink.records)
        assert all(len(b) <= 5 for b in sink.batches)


class TestWindowedAggregation:
    def test_tumbling_window_counts(self, spark, tmp_path):
        import datetime as dt

        rows = [
            (dt.datetime(2024, 1, 1, 0, m), "click", 1.0) for m in (1, 2, 9)
        ] + [(dt.datetime(2024, 1, 1, 0, 7), "view", 2.0)]
        src = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        pq = str(tmp_path / "events_pq")
        src.write.parquet(pq)
        stream = spark.readStream.schema(src.schema).parquet(pq)
        # complete mode: emit every window each trigger (append mode would
        # hold windows until the watermark passes — covered implicitly by
        # the sessionization streaming path; here we assert window math).
        agg = windowed_event_counts(stream, window="5 minutes")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(
            "SELECT window.start AS s, event_type, n FROM win_out ORDER BY s, event_type"
        ).collect()
        got = [(r.s.minute, r.event_type, r.n) for r in out]
        assert (0, "click", 2) in got  # 00:01, 00:02
        assert (5, "click", 1) in got  # 00:09
        assert (5, "view", 1) in got  # 00:07


class TestStatefulOps:
    def test_dedup_stream_drops_duplicates(self, spark, tmp_path):
        import datetime as dt

        from kinesis_log_streamer_spark.streaming.stateful import dedup_stream

        t = dt.datetime(2024, 1, 1, 0, 0)
        rows = [(1, t, "click"), (1, t, "click"), (2, t, "view"), (2, t, "view"), (3, t, "click")]
        src = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        pq = str(tmp_path / "dups_pq")
        src.coalesce(1).write.parquet(pq)
        stream = spark.readStream.schema(src.schema).parquet(pq)
        q = (
            dedup_stream(stream, keys=["event_id"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_out")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT event_id FROM dedup_out ORDER BY event_id").collect()
        assert [r.event_id for r in out] == [1, 2, 3]

    def test_stream_stream_join_time_bound(self, spark, tmp_path):
        import datetime as dt

        from kinesis_log_streamer_spark.streaming.stateful import stream_stream_join

        base = dt.datetime(2024, 1, 1, 0, 0)
        rows = [
            (10, base, "impression"),
            (10, base + dt.timedelta(minutes=2), "click"),     # within 5m -> joins
            (10, base + dt.timedelta(minutes=30), "click"),    # outside  -> dropped
            (20, base + dt.timedelta(minutes=1), "click"),     # other user, no impression
        ]
        src = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        pq = str(tmp_path / "join_pq")
        src.coalesce(1).write.parquet(pq)

        def stream():
            return spark.readStream.schema(src.schema).parquet(pq)

        joined = stream_stream_join(
            stream().filter(F.col("event_type") == "impression"),
            stream().filter(F.col("event_type") == "click"),
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("ssj_out")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT l_user, r_type FROM ssj_out").collect()
        assert [(r.l_user, r.r_type) for r in out] == [(10, "click")]

    def test_sessionize_with_state_emits_closed_sessions(self, spark, tmp_path):
        import datetime as dt
        import time

        from kinesis_log_streamer_spark.streaming.stateful import (
            sessionize_with_state,
        )

        base = dt.datetime(2024, 1, 1, 0, 0)
        rows = [
            (1, base, "login"),
            (1, base + dt.timedelta(minutes=1), "click"),
            (1, base + dt.timedelta(minutes=2), "logout"),
            (2, base, "view"),
        ]
        src = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        pq = str(tmp_path / "sess_pq")
        src.coalesce(1).write.parquet(pq)
        stream = spark.readStream.schema(src.schema).parquet(pq)
        q = (
            sessionize_with_state(stream, idle_timeout_ms=5000)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("sess_out")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(processingTime="1 second")
            .start()
        )
        # Sessions close via processing-time timeout (5s idle); poll the
        # sink until both users' sessions are emitted.
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS c FROM sess_out").collect()[0].c
            if n >= 2:
                break
            time.sleep(2)
        q.stop()
        out = {
            r.user_id: r
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        assert set(out) == {1, 2}
        assert out[1].n_events == 3
        assert out[1].first_type == "login" and out[1].last_type == "logout"
        assert out[2].n_events == 1


class TestKinesisSource:
    def test_stream_reads_shards_in_order(self, spark, tmp_path):
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            KinesisDataSource,
            write_fake_shard,
        )

        ep = str(tmp_path / "stream")
        write_fake_shard(ep, "000", [("a1", "h1"), ("a2", "h1")])
        write_fake_shard(ep, "001", [("b1", "h2")])
        spark.dataSource.register(KinesisDataSource)
        df = (
            spark.readStream.format("kinesis_py")
            .option("endpoint", f"dir:{ep}")
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("kin_out")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT * FROM kin_out ORDER BY shardId, sequenceNumber"
        ).collect()
        assert [(r.data, r.partitionKey, r.shardId, r.sequenceNumber) for r in rows] == [
            ("a1", "h1", "000", 0),
            ("a2", "h1", "000", 1),
            ("b1", "h2", "001", 0),
        ]

    def test_incremental_offsets_no_reread(self, spark, tmp_path):
        import time

        from kinesis_log_streamer_spark.sources.kinesis_source import (
            KinesisDataSource,
            write_fake_shard,
        )

        ep = str(tmp_path / "stream2")
        write_fake_shard(ep, "000", [("x1", "k")])
        spark.dataSource.register(KinesisDataSource)
        df = (
            spark.readStream.format("kinesis_py")
            .option("endpoint", f"dir:{ep}")
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("kin_inc")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.sql("SELECT count(*) c FROM kin_inc").collect()[0].c >= 1:
                    break
                time.sleep(1)
            write_fake_shard(ep, "000", [("x2", "k")])
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.sql("SELECT count(*) c FROM kin_inc").collect()[0].c >= 2:
                    break
                time.sleep(1)
        finally:
            q.stop()
        rows = spark.sql("SELECT data FROM kin_inc ORDER BY sequenceNumber").collect()
        # each record delivered exactly once, appended records picked up
        assert [r.data for r in rows] == ["x1", "x2"]

    def test_sink_source_round_trip(self, spark, tmp_path):
        """Full loop with zero AWS deps: KinesisSink (PutRecords contract,
        500-record sub-batching) → DirKinesisClient hash-routes to local
        shard files → kinesis_py streaming source reads them back with
        per-shard ordering."""
        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.sources.kinesis_source import (
            DirKinesisClient,
            KinesisDataSource,
        )
        from kinesis_log_streamer_spark.streaming.kinesis_sink import KinesisSink

        ep = str(tmp_path / "roundtrip")
        src = spark.range(50).select(
            F.concat(F.lit("rec-"), F.col("id")).alias("data"),
            F.concat(F.lit("host-"), (F.col("id") % 3)).alias("partitionKey"),
        )
        sink = KinesisSink("Test", client_factory=lambda: DirKinesisClient(ep))
        sink.write_batch(src, epoch_id=0)

        spark.dataSource.register(KinesisDataSource)
        df = (
            spark.readStream.format("kinesis_py")
            .option("endpoint", f"dir:{ep}")
            .load()
        )
        q = (
            df.writeStream.format("memory")
            .queryName("kin_rt")
            .option("checkpointLocation", str(tmp_path / "ck_rt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM kin_rt").collect()
        assert {(r.data, r.partitionKey) for r in rows} == {
            (f"rec-{i}", f"host-{i % 3}") for i in range(50)
        }
        # one partition key never straddles shards (hash routing)
        key_shards = {}
        for r in rows:
            key_shards.setdefault(r.partitionKey, set()).add(r.shardId)
        assert all(len(s) == 1 for s in key_shards.values())

    def test_source_composes_with_windowed_agg(self, spark, tmp_path):
        """The north-star pipeline: Kinesis source → JSON parse →
        watermarked tumbling-window aggregation, end to end in one
        streaming query."""
        import json

        import pyspark.sql.functions as F

        from kinesis_log_streamer_spark.sources.kinesis_source import (
            KinesisDataSource,
            write_fake_shard,
        )

        ep = str(tmp_path / "win_stream")
        payload = [
            ("2024-01-01 10:01:00", "click"),
            ("2024-01-01 10:02:00", "click"),
            ("2024-01-01 10:07:00", "view"),
        ]
        write_fake_shard(
            ep,
            "000",
            [(json.dumps({"ts": ts, "event_type": et}), "h1") for ts, et in payload],
        )
        spark.dataSource.register(KinesisDataSource)
        stream = (
            spark.readStream.format("kinesis_py")
            .option("endpoint", f"dir:{ep}")
            .load()
            .select(
                F.from_json(
                    "data", "ts timestamp, event_type string"
                ).alias("r")
            )
            .select("r.ts", "r.event_type")
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").start.alias("w"), "event_type")
            .count()
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("kin_win")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck_win"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r.w), r.event_type, r["count"])
            for r in spark.sql("SELECT * FROM kin_win").collect()
        }
        assert got == {
            ("2024-01-01 10:00:00", "click", 2),
            ("2024-01-01 10:05:00", "view", 1),
        }


class TestEventTimeSessionizer:
    def test_gap_split_sessions_emitted_deterministically(self, spark, tmp_path):
        import datetime as dt
        import os

        from kinesis_log_streamer_spark.streaming.stateful import (
            sessionize_by_event_time,
        )

        base = dt.datetime(2024, 1, 1, 0, 0)
        rows = [
            # user 1: two sessions split by a 45-min gap
            (1, base, "a"),
            (1, base + dt.timedelta(minutes=10), "b"),
            (1, base + dt.timedelta(minutes=55), "c"),
            # user 2: one session
            (2, base + dt.timedelta(minutes=5), "x"),
        ]
        schema = "user_id long, ts timestamp, event_type string"
        src_dir = tmp_path / "sess_src"
        src_dir.mkdir()
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src_dir / "data")
        )
        # Two far-future sentinel batches advance the watermark past every
        # real timeout, then fire them (see _events_stream_with_flush).
        for i in (1, 2):
            p = str(src_dir / f"zz{i}")
            spark.createDataFrame(
                [(-1, base + dt.timedelta(days=i), "flush")], schema
            ).coalesce(1).write.parquet(p)
            for f in os.listdir(p):
                os.utime(
                    os.path.join(p, f), (2_000_000_000 + i, 2_000_000_000 + i)
                )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src_dir}/*")
        )
        q = (
            sessionize_by_event_time(stream, gap="30 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("ets_out")
            .option("checkpointLocation", str(tmp_path / "ck_ets"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql(
            "SELECT user_id, session_start, n_events, first_type, last_type "
            "FROM ets_out WHERE user_id >= 0 "
            "ORDER BY user_id, session_start"
        ).collect()
        got = [
            (r.user_id, r.session_start, r.n_events, r.first_type, r.last_type)
            for r in out
        ]
        assert got == [
            (1, base, 2, "a", "b"),
            (1, base + dt.timedelta(minutes=55), 1, "c", "c"),
            (2, base + dt.timedelta(minutes=5), 1, "x", "x"),
        ]


class TestAwsKinesisTransport:
    """The aws endpoint's ListShards/GetShardIterator/GetRecords path,
    driven end-to-end through the boto3-shaped fake (fake_aws.py)."""

    def _write(self, ep):
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            write_fake_shard,
        )

        write_fake_shard(ep, "000", [("a1", "h1"), ("a2", "h1")])
        write_fake_shard(ep, "001", [("b1", "h2")])

    def test_fake_client_call_surface(self, tmp_path):
        from kinesis_log_streamer_spark.sources.fake_aws import (
            FakeKinesisReadClient,
        )

        ep = str(tmp_path / "stream")
        self._write(ep)
        c = FakeKinesisReadClient(ep)
        assert [s["ShardId"] for s in c.list_shards(StreamName="s")["Shards"]] == [
            "000",
            "001",
        ]
        it = c.get_shard_iterator(
            StreamName="s", ShardId="000", ShardIteratorType="TRIM_HORIZON"
        )["ShardIterator"]
        resp = c.get_records(ShardIterator=it, Limit=1)
        assert resp["Records"][0]["Data"] == b"a1"
        assert resp["Records"][0]["SequenceNumber"] == "0"
        resp2 = c.get_records(ShardIterator=resp["NextShardIterator"])
        assert [r["Data"] for r in resp2["Records"]] == [b"a2"]
        it3 = c.get_shard_iterator(
            StreamName="s",
            ShardId="000",
            ShardIteratorType="AFTER_SEQUENCE_NUMBER",
            StartingSequenceNumber="0",
        )["ShardIterator"]
        assert c.get_records(ShardIterator=it3)["Records"][0]["Data"] == b"a2"

    def _aws_stream(self, spark, ep):
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            KinesisDataSource,
        )

        spark.dataSource.register(KinesisDataSource)
        return (
            spark.readStream.format("kinesis_py")
            .option("endpoint", "aws")
            .option("stream", "test-stream")
            .option(
                "client", "kinesis_log_streamer_spark.sources.fake_aws:client_for"
            )
            .option("fake_dir", ep)
            .option("fencelagms", "0")  # single-process clock: no skew
            .load()
        )

    def test_aws_endpoint_reads_all_shards(self, spark, tmp_path):
        ep = str(tmp_path / "stream")
        self._write(ep)
        q = (
            self._aws_stream(spark, ep)
            .writeStream.format("memory")
            .queryName("kin_aws")
            .option("checkpointLocation", str(tmp_path / "ck_aws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT * FROM kin_aws ORDER BY shardId, CAST(sequenceNumber AS INT)"
        ).collect()
        assert [
            (r.data, r.partitionKey, r.shardId, r.sequenceNumber) for r in rows
        ] == [
            ("a1", "h1", "000", "0"),
            ("a2", "h1", "000", "1"),
            ("b1", "h2", "001", "0"),
        ]

    def test_aws_incremental_offsets_no_reread(self, spark, tmp_path):
        import time

        from kinesis_log_streamer_spark.sources.kinesis_source import (
            write_fake_shard,
        )

        ep = str(tmp_path / "stream2")
        self._write(ep)
        q = (
            self._aws_stream(spark, ep)
            .writeStream.format("memory")
            .queryName("kin_aws_inc")
            .option("checkpointLocation", str(tmp_path / "ck_aws2"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.sql("SELECT count(*) c FROM kin_aws_inc").collect()[0].c >= 3:
                    break
                time.sleep(1)
            # new records on one shard: the next micro-batch's probe must
            # advance that shard's sequence offset and read ONLY them.
            write_fake_shard(ep, "001", [("b2", "h2")])
            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.sql("SELECT count(*) c FROM kin_aws_inc").collect()[0].c >= 4:
                    break
                time.sleep(1)
        finally:
            q.stop()
        rows = spark.sql(
            "SELECT data FROM kin_aws_inc "
            "ORDER BY shardId, CAST(sequenceNumber AS INT)"
        ).collect()
        # exactly-once per record: no rereads, appended records picked up
        assert [r.data for r in rows] == ["a1", "a2", "b1", "b2"]


class TestTransformWithState:
    """Spark 4 transformWithStateInPandas (VERDICT r05 item 6): the
    real API is exercised where google.protobuf exists; everywhere
    else the availability gate must be False and the registered st16
    query must fall back to the verified applyInPandasWithState twin
    (covered by its DuckDB oracle in selfcheck)."""

    def test_availability_gate_matches_import(self):
        from kinesis_log_streamer_spark.streaming.stateful import (
            transform_with_state_available,
        )

        try:
            import google.protobuf  # noqa: F401

            has = True
        except ImportError:
            has = False
        assert transform_with_state_available() is has

    def test_running_totals_via_transform_with_state(self, spark, tmp_path):
        import pytest as _pytest

        from kinesis_log_streamer_spark.streaming.stateful import (
            running_totals_transform_with_state,
            transform_with_state_available,
        )

        if not transform_with_state_available():
            _pytest.skip("google.protobuf absent: transformWithState "
                         "state protocol cannot run in this env")
        indir = str(tmp_path / "in")
        outp = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame(
            [(1, 0, 2.0), (1, 0, 3.0), (2, 0, 5.0)],
            "key int, phase int, value double",
        ).coalesce(1).write.parquet(indir)
        stream = (
            spark.readStream.schema("key int, phase int, value double")
            .format("parquet")
            .load(indir)
        )
        q = (
            running_totals_transform_with_state(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(outp)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = {
            (r.key, r.running_n, r.running_sum)
            for r in spark.read.parquet(outp).collect()
        }
        assert rows == {(1, 2, 5.0), (2, 1, 5.0)}
