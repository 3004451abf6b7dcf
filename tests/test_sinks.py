"""File-sink tests: partitioned parquet layout + pruning, CSV/JSON
round-trips (SURVEY §2.2 "File-format scans / sinks")."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis_log_streamer_spark.sources import sinks


class TestPartitionedParquet:
    def test_layout_and_roundtrip(self, spark, tmp_path):
        df = spark.range(100).select(
            F.col("id"),
            (F.col("id") % 3).alias("bucket"),
            (F.col("id") * 2.0).alias("v"),
        )
        out = str(tmp_path / "pq")
        sinks.write_partitioned_parquet(df, out, ["bucket"])
        dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
        assert dirs == ["bucket=0", "bucket=1", "bucket=2"]
        # one data file per partition value (repartition shaped the write)
        for d in dirs:
            files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
            assert len(files) == 1
        back = spark.read.parquet(out)
        assert back.count() == 100

    def test_partition_pruning(self, spark, tmp_path):
        df = spark.range(90).select(
            F.col("id"), (F.col("id") % 3).alias("bucket")
        )
        out = str(tmp_path / "pq2")
        sinks.write_partitioned_parquet(df, out, ["bucket"])
        q = spark.read.parquet(out).filter(F.col("bucket") == 1)
        plan = q._jdf.queryExecution().executedPlan().toString()
        # pruned scan reads one of three partition dirs
        assert "PartitionFilters: [isnotnull(bucket" in plan
        assert q.count() == 30

    def test_events_by_date(self, spark, tmp_path):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 5)),
            (2, dt.datetime(2024, 1, 1, 9)),
            (3, dt.datetime(2024, 1, 2, 5)),
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        out = str(tmp_path / "ev")
        sinks.write_events_by_date(df, out)
        dirs = sorted(d for d in os.listdir(out) if d.startswith("event_date="))
        assert dirs == ["event_date=2024-01-01", "event_date=2024-01-02"]


class TestInterchangeFormats:
    def test_csv_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a,b", 1.5), (2, 'q"x', None)], "id long, s string, v double"
        )
        out = str(tmp_path / "csv")
        sinks.write_csv(df, out)
        back = sinks.read_csv(spark, out, "id long, s string, v double")
        got = {(r.id, r.s, r.v) for r in back.collect()}
        assert got == {(1, "a,b", 1.5), (2, 'q"x', None)}

    def test_json_lines_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, ["x", "y"], {"k": "v"})],
            "id long, arr array<string>, m map<string,string>",
        )
        out = str(tmp_path / "jsonl")
        sinks.write_json_lines(df, out)
        back = sinks.read_json_lines_typed(
            spark, out, "id long, arr array<string>, m map<string,string>"
        )
        r = back.collect()[0]
        assert r.id == 1 and r.arr == ["x", "y"] and r.m == {"k": "v"}

    def test_text_sink(self, spark, tmp_path):
        df = spark.createDataFrame([("l1",), ("l2",)], "value string")
        out = str(tmp_path / "txt")
        sinks.write_text(df, out)
        back = spark.read.text(out)
        assert sorted(r.value for r in back.collect()) == ["l1", "l2"]


class TestDirShardAppendAtomicity:
    def test_concurrent_put_records_never_tear_lines(self, tmp_path):
        """ADVICE r04 (medium): two writer tasks appending to the SAME
        shard file must not interleave mid-line.  put_records uses
        O_APPEND + one os.write per shard group; 8 threads x 100
        batches all routed to one shard must yield exactly 800 intact
        JSONL lines."""
        import json
        import threading

        from kinesis_log_streamer_spark.sources.kinesis_source import (
            DirKinesisClient,
        )

        ep = str(tmp_path / "shards")
        n_threads, n_batches = 8, 100

        def worker(tid: int) -> None:
            client = DirKinesisClient(ep, num_shards=1)
            for b in range(n_batches):
                client.put_records(
                    StreamName="t",
                    Records=[
                        {
                            "Data": json.dumps(
                                {"tid": tid, "batch": b, "pad": "x" * 200}
                            ).encode(),
                            "PartitionKey": f"k{tid}",
                        }
                    ],
                )

        threads = [
            threading.Thread(target=worker, args=(t,))
            for t in range(n_threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        lines = (
            (tmp_path / "shards" / "shard-000.jsonl")
            .read_text()
            .strip()
            .splitlines()
        )
        assert len(lines) == n_threads * n_batches
        seen = set()
        for line in lines:
            rec = json.loads(line)  # raises on any torn line
            inner = json.loads(rec["data"])
            seen.add((inner["tid"], inner["batch"]))
        assert len(seen) == n_threads * n_batches  # no dup, no loss
