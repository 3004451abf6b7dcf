"""REAL-boto3 Kinesis transport tests against an in-process moto
server (import-gated — boto3 1.43 and moto 5.2 appeared in this image
in round 13; COVERAGE.md tracks the probe history).

These activate the leg VERDICT r12 listed as env-blocked: the
`AwsKinesisStreamReader` consumer sequence (ListShards →
GetShardIterator → GetRecords) and the `KinesisSink._boto3_factory`
producer path run against real boto3 request signing, serialization,
and pagination over HTTP — the same client the real service gets —
instead of the boto3-shaped in-process fake (fake_aws.py, still
exercised by TestAwsKinesisTransport as the no-network twin).

ThreadedMotoServer (not the @mock_aws decorator) because the source's
``read`` and the sink's partition writers rebuild their client on
EXECUTOR python workers: an in-process mock can't cross that process
boundary, an HTTP endpoint on 127.0.0.1 can.  Credentials and the
endpoint URL ride the reader options / sink fields, never the process
environment (workers don't inherit env vars set after the JVM starts).
"""

from __future__ import annotations

import json
import uuid

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from moto.server import ThreadedMotoServer  # noqa: E402

REGION = "us-east-1"
CREDS = {"access_key": "testing", "secret_key": "testing"}


@pytest.fixture(scope="module")
def moto_url():
    server = ThreadedMotoServer(port=0)
    server.start()
    # Public API (moto 5.x) — server._server.socket is a private attr
    # that breaks silently on moto refactors (ADVICE r13 low #2).
    host, port = server.get_host_and_port()
    yield f"http://{host}:{port}"
    server.stop()


@pytest.fixture()
def kinesis(moto_url):
    return boto3.client(
        "kinesis",
        region_name=REGION,
        endpoint_url=moto_url,
        aws_access_key_id=CREDS["access_key"],
        aws_secret_access_key=CREDS["secret_key"],
    )


def _make_stream(kinesis, n_shards: int) -> str:
    name = "klss-" + uuid.uuid4().hex[:8]
    kinesis.create_stream(StreamName=name, ShardCount=n_shards)
    return name


class TestRealBoto3Source:
    def _read_available(self, spark, moto_url, stream):
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            KinesisDataSource,
        )

        spark.dataSource.register(KinesisDataSource)
        sdf = (
            spark.readStream.format("kinesis_py")
            .option("endpoint", "aws")
            .option("stream", stream)
            .option("client", "boto3")
            .option("endpoint_url", moto_url)
            .option("region", REGION)
            .option("access_key", CREDS["access_key"])
            .option("secret_key", CREDS["secret_key"])
            .option("fencelagms", "0")
            .load()
        )
        name = "moto_src_" + uuid.uuid4().hex[:8]
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(300), "moto source drain timed out"
        finally:
            q.stop()
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        return rows

    def test_reads_all_shards_via_real_client(self, spark, moto_url, kinesis):
        stream = _make_stream(kinesis, 2)
        sent = []
        for i in range(25):
            payload = json.dumps({"line": f"rec-{i}"})
            kinesis.put_record(
                StreamName=stream, Data=payload.encode(), PartitionKey=f"k{i % 4}"
            )
            sent.append(payload)
        rows = self._read_available(spark, moto_url, stream)
        assert sorted(r.data for r in rows) == sorted(sent)
        # both shards served records and the executor-side refetch kept
        # the real (string, ~186-bit) sequence numbers
        assert len({r.shardId for r in rows}) == 2
        assert all(isinstance(r.sequenceNumber, str) for r in rows)
        assert all(int(r.sequenceNumber) >= 0 for r in rows)

    def test_per_shard_order_and_offset_resume(self, spark, moto_url, kinesis):
        """Two drains: records put after the first batch's offset must
        arrive in the second, none duplicated — the replayable-offset
        contract over real AT_TIMESTAMP fence ranges (arrival stamps
        are immutable, so a (lo, hi] fence is deterministic on
        replay)."""
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            AwsKinesisStreamReader,
        )

        stream = _make_stream(kinesis, 1)
        opts = {
            "stream": stream,
            "client": "boto3",
            "endpoint_url": moto_url,
            "region": REGION,
            "fencelagms": "0",  # same-process clock: no skew to lag for
            **CREDS,
        }
        reader = AwsKinesisStreamReader(opts)
        start = reader.initialOffset()
        for i in range(5):
            kinesis.put_record(
                StreamName=stream, Data=f"a{i}".encode(), PartitionKey="p"
            )
        mid = reader.latestOffset()
        for i in range(3):
            kinesis.put_record(
                StreamName=stream, Data=f"b{i}".encode(), PartitionKey="p"
            )
        end = reader.latestOffset()

        def drain(lo, hi):
            out = []
            for part in reader.partitions(lo, hi):
                out.extend(reader.read(part))
            return [r[0] for r in out if r]

        first = drain(start, mid)
        second = drain(mid, end)
        assert first == [f"a{i}" for i in range(5)]
        assert second == [f"b{i}" for i in range(3)]


class _CountingClient:
    """Transparent wrapper over a real boto3 Kinesis client that
    counts what the DRIVER downloads."""

    def __init__(self, inner) -> None:
        self._inner = inner
        self.get_records_calls = 0
        self.records_fetched = 0
        self.bytes_fetched = 0

    def list_shards(self, **kw):
        return self._inner.list_shards(**kw)

    def get_shard_iterator(self, **kw):
        return self._inner.get_shard_iterator(**kw)

    def get_records(self, **kw):
        resp = self._inner.get_records(**kw)
        self.get_records_calls += 1
        recs = resp.get("Records", [])
        self.records_fetched += len(recs)
        self.bytes_fetched += sum(len(r["Data"]) for r in recs)
        return resp


class TestDriverProbeIsMetadataSized:
    def test_latest_offset_bytes_bounded_by_shards_not_records(
        self, moto_url, kinesis
    ):
        """The VERDICT r13 weak item, pinned: ``latestOffset`` must be
        O(shards) driver bytes per trigger — one Limit=1 peek per
        shard — regardless of how many records flow through the
        batch.  The old design downloaded every batch record on the
        driver once (O(shards × cap)) and executors re-fetched them;
        the fence design's driver traffic stays flat while the batch
        grows, and executors fetch each record exactly once."""
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            AwsKinesisStreamReader,
        )

        n_shards, n_records, payload = 2, 400, b"x" * 100
        stream = _make_stream(kinesis, n_shards)
        opts = {
            "stream": stream,
            "client": "boto3",
            "endpoint_url": moto_url,
            "region": REGION,
            "fencelagms": "0",
            **CREDS,
        }
        reader = AwsKinesisStreamReader(opts)
        counting = _CountingClient(kinesis)
        reader._client = counting  # count ONLY driver-side traffic

        start = reader.initialOffset()
        for i in range(n_records):
            kinesis.put_record(
                StreamName=stream, Data=payload, PartitionKey=f"k{i % 7}"
            )
        # counting wraps the same client the puts used; reset after.
        counting.get_records_calls = 0
        counting.records_fetched = 0
        counting.bytes_fetched = 0

        n_triggers = 3
        offsets = [start]
        for _ in range(n_triggers):
            offsets.append(reader.latestOffset())

        # Driver traffic: at most ONE probe record per shard per
        # trigger — O(shards), not O(records).
        assert counting.get_records_calls <= n_shards * n_triggers
        assert counting.records_fetched <= n_shards * n_triggers
        assert counting.bytes_fetched <= n_shards * n_triggers * len(payload)

        # ...and the batch the executors then read is COMPLETE: every
        # record arrives exactly once through the fence ranges.
        got = []
        for lo, hi in zip(offsets, offsets[1:]):
            for part in reader.partitions(lo, hi):
                got.extend(r[0] for r in reader.read(part))
        assert len(got) == n_records


class TestRealBoto3Reshard:
    def test_reshard_discovery_no_reread(self, moto_url, kinesis):
        """k03's contract on the REAL consumer API: after an
        UpdateShardCount reshard the next offset probe must discover
        the child shards and deliver every record EXACTLY ONCE across
        the reshard boundary.

        moto artifact this test must tolerate: update_shard_count
        RE-INGESTS the parent's records (split_shard re-puts them,
        assigning fresh arrival stamps — and moto's put routing lands
        them back in the closed parent).  Real Kinesis never
        re-stamps, so WHICH drain carries the pre-reshard records here
        is moto's choice, not the reader's; the fence contract's
        invariant — union complete, no duplicates, children tracked —
        is what's pinned."""
        from kinesis_log_streamer_spark.sources.kinesis_source import (
            AwsKinesisStreamReader,
        )

        stream = _make_stream(kinesis, 1)
        opts = {
            "stream": stream,
            "client": "boto3",
            "endpoint_url": moto_url,
            "region": REGION,
            "fencelagms": "0",  # same-process clock: no skew to lag for
            **CREDS,
        }
        reader = AwsKinesisStreamReader(opts)
        start = reader.initialOffset()
        for i in range(4):
            kinesis.put_record(
                StreamName=stream, Data=f"pre-{i}".encode(), PartitionKey="p"
            )
        mid = reader.latestOffset()
        kinesis.update_shard_count(
            StreamName=stream, TargetShardCount=2, ScalingType="UNIFORM_SCALING"
        )
        for i in range(6):
            kinesis.put_record(
                StreamName=stream,
                Data=f"post-{i}".encode(),
                PartitionKey=f"key-{i}",
            )
        end = reader.latestOffset()
        assert len(end["shards"]) >= 3  # parent + two children tracked

        def drain(lo, hi):
            out = []
            for part in reader.partitions(lo, hi):
                out.extend(r[0] for r in reader.read(part))
            return out

        first = drain(start, mid)
        second = drain(mid, end)
        expected = [f"pre-{i}" for i in range(4)] + [
            f"post-{i}" for i in range(6)
        ]
        # exactly-once across the reshard: union complete, no record
        # delivered twice (list-sorted compare catches duplicates).
        assert sorted(first + second) == sorted(expected)
        # records put after the first fence can only be in the second.
        assert {f"post-{i}" for i in range(6)} <= set(second)


class TestRealBoto3Sink:
    def test_foreachbatch_put_records_via_real_client(
        self, spark, moto_url, kinesis
    ):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            KinesisSink,
        )

        stream = _make_stream(kinesis, 1)
        sink = KinesisSink(
            stream,
            region=REGION,
            endpoint_url=moto_url,
            **CREDS,
        )
        df = spark.createDataFrame(
            [(f"payload-{i}", f"host-{i % 3}") for i in range(12)],
            "data string, partitionKey string",
        )
        sink.write_batch(df, epoch_id=0)

        shard = kinesis.list_shards(StreamName=stream)["Shards"][0]["ShardId"]
        it = kinesis.get_shard_iterator(
            StreamName=stream, ShardId=shard, ShardIteratorType="TRIM_HORIZON"
        )["ShardIterator"]
        got = []
        while it:
            resp = kinesis.get_records(ShardIterator=it, Limit=100)
            if not resp["Records"]:
                break
            got.extend(resp["Records"])
            it = resp.get("NextShardIterator")
        assert sorted(r["Data"].decode() for r in got) == sorted(
            f"payload-{i}" for i in range(12)
        )
        assert {r["PartitionKey"] for r in got} == {"host-0", "host-1", "host-2"}

    def test_at_most_once_never_raises_on_dead_endpoint(self, spark):
        """Strict-parity delivery through the REAL client against a
        refused connection: the reference logs and drops
        (basestreamer.go:73-83) — the call must return 0 accepted, not
        raise."""
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            KinesisSink,
            put_records_at_most_once,
        )

        sink = KinesisSink(
            "no-such-stream",
            region=REGION,
            endpoint_url="http://127.0.0.1:1",  # nothing listens here
            delivery="at_most_once",
            **CREDS,
        )
        import botocore.config  # noqa: PLC0415

        client = boto3.Session(
            region_name=REGION,
            aws_access_key_id=CREDS["access_key"],
            aws_secret_access_key=CREDS["secret_key"],
        ).client(
            "kinesis",
            endpoint_url=sink.endpoint_url,
            config=botocore.config.Config(
                retries={"max_attempts": 0}, connect_timeout=1, read_timeout=1
            ),
        )
        dropped = []
        n = put_records_at_most_once(
            client, sink.stream_name, [(b"x", "k")], on_drop=dropped.append
        )
        assert n == 0
        assert dropped and dropped[0] == [(b"x", "k")]


class TestWireLevelPartialFailure:
    """VERDICT r13 next #4: the reference's partial-failure branch
    (basestreamer.go:76-83) driven through REAL boto3 serialization.
    moto never emits per-record errors, so a loopback proxy
    (sources/throttle_proxy.py) withholds deterministically-chosen
    records and splices ProvisionedThroughputExceededException entries
    into the wire response — botocore parses a genuine throttled
    PutRecords reply, and the withheld records truly never reach the
    stream."""

    def _proxy(self, moto_url, reject_mod=10):
        from kinesis_log_streamer_spark.sources.throttle_proxy import (
            ThrottlingKinesisProxy,
        )

        p = ThrottlingKinesisProxy(moto_url, reject_mod=reject_mod)
        return p, p.start()

    def test_per_record_errors_parsed_and_only_those_dropped(
        self, moto_url, kinesis
    ):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_at_most_once,
        )

        stream = _make_stream(kinesis, 1)
        proxy, proxy_url = self._proxy(moto_url)
        try:
            client = boto3.client(
                "kinesis",
                region_name=REGION,
                endpoint_url=proxy_url,
                aws_access_key_id=CREDS["access_key"],
                aws_secret_access_key=CREDS["secret_key"],
            )
            batch = [
                (json.dumps({"event_id": i, "v": i * 2}).encode(), f"k{i % 3}")
                for i in range(25)
            ]
            dropped = []
            accepted = put_records_at_most_once(
                client, stream, batch, on_drop=dropped.append
            )
            # every event_id % 10 == 0 record (0, 10, 20) throttled at
            # the wire; the mode drops exactly those, retries nothing.
            assert accepted == 22
            assert [json.loads(d)["event_id"] for d, _ in dropped[0]] == [
                0, 10, 20,
            ]
            assert proxy.put_records_calls == 1
            assert proxy.records_rejected == 3
        finally:
            proxy.stop()

        # the stream itself holds ONLY the survivors (the withheld
        # records never reached moto).
        it = kinesis.get_shard_iterator(
            StreamName=stream,
            ShardId="shardId-000000000000",
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        got = []
        while it:
            resp = kinesis.get_records(ShardIterator=it, Limit=100)
            if not resp["Records"]:
                break
            got.extend(
                json.loads(r["Data"])["event_id"] for r in resp["Records"]
            )
            it = resp.get("NextShardIterator")
        assert sorted(got) == [i for i in range(25) if i % 10 != 0]

    def test_whole_batch_throttled_returns_zero_without_raising(
        self, moto_url, kinesis
    ):
        from kinesis_log_streamer_spark.streaming.kinesis_sink import (
            put_records_at_most_once,
        )

        stream = _make_stream(kinesis, 1)
        proxy, proxy_url = self._proxy(moto_url, reject_mod=1)
        try:
            client = boto3.client(
                "kinesis",
                region_name=REGION,
                endpoint_url=proxy_url,
                aws_access_key_id=CREDS["access_key"],
                aws_secret_access_key=CREDS["secret_key"],
            )
            batch = [
                (json.dumps({"event_id": i}).encode(), "k") for i in range(4)
            ]
            dropped = []
            accepted = put_records_at_most_once(
                client, stream, batch, on_drop=dropped.append
            )
            assert accepted == 0
            assert len(dropped[0]) == 4
        finally:
            proxy.stop()

    def test_non_putrecords_calls_forward_verbatim(self, moto_url, kinesis):
        stream = _make_stream(kinesis, 1)
        kinesis.put_record(StreamName=stream, Data=b"via-moto", PartitionKey="p")
        proxy, proxy_url = self._proxy(moto_url)
        try:
            through = boto3.client(
                "kinesis",
                region_name=REGION,
                endpoint_url=proxy_url,
                aws_access_key_id=CREDS["access_key"],
                aws_secret_access_key=CREDS["secret_key"],
            )
            shards = through.list_shards(StreamName=stream)["Shards"]
            assert len(shards) == 1
            it = through.get_shard_iterator(
                StreamName=stream,
                ShardId=shards[0]["ShardId"],
                ShardIteratorType="TRIM_HORIZON",
            )["ShardIterator"]
            recs = through.get_records(ShardIterator=it)["Records"]
            assert [r["Data"] for r in recs] == [b"via-moto"]
        finally:
            proxy.stop()
