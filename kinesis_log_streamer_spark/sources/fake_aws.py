"""boto3-shaped Kinesis *read* API over a ``dir:`` shard layout.

The container has no boto3 and no AWS; this fake implements the exact
call surface the ``aws`` transport of the Kinesis source uses —
``list_shards`` / ``get_shard_iterator`` / ``get_records`` (the
consumer-side mirror of the reference's PutRecords producer,
basestreamer.go:65-72) — over the same ``shard-*.jsonl`` files the
``dir:`` endpoint and :class:`~.kinesis_source.DirKinesisClient` use.
Tests drive the real transport code through this fake end-to-end; a
production run swaps in boto3 via the source's ``client`` option
without touching the transport.

Iterator tokens are ``"<shard>:<index>"``; sequence numbers are the
record's line index as a decimal string (monotonic per shard, the only
property the transport relies on — real Kinesis sequence numbers are
also monotonic-per-shard decimal strings).  Arrival timestamps are the
``ts`` field the writers (:func:`~.kinesis_source.write_fake_shard`,
``DirKinesisClient.put_records``) stamp at append time — real wall
clock, so the fence reader's ``AT_TIMESTAMP`` iterators and
``(lo, hi]`` arrival ranges behave exactly as against the service;
legacy lines without a stamp read as 0.0 (inside every TRIM_HORIZON
fence).
"""

from __future__ import annotations

import json
import os


class FakeKinesisReadClient:
    """Read-side Kinesis client over ``shard-*.jsonl`` files."""

    def __init__(self, endpoint_dir: str) -> None:
        self._dir = endpoint_dir

    # -- helpers ---------------------------------------------------------
    def _shard_path(self, shard_id: str) -> str:
        return os.path.join(self._dir, f"shard-{shard_id}.jsonl")

    def _records(self, shard_id: str) -> list[dict]:
        path = self._shard_path(shard_id)
        if not os.path.exists(path):
            return []
        out = []
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    out.append(json.loads(line))
        return out

    # -- boto3 surface ---------------------------------------------------
    def list_shards(self, StreamName: str) -> dict:  # noqa: N803
        shards = []
        if os.path.isdir(self._dir):
            for name in sorted(os.listdir(self._dir)):
                if name.startswith("shard-") and name.endswith(".jsonl"):
                    shards.append(
                        {"ShardId": name[len("shard-"):-len(".jsonl")]}
                    )
        return {"Shards": shards}

    def get_shard_iterator(
        self,
        StreamName: str,  # noqa: N803
        ShardId: str,  # noqa: N803
        ShardIteratorType: str,  # noqa: N803
        StartingSequenceNumber: str | None = None,  # noqa: N803
        Timestamp: float | None = None,  # noqa: N803
    ) -> dict:
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        elif ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
            idx = int(StartingSequenceNumber) + 1
        elif ShardIteratorType == "AT_SEQUENCE_NUMBER":
            idx = int(StartingSequenceNumber)
        elif ShardIteratorType == "LATEST":
            idx = len(self._records(ShardId))
        elif ShardIteratorType == "AT_TIMESTAMP":
            # First record at-or-after the timestamp — the service's
            # inclusive AT_TIMESTAMP semantics (and moto's).
            at = float(Timestamp or 0.0)
            recs = self._records(ShardId)
            idx = next(
                (
                    i
                    for i, r in enumerate(recs)
                    if float(r.get("ts", 0.0)) >= at
                ),
                len(recs),
            )
        else:
            raise ValueError(f"unsupported iterator type {ShardIteratorType}")
        return {"ShardIterator": f"{ShardId}:{idx}"}

    def get_records(self, ShardIterator: str, Limit: int = 10000) -> dict:  # noqa: N803
        shard_id, _, idx_s = ShardIterator.rpartition(":")
        idx = int(idx_s)
        recs = self._records(shard_id)
        batch = recs[idx : idx + Limit]
        out = [
            {
                "Data": r["data"].encode("utf-8"),
                "PartitionKey": r.get("partitionKey", ""),
                "SequenceNumber": str(idx + i),
                "ApproximateArrivalTimestamp": float(r.get("ts", 0.0)),
            }
            for i, r in enumerate(batch)
        ]
        nxt = idx + len(batch)
        # Same shape moto computes: lag of the last RETURNED record
        # behind the shard tip, 0 when the batch reaches (or is) the
        # tip — the fence probe's tiebreak for an inclusive-boundary
        # peek relies on this being > 0 iff records remain beyond.
        millis = 0
        if batch and nxt < len(recs):
            millis = max(
                0,
                int(
                    (
                        float(recs[-1].get("ts", 0.0))
                        - float(batch[-1].get("ts", 0.0))
                    )
                    * 1000
                ),
            )
            millis = max(millis, 1)  # beyond-tip records always signal
        return {
            "Records": out,
            "NextShardIterator": f"{shard_id}:{nxt}",
            "MillisBehindLatest": millis,
        }


def client_for(options: dict) -> FakeKinesisReadClient:
    """Client factory with the source's ``client`` option signature."""
    return FakeKinesisReadClient(options["fake_dir"])
