"""Kinesis PutRecords sink (reference B1+K1: basestreamer.go:19-87).

The reference accumulates ≤5 records and ships each buffer as one
``PutRecords`` call, dropping failed batches/records (at-most-once,
basestreamer.go:73-83).  The engine upgrades this deliberately:

* **Sub-batching at the real API limits** — 500 records / 5 MiB per
  call (the reference's 5 uses ~1% of a call; BASELINE.md) — inside
  ``foreachBatch``, per partition, executor-side.
* **At-least-once** — failed records are retried with exponential
  backoff; Structured Streaming checkpointing replays the batch on
  task failure.  (Documented delta from the reference's at-most-once.)
  ``KinesisSink(delivery="at_most_once")`` restores STRICT reference
  parity — one call, no retry, log-and-drop, never raise
  (:func:`put_records_at_most_once`).
* **Partition-key affinity** — rows carry a ``partitionKey`` column
  (E1); ``df.repartition("partitionKey")`` before the write reproduces
  the reference's per-key ordering into shards.

The client is injected / import-gated: tests use ``CollectingSink``
(a local stand-in with the same record contract — SURVEY.md §2.1 row
K1 prescribes the substitution) and, since boto3+moto landed in this
image (round 13), the REAL ``_boto3_factory`` path is exercised
against an in-process moto Kinesis server over HTTP
(tests/test_moto_aws.py).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

MAX_RECORDS_PER_CALL = 500  # Kinesis PutRecords API limit
MAX_BYTES_PER_CALL = 5 * 1024 * 1024  # 5 MiB API limit
MAX_BYTES_PER_RECORD = 1024 * 1024  # 1 MiB per record (data+key)


def chunk_records(
    rows: Iterable[tuple[bytes, str]],
    max_records: int = MAX_RECORDS_PER_CALL,
    max_bytes: int = MAX_BYTES_PER_CALL,
) -> Iterator[list[tuple[bytes, str]]]:
    """Greedy size/count-capped batching (the B1 micro-batcher at API
    scale): flush at max_records OR max_bytes, and always at end of
    input (the reference's EOF drain, basestreamer.go:27-33)."""
    batch: list[tuple[bytes, str]] = []
    size = 0
    for data, key in rows:
        rec_size = len(data) + len(key.encode())
        if rec_size > MAX_BYTES_PER_RECORD:
            # The API rejects oversized records on EVERY attempt; sending
            # one would burn retries and then vanish — fail fast instead
            # (the at-least-once contract forbids a silent drop).
            raise ValueError(
                f"record of {rec_size} bytes exceeds the "
                f"{MAX_BYTES_PER_RECORD}-byte Kinesis per-record limit "
                f"(partitionKey={key!r})"
            )
        if batch and (len(batch) >= max_records or size + rec_size > max_bytes):
            yield batch
            batch, size = [], 0
        batch.append((data, key))
        size += rec_size
    if batch:
        yield batch


def put_records_with_retry(
    client,
    stream_name: str,
    batch: list[tuple[bytes, str]],
    max_retries: int = 3,
    backoff_s: float = 0.2,
    on_drop: Callable[[list[tuple[bytes, str]]], None] | None = None,
) -> int:
    """One PutRecords call + per-record retry of failures.

    Returns the number of records durably accepted. The reference logs
    and drops failures (basestreamer.go:73-83); we retry — documented
    at-least-once upgrade.  Records still failing after ``max_retries``
    are handed to ``on_drop`` (a dead-letter hook); with no hook the
    call RAISES so Structured Streaming fails the task and replays the
    batch from the checkpoint — a silent drop would void the
    at-least-once guarantee."""
    pending = batch
    for attempt in range(max_retries + 1):
        resp = client.put_records(
            StreamName=stream_name,
            Records=[
                {"Data": data, "PartitionKey": key} for data, key in pending
            ],
        )
        if resp.get("FailedRecordCount", 0) == 0:
            return len(batch)
        failed = [
            rec
            for rec, result in zip(pending, resp["Records"])
            if "ErrorCode" in result
        ]
        if attempt == max_retries:
            if on_drop is None:
                raise RuntimeError(
                    f"{len(failed)} record(s) still failing after "
                    f"{max_retries} retries on stream {stream_name!r}"
                )
            on_drop(failed)
            return len(batch) - len(failed)
        pending = failed
        time.sleep(backoff_s * (2**attempt))
    return len(batch)


def put_records_at_most_once(
    client,
    stream_name: str,
    batch: list[tuple[bytes, str]],
    on_drop: Callable[[list[tuple[bytes, str]]], None] | None = None,
) -> int:
    """STRICT-PARITY delivery: one PutRecords call, zero retries, log
    and drop — exactly the reference's Flush (basestreamer.go:64-87):
    a failed CALL drops the whole buffer after one stderr line, a
    partial failure logs each failed record and drops only those, and
    the pipeline NEVER raises (so Structured Streaming never replays
    the batch — at-most-once end to end).  Returns records accepted.

    Exists as a flag-selectable mode because the retrying
    at-least-once path (:func:`put_records_with_retry`) is a
    documented behavioral upgrade over the reference; this closes the
    parity delta for users who depend on drop-on-pressure semantics
    (e.g. best-effort log shipping where duplicates are worse than
    loss)."""
    log = logging.getLogger(__name__)
    try:
        resp = client.put_records(
            StreamName=stream_name,
            Records=[
                {"Data": data, "PartitionKey": key} for data, key in batch
            ],
        )
    except Exception as exc:  # noqa: BLE001 - parity: any call error drops
        log.error("Failed to call Kinesis.PutRecords: %s", exc)
        if on_drop is not None:
            on_drop(batch)
        return 0
    if resp.get("FailedRecordCount", 0) == 0:
        return len(batch)
    failed = [
        rec
        for rec, result in zip(batch, resp["Records"])
        if "ErrorCode" in result
    ]
    for (_, key), result in zip(batch, resp["Records"]):
        if "ErrorCode" in result:
            log.error(
                "Failed to write a Kinesis record: %s (PartitionKey=%s)",
                result.get("ErrorMessage", result["ErrorCode"]),
                key,
            )
    if on_drop is not None:
        on_drop(failed)
    return len(batch) - len(failed)


class KinesisSink:
    """foreachBatch writer shipping (data, partitionKey) rows to Kinesis.

    ``client_factory`` is called once per executor partition (boto3
    clients are not picklable); defaults to a boto3 factory that
    raises a clear error when boto3 is absent.

    ``delivery`` selects the end-to-end guarantee:

    * ``"at_least_once"`` (default) — retry with backoff, raise on
      exhaustion so the micro-batch replays from the checkpoint.
    * ``"at_most_once"`` — strict reference parity
      (:func:`put_records_at_most_once`): one call, no retry, log and
      drop, never raise.
    """

    def __init__(
        self,
        stream_name: str,
        client_factory: Callable | None = None,
        region: str | None = None,
        profile: str | None = None,
        on_drop: Callable[[list[tuple[bytes, str]]], None] | None = None,
        delivery: str = "at_least_once",
        endpoint_url: str | None = None,
        access_key: str | None = None,
        secret_key: str | None = None,
    ) -> None:
        if delivery not in ("at_least_once", "at_most_once"):
            raise ValueError(
                f"delivery must be 'at_least_once' or 'at_most_once', "
                f"got {delivery!r}"
            )
        self.stream_name = stream_name
        self.region = region
        self.profile = profile
        # Kinesis-compatible HTTP endpoint override (the moto server in
        # tests); None = the real service.  Explicit credentials ride
        # the sink object (executor python workers don't see env vars
        # set after the JVM started); None = boto3's default chain.
        # All plain strings, so the sink pickles into foreachBatch
        # partitions unchanged.
        self.endpoint_url = endpoint_url
        self.access_key = access_key
        self.secret_key = secret_key
        self.client_factory = client_factory or self._boto3_factory
        # Dead-letter hook for records that exhaust retries; None means
        # raise → task retry → micro-batch replay (at-least-once).
        self.on_drop = on_drop
        self.delivery = delivery

    def _boto3_factory(self):
        try:
            import boto3  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "boto3 is not installed; inject client_factory or use "
                "CollectingSink for local runs"
            ) from exc
        session = boto3.Session(
            profile_name=self.profile,
            region_name=self.region,
            aws_access_key_id=self.access_key,
            aws_secret_access_key=self.secret_key,
        )
        return session.client("kinesis", endpoint_url=self.endpoint_url)

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        """foreachBatch entry point: executor-side partition iteration,
        no driver collect."""
        stream_name = self.stream_name
        factory = self.client_factory
        on_drop = self.on_drop
        at_most_once = self.delivery == "at_most_once"
        accepted = df.sparkSession.sparkContext.accumulator(0)

        def write_partition(rows) -> None:
            client = factory()
            pairs = (
                (
                    r["data"] if isinstance(r["data"], (bytes, bytearray)) else str(r["data"]).encode(),
                    r["partitionKey"],
                )
                for r in rows
            )
            for batch in chunk_records(pairs):
                if at_most_once:
                    accepted.add(
                        put_records_at_most_once(
                            client, stream_name, batch, on_drop=on_drop
                        )
                    )
                else:
                    accepted.add(
                        put_records_with_retry(
                            client, stream_name, batch, on_drop=on_drop
                        )
                    )

        df.select("data", "partitionKey").repartition("partitionKey").foreachPartition(
            write_partition
        )
        logging.getLogger(__name__).info(
            "epoch %s: %s record(s) accepted by %s",
            epoch_id,
            accepted.value,
            stream_name,
        )


class CollectingSink:
    """Local test sink with the Kinesis record contract (A5): captures
    (data, partitionKey, batch_no) per flush so tests can assert batch
    boundaries — the stand-in SURVEY §5.2 prescribes."""

    def __init__(self, max_records: int = MAX_RECORDS_PER_CALL) -> None:
        self.max_records = max_records
        self.batches: list[list[tuple[bytes, str]]] = []

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        rows = df.select("data", "partitionKey").collect()
        pairs = [
            (
                r["data"] if isinstance(r["data"], (bytes, bytearray)) else str(r["data"]).encode(),
                r["partitionKey"],
            )
            for r in rows
        ]
        self.batches.extend(chunk_records(pairs, max_records=self.max_records))

    @property
    def records(self) -> list[tuple[bytes, str]]:
        return [rec for b in self.batches for rec in b]
