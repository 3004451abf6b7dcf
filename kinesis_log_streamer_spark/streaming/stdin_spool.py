"""Chunked stdin → landing-dir spool for the CLI's STREAMING mode.

The reference never buffers its input: it reads stdin in 64 KiB
chunks (linestreamer.go:34), carries the trailing partial record
across chunk boundaries (linestreamer.go:49-57), and ships complete
records downstream through a bounded (cap-5) channel
(linestreamer.go:37) with flush-on-idle (basestreamer.go:42-46).
The CLI's original batch path (`sys.stdin.read()`) held the whole
input in one driver string — a semantics delta as much as a memory
one, because an Apache log pipe never EOFs and flush-on-idle could
never fire.

This module is the Spark-native equivalent of that loop: a spooler
thread reads stdin chunk-by-chunk, extracts COMPLETE records (lines,
or concatenated-JSON values via incremental ``raw_decode``), and
lands each chunk's records as one atomically-renamed file in a
landing directory.  `spark.readStream.format("text")` tails the
directory; ``maxFilesPerTrigger`` is the bounded-channel
backpressure, the micro-batch trigger cadence is the flush-on-idle
timer, and EOF is observed as "spooler finished AND the query has
drained every landed file" (see :func:`drain_and_stop`).

Memory bound: one chunk + one partial record — never the full input.
"""

from __future__ import annotations

import codecs
import json
import os
import threading
import time
import uuid

CHUNK_BYTES = 65536  # the reference's read size, linestreamer.go:34


class StdinSpooler:
    """Reads a byte stream in bounded chunks and lands complete
    records as ordered files.

    ``fmt='line'``  → records are LF-terminated lines (CR stripped by
    the downstream pipeline, not here — transform parity).
    ``fmt='json'``  → records are concatenated JSON values
    (jsonstreamer.go:34-49): an incremental ``raw_decode`` peels
    complete values off the carry buffer; each is landed as one line
    of compact JSON, so the landing files are JSONL regardless of how
    values were whitespace-separated on the wire.

    Files are written to ``<dir>/.tmp-*`` then ``os.rename``d into
    place: the file streaming source lists only completed files, so a
    half-written chunk can never enter a micro-batch.  File names are
    zero-padded sequence numbers — lexicographic order IS arrival
    order.
    """

    def __init__(
        self,
        stream,
        landing_dir: str,
        fmt: str = "line",
        chunk_bytes: int = CHUNK_BYTES,
    ) -> None:
        if fmt not in ("line", "json"):
            raise ValueError(f"fmt must be line|json, got {fmt!r}")
        self._stream = stream
        self._dir = landing_dir
        self._fmt = fmt
        self._chunk = chunk_bytes
        self._seq = 0
        self._carry = ""
        self._decoder = json.JSONDecoder()
        # Incremental UTF-8: a chunk boundary can split a multibyte
        # character (inevitable with fixed-size reads); decoding each
        # chunk independently would mangle both halves into U+FFFD.
        # The incremental decoder carries the partial sequence, the
        # byte-level twin of the partial-record carry.
        self._utf8 = codecs.getincrementaldecoder("utf-8")("replace")
        self.n_records = 0
        self.n_files = 0
        self.done = threading.Event()
        self.error: BaseException | None = None

    # -- record extraction -------------------------------------------------

    def _take_lines(self) -> list[str]:
        """Split the carry at the LAST newline; the tail stays carried
        (linestreamer.go:49-57's partial-record rule)."""
        nl = self._carry.rfind("\n")
        if nl < 0:
            return []
        complete, self._carry = self._carry[:nl], self._carry[nl + 1 :]
        return complete.split("\n")

    def _take_json_values(self, final: bool = False) -> list[str]:
        """Peel complete JSON values off the carry buffer — the
        incremental twin of ``sources.json_source.
        split_concatenated_json`` (jsonstreamer.go:34-49).  A value
        split across chunks simply stays in the carry until its
        closing token arrives.

        Numbers are the one JSON type with no closing token: a bare
        number reaching the END of the buffer may continue in the
        next chunk ("-10" split at "-1"|"0" must not emit -1 and 0),
        so it is deferred until more input arrives — or consumed at
        EOF (``final=True``), where the stream's end terminates it,
        exactly as Go's json.Decoder tokenizes a number.

        The deferral must ALSO fire when the parse stopped mid-buffer
        on a character that can only be a CONTINUATION of the number:
        ``raw_decode`` matches the longest valid prefix, so "0.0"
        split at "0."|"0" yields ``raw_decode("0.") == (0, 1)`` — one
        char short of the buffer end — and consuming that prefix
        would strand ".0" as garbage (hypothesis-found, round 6)."""
        out: list[str] = []
        number_cont = ".eE+-0123456789"
        buf = self._carry.lstrip()
        while buf:
            try:
                value, end = self._decoder.raw_decode(buf)
            except ValueError:
                break  # incomplete (or garbage — surfaced at EOF)
            if (
                not final
                and isinstance(value, (int, float))
                and not isinstance(value, bool)
                and (end == len(buf) or buf[end] in number_cont)
            ):
                break  # possibly-unterminated trailing number
            out.append(json.dumps(value, separators=(",", ":")))
            buf = buf[end:].lstrip()
        self._carry = buf
        return out

    # -- landing -----------------------------------------------------------

    def _land(self, records: list[str]) -> None:
        if not records:
            return
        name = f"part-{self._seq:06d}.txt"
        tmp = os.path.join(self._dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(records) + "\n")
        os.rename(tmp, os.path.join(self._dir, name))
        self._seq += 1
        self.n_records += len(records)
        self.n_files += 1

    # -- main loop ---------------------------------------------------------

    def run(self) -> int:
        """Consume the stream to EOF; returns the record count.

        One landing file per chunk that completed >= 1 record — the
        spool-side flush-on-idle: a short read (interactive pipe going
        quiet) still lands immediately instead of waiting to fill a
        buffer."""
        try:
            return self._run()
        except BaseException as exc:
            # Surface the failure AND unblock drain_and_stop — a dead
            # spool thread that never set `done` would park the drain
            # loop forever (it has no timeout on the CLI path).
            self.error = exc
            raise
        finally:
            self.done.set()

    def _run(self) -> int:
        os.makedirs(self._dir, exist_ok=True)
        take = self._take_lines if self._fmt == "line" else self._take_json_values
        # read1 (BufferedReader, e.g. sys.stdin.buffer) returns as soon
        # as ANY bytes are available; plain read(n) on a buffered pipe
        # BLOCKS until n bytes or EOF, which would stall a quiet log
        # pipe until 64 KiB accumulated and defeat flush-on-idle
        # (basestreamer.go:42-46).  Raw/test streams fall back to read.
        read = getattr(self._stream, "read1", None) or self._stream.read
        while True:
            chunk = read(self._chunk)
            if not chunk:
                break
            if isinstance(chunk, bytes):
                chunk = self._utf8.decode(chunk)
            self._carry += chunk
            self._land(take())
        # EOF: flush any partial UTF-8 sequence (renders U+FFFD, like
        # a truncated pipe would), then the trailing partial line is
        # still a record (linestreamer.go:70-76); trailing partial
        # JSON is an error in strict mode, matching
        # split_concatenated_json.
        self._carry += self._utf8.decode(b"", True)
        if self._fmt == "json":
            # EOF terminates a trailing bare number — take it now
            self._land(self._take_json_values(final=True))
            tail = self._carry.strip()
            if tail:
                raise ValueError(
                    f"trailing non-JSON input at EOF: {tail[:80]!r}"
                )
        elif self._carry:
            # Land whatever trailed — even whitespace-only: dropping
            # empties is the pipeline's F1 filter's call, not ours.
            self._land([self._carry])
        self._carry = ""
        return self.n_records

    def start_thread(self) -> threading.Thread:
        t = threading.Thread(target=self.run, name="stdin-spool", daemon=True)
        t.start()
        return t


def drain_and_stop(
    query,
    spooler: StdinSpooler,
    idle_span_s: float = 3.0,
    poll_s: float = 0.2,
    timeout_s: float | None = None,
    trigger_interval_s: float | None = None,
) -> None:
    """Stop a processingTime streaming query once the spooler hit EOF
    and the query has gone idle — the EOF-drain half of the
    reference's flush-on-idle-or-EOF contract (basestreamer.go:27-46).

    "Idle" = ``query.status['isDataAvailable']`` has stayed False for
    a continuous window AFTER the spooler finished.  (Progress events
    are NOT the signal: an idle stream re-reports the last batchId,
    so waiting for a fresh zero-row batch id spins forever.)  The
    window is stretched to cover at least two trigger intervals so
    the source is guaranteed a listing pass over the final landed
    files before the query stops.
    """
    if trigger_interval_s:
        idle_span_s = max(idle_span_s, 2.5 * trigger_interval_s)
    deadline = time.monotonic() + timeout_s if timeout_s else None
    idle_since: float | None = None
    while True:
        if not query.isActive:
            # The query died (sink failure, bad checkpoint) or was
            # stopped externally — exit immediately instead of
            # spinning on a corpse (the CLI path passes no timeout).
            # awaitTermination below re-raises its exception.
            break
        now = time.monotonic()
        if deadline and now > deadline:
            break
        if spooler.done.is_set() and query.lastProgress is not None:
            if query.status["isDataAvailable"]:
                idle_since = None
            elif idle_since is None:
                idle_since = now
            elif now - idle_since >= idle_span_s:
                break
        time.sleep(poll_s)
    exc = query.exception()
    query.stop()
    query.awaitTermination()
    if exc is not None:
        raise exc


def parse_trigger_seconds(trigger: str) -> float:
    """Best-effort parse of a Spark processingTime string ('500
    milliseconds', '2 seconds', '1 minute') into seconds, for sizing
    the idle-drain window; unknown shapes fall back to 1s."""
    parts = trigger.strip().lower().split()
    try:
        value = float(parts[0])
        unit = parts[1] if len(parts) > 1 else "seconds"
    except (ValueError, IndexError):
        return 1.0
    for prefix, scale in (
        ("milli", 0.001),
        ("micro", 0.000001),
        ("second", 1.0),
        ("minute", 60.0),
        ("hour", 3600.0),
    ):
        if unit.startswith(prefix):
            return value * scale
    return 1.0
