"""CLI mirroring the reference's option surface (C1-C3, main.go:62-171).

Same flags, same validation, same exit codes:

* ``-f/--format {line,json}``       input format (default line)
* ``-F/--output-format {auto,json,string}`` (default auto; auto→json
  for json input, →string for line input — C2, main.go:93-99)
* ``-k/--output-key KEY``           wrap key (default LogEntry)
* ``-I/--add-entry K=V``            repeatable static entries; ``=``
  required, duplicate keys rejected (main.go:103-122)
* ``-r/--region`` / ``-p/--profile`` AWS session config (C3)
* exactly one positional stream name (main.go:124-136)
* usage errors → exit 2 with usage on stderr (main.go:22-55)

Data path: stdin → line/JSON records → transform/enrich → partition-key
stamp → Kinesis sink (or ``--dry-run`` → records to stdout).
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Sequence

from kinesis_log_streamer_spark.hostid import get_host_id


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kinesis-log-streamer-spark",
        description="Stream log entries from stdin to Kinesis via Spark.",
    )
    p.add_argument("-f", "--format", choices=["line", "json"], default="line")
    p.add_argument(
        "-F",
        "--output-format",
        choices=["auto", "json", "string"],
        default="auto",
    )
    p.add_argument("-k", "--output-key", default="LogEntry")
    p.add_argument(
        "-I",
        "--add-entry",
        action="append",
        default=[],
        metavar="KEY=VALUE",
    )
    p.add_argument("-r", "--region", default=None)
    p.add_argument("-p", "--profile", default=None)
    p.add_argument("--dry-run", action="store_true", help="print records instead of Kinesis")
    p.add_argument(
        "--delivery",
        choices=["at_least_once", "at_most_once"],
        default="at_least_once",
        help=(
            "delivery guarantee: at_least_once retries failed records "
            "(engine default); at_most_once is strict reference parity "
            "— one PutRecords call, no retry, log-and-drop "
            "(basestreamer.go:64-87)"
        ),
    )
    p.add_argument("stream_name", nargs="*")
    return p


def parse_entries(pairs: list[str], parser: argparse.ArgumentParser) -> dict[str, str]:
    """--add-entry validation: '=' required, duplicate keys rejected
    (main.go:103-122)."""
    entries: dict[str, str] = {}
    for pair in pairs:
        if "=" not in pair:
            parser.exit(2, f"invalid --add-entry (missing '='): {pair}\n")
        k, v = pair.split("=", 1)
        if k in entries:
            parser.exit(2, f"duplicate --add-entry key: {k}\n")
        entries[k] = v
    return entries


def resolve_output_format(fmt: str, output_format: str) -> str:
    """C2: auto → json for json input, string for line input
    (main.go:93-99)."""
    if output_format != "auto":
        return output_format
    return "json" if fmt == "json" else "string"


def main(argv: Sequence[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if len(args.stream_name) != 1:
        parser.print_usage(sys.stderr)
        return 2
    entries = parse_entries(args.add_entry, parser)
    output_format = resolve_output_format(args.format, args.output_format)

    from kinesis_log_streamer_spark.session import get_spark
    from kinesis_log_streamer_spark.sources.json_source import (
        split_concatenated_json,
    )
    from kinesis_log_streamer_spark.sources.lines import lines_from_stdin
    from kinesis_log_streamer_spark.streaming.pipeline import (
        build_json_pipeline,
        build_line_pipeline,
    )

    spark = get_spark("kinesis-log-streamer-cli")
    stdin_data = sys.stdin.read()
    host_id = get_host_id(probe_network=not args.dry_run)

    if args.format == "json":
        values = split_concatenated_json(stdin_data, strict=True)
        df = spark.createDataFrame([(v,) for v in values], "value string")
        records = build_json_pipeline(df, entries, host_id)
    else:
        df = lines_from_stdin(spark, stdin_data)
        records = build_line_pipeline(
            df, output_format, args.output_key, entries, host_id
        )

    if args.dry_run:
        for row in records.collect():
            print(f"{row['partitionKey']}\t{row['data']}")
        return 0

    from kinesis_log_streamer_spark.streaming.kinesis_sink import KinesisSink

    sink = KinesisSink(
        args.stream_name[0],
        region=args.region,
        profile=args.profile,
        delivery=args.delivery,
    )
    sink.write_batch(records, epoch_id=0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
