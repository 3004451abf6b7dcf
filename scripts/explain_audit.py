#!/usr/bin/env python
"""Physical-plan audit: verify every registered query compiles to the
plan you'd want at 100 TB.

For each query in the registry, inspects the executed plan string for:

* ``pushed``   — at least one parquet scan with non-empty PushedFilters
                 (predicate pushdown reached the source) — only
                 meaningful for queries that filter base tables
* ``pruned``   — every FileScan reads a proper column subset
                 (ReadSchema narrower than the table)
* ``bhj``      — BroadcastHashJoin present (for queries joining a
                 small dimension)
* ``exchanges``— number of Exchange (shuffle) operators; flags
                 regressions when a rewrite silently adds a shuffle

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
Writes PLANS.md at the repo root when run with no query filter.
"""

from __future__ import annotations

import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from kinesis_log_streamer_spark.plans import queries as Q  # noqa: E402
from kinesis_log_streamer_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    scans = re.findall(r"FileScan parquet.*", plan)
    pushed = sum(
        1
        for s in scans
        if "PushedFilters: [" in s and "PushedFilters: []" not in s
    )
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": len(scans),
        "scans_with_pushdown": pushed,
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange "),
        "avg_read_cols": (
            round(sum(s.count(":") for s in read_schemas) / len(read_schemas), 1)
            if read_schemas
            else 0
        ),
    }


def _docs(spark, sf_dir):
    from kinesis_log_streamer_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _leg_d02(spark, sf_dir):
    from kinesis_log_streamer_spark.operators import dedup as D

    return D.minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.3)


def _leg_d03(spark, sf_dir):
    from kinesis_log_streamer_spark.operators import dedup as D

    return D.simhash_pairs(_docs(spark, sf_dir), max_hamming=12)


def _leg_st18(spark, sf_dir):
    from pyspark.sql import functions as F

    from kinesis_log_streamer_spark.streaming.pipeline import (
        read_events_stream,
    )

    return (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_id") % 3 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Temp dirs created by audit legs/drains, removed at process exit
# (ADVICE r9 low #3: repeated audits accumulated mkdtemp litter).
_TMPDIRS: list = []


def _tmpdir(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _TMPDIRS:
        atexit.register(
            lambda: [shutil.rmtree(t, ignore_errors=True) for t in _TMPDIRS]
        )
    _TMPDIRS.append(d)
    return d


def _leg_st19(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from kinesis_log_streamer_spark.sources.tables import load_table
    from kinesis_log_streamer_spark.streaming.stateful import (
        running_totals_with_state_ttl,
    )

    indir = os.path.join(_tmpdir("klss-audit-st19-"), "in")
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 13 == 0
    ).select(
        (F.col("user_id") % 30).cast("int").alias("key"),
        (F.col("event_id") % 2).cast("int").alias("phase"),
        "value",
    ).coalesce(1).write.parquet(indir)
    stream = (
        spark.readStream.schema("key int, phase int, value double")
        .format("parquet")
        .load(indir)
    )
    return running_totals_with_state_ttl(stream, 3_600_000)


# Production-leg sub-rows (VERDICT r8 #6): the d02/d03/st18/st19 QUERY
# wrappers return eagerly-collected gate rows (LocalTableScan — their
# registry rows are legitimately all-zero), so the audit table was
# blind to the plans that actually carry the cost.  These builders
# return the underlying production pipelines lazily; batch legs audit
# like any registry query, streaming legs drain once (availableNow,
# memory sink, throwaway checkpoint) and audit the executed
# micro-batch plan from StreamingQuery.explainInternal.
PRODUCTION_LEGS: dict[str, tuple] = {
    "d02_minhash_pairs/lsh_pipeline": ("batch", _leg_d02),
    "d03_simhash_pairs/chunk_join": ("batch", _leg_d03),
    "st18_rocksdb_statestore/drain": ("stream", _leg_st18),
    "st19_state_ttl_totals/drain": ("stream", _leg_st19),
}


def stream_plan(spark, sdf, mode: str) -> str:
    """Drain a streaming DataFrame once (availableNow) into a memory
    sink and return the executed micro-batch physical plan."""
    import uuid

    name = "audit_" + uuid.uuid4().hex[:8]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option(
            "checkpointLocation",
            _tmpdir("klss-audit-ckpt-"),
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(600):
            raise RuntimeError("audit drain timed out")
        return q._jsq.explainInternal(False)
    finally:
        q.stop()
        spark.catalog.dropTempView(name)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(Q.REGISTRY)
    spark = get_spark()
    lines = [
        "# PLANS — physical-plan audit (generated by scripts/explain_audit.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Columns: parquet scans / scans with",
        "pushed filters / broadcast-hash joins / sort-merge joins /",
        "broadcast-nested-loop joins / shuffle exchanges / avg columns read per scan.",
        "",
        "All-zero rows are EAGER queries (streaming drains, conf-window",
        "gates, d02/d03's eager gate rows): their real pipelines execute",
        "inside the function and the returned DataFrame is a",
        "LocalTableScan of the collected result.  For d02/d03/st18/st19",
        "an indented `↳` sub-row audits the PRODUCTION-leg pipeline",
        "itself (VERDICT r8 #6): batch legs via executedPlan, streaming",
        "legs via the drained micro-batch explainInternal.  Remaining",
        "all-zero rows: audit via the underlying operators",
        "(operators/*, PLANS cost notes), not this table.",
        "",
        "| query | scans | pushdown | BHJ | SMJ | BNLJ | shuffles | avg cols |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in names:
        try:
            df = Q.REGISTRY[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            a = audit_plan(plan)
            row = (
                f"| {name} | {a['scans']} | {a['scans_with_pushdown']} | "
                f"{a['bhj']} | {a['smj']} | {a['bnlj']} | {a['exchanges']} | "
                f"{a['avg_read_cols']} |"
            )
        except Exception as exc:  # pragma: no cover
            row = f"| {name} | ERROR: {exc} |"
        print(row)
        lines.append(row)
        for leg, (kind, builder) in PRODUCTION_LEGS.items():
            if not leg.startswith(name + "/"):
                continue
            try:
                if kind == "batch":
                    ldf = builder(spark, sf_dir)
                    lplan = ldf._jdf.queryExecution().executedPlan().toString()
                else:
                    lplan = stream_plan(
                        spark, builder(spark, sf_dir), "update"
                    )
                a = audit_plan(lplan)
                lrow = (
                    f"| &nbsp;&nbsp;↳ {leg.split('/', 1)[1]} | {a['scans']} | "
                    f"{a['scans_with_pushdown']} | {a['bhj']} | {a['smj']} | "
                    f"{a['bnlj']} | {a['exchanges']} | {a['avg_read_cols']} |"
                )
            except Exception as exc:  # pragma: no cover
                lrow = f"| &nbsp;&nbsp;↳ {leg.split('/', 1)[1]} | ERROR: {exc} |"
            print(lrow)
            lines.append(lrow)
    if len(sys.argv) <= 2:
        path = os.path.join(_REPO, "PLANS.md")
        # Preserve hand-written cost-note sections (## ...) appended
        # below the generated table — a full regen must not drop them.
        notes = ""
        try:
            with open(path) as fh:
                old = fh.read()
            idx = old.find("\n## ")
            if idx != -1:
                notes = old[idx:]
        except OSError:
            pass
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n" + notes)
        print("wrote PLANS.md")


if __name__ == "__main__":
    main()
