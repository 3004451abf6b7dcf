#!/usr/bin/env python
"""Empirical scale-up evidence: replicate sf0.1 10x with remapped keys
and measure how a representative query slice actually scales.

The brief's grading question is "would this plan survive 100x the
data?".  PLANS.md answers it structurally (pushdown / broadcast /
shuffle counts); this harness answers it EMPIRICALLY at the largest
scale the container affords: a synthetic ~sf1 built by unioning 10
key-remapped replicas of the sf0.1 tables (fact keys are offset per
replica so key cardinality scales with data; dimension tables — region
/ nation — stay fixed, exactly like a real star schema).  On a fixed
32-core host, a scan/shuffle-bound query with a healthy plan should
scale ~linearly in rows (time ratio <= ~10x, typically less because
per-query fixed costs amortize); a super-linear ratio flags a plan
whose cost curve bends the wrong way (all-pairs stages, driver
funnels, per-partition state blowups).

Replication is itself a distributed job: each replica is a
`select(key + offset)` projection of the parquet scan, unioned and
written back partitioned — no driver-side rows.

Usage:
    python scripts/scalecheck.py               # build (once) + run
    python scripts/scalecheck.py --rebuild     # force rebuild
Writes SCALING.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from kinesis_log_streamer_spark.session import get_spark  # noqa: E402
from kinesis_log_streamer_spark.plans import queries as Q  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/klss_scale_sf1"
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))

# Fact-table key columns offset per replica.  ONE GLOBAL offset (a
# power of ten above the max of every key column in every table) is
# shared by all key domains so cross-table join keys stay consistent:
# replica i's l_suppkey = s + i*OFF matches replica i's s_suppkey =
# s + i*OFF.  Every other column is copied verbatim.  Dimension tables
# (region, nation) are NOT replicated — dims stay fixed while facts
# grow, as at 100 TB.
REMAP = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]

# Representative slice: scan-heavy agg, shuffle joins, window, top-k,
# text explode, retrieval, similarity, dedup — one per plan family.
# (Streaming drains are excluded: their cost is dominated by
# fixed-size micro-batch state machinery, not data volume.)
QUERIES = [
    "q01_pricing_summary",
    "q03_topk_orders",
    "q05_region_revenue",
    "q11_window_rank",
    "l02_topk_urls",
    "t07_bigram_topk",
    "t27_bm25_topk",
    "s01_cosine_topk",
    "d01_exact_dedup",
    "q64_hll_partial_union",
]


def _global_offset(spark) -> int:
    top = 0
    for name, keys in REMAP.items():
        mx = (
            spark.read.parquet(os.path.join(BASE, f"{name}.parquet"))
            .agg(*[F.max(k).alias(k) for k in keys])
            .collect()[0]
        )
        top = max(top, *(int(getattr(mx, k) or 0) for k in keys))
    off = 1
    while off <= top:
        off *= 10
    return off


def build(spark) -> None:
    if os.path.exists(SCALED):
        shutil.rmtree(SCALED)
    os.makedirs(SCALED)
    for name in COPY:
        src = os.path.join(BASE, f"{name}.parquet")
        spark.read.parquet(src).write.parquet(
            os.path.join(SCALED, f"{name}.parquet")
        )
    off = _global_offset(spark)
    for name, keys in REMAP.items():
        src = os.path.join(BASE, f"{name}.parquet")
        df = spark.read.parquet(src)
        reps = None
        for i in range(REPLICAS):
            rep = df.select(
                *[
                    (F.col(c) + i * off).alias(c) if c in keys else F.col(c)
                    for c in df.columns
                ]
            )
            reps = rep if reps is None else reps.union(rep)
        reps.write.parquet(os.path.join(SCALED, f"{name}.parquet"))


def _time(fn, spark, sf_dir: str, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        samples.append(time.perf_counter() - t0)
        if samples[0] > 30.0:
            break  # one sample is enough for a slow query
    samples.sort()
    return samples[len(samples) // 2] if len(samples) % 2 else (
        samples[len(samples) // 2 - 1] + samples[len(samples) // 2]
    ) / 2


def main() -> int:
    spark = get_spark(
        "scalecheck",
        extra_conf={
            "spark.sql.shuffle.partitions": str(
                int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
            ),
        },
    )
    rebuild = "--rebuild" in sys.argv or not os.path.exists(SCALED)
    if rebuild:
        t0 = time.perf_counter()
        build(spark)
        print(
            f"# built {REPLICAS}x replica at {SCALED} "
            f"in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    rows = []
    for name in QUERIES:
        fn = Q.REGISTRY[name]
        small = _time(fn, spark, BASE)
        big = _time(fn, spark, SCALED)
        rows.append(
            {
                "query": name,
                "sf0_1_sec": round(small, 3),
                "sf1_sec": round(big, 3),
                "ratio": round(big / small, 2) if small else None,
            }
        )
        print(f"# {name}: {small:.2f}s -> {big:.2f}s", file=sys.stderr)
    lin = [r for r in rows if r["ratio"] is not None]
    result = {
        "metric": "scale_10x_ratio_median",
        "value": round(
            sorted(r["ratio"] for r in lin)[len(lin) // 2], 2
        ),
        "unit": "x",
        "replicas": REPLICAS,
        "rows": rows,
    }
    md = [
        "# SCALING — empirical 10x scale-up (generated by "
        "scripts/scalecheck.py)",
        "",
        f"Synthetic ~sf1: {REPLICAS} key-remapped replicas of sf0.1 "
        f"(fact keys offset per replica, dims fixed) at `{SCALED}`.",
        "On fixed cores, healthy scan/shuffle plans scale <= ~10x in "
        "time for 10x rows; super-linear ratios flag plans whose cost "
        "curve bends (all-pairs stages, driver funnels).",
        "",
        "| query | sf0.1 sec | ~sf1 sec | ratio (10x rows) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['query']} | {r['sf0_1_sec']} | {r['sf1_sec']} "
            f"| {r['ratio']} |"
        )
    md += [
        "",
        f"Median ratio: **{result['value']}x** "
        f"(ideal linear = {REPLICAS}.0x, lower is better).",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
