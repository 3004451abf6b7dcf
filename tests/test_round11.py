"""Round-11 queries: l20/l21 ingest→analytics compositions, w08
leak-safe split, p10 compaction planner.

Each test recomputes the query's contract INDEPENDENTLY (pure
python / pandas / hashlib) from the sf0.001 parquet and compares
against the registered Spark plan — the same third-implementation
discipline as tests/test_round10.py, so a shared misreading of the
spec can't pass both the Spark leg and its DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd

from kinesis_log_streamer_spark.plans import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def _pq(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/{name}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class TestIngestRollupPipeline:
    def _expected(self) -> list[tuple]:
        ev = _pq("events")
        ev = ev[ev["event_id"] % 7 == 0]
        agg = defaultdict(lambda: [0, 0, 0])  # n, bytes, us_sum
        for r in ev.itertuples():
            eid = int(r.event_id)
            m = eid % 10
            status = (
                200 if m <= 5 else 301 if m == 6 else 404 if m == 7
                else 500 if m == 8 else 503
            )
            cls = f"{status // 100}xx"
            a = agg[cls]
            a[0] += 1
            a[1] += (eid * 37) % 10000
            a[2] += (eid * 101) % 500000
        out = []
        for cls in sorted(agg):
            n, b, us = agg[cls]
            out.append(
                (cls, "piped", "HTTPAccessLog", n, b, round(us / n, 1))
            )
        return out

    def test_matches_python_recompute(self, spark):
        got = [
            (
                r.status_class,
                r.handler,
                r.log_file,
                r.n_requests,
                r.bytes_sent,
                r.avg_us,
            )
            for r in Q.l20_ingest_rollup_pipeline(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()


class TestErrorlogPipeline:
    def _expected(self) -> list[tuple]:
        ev = _pq("events")
        ev = ev[(ev["event_id"] % 5 == 0) & (ev["event_id"] % 11 != 0)]
        agg = {}
        for r in ev.itertuples():
            eid = int(r.event_id)
            lvl = {0: "error", 1: "warn", 2: "notice", 3: "crit"}[eid % 4]
            octet = int(r.user_id) % 256
            a = agg.setdefault(lvl, [0, set(), None, None])
            a[0] += 1
            a[1].add(octet)
            a[2] = eid if a[2] is None else min(a[2], eid)
            a[3] = eid if a[3] is None else max(a[3], eid)
        return [
            (lvl, "HTTPErrorLog", a[0], len(a[1]), a[2], a[3])
            for lvl, a in sorted(agg.items())
        ]

    def test_matches_python_recompute(self, spark):
        got = [
            (
                r.level,
                r.log_file,
                r.n_lines,
                r.n_clients,
                r.first_err,
                r.last_err,
            )
            for r in Q.l21_errorlog_pipeline(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_blank_lines_are_dropped(self, spark):
        # the event_id % 11 cohort renders blank and must NOT appear:
        # total kept lines == |%5 cohort| - |%5 ∩ %11 cohort|.
        ev = _pq("events")
        n5 = int((ev["event_id"] % 5 == 0).sum())
        n55 = int(
            ((ev["event_id"] % 5 == 0) & (ev["event_id"] % 11 == 0)).sum()
        )
        rows = Q.l21_errorlog_pipeline(spark, SF_SMOKE).collect()
        assert sum(r.n_lines for r in rows) == n5 - n55


class TestLeakSafeSplit:
    def _assign(self) -> dict[int, str]:
        docs = _pq("documents")
        keeper: dict[str, int] = {}
        fps = {}
        for r in docs.itertuples():
            fp = _md5(r.text)
            fps[int(r.doc_id)] = fp
            keeper[fp] = min(keeper.get(fp, int(r.doc_id)), int(r.doc_id))
        return {
            did: (
                "train"
                if _md5(f"split:{keeper[fp]}")[:2] < "cc"
                else "val"
            )
            for did, fp in fps.items()
        }

    def test_counts_match_hashlib_recompute(self, spark):
        asg = self._assign()
        row = Q.w08_leak_safe_split(spark, SF_SMOKE).collect()[0]
        n_train = sum(1 for s in asg.values() if s == "train")
        assert row.n_docs == len(asg)
        assert row.n_train == n_train
        assert row.n_val == len(asg) - n_train
        assert row.train_pm == n_train * 1000 // len(asg)

    def test_invariants(self, spark):
        row = Q.w08_leak_safe_split(spark, SF_SMOKE).collect()[0]
        # exact-dup groups can never straddle by construction
        assert row.exact_leak == 0
        assert row.n_train + row.n_val == row.n_docs
        # near-dup telemetry is bounded by its truth set
        assert 0 <= row.cohort_leak <= row.n_true_pairs
        # the hash split should land in a sane band around 80 %
        assert 600 <= row.train_pm <= 950

    def test_exact_dups_co_assigned(self, spark):
        # every duplicated text's members share one split by the
        # keeper rule — recomputed here directly.
        docs = _pq("documents")
        asg = self._assign()
        by_fp = defaultdict(set)
        for r in docs.itertuples():
            by_fp[_md5(r.text)].add(asg[int(r.doc_id)])
        assert all(len(s) == 1 for s in by_fp.values())


class TestLiveSpoolStream:
    def test_matches_python_recompute(self, spark):
        ev = _pq("events")
        ev = ev[ev["event_id"] % 9 == 0]
        exp = []
        for et, g in ev.groupby("event_type"):
            exp.append(
                (
                    str(et),
                    len(g),
                    int(g["event_id"].min()),
                    int(g["event_id"].max()),
                    round(float(g["value"].sum()), 2),
                )
            )
        exp.sort()
        got = [
            (r.event_type, r.n_records, r.min_id, r.max_id, r.sum_value)
            for r in Q.i08_live_spool_stream(spark, SF_SMOKE).collect()
        ]
        assert got == exp


class TestPointInTimeMatrix:
    def test_no_future_leakage_and_staleness_rule(self, spark):
        rows = Q.w09_point_in_time_matrix(spark, SF_SMOKE).collect()
        assert rows, "matrix must not be empty"
        for r in rows:
            # backward as-of can never match a future feature
            assert r.leak_viol == 0
            # the staleness rule: f1 present iff a match exists
            # within 90 days
            if r.f1 is not None:
                assert r.f1_age_days is not None
                assert 0 <= r.f1_age_days <= 90
            if r.f1_age_days is not None and r.f1_age_days > 90:
                assert r.f1 is None

    def test_f1_matches_pandas_asof(self, spark):
        ev = _pq("events")
        od = _pq("orders")
        ev = ev[ev["event_id"] % 3 == 0]
        f1 = (
            od.groupby(["o_custkey", "o_orderdate"])["o_totalprice"]
            .max()
            .round(2)
            .reset_index()
        )
        got = {
            r.event_id: (r.f1, r.f1_age_days)
            for r in Q.w09_point_in_time_matrix(spark, SF_SMOKE).collect()
        }
        for r in ev.itertuples():
            cand = f1[
                (f1["o_custkey"] == r.user_id)
                & (f1["o_orderdate"] <= r.ts)
            ]
            eid = int(r.event_id)
            if cand.empty:
                assert got[eid] == (None, None)
                continue
            best = cand.loc[cand["o_orderdate"].idxmax()]
            age = (
                r.ts.normalize() - best["o_orderdate"].normalize()
            ).days
            exp_f1 = float(best["o_totalprice"]) if age <= 90 else None
            assert got[eid][1] == age
            assert (got[eid][0] is None) == (exp_f1 is None)
            if exp_f1 is not None:
                assert abs(got[eid][0] - exp_f1) < 1e-9


class TestShardBalance:
    def test_host_mode_hot_shards_per_user_spreads(self, spark):
        rows = Q.k06_shard_balance(spark, SF_SMOKE).collect()
        host = [r for r in rows if r.mode == "host"]
        per = [r for r in rows if r.mode == "per_user"]
        # the reference's single host key routes EVERYTHING to one
        # shard — the diagnosis the query exists to surface.
        assert len(host) == 1
        assert host[0].share_pm == 1000
        assert host[0].hottest_pm == 1000
        # per-user keys spread across shards; with 8 hash ranges the
        # hottest shard should carry well under half the stream.
        assert len(per) >= 4
        assert per[0].hottest_pm < 500
        assert sum(r.n_records for r in per) == sum(
            r.n_records for r in host
        )

    def test_matches_hashlib_recompute(self, spark):
        ev = _pq("events")
        shards = defaultdict(int)
        for uid in ev["user_id"]:
            nib = _md5(str(int(uid)))[0]
            shards["0123456789abcdef".index(nib) // 2] += 1
        got = {
            r.shard_no: r.n_records
            for r in Q.k06_shard_balance(spark, SF_SMOKE).collect()
            if r.mode == "per_user"
        }
        assert got == dict(shards)


class TestJoinSizePreflight:
    def test_formula_matches_and_verifies(self, spark):
        rows = Q.p11_join_size_preflight(spark, SF_SMOKE).collect()
        assert len(rows) == 3
        # the sum-product formula is EXACT: every pair must verify
        for r in rows:
            assert r.match == 1
            assert r.est_rows == r.actual_rows
            assert 0 < r.top_key_share_pm <= 1_000_000
        # independent recompute of one pair in pandas
        ev = _pq("events")
        cnt = ev.groupby("user_id").size()
        est = int((cnt * cnt).sum())
        got = {r.pair: r for r in rows}["events*events"]
        assert got.est_rows == est
        assert got.n_common_keys == len(cnt)


class TestCompactionPlan:
    TARGET = 32 * 1024 * 1024

    def _expected(self) -> list[tuple]:
        ev = _pq("events")
        inv = [
            (
                str(r.event_type),
                int(r.event_id),
                (int(r.event_id) * 7919) % 262144 + 1024,
            )
            for r in ev.itertuples()
        ]
        groups = defaultdict(lambda: [0, 0, None, None])
        by_dir = defaultdict(list)
        for d, fid, sz in inv:
            by_dir[d].append((sz, fid))
        for d, files in by_dir.items():
            files.sort(key=lambda t: (-t[0], t[1]))
            cum = 0
            for sz, fid in files:
                g = cum // self.TARGET
                cum += sz
                a = groups[(d, g)]
                a[0] += 1
                a[1] += sz
                a[2] = sz if a[2] is None else max(a[2], sz)
                a[3] = sz if a[3] is None else min(a[3], sz)
        return [
            (d, g, a[0], a[1], a[2], a[3])
            for (d, g), a in sorted(groups.items())
        ]

    def test_matches_python_recompute(self, spark):
        got = [
            (
                r.dir,
                r.group_no,
                r.n_files,
                r.group_bytes,
                r.largest,
                r.smallest,
            )
            for r in Q.p10_compaction_plan(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_groups_fill_near_target(self, spark):
        # fill bounds of the running-fill rule (max file size is
        # 262143 + 1024 = 263167): every group holds < target + max
        # bytes, and every NON-last group holds > target - max bytes
        # — i.e. each planned output object lands within one file of
        # the 32 MiB target.
        max_sz = 263167
        rows = Q.p10_compaction_plan(spark, SF_SMOKE).collect()
        last_group = {}
        for r in rows:
            last_group[r.dir] = max(last_group.get(r.dir, -1), r.group_no)
        for r in rows:
            assert r.group_bytes < self.TARGET + max_sz
            if r.group_no != last_group[r.dir]:
                assert r.group_bytes > self.TARGET - max_sz
