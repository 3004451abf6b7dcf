"""Round-10 queries: s20 MaxSim late-interaction rerank, d23
exact-substring removal telemetry, p09 join-key skew profile,
s21 IVF->MaxSim serving path, l19 log template mining.

Each test recomputes the query's contract INDEPENDENTLY (numpy /
pure-python / pandas) from the sf0.001 parquet and compares against
the registered Spark plan — the same discipline the DuckDB oracle
gate applies at sf0.01, but with a third implementation so a shared
misreading of the spec can't pass both sides.
"""

from __future__ import annotations

import decimal
import re
from collections import Counter

import numpy as np
import pandas as pd


def _half_up(x: float, digits: int = 0):
    """Round half-away-from-zero, matching Spark F.round / DuckDB
    round (ADVICE r10 low #2: built-in round() is banker's
    half-to-even — a dot*10000 landing exactly on .5 would make this
    'independent third implementation' disagree spuriously).
    Decimal(repr(x)) mirrors BigDecimal.valueOf's shortest-repr path."""
    q = decimal.Decimal(1).scaleb(-digits)
    r = decimal.Decimal(repr(x)).quantize(
        q, rounding=decimal.ROUND_HALF_UP
    )
    return int(r) if digits == 0 else float(r)

from kinesis_log_streamer_spark.plans import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def _pq(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/{name}.parquet")


class TestMaxSim:
    def _expected(self) -> list[tuple]:
        emb = _pq("embeddings")
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }

        def toks(v):
            return [v[j * 16 : (j + 1) * 16] for j in range(4)]

        out = []
        for qid in sorted(v for v in vecs if v < 5):
            scores = []
            qt = toks(vecs[qid])
            for did, dv in vecs.items():
                if did == qid:
                    continue
                dt = toks(dv)
                s = sum(
                    max(
                        _half_up(float(np.dot(q, d)) * 10000)
                        for d in dt
                    )
                    for q in qt
                )
                scores.append((did, s))
            scores.sort(key=lambda t: (-t[1], t[0]))
            for rnk, (did, s) in enumerate(scores[:5], start=1):
                out.append((qid, did, s, rnk))
        return out

    def test_matches_numpy_recompute(self, spark):
        got = [
            (r.qid, r.vec_id, r.score, r.rnk)
            for r in Q.s20_maxsim_topk(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_late_interaction_diverges_from_mips(self, spark):
        # MaxSim is only worth its own operator if its ranking
        # genuinely differs from whole-vector inner product on the
        # same corpus: assert at least one query's top-5 SET differs
        # from s18's MIPS top-5 (qid<5 on both).
        mips = {}
        for r in Q.s18_mips_topk(spark, SF_SMOKE).collect():
            mips.setdefault(r.qid, set()).add(r.vec_id)
        ms = {}
        for r in Q.s20_maxsim_topk(spark, SF_SMOKE).collect():
            ms.setdefault(r.qid, set()).add(r.vec_id)
        assert mips.keys() == ms.keys()
        assert any(mips[q] != ms[q] for q in mips)


class TestDupSpanRemoval:
    W = 8

    def _expected(self) -> list[tuple]:
        docs = _pq("documents")
        toked = {}
        for r in docs.itertuples():
            # ASCII whitespace only (ADVICE r10 low #3): Spark trim
            # strips ' ' and Java-regex \s is [ \t\n\x0B\f\r]; Python
            # str \s/strip() are Unicode-wide and would desync this
            # recompute from BOTH engines on e.g. \xa0.
            t = re.split(r"[ \t\n\x0B\f\r]+", r.text.strip(" ").lower())
            if len(t) >= self.W:
                toked[int(r.doc_id)] = t
        spans = Counter()
        for t in toked.values():
            for s in range(len(t) - self.W + 1):
                spans[" ".join(t[s : s + self.W])] += 1
        out = []
        for doc_id in sorted(toked):
            t = toked[doc_id]
            covered = set()
            for s in range(len(t) - self.W + 1):
                if spans[" ".join(t[s : s + self.W])] >= 2:
                    covered.update(range(s + 1, s + self.W + 1))
            n_spans = sum(
                1 for p in covered if p - 1 not in covered
            )
            out.append(
                (
                    doc_id,
                    len(t),
                    len(covered),
                    len(t) - len(covered),
                    n_spans,
                )
            )
        return out

    def test_matches_python_recompute(self, spark):
        got = [
            (r.doc_id, r.n_toks, r.n_removed, r.n_kept, r.n_spans)
            for r in Q.d23_dup_span_removal(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_corpus_has_duplicated_spans(self, spark):
        # the synthetic corpus carries replica documents by design;
        # the removal pass must find real work or the query proves
        # nothing.
        rows = Q.d23_dup_span_removal(spark, SF_SMOKE).collect()
        assert any(r.n_removed > 0 for r in rows)
        # invariant: removed + kept == total, spans <= removed
        for r in rows:
            assert r.n_removed + r.n_kept == r.n_toks
            assert r.n_spans <= r.n_removed
            assert (r.n_spans == 0) == (r.n_removed == 0)


class TestJoinSkewProfile:
    def _profile(self, series: pd.Series, label: str) -> tuple:
        cnts = sorted(
            Counter(series.astype(str)).items(),
            key=lambda kv: (kv[1], kv[0]),
        )
        vals = [c for _, c in cnts]
        n_rows, n_keys = sum(vals), len(vals)
        # value at ordered position ceil(0.99 * n_keys), 1-based
        pos = -(-99 * n_keys // 100)
        p99 = vals[pos - 1]
        mx = max(vals)
        return (
            label,
            n_rows,
            n_keys,
            mx,
            p99,
            n_rows * 1000 // n_keys,
            mx * 1000000 // n_rows,
            mx * 1000 * n_keys // n_rows,
        )

    def test_matches_pandas_recompute(self, spark):
        exp = sorted(
            [
                self._profile(
                    _pq("events")["event_type"], "events.event_type"
                ),
                self._profile(
                    _pq("lineitem")["l_orderkey"], "lineitem.l_orderkey"
                ),
                self._profile(
                    _pq("orders")["o_custkey"], "orders.o_custkey"
                ),
            ]
        )
        got = [
            (
                r.key_name,
                r.n_rows,
                r.n_keys,
                r.max_per_key,
                r.p99_per_key,
                r.avg_pm,
                r.top1_share_pm,
                r.skew_x_pm,
            )
            for r in Q.p09_join_skew_profile(spark, SF_SMOKE).collect()
        ]
        assert got == exp

    def test_low_cardinality_key_reads_as_skew_candidate(self, spark):
        rows = {
            r.key_name: r
            for r in Q.p09_join_skew_profile(spark, SF_SMOKE).collect()
        }
        ev = rows["events.event_type"]
        li = rows["lineitem.l_orderkey"]
        # a handful of event types over 1000 rows concentrates far
        # more per key than an orderkey join side does
        assert ev.max_per_key > li.max_per_key
        assert ev.top1_share_pm > li.top1_share_pm
        # sanity: p99 between 0 and max, avg consistent
        for r in rows.values():
            assert 0 < r.p99_per_key <= r.max_per_key
            assert r.skew_x_pm >= 990  # max >= mean (integer floor)

    def test_degenerate_histogram_stays_exact(self, spark):
        # VERDICT r10 #6: a rank-like key where EVERY key has a
        # DISTINCT per-key count (key i appears i times, i=1..120)
        # degenerates the count histogram to one row per key.  The
        # two-level log2-bucketed prefix sum must still return the
        # EXACT p99 (value at 1-based ordered position ceil(0.99*k))
        # instead of funneling n_keys rows through one partition.
        n = 120
        df = spark.range(1, n + 1).selectExpr(
            "explode(sequence(1, id)) as dummy", "id as key"
        )
        row = Q._skew_profile(df, "key", "degenerate").collect()[0]
        assert row.n_keys == n
        assert row.n_rows == n * (n + 1) // 2
        assert row.max_per_key == n
        pos = -(-99 * n // 100)  # ceil
        assert row.p99_per_key == pos  # counts are exactly 1..n


class TestIvfMaxSimRerank:
    def _expected(self) -> list[tuple]:
        emb = _pq("embeddings").sort_values("vec_id")
        ids = emb["vec_id"].astype(int).tolist()
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }
        cents = [vecs[i] for i in sorted(ids)[:16]]

        def best_cells(v, n):
            scored = sorted(
                (
                    (-_half_up(self._cos(v, c), 4), cell)
                    for cell, c in enumerate(cents)
                ),
            )
            return [cell for _, cell in scored[:n]]

        assign = {i: best_cells(vecs[i], 1)[0] for i in ids}
        out = []
        for qid in sorted(i for i in ids if i < 5):
            probe = set(best_cells(vecs[qid], 2))
            cand = [i for i in ids if i != qid and assign[i] in probe]
            qt = [vecs[qid][i * 16 : (i + 1) * 16] for i in range(4)]
            scores = []
            for did in cand:
                dt = [vecs[did][j * 16 : (j + 1) * 16] for j in range(4)]
                s = sum(
                    max(
                        _half_up(float(np.dot(q, d)) * 10000)
                        for d in dt
                    )
                    for q in qt
                )
                scores.append((did, s))
            scores.sort(key=lambda t: (-t[1], t[0]))
            for rnk, (did, s) in enumerate(scores[:5], start=1):
                out.append((qid, did, s, rnk))
        return out

    @staticmethod
    def _cos(a, b):
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        return float(np.dot(a, b)) / (na * nb) if na * nb > 0 else 0.0

    def test_matches_numpy_recompute(self, spark):
        got = [
            (r.qid, r.vec_id, r.score, r.rnk)
            for r in Q.s21_ivf_maxsim_rerank(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_scores_are_exact_maxsim(self, spark):
        # the rerank is EXACT on its candidates: every returned
        # (qid, vec_id, score) must carry the same score the exact
        # full-corpus MaxSim (s20's lattice) computes for that pair.
        emb = _pq("embeddings")
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }

        def maxsim(q, d):
            qt = [q[i * 16 : (i + 1) * 16] for i in range(4)]
            dt = [d[j * 16 : (j + 1) * 16] for j in range(4)]
            return sum(
                max(_half_up(float(np.dot(a, b)) * 10000) for b in dt)
                for a in qt
            )

        for r in Q.s21_ivf_maxsim_rerank(spark, SF_SMOKE).collect():
            assert r.score == maxsim(vecs[r.qid], vecs[r.vec_id])


class TestLogTemplateMining:
    def _expected(self) -> list[tuple]:
        import json as _json

        ev = _pq("events")
        rows = {}
        for r in ev.itertuples():
            k = int(_json.loads(r.props)["k"])
            msg = (
                f"{r.event_type} user={int(r.user_id)} "
                f"v={int(np.floor(r.value))}"
                + (" retry" if k % 3 == 0 else "")
            )
            tmpl = re.sub(r"[0-9]+", "<N>", msg)
            agg = rows.setdefault(tmpl, [0, set(), int(r.event_id)])
            agg[0] += 1
            agg[1].add(int(r.user_id))
            agg[2] = min(agg[2], int(r.event_id))
        ranked = sorted(
            (
                (t, c, len(us), fe)
                for t, (c, us, fe) in rows.items()
            ),
            key=lambda x: (-x[1], x[0]),
        )
        return ranked[:10]

    def test_matches_python_recompute(self, spark):
        got = [
            (r.template, r.n_events, r.n_users, r.first_event)
            for r in Q.l19_log_template_mining(spark, SF_SMOKE).collect()
        ]
        assert got == self._expected()

    def test_masking_merges_users(self, spark):
        # the whole point of template mining: the per-user variable
        # field must be masked, so every template aggregates MANY
        # users' lines.
        rows = Q.l19_log_template_mining(spark, SF_SMOKE).collect()
        assert rows and all("<N>" in r.template for r in rows)
        assert any(r.n_users > 1 for r in rows)
