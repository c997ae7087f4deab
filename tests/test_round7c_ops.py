"""Semantic invariants for the round-7 third wave — properties the
oracle-parity hash cannot distinguish from spec bugs (both engines
agreeing on the wrong answer): skyline dominance vs a Python brute
force, burst-island maximality/threshold from raw events, cumulative-
distinct agreement with exact COUNT(DISTINCT), and Welch t/dof vs a
straight numpy recompute.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

from parquet_importer_spark.io import read_table
from parquet_importer_spark.suite import QUERIES

SF_ORACLE = "/root/testdata/sf0.01"


def test_skyline_is_exact_dominance_frontier(spark):
    """The returned set must be EXACTLY the non-dominated (size, price)
    pairs: every returned point is undominated, every omitted distinct
    point is dominated by some returned point, and n_parts matches the
    group size — checked by brute force over all distinct pairs."""
    out = QUERIES["sort_pareto_skyline"](spark, SF_ORACLE).collect()
    got = {(r.p_size, r.price): r.n_parts for r in out}

    parts = read_table(spark, SF_ORACLE, "part").select(
        "p_size", "p_retailprice"
    ).collect()
    groups = Counter((r.p_size, r.p_retailprice) for r in parts)

    def dominated(p, pts):
        return any(
            q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
            for q in pts
        )

    expected = {
        p: n for p, n in groups.items() if not dominated(p, groups)
    }
    assert got == expected
    # antichain: every frontier pair is mutually non-dominated
    pts = list(got)
    for i, p in enumerate(pts):
        for q in pts[i + 1:]:
            assert dominated(p, {q: 1}) is False
            assert dominated(q, {p: 1}) is False


def test_burst_islands_maximal_and_thresholded(spark):
    """Recompute hourly counts from raw events in Python: every island
    hour must clear the 4/3x-mean threshold, the hours adjacent to an
    island must NOT (maximality), per-island peak/volume must match,
    and no burst hour may be missing from the union of islands."""
    out = QUERIES["ts_burst_detect"](spark, SF_ORACLE).collect()

    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts"
    ).collect()
    # naive-UTC epoch arithmetic (datetime.timestamp() would apply the
    # process timezone; the session runs UTC and so does the oracle)
    from datetime import datetime  # noqa: PLC0415

    epoch = datetime(1970, 1, 1)
    counts: dict = defaultdict(Counter)
    for r in ev:
        trunc = r.ts.replace(minute=0, second=0, microsecond=0)
        counts[r.event_type][
            int((trunc - epoch).total_seconds()) // 3600
        ] += 1

    burst_hours: dict = {}
    for et, c in counts.items():
        tot, nh = sum(c.values()), len(c)
        burst_hours[et] = {h for h, n in c.items() if 3 * n * nh >= 4 * tot}

    covered: dict = defaultdict(set)
    for r in out:
        hs = set(range(r.start_hb, r.end_hb + 1))
        assert hs <= burst_hours[r.event_type], "non-burst hour in island"
        assert len(hs) == r.n_hours
        # maximality: neighbors outside the island are not burst hours
        assert r.start_hb - 1 not in burst_hours[r.event_type]
        assert r.end_hb + 1 not in burst_hours[r.event_type]
        c = counts[r.event_type]
        assert r.peak_cnt == max(c[h] for h in hs)
        assert r.burst_events == sum(c[h] for h in hs)
        covered[r.event_type] |= hs
    for et, hs in burst_hours.items():
        assert covered[et] == hs, f"{et}: burst hours missing from islands"


def test_running_distinct_reaches_exact_distinct_total(spark):
    """Per type: cum_users must be strictly increasing, each day's
    increment must equal new_users, and the final value must equal the
    exact COUNT(DISTINCT user_id) computed independently."""
    out = QUERIES["win_running_distinct"](spark, SF_ORACLE).collect()
    per_type: dict = defaultdict(list)
    for r in out:
        per_type[r.event_type].append((r.day, r.new_users, r.cum_users))

    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id"
    ).collect()
    exact: dict = defaultdict(set)
    for r in ev:
        exact[r.event_type].add(r.user_id)

    for et, rows in per_type.items():
        rows.sort()
        run = 0
        for _, new, cum in rows:
            assert new >= 1
            run += new
            assert cum == run, f"{et}: cumulative sum broken"
        assert run == len(exact[et]), f"{et}: final != exact distinct"


def test_welch_matches_numpy(spark):
    """t statistic and Welch–Satterthwaite dof must match a straight
    numpy recompute from the raw per-arm cents populations (sample
    variance, ddof=1) to float tolerance."""
    out = {r.event_type: r for r in QUERIES["agg_welch_ttest"](
        spark, SF_ORACLE
    ).collect()}

    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    arms: dict = defaultdict(lambda: ([], []))
    for r in ev:
        arms[r.event_type][r.user_id % 2].append(round(r.value * 100))

    for et, (a0, a1) in arms.items():
        r = out[et]
        x0, x1 = np.array(a0, float), np.array(a1, float)
        assert (r.n_ctl, r.n_trt) == (len(x0), len(x1))
        assert r.mean_ctl == pytest.approx(x0.mean(), rel=1e-12)
        assert r.mean_trt == pytest.approx(x1.mean(), rel=1e-12)
        se0 = x0.var(ddof=1) / len(x0)
        se1 = x1.var(ddof=1) / len(x1)
        t = (x1.mean() - x0.mean()) / math.sqrt(se0 + se1)
        dof = (se0 + se1) ** 2 / (
            se0**2 / (len(x0) - 1) + se1**2 / (len(x1) - 1)
        )
        assert r.t_stat == pytest.approx(t, rel=1e-9)
        assert r.dof == pytest.approx(dof, rel=1e-9)
        assert r.significant == (abs(t) >= 1.96)
