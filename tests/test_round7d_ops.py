"""Semantic invariants for the round-7 fourth wave — properties the
oracle-parity hash cannot distinguish from spec bugs (both engines
agreeing on the wrong answer): Benford terms vs a straight numpy
recompute, chi-square cell algebra vs a Counter-built contingency
table, HHI/Gini vs their textbook definitions on sorted shares, and
DBSCAN neighbor counts vs an O(n^2) brute force.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from parquet_importer_spark.io import read_table
from parquet_importer_spark.suite import QUERIES

SF_ORACLE = "/root/testdata/sf0.01"


def test_benford_terms_match_numpy(spark):
    """Digit counts recomputed from raw cents strings; freq/chi2 terms
    recomputed in numpy; probabilities must be the true log10(1+1/d)
    (repr round-trip) and cover all nine digits exactly once."""
    out = QUERIES["agg_benford"](spark, SF_ORACLE).collect()
    assert sorted(r.digit for r in out) == list(range(1, 10))

    li = read_table(spark, SF_ORACLE, "lineitem").select(
        "l_extendedprice"
    ).collect()
    counts = Counter(
        int(str(int(round(r.l_extendedprice * 100)))[0]) for r in li
    )
    n = sum(counts.values())
    for r in out:
        assert r.n_total == n
        assert r.n_obs == counts[r.digit]
        assert r.p_benford == math.log10(1 + 1 / r.digit)
        assert math.isclose(r.freq_obs, counts[r.digit] / n, rel_tol=1e-12)
        exp = n * r.p_benford
        assert math.isclose(
            r.chi2_term, (counts[r.digit] - exp) ** 2 / exp, rel_tol=1e-12
        )
    # the nine Benford probabilities are a distribution
    assert math.isclose(sum(r.p_benford for r in out), 1.0, rel_tol=1e-12)


def test_chi2_cells_match_contingency_table(spark):
    """Rebuild the contingency table with a Counter: marginals must be
    consistent (each cell's row_total = sum over its type, col_total =
    sum over its cohort), expected counts must sum to N per row/column
    band, and every contribution must match (o-e)^2/e in float."""
    out = QUERIES["agg_chi2_independence"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "user_id"
    ).collect()
    cells = Counter((r.event_type, r.user_id % 4) for r in ev)
    n_total = sum(cells.values())
    row = Counter()
    col = Counter()
    for (t, c), v in cells.items():
        row[t] += v
        col[c] += v
    assert len(out) == len(cells)
    for r in out:
        o = cells[(r.event_type, r.cohort)]
        assert r.n_obs == o
        assert r.row_total == row[r.event_type]
        assert r.col_total == col[r.cohort]
        e = row[r.event_type] * col[r.cohort] / n_total
        assert math.isclose(r.expected, e, rel_tol=1e-12)
        assert math.isclose(r.chi2_term, (o - e) ** 2 / e, rel_tol=1e-12)
    # expected counts reproduce the observed grand total
    assert math.isclose(
        sum(r.expected for r in out), n_total, rel_tol=1e-9
    )


def test_concentration_matches_textbook_formulas(spark):
    """HHI and Gini recomputed from first principles per region: HHI as
    the sum of squared shares, Gini by the mean-absolute-difference
    definition G = sum_ij |c_i - c_j| / (2 n^2 mean) — an INDEPENDENT
    formula from the rank identity the operator uses."""
    out = {r.r_name: r for r in QUERIES["agg_market_concentration"](
        spark, SF_ORACLE
    ).collect()}

    li = read_table(spark, SF_ORACLE, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    ).collect()
    sup = {
        r.s_suppkey: r.s_nationkey
        for r in read_table(spark, SF_ORACLE, "supplier").collect()
    }
    nat = {
        r.n_nationkey: r.n_regionkey
        for r in read_table(spark, SF_ORACLE, "nation").collect()
    }
    reg = {
        r.r_regionkey: r.r_name
        for r in read_table(spark, SF_ORACLE, "region").collect()
    }
    rev = Counter()
    for r in li:
        rev[r.l_suppkey] += int(round(r.l_extendedprice * 100))
    by_region: dict[str, list[int]] = {}
    for sk, cents in rev.items():
        by_region.setdefault(reg[nat[sup[sk]]], []).append(cents)

    assert sorted(out) == sorted(by_region)
    for name, cs in by_region.items():
        c = np.array(sorted(cs), dtype=float)
        r = out[name]
        assert r.n_suppliers == len(c)
        assert r.revenue_cents == int(c.sum())
        shares = c / c.sum()
        assert math.isclose(r.hhi, float((shares**2).sum()), rel_tol=1e-12)
        mad = np.abs(c[:, None] - c[None, :]).sum()
        gini = mad / (2 * len(c) ** 2 * c.mean())
        assert math.isclose(r.gini, float(gini), rel_tol=1e-12)
        assert 0.0 <= r.gini < 1.0
        assert 1.0 / len(c) <= r.hhi <= 1.0


def test_dbscan_neighbors_match_brute_force(spark):
    """Neighbor counts recomputed O(n^2) in numpy over the SAME derived
    coordinates: exact count equality for every point (the grid must
    neither miss a cross-cell neighbor nor double-count), core flags
    at the n >= 12 threshold, and symmetry (a in N(b) <=> b in N(a))."""
    out = QUERIES["spatial_dbscan_core"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "value"
    ).collect()
    pts = {}
    for r in ev:
        if r.user_id % 5 != 0:
            continue
        cents = int(round(r.value * 100))
        pts[r.event_id] = (
            (r.event_id * 61 + cents) % 1000,
            (r.user_id * 97 + cents * 7) % 1000,
        )
    assert len(out) == len(pts)
    ids = sorted(pts)
    xy = np.array([pts[i] for i in ids], dtype=np.int64)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(axis=2)
    within = d2 <= 1600
    counts = dict(zip(ids, within.sum(axis=1) - 1))  # minus self
    assert (within == within.T).all()  # symmetry of the ball predicate
    for r in out:
        assert (r.x, r.y) == pts[r.event_id]
        assert r.n_neighbors == counts[r.event_id]
        assert r.is_core == (r.n_neighbors >= 12)
    assert any(r.is_core for r in out)
    assert any(not r.is_core for r in out)


def test_max_drawdown_matches_running_peak_recompute(spark):
    """Rebuild the hourly series in Python, run the running-peak
    recurrence, and demand EXACT equality on drawdown, trough hour
    (earliest on ties), and peak/trough levels — all integers."""
    out = {r.event_type: r for r in QUERIES["ts_max_drawdown"](
        spark, SF_ORACLE
    ).collect()}
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    # naive-UTC epoch arithmetic (datetime.timestamp() would apply the
    # process timezone; the session runs UTC and so does the oracle)
    from datetime import datetime  # noqa: PLC0415

    epoch = datetime(1970, 1, 1)
    series: dict[str, Counter] = {}
    for r in ev:
        trunc = r.ts.replace(minute=0, second=0, microsecond=0)
        hb = int((trunc - epoch).total_seconds()) // 3600
        series.setdefault(r.event_type, Counter())[hb] += int(
            round(r.value * 100)
        )
    assert sorted(out) == sorted(series)
    for t, hours in series.items():
        peak = None
        best = (-1, None, None, None)  # dd, hb, peak, level
        n = 0
        for hb in sorted(hours):
            c = hours[hb]
            n += 1
            peak = c if peak is None else max(peak, c)
            dd = peak - c
            if dd > best[0]:
                best = (dd, hb, peak, c)
        r = out[t]
        assert r.n_hours == n
        assert r.max_dd_cents == best[0]
        assert r.trough_hb == best[1]
        assert r.peak_cents == best[2]
        assert r.trough_cents == best[3]


def test_spc_limits_match_imr_recompute(spark):
    """I-MR chart recomputed in Python: CL, MRbar, the 2.66 limits and
    the out-of-control count must match; limits must bracket CL; MRbar
    must be nonnegative."""
    out = {r.event_type: r for r in QUERIES["ts_spc_control_limits"](
        spark, SF_ORACLE
    ).collect()}
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    from datetime import datetime  # noqa: PLC0415

    epoch = datetime(1970, 1, 1)
    series: dict[str, Counter] = {}
    for r in ev:
        trunc = r.ts.replace(minute=0, second=0, microsecond=0)
        hb = int((trunc - epoch).total_seconds()) // 3600
        series.setdefault(r.event_type, Counter())[hb] += int(
            round(r.value * 100)
        )
    for t, hours in series.items():
        cs = [hours[hb] for hb in sorted(hours)]
        cl = sum(cs) / len(cs)
        mrbar = sum(
            abs(a - b) for a, b in zip(cs[1:], cs)
        ) / (len(cs) - 1)
        ucl, lcl = cl + 2.66 * mrbar, cl - 2.66 * mrbar
        n_ooc = sum(1 for c in cs if c > ucl or c < lcl)
        r = out[t]
        assert r.n_hours == len(cs)
        assert math.isclose(r.cl, cl, rel_tol=1e-12)
        assert math.isclose(r.mrbar, mrbar, rel_tol=1e-12)
        assert math.isclose(r.ucl, ucl, rel_tol=1e-12)
        assert math.isclose(r.lcl, lcl, rel_tol=1e-12)
        assert r.n_ooc == n_ooc
        assert r.lcl < r.cl < r.ucl
        assert r.mrbar >= 0


def test_bootstrap_ci_matches_hash_replicate_recompute(spark):
    """Full independent recompute: derive every Poisson weight from
    hashlib.md5 against the literal CDF cut-points, rebuild all 100
    replicate means per type, rank them, and check the selected order
    statistics exactly; the interval must be ordered and bracket the
    sample mean for this well-conditioned metric."""
    import hashlib

    from parquet_importer_spark.suite.aggregates import (
        _BOOT_B,
        _POISSON_CUTS,
    )

    out = {r.event_type: r for r in QUERIES["agg_bootstrap_ci"](
        spark, SF_ORACLE
    ).collect()}
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "event_id", "value"
    ).collect()

    def weight(b: int, eid: int) -> int:
        # round 8: four 8-hex draws per md5 — replicate b = g*4 + i
        # reads hex window [8i, 8i+8) of md5('boot|g|eid')
        g, i = divmod(b, 4)
        hx32 = hashlib.md5(f"boot|{g}|{eid}".encode()).hexdigest()
        hx = hx32[8 * i : 8 * i + 8]
        for k, cut in enumerate(_POISSON_CUTS):
            if hx < cut:
                return k
        return 6

    sums: dict[tuple, list] = {}
    for r in ev:
        cents = int(round(r.value * 100))
        for b in range(_BOOT_B):
            w = weight(b, r.event_id)
            if w:
                cell = sums.setdefault((r.event_type, b), [0, 0])
                cell[0] += w
                cell[1] += w * cents
    means: dict[str, list] = {}
    for (t, b), (sw, swc) in sums.items():
        means.setdefault(t, []).append((swc / sw, b))
    for t, ms in means.items():
        ms.sort()
        ranked = [m for m, _ in ms]
        r = out[t]
        assert r.n_replicates == len(ranked) == _BOOT_B
        assert r.ci_lo == ranked[2]
        assert r.boot_median == ranked[49]
        assert r.ci_hi == ranked[97]
        assert r.ci_lo <= r.boot_median <= r.ci_hi
        full = [int(round(x.value * 100)) for x in ev
                if x.event_type == t]
        assert r.ci_lo <= sum(full) / len(full) <= r.ci_hi


def test_assortativity_matches_newman_recompute(spark):
    """Rebuild the mu+sigma co-supply graph in Python and compute
    Newman's assortativity with numpy.corrcoef over both edge
    orientations — an INDEPENDENT formulation of the same
    coefficient; also pin the node/edge counts and the [-1, 1]
    range."""
    out = QUERIES["graph_assortativity"](spark, SF_ORACLE).collect()
    assert len(out) == 1
    r = out[0]

    li = read_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    orders: dict[int, set] = {}
    for x in li:
        orders.setdefault(x.l_orderkey, set()).add(x.l_suppkey)
    co = Counter()
    for supps in orders.values():
        ss = sorted(supps)
        for i, u in enumerate(ss):
            for v in ss[i + 1:]:
                co[(u, v)] += 1
    cs = np.array(list(co.values()), dtype=float)
    mu, sd = cs.mean(), cs.std()  # population std, matching n*sc2-sc^2
    edges = [p for p, c in co.items() if c > mu + sd]
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    assert r.n_nodes == len(deg)
    assert r.n_edges == len(edges)
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    expected = float(np.corrcoef(xs, ys)[0, 1])
    assert math.isclose(r.assortativity, expected, rel_tol=1e-9)
    assert -1.0 <= r.assortativity <= 1.0


def test_seasonality_profile_matches_epoch_recompute(spark):
    """Recompute the (type, dow, hod) matrix with naive-UTC epoch
    arithmetic: exact count/total equality per cell, 1970-01-01
    anchored to Thursday (dow 3 under 0=Monday), means consistent,
    and the matrix marginals reproduce the corpus row count."""
    from datetime import datetime

    out = QUERIES["ts_seasonality_profile"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    epoch = datetime(1970, 1, 1)
    cells: dict[tuple, list] = {}
    for r in ev:
        d = int((r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
                 - epoch).total_seconds()) // 86400
        h = int((r.ts.replace(minute=0, second=0, microsecond=0)
                 - epoch).total_seconds()) // 3600
        key = (r.event_type, (d + 3) % 7, h % 24)
        cell = cells.setdefault(key, [0, 0])
        cell[0] += 1
        cell[1] += int(round(r.value * 100))
    assert epoch.weekday() == 3  # Thursday anchors the dow formula
    assert len(out) == len(cells)
    for r in out:
        n, tot = cells[(r.event_type, r.dow, r.hod)]
        assert r.n_events == n
        assert r.total_cents == tot
        assert math.isclose(r.mean_cents, tot / n, rel_tol=1e-12)
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
    assert sum(r.n_events for r in out) == len(ev)


def test_rfm_cube_matches_quintile_recompute(spark):
    """Recompute R/F/M quintiles in Python with the SQL NTILE rule
    (equal buckets, remainder to the first) over the same total
    orders, rebuild the cube, and check counts/sums/labels exactly;
    customers must partition across cells."""
    from datetime import datetime

    out = QUERIES["agg_rfm_segmentation"](spark, SF_ORACLE).collect()
    od = read_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    epoch = datetime(1970, 1, 1)
    last: dict[int, int] = {}
    freq: Counter = Counter()
    mon: Counter = Counter()
    for r in od:
        d = int((r.o_orderdate.replace(
            hour=0, minute=0, second=0, microsecond=0
        ) - epoch).total_seconds()) // 86400
        last[r.o_custkey] = max(last.get(r.o_custkey, d), d)
        freq[r.o_custkey] += 1
        mon[r.o_custkey] += int(round(r.o_totalprice * 100))

    def ntile5(keyed: list) -> dict[int, int]:
        n = len(keyed)
        base, rem = divmod(n, 5)
        scores = {}
        i = 0
        for b in range(1, 6):
            size = base + (1 if b <= rem else 0)
            for _, ck in keyed[i:i + size]:
                scores[ck] = b
            i += size
        return scores

    customers = sorted(last)
    r_sc = ntile5(sorted((last[c], c) for c in customers))
    f_sc = ntile5(sorted((freq[c], c) for c in customers))
    m_sc = ntile5(sorted((mon[c], c) for c in customers))
    cube: dict[tuple, list] = {}
    for c in customers:
        key = (r_sc[c], f_sc[c], m_sc[c])
        cell = cube.setdefault(key, [0, 0])
        cell[0] += 1
        cell[1] += mon[c]
    assert len(out) == len(cube)
    for r in out:
        n, tot = cube[(r.r_score, r.f_score, r.m_score)]
        assert r.n_customers == n
        assert r.total_monetary_cents == tot
        assert math.isclose(r.avg_monetary_cents, tot / n, rel_tol=1e-12)
        if r.r_score >= 4 and r.f_score >= 4 and r.m_score >= 4:
            want = "champion"
        elif r.r_score <= 2 and r.f_score >= 4:
            want = "at_risk"
        elif r.r_score == 1:
            want = "lost"
        else:
            want = "other"
        assert r.segment == want
    assert sum(r.n_customers for r in out) == len(customers)


def test_cohort_ltv_matches_first_day_recompute(spark):
    """Rebuild the LTV triangle in Python (first-active cohorts, per-age
    revenue, running cumulative): exact equality per cell; cumulative
    must be nondecreasing along each cohort and end at the cohort's
    total revenue."""
    from datetime import datetime

    out = QUERIES["ts_cohort_ltv"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "user_id", "ts", "value"
    ).collect()
    epoch = datetime(1970, 1, 1)
    user_days: dict[int, Counter] = {}
    for r in ev:
        d = int((r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
                 - epoch).total_seconds()) // 86400
        user_days.setdefault(r.user_id, Counter())[d] += int(
            round(r.value * 100)
        )
    cells: dict[tuple, list] = {}
    for u, days in user_days.items():
        cohort = min(days)
        for d, cents in days.items():
            cell = cells.setdefault((cohort, d - cohort), [0, 0])
            cell[0] += 1
            cell[1] += cents
    assert len(out) == len(cells)
    by_cohort: dict[int, list] = {}
    for r in out:
        n, cents = cells[(r.cohort_day, r.age_days)]
        assert r.n_active_users == n
        assert r.revenue_cents == cents
        by_cohort.setdefault(r.cohort_day, []).append(r)
    for rows in by_cohort.values():
        rows.sort(key=lambda r: r.age_days)
        run = 0
        for r in rows:
            run += r.revenue_cents
            assert r.cum_revenue_cents == run
        assert rows[0].age_days == 0  # a cohort is active on day 0


def test_winnow_pairs_match_python_recompute(spark):
    """Recompute the full winnowing pipeline in Python (hashlib md5,
    4-gram hashes, window-of-5 minima, value-set distinct, df cap
    [2, 50], pair counts, the exact top-20 sort) and compare rows
    exactly; also check the winnowing guarantee on the selected sets:
    every doc with >= 5 gram hashes yields at least one fingerprint
    and fingerprints are a subset of its gram hashes."""
    import hashlib
    import re

    out = QUERIES["llm_fingerprint_winnow"](spark, SF_ORACLE).collect()
    docs = read_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    ).collect()
    fps: dict[int, set] = {}
    for d in docs:
        toks = re.split(r"\s+", d.text.strip().lower())
        if len(toks) >= 4:
            h = [
                hashlib.md5(
                    " ".join(toks[i:i + 4]).encode()
                ).hexdigest()[:8]
                for i in range(len(toks) - 3)
            ]
        else:
            h = [hashlib.md5(" ".join(toks).encode()).hexdigest()[:8]]
        if len(h) >= 5:
            sel = {min(h[p:p + 5]) for p in range(len(h) - 4)}
        else:
            sel = {min(h)}
        assert sel and sel <= set(h)
        fps[d.doc_id] = sel
    df = Counter(f for s in fps.values() for f in s)
    keep = {f for f, c in df.items() if 2 <= c <= 50}
    pair_counts: Counter = Counter()
    by_fp: dict[str, list] = {}
    for doc, s in fps.items():
        for f in s & keep:
            by_fp.setdefault(f, []).append(doc)
    for ds in by_fp.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                pair_counts[(a, b)] += 1
    ranked = sorted(
        pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    assert len(out) == len(ranked)
    got = [((r.id_1, r.id_2), r.n_shared) for r in out]
    got.sort(key=lambda kv: (-kv[1], kv[0]))
    assert [(p, n) for p, n in ranked] == got
    for r in out:
        n1, n2 = len(fps[r.id_1]), len(fps[r.id_2])
        expect = pair_counts[(r.id_1, r.id_2)] / (
            n1 + n2 - pair_counts[(r.id_1, r.id_2)]
        )
        assert math.isclose(r.fp_jaccard, expect, rel_tol=1e-12)


def test_path_transitions_match_lag_recompute(spark):
    """Recompute session-bounded transitions with a Python lag pass
    (total (sec, event_id) order, 30-min gap rule): exact count
    equality per cell and probabilities summing to 1 per from_type."""
    out = QUERIES["ts_path_transitions"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_type", "event_id", "ts"
    ).collect()
    from datetime import datetime

    epoch = datetime(1970, 1, 1)
    per_user: dict[int, list] = {}
    for r in ev:
        sec = int((r.ts.replace(microsecond=0) - epoch).total_seconds())
        per_user.setdefault(r.user_id, []).append(
            (sec, r.event_id, r.event_type)
        )
    trans: Counter = Counter()
    for rows in per_user.values():
        rows.sort()
        for (ps, _, pt), (s, _, t) in zip(rows, rows[1:]):
            if s - ps <= 1800:
                trans[(pt, t)] += 1
    assert len(out) == len(trans)
    row_tot: Counter = Counter()
    for (ft, _), n in trans.items():
        row_tot[ft] += n
    prob_sum: Counter = Counter()
    for r in out:
        assert r.n_transitions == trans[(r.from_type, r.to_type)]
        assert math.isclose(
            r.p_transition,
            trans[(r.from_type, r.to_type)] / row_tot[r.from_type],
            rel_tol=1e-12,
        )
        prob_sum[r.from_type] += r.p_transition
    for ft, p in prob_sum.items():
        assert math.isclose(p, 1.0, rel_tol=1e-9)


def test_basket_affinity_matches_bruteforce(spark):
    """Recompute pair supports and lift from raw baskets with Counters
    (itertools pair enumeration) and check the top-20 exactly; lift
    must also satisfy its definition P(ab)/(P(a)P(b)) within 1e-12."""
    from itertools import combinations

    out = QUERIES["agg_basket_affinity"](spark, SF_ORACLE).collect()
    li = read_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_orders = len(baskets)
    item: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    scored = [
        (
            pair[k] * n_orders / (item[k[0]] * item[k[1]]),
            k[0],
            k[1],
            pair[k],
        )
        for k in pair
        if pair[k] >= 2
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    assert len(out) == min(20, len(scored))
    for r, (lift, p1, p2, n) in zip(out, scored):
        assert (r.part_1, r.part_2, r.pair_orders) == (p1, p2, n)
        assert math.isclose(r.lift, lift, rel_tol=1e-12)
        assert math.isclose(
            r.support, n / n_orders, rel_tol=1e-12
        )
        # lift definition: joint over product of marginals
        p_ab = n / n_orders
        p_a, p_b = item[p1] / n_orders, item[p2] / n_orders
        assert math.isclose(r.lift, p_ab / (p_a * p_b), rel_tol=1e-12)


def test_entropy_mix_bounds_and_recompute(spark):
    """Entropy recomputed from a Counter contingency table (same
    round-to-8 term truncation); every segment's entropy must sit in
    [0, ln(n_priorities)]."""
    out = QUERIES["agg_entropy_mix"](spark, SF_ORACLE).collect()
    o = read_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    c = read_table(spark, SF_ORACLE, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    seg_of = {r.c_custkey: r.c_mktsegment for r in c}
    cell: Counter = Counter()
    for r in o:
        cell[(seg_of[r.o_custkey], r.o_orderpriority)] += 1
    segs: dict[str, list] = {}
    for (s, _), n in cell.items():
        segs.setdefault(s, []).append(n)
    assert len(out) == len(segs)
    for r in out:
        counts = segs[r.segment]
        n = sum(counts)
        assert r.n_orders == n and r.n_priorities == len(counts)
        ent = -sum(
            round(cn * math.log(cn / n), 8) for cn in counts
        ) / n
        assert math.isclose(r.entropy, round(ent, 6), abs_tol=2e-6)
        assert -1e-9 <= r.entropy <= math.log(len(counts)) + 1e-9


def test_survival_hazard_life_table_algebra(spark):
    """Life-table identities: at-risk counts are the reverse running
    sum of users by duration (recomputed from raw events), hazards
    are d/n, the cumulative hazard is nondecreasing, and the total
    churn count equals the raw churned-user count."""
    out = sorted(
        QUERIES["ts_survival_hazard"](spark, SF_ORACLE).collect(),
        key=lambda r: r.dur_days,
    )
    ev = read_table(spark, SF_ORACLE, "events").select(
        "user_id", "ts"
    ).collect()
    span: dict[int, list] = {}
    for r in ev:
        d = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days
        if r.user_id in span:
            s = span[r.user_id]
            s[0], s[1] = min(s[0], d), max(s[1], d)
        else:
            span[r.user_id] = [d, d]
    max_day = max(s[1] for s in span.values())
    durs = [
        (s[1] - s[0], 1 if max_day - s[1] >= 14 else 0)
        for s in span.values()
    ]
    n_users_at: Counter = Counter()
    churned_at: Counter = Counter()
    for d, ch in durs:
        n_users_at[d] += 1
        churned_at[d] += ch
    assert len(out) == sum(1 for t in churned_at.values() if t > 0)
    prev_cum = 0.0
    for r in out:
        n_risk = sum(n for d, n in n_users_at.items() if d >= r.dur_days)
        assert r.n_at_risk == n_risk
        assert r.n_churned == churned_at[r.dur_days]
        assert math.isclose(
            r.hazard, r.n_churned / r.n_at_risk, rel_tol=1e-12
        )
        assert r.cum_hazard >= prev_cum - 1e-12
        prev_cum = r.cum_hazard
    assert sum(r.n_churned for r in out) == sum(ch for _, ch in durs)


def test_dwell_time_matches_python_recompute(spark):
    """Dwell gaps recomputed with a Python lag pass; means exactly,
    percentiles as the ceil(p*n)-th order statistic of the sorted
    dwell list per type."""
    out = QUERIES["ts_dwell_time"](spark, SF_ORACLE).collect()
    ev = read_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_type", "event_id", "ts"
    ).collect()
    from datetime import datetime

    epoch = datetime(1970, 1, 1)
    per_user: dict[int, list] = {}
    for r in ev:
        sec = int((r.ts.replace(microsecond=0) - epoch).total_seconds())
        per_user.setdefault(r.user_id, []).append(
            (sec, r.event_id, r.event_type)
        )
    dwells: dict[str, list] = {}
    for rows in per_user.values():
        rows.sort()
        for (s, _, t), (ns, _, _) in zip(rows, rows[1:]):
            if ns - s <= 1800:
                dwells.setdefault(t, []).append(ns - s)
    assert len(out) == len(dwells)
    for r in out:
        ds = sorted(dwells[r.event_type])
        n = len(ds)
        assert r.n_dwells == n
        assert math.isclose(
            r.mean_dwell_s, sum(ds) / n, rel_tol=1e-12
        )
        assert r.p50_dwell_s == ds[math.ceil(0.5 * n) - 1]
        assert r.p90_dwell_s == ds[math.ceil(0.9 * n) - 1]


def test_ab_ztest_matches_scipy_style_recompute(spark):
    """Arms, conversion counts, and z recomputed from raw tables with
    hashlib md5; z must equal the textbook pooled two-proportion
    statistic, and every customer must land in exactly one arm."""
    import hashlib

    out = QUERIES["agg_ab_proportions_ztest"](spark, SF_ORACLE).collect()
    assert len(out) == 1
    r = out[0]
    cust = read_table(spark, SF_ORACLE, "customer").select(
        "c_custkey"
    ).collect()
    orders = read_table(spark, SF_ORACLE, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    urgent = {
        o.o_custkey for o in orders if o.o_orderpriority == "1-URGENT"
    }
    n = {"A": 0, "B": 0}
    conv = {"A": 0, "B": 0}
    for c in cust:
        arm = (
            "A"
            if hashlib.md5(f"ab|{c.c_custkey}".encode()).hexdigest()[0]
            in "01234567"
            else "B"
        )
        n[arm] += 1
        conv[arm] += 1 if c.c_custkey in urgent else 0
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (
        n["A"], n["B"], conv["A"], conv["B"],
    )
    p_pool = (conv["A"] + conv["B"]) / (n["A"] + n["B"])
    z = (conv["A"] / n["A"] - conv["B"] / n["B"]) / math.sqrt(
        p_pool * (1 - p_pool) * (1 / n["A"] + 1 / n["B"])
    )
    assert math.isclose(r.z_score, z, rel_tol=1e-12)
    assert 0 < r.pooled_rate < 1  # degenerate rates would break z


def test_peak_detect_matches_bruteforce(spark):
    """Peaks recomputed by brute force over each series' observation
    list: strictly greater than every value in the 3-observation
    shoulders, at least one observation on each side, prominence
    over the taller shoulder."""
    out = {
        (r.event_type, r.hour_epoch): (r.n_events, r.prominence)
        for r in QUERIES["ts_peak_detect"](spark, SF_ORACLE).collect()
    }
    ev = read_table(spark, SF_ORACLE, "events").select(
        "event_type", "ts"
    ).collect()
    series: dict[str, Counter] = {}
    from datetime import datetime

    epoch = datetime(1970, 1, 1)
    for r in ev:
        h = int((r.ts - epoch).total_seconds()) // 3600
        series.setdefault(r.event_type, Counter())[h] += 1
    expect = {}
    for t, cnt in series.items():
        hs = sorted(cnt)
        for i, h in enumerate(hs):
            left = [cnt[x] for x in hs[max(0, i - 3):i]]
            right = [cnt[x] for x in hs[i + 1:i + 4]]
            if not left or not right:
                continue
            v = cnt[h]
            if v > max(left) and v > max(right):
                expect[(t, h)] = (v, v - max(max(left), max(right)))
    assert out == expect
