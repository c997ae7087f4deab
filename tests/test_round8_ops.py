"""Round-8 semantic invariants: the prefix-filter df-cap valve must be
exactness-preserving (same verified pair set as the uncapped path), the
kNN certificate must never certify a truncated candidate list, and the
k-fold assignment must be near-uniform across folds.
"""

from __future__ import annotations

from collections import Counter

from parquet_importer_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def test_prefix_filter_max_df_valve_is_exact(spark):
    """Pruning the broadcast df table at max_df (hot grams key off the
    shared ceiling via LEFT join + coalesce) must return the IDENTICAL
    verified pair set — the cap shifts the shared order, never the
    exact verification."""
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = read_table(spark, SF_ORACLE, "documents")
    base = {
        (r.d1, r.d2): (r.inter_sz, r.union_sz)
        for r in prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", k=3, t_num=4, t_den=5
        ).collect()
    }
    # max_df=3 prunes a real slice of this corpus's vocabulary (every
    # gram appearing in >3 docs), so the capped path is genuinely
    # exercised, not a no-op.
    capped = {
        (r.d1, r.d2): (r.inter_sz, r.union_sz)
        for r in prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", k=3, t_num=4, t_den=5, max_df=3
        ).collect()
    }
    assert capped == base
    assert len(base) > 0


def test_knn_k_exact_requires_full_list(spark):
    """k_exact must be False for any site whose 3x3 ring held fewer
    than k=5 candidates, regardless of the boundary-margin test — a
    short list can never certify."""
    rows = QUERIES["spatial_knn_join"](spark, SF_ORACLE).collect()
    per_site = Counter(r.site_id for r in rows)
    flags = {r.site_id: r.k_exact for r in rows}
    for site, n in per_site.items():
        if n < 5:
            assert flags[site] is False, (site, n)
    assert len(per_site) > 0


def test_kfold_folds_near_uniform(spark):
    """Fold sizes from the widened hash prefix must be within a few
    percent of each other (the old single-hex-digit %5 gave fold 0 a
    systematic 4/16-vs-3/16 = +33% share)."""
    rows = QUERIES["llm_split_kfold"](spark, SF_ORACLE).collect()
    sizes = {r.fold: r.n_docs for r in rows}
    assert set(sizes) == {0, 1, 2, 3, 4}
    lo, hi = min(sizes.values()), max(sizes.values())
    # 65536 % 5 = 1: residue skew is at most 1 part in 13107 — any
    # remaining spread is sampling noise, bounded loosely here.
    assert hi <= lo * 1.15, sizes


def test_rfm_rankcut_equals_ntile_formulation(spark):
    """agg_rfm_rankcut's distributed bucket-rank must reproduce
    agg_rfm_segmentation's NTILE output cell-for-cell — the two keys
    share one oracle text, but this asserts the ENGINES agree directly
    (a shared-oracle bug would slip past both parity checks)."""
    a = {
        (r.r_score, r.f_score, r.m_score): (
            r.segment,
            r.n_customers,
            r.total_monetary_cents,
        )
        for r in QUERIES["agg_rfm_segmentation"](spark, SF_ORACLE).collect()
    }
    b = {
        (r.r_score, r.f_score, r.m_score): (
            r.segment,
            r.n_customers,
            r.total_monetary_cents,
        )
        for r in QUERIES["agg_rfm_rankcut"](spark, SF_ORACLE).collect()
    }
    assert a == b and len(a) > 0


def test_sharded_sampler_matches_per_shard_recomputation(spark):
    """Each shard of llm_sample_weighted_sharded must equal the global
    systematic sampler run on that shard's docs alone — recomputed
    independently in Python from the raw table."""
    import hashlib
    import re as _re
    from collections import defaultdict

    from parquet_importer_spark.io import read_table

    got = defaultdict(dict)
    for r in QUERIES["llm_sample_weighted_sharded"](
        spark, SF_ORACLE
    ).collect():
        got[r.shard][r.doc_id] = (r.n_tok, r.picked_stride)

    docs = read_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text"
    ).collect()
    shards = defaultdict(list)
    for d in docs:
        h = hashlib.md5(f"s17|{d.doc_id}".encode()).hexdigest()
        n_tok = len(_re.split(r"\s+", d.text.strip().lower()))
        shards[h[0]].append((h, d.doc_id, n_tok))
    want = defaultdict(dict)
    for shard, rows in shards.items():
        cum = 0
        for _, doc_id, n_tok in sorted(rows):
            if cum // 500 < (cum + n_tok) // 500:
                want[shard][doc_id] = (n_tok, cum // 500 + 1)
            cum += n_tok
    assert dict(got) == dict(want)
    assert sum(len(v) for v in want.values()) > 0


def test_knn_adaptive_grid_is_recall_safe_where_certified(spark):
    """Wherever k_exact is TRUE, the returned 5 neighbors must equal
    the brute-force exact 5-NN — the certificate's whole contract,
    checked against an independent O(n*sites) recomputation."""
    from collections import defaultdict

    from parquet_importer_spark.io import read_table

    rows = QUERIES["spatial_knn_join"](spark, SF_ORACLE).collect()
    by_site = defaultdict(list)
    certified = {}
    for r in rows:
        by_site[r.site_id].append((r.d2, r.point_id))
        certified[r.site_id] = r.k_exact

    pts = [
        (e.event_id, (e.value % 360) - 180, (e.value % 180) - 90)
        for e in read_table(spark, SF_ORACLE, "events")
        .select("event_id", "value")
        .collect()
    ]
    coords = {i: (lon, lat) for i, lon, lat in pts}
    for site_id, flag in certified.items():
        if not flag:
            continue
        slon, slat = coords[site_id]
        truth = sorted(
            (
                (
                    (lon - slon) * (lon - slon)
                    + (lat - slat) * (lat - slat),
                    pid,
                )
                for pid, (lon, lat) in coords.items()
                if pid != site_id
            )
        )[:5]
        assert sorted(by_site[site_id]) == truth, site_id
    assert any(certified.values()), "no site certified — grid too fine"


def test_mannwhitney_matches_pure_python(spark):
    """U statistic and z per event_type recomputed with a direct
    average-rank implementation (no value-grain decomposition) — the
    two formulations must agree exactly on U and to 1e-9 on z."""
    import hashlib  # noqa: F401 — parallel structure with sibling tests
    from collections import defaultdict

    from parquet_importer_spark.io import read_table

    got = {
        r.event_type: (r.n_a, r.n_b, r.u_a, r.z)
        for r in QUERIES["agg_mannwhitney_u"](spark, SF_ORACLE).collect()
    }
    rows = (
        read_table(spark, SF_ORACLE, "events")
        .select("event_type", "value", "user_id")
        .collect()
    )
    by_type = defaultdict(list)
    for r in rows:
        v = round(r.value * 100)
        by_type[r.event_type].append((v, int(r.user_id % 2)))
    for etype, vals in by_type.items():
        svals = sorted(v for v, _ in vals)
        # average rank per value
        first = {}
        cnt = {}
        for i, v in enumerate(svals, start=1):
            first.setdefault(v, i)
            cnt[v] = cnt.get(v, 0) + 1
        avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in first}
        n_a = sum(1 for _, a in vals if a == 0)
        n_b = len(vals) - n_a
        r_a = sum(avg_rank[v] for v, a in vals if a == 0)
        u_a = r_a - n_a * (n_a + 1) / 2
        n = n_a + n_b
        tsum = sum(c**3 - c for c in cnt.values())
        var = n_a * n_b * ((n + 1) * n * (n - 1) - tsum) / (12 * n * (n - 1))
        z = (u_a - n_a * n_b / 2) / var**0.5
        gna, gnb, gua, gz = got[etype]
        assert (gna, gnb) == (n_a, n_b)
        assert gua == u_a
        # the operator reports ROUND(z, 6)
        assert abs(gz - z) < 5e-7, (etype, gz, z)


def test_attribution_conserves_conversions(spark):
    """First/last counts must each sum to the number of attributable
    conversions, and the linear credits must sum to the same number
    (each conversion distributes exactly 1 across its touches, up to
    the 1e-8 per-term rounding)."""
    from parquet_importer_spark.io import read_table
    from pyspark.sql import functions as F

    out = QUERIES["ts_attribution_touch"](spark, SF_ORACLE).collect()
    n_first = sum(r.n_first_touch for r in out)
    n_last = sum(r.n_last_touch for r in out)
    linear = sum(r.linear_credit for r in out)

    ev = read_table(spark, SF_ORACLE, "events").filter(
        F.col("event_type") != "error"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_conv = (
        ev.select(
            "event_type",
            F.count(
                F.when(F.col("event_type") != "purchase", 1)
            ).over(w).alias("k"),
        )
        .filter((F.col("event_type") == "purchase") & (F.col("k") >= 1))
        .count()
    )
    assert n_first == n_last == n_conv > 0
    assert abs(linear - n_conv) < 1e-4


def test_source_overlap_matches_pure_python(spark):
    """Pairwise shared-gram counts recomputed from raw text in Python
    set algebra must equal the operator's matrix exactly."""
    import re as _re
    from collections import defaultdict
    from itertools import combinations

    from parquet_importer_spark.io import read_table

    got = {
        (r.src_a, r.src_b): (r.n_a, r.n_b, r.n_shared)
        for r in QUERIES["llm_source_overlap"](spark, SF_ORACLE).collect()
    }
    docs = (
        read_table(spark, SF_ORACLE, "documents")
        .select("source", "text")
        .collect()
    )
    grams = defaultdict(set)
    for d in docs:
        toks = _re.split(r"\s+", d.text.strip().lower())
        if len(toks) >= 3:
            sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        grams[d.source] |= sh
    want = {}
    for a, b in combinations(sorted(grams), 2):
        shared = len(grams[a] & grams[b])
        if shared:
            want[(a, b)] = (len(grams[a]), len(grams[b]), shared)
    assert got == want and len(want) > 0


def test_ntile_rankcut_formula_exhaustive():
    """The integer rank->NTILE(5) formula agg_rfm_rankcut evaluates in
    SQL — CASE WHEN r <= (n%5)*(n DIV 5 + 1) THEN (r-1) DIV (n DIV 5+1)
    + 1 ELSE (n%5) + 1 + (r - (n%5)*(n DIV 5+1) - 1) DIV (n DIV 5) END —
    must equal the SQL-standard remainder-to-first-buckets NTILE for
    EVERY rank at every population size up to 1000 (covers n < 5,
    n % 5 == 0, and every remainder class)."""

    def ntile_std(r: int, n: int, k: int = 5) -> int:
        # remainder-to-first rule: first (n % k) buckets hold b+1 rows
        b, rem = divmod(n, k)
        big = rem * (b + 1)
        if r <= big:
            return (r - 1) // (b + 1) + 1
        return rem + ((r - big - 1) // b) + 1 if b else r

    def formula(r: int, n: int) -> int:
        b, rem = n // 5, n % 5
        if r <= rem * (b + 1):
            return (r - 1) // (b + 1) + 1
        return rem + 1 + (r - rem * (b + 1) - 1) // b if b else r

    for n in range(1, 1001):
        for r in range(1, n + 1):
            assert formula(r, n) == ntile_std(r, n), (r, n)
