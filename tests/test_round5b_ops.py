"""Semantic invariants for the round-5 second-wave operators — planted
constructions the oracle-parity hash cannot distinguish from spec bugs
(both sides would agree on the wrong answer): KMV estimator accuracy,
systematic-sampling weight proportionality, k-core membership on a
planted clique, Theil–Sen outlier robustness, SAX symbol grammar,
recursive-CTE depth law, tolerance-join windowing, ROUGE self-recall.
"""

from __future__ import annotations

import math
import os

import pandas as pd

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, pdf):
    path = os.path.join(str(tmp_path), f"{name}.parquet")
    pdf.to_parquet(path, index=False)
    return str(tmp_path)


def test_recursive_cte_depth_matches_log2(spark):
    """Every nation's tree depth under parent = floor(key/2) must equal
    floor(log2(key)) + 1 (0 for key 0, the root), and ancestor count =
    depth + 1."""
    from parquet_importer_spark.suite import QUERIES

    out = {
        r.nationkey: r
        for r in QUERIES["sql_recursive_cte"](spark, SF).collect()
    }
    assert len(out) == 25
    for key, row in out.items():
        want = 0 if key == 0 else int(math.floor(math.log2(key))) + 1
        assert row.tree_depth == want, (key, row.tree_depth, want)
        assert row.n_ancestors == row.tree_depth + 1


def test_asof_tolerance_is_null_iff_gap_exceeds_window(spark):
    """Against the plain as-of join: exactly the matches older than 30
    minutes are nulled, none invented, none shifted."""
    from parquet_importer_spark.suite import QUERIES

    plain = {
        r.event_id: r for r in QUERIES["join_asof"](spark, SF).collect()
    }
    tol = {
        r.event_id: r
        for r in QUERIES["join_asof_tolerance"](spark, SF).collect()
    }
    assert plain.keys() == tol.keys()
    n_nulled = 0
    for eid, p in plain.items():
        t = tol[eid]
        if p.click_ts is None:
            assert t.click_ts is None
            continue
        gap = (p.purchase_ts - p.click_ts).total_seconds()
        if gap <= 1800:
            assert t.click_ts == p.click_ts and t.click_value == p.click_value
        else:
            assert t.click_ts is None and t.click_value is None
            n_nulled += 1
    assert n_nulled > 0, "fixture never exercised the tolerance cut"


def test_percentile_disc_values_are_exact_ranks(spark):
    """p50 of each group must equal the ceil(n/2)-th smallest value
    recomputed driver-side; every pct_value must be a group member."""
    from parquet_importer_spark.suite import QUERIES
    from parquet_importer_spark.io import read_table

    rows = QUERIES["agg_percentile_disc"](spark, SF).collect()
    orders = read_table(spark, SF, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    by_grp: dict = {}
    for r in orders:
        by_grp.setdefault(r.o_orderpriority, []).append(
            (r.o_totalprice, r.o_orderkey)
        )
    for g in by_grp:
        by_grp[g].sort()
    for r in rows:
        vals = by_grp[r.o_orderpriority]
        assert r.n_rows == len(vals)
        want = vals[math.ceil(r.p * len(vals)) - 1][0]
        assert r.pct_value == want, (r.o_orderpriority, r.p)


def test_kmv_estimate_within_theory_bounds(spark):
    """KMV relative error concentrates at ~1/sqrt(k); assert a loose
    5-sigma envelope so a formula bug (off-by-one k, wrong U) fails but
    hash-family luck never does, and the exact-fallback branch is
    exercised and exact."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["agg_kmv_distinct"](spark, SF).collect()
    assert rows, "no groups"
    for r in rows:
        if r.kth_min_hash is None:  # under-k group → exact fallback
            assert r.est_distinct == r.exact_distinct
            continue
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 5.0 / math.sqrt(32), (r.grp, rel)


def test_kmv_union_upper_bounds_groups_and_intersection_sane(spark):
    """Union estimate must cover the largest group's exact count within
    the same envelope; intersection estimate must be non-negative and
    ≤ the smaller side's exact count envelope."""
    from parquet_importer_spark.suite import QUERIES

    out = {
        r.op: r for r in QUERIES["agg_kmv_union"](spark, SF).collect()
    }
    u = out["union_all_groups"]
    rel = abs(u.est_distinct - u.exact_distinct) / u.exact_distinct
    assert rel < 5.0 / math.sqrt(32)
    i = out["intersect_urgent_low"]
    assert i.est_distinct >= 0
    # theta-intersection is noisier (effective k is the clipped common
    # sample) — sanity envelope only
    assert i.est_distinct <= 4 * max(i.exact_distinct, 32)


def test_sample_weighted_proportional_to_tokens(spark, tmp_path):
    """Docs with 10× the tokens must be picked ~10× as often; every doc
    longer than the stride is always picked."""
    from parquet_importer_spark.suite import QUERIES

    rows = [(i, "w " * 50, "short") for i in range(300)] + [
        (1000 + i, "w " * 1000, "long") for i in range(30)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    sf = _write(tmp_path, "documents", pdf)
    got = QUERIES["llm_sample_weighted"](spark, sf).collect()
    by_src = {"short": 0, "long": 0}
    for r in got:
        by_src[r.source] += 1
    # 1000-token docs span ≥1 stride boundary of 500 always
    assert by_src["long"] == 30
    # short docs: 300 docs × 50 tokens = 15000 tokens → ~30 picks
    assert 10 <= by_src["short"] <= 60


def test_dedup_normalized_catches_case_and_punct_variants(spark, tmp_path):
    """Casing/punctuation/whitespace variants collapse to one group;
    the min doc_id is kept; a distinct doc stays its own group."""
    from parquet_importer_spark.suite import QUERIES

    rows = [
        (1, "Hello, World!", "a"),
        (2, "hello   world", "a"),
        (3, "HELLO-WORLD", "b"),
        (4, "something else", "b"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    sf = _write(tmp_path, "documents", pdf)
    out = {
        r.doc_id: r
        for r in QUERIES["llm_dedup_normalized"](spark, sf).collect()
    }
    assert out[1].n_copies == 3 and out[1].is_kept
    assert out[2].n_copies == 3 and not out[2].is_kept
    assert out[3].n_copies == 3 and not out[3].is_kept
    assert out[4].n_copies == 1 and out[4].is_kept


def test_kcore_planted_clique_survives_pendants_die(spark, tmp_path):
    """A 10-clique of suppliers co-supplying many orders survives k=8
    peeling; pendant suppliers attached by one edge each are peeled off.
    Edges require co-supply counts above μ+σ, so the clique co-supplies
    many orders and pendants few-but-above-threshold is not constructible
    independently — instead verify: every clique member appears with
    core_degree 9, and no pendant appears."""
    from parquet_importer_spark.suite import QUERIES

    rows = []
    ok = 0
    # clique: suppliers 1..10 all co-supply orders 1..9 (pair count 9).
    # 45 clique pairs must stay a MINORITY of all pairs: a two-point
    # count distribution {p·H, (1−p)·L} has μ+σ < H iff p < 0.5, so
    # plant 100 pendants (200 low-count pairs) to pull p to 45/245.
    for o in range(1, 10):
        for s in range(1, 11):
            rows.append((o, s))
    # pendant 100+i co-supplies exactly 2 orders with anchor (i%10)+1
    for i in range(1, 101):
        for _ in range(2):
            ok += 1
            rows.append((1000 + ok, (i % 10) + 1))
            rows.append((1000 + ok, 100 + i))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_suppkey"])
    sf = _write(tmp_path, "lineitem", pdf)
    out = {
        r.suppkey: r.core_degree
        for r in QUERIES["graph_kcore"](spark, sf).collect()
    }
    # μ+σ ≈ 2 + 0.57·(9−2) ≈ 6 → exactly the clique edges survive the
    # cut, every clique node keeps degree 9 ≥ k = 8, pendants vanish
    for s in range(1, 11):
        assert out.get(s) == 9, (s, out.get(s))
    for s in range(101, 201):
        assert s not in out


def test_tokenizer_fertility_exact_tiny_case(spark, tmp_path):
    """'ab cd' → 2 ws tokens, 2 bpe tokens, 5 chars; 'a-b c!' → 2 ws,
    5 bpe tokens (a,-,b,c,!) — fertility exact by hand."""
    from parquet_importer_spark.suite import QUERIES

    rows = [(1, "ab cd", "en", "s"), (2, "a-b c!", "fr", "s")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf = _write(tmp_path, "documents", pdf)
    out = {
        r.lang: r
        for r in QUERIES["llm_tokenizer_fertility"](spark, sf).collect()
    }
    assert out["en"].total_ws_tokens == 2
    assert out["en"].total_bpe_tokens == 2
    assert out["en"].fertility == 1.0
    assert out["fr"].total_ws_tokens == 2
    assert out["fr"].total_bpe_tokens == 5
    assert out["fr"].fertility == 2.5


def test_ngram_novelty_copy_has_zero(spark, tmp_path):
    """An exact copy arriving later has novelty 0; the original scores 1;
    a half-copied doc scores strictly between."""
    from parquet_importer_spark.suite import QUERIES

    a = "one two three four five six seven eight"
    b = "nine ten eleven twelve thirteen fourteen"
    rows = [(1, a, "en", "s"), (2, a, "en", "s"), (3, a + " " + b, "en", "s")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf = _write(tmp_path, "documents", pdf)
    out = {
        r.doc_id: r
        for r in QUERIES["llm_ngram_novelty"](spark, sf).collect()
    }
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    assert 0.0 < out[3].novelty < 1.0


def test_rouge_reference_scores_itself_via_copy(spark, tmp_path):
    """A verbatim copy of a reference scores recall=precision=1.0 on
    both ROUGE-1 and ROUGE-2; an unrelated doc never clears the gate."""
    from parquet_importer_spark.suite import QUERIES

    ref = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (50, ref, "en", "s"),          # doc_id % 50 == 0 → reference
        (51, ref, "en", "s"),          # verbatim copy
        (52, "totally different words here now", "en", "s"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    sf = _write(tmp_path, "documents", pdf)
    got = {
        (r.ref_id, r.cand_id): r
        for r in QUERIES["llm_rouge_overlap"](spark, sf).collect()
    }
    r = got[(50, 51)]
    assert r.rouge1_recall == 1.0 and r.rouge1_precision == 1.0
    assert r.rouge2_recall == 1.0
    assert (50, 52) not in got


def test_sax_word_grammar_and_flat_series(spark, tmp_path):
    """A strictly increasing series symbolizes low→high (a…d, first
    symbol 'a', last 'd'); a constant series is all-'c'."""
    from parquet_importer_spark.suite import QUERIES

    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(16):
        rows.append(
            (i, base + pd.Timedelta(hours=i), 1, "rising", float(i * 10), "{}")
        )
        rows.append(
            (100 + i, base + pd.Timedelta(hours=i), 1, "flat", 5.0, "{}")
        )
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf = _write(tmp_path, "events", pdf)
    out = {
        r.event_type: r for r in QUERIES["ts_sax"](spark, sf).collect()
    }
    rising = out["rising"].sax_word
    assert rising[0] == "a" and rising[-1] == "d"
    assert list(rising) == sorted(rising), "monotone series → monotone word"
    assert out["flat"].sax_word == "c" * 16


def test_theilsen_ignores_planted_outliers(spark, tmp_path):
    """A clean slope-3 line with 5 wild outliers in 30 points must still
    estimate slope 3 exactly (median of pairwise slopes)."""
    from parquet_importer_spark.suite import QUERIES

    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(30):
        v = 3.0 * i + 7.0
        if i in (4, 11, 17, 23, 28):
            v += 5000.0
        rows.append((i, base + pd.Timedelta(hours=i), 1, "lin", v, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf = _write(tmp_path, "events", pdf)
    out = QUERIES["ts_theilsen_trend"](spark, sf).collect()[0]
    assert out.n_pairs == 30 * 29 // 2
    assert abs(out.theil_sen_slope - 3.0) < 1e-9
