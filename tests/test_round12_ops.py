"""Round-12 operator gates.

The third-decade census (SCALE_LADDER rung 3, round 12) caught two
moment aggregations whose docstrings promised "every moment is exact
in DECIMAL(38,0)" while the implementation multiplied in BIGINT and
only cast the completed sum: ``agg_ols_by_group`` and
``ts_cross_correlation`` threw ANSI ``ARITHMETIC_OVERFLOW`` at sf100
(hourly cents totals grow with corpus density while the hour count
stays fixed, so SUM(y·y) exceeds 2^63 one decade past the driver
SFs). The fix promotes the operands to decimal BEFORE the multiply —
identical integers everywhere the old form didn't throw.

These tests pin the overflow regime itself: a crafted events fixture
whose hourly totals are ~1e9 cents across 24 buckets, so the
sum-of-squares term needs ~2.4e19 — over BIGINT's max, comfortably
inside DECIMAL(38,0). Both queries must compute, and both must agree
with their DuckDB oracle run on the same fixture (the oracle mirrors
the promotion via HUGEINT products), which also proves the fix is
value-preserving cross-engine, not just non-throwing.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def overflow_sf_dir(tmp_path_factory):
    """A minimal sf-dir whose events table puts the moment sums past
    BIGINT: 3 event types x 24 hourly buckets x 4 rows of value 2.5e6
    (=2.5e8 cents each, 1e9 cents per bucket) -> per-type
    SUM(y*y) = 24 * (1e9)^2 = 2.4e19 > 9.22e18."""
    root = tmp_path_factory.mktemp("overflow_sf")
    rows = []
    eid = 0
    for t_i, etype in enumerate(["click", "view", "purchase"]):
        for hb in range(24):
            for k in range(4):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": pd.Timestamp("2024-01-01")
                        + pd.Timedelta(hours=hb, minutes=k),
                        "user_id": 1000 + t_i,
                        "event_type": etype,
                        # 2.5e6 * 100 = 2.5e8 cents; 4 rows -> 1e9/bucket
                        "value": 2.5e6 + (hb % 3),
                        "props": "{}",
                    }
                )
                eid += 1
    pdf = pd.DataFrame(rows)
    pdf.to_parquet(os.path.join(root, "events.parquet"), index=False)
    return str(root)


def _vhash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) if isinstance(v, float) else str(v) for v in r)
        for r in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()


def _oracle_df(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('%s/events.parquet')"
        % sf_dir
    )
    return con.execute(sql).df()


@pytest.mark.parametrize(
    "key", ["agg_ols_by_group", "ts_cross_correlation"]
)
def test_moment_products_survive_bigint_overflow(spark, overflow_sf_dir, key):
    from parquet_importer_spark.suite import ORACLES, QUERIES

    # pre-fix both queries threw ARITHMETIC_OVERFLOW on exactly this
    # shape (ANSI mode, Spark 4 default) — computing at all IS the gate
    sdf = QUERIES[key](spark, overflow_sf_dir).toPandas()
    assert len(sdf) > 0
    odf = _oracle_df(overflow_sf_dir, ORACLES[key])
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _vhash(sdf) == _vhash(odf), (
        f"{key}: Spark and DuckDB disagree in the overflow regime"
    )


@pytest.mark.parametrize(
    "key", ["agg_ols_by_group", "ts_cross_correlation"]
)
def test_moment_fix_is_value_preserving_at_driver_sf(spark, key):
    """The decimal promotion must be invisible at the driver SF: the
    query still hash-matches its oracle on the real sf0.01 tables
    (the same comparison the external driver runs)."""
    from tests.conftest import SF_ORACLE
    from parquet_importer_spark.suite import ORACLES, QUERIES

    sdf = QUERIES[key](spark, SF_ORACLE).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('%s/events.parquet')" % SF_ORACLE
    )
    odf = con.execute(ORACLES[key]).df()
    assert len(sdf) == len(odf)
    assert _vhash(sdf) == _vhash(odf)


# ---------------------------------------------------------------------------
# The overflow CLASS, closed (the currency-guard precedent: round-11
# verdict item 1 asked for classes, not instances). Any F.sum() over a
# BIGINT product is a latent ANSI ARITHMETIC_OVERFLOW one decade past
# wherever it was last tested — unless its operands are provably
# bounded, or the product is decimal-promoted. This test scans every
# package file's AST: a site must either promote an operand to decimal
# (directly or via a local bound to a decimal cast, the xd/yd pattern)
# or appear below with a written boundedness argument. A new
# unexamined F.sum(a*b) fails the build.
# ---------------------------------------------------------------------------

#: {(path-suffix, enclosing function): why the BIGINT product cannot
#: overflow at any plausible decade}. Every entry is also empirically
#: certified by its sf100/sf30 ladder rung: Spark 4 runs ANSI mode, so
#: a rung that PASSED proves no overflow happened at that scale.
BOUNDED_PRODUCT_SITES = {
    ("suite/aggregates.py", "agg_welch_ttest"):
        "operands are per-ROW cents of events.value (domain <= ~6e4, "
        "squares <= ~4e9): the sum overflows only past ~2.3e9 rows per "
        "(type, arm) group — domain-bounded, unlike the per-BUCKET "
        "totals that broke agg_ols_by_group; sf100 rung passed",
    ("suite/aggregates.py", "agg_market_concentration"):
        "operands are per-supplier revenue cents within one region and "
        "a dense rank bounded by |suppliers per region|; supplier "
        "count and per-supplier revenue both stay ~constant under the "
        "replica fixture; sf100 rung passed",
    ("suite/aggregates.py", "agg_bootstrap_ci"):
        "w is a per-(row, replicate) Poisson-ish multiplier (small "
        "int) and cents is the per-ROW domain-bounded value; sf100 "
        "rung passed",
    ("suite/llm_dedup.py", "_supplier_sigma_edges"):
        "c is a per-node co-occurrence count bounded by the bucket "
        "caps of the near-dup pipeline; sf100 rung passed",
    # (round 14: graph_kcore / graph_lpa_communities / graph_bfs_distance
    # dropped their inline edge builds for the shared
    # _supplier_sigma_edges substrate, so their product sites are gone
    # and their entries with them — the staleness test enforces this.)
    ("suite/llm_dedup.py", "graph_assortativity"):
        "x/y are endpoint degrees of the bucket-capped near-dup "
        "graph, already DECIMAL(38,0) from the degree rollup (two "
        "moment sites in this function); sf100 rung passed",
    # --- round-13 gate widening (Call-wrapped products now matched):
    # the six entries below are DOUBLE-operand products, outside the
    # BIGINT ARITHMETIC_OVERFLOW class — an IEEE multiply saturates to
    # inf instead of throwing, and every operand is unit-scale. The
    # decimal cast AFTER the multiply exists for exact order-free
    # ACCUMULATION of an in-range float product, not overflow
    # protection; the AST gate cannot see column types, so each is
    # certified here plus by its passed ANSI sf100/sf30 rung.
    ("suite/analytics_tpch.py", "q11_important_parts"):
        "l_extendedprice and l_discount are DOUBLE fixture columns; "
        "revenue product <= ~1e5 per row; sf100 rung passed",
    ("suite/analytics_tpch.py", "q15_top_supplier"):
        "l_extendedprice and l_discount are DOUBLE fixture columns; "
        "revenue product <= ~1e5 per row; sf100 rung passed",
    ("suite/joins.py", "join_bloom_prefilter"):
        "l_extendedprice and l_discount are DOUBLE fixture columns; "
        "revenue product <= ~1e5 per row; sf100 rung passed",
    ("suite/joins.py", "join_skew_salted"):
        "l_extendedprice and l_discount are DOUBLE fixture columns; "
        "revenue product <= ~1e5 per row; sf100 rung passed",
    ("suite/llm_similarity.py", "llm_emb_whiten"):
        "xq is a DOUBLE embedding coordinate (unit-scale); xq**2 is "
        "rounded to 12 places then cast to decimal(32,12) purely for "
        "exact accumulation; sf100 rung passed",
    ("suite/streaming.py", "ts_sax"):
        "mean_v is a DOUBLE per-bucket mean of events.value "
        "(unit-scale); the square is cast to decimal(38,12) for exact "
        "accumulation only; sf100 rung passed",
}


def _string_const_names(tree):
    """{name: value} for every `NAME = "literal"` assignment in `tree`'s
    OWN scope — nested FunctionDef/Lambda subtrees are skipped, so the
    map is module-level names when called on a Module and function-local
    names when called on a FunctionDef (the caller overlays the two).
    Round-13 find: `.cast(_D)` was invisible to the cast matcher because
    the cast argument is a Name, not a string Constant. Round-14 advice
    fix: the old file-wide flatten let two functions binding the same
    name to DIFFERENT strings mis-resolve `.cast(NAME)` across
    functions (last-walked assignment wins) — a false negative that
    could silently exempt an unpromoted BIGINT product."""
    import ast

    out: dict[str, str] = {}

    def visit(node):
        for child in ast.iter_child_nodes(node):
            if isinstance(
                child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)
            ):
                continue
            if (
                isinstance(child, ast.Assign)
                and len(child.targets) == 1
                and isinstance(child.targets[0], ast.Name)
                and isinstance(child.value, ast.Constant)
                and isinstance(child.value.value, str)
            ):
                out[child.targets[0].id] = child.value.value
            visit(child)

    visit(tree)
    return out


def _is_promoting_cast(call, strmap):
    """True for `.cast("decimal(p,s)")` / `.cast("double")` — either as
    a string literal or as a Name resolving to one via `strmap`. A
    decimal promotion makes the multiply exact; a double promotion
    makes it IEEE (saturates to inf, never ANSI-throws) — both defuse
    the BIGINT ARITHMETIC_OVERFLOW class this gate exists for."""
    import ast

    if not (
        isinstance(call, ast.Call)
        and isinstance(call.func, ast.Attribute)
        and call.func.attr == "cast"
        and call.args
    ):
        return False
    arg = call.args[0]
    if isinstance(arg, ast.Constant):
        t = str(arg.value)
    elif isinstance(arg, ast.Name):
        t = strmap.get(arg.id, "")
    else:
        return False
    return t.startswith("decimal") or t == "double"


def _decimal_bound_names(fn_node, strmap=None):
    import ast

    strmap = strmap if strmap is not None else {}
    out = set()
    for node in ast.walk(fn_node):
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and any(
                _is_promoting_cast(c, strmap) for c in ast.walk(node.value)
            )
        ):
            out.add(node.targets[0].id)
    return out


def _has_decimal_cast(expr, strmap=None):
    import ast

    strmap = strmap if strmap is not None else {}
    return any(_is_promoting_cast(c, strmap) for c in ast.walk(expr))


def _summed_products(sum_call):
    """All BinOp Mult nodes anywhere inside an F.sum(...) argument —
    including Call-wrapped ones. Round-12's gate matched only
    F.sum(<BinOp>), so `F.sum(dec(x * y))` and `F.sum((x * y).cast(d))`
    were invisible (round-12 verdict item 1): a decimal cast applied
    AROUND the product lands AFTER the multiply, which still runs in
    BIGINT and still overflows. Only promotion of an OPERAND (checked
    per product side by the caller) defuses the site."""
    import ast

    return [
        n
        for n in ast.walk(sum_call.args[0])
        if isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult)
    ]


def _unpromoted_product_sites(repo):
    """Scan every package file for F.sum() calls whose argument
    contains a BIGINT (unpromoted) product; returns
    {(path-suffix, function): [linenos]}. Shared by the gate test and
    the allowlist-staleness test so the two can never diverge on what
    counts as a product site."""
    import ast
    import glob

    sites: dict[tuple[str, str], list[int]] = {}
    for path in sorted(
        glob.glob(
            os.path.join(repo, "parquet_importer_spark", "**", "*.py"),
            recursive=True,
        )
    ):
        rel = os.path.relpath(path, repo).replace("\\", "/")
        suffix = rel.split("parquet_importer_spark/", 1)[-1]
        tree = ast.parse(open(path).read())
        strmap = _string_const_names(tree)
        for fn in (
            n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
        ):
            # per-function resolution: this function's own string
            # bindings overlay the module-level map, so a name rebound
            # in ANOTHER function can never resolve a cast here
            fn_strmap = {**strmap, **_string_const_names(fn)}
            dec = _decimal_bound_names(fn, fn_strmap)

            def promoted(side):
                return (
                    (isinstance(side, ast.Name) and side.id in dec)
                    or _has_decimal_cast(side, fn_strmap)
                    # scale-by-literal (`value * 100`, `2 * rank`) is
                    # not the moment-product class: the factor is a
                    # fixed small constant, so boundedness is the
                    # operand's own and the linear-sum regime (already
                    # rung-certified under ANSI) applies
                    or (
                        isinstance(side, ast.Constant)
                        and isinstance(side.value, (int, float))
                    )
                )

            for node in ast.walk(fn):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "sum"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                    and node.args
                ):
                    continue
                for prod in _summed_products(node):
                    if promoted(prod.left) or promoted(prod.right):
                        continue
                    sites.setdefault((suffix, fn.name), []).append(
                        node.lineno
                    )
    return sites


def test_every_sum_of_products_is_promoted_or_justified():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = [
        f"parquet_importer_spark/{suffix}:{linenos} in {fn}()"
        for (suffix, fn), linenos in sorted(
            _unpromoted_product_sites(repo).items()
        )
        if (suffix, fn) not in BOUNDED_PRODUCT_SITES
    ]
    assert not offenders, (
        "F.sum() over an unpromoted BIGINT product — promote an operand "
        "to decimal BEFORE the multiply (see agg_ols_by_group; a cast "
        "wrapped around the product does not count) or add a "
        "boundedness justification to BOUNDED_PRODUCT_SITES: "
        + ", ".join(offenders)
    )


def test_bounded_product_allowlist_is_not_stale():
    """Every allowlist entry must still name a real (file, function)
    that CONTAINS an unpromoted product sum — a promoted or deleted
    site must drop its entry, so the list can only shrink toward the
    mechanically-checked default."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    live = set(_unpromoted_product_sites(repo))
    stale = set(BOUNDED_PRODUCT_SITES) - live
    assert not stale, f"stale BOUNDED_PRODUCT_SITES entries: {sorted(stale)}"


def test_gate_matches_call_wrapped_products():
    """Pin the round-13 gate widening on synthetic sources: a product
    wrapped in a cast-after-multiply Call (`F.sum(dec(x * y))`,
    `F.sum((x * y).cast("decimal(38,0)"))`) must be flagged, while an
    operand-promoted product stays clean even under a wrapper."""
    import ast

    wrapped = ast.parse(
        'def f(df):\n'
        '    dec = lambda c: c.cast("decimal(38,0)")\n'
        '    return df.agg(F.sum(dec(F.col("x") * F.col("y"))))\n'
    )
    method_wrapped = ast.parse(
        "def f(df):\n"
        '    return df.agg(F.sum((F.col("x") * F.col("y"))'
        '.cast("decimal(38,0)")))\n'
    )
    promoted = ast.parse(
        "def f(df):\n"
        '    xd = F.col("x").cast("decimal(19,0)")\n'
        '    yd = F.col("y").cast("decimal(19,0)")\n'
        '    return df.agg(F.sum(xd * yd).cast("decimal(38,0)"))\n'
    )

    def unpromoted_count(tree):
        fn = next(
            n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
        )
        dec = _decimal_bound_names(fn)

        def ok(side):
            return (
                isinstance(side, ast.Name) and side.id in dec
            ) or _has_decimal_cast(side)

        hits = 0
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "sum"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
            ):
                hits += sum(
                    1
                    for p in _summed_products(node)
                    if not (ok(p.left) or ok(p.right))
                )
        return hits

    assert unpromoted_count(wrapped) == 1
    assert unpromoted_count(method_wrapped) == 1
    assert unpromoted_count(promoted) == 0
