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
    ("suite/llm_dedup.py", "graph_kcore"):
        "c is a node degree in the bucket-capped near-dup graph; "
        "sf30 mid-rung passed",
    ("suite/llm_dedup.py", "graph_lpa_communities"):
        "c is a per-label neighbor count bounded by degree; sf100 "
        "rung passed",
    ("suite/llm_dedup.py", "graph_bfs_distance"):
        "c is a frontier count bounded by component size in the "
        "bucket-capped graph; sf100 rung passed",
    ("suite/llm_dedup.py", "graph_assortativity"):
        "x/y/c are endpoint degrees of the bucket-capped near-dup "
        "graph (three sites in this function); sf100 rung passed",
}


def _decimal_bound_names(fn_node):
    import ast

    out = set()
    for node in ast.walk(fn_node):
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and any(
                isinstance(c, ast.Call)
                and isinstance(c.func, ast.Attribute)
                and c.func.attr == "cast"
                and c.args
                and isinstance(c.args[0], ast.Constant)
                and str(c.args[0].value).startswith("decimal")
                for c in ast.walk(node.value)
            )
        ):
            out.add(node.targets[0].id)
    return out


def _has_decimal_cast(expr):
    import ast

    return any(
        isinstance(c, ast.Call)
        and isinstance(c.func, ast.Attribute)
        and c.func.attr == "cast"
        and c.args
        and isinstance(c.args[0], ast.Constant)
        and str(c.args[0].value).startswith("decimal")
        for c in ast.walk(expr)
    )


def test_every_sum_of_products_is_promoted_or_justified():
    import ast
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = []
    for path in sorted(
        glob.glob(
            os.path.join(repo, "parquet_importer_spark", "**", "*.py"),
            recursive=True,
        )
    ):
        rel = os.path.relpath(path, repo).replace("\\", "/")
        suffix = rel.split("parquet_importer_spark/", 1)[-1]
        tree = ast.parse(open(path).read())
        for fn in (
            n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
        ):
            dec = _decimal_bound_names(fn)
            for node in ast.walk(fn):
                if not (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "sum"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                    and node.args
                    and isinstance(node.args[0], ast.BinOp)
                    and isinstance(node.args[0].op, ast.Mult)
                ):
                    continue
                arg = node.args[0]

                def promoted(side):
                    return (
                        isinstance(side, ast.Name) and side.id in dec
                    ) or _has_decimal_cast(side)

                if promoted(arg.left) or promoted(arg.right):
                    continue
                if (suffix, fn.name) in BOUNDED_PRODUCT_SITES:
                    continue
                offenders.append(f"{rel}:{node.lineno} in {fn.name}()")
    assert not offenders, (
        "F.sum() over an unpromoted BIGINT product — promote an operand "
        "to decimal before the multiply (see agg_ols_by_group) or add a "
        "boundedness justification to BOUNDED_PRODUCT_SITES: "
        + ", ".join(offenders)
    )


def test_bounded_product_allowlist_is_not_stale():
    """Every allowlist entry must still name a real (file, function)
    that CONTAINS an unpromoted product sum — a promoted or deleted
    site must drop its entry, so the list can only shrink toward the
    mechanically-checked default."""
    import ast
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    live = set()
    for path in sorted(
        glob.glob(
            os.path.join(repo, "parquet_importer_spark", "**", "*.py"),
            recursive=True,
        )
    ):
        rel = os.path.relpath(path, repo).replace("\\", "/")
        suffix = rel.split("parquet_importer_spark/", 1)[-1]
        tree = ast.parse(open(path).read())
        for fn in (
            n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
        ):
            dec = _decimal_bound_names(fn)
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "sum"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                    and node.args
                    and isinstance(node.args[0], ast.BinOp)
                    and isinstance(node.args[0].op, ast.Mult)
                ):
                    arg = node.args[0]
                    if not (
                        (
                            isinstance(arg.left, ast.Name)
                            and arg.left.id in dec
                        )
                        or _has_decimal_cast(arg.left)
                        or (
                            isinstance(arg.right, ast.Name)
                            and arg.right.id in dec
                        )
                        or _has_decimal_cast(arg.right)
                    ):
                        live.add((suffix, fn.name))
    stale = set(BOUNDED_PRODUCT_SITES) - live
    assert not stale, f"stale BOUNDED_PRODUCT_SITES entries: {sorted(stale)}"
