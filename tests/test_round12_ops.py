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
