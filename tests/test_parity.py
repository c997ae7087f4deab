"""Oracle-parity for every registered SQL-expressible query (the driver's
correctness gate), run locally at the driver's own scale (sf0.01 via
the ``sf_dir`` fixture; override with PARITY_SF_DIR for a quick
sf0.001 smoke)."""

from __future__ import annotations

import pytest

import parquet_importer_spark.suite  # noqa: F401  (populates registry)
from parquet_importer_spark.registry import ORACLES, QUERIES
from tests.parity import run_pair


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duckdb_con, sf_dir, name):
    if name == "scan_rowgroup_stats" and "sf0.01" not in sf_dir:
        pytest.skip(
            "oracle pins the driver's sf0.01 footer path (independent "
            "parquet_metadata() read) — parity only holds at that SF"
        )
    run_pair(spark, duckdb_con, sf_dir, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
