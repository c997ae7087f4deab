"""Physical-plan invariants — the 100-TB design contract.

Correctness tests prove the operators compute the right answer at
small scale; these prove the PLANS are the ones that survive scale-up:
filters reach the parquet scan, dimension joins broadcast, top-k avoids
global sorts, aggregates combine map-side, and no oracle-checked query
falls back to a driver-side collect of the corpus.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """Comparison predicates must appear as parquet PushedFilters."""
    plan = plan_of(spark, "filter_compare")
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_flagship_pushes_shipdate_filter(spark):
    plan = plan_of(spark, "flagship_pricing_summary")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan


def test_column_pruning(spark):
    """A two-column projection must not scan every lineitem column."""
    df = read_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("ReadSchema") :]
    assert "l_orderkey" in scan and "l_quantity" in scan
    assert "l_comment" not in scan, "unprojected column reached the scan"


@pytest.mark.parametrize(
    "name", ["join_broadcast", "join_inner_eq", "join_semi_anti"]
)
def test_dim_joins_broadcast(spark, name):
    """Joins against region/nation-sized dims must be broadcast — a
    shuffled sort-merge join against a 25-row table is the canonical
    scale failure."""
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_full_outer_join_reuses_child_partitioning(spark):
    """Full outer can't broadcast (no Spark support); the scale
    requirement is instead that the join reuses its aggregated
    children's hash partitioning — no exchange between agg and join."""
    plan = plan_of(spark, "join_outer")
    assert "SortMergeJoin" in plan
    join_at = plan.index("SortMergeJoin")
    agg_at = plan.index("HashAggregate", join_at)
    assert "Exchange" not in plan[join_at:agg_at], (
        "extra shuffle between aggregation and full-outer join"
    )


@pytest.mark.parametrize("name", ["topk", "llm_sim_topk", "llm_tfidf"])
def test_topk_avoids_global_sort(spark, name):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    heap + driver merge of k rows), never a full Exchange+Sort."""
    assert "TakeOrderedAndProject" in plan_of(spark, name)


def test_agg_partial_final(spark):
    """groupBy aggregates must combine map-side (partial_*) before the
    exchange — the shuffle then carries groups, not rows."""
    plan = plan_of(spark, "agg_groupby")
    assert "partial_" in plan
    assert plan.index("partial_") > plan.index("Exchange"), (
        "partial aggregate should sit below the exchange"
    )


def test_dedup_near_shuffles_slim_rows(spark):
    """The MinHash band shuffle must not carry shingle arrays — only
    (band, key, doc). A plan that exchanges the `sh` column re-ships
    the corpus bands× times."""
    plan = plan_of(spark, "llm_dedup_near")
    lines = plan.splitlines()
    band_exchanges = [
        i for i, l in enumerate(lines) if "hashpartitioning(band" in l
    ]
    assert band_exchanges, "band shuffle missing from plan"
    # the operator feeding the exchange prints its output schema —
    # shingle arrays (sh#N) must not be in it
    child = lines[band_exchanges[0] + 1]
    assert "sh#" not in child, f"shingles shipped through band shuffle: {child}"
    # and candidate verification must broadcast the candidate pairs,
    # not shuffle the corpus
    assert "BroadcastExchange" in plan


def test_scan_parquet_counts_from_footer(spark):
    """count(*) over parquet must not materialize columns (footer-served
    count: the scan's ReadSchema is empty)."""
    df = read_table(spark, SF, "nation").groupBy().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<>" in plan
