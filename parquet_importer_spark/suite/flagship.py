"""Flagship query — TPC-H Q1-shaped pricing summary (SURVEY.md §7.2).

Exercises the full scan→filter→derive→group→multi-agg→sort spine with
builtins only. At 100 TB this plan is: parquet scan with the shipdate
predicate pushed to row-group stats, partial (map-side) aggregation on
each executor, a 6-group shuffle, final agg — no wide shuffle of raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import (
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
    query,
)

_CUTOFF = "1998-09-01"


def pricing_summary(lineitem: DataFrame, cutoff: str = _CUTOFF) -> DataFrame:
    """Pricing summary report over ``lineitem`` (reference has no queries;
    shape mandated by SURVEY.md §7.2 over the driver testdata)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            # charge is a 6-decimal expression (2dp price × 2dp disc ×
            # 2dp tax) — snap to its own grid, not the default 4
            exact_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                dp=6,
            ).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "flagship_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_exact_sum('l_quantity')} AS sum_qty,
           {oracle_exact_sum('l_extendedprice')} AS sum_base_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_exact_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', dp=6)} AS sum_charge,
           {oracle_exact_avg('l_quantity')} AS avg_qty,
           {oracle_exact_avg('l_extendedprice')} AS avg_price,
           {oracle_exact_avg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(read_table(spark, sf_dir, "lineitem"))
