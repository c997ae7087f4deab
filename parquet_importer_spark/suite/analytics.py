"""Composite analytical queries — TPC-H-shaped multi-join pipelines
(SURVEY §7.1 M2: "TPC-H-style multi-table queries over the testdata
star schema become expressible here"). Each one chains several §2
operators: broadcast dim joins, fact-fact shuffle joins, conditional
filters, decimal-exact aggregation, top-k.

Adapted to the driver schema (no o_shippriority / p–ps tables in the
fixture set); the plan shapes are the TPC-H ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import (
    oracle_exact_sum,
    exact_sum,
    query,
)

_Q3_DATE = "1998-01-01"


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two selective fact joins → group → top-10 by
    revenue. Both order-side filters push to the scans; the final
    ORDER BY + LIMIT plans as TakeOrderedAndProject, never a full sort."""
    cutoff = F.lit(_Q3_DATE).cast("timestamp")
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(),
                 F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name ASC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star joins (supplier/nation/region broadcast)
    over the orders–lineitem spine, local-supplier predicate
    (c_nationkey = s_nationkey), revenue rollup per nation. The two
    fact tables shuffle once each on the join key; every dimension is
    a map-side hash probe."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    s = F.broadcast(read_table(spark, sf_dir, "supplier"))
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {oracle_exact_sum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-filter-aggregate with no
    join and no group-by. All four predicates push down to the parquet
    scan (min/max row-group pruning at scale); the aggregate is a
    single partial+final reduction — the cheapest possible 100 TB pass."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join with a
    mixed equi + non-equi condition (hash probe on l_orderkey, residual
    l_shipdate > o_orderdate filter). The semi join never materializes
    lineitem columns, so only the orders side flows into the aggregate."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "subquery_above_brand_avg",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           ROUND((SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,8)))
                             AS DOUBLE) / COUNT(*)
                  FROM part p2 WHERE p2.p_brand = p.p_brand), 6) AS brand_avg
    FROM part p
    WHERE p_retailprice >
          (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,8))) AS DOUBLE)
                  / COUNT(*)
           FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
)
def subquery_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts priced above their brand's
    average), decorrelated the Spark-idiomatic way: one window average
    per brand partition instead of a per-row subquery — a single
    shuffle on p_brand, no rescan of part. Oracle keeps the literal
    correlated form to pin identical semantics."""
    from pyspark.sql import Window

    p = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    brand_avg = (
        F.sum(F.col("p_retailprice").cast("decimal(30,8)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        p.withColumn("brand_avg_raw", brand_avg)
        .filter(F.col("p_retailprice") > F.col("brand_avg_raw"))
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            F.round("brand_avg_raw", 6).alias("brand_avg"),
        )
    )
