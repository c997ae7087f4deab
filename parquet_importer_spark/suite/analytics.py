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
