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
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
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
           ROUND((SELECT ROUND(CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,8)))
                             AS DOUBLE), 4) / COUNT(*)
                  FROM part p2 WHERE p2.p_brand = p.p_brand), 6) AS brand_avg
    FROM part p
    WHERE p_retailprice >
          (SELECT ROUND(CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,8)))
                        AS DOUBLE), 4)
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
    # grid-snap the decimal-exact sum before dividing (SURVEY §7.4.7):
    # the unrounded double feeds a > comparison, where a 1-ulp
    # conversion difference can flip boundary rows at scale
    brand_avg = (
        F.round(
            F.sum(F.col("p_retailprice").cast("decimal(30,8)"))
            .over(w)
            .cast("double"),
            4,
        )
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


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (reference has no analytics — EXT scope per
    BASELINE.json): bilateral trade volume between two nations per ship
    year. The nation dimension joins TWICE under different aliases (the
    classic self-referencing dim); both copies broadcast, so the only
    shuffles are the fact-fact joins. The disjunctive nation-pair
    predicate evaluates after the two cheap hash probes, and the
    year() projection happens pre-aggregation so the group-by key is
    narrow."""
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = F.broadcast(read_table(spark, sf_dir, "nation").alias("n1"))
    n2 = F.broadcast(read_table(spark, sf_dir, "nation").alias("n2"))
    pair = (
        (F.col("n1.n_name") == "NATION_3") & (F.col("n2.n_name") == "NATION_7")
    ) | ((F.col("n1.n_name") == "NATION_7") & (F.col("n2.n_name") == "NATION_3"))
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair)
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(F.col("vol")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in one quarter. The returnflag filter pushes to the lineitem
    scan (dictionary-encoded column → row-group pruning at scale), the
    date filter to orders; nation broadcasts. Final ORDER BY+LIMIT is
    TakeOrderedAndProject — no cluster-wide sort of the aggregate."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape, adapted to the fixture schema (no l_shipmode /
    commit/receipt dates — l_linestatus stands in as the grouping
    channel): per line status, how many lines belong to high- vs
    low-priority orders. The CASE..SUM pair is a conditional aggregate
    — one pass, two counters, map-side partials; only orders' priority
    column crosses the join."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * (
             {oracle_exact_sum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')}
           ), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    part broadcasts (it's a dimension at every scale tier), the month
    filter prunes lineitem row groups, and the two decimal-exact sums
    reduce in one partial+final aggregation; the ratio is a single
    scalar division performed identically by both engines."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = F.broadcast(read_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * (exact_sum(promo_rev) / exact_sum(rev)), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,8))) AS DOUBLE), 4) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold. The HAVING subquery becomes a pre-aggregated semi-join:
    lineitem aggregates FIRST (map-side partials shrink it to one row
    per order key), and only qualifying keys probe back into the
    fact join — at 100 TB the semi side is ~1e-3 of lineitem, so AQE
    converts the probe to broadcast."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "_bk"),
              F.col("o_orderkey") == F.col("_bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(30,8)"))
                .cast("double"),
                4,
            ).alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q19_discount_revenue",
    oracle=f"""
    SELECT {oracle_exact_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three brand/size/quantity
    envelopes over the part-lineitem join. Catalyst extracts the
    common join key and pushes the per-table halves of the OR down to
    each scan (l_quantity BETWEEN 1 AND 40 and the brand/size union
    prune row groups); the residual disjunction evaluates post-probe
    inside codegen — no fallback to a nested-loop join."""
    l = read_table(spark, sf_dir, "lineitem")
    p = F.broadcast(read_table(spark, sf_dir, "part"))
    env = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#16") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .filter(env)
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_dormant_accounts",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_custs,
           {oracle_exact_sum('c.c_acctbal')} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT {oracle_exact_avg('c2.c_acctbal')}
            FROM customer c2 WHERE c2.c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-dormant accounts — customers above
    the positive-balance average who have never ordered. The scalar
    subquery stays LAZY: the 1-row average cross-joins (broadcast) into
    the scan as a filter column — no driver-side collect, so query
    construction plans but never runs (SURVEY §7.4.8), and a NULL
    average (no positive balances) yields the empty result the oracle
    produces rather than an error. NOT EXISTS decorrelates to a LEFT
    ANTI join probing DISTINCT custkeys — at 100 TB the build side is
    the distinct key set, not the orders table. Decimal sums go
    through the grid-snapping helpers (SURVEY §7.4.7)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(
            exact_avg("c_acctbal").alias("threshold")
        )
    )
    return (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
