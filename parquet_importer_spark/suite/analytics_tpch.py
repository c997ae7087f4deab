"""Remaining TPC-H-shaped composites (q2/q8/q9/q11/q13/q15/q16/q17/q20/q21).

Completes the TPC-H query family started in :mod:`analytics` (q3-q22).
The fixture star schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns (TESTDATA.md), so queries
that depend on them keep the TPC-H PLAN SHAPE (correlated-min
decorrelation, scalar-subquery thresholds, multi-EXISTS on the same
fact, nested-agg semi-joins) with adapted semantics: supply cost
becomes the observed min unit price from lineitem, and "late" becomes
``l_shipdate > o_orderdate + 60 days``.

Scale notes (100 TB): every dim side (part / supplier / nation /
region / per-key agg outputs) broadcasts; lineitem is never shuffled
more than once per query except where the shape inherently needs a
per-order reduce (q21) — and there the per-order stats ride a window
over one exchange instead of a join-back re-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import (
    exact_sum,
    oracle_exact_sum,
    query,
)

_DEC = "decimal(30,8)"


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), cand AS (
      SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, u.unit_cost,
             MIN(u.unit_cost) OVER (PARTITION BY p.p_partkey) AS best
      FROM unit u
      JOIN supplier s ON u.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN part p     ON u.l_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_size < 15 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_brand, s_name, n_name,
           ROUND(unit_cost, 4) AS unit_cost
    FROM cand WHERE unit_cost = best
    ORDER BY p_partkey, s_name LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region. The
    reference's partsupp.ps_supplycost is adapted to the min observed
    unit price from lineitem. The correlated MIN subquery decorrelates
    to a partition window over the candidate set (already reduced to
    ~|parts in region| rows), so the heavy fact is touched once; all
    dims broadcast. MIN of doubles is selection, not accumulation —
    exact in both engines, so the equality predicate is hash-safe."""
    l = read_table(spark, sf_dir, "lineitem")
    unit = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 15) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        unit.join(F.broadcast(s), unit.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), unit.l_partkey == p.p_partkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("best", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
      SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND({oracle_exact_sum(
               "CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
             / {oracle_exact_sum('volume')}, 6) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional order volume per
    year. Eight-table join — every non-lineitem side broadcasts, so the
    fact streams through a single stage into one year-keyed exchange.
    Share = ratio of two grid-snapped decimal-exact sums; the final
    division is one IEEE double op on both engines (registry float
    contract)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n1 = read_table(spark, sf_dir, "nation").alias("n1")
    n2 = read_table(spark, sf_dir, "nation").alias("n2")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    flat = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            F.round(
                exact_sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                    .otherwise(F.lit(0))
                )
                / exact_sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           {oracle_exact_sum(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.5 * p.p_retailprice * l.l_quantity")} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name pattern. partsupp.ps_supplycost is adapted to a
    0.5 * retailprice * quantity cost proxy — same expression tree on
    both engines, so each row's double is identical before the
    decimal-exact accumulation. part/supplier/nation broadcast; the
    orders join is the only fact-fact shuffle."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(exact_sum("amount").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey AS p_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(30,8))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY l.l_partkey
    )
    SELECT p_partkey, ROUND(CAST(v AS DOUBLE), 4) AS part_value
    FROM val
    WHERE v > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM val)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose regional trade value exceeds a
    fraction of the regional total. The scalar subquery decorrelates to
    a 1-row aggregate of the SAME grouped frame, re-joined by broadcast
    cross join (Spark plans a BroadcastNestedLoopJoin over one row — no
    driver collect). Per-part values accumulate in exact decimal on both
    engines; the 0.001 threshold is then derived identically on both
    sides as CAST(exact_sum AS DOUBLE) * 0.001, so the boundary
    comparison is double-vs-decimal with bit-identical thresholds
    (Spark's decimal*double promotion would otherwise diverge from
    DuckDB's decimal-literal arithmetic on boundary rows)."""
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    _DEC
                )
            ).alias("v")
        )
    )
    total = val.agg(
        (F.sum("v").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select(
            "p_partkey", F.round(F.col("v").cast("double"), 4).alias("part_value")
        )
    )


@query(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of orders-per-customer including
    zero-order customers — a LEFT join with an extra join-side predicate
    (NOT a post-filter: that would drop the NULL probe rows), then two
    stacked aggregations. The second groupBy reduces ~|customers| rows
    to ~|distinct counts| — trivially small, no skew concern."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,8))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(CAST(rev.r AS DOUBLE), 4) AS total_revenue
    FROM rev JOIN supplier s ON rev.s_suppkey = s.s_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The view + scalar-MAX subquery decorrelates to a global-MAX window
    over the grouped frame — ties are kept, exactly like the SQL. A
    1-row-aggregate re-join would recompute the fact lineage (Spark's
    ReuseExchange does not fire across the AQE-planned diamond, measured:
    lineitem scanned twice); the window keeps it to ONE fact scan, and
    its single partition holds only |suppliers| rows — dim-sized at any
    scale. Revenue stays decimal through the equality (exact in both
    engines); the date filter pushes to the parquet scan."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("r_suppkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
        ).alias("r")
    )
    w = Window.partitionBy(F.lit(1))
    s = read_table(spark, sf_dir, "supplier")
    return (
        rev.withColumn("best_r", F.max("r").over(w))
        .filter(F.col("r") == F.col("best_r"))
        .drop("best_r")
        .join(F.broadcast(s), F.col("r_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 9, 14, 19, 23)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    bucket, excluding a supplier denylist. NOT IN becomes a broadcast
    LEFT ANTI join (s_suppkey is non-null, so the null-semantics trap
    of NOT IN doesn't bite); part filters broadcast; COUNT(DISTINCT)
    plans as the standard two-phase expand+reduce."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23)
    )
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,8)))
                      AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p    ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.qty_threshold
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders. The
    correlated per-part AVG decorrelates to a grouped aggregate joined
    back by broadcast (the agg output is |parts|-sized, tiny next to
    lineitem). The threshold is written as the identical expression
    tree on both sides — decimal-exact sum, one division, one 0.2
    multiply — so the strict comparison is ulp-identical."""
    l = read_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                    / F.lit(7.0),
                    4,
                )
            ).alias("avg_yearly")
        )
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
    WITH qual AS (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(30,8))) > 50
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s.s_suppkey
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation who moved real volume
    of a part-name family in a year — a nested-aggregate semi-join
    (partsupp availability adapted to shipped-quantity HAVING). The
    inner aggregate reduces lineitem to (supp,part) groups before any
    join against the supplier dim; IN becomes LEFT SEMI on the distinct
    qualifying supplier keys."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qual = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_7'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier who single-handedly delayed
    multi-supplier orders ("late" adapted to shipdate > orderdate+60d —
    the fixture has no commit/receipt dates). The EXISTS / NOT-EXISTS
    pair decorrelates to per-order distinct-supplier stats computed on
    ONE exchange via collect_set windows (orders average ~7 lines, so
    the set is tiny): qualifying row = late AND >1 supplier in the
    order AND exactly 1 distinct late supplier. Re-using the window
    partitioning avoids the two extra self-join shuffles the literal
    EXISTS plan would cost."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l = read_table(spark, sf_dir, "lineitem")
    joined = l.join(
        o.select("o_orderkey", "o_orderdate"),
        l.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    per_order = joined.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    return (
        per_order.filter(
            F.col("is_late")
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
