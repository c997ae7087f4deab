"""§2.D — aggregations.

groupBy/agg compiles to partial (map-side) aggregation + shuffle on the
group key + final merge — at 100 TB only the per-group partials cross the
network, never raw rows. Floating sums use the decimal-exact helpers so
results are bit-identical regardless of partition order (registry docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import (
    exact_avg,
    exact_sum,
    oracle_exact_avg,
    oracle_exact_sum,
    query,
)


@query("agg_running_count", oracle="SELECT COUNT(*) AS rows_processed FROM events")
def agg_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running row count (reference accumulates per chunk app.py:99,185;
    batch form is count, streaming form is observe() — see streaming/)."""
    return read_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("rows_processed")
    )


@query(
    "agg_groupby",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {oracle_exact_sum('o_totalprice')} AS sum_price,
           {oracle_exact_avg('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice").alias("sum_price"),
            exact_avg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
    )


@query(
    "agg_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_envelope
    FROM events
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100-TB way to count
    distinct user_ids without a full shuffle of the key space.

    BOUND oracle (round-6 verdict item 4): the raw HLL estimate is
    engine-private (Spark's register layout ≠ any SQL oracle, §7.4.6),
    but its accuracy CONTRACT is checkable — HLL++ register merge is a
    max, so the estimate is deterministic for a given dataset, and the
    query emits ``within_envelope`` = |approx − exact| / exact ≤ 5·rsd
    alongside the exact count. The oracle computes the exact count and
    asserts the envelope literally, so a drifting or broken sketch
    hash-mismatches instead of hiding behind a rows-only check."""
    rsd = 0.02
    agg = read_table(spark, sf_dir, "events").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    ).cast("double")
    return agg.select(
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (err <= F.lit(5 * rsd)).alias("within_envelope"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (flag,status), (flag), () — Spark expands grouping sets in
    a single pass; GROUPING() disambiguates the null super-rows."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        )
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_linestatus,
           {oracle_exact_sum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END")}
             AS returned_qty,
           {oracle_exact_sum("CASE WHEN l_discount > 0.05 THEN l_extendedprice * l_discount ELSE 0 END")}
             AS big_discount_value,
           COUNT(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_high_tax
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        exact_sum(
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(0.0)
        ).alias("returned_qty"),
        exact_sum(
            F.when(
                F.col("l_discount") > 0.05,
                F.col("l_extendedprice") * F.col("l_discount"),
            ).otherwise(0.0)
        ).alias("big_discount_value"),
        F.count(F.when(F.col("l_tax") > 0.04, 1)).alias("n_high_tax"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
           ROUND(VAR_SAMP(c_acctbal), 4) AS var_bal,
           ROUND(CORR(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) + 0.0
             AS corr_bal_key,
           ROUND(MEDIAN(c_acctbal), 6) AS median_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/var/corr/percentile. These are rounded (not decimal-exact):
    variance accumulation is inherently order-dependent in doubles, and
    ROUND(x, 4) absorbs the ulp drift; exact median via percentile.

    The corr adds ``+ 0.0`` AFTER the round on both engines (round-13
    sf1 parity sweep, SURVEY §7.4.10): a true correlation of ~±1e-15
    rounds to a SIGNED zero whose sign is accumulation-order noise —
    one engine prints 0.0, the other -0.0, and the float-repr hash
    diverges. IEEE −0.0 + 0.0 = +0.0 collapses both."""
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
        (
            F.round(
                F.corr("c_acctbal", F.col("c_custkey").cast("double")), 6
            )
            + F.lit(0.0)
        ).alias("corr_bal_key"),
        # rounded like the other float columns: percentile/MEDIAN interpolate
        # between two values for even-sized groups and may differ in the
        # last ulp across engines
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 6).alias("median_bal"),
    )


@query(
    "agg_skew_salted",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {oracle_exact_sum('value')} AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed group keys: stage 1
    groups on (key, salt) — a hot key's rows spread over 16 reducers —
    stage 2 merges the per-salt partials. Result identical to a direct
    groupBy (the oracle IS the direct form); the pattern is the manual
    fallback when AQE skew handling isn't enough (e.g. one key holding
    half of 100 TB). Salt must be deterministic for oracle parity —
    md5 of the row's event_id, never rand()."""
    from parquet_importer_spark.functions.text import md5_bucket

    ev = read_table(spark, sf_dir, "events")
    _DEC = "decimal(30,8)"
    stage1 = (
        ev.withColumn("salt", md5_bucket(F.col("event_id").cast("string"), 7, 1))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(_DEC)).alias("pv"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv").cast("double"), 4).alias("total_value"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type. Pivot values are DECLARED, not discovered — `pivot(col)`
    without values runs an extra distinct-scan job and, at 100 TB, can
    explode the schema; fixing the value list keeps this a single
    ordinary groupBy with conditional aggregates (which is exactly what
    Catalyst lowers pivot to)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id",
            *[F.col(c).cast("bigint").alias(c)
              for c in ("click", "error", "purchase", "signup", "view")],
        )
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT doc_id, metric, CAST(v AS BIGINT) AS value
    FROM (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    ) UNPIVOT (v FOR metric IN (n_chars, n_tokens))
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): per-doc metrics melted to (doc_id, metric,
    value) rows — the shape feature stores and plotting layers want.
    Narrow map-side transform (stack), no shuffle."""
    from parquet_importer_spark.functions.text import token_count

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return d.unpivot(
        ids=["doc_id"],
        values=["n_chars", "n_tokens"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_lo,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE), 4) AS total
    FROM orders
    GROUP BY bucket_lo
    ORDER BY bucket_lo
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: floor-division bucketing is
    a pure projection, so the aggregate shuffles only ~10 bucket groups
    — the 100 TB histogram costs one partial+final reduction, same as a
    count(*)."""
    bucket = (F.floor(F.col("o_totalprice") / 50000).cast("bigint") * 50000).alias(
        "bucket_lo"
    )
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                .cast("double"),
                4,
            ).alias("total"),
        )
        .orderBy("bucket_lo")
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           TRUE AS within_q25, TRUE AS within_q50, TRUE AS within_q75
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch, accuracy 1e-4)
    of order value per priority — the 100 TB alternative to exact
    `percentile` (which must materialize each group's values): sketches
    merge map-side like any partial aggregate, so the shuffle carries
    fixed-size summaries, not value lists.

    BOUND oracle (round-6 verdict item 4 pattern): the sketch values
    themselves are merge-order-dependent, but the GK RANK guarantee —
    rank(q̂_p)/n ∈ [p − ε, p + ε] — holds for EVERY merge order, so the
    query re-joins the estimates against the rows and emits one
    within_q{25,50,75} flag per group (ε = 10⁻³, 10× the sketch's
    configured 10⁻⁴ for slack), alongside the exact group min/max. The
    oracle recomputes min/max and asserts the flags literally: a broken
    sketch or a silently loosened accuracy hash-mismatches."""
    eps = 1.0 / 1000
    q = F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75], 10000)
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    est = o.groupBy("o_orderpriority").agg(
        q.alias("qs"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    j = o.join(F.broadcast(est), "o_orderpriority")
    n = F.count(F.lit(1)).cast("double")

    def rank_flags(pos: int, p: float):
        v = F.col("qs").getItem(pos)
        le = F.sum((F.col("o_totalprice") <= v).cast("bigint")).cast("double")
        lt = F.sum((F.col("o_totalprice") < v).cast("bigint")).cast("double")
        return ((le / n) >= F.lit(p - eps)) & ((lt / n) <= F.lit(p + eps))

    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            rank_flags(0, 0.25).alias("within_q25"),
            rank_flags(1, 0.50).alias("within_q50"),
            rank_flags(2, 0.75).alias("within_q75"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_rollup_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n_rows,
           {oracle_exact_sum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate over (returnflag, linestatus) with GROUPING id to
    disambiguate subtotal rows from genuine NULL keys. Spark expands
    the cube map-side (each input row feeds all 2^k grouping sets in
    the partial aggregate) — one shuffle total, identical to a plain
    groupBy at any scale."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")


@query(
    "agg_hll_partial_union",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_envelope
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting — THE 100 TB rollup pattern:
    per-(event_type, day) HLL sketches are built once (e.g. by a daily
    job), then any coarser rollup UNIONS the sketch bytes instead of
    re-scanning raw events. Here: day-grain hll_sketch_agg → union to
    per-type totals. Unlike approx_count_distinct, the intermediate
    sketches are materializable columns — store them in the daily
    table and month/segment/anything rollups become metadata-sized
    merges.

    BOUND oracle (round-6 verdict item 4 pattern): sketch bytes are
    engine-private, but HLL register union is a per-register max —
    commutative, so the merged estimate is deterministic per dataset —
    and the default lgConfigK=12 datasketches profile carries an rsd of
    ~1.04/√4096 ≈ 1.6%. The query emits the exact per-type distinct
    count plus a within-5·rsd envelope flag on the unioned estimate;
    the oracle recomputes the exact side and asserts the flag, so a
    union that corrupts registers (or a silently shrunk sketch)
    hash-mismatches."""
    rsd = 1.04 / (4096.0**0.5)
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    unioned = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    ).cast("double")
    return (
        unioned.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (err <= F.lit(5 * rsd)).alias("within_envelope"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_bitmap_distinct_rollup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting — the precise sibling of
    agg_hll_partial_union: per-(type, day, bucket) roaring-style bitmaps
    of user ids (bitmap_construct_agg), OR-merged across days per
    bucket, then counted and summed over buckets. Because bitmaps are
    exact, the rollup equals COUNT(DISTINCT) bit-for-bit — hence a full
    SQL oracle — while staying mergeable: store the day-grain bitmap
    column and any coarser distinct rollup is a bitmap OR, never a
    re-scan of raw events. Bucketing (bitmap_bucket_number) bounds each
    bitmap to a fixed id range, so state per group is capped at any key
    cardinality."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.bitmap_bucket_number("user_id").alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    merged = daily.groupBy("event_type", "bkt").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return (
        merged.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


@query(
    "agg_mode_argmax",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    ranked AS (
      SELECT c_mktsegment, c_nationkey, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, c_nationkey ASC) AS rn
      FROM counts
    )
    SELECT c_mktsegment,
           c_nationkey AS modal_nation,
           n AS modal_count
    FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
    """,
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value per group, smallest value
    breaking ties) — built as count + top-1 window rather than the
    engines' mode()/F.mode, whose tie choice is unspecified and
    therefore un-oracle-able. Two narrow aggregations: the count
    shuffles on the composite key, the argmax window runs over the tiny
    per-group count table."""
    c = read_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("modal_nation"),
            F.col("n").alias("modal_count"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_weighted_avg",
    oracle=f"""
    SELECT l_returnflag,
           {oracle_exact_sum('l_extendedprice * l_discount')}
             / {oracle_exact_sum('l_extendedprice')} AS wavg_discount,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (price-weighted mean discount) — sum(w·x)/sum(w)
    with BOTH sums decimal-exact and grid-snapped, then one IEEE
    division performed identically by each engine. The same partial+
    final shape as a plain mean; weights add no extra pass."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            (
                exact_sum(F.col("l_extendedprice") * F.col("l_discount"))
                / exact_sum(F.col("l_extendedprice"))
            ).alias("wavg_discount"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_winsorize",
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
      FROM lineitem
    ),
    bounds AS (
      SELECT l_returnflag,
             MIN(CASE WHEN rn = CAST(FLOOR(0.05 * (cnt - 1)) AS BIGINT) + 1
                      THEN l_extendedprice END) AS p05,
             MIN(CASE WHEN rn = CAST(FLOOR(0.95 * (cnt - 1)) AS BIGINT) + 1
                      THEN l_extendedprice END) AS p95
      FROM r GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(b.p05, 2) AS p05,
           ROUND(b.p95, 2) AS p95,
           {oracle_exact_sum('l.l_extendedprice', 2)} AS raw_sum,
           {oracle_exact_sum(
               'GREATEST(b.p05, LEAST(b.p95, l.l_extendedprice))', 2)}
             AS winsorized_sum
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag, b.p05, b.p95
    ORDER BY l.l_returnflag
    """,
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation — robust-stats outlier clipping: per-group
    exact 5th/95th percentiles by rank selection (the value at sorted
    position floor(p·(n-1)) — well-defined under ties, no
    interpolation, so both engines agree bit-for-bit), then sums of the
    clipped values next to the raw sums. One window sort per group +
    a broadcast join-back of the 1-row-per-group bounds table. At
    100 TB swap the exact rank selection for approx_percentile
    thresholds (same clip expression, two narrow passes, no full
    sort)."""
    from pyspark.sql import Window

    l = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wc = Window.partitionBy("l_returnflag")
    r = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    def at(p: float):
        idx = F.floor(F.lit(p) * (F.col("cnt") - 1)).cast("bigint") + 1
        return F.min(
            F.when(F.col("rn") == idx, F.col("l_extendedprice"))
        )
    bounds = r.groupBy("l_returnflag").agg(
        at(0.05).alias("p05"), at(0.95).alias("p95")
    )
    clipped = F.greatest(
        F.col("p05"), F.least(F.col("p95"), F.col("l_extendedprice"))
    )
    return (
        l.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum("l_extendedprice", 2).alias("raw_sum"),
            exact_sum(clipped, 2).alias("winsorized_sum"),
        )
        .select(
            "l_returnflag",
            "n_items",
            F.round("p05", 2).alias("p05"),
            F.round("p95", 2).alias("p95"),
            "raw_sum",
            "winsorized_sum",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_count_min",
    oracle="""
    WITH cells AS (
      SELECT r.r AS r,
             substr(md5('cm' || CAST(r.r AS VARCHAR) || '|'
                        || CAST(user_id AS VARCHAR)), 1, 2) AS b,
             COUNT(*) AS cnt
      FROM events, (SELECT unnest(range(0, 4)) AS r) r
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT user_id, r.r AS r,
             substr(md5('cm' || CAST(r.r AS VARCHAR) || '|'
                        || CAST(user_id AS VARCHAR)), 1, 2) AS b
      FROM events, (SELECT unnest(range(0, 4)) AS r) r
    ),
    est AS (
      SELECT p.user_id, MIN(c.cnt) AS est_count
      FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
      GROUP BY p.user_id
    ),
    truth AS (
      SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY user_id
    )
    SELECT e.user_id, CAST(e.est_count AS BIGINT) AS est_count,
           CAST(t.true_count AS BIGINT) AS true_count
    FROM est e JOIN truth t ON e.user_id = t.user_id
    ORDER BY est_count DESC, e.user_id ASC
    LIMIT 10
    """,
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: 4 hash rows × 256 buckets (md5
    hex-prefix bucketing, engine-portable), per-key estimate = min over
    rows of its bucket's count, reported against the exact count for
    the top-10 estimated users.

    Why a sketch at all: the (r, bucket) cell grid is FIXED-SIZE
    (4×256 here, 4×2^20 in production) and mergeable — partial
    aggregation reduces each input split to ≤1024 cells before the
    shuffle, so sketching 100 TB of keys costs one map-combinable
    pass regardless of key cardinality, and sketches from different
    days/shards union by cell-wise addition. The estimate probe reuses
    the same md5 family, so DuckDB reproduces every cell and estimate
    exactly (CMS is deterministic for fixed hashes — only its ERROR is
    probabilistic, and the true_count column exposes exactly that
    overestimate)."""
    ev = read_table(spark, sf_dir, "events")
    rows = F.array(*[F.lit(r) for r in range(4)])
    keyed = ev.select("user_id", F.explode(rows).alias("r")).select(
        "user_id",
        "r",
        F.substring(
            F.md5(
                F.concat(
                    F.lit("cm"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            2,
        ).alias("b"),
    )
    cells = keyed.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))
    probes = keyed.select("user_id", "r", "b").distinct()
    est = (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return (
        est.join(truth, "user_id")
        .select(
            "user_id",
            F.col("est_count").cast("bigint").alias("est_count"),
            F.col("true_count").cast("bigint").alias("true_count"),
        )
        .orderBy(F.col("est_count").desc(), F.col("user_id").asc())
        .limit(10)
    )


@query(
    "agg_percentile_disc",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    p AS (SELECT UNNEST([0.25, 0.5, 0.75, 0.99]) AS p)
    SELECT r.o_orderpriority, CAST(p.p AS DOUBLE) AS p,
           r.o_totalprice AS pct_value, CAST(r.n AS BIGINT) AS n_rows
    FROM r JOIN p
      ON r.rn = CAST(CEIL(CAST(p.p AS DOUBLE) * r.n) AS BIGINT)
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (percentile_disc semantics: the
    SMALLEST value whose cumulative rank reaches p — an actual data
    element, never an interpolation) per group, at p25/p50/p75/p99.
    Implemented as explicit rank selection — row_number over the
    group's sort, pick rn = ceil(p·n) — rather than the builtin, so
    tie-breaking (by o_orderkey) is pinned and both engines agree
    bit-for-bit; interpolating percentile_cont variants differ across
    engines in their blend arithmetic, disc selection cannot.

    Scale shape: one shuffle+sort per group partition (the same
    exchange serves row_number AND the windowed count), then a
    broadcast of the 4-row percentile spec. ceil(p·n) is a single
    identical IEEE multiply on both engines, so the selected rank is
    deterministic even at p = 0.99 where p has no exact binary form."""
    o = read_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    p = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.99)])).alias("p")
    )
    return r.join(
        F.broadcast(p),
        F.col("rn") == F.ceil(F.col("p") * F.col("n")).cast("bigint"),
    ).select(
        "o_orderpriority",
        F.col("p").cast("double").alias("p"),
        F.col("o_totalprice").alias("pct_value"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


# --- KMV (k-minimum-values) distinct sketches ------------------------------
# 60-bit uniform hash = first 15 md5 hex chars; estimator D = (k-1)·U/h(k)
# with U = 2^60 (Bar-Yossef et al. 2002, the Theta-sketch special case).
# Every arithmetic step is either exact BIGINT or ONE shared IEEE double
# op, so the DuckDB oracle reproduces the estimate bit-for-bit.

_KMV_K = 32
_KMV_U = 1152921504606846976.0  # 2^60, exact as a double


def _kmv_est(kth, n_cnt):
    """(k-1)·U / kth as a floor'd BIGINT; exact count when n < k."""
    est = F.floor(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_U) / F.col(kth).cast("double")
    )
    return F.when(F.col(n_cnt) >= _KMV_K, est).otherwise(
        F.col(n_cnt)
    ).cast("bigint")


def _kmv_est_sql(kth: str, n_cnt: str) -> str:
    return (
        f"CAST(CASE WHEN {n_cnt} >= {_KMV_K} THEN "
        f"FLOOR(CAST({_KMV_K - 1} AS DOUBLE) * 1152921504606846976.0 "
        f"/ CAST({kth} AS DOUBLE)) ELSE {n_cnt} END AS BIGINT)"
    )


_KMV_BASE_SQL = """
      SELECT DISTINCT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM orders
"""


def _kmv_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (group, 60-bit hash) pairs — the pre-sketch stream."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderpriority").alias("grp"),
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    ).distinct()


_KMV_BUCKETS = 64


def _kmv_pruned(base: DataFrame) -> DataFrame:
    """Two-stage min-k selection exploiting the sketch's mergeable
    property (min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B))): stage 1
    buckets the deduped stream by pmod(h, P) and keeps each bucket's
    k smallest — every element of the group-global min-k is inside its
    own bucket's min-k, so nothing is lost — then stage 2 ranks the
    ≤ k·P survivors per group. No sort ever sees a whole group: the
    stage-1 windows partition on (grp, bucket) (P-way parallel, each
    ~|grp|/P rows) and the stage-2 window input is capped at k·P rows
    per group regardless of data volume. With 5 priority groups the
    naive single window had parallelism 5 and sorted full groups; this
    runs 5·P-way and is how the sketch behaves on a real cluster.

    Returns (grp, h, rb, nb, rn): rb/nb = rank and total count within
    the stage-1 bucket (nb at rb=1 reconstructs the group's exact
    distinct total), rn = group-global rank among survivors."""
    from pyspark.sql import Window

    wb = Window.partitionBy("grp", "b").orderBy("h")
    wbc = Window.partitionBy("grp", "b")
    pruned = (
        base.select(
            "grp", "h", F.pmod(F.col("h"), F.lit(_KMV_BUCKETS)).alias("b")
        )
        .select(
            "grp",
            "h",
            F.row_number().over(wb).alias("rb"),
            F.count(F.lit(1)).over(wbc).alias("nb"),
        )
        .filter(F.col("rb") <= _KMV_K)
    )
    return pruned.select(
        "grp",
        "h",
        "rb",
        "nb",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("h"))
        .alias("rn"),
    )


@query(
    "agg_kmv_distinct",
    oracle=f"""
    WITH base AS ({_KMV_BASE_SQL}),
    r AS (
      SELECT grp, h,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n_h
      FROM base
    ),
    sk AS (
      SELECT grp, CAST(MAX(n_h) AS BIGINT) AS n_h,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
      FROM r GROUP BY grp
    ),
    ex AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY 1
    )
    SELECT sk.grp, CAST({_KMV_K} AS INT) AS k_used, sk.kth AS kth_min_hash,
           {_kmv_est_sql("sk.kth", "sk.n_h")} AS est_distinct,
           ex.exact_distinct
    FROM sk JOIN ex USING (grp)
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / Theta) distinct-count sketch per group,
    k = 32: keep the k smallest 60-bit hashes of the value stream; the
    kth smallest order statistic estimates D = (k-1)·2^60/h(k). Unlike
    approx_count_distinct (engine-private HLL, rows-only checkable,
    agg_approx_distinct) this sketch is fully deterministic given the
    md5 family — so the ORACLE CAN CHECK THE ESTIMATE ITSELF, including
    the exact-fallback branch for groups with fewer than k values. The
    result carries the true distinct count alongside for an honest
    error reading (bounded ~1/sqrt(k) ≈ 18% rel. err at k=32;
    production would use k = 1024+).

    Scale shape: the (grp, h) distinct is a partial-aggregatable
    dedup (map-side combine absorbs repeats before the shuffle); the
    order-statistic selection is the TWO-STAGE min-k of _kmv_pruned —
    per-(grp, pmod(h, 64)) bucket windows first (5·64-way parallel,
    exploiting min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B))), then a
    group rank over the ≤ k·64 survivors — so no sort ever touches a
    whole group; the exact distinct total reassembles exactly from the
    per-bucket counts (Σ nb at rb=1). agg_kmv_union exercises the same
    mergeability across groups; at 100 TB the per-partition partial
    sketches are 32×8 bytes regardless of input size."""
    base = _kmv_base(spark, sf_dir)
    pruned = _kmv_pruned(base)
    sk = pruned.groupBy("grp").agg(
        F.sum(F.when(F.col("rb") == 1, F.col("nb")))
        .cast("bigint")
        .alias("n_h"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
    )
    ex = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct"))
    )
    return sk.join(ex, "grp").select(
        "grp",
        F.lit(_KMV_K).cast("int").alias("k_used"),
        F.col("kth").alias("kth_min_hash"),
        _kmv_est("kth", "n_h").alias("est_distinct"),
        "exact_distinct",
    )


@query(
    "agg_kmv_union",
    oracle=f"""
    WITH base AS ({_KMV_BASE_SQL}),
    r AS (
      SELECT grp, h,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
      FROM base
    ),
    sketches AS (SELECT grp, h FROM r WHERE rn <= {_KMV_K}),
    u AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM sketches)
    ),
    usk AS (
      SELECT MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth,
             CAST(COUNT(*) AS BIGINT) AS n_h
      FROM u WHERE rn <= {_KMV_K}
    ),
    uex AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_d
      FROM orders
    ),
    a AS (SELECT h FROM sketches WHERE grp = '1-URGENT'),
    b AS (SELECT h FROM sketches WHERE grp = '5-LOW'),
    theta AS (
      SELECT LEAST((SELECT MAX(h) FROM a), (SELECT MAX(h) FROM b)) AS th
    ),
    inter AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS c
      FROM a JOIN b ON a.h = b.h, theta WHERE a.h <= theta.th
    ),
    iex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_d FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      )
    )
    SELECT 'union_all_groups' AS op,
           {_kmv_est_sql("usk.kth", "usk.n_h")} AS est_distinct,
           uex.exact_d AS exact_distinct
    FROM usk, uex
    UNION ALL
    SELECT 'intersect_urgent_low' AS op,
           CAST(FLOOR(CAST(inter.c AS DOUBLE) * 1152921504606846976.0
                      / CAST(theta.th AS DOUBLE)) AS BIGINT) AS est_distinct,
           iex.exact_d AS exact_distinct
    FROM inter, theta, iex
    """,
)
def agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the reason mergeable sketches matter at
    100 TB: per-group sketches (32 hashes each) combine WITHOUT
    re-touching the data. Union: the k smallest of the concatenated
    sketches is exactly min-k(A ∪ B), so the union estimate reuses the
    same (k-1)·U/h(k) estimator. Intersection (the Theta-sketch rule):
    clip both sketches at θ = min(max_sample_A, max_sample_B); below θ
    each sketch is a uniform sample of its set, so |A∩B| ≈ c·U/θ where
    c counts common hashes ≤ θ. Estimates and exact counts ship
    side-by-side, and every step is integer-exact or one shared IEEE
    op, so the oracle checks the ESTIMATES themselves.

    Scale shape: group sketches come from the same two-stage bucketed
    min-k selection as agg_kmv_distinct (_kmv_pruned — no sort over a
    whole group, 5·64-way parallel); everything after operates on
    ≤ 5·32 rows — driver-free, broadcast-sized. This is the
    sketch-rollup pattern (per-partition/per-day sketches folded into
    monthly/global cards) that replaces COUNT(DISTINCT) over
    re-scanned history."""
    from pyspark.sql import Window

    base = _kmv_base(spark, sf_dir)
    # the per-group sketches feed the union rank, both intersection
    # sides and the theta clip — without a checkpoint each branch
    # re-ran the full bucketed min-k selection over orders (r14
    # measured: 80 Exchange occurrences in the plan; guide §2.4).
    # ≤ 5·K rows — free to hold; this IS the "sketches persist,
    # data doesn't" contract the docstring describes.
    sketches = (
        _kmv_pruned(base)
        .filter(F.col("rn") <= _KMV_K)
        .select("grp", "h")
        .localCheckpoint(eager=False)
    )
    u = (
        sketches.select("h")
        .distinct()
        .select("h", F.row_number().over(Window.orderBy("h")).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
    )
    usk = u.agg(
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth"),
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
    )
    orders = read_table(spark, sf_dir, "orders")
    uex = orders.agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_d")
    )
    union_row = usk.crossJoin(uex).select(
        F.lit("union_all_groups").alias("op"),
        _kmv_est("kth", "n_h").alias("est_distinct"),
        F.col("exact_d").alias("exact_distinct"),
    )
    a = sketches.filter(F.col("grp") == "1-URGENT").select("h")
    b = sketches.filter(F.col("grp") == "5-LOW").select("h")
    theta = a.agg(F.max("h").alias("tha")).crossJoin(
        b.agg(F.max("h").alias("thb"))
    ).select(F.least("tha", "thb").alias("th"))
    inter = (
        a.join(b, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") <= F.col("th"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .crossJoin(F.broadcast(theta))
    )
    iex = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .intersect(
            orders.filter(F.col("o_orderpriority") == "5-LOW")
            .select("o_custkey")
            .distinct()
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_d"))
    )
    inter_row = inter.crossJoin(iex).select(
        F.lit("intersect_urgent_low").alias("op"),
        F.floor(
            F.col("c").cast("double")
            * F.lit(_KMV_U)
            / F.col("th").cast("double")
        )
        .cast("bigint")
        .alias("est_distinct"),
        F.col("exact_d").alias("exact_distinct"),
    )
    return union_row.unionByName(inter_row)


@query(
    "agg_ols_by_group",
    oracle="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS hb,
             SUM(CAST(round(value * 100) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2
    ),
    x AS (
      SELECT event_type, y,
             CAST(hb - MIN(hb) OVER (PARTITION BY event_type) AS BIGINT) AS x
      FROM h
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy
      FROM x GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
           CASE WHEN n * sxx - sx * sx <= 0 THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
           CASE WHEN n * sxx - sx * sx <= 0
                THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                ELSE (CAST(sy AS DOUBLE)
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) END AS intercept,
           CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0
                THEN 0.0
                ELSE (CAST(n * sxy - sx * sy AS DOUBLE)
                      * CAST(n * sxy - sx * sy AS DOUBLE))
                     / (CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
    FROM m
    """,
)
def agg_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group OLS: regress each event type's hourly
    total on the hour index — slope (trend per hour), intercept, and
    R² in one aggregation pass. The least-squares complement of
    ts_theilsen_trend (which trades efficiency for outlier
    robustness); this is the grouped-regression primitive BI layers
    push down as REGR_SLOPE/REGR_R2.

    Float contract (the ts_autocorr discipline): y is an exact BIGINT
    cents total, x is the hour offset from each series' first bucket
    (window MIN subtraction keeps magnitudes tiny, so every moment —
    Σx, Σy, Σx², Σy², Σxy — is exact in DECIMAL(38,0)); slope,
    intercept, and R² evaluate as single shared IEEE expression trees
    over the exact moments (cov² squares in DOUBLE on both sides —
    DuckDB promotes over-wide decimal products to double, so the
    square must too), with zero-variance groups pinned before any
    division.

    Scale shape: one map-combinable rollup to (type, hour) grain (the
    only full-data pass), one window MIN on the tiny hourly frame
    riding the same partitioning, one moments aggregation. REGR_* at
    100 TB is exactly this plan."""
    ev = read_table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        (
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("bigint")
            / F.lit(3600)
        ).cast("bigint").alias("hb"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("y"))
    w = Window.partitionBy("event_type")
    x = h.select(
        "event_type",
        "y",
        (F.col("hb") - F.min("hb").over(w)).cast("bigint").alias("x"),
    )
    _D = "decimal(38,0)"
    # the PRODUCTS promote to decimal BEFORE multiplying (round-12
    # census find: sf100 threw ARITHMETIC_OVERFLOW — hourly totals y
    # grow with corpus density while the hour count stays fixed, so
    # SUM(y*y) exceeds BIGINT one decade after the driver SFs; the
    # docstring's "every moment is exact in DECIMAL(38,0)" promise now
    # holds for the multiply too. Same integers at every SF that
    # didn't throw; the moments frame is |types|x|hours| rows, so the
    # decimal math costs nothing)
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_D).alias("n"),
        F.sum("x").cast(_D).alias("sx"),
        F.sum("y").cast(_D).alias("sy"),
        F.sum(xd * xd).cast(_D).alias("sxx"),
        F.sum(yd * yd).cast(_D).alias("syy"),
        F.sum(xd * yd).cast(_D).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(vx <= 0, F.lit(0.0)).otherwise(
        cov.cast("double") / vx.cast("double")
    )
    intercept = F.when(
        vx <= 0, sy.cast("double") / n.cast("double")
    ).otherwise(
        (
            sy.cast("double")
            - (cov.cast("double") / vx.cast("double")) * sx.cast("double")
        )
        / n.cast("double")
    )
    r2 = F.when((vx <= 0) | (vy <= 0), F.lit(0.0)).otherwise(
        (cov.cast("double") * cov.cast("double"))
        / (vx.cast("double") * vy.cast("double"))
    )
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_buckets"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


@query(
    "agg_welch_ttest",
    oracle="""
    WITH y AS (
      SELECT event_type,
             user_id % 2 AS arm,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type, arm,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
             CAST(SUM(cents * cents) AS DECIMAL(38,0)) AS ss
      FROM y GROUP BY 1, 2
    ),
    p AS (
      SELECT event_type,
             MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN s END) AS s0,
             MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN s END) AS s1,
             MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
      FROM m GROUP BY event_type
    ),
    v AS (
      SELECT event_type,
             CAST(n0 AS BIGINT) AS n_ctl, CAST(n1 AS BIGINT) AS n_trt,
             CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean_ctl,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_trt,
             CAST(n0 * ss0 - s0 * s0 AS DOUBLE)
               / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE) AS se0,
             CAST(n1 * ss1 - s1 * s1 AS DOUBLE)
               / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE) AS se1
      FROM p
    )
    SELECT event_type, n_ctl, n_trt, mean_ctl, mean_trt,
           CASE WHEN se0 + se1 <= 0 THEN 0.0
                ELSE (mean_trt - mean_ctl) / sqrt(se0 + se1) END AS t_stat,
           CASE WHEN se0 + se1 <= 0 THEN 0.0
                ELSE ((se0 + se1) * (se0 + se1))
                     / (se0 * se0 / CAST(n_ctl - 1 AS DOUBLE)
                        + se1 * se1 / CAST(n_trt - 1 AS DOUBLE)) END AS dof,
           CASE WHEN se0 + se1 <= 0 THEN FALSE
                ELSE abs((mean_trt - mean_ctl) / sqrt(se0 + se1)) >= 1.96
                END AS significant
    FROM v
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Welch two-sample t-test — the A/B-experiment readout
    (unequal variances, Welch–Satterthwaite dof): users split into
    control/treatment by user_id parity, metric = event value in
    cents, one row per event type with means, t statistic, dof, and a
    |t| ≥ 1.96 significance flag. The experimentation-platform
    primitive next to agg_ols_by_group's REGR_* family.

    Float contract (the OLS discipline): cents are exact BIGINTs, so
    every moment (n, Σy, Σy²) is exact in DECIMAL(38,0); each
    standard-error term evaluates as one shared IEEE expression tree
    over the exact moments — (n·ss − s²)/(n·(n−1))/n with the
    variance numerator formed IN DECIMAL (exact) before the two
    double divisions — and t/dof/significance reuse those terms
    identically on both engines. Zero-variance arms pin t = dof = 0
    before any division.

    Scale shape: ONE map-combinable corpus rollup to (type, arm)
    grain — 2|types| rows — then a |types|-row pivot and pure
    projection. This is the minimum possible plan for any moment
    statistic; at 100 TB the t-test costs exactly one scan. CUPED or
    stratified variants add covariate moments to the same rollup, not
    new passes."""
    ev = read_table(spark, sf_dir, "events")
    _D38 = "decimal(38,0)"
    m = ev.select(
        "event_type",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast(_D38).alias("n"),
        F.sum("cents").cast(_D38).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast(_D38).alias("ss"),
    )

    def arm(col: str, a: int):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    p = m.groupBy("event_type").agg(
        arm("n", 0).alias("n0"), arm("s", 0).alias("s0"),
        arm("ss", 0).alias("ss0"),
        arm("n", 1).alias("n1"), arm("s", 1).alias("s1"),
        arm("ss", 1).alias("ss1"),
    )
    n0, s0, ss0 = F.col("n0"), F.col("s0"), F.col("ss0")
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    v = p.select(
        "event_type",
        n0.cast("bigint").alias("n_ctl"),
        n1.cast("bigint").alias("n_trt"),
        (s0.cast("double") / n0.cast("double")).alias("mean_ctl"),
        (s1.cast("double") / n1.cast("double")).alias("mean_trt"),
        (
            (n0 * ss0 - s0 * s0).cast("double")
            / (n0 * (n0 - 1)).cast("double") / n0.cast("double")
        ).alias("se0"),
        (
            (n1 * ss1 - s1 * s1).cast("double")
            / (n1 * (n1 - 1)).cast("double") / n1.cast("double")
        ).alias("se1"),
    )
    se0, se1 = F.col("se0"), F.col("se1")
    mc, mt = F.col("mean_ctl"), F.col("mean_trt")
    tstat = (mt - mc) / F.sqrt(se0 + se1)
    dof = ((se0 + se1) * (se0 + se1)) / (
        se0 * se0 / (F.col("n_ctl") - 1).cast("double")
        + se1 * se1 / (F.col("n_trt") - 1).cast("double")
    )
    degenerate = (se0 + se1) <= 0
    return v.select(
        "event_type", "n_ctl", "n_trt", "mean_ctl", "mean_trt",
        F.when(degenerate, F.lit(0.0)).otherwise(tstat).alias("t_stat"),
        F.when(degenerate, F.lit(0.0)).otherwise(dof).alias("dof"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(tstat) >= 1.96)
        .alias("significant"),
    )


_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@query(
    "agg_benford",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM lineitem
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
    ),
    t AS (
      SELECT digit, n_obs,
             CAST(SUM(n_obs) OVER () AS BIGINT) AS n_total,
             {_BENFORD_CASE_SQL} AS p_benford
      FROM c
    )
    SELECT digit, n_obs, n_total,
           CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS freq_obs,
           p_benford,
           (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p_benford)
             * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE) * p_benford)
             / (CAST(n_total AS DOUBLE) * p_benford) AS chi2_term
    FROM t
    """,
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over l_extendedprice — the
    fraud/synthetic-data screen: per digit 1-9, observed count and
    frequency beside the Benford expectation log10(1+1/d) and that
    digit's chi-square contribution (o - n*p)^2/(n*p). Per-digit rows
    (not one chi2 scalar) so the analyst sees WHICH digits deviate;
    summing chi2_term against a chi-square(8) table is a driver-side
    afterthought on 9 rows.

    Float contract: the nine Benford probabilities are shared literal
    doubles (repr round-trip exact in both engines — no log10 call,
    whose libm rounding is not portable); digit extraction goes through
    integer-cents-to-string (integer formatting is unambiguous, unlike
    float formatting); counts are exact BIGINTs; each float output is
    one shared IEEE expression tree over exact ints and the literal.
    No float summation anywhere — the 9 chi2 terms are emitted, not
    totaled.

    Scale shape: ONE map-combinable corpus rollup to the 9-digit grain
    (partial counts merge; 9 rows cross the network per partition);
    the total + probability decoration is a partition-less window over
    9 rows — dimension-sized by construction. At 100 TB this costs
    exactly one scan, and the same plan serves any first-k-digit or
    per-segment variant by widening the group key."""
    li = read_table(spark, sf_dir, "lineitem")
    c = (
        li.select(
            F.substring(
                F.round(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    p_benford = F.col("digit")
    expr = None
    for d, p in _BENFORD_P.items():
        expr = (
            F.when(p_benford == d, F.lit(p))
            if expr is None
            else expr.when(p_benford == d, F.lit(p))
        )
    t = c.select(
        "digit",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy()).cast("bigint").alias("n_total"),
        expr.alias("p_benford"),
    )
    o, n, p = (
        F.col("n_obs").cast("double"),
        F.col("n_total").cast("double"),
        F.col("p_benford"),
    )
    return t.select(
        "digit",
        "n_obs",
        "n_total",
        (o / n).alias("freq_obs"),
        "p_benford",
        ((o - n * p) * (o - n * p) / (n * p)).alias("chi2_term"),
    )


@query(
    "agg_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT event_type, user_id % 4 AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, cohort, n_obs,
             CAST(SUM(n_obs) OVER (PARTITION BY event_type)
                  AS DECIMAL(38,0)) AS r,
             CAST(SUM(n_obs) OVER (PARTITION BY cohort)
                  AS DECIMAL(38,0)) AS c,
             CAST(SUM(n_obs) OVER () AS DECIMAL(38,0)) AS nt
      FROM o
    )
    SELECT event_type, cohort, n_obs,
           CAST(r AS BIGINT) AS row_total,
           CAST(c AS BIGINT) AS col_total,
           CAST(r * c AS DOUBLE) / CAST(nt AS DOUBLE) AS expected,
           CAST((n_obs * nt - r * c) * (n_obs * nt - r * c) AS DOUBLE)
             / CAST(nt * r * c AS DOUBLE) AS chi2_term
    FROM w
    """,
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence on the event_type x cohort
    (user_id % 4) contingency table — the categorical A/B readout
    beside agg_welch_ttest's continuous one: per cell, observed count,
    marginal totals, expected count r*c/N, and the cell's chi-square
    contribution. Per-cell rows double as the residual analysis
    (which cells drive the dependence); the scalar statistic is a
    driver-side sum over |types|*|cohorts| rows.

    Float contract: every moment is an exact BIGINT; the contribution
    is cleared to the exact integer rational (o*N - r*c)^2 / (N*r*c)
    formed in DECIMAL(38,0) on both engines, then ONE double division.
    No float summation — terms are emitted per cell. (DECIMAL(38,0)
    head-room bounds o*N at 1e19; past that, divide through by N in
    double first — the docstring contract a 100-TB caller checks.)

    Scale shape: ONE map-combinable corpus rollup to the cell grain;
    the three marginal windows run over |types|*|cohorts| rows —
    dimension-sized, single-task by construction (cf.
    sort_pareto_skyline's documented exception). At 100 TB: one scan,
    then arithmetic on 20 rows."""
    ev = read_table(spark, sf_dir, "events")
    o = (
        ev.select("event_type", (F.col("user_id") % 4).alias("cohort"))
        .groupBy("event_type", "cohort")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    _D38 = "decimal(38,0)"
    w = o.select(
        "event_type",
        "cohort",
        "n_obs",
        F.sum("n_obs")
        .over(Window.partitionBy("event_type"))
        .cast(_D38)
        .alias("r"),
        F.sum("n_obs")
        .over(Window.partitionBy("cohort"))
        .cast(_D38)
        .alias("c"),
        F.sum("n_obs").over(Window.partitionBy()).cast(_D38).alias("nt"),
    )
    r, c, nt = F.col("r"), F.col("c"), F.col("nt")
    num = F.col("n_obs") * nt - r * c
    return w.select(
        "event_type",
        "cohort",
        "n_obs",
        r.cast("bigint").alias("row_total"),
        c.cast("bigint").alias("col_total"),
        ((r * c).cast("double") / nt.cast("double")).alias("expected"),
        ((num * num).cast("double") / (nt * r * c).cast("double")).alias(
            "chi2_term"
        ),
    )


@query(
    "agg_market_concentration",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS c
      FROM lineitem GROUP BY 1
    ),
    geo AS (
      SELECT rev.l_suppkey, rev.c, r.r_name
      FROM rev
      JOIN supplier s ON s.s_suppkey = rev.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    ),
    rk AS (
      SELECT r_name, c,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY r_name ORDER BY c, l_suppkey
             ) AS DECIMAL(38,0)) AS i
      FROM geo
    )
    SELECT r_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(c) AS BIGINT) AS revenue_cents,
           CAST(SUM(c * c) AS DOUBLE)
             / CAST(SUM(c) * SUM(c) AS DOUBLE) AS hhi,
           CAST(2 * SUM(i * c)
                - (CAST(COUNT(*) AS DECIMAL(38,0)) + 1) * SUM(c)
                AS DOUBLE)
             / CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * SUM(c) AS DOUBLE)
             AS gini
    FROM rk GROUP BY r_name
    """,
)
def agg_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration metrics per region over supplier revenue:
    Herfindahl-Hirschman index (sum of squared revenue shares) and the
    Gini coefficient (rank formula G = (2*SUM(i*c_i) - (n+1)*S) /
    (n*S) over ascending-sorted revenues) — the antitrust /
    supply-risk rollup every marketplace dashboard carries, and a
    robust-statistics sibling of agg_stats.

    Float contract: revenues are exact cents; every moment (S, sum of
    c^2, sum of i*c) accumulates in DECIMAL(38,0); HHI and Gini are
    each ONE double division of two exactly-formed decimals. Rank ties
    cannot perturb the result: equal revenues contribute i*c + j*c
    regardless of which gets which rank, and the (c, suppkey) order is
    total anyway. (Head-room: S^2 caps decimal at S < 1e19 cents —
    past that, switch the HHI numerator to per-share double ratios.)

    Scale shape: ONE map-combinable corpus rollup to supplier grain;
    the three dim joins broadcast (supplier/nation/region); the rank
    window and the final rollup ride one slim (region) exchange over
    |suppliers| rows. At 100 TB: one scan plus dimension-sized
    arithmetic — the same plan any per-seller-share metric rides."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum("cents").cast("decimal(38,0)").alias("c")
    )
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    geo = (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("l_suppkey", "c", "r_name")
    )
    w = Window.partitionBy("r_name").orderBy("c", "l_suppkey")
    rk = geo.select(
        "r_name",
        "c",
        F.row_number().over(w).cast("decimal(38,0)").alias("i"),
    )
    cnt = F.count(F.lit(1)).cast("decimal(38,0)")
    agg = rk.groupBy("r_name").agg(
        cnt.alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(F.col("i") * F.col("c")).alias("ic"),
    )
    n, s, s2, ic = F.col("n"), F.col("s"), F.col("s2"), F.col("ic")
    return agg.select(
        "r_name",
        n.cast("bigint").alias("n_suppliers"),
        s.cast("bigint").alias("revenue_cents"),
        (s2.cast("double") / (s * s).cast("double")).alias("hhi"),
        (
            (2 * ic - (n + 1) * s).cast("double")
            / (n * s).cast("double")
        ).alias("gini"),
    )


#: Poisson(1) CDF cut-points as 8-hex-char cutoffs of the md5 uniform:
#: P(W<=k) scaled by 16^8 — weight k is assigned when the hash prefix
#: falls in [cut_{k-1}, cut_k); mass beyond w=6 (6e-4) truncates to 6.
_POISSON_CUTS = (
    "5e2d58d8",  # w=0
    "bc5ab1b1",  # w=1
    "eb715e1d",  # w=2
    "fb239797",  # w=3
    "ff1025f5",  # w=4
    "ffd90f3b",  # w=5
)

_POISSON_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN hx < '{c}' THEN {k}" for k, c in enumerate(_POISSON_CUTS)
    )
    + " ELSE 6 END"
)

_BOOT_B = 100


@query(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH h AS (
      SELECT e.event_type, g.g,
             CAST(round(e.value * 100) AS BIGINT) AS cents,
             md5('boot|' || CAST(g.g AS VARCHAR) || '|'
                 || CAST(e.event_id AS VARCHAR)) AS hx32
      FROM events e CROSS JOIN range({_BOOT_B // 4}) g(g)
    ),
    f AS (
      SELECT event_type, g * 4 + i.i AS b, cents,
             substr(hx32, 1 + 8 * i.i, 8) AS hx
      FROM h CROSS JOIN range(4) i(i)
    ),
    w AS (
      SELECT event_type, b, cents, {_POISSON_CASE_SQL} AS w FROM f
    ),
    rep AS (
      SELECT event_type, b,
             CAST(SUM(w) AS DECIMAL(38,0)) AS sw,
             CAST(SUM(w * cents) AS DECIMAL(38,0)) AS swc
      FROM w GROUP BY 1, 2
    ),
    mean_b AS (
      SELECT event_type, b,
             CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) AS m
      FROM rep WHERE sw > 0
    ),
    rk AS (
      SELECT event_type, m,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY m, b
             ) AS rn
      FROM mean_b
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_replicates,
           MAX(CASE WHEN rn = 3 THEN m END) AS ci_lo,
           MAX(CASE WHEN rn = 50 THEN m END) AS boot_median,
           MAX(CASE WHEN rn = 98 THEN m END) AS ci_hi
    FROM rk GROUP BY event_type
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean
    (Chamandy et al.'s streaming bootstrap): each of B=100 replicates
    weights every row by a deterministic Poisson(1) draw, replicate
    means are ranked, and the 2.5%/50%/97.5% order statistics become
    the CI — the uncertainty readout beside agg_welch_ttest's tests,
    computable in one pass where classical resampling cannot run at
    all.

    Determinism contract: the Poisson weight is a pure function of
    (replicate, event_id) — an md5-prefix uniform cut against literal
    hex CDF cut-points (llm_split_train_test's portable-hash pattern),
    so weights are exact INTEGERS and both engines derive identical
    replicate compositions; truncation at w=6 drops 6e-4 of mass (a
    documented bias far below CI width). Replicate moments accumulate
    in DECIMAL(38,0); each replicate mean is ONE double division;
    the CI bounds are order-statistic SELECTIONS (rank 3/50/98 of
    100, ties broken by replicate id) — no float summation anywhere.

    Scale shape: the Bx fan-out exists only map-side — the explode
    fuses with the scan and partial aggregation combines (type, b)
    cells before the shuffle, so ~|partitions|x|types|xB slim moment
    rows cross the network, never B copies of the corpus; the ranking
    window runs over |types|xB rows — dimension-sized. At 100 TB the
    bootstrap costs one scan plus B-scaled map CPU; CIs for sums,
    ratios, or quantile estimators swap the replicate statistic, not
    the plan."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    # one md5 yields FOUR independent 8-hex (32-bit) uniform draws, so
    # B=100 replicates cost B/4 = 25 hashes per row, not 100
    # (measured: sf1 29 s -> 18 s, sf0.1 6.9 -> 5.1 s; the residual is
    # the n x B row fan-out feeding the partial agg, not hashing)
    h = ev.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B // 4 - 1))).alias("g"),
        "event_id",
    ).select(
        "event_type",
        "cents",
        "g",
        F.md5(
            F.concat(
                F.lit("boot|"),
                F.col("g").cast("string"),
                F.lit("|"),
                F.col("event_id").cast("string"),
            )
        ).alias("hx32"),
    )
    f = h.select(
        "event_type",
        "cents",
        "g",
        "hx32",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    ).select(
        "event_type",
        (F.col("g") * 4 + F.col("i")).alias("b"),
        "cents",
        F.expr("substring(hx32, 1 + 8 * i, 8)").alias("hx"),
    )
    w_expr = None
    for k, cut in enumerate(_POISSON_CUTS):
        cond = F.col("hx") < cut
        w_expr = (
            F.when(cond, F.lit(k))
            if w_expr is None
            else w_expr.when(cond, F.lit(k))
        )
    w_expr = w_expr.otherwise(F.lit(6))
    _D38 = "decimal(38,0)"
    rep = (
        f.select("event_type", "b", "cents", w_expr.alias("w"))
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").cast(_D38).alias("sw"),
            F.sum(F.col("w") * F.col("cents")).cast(_D38).alias("swc"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            "b",
            (F.col("swc").cast("double") / F.col("sw").cast("double")).alias(
                "m"
            ),
        )
    )
    rk = rep.select(
        "event_type",
        "m",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("m", "b"))
        .alias("rn"),
    )
    return rk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
        F.max(F.when(F.col("rn") == 3, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 50, F.col("m"))).alias("boot_median"),
        F.max(F.when(F.col("rn") == 98, F.col("m"))).alias("ci_hi"),
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT)
                 // 86400) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey, m,
             NTILE(5) OVER (ORDER BY last_day, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY f, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY m, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score = 1 THEN 'lost'
                ELSE 'other' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(m AS DECIMAL(38,0))) AS BIGINT)
             AS total_monetary_cents,
           CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_monetary_cents
    FROM scored GROUP BY 1, 2, 3
    """,
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the marketing-analytics workhorse: per customer, quintile scores
    on last-order day, order count, and lifetime cents (NTILE(5) with
    a custkey tie-break; 5 = best on every axis), rolled up to the
    125-cell score cube with a champion/at-risk/lost label rule.

    Determinism: all three metrics are exact integers; NTILE over a
    TOTAL order (metric, custkey) assigns identical buckets in both
    engines (equal buckets, remainder to the first — the SQL-standard
    rule both implement); monetary sums re-accumulate in
    DECIMAL(38,0); the only float is the final per-segment average,
    ONE double division.

    Scale shape: ONE map-combinable corpus rollup to customer grain,
    then three partition-less NTILE windows over |customers| rows and
    a 125-cell rollup. The global windows are the honest cost: at
    1e9+ customers the shipped swap is agg_rfm_rankcut (next key):
    the distributed bucket-rank decomposition that reproduces these
    NTILE scores BIT-FOR-BIT with no corpus-sized serial sort. At
    driver SFs the window here is dimension-sized and the two keys
    hash-identically."""
    od = read_table(spark, sf_dir, "orders")
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("o_orderdate"))).cast(
            "bigint"
        )
        / F.lit(86400)
    ).cast("bigint")
    cust = od.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("m"),
    )
    scored = cust.select(
        "o_custkey",
        "m",
        F.ntile(5)
        .over(Window.orderBy("last_day", "o_custkey"))
        .alias("r_score"),
        F.ntile(5).over(Window.orderBy("f", "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("m", "o_custkey")).alias("m_score"),
    )
    r_s, f_s, m_s = F.col("r_score"), F.col("f_score"), F.col("m_score")
    seg = (
        F.when((r_s >= 4) & (f_s >= 4) & (m_s >= 4), F.lit("champion"))
        .when((r_s <= 2) & (f_s >= 4), F.lit("at_risk"))
        .when(r_s == 1, F.lit("lost"))
        .otherwise(F.lit("other"))
    )
    mdec = F.sum(F.col("m").cast("decimal(38,0)"))
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.min(seg).alias("segment"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        mdec.cast("bigint").alias("total_monetary_cents"),
        (
            mdec.cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_monetary_cents"),
    )


@query(
    "agg_rfm_rankcut",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT)
                 // 86400) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS f,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS m
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey, m,
             NTILE(5) OVER (ORDER BY last_day, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY f, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY m, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                WHEN r_score = 1 THEN 'lost'
                ELSE 'other' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(m AS DECIMAL(38,0))) AS BIGINT)
             AS total_monetary_cents,
           CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_monetary_cents
    FROM scored GROUP BY 1, 2, 3
    """,
)
def agg_rfm_rankcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB form of agg_rfm_segmentation (round-7 verdict item
    3): BIT-IDENTICAL output — the oracle IS the NTILE formulation —
    with no corpus-sized serial sort anywhere. The classic distributed
    ranking decomposition: global rank in the total order (metric,
    custkey) = per-bucket row_number (window PARTITIONED by a
    value-range bucket, fully parallel) + the bucket's cumulative
    offset (one prefix sum over the BUCKET TABLE, whose size is
    bounded by the value domain / granularity — days/64 for recency,
    distinct order counts for frequency, cents/1e5 for monetary —
    never by customer count). The NTILE score is then pure integer
    arithmetic on (rank, n): SQL-standard remainder-to-first-buckets
    rule, score = (r-1) DIV (b+1) + 1 inside the first (n%5) big
    buckets, else (n%5) + 1 + (r - (n%5)*(b+1) - 1) DIV b with
    b = n DIV 5 — which also degrades correctly to score = r when
    n < 5. Both engines agreeing on the hash proves the rank-cut
    construction reproduces NTILE exactly, tie-breaks included.

    Scale shape: the only unpartitioned window runs over the bucket
    table (thousands of rows at ANY corpus size); the corpus-grain
    windows are all PARTITIONed by bucket; offsets and the customer
    count broadcast back. Three scored columns join back on the
    customer key — three co-partitioned shuffles on the same grain —
    then the identical 125-cell rollup."""
    od = read_table(spark, sf_dir, "orders")
    day = (
        F.unix_timestamp(F.date_trunc("day", F.col("o_orderdate"))).cast(
            "bigint"
        )
        / F.lit(86400)
    ).cast("bigint")
    cust = od.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("m"),
    ).localCheckpoint(eager=False)
    n_df = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ntile_score = (
        "CAST(CASE WHEN r <= (n % 5) * (n DIV 5 + 1) "
        "THEN (r - 1) DIV (n DIV 5 + 1) + 1 "
        "ELSE (n % 5) + 1 + (r - (n % 5) * (n DIV 5 + 1) - 1) DIV (n DIV 5) "
        "END AS INT)"
    )

    def quintile(metric: str, bucket_div: int, out: str) -> DataFrame:
        per = cust.select(
            "o_custkey", metric, F.expr(f"{metric} DIV {bucket_div}").alias("bk")
        )
        counts = per.groupBy("bk").agg(F.count(F.lit(1)).alias("cnt"))
        # prefix sum over the BUCKET table: bounded by the value
        # domain, not the customer count — safe as a global window
        woff = Window.orderBy("bk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = counts.select(
            "bk", F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off")
        )
        wrank = Window.partitionBy("bk").orderBy(metric, "o_custkey")
        return (
            per.withColumn("rb", F.row_number().over(wrank))
            .join(F.broadcast(offs), "bk")
            .crossJoin(F.broadcast(n_df))
            .select(
                "o_custkey",
                (F.col("off") + F.col("rb")).alias("r"),
                "n",
            )
            .select("o_custkey", F.expr(ntile_score).alias(out))
        )
    scored = (
        cust.select("o_custkey", "m")
        .join(quintile("last_day", 64, "r_score"), "o_custkey")
        .join(quintile("f", 1, "f_score"), "o_custkey")
        .join(quintile("m", 100000, "m_score"), "o_custkey")
    )
    r_s, f_s, m_s = F.col("r_score"), F.col("f_score"), F.col("m_score")
    seg = (
        F.when((r_s >= 4) & (f_s >= 4) & (m_s >= 4), F.lit("champion"))
        .when((r_s <= 2) & (f_s >= 4), F.lit("at_risk"))
        .when(r_s == 1, F.lit("lost"))
        .otherwise(F.lit("other"))
    )
    mdec = F.sum(F.col("m").cast("decimal(38,0)"))
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.min(seg).alias("segment"),
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        mdec.cast("bigint").alias("total_monetary_cents"),
        (
            mdec.cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_monetary_cents"),
    )


@query(
    "agg_basket_affinity",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM li),
    item AS (
      SELECT pkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY 1
    ),
    pairs AS (
      SELECT a.pkey AS part_1, b.pkey AS part_2,
             CAST(COUNT(*) AS BIGINT) AS pair_orders
      FROM li a JOIN li b ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT part_1, part_2, pair_orders,
           CAST(pair_orders AS DOUBLE) / CAST(n_orders AS DOUBLE)
             AS support,
           CAST(pair_orders * n_orders AS DOUBLE)
             / CAST(i1.cnt * i2.cnt AS DOUBLE) AS lift
    FROM pairs
    CROSS JOIN tot
    JOIN item i1 ON i1.pkey = part_1
    JOIN item i2 ON i2.pkey = part_2
    ORDER BY lift DESC, part_1, part_2
    LIMIT 20
    """,
)
def agg_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity mining: the top-20 part pairs by lift
    (observed co-purchase rate over the rate independence predicts)
    with a minimum pair support of 2 orders — the association-rule
    primitive behind "frequently bought together", cross-sell ranking,
    and complement detection.

    Float contract: supports and item counts are exact integers;
    support and lift are each ONE IEEE division of exact integer
    products ((pair·N)/(cnt_a·cnt_b) — both fit double far below 2^53
    at any plausible catalog), so DuckDB hash-matches bit-for-bit.

    Scale shape: baskets reduce to DISTINCT slim (order, part) pairs
    first (one map-combinable dedup); pair generation is a self-join
    CO-PARTITIONED on the order key — one shuffle per side, and the
    per-order fan-out is quadratic only in BASKET size (TPC-H ≤ 13
    items; a production run caps basket size exactly like the LSH
    bucket caps, since a 10k-item basket is a bot, not a signal). The
    item-frequency and n_orders tables are dimension-sized broadcasts;
    TakeOrderedAndProject finishes the top-20. At 100 TB nothing but
    (order, part) and (part, part, count) rows ever shuffle."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
        )
        .distinct()
    )
    tot = li.select(F.countDistinct("okey").alias("n_orders"))
    item = li.groupBy("pkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = li.select("okey", F.col("pkey").alias("part_1"))
    b = li.select(
        F.col("okey").alias("okey2"), F.col("pkey").alias("part_2")
    )
    pairs = (
        a.join(
            b,
            (F.col("okey") == F.col("okey2"))
            & (F.col("part_1") < F.col("part_2")),
        )
        .groupBy("part_1", "part_2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_orders"))
        .filter(F.col("pair_orders") >= 2)
    )
    i1 = item.select(
        F.col("pkey").alias("part_1"), F.col("cnt").alias("cnt_1")
    )
    i2 = item.select(
        F.col("pkey").alias("part_2"), F.col("cnt").alias("cnt_2")
    )
    return (
        pairs.join(F.broadcast(i1), "part_1")
        .join(F.broadcast(i2), "part_2")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_1",
            "part_2",
            "pair_orders",
            (
                F.col("pair_orders").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("support"),
            (
                (F.col("pair_orders") * F.col("n_orders")).cast("double")
                / (F.col("cnt_1") * F.col("cnt_2")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_1", "part_2")
        .limit(20)
    )


@query(
    "agg_entropy_mix",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    cell AS (
      SELECT segment, prio, CAST(COUNT(*) AS BIGINT) AS c
      FROM j GROUP BY 1, 2
    ),
    seg AS (
      SELECT segment, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY 1
    ),
    term AS (
      SELECT cell.segment, n,
             ROUND(CAST(c AS DOUBLE)
                   * LN(CAST(c AS DOUBLE) / n), 8) AS t
      FROM cell JOIN seg ON cell.segment = seg.segment
    )
    SELECT segment,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_priorities,
           ROUND(-(CAST(SUM(CAST(t AS DECIMAL(30,8))) AS DOUBLE))
                 / ANY_VALUE(n), 6) AS entropy
    FROM term GROUP BY segment
    """,
)
def agg_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the order-priority mix per market segment —
    the categorical-diversity / distribution-drift primitive: a
    segment whose priority mix collapses toward one class (entropy
    → 0) or flattens to uniform (entropy → ln k) is the first signal
    monitoring dashboards alert on, and the same shape scores
    source-mix diversity in a training-data pipeline.

    Float contract: cell counts are exact; each class contributes
    ROUND(c·ln(c/n), 8) — one IEEE expression tree (the pattern
    llm_char_entropy proved hash-portable) — accumulated in
    DECIMAL(30,8), final entropy rounded to 6dp.

    Scale shape: the fact joins a BROADCAST customer dimension (at
    100 TB the segment key would be denormalized onto orders anyway),
    then ONE map-combinable rollup to |segments|×|priorities| cells;
    everything after the cell grid is dimension-sized."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("prio"),
    )
    cell = j.groupBy("segment", "prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wseg = Window.partitionBy("segment")
    t = F.round(
        F.col("c").cast("double")
        * F.log(F.col("c").cast("double") / F.col("n")),
        8,
    )
    return (
        cell.withColumn("n", F.sum("c").over(wseg).cast("bigint"))
        .select("segment", "n", t.alias("t"))
        .groupBy("segment")
        .agg(
            F.any_value("n").cast("bigint").alias("n_orders"),
            F.count(F.lit(1)).cast("bigint").alias("n_priorities"),
            F.round(
                -F.sum(F.col("t").cast("decimal(30,8)")).cast("double")
                / F.any_value("n"),
                6,
            ).alias("entropy"),
        )
    )


@query(
    "agg_ab_proportions_ztest",
    oracle="""
    WITH arm AS (
      SELECT c.c_custkey,
             CASE WHEN substr(md5('ab|' || CAST(c.c_custkey AS VARCHAR)),
                              1, 1)
                  IN ('0','1','2','3','4','5','6','7')
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(COALESCE(MAX(CASE WHEN o.o_orderpriority = '1-URGENT'
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS converted
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ),
    g AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM arm GROUP BY arm
    ),
    w AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        MAX(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
        MAX(CASE WHEN arm = 'B' THEN conv END) AS conv_b
      FROM g
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
           CAST(conv_a + conv_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) AS pooled_rate,
           (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / SQRT((CAST(conv_a + conv_b AS DOUBLE)
                   / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                           / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE)
                     + 1.0 / CAST(n_b AS DOUBLE))) AS z_score
    FROM w
    """,
)
def agg_ab_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment on conversion:
    customers split into arms by a deterministic md5 hash (the
    salt-and-hash assignment every production experimentation platform
    uses — and the same trick that makes it engine-reproducible),
    conversion = customer ever placed an urgent-priority order
    (order-less customers count as unconverted via the LEFT join),
    and the pooled z statistic that decides the experiment — the
    proportions counterpart of agg_welch_ttest's means comparison.

    Float contract: arm sizes and conversion counts are exact
    integers; every rate is ONE IEEE division; the z-score is a single
    shared expression tree of those divisions through sqrt (correctly
    rounded per IEEE-754, so bit-identical across engines).

    Scale shape: the fact side reduces map-combinably to customer
    grain (the LEFT join ships only (custkey, flag) partials), then a
    2-row arm rollup and a 1-row pivot — nothing after customer grain
    exceeds dimension size. Per-variant/per-metric extensions just
    widen the grouping keys."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    arm = F.when(
        F.substring(
            F.md5(
                F.concat(F.lit("ab|"), F.col("c_custkey").cast("string"))
            ),
            1,
            1,
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    u = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.max(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT", 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("converted"),
        )
        .select(arm.alias("arm"), "converted")
    )
    g = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    w = g.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return w.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        pooled.alias("pooled_rate"),
        z.alias("z_score"),
    )


@query(
    "agg_mannwhitney_u",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             CAST(user_id % 2 AS INT) AS arm
      FROM events
    ),
    cva AS (
      SELECT event_type, v, arm, CAST(COUNT(*) AS BIGINT) AS m
      FROM g GROUP BY 1, 2, 3
    ),
    cv AS (
      SELECT event_type, v, CAST(SUM(m) AS BIGINT) AS t
      FROM cva GROUP BY 1, 2
    ),
    ranks AS (
      SELECT event_type, v, t,
             1 + COALESCE(SUM(t) OVER (
               PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS min_rank
      FROM cv
    ),
    arms AS (
      SELECT c.event_type,
             CAST(SUM(CASE WHEN arm = 0 THEN m ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN m ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN
               CAST(m AS DECIMAL(38,0))
                 * (2 * r.min_rank + r.t - 1) ELSE 0 END)
               AS DECIMAL(38,0)) AS ra2
      FROM cva c JOIN ranks r USING (event_type, v)
      GROUP BY 1
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)
               AS DECIMAL(38,0)) AS tsum
      FROM cv GROUP BY 1
    )
    SELECT a.event_type, a.n_a, a.n_b,
           CAST(a.ra2 - a.n_a * (a.n_a + 1) AS DOUBLE) / 2 AS u_a,
           ROUND(
             CAST(a.ra2 - a.n_a * (a.n_a + 1)
                  - a.n_a * a.n_b AS DOUBLE)
             / (2 * sqrt(
                 CAST(CAST(a.n_a AS DECIMAL(38,0)) * a.n_b
                      * (CAST(a.n_a + a.n_b + 1 AS DECIMAL(38,0))
                           * (a.n_a + a.n_b) * (a.n_a + a.n_b - 1)
                         - t.tsum) AS DOUBLE)
                 / CAST(12 * CAST(a.n_a + a.n_b AS DECIMAL(38,0))
                        * (a.n_a + a.n_b - 1) AS DOUBLE))),
             6) AS z,
           abs(CAST(a.ra2 - a.n_a * (a.n_a + 1)
                    - a.n_a * a.n_b AS DOUBLE)
               / (2 * sqrt(
                   CAST(CAST(a.n_a AS DECIMAL(38,0)) * a.n_b
                        * (CAST(a.n_a + a.n_b + 1 AS DECIMAL(38,0))
                             * (a.n_a + a.n_b) * (a.n_a + a.n_b - 1)
                           - t.tsum) AS DOUBLE)
                   / CAST(12 * CAST(a.n_a + a.n_b AS DECIMAL(38,0))
                          * (a.n_a + a.n_b - 1) AS DOUBLE)))) >= 1.96
             AS significant
    FROM arms a JOIN ties t USING (event_type)
    """,
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test per event_type between
    the user-parity arms — the NON-parametric sibling of
    agg_welch_ttest: rank-based, so heavy-tailed revenue-style metrics
    (exactly where the t-test's normality assumption dies) still get a
    valid significance readout. Average ranks for ties, the normal
    approximation with the standard tie correction, |z| >= 1.96 flag.

    Exactness: every rank quantity lives at 2x scale so tie midpoints
    (.5 ranks) stay integers — avg_rank2 = 2*min_rank + t - 1,
    U_A2 = R_A2 - n_A(n_A+1) — and all moments (R_A2, tie term
    SUM(t^3 - t), the variance numerator/denominator) accumulate in
    DECIMAL(38,0). The only floats are ONE division, ONE sqrt (IEEE
    correctly-rounded, hence bit-portable — unlike ln/exp), and ONE
    final division, the identical expression tree in both engines.

    Scale shape: the agg_rfm_rankcut trick applied to ranking — ranks
    derive from the VALUE-GRAIN rollup (groupBy (type, value-cents,
    arm), map-combinable), so the only window runs over distinct
    values per type, never raw rows; two 5-row per-type aggregates
    join at the end. No raw-row sort anywhere."""
    g = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
    )
    cva = g.groupBy("event_type", "v", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    cv = cva.groupBy("event_type", "v").agg(
        F.sum("m").cast("bigint").alias("t")
    )
    w = Window.partitionBy("event_type").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranks = cv.select(
        "event_type",
        "v",
        "t",
        (1 + F.coalesce(F.sum("t").over(w), F.lit(0))).alias("min_rank"),
    )
    _D = "decimal(38,0)"
    arms = (
        cva.join(ranks, ["event_type", "v"])
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, F.col("m")).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("m")).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
            F.sum(
                F.when(
                    F.col("arm") == 0,
                    F.col("m").cast(_D)
                    * (2 * F.col("min_rank") + F.col("t") - 1),
                ).otherwise(F.lit(0).cast(_D))
            )
            .cast(_D)
            .alias("ra2"),
        )
    )
    ties = cv.groupBy("event_type").agg(
        F.sum(F.col("t").cast(_D) * F.col("t") * F.col("t") - F.col("t"))
        .cast(_D)
        .alias("tsum")
    )
    j = arms.join(ties, "event_type")
    n = F.col("n_a") + F.col("n_b")
    # n_a promotes to DECIMAL(38,0) BEFORE the products: bigint*bigint
    # wraps silently past ~3e9 rows per arm (a 100-TB arm count) while
    # DuckDB's oracle promotes to HUGEINT — the casts keep the two
    # engines' integer paths divergence-free at any n (round-8 ADVICE)
    num = (
        F.col("ra2")
        - F.col("n_a").cast(_D) * (F.col("n_a") + 1)
        - F.col("n_a").cast(_D) * F.col("n_b")
    ).cast("double")
    var_num = (
        F.col("n_a").cast(_D)
        * F.col("n_b")
        * ((n + 1).cast(_D) * n * (n - 1) - F.col("tsum"))
    ).cast("double")
    var_den = (F.lit(12) * n.cast(_D) * (n - 1)).cast("double")
    z = num / (2 * F.sqrt(var_num / var_den))
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        (
            (F.col("ra2") - F.col("n_a").cast(_D) * (F.col("n_a") + 1))
            .cast("double")
            / 2
        ).alias("u_a"),
        F.round(z, 6).alias("z"),
        (F.abs(z) >= 1.96).alias("significant"),
    )
