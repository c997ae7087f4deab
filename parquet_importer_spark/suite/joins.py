"""§2.C — joins. The reference has none; this is the standard surface
plus the time-series joins (range, as-of) a 100-TB event store needs.

Scale notes baked into each query:
- dims (region/nation/supplier) are broadcast — zero shuffle of the fact;
- equi joins on big tables shuffle both sides on the key once; AQE
  handles skew-splitting at runtime;
- the as-of join is the union-merge from operators/joins.py (one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.operators.joins import asof_join, range_join
from parquet_importer_spark.registry import query


@query(
    "join_inner_eq",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    """,
)
def join_inner_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = read_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicitly broadcast dims: the customer
    scan never shuffles — both joins are map-side hash probes."""
    c = read_table(spark, sf_dir, "customer")
    n = F.broadcast(read_table(spark, sf_dir, "nation"))
    r = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT cn.nk AS cust_nation, sn.nk AS supp_nation, cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer — null sides observable because suppliers cover fewer
    nations than customers in the testdata."""
    cn = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        cn.nk.alias("cust_nation"),
        sn.nk.alias("supp_nation"),
        "n_cust",
        "n_supp",
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_big_order' AS membership
    FROM customer WHERE c_custkey IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders' AS membership
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (existence) + left_anti (absence) — each returns only
    left columns and never duplicates, unlike inner join + distinct."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    allk = o.select(F.col("o_custkey").alias("c_custkey"))
    semi = (
        c.join(big, "c_custkey", "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("membership", F.lit("has_big_order"))
    )
    anti = (
        c.join(allk, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("membership", F.lit("no_orders"))
    )
    return semi.unionByName(anti)


@query(
    "join_cross_theta",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    WHERE n.n_regionkey < r.r_regionkey
    """,
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta predicate → BroadcastNestedLoopJoin (both sides
    tiny dims here; at scale put the small side right so it broadcasts)."""
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).filter(
        F.col("n_regionkey") < F.col("r_regionkey")
    ).select("n_name", "r_name")


@query(
    "join_range",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start
      FROM events
    )
    SELECT e.event_id, d.day_start
    FROM events e JOIN days d
      ON e.ts >= d.day_start AND e.ts < d.day_start + INTERVAL 1 HOUR
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events against derived day-start intervals. The
    interval dim is small → broadcast nested-loop; for two big sides,
    pre-bucket on the day grain and equi-join the bucket first."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day_start")
    ).distinct()
    joined = range_join(
        ev,
        days,
        (F.col("ts") >= F.col("day_start"))
        & (F.col("ts") < F.col("day_start") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select("event_id", "day_start")


@query(
    "join_asof",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2,
             event_type, value
      FROM events
    ),
    clicks AS (
      SELECT user_id, ts2, MAX(value) AS click_value
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts2
    ),
    purch AS (
      SELECT event_id, user_id, ts2, value AS purchase_value
      FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts2 AS purchase_ts, p.purchase_value,
           c.ts2 AS click_ts, c.click_value
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts2 >= c.ts2
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest preceding click of the
    same user (union-merge implementation — one shuffle, no expansion).
    Timestamps truncated to seconds and the right side deduped per
    (user, second) so both engines resolve ties identically."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", F.col("ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts2")
        .agg(F.max("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts2"), F.col("value").alias("purchase_value")
    )
    out = asof_join(
        purch,
        clicks.withColumnRenamed("ts2", "click_ts"),
        on="user_id",
        left_ts="ts2",
        right_ts="click_ts",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts2").alias("purchase_ts"),
        "purchase_value",
        "click_ts",
        "click_value",
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(30,8))) AS DOUBLE), 4) AS revenue,
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: the probe side salts its key into
    SALT sub-keys (pmod of l_linenumber — deterministic, never output)
    while the build side replicates each row SALT times, so one hot
    orderkey spreads over SALT reducers instead of one straggler task.
    Semantically identical to the plain join (the oracle IS the plain
    join); at 100 TB this is the manual valve when AQE's skew-join
    splitting can't help (e.g. the skew is in a groupBy after the join).
    SALT=8 multiplies the build side 8×, so keep it for genuinely hot
    keys only — AQE handles moderate skew for free."""
    salt_n = 8
    o = read_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    l = read_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(salt_n))
    )
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,8)"
                    )
                ).cast("double"),
                4,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_fuzzy_name",
    oracle="""
    WITH probes AS (
      SELECT * FROM (VALUES
        ('Custmer#000000042'), ('Customer#00000I33'), ('customer#000000777')
      ) AS t(probe)
    ),
    scored AS (
      SELECT p.probe, c.c_custkey, c.c_name,
             CAST(levenshtein(lower(p.probe), lower(c.c_name)) AS BIGINT)
               AS edit_dist,
             ROW_NUMBER() OVER (
               PARTITION BY p.probe
               ORDER BY levenshtein(lower(p.probe), lower(c.c_name)),
                        c.c_custkey
             ) AS rn
      FROM probes p CROSS JOIN customer c
    )
    SELECT probe, c_custkey, c_name, edit_dist
    FROM scored WHERE rn = 1 ORDER BY probe
    """,
)
def join_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: each (possibly corrupted) probe name finds
    its closest customer by case-folded Levenshtein distance — the
    record-linkage primitive behind dirty-key joins. The probe set
    broadcasts, so the corpus scans once with the distance evaluated in
    codegen; the top-1 per probe is a min-struct aggregate with
    map-side partials, so only one candidate per (probe, partition)
    shuffles. At billions of rows the same semantics add a
    cheap blocking prefilter (length band / q-gram overlap) before the
    exact distance — same plan with one extra pushed predicate."""
    probes = F.broadcast(
        spark.createDataFrame(
            [("Custmer#000000042",), ("Customer#00000I33",),
             ("customer#000000777",)],
            "probe string",
        )
    )
    c = read_table(spark, sf_dir, "customer")
    scored = c.crossJoin(probes).select(
        "probe",
        "c_custkey",
        "c_name",
        F.levenshtein(F.lower("probe"), F.lower("c_name"))
        .cast("bigint")
        .alias("edit_dist"),
    )
    # top-1 per probe as a min-struct AGGREGATE, not a window: a window
    # partitioned by a handful of probes would funnel the whole scored
    # corpus into as many tasks; min(struct) combines map-side, so only
    # one candidate per (probe, partition) ever shuffles
    best = scored.groupBy("probe").agg(
        F.min(F.struct("edit_dist", "c_custkey", "c_name")).alias("b")
    )
    return best.select(
        "probe",
        F.col("b.c_custkey").alias("c_custkey"),
        F.col("b.c_name").alias("c_name"),
        F.col("b.edit_dist").alias("edit_dist"),
    ).orderBy("probe")


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(30,8))) AS DOUBLE), 4) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 480000
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact join — the runtime-filter pattern for a
    selective dimension against a fact too big to shuffle un-pruned:
    the filtered orders keys (~3% pass the price predicate) compress to
    a k=3 / 16-bit md5 Bloom bit table (≤65536 distinct position
    strings regardless of key count) that BROADCASTS to the lineitem
    scan; three broadcast left-semi probes drop ~97% of fact rows with
    zero row expansion and zero fact shuffle BEFORE the exact join.
    False positives don't matter — the exact join behind the filter
    removes them, so the result (and the oracle) is the plain
    join+aggregate, and the bloom stage is pure plumbing the optimizer
    can't see through. This is the manual form of Spark's runtime
    bloom-filter join (spark.sql.optimizer.runtime.bloomFilter), kept
    explicit so the plan shape is pinned and testable.

    Honest cost accounting: at fixture scale the filtered dim is small
    enough to broadcast outright, so the md5 probes are pure overhead
    (~2.2 s vs ~1 s plain at sf0.1) — the pattern pays off when the
    filtered dim exceeds the broadcast threshold (the exact join
    degrades to sort-merge) but its bit table still fits: the bloom
    then prunes the fact BEFORE the fact-side exchange, which is the
    expensive thing at 100 TB.

    The exact join deliberately carries NO broadcast hint (round 10:
    the 1000× rung read xlin_c 1.36 because a forced F.broadcast
    pinned the ~3%-of-orders side — a corpus FRACTION, 4.5M rows at
    sf100 — into a single-threaded HashedRelation build, violating
    this round's rule 1 and this docstring's own degradation
    contract): Catalyst auto-broadcasts it at every driver SF (same
    physical plan, pinned), and AQE picks sort-merge once the
    filtered dim outgrows the threshold — which is the regime the
    bloom stage exists for. Only the ≤65536-position bit tables,
    bounded by construction, keep the explicit broadcast hint."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 480000
    )

    def bit_pos(key, j):
        return F.substring(
            F.md5(
                F.concat(F.lit(f"bf{j}|"), key.cast("string"))
            ),
            1,
            4,
        )

    pre = li
    for j in range(3):
        bits = (
            o.select(bit_pos(F.col("o_orderkey"), j).alias("pos")).distinct()
        )
        pre = (
            pre.withColumn("_pos", bit_pos(F.col("l_orderkey"), j))
            .join(F.broadcast(bits), F.col("_pos") == bits.pos, "left_semi")
            .drop("_pos")
        )
    return (
        pre.join(
            o.select("o_orderkey", "o_orderpriority"),
            pre.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(30,8)")
                ).cast("double"),
                4,
            ).alias("revenue"),
        )
    )


@query(
    "join_point_in_time",
    oracle="""
    WITH dim AS (
      SELECT c.c_custkey, v.v AS version,
             c.c_mktsegment || '_v' || CAST(v.v AS VARCHAR) AS segment_at,
             CASE v.v WHEN 0 THEN TIMESTAMP '1990-01-01'
                      WHEN 1 THEN TIMESTAMP '1997-01-01'
                      ELSE TIMESTAMP '1999-01-01' END AS valid_from,
             CASE v.v WHEN 0 THEN TIMESTAMP '1997-01-01'
                      WHEN 1 THEN TIMESTAMP '1999-01-01'
                      ELSE TIMESTAMP '9999-12-31' END AS valid_to
      FROM customer c, (SELECT unnest(range(0, 3)) AS v) v
    )
    SELECT d.version, d.segment_at,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8)))
                      AS DOUBLE), 4) AS revenue
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
              AND o.o_orderdate >= d.valid_from
              AND o.o_orderdate <  d.valid_to
    GROUP BY d.version, d.segment_at
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — the SCD2 companion to
    sink_scd2_history: every fact row joins the dimension VERSION that
    was valid at the fact's own timestamp, the correctness rule that
    makes slowly-changing attributes reproducible in backfills (a plain
    equi join against current-state attributes silently rewrites
    history). Versions here are synthesized deterministically (three
    global validity windows per customer) so the oracle reproduces the
    exact dimension.

    Scale shape: the versioned dimension is |dim| × n_versions — still
    dimension-sized — and BROADCASTS; the interval predicate rides the
    broadcast hash join on the equi key (each fact row probes its
    customer's 3 versions and keeps exactly one), so the fact never
    shuffles and no range-join explosion occurs. As-of joins
    (operators/joins.asof_join) cover the sortable-stream variant; this
    is the warehouse-dimension variant."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    bounds = [
        ("1990-01-01", "1997-01-01"),
        ("1997-01-01", "1999-01-01"),
        ("1999-01-01", "9999-12-31"),
    ]
    versions = F.array(
        *[
            F.struct(
                F.lit(v).alias("version"),
                F.lit(lo).cast("timestamp").alias("valid_from"),
                F.lit(hi).cast("timestamp").alias("valid_to"),
            )
            for v, (lo, hi) in enumerate(bounds)
        ]
    )
    dim = (
        c.select("c_custkey", "c_mktsegment", F.explode(versions).alias("v"))
        .select(
            "c_custkey",
            F.col("v.version").alias("version"),
            F.concat(
                F.col("c_mktsegment"),
                F.lit("_v"),
                F.col("v.version").cast("string"),
            ).alias("segment_at"),
            F.col("v.valid_from"),
            F.col("v.valid_to"),
        )
    )
    return (
        o.join(
            F.broadcast(dim),
            (o.o_custkey == dim.c_custkey)
            & (o.o_orderdate >= dim.valid_from)
            & (o.o_orderdate < dim.valid_to),
        )
        .groupBy("version", "segment_at")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast(
                    "double"
                ),
                4,
            ).alias("revenue"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2,
             event_type, value
      FROM events
    ),
    clicks AS (
      SELECT user_id, ts2, MAX(value) AS click_value
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts2
    ),
    purch AS (
      SELECT event_id, user_id, ts2, value AS purchase_value
      FROM ev WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT p.event_id, p.user_id, p.ts2 AS purchase_ts,
             p.purchase_value, c.ts2 AS click_ts, c.click_value,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch(p.ts2) - epoch(c.ts2)), c.ts2 ASC
             ) AS rn
      FROM purch p JOIN clicks c ON p.user_id = c.user_id
    )
    SELECT p.event_id, p.user_id, p.ts2 AS purchase_ts, p.purchase_value,
           c.click_ts, c.click_value
    FROM purch p
    LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
           ON c.event_id = p.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-in-time as-of join: each purchase matches its closest
    click (before OR after) by the same user — the sensor-alignment
    variant of the as-of join (pair each reading with the closest
    calibration sample, whichever side of it). Same union-merge plan as
    direction='backward': both the latest-preceding and
    earliest-following candidates ride ONE key-partitioned sort, so
    nearest costs exactly one shuffle, no expansion — while the oracle
    does the O(clicks×purchases-per-user) pairwise ranking that this
    plan exists to avoid. Ties (equidistant clicks) resolve to the
    earlier click on both engines."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", F.col("ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts2")
        .agg(F.max("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts2"), F.col("value").alias("purchase_value")
    )
    out = asof_join(
        purch,
        clicks.withColumnRenamed("ts2", "click_ts"),
        on="user_id",
        left_ts="ts2",
        right_ts="click_ts",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts2").alias("purchase_ts"),
        "purchase_value",
        "click_ts",
        "click_value",
    )


@query(
    "join_interval_bucketed",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id AS click_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.click_id, b.purchase_id,
           CAST(LEAST(a.s + 600, b.s + 600) - GREATEST(a.s, b.s) AS BIGINT)
             AS overlap_sec
    FROM a JOIN b
      ON a.user_id = b.user_id
     AND a.s < b.s + 600 AND b.s < a.s + 600
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join between two FACT-sized interval sets — the
    scale pattern range_join's docstring defers to: when neither side
    broadcasts, decompose the range predicate into an EQUI-join on
    (key, coarse time bucket) plus a residual overlap filter. Here:
    10-minute click windows × 10-minute purchase windows per user
    (attribution's click-to-purchase overlap), each interval exploded
    into the 1–2 grid buckets it covers, joined on (user_id, bucket),
    residual-filtered to true overlap, then deduped (a pair straddling
    a bucket boundary matches twice).

    Scale shape: one hash shuffle per side on (user_id, bucket) — no
    BroadcastNestedLoopJoin (plan-pinned), which is what Spark plans
    for a raw theta join and what dies when both sides are big. Bucket
    grain trades shuffle width vs residual selectivity; intervals
    spanning many buckets explode proportionally (cap grain at the
    interval's typical length). Timestamps truncate to seconds BEFORE
    arithmetic (parquet ns vs Spark µs vs DuckDB ns precision), so
    overlap seconds are exact BIGINTs."""
    ev = read_table(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts"))).cast("bigint")

    def side(etype, idname):
        return ev.filter(F.col("event_type") == etype).select(
            "user_id", F.col("event_id").alias(idname), sec.alias("s")
        )

    a = side("click", "click_id").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / 600), F.floor((F.col("s") + 600) / 600)
            )
        ),
    )
    b = side("purchase", "purchase_id").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / 600), F.floor((F.col("s") + 600) / 600)
            )
        ),
    )
    joined = a.alias("a").join(
        b.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.s") < F.col("b.s") + 600)
        & (F.col("b.s") < F.col("a.s") + 600),
    )
    return joined.select(
        F.col("a.user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.least(F.col("a.s") + 600, F.col("b.s") + 600)
            - F.greatest(F.col("a.s"), F.col("b.s"))
        )
        .cast("bigint")
        .alias("overlap_sec"),
    ).distinct()


@query(
    "join_asof_tolerance",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2,
             event_type, value
      FROM events
    ),
    clicks AS (
      SELECT user_id, ts2, MAX(value) AS click_value
      FROM ev WHERE event_type = 'click' GROUP BY user_id, ts2
    ),
    purch AS (
      SELECT event_id, user_id, ts2, value AS purchase_value
      FROM ev WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT p.event_id, p.user_id, p.ts2 AS purchase_ts,
             p.purchase_value, c.ts2 AS click_ts, c.click_value
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts2 >= c.ts2
    )
    SELECT event_id, user_id, purchase_ts, purchase_value,
           CASE WHEN click_ts >= purchase_ts - INTERVAL 30 MINUTE
                THEN click_ts END AS click_ts,
           CASE WHEN click_ts >= purchase_ts - INTERVAL 30 MINUTE
                THEN click_value END AS click_value
    FROM m
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof's
    ``tolerance=``): the latest preceding click counts only if it is
    within 30 minutes of the purchase — the attribution-window
    semantics of every conversion pipeline. Because backward as-of
    picks the LATEST preceding match, "latest match outside the
    window" implies every match is outside it, so the exact
    implementation is the plain as-of (operators/joins.py union-merge,
    one shuffle, zero expansion) followed by a null-out of matches
    older than the window — no second scan, no extra shuffle, and the
    same trick holds at any scale. Tie/null handling inherited from
    join_asof (second-truncated, right deduped per (user, second))."""
    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", F.col("ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts2")
        .agg(F.max("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts2"),
        F.col("value").alias("purchase_value"),
    )
    out = asof_join(
        purch,
        clicks.withColumnRenamed("ts2", "click_ts"),
        on="user_id",
        left_ts="ts2",
        right_ts="click_ts",
    )
    in_window = F.col("click_ts") >= F.col("ts2") - F.expr(
        "INTERVAL 30 MINUTE"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts2").alias("purchase_ts"),
        "purchase_value",
        F.when(in_window, F.col("click_ts")).alias("click_ts"),
        F.when(in_window, F.col("click_value")).alias("click_value"),
    )
