"""§2.E — window functions.

Window evaluation shuffles once on partitionBy and sorts within
partitions; at 100 TB the thing to avoid is a partition-less window
(single-task global sort) — only `sort_multikey` uses one, deliberately,
on a small dimension. Running double sums accumulate in DECIMAL so the
frame-order arithmetic is bit-identical across engines (registry docs).
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
    "win_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts2, value
      FROM events
    )
    SELECT event_id, user_id, ts2, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(value) OVER w AS first_value,
           LAG(value, 2, -1.0) OVER w AS prev2_or_default
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts2, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first over each user's event timeline; event_id breaks
    second-level ties so both engines walk the same order."""
    w = Window.partitionBy("user_id").orderBy("ts2", "event_id")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("ts2"),
        "value",
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts2",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS running_spend,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS orders_in_window
    FROM orders
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running / sliding ROWS frames (per-customer cumulative spend)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = w.rowsBetween(-2, Window.currentRow)
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.round(
            F.sum(F.col("o_totalprice").cast(_DEC)).over(run).cast("double"), 4
        ).alias("running_spend"),
        F.count(F.lit(1)).over(slide).cast("bigint").alias("orders_in_window"),
    )


@query(
    "win_frame_range",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, value,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
      FROM events
    )
    SELECT event_id, user_id, ts_sec,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER (
             PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 4) AS trailing_7d_value
    FROM ev
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: 7-day trailing sum per user. RANGE frames are
    tie-insensitive (all peers of the current value join the frame), so
    no extra tiebreaker is needed."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp(F.date_trunc("second", F.col("ts")))
        .cast("bigint")
        .alias("ts_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-604800, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.round(
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double"), 4
        ).alias("trailing_7d_value"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    quartiles per market segment. The custkey tie-break makes ntile
    deterministic (frame order matters for it, unlike rank). One
    shuffle on the partition key, shared by all three functions."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS ts_s,
             CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, v,
           last_value(v IGNORE NULLS) OVER w AS last_nonnull,
           first_value(v IGNORE NULLS) OVER w AS first_nonnull
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics — last/first non-null observation
    carried forward per user (the gap-bridging primitive behind
    forward-fill; ts_interpolate builds on the same shape). Values are
    deterministically nullified (event_type = 'click') so both engines
    see identical gaps; no arithmetic touches v, so doubles pass
    through bit-identical."""
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("ts_s"),
        F.when(F.col("event_type") == "click", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("last_nonnull"),
        F.first("v", ignorenulls=True).over(w).alias("first_nonnull"),
    )


@query(
    "win_pct_change",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {oracle_exact_sum('value')} AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, v,
           ROUND((v - lag(v) OVER w) / NULLIF(lag(v) OVER w, 0), 6)
             AS pct_change
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period percent change — the day-over-day delta every
    metrics dashboard computes: daily decimal-exact totals per series,
    then (v - lag(v)) / lag(v) over the series partition (first day
    NULL). The daily aggregate partial-combines map-side over however
    many scan splits the events table has and shuffles only (series,
    day) partials; the window then adds its own exchange over the TINY
    daily frame (days × |series| rows). History (round 11): the
    original form pre-repartitioned the RAW events by event_type to
    "share one exchange" — but event_type has CONSTANT cardinality, so
    that collapsed the heavy aggregation onto |series| tasks (the
    sf100 rung read xlin_c 2.27 with 20M rows per task single-
    threaded). The "saved" exchange moves only the daily rollup; the
    lost parallelism cost three decades of slope. Post-fix xlin_c
    in SCALE_LADDER.json. The division is
    identical IEEE on both engines because both operands are
    grid-snapped, and a zero previous-day total is NULLIF-guarded on
    both sides (non-ANSI Spark and DuckDB disagree on 0-divisor
    doubles)."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(exact_sum("value").alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("v").over(w)
    return daily.select(
        "event_type",
        "day",
        "v",
        F.round(
            (F.col("v") - prev) / F.nullif(prev, F.lit(0.0)), 6
        ).alias("pct_change"),
    )


@query(
    "win_moving_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {oracle_exact_sum('value')} AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, v,
           ROUND((v - AVG(v) OVER w) / NULLIF(STDDEV_SAMP(v) OVER w, 0), 4)
             AS zscore
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly score: each day's total against its trailing
    7-day mean/stddev per series — the simplest production anomaly
    detector. Variance accumulation over a frame is order-dependent in
    doubles, so the z-score rounds to 4 places (the agg_stats rule).
    Same round-11 fix as win_pct_change: the daily aggregate partial-
    combines at full scan parallelism and only the days × |series|
    rollup crosses the window's exchange — the old raw-events
    repartition("event_type") collapsed the heavy aggregation onto
    |series| tasks (constant parallelism at every scale)."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(exact_sum("value").alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    z = (F.col("v") - F.avg("v").over(w)) / F.nullif(
        F.stddev_samp("v").over(w), F.lit(0.0)
    )
    return daily.select(
        "event_type", "day", "v", F.round(z, 4).alias("zscore")
    )


@query(
    "win_concurrent_intervals",
    oracle="""
    WITH iv AS (
      SELECT event_type, event_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS ts, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, e AS ts, -1 AS delta, event_id FROM iv
    ),
    run AS (
      SELECT event_type,
             SUM(delta) OVER (
               PARTITION BY event_type
               ORDER BY ts, delta, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS n_active
      FROM pts
    )
    SELECT event_type,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(MAX(n_active) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY event_type
    """,
)
def win_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap analytics: each event opens a 5-minute activity
    interval; peak concurrency per event type via the classic
    boundary-sweep — +1 at interval start, −1 at end, running sum over
    the time-ordered boundaries, max of the running sum. Ends sort
    before starts at the same instant (delta ascending), so touching
    intervals never double-count; event_id makes the order total and
    both engines' running sums row-identical.

    Scale shape: ONE shuffle on event_type (the window partitioning),
    then a per-partition sort — the sweep never materializes pairwise
    overlaps (the naive self-join is O(n²) per hot window). A global
    (partition-less) concurrency curve at 100 TB would instead bucket
    boundaries by coarse time range, sweep per bucket, and prefix-sum
    the per-bucket net deltas — same primitive, two passes."""
    ev = read_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("ts"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        iv.select(
            "event_type",
            F.col("e").alias("ts"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("n_active"))
    return run.groupBy("event_type").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
        F.max("n_active").cast("bigint").alias("peak_concurrency"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH marked AS (
      SELECT o_custkey, o_orderdate,
             CAST(o_orderdate AS DATE)
               - CAST(DENSE_RANK() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                 ) AS INT) AS island_key
      FROM orders
    ),
    islands AS (
      SELECT o_custkey, island_key,
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS streak_days,
             MIN(o_orderdate) AS streak_start
      FROM marked GROUP BY o_custkey, island_key
    )
    SELECT o_custkey,
           CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           MIN(streak_start) AS first_order_day
    FROM islands GROUP BY o_custkey
    ORDER BY longest_streak DESC, o_custkey ASC
    LIMIT 25
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the classic streak detector (consecutive-day
    activity runs per customer) via the row_number-difference trick:
    for distinct (customer, day) rows sorted per customer,
    day − dense_rank is CONSTANT exactly within a run of consecutive
    days, so grouping by that difference materializes each island
    without any self-join or iteration. dense_rank (not row_number over
    a pre-distinct) absorbs same-day duplicate orders inside the SAME
    window pass — a separate distinct() would cost a second exchange on
    (customer, day). Reported per customer: longest streak, island
    count, first active day (top-25 by streak).

    Scale shape: one shuffle on the customer key, plan-pinned — the
    dense_rank window and both rollups all ride that single
    partitioning (the island GROUP BY key starts with o_custkey), so
    the whole pattern costs one exchange end-to-end at any corpus size.
    """
    d = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    marked = d.withColumn(
        "island_key",
        F.date_sub(F.col("o_orderdate"), F.dense_rank().over(w)),
    )
    islands = marked.groupBy("o_custkey", "island_key").agg(
        F.count_distinct("o_orderdate").cast("bigint").alias("streak_days"),
        F.min("o_orderdate").alias("streak_start"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.max("streak_days").cast("bigint").alias("longest_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.min("streak_start").alias("first_order_day"),
        )
        .orderBy(F.col("longest_streak").desc(), F.col("o_custkey").asc())
        .limit(25)
    )


@query(
    "win_sliding_quantiles",
    oracle="""
    WITH x AS (
      SELECT event_type, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_type, event_id,
           median(cents) OVER w / 100.0 AS med,
           quantile_cont(cents, 0.25) OVER w / 100.0 AS p25,
           quantile_cont(cents, 0.75) OVER w / 100.0 AS p75,
           (quantile_cont(cents, 0.75) OVER w
            - quantile_cont(cents, 0.25) OVER w) / 100.0 AS iqr
    FROM x
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median / quartiles / IQR over a 15-row frame per event
    series — the robust-statistics window under outlier gates (the
    median is what ts_anomaly_mad thresholds against; the IQR is the
    classic Tukey-fence width). Holistic window aggregates like these
    are the expensive cousins of the running sums in win_frame_rows:
    the engine keeps the frame's value multiset, not just an
    accumulator.

    Float contract (integer-exact, the ts_ewma playbook): inputs
    quantize to integer cents, and every interpolated quantile of
    integers at p ∈ {.25, .5, .75} is EXACT in doubles — the
    interpolation `a + (b−a)·p` only shifts the binary exponent by
    two, and |cents| < 2^40 leaves 13 spare mantissa bits — so both
    engines produce identical IEEE values no matter how their
    interpolation is associated, and the final /100.0 is one
    identical division.

    Scale shape: one shuffle on the series key; the 15-row frame
    bounds the per-row multiset, so memory is O(frame), not
    O(partition). At 100 TB this is the same single-exchange cost as
    every other window in this section."""
    ev = read_table(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    pct = lambda p: F.expr(f"percentile(cents, {p}D)").over(w)  # noqa: E731
    return x.select(
        "event_type",
        "event_id",
        (pct(0.5) / 100.0).alias("med"),
        (pct(0.25) / 100.0).alias("p25"),
        (pct(0.75) / 100.0).alias("p75"),
        ((pct(0.75) - pct(0.25)) / 100.0).alias("iqr"),
    )


@query(
    "win_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               + (abs(CAST(round(value * 100) AS BIGINT)) % 541) + 60 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max_e
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY s, e, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS island
      FROM m
    ),
    per AS (
      SELECT user_id, island,
             MAX(e) - MIN(s) AS span, COUNT(*) AS n_iv
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(span) AS BIGINT) AS covered_seconds,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals
    FROM per GROUP BY user_id
    """,
)
def win_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user — merge overlapping activity
    intervals and report total covered seconds plus merged-interval
    count: the utilization/billing primitive (machine-on time, session
    coverage, SLA overlap) that the peak-concurrency sweep
    (win_concurrent_intervals) does not answer. Each event opens
    [ts, ts + 60..600 s) with a value-derived deterministic duration.

    Classic two-window merge, no self-join: running MAX of interval
    end over the start-ordered frame (1 PRECEDING) marks island
    breaks (start strictly beyond everything seen -> new island, so
    touching intervals merge); a running SUM of the break flags
    numbers islands; one groupBy collapses each island to its span.
    All arithmetic on BIGINT epoch seconds — exact on both engines.

    Scale shape: ONE shuffle on user_id feeds both windows AND the
    island groupBy (same partitioning reused end-to-end); per-key
    work is a sort + linear sweep — the naive pairwise overlap test
    is O(n^2) per hot user and never appears. A global (key-less)
    coverage union at 100 TB would range-bucket starts and sweep per
    bucket with boundary stitching — same primitive, two passes.
    The tie order (s, e, event_id) is total, so both engines' running
    maxima agree row-for-row."""
    ev = read_table(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").cast("bigint")
    dur = (
        F.abs(F.round(F.col("value") * 100).cast("bigint")) % 541 + 60
    ).cast("bigint")
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + dur).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.max("e").over(w_prev).alias("prev_max_e"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    brk = F.when(
        F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
    ).otherwise(0)
    isl = m.select(
        "user_id", "s", "e", F.sum(brk).over(w_run).alias("island")
    )
    per = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("span"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return per.groupBy("user_id").agg(
        F.sum("span").cast("bigint").alias("covered_seconds"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        F.sum("n_iv").cast("bigint").alias("n_intervals"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH fs AS (
      SELECT event_type, user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      FROM events GROUP BY 1, 2
    ),
    per AS (
      SELECT event_type, day, COUNT(*) AS new_users
      FROM fs GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (
             PARTITION BY event_type ORDER BY day
           ) AS BIGINT) AS cum_users
    FROM per
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window — the audience-growth
    curve (per event type: new users each day + total distinct users
    ever seen through that day). SQL has no COUNT(DISTINCT) OVER and
    Spark only offers approx_count_distinct there; the exact answer
    falls out of the first-occurrence decomposition: a user counts
    toward the running distinct total exactly once, on their first
    day, so cumulative-distinct = running SUM of per-day first-seen
    counts. Days appear when they add at least one new user.

    All integer (counts + DATE grain), zero float surface.

    Scale shape: the corpus pass is ONE map-combinable groupBy to
    (type, user) grain — the min-day reduction — after which the
    frame is |distinct users|-sized; the per-day rollup and the
    running-sum window ride one slim (type)-keyed exchange over
    |types|×|days| rows. The approx variant (HLL partials merged by a
    range-frame window) only wins when even the (type, user) grain
    cannot shuffle; see agg_hll_partial_union."""
    ev = read_table(spark, sf_dir, "events")
    fs = ev.groupBy("event_type", "user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("day")
    )
    per = fs.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )
