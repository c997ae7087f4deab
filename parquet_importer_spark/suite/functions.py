"""§2.H — scalar function surface.

All JVM-side builtins (whole-stage codegen keeps these in generated
Java; no Python boundary anywhere). Parity rules:

- libm-backed fns (ln/pow) differ in the last ulp across engines →
  rounded on both sides;
- arrays/structs never cross the result boundary raw — flattened to
  scalars (engines stringify containers differently);
- floor/ceil return BIGINT in Spark but DOUBLE in DuckDB → cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name) AS name_lower,
           UPPER(c_mktsegment) AS seg_upper,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           c_name || '/' || c_mktsegment AS name_seg,
           TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
           REPLACE(c_name, 'Customer', 'Cust') AS name_replaced,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           SPLIT_PART(c_name, '#', 2) AS after_hash
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_replaced"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("after_hash"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
                AS BIGINT) AS days_to_cutoff,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR
             AS due_day,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-01").cast("date"), d)
        .cast("bigint")
        .alias("days_to_cutoff"),
        F.date_add(d, 30).cast("string").alias("due_day"),
        F.last_day(d).cast("string").alias("month_end"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_kilo_ceil,
           ROUND(LN(l_extendedprice), 8) AS price_ln,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           SQRT(l_quantity) AS qty_sqrt,
           LEAST(l_quantity, 25.0) AS qty_clamped,
           GREATEST(l_discount, l_tax) AS max_rate,
           CAST(CAST(FLOOR(l_quantity) AS BIGINT) % 7 AS BIGINT) AS qty_mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/ln/pow/sqrt/least/greatest/mod. ln and pow are
    libm-backed (last-ulp differences across engines) → rounded; sqrt is
    IEEE-correctly-rounded → exact. least = the reference's progress
    clamp min(x, 1.0) app.py:190."""
    li = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(q).cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias(
            "price_kilo_ceil"
        ),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.round(F.pow(q, 2), 6).alias("qty_sq"),
        F.sqrt(q).alias("qty_sqrt"),
        F.least(q, F.lit(25.0)).alias("qty_clamped"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        # floor first: CAST(double AS BIGINT) truncates in Spark but rounds
        # in DuckDB — floor makes the pair robust to non-integral inputs
        (F.floor(q).cast("bigint") % 7).cast("bigint").alias("qty_mod7"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) on the
    64-dim embedding column — the building blocks for llm_sim_topk.
    Folds accumulate in double, sequentially, in list order on both
    engines; rounded to 6 to absorb any fold-order ulp."""
    e = read_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).cast("bigint").alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x)), 6
        ).alias("vec_sum"),
        F.round(F.array_max(emb).cast("double"), 6).alias("vec_max"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)), 6
        ).alias("sq_norm"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
           COALESCE(json_extract_string(props, '$.missing'), 'absent')
             AS missing_filled
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column handling on events.props ('{"k": 87}'):
    get_json_object path extraction + from_json to a typed struct."""
    ev = read_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("missing_filled"),
    )


@query(
    "fn_struct",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': o_totalprice,
              'prio': o_orderpriority} AS meta
      FROM orders
    )
    SELECT o_orderkey,
           meta.status AS status,
           meta.price AS price,
           UPPER(meta.prio) AS prio_upper
    FROM s
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct build + field access (struct stays internal; output is
    flattened scalars so cross-engine representation is unambiguous)."""
    o = read_table(spark, sf_dir, "orders")
    meta = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )
    s = o.select("o_orderkey", meta.alias("meta"))
    return s.select(
        "o_orderkey",
        F.col("meta.status").alias("status"),
        F.col("meta.price").alias("price"),
        F.upper(F.col("meta.prio")).alias("prio_upper"),
    )


@query(
    "fn_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'R' THEN 'returned'
                WHEN l_linestatus = 'O' AND l_discount > 0.05 THEN 'open_discounted'
                WHEN l_quantity >= 40 THEN 'bulk'
                ELSE 'regular' END AS line_class,
           CASE l_linestatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END
             AS status_code
    FROM lineitem
    """,
)
def fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", "returned")
        .when((F.col("l_linestatus") == "O") & (F.col("l_discount") > 0.05),
              "open_discounted")
        .when(F.col("l_quantity") >= 40, "bulk")
        .otherwise("regular")
        .alias("line_class"),
        F.when(F.col("l_linestatus") == "O", 1)
        .when(F.col("l_linestatus") == "F", 2)
        .otherwise(0)
        .alias("status_code"),
    )


@query(
    "fn_explode_lateral",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(0, len(embedding))) AS BIGINT) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    """,
)
def fn_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array explosion with position (posexplode): one row per
    (vector, dimension). The 1→N fan-out is a narrow transformation —
    no shuffle, rows stream out of the scan partition-local; float32
    dims widen to double (exact) so both engines emit identical bits."""
    return (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.col("val").cast("double").alias("val"),
        )
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS k_and,
           CAST(o_orderkey | 4096 AS BIGINT) AS k_or,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS k_xor,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS k_bits,
           CAST(o_orderkey << 2 AS BIGINT) AS k_shl,
           CAST(o_orderkey >> 3 AS BIGINT) AS k_shr
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (mask/pack/popcount/shift) — the bit
    tricks behind bucket masks, bitmap indexes, and packed flag
    columns. Pure codegen projections; integer bit semantics are
    engine-identical so the whole family oracle-checks exactly."""
    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("k_and"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("k_or"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("k_xor"),
        F.bit_count(k).cast("bigint").alias("k_bits"),
        F.shiftleft(k, 2).cast("bigint").alias("k_shl"),
        F.shiftright(k, 3).cast("bigint").alias("k_shr"),
    )


@query(
    "fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS BIGINT) AS status_as_int,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN '2024-01-15'
                         ELSE 'not-a-date' END AS TIMESTAMP) AS maybe_ts,
           o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div
    FROM orders
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-absorbing functions — the tolerant-coercion
    surface (the reference's retry ladder app.py:114-122, expression
    form): try_cast yields NULL instead of raising on malformed input,
    try_divide on division by zero. On dirty 100 TB inputs this is the
    difference between a NULL-flagged row and a dead 10-hour job."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("bigint").alias("status_as_int"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("2024-01-15"))
        .otherwise(F.lit("not-a-date"))
        .try_cast("timestamp")
        .alias("maybe_ts"),
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).alias(
            "safe_div"
        ),
    )


@query(
    "fn_json_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_max,
           COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS k_present
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def fn_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation: numeric fields extracted from the
    JSON `props` string feed ordinary integer aggregates — the
    schema-on-read pattern for event payloads. Extraction is codegen
    (get_json_object), so the JSON never materializes as a struct
    column and the aggregate is a plain partial+final pass; at scale
    the upgrade is parsing once into a real column at ingest."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("k_sum"),
            F.max(k).cast("bigint").alias("k_max"),
            F.count(k).alias("k_present"),
        )
        .orderBy("event_type")
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max
    FROM events
    GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type — the
    open-schema ingest path: ``parse_json`` builds the binary variant
    ONCE per row, ``variant_get`` does typed path extraction without a
    declared schema (vs from_json's fixed StructType in fn_map_json /
    fn_json_agg). At 100 TB variants beat repeated string
    get_json_object calls because the JSON parses once into a
    binary-encoded form and every extraction is a cheap typed probe;
    shredding into parquet columns is the documented next step."""
    ev = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.min("k").cast("bigint").alias("k_min"),
            F.max("k").cast("bigint").alias("k_max"),
        )
        .orderBy("k_bucket")
    )


@query(
    "fn_url_extract",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'lang=([^&#]*)', 1) AS lang_param
    FROM u
    """,
)
def fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the crawl-pipeline field extractor (domain
    for per-site caps, path for boilerplate rules, query params for
    tracking-stripping). Spark side uses the built-in parse_url
    (codegen, JVM-side); the oracle reproduces each component with
    regexes. URLs are synthesized deterministically from table columns
    so both engines parse identical inputs."""
    d = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
    )
