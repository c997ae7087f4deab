"""§2.A — scans / sources (REF rows of the inventory).

The reference's scan machinery (probe app.py:72-77, footer rowcount
app.py:91, 50k-row iter_batches app.py:94/111) all collapses into
``spark.read.parquet``: schema from the footer, row-group-aligned
parallel splits, count-star answered from footer statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table, table_path
from parquet_importer_spark.registry import query


@query("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns (reference app.py:111 streams these same
    rows sequentially; here the vectorized reader splits by row group)."""
    return read_table(spark, sf_dir, "lineitem")


@query(
    "scan_schema_probe",
    oracle="SELECT * FROM orders ORDER BY o_orderkey LIMIT 1",
)
def scan_schema_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row probe (reference app.py:72 reads rows=1 to sniff schema).
    Deterministic: ordered by primary key before LIMIT (SURVEY §7.4.4)."""
    return read_table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(1)


@query("scan_meta_rowcount", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def scan_meta_rowcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-star served from parquet footer stats — no data scan
    (reference app.py:91 reads metadata.num_rows the same way)."""
    return read_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query("source_select", oracle="SELECT * FROM region")
def source_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-based source resolution (reference app.py:32-49 chooses
    upload vs local path; distributed engines only have paths).
    Hash-checked (round 7): the mechanism (format().load(path)) has no
    SQL analog but its RESULT is the table itself."""
    return spark.read.format("parquet").load(table_path(sf_dir, "region"))


def _roundtrip_dir(tag: str) -> str:
    import os
    import tempfile

    d = os.path.join(tempfile.gettempdir(), f"pis_{tag}_{os.getpid()}")
    return d


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 4) AS sum_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source format: export a numeric/string projection of lineitem
    to CSV, read it back with an explicit schema (no inference scan),
    aggregate — the oracle computes the same aggregate from the original
    parquet, so the round-trip proves the CSV read path is lossless for
    the projected types. Distributed on both sides: the write is
    per-partition CSV part-files, the read splits them line-wise."""
    out = _roundtrip_dir("csv")
    src = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    src.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema("l_returnflag string, l_quantity double")
        .option("header", "true")
        .csv(out)
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(30,8)"))
                .cast("double"),
                4,
            ).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source format: export documents metadata to NDJSON,
    read back with explicit schema, aggregate vs the parquet oracle.
    JSON is the interchange format most raw LLM corpus drops arrive in
    (one doc per line) — this is the ingest edge of the pipeline."""
    out = _roundtrip_dir("json")
    src = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    src.write.mode("overwrite").json(out)
    back = spark.read.schema("doc_id long, lang string, n_chars long").json(out)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs
    FROM documents WHERE lang IN ('en', 'de') GROUP BY lang ORDER BY lang
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout — THE 100 TB table organization:
    write documents partitioned by lang (one directory per value), read
    back filtered to two languages. The filter becomes a PartitionFilter
    (directory pruning — non-matching partitions are never opened, see
    tests/test_plans.py::test_partitioned_read_prunes), which is how a
    petabyte table serves a single-partition query at interactive cost."""
    out = _roundtrip_dir("part")
    src = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # cluster on the partition column first so each lang directory gets
    # one file instead of one per input partition (guide §6 sizing). At
    # warehouse scale a hot language would make that single file a
    # straggler — size the per-partition file count with
    # repartition(n_files_per_lang × n_langs, "lang") exactly like
    # llm_text.py's postings write (r15 ADVICE: record the knob here too)
    src.repartition("lang").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang").isin("en", "de"))
    return (
        back.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE), 4)
             AS sum_total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink format (Spark's second columnar native format,
    common in Hive-lineage warehouses): export an orders projection to
    ORC, read it back, aggregate vs the parquet oracle. Exercises the
    vectorized ORC reader + predicate-capable columnar round-trip;
    the write is per-partition part-files, so both edges scale out."""
    out = _roundtrip_dir("orc")
    src = read_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    src.write.mode("overwrite").orc(out)
    back = spark.read.schema("o_orderstatus string, o_totalprice double").orc(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
                .cast("double"),
                4,
            ).alias("sum_total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "scan_rowgroup_stats",
    # the driver contract fixes oracle runs at sf0.01 (see
    # __spark_entry__ docstring), so the independent-footer-reader
    # check pins that path; the Spark side stays sf_dir-generic
    oracle="""
    SELECT CAST(row_group_id AS INT) AS row_group,
           CAST(row_group_num_rows AS BIGINT) AS num_rows,
           CAST(stats_min_value AS BIGINT) AS key_min,
           CAST(stats_max_value AS BIGINT) AS key_max
    FROM parquet_metadata('/root/testdata/sf0.01/orders.parquet')
    WHERE path_in_schema = 'o_orderkey'
    ORDER BY row_group
    """,
)
def scan_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group statistics table — the pruning observability surface:
    per row group, its row count and the min/max of the sort-ish key
    column from the parquet footer (the stats row-group pruning uses).
    Footer-only, no data scan — the distributed analog of the
    reference's metadata probe (app.py:91 num_rows/num_row_groups);
    at 100 TB this runs as one footer read per file, parallelized via
    a file-list DataFrame, never a data scan."""
    import pyarrow.parquet as pq

    from parquet_importer_spark.io import table_path

    md = pq.ParquetFile(table_path(sf_dir, "orders")).metadata
    key_idx = md.schema.names.index("o_orderkey")
    rows = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        stats = g.column(key_idx).statistics
        has_mm = stats is not None and stats.has_min_max
        rows.append(
            (
                rg,
                g.num_rows,
                int(stats.min) if has_mm else None,
                int(stats.max) if has_mm else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "row_group int, num_rows long, key_min long, key_max long",
    )


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT n_name, n_regionkey
    FROM nation ORDER BY n_name
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source format — NATIVE in Spark 4 (SPARK-44265, the former
    spark-xml package folded into core): export nation to XML with a
    row tag, read back with an explicit schema, verify row-for-row vs
    the parquet oracle. XML remains the interchange format of
    enterprise feeds (SEPA/ISO-20022, RSS/sitemaps in crawl pipelines);
    both edges are per-partition part-files, so ingest scales out like
    every other file source."""
    out = _roundtrip_dir("xml")
    src = read_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    src.write.mode("overwrite").format("xml").option("rowTag", "row").save(out)
    back = (
        spark.read.schema("n_name string, n_regionkey int")
        .format("xml")
        .option("rowTag", "row")
        .load(out)
    )
    return back.orderBy("n_name")
