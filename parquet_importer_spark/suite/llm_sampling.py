"""§2.J (build additions) — dataset splitting and sampling for training
pipelines. Everything is hash-deterministic (md5 buckets, never rand()):
the same row lands in the same split on every engine, every run, every
cluster size — which is what makes train/test assignment reproducible
at 100 TB AND lets a SQL oracle verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.functions.text import md5_bucket
from parquet_importer_spark.io import read_table
from parquet_importer_spark.registry import query

#: hex-prefix threshold: buckets 00..cb → train (~80% of 256), cc..ff → test
_TRAIN_CUT = "cc"
_SAMPLE_CUT = "33"  # 00..32 → ~20% sample


@query(
    "llm_split_train_test",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN substr(md5('s9|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_CUT}'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test assignment by content-free id
    hash: membership is a pure function of doc_id, so re-runs,
    backfills, and incremental arrivals never flip a row's split —
    a narrow map over the scan, no shuffle at all."""
    d = read_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 9, 2)
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < _TRAIN_CUT, "train").otherwise("test").alias("split"),
    )


@query(
    "llm_sample_stratified",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             substr(md5('s11|' || CAST(doc_id AS VARCHAR)), 1, 2) < '{_SAMPLE_CUT}'
               AS sampled
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE sampled) AS BIGINT) AS n_sampled
    FROM s GROUP BY lang
    """,
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% per-stratum sample (here: per language) by id
    hash — every stratum gets the same rate without a per-stratum pass,
    and the sample is stable under reprocessing. One aggregate shuffle;
    the sampling predicate itself is map-side and would push into a
    scan-side filter when only the sample is read downstream."""
    d = read_table(spark, sf_dir, "documents")
    sampled = md5_bucket(F.col("doc_id").cast("string"), 11, 2) < _SAMPLE_CUT
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
    )
