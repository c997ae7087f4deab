"""§2.J — multimodal column pipeline (rows-only: binary payloads and a
Python decode stage are outside DuckDB-oracle scope by design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.operators.multimodal import (
    attach_payload,
    extract_features,
)
from parquet_importer_spark.registry import query


@query("llm_multimodal")  # rows-only
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload + typed metadata struct →
    Arrow-batched mapInPandas feature extraction (decode stubbed,
    plumbing real) → metadata join-back."""
    docs = read_table(spark, sf_dir, "documents")
    mm = attach_payload(docs, "text", "doc_id")
    feats = extract_features(mm.select("doc_id", "payload"))
    meta = mm.select("doc_id", F.col("media_meta.sha").alias("sha"))
    return feats.join(meta, "doc_id").orderBy("doc_id")
