"""§2.J — multimodal column pipeline (rows-only: binary payloads and a
Python decode stage are outside DuckDB-oracle scope by design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.io import read_table
from parquet_importer_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    resize_media,
    sample_frames,
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


@query(
    "llm_multimodal_binaryfile",
    # the binaryFile rows are fully derivable from the documents that
    # synthesized them: name, utf-8 byte length, content sha256
    oracle="""
    SELECT doc_id || '.bin' AS file_name,
           CAST(octet_length(encode(text)) AS BIGINT) AS length,
           sha256(text) AS sha
    FROM documents WHERE doc_id < 50
    """,
)
def llm_multimodal_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest a media directory as a table with the binaryFile source:
    (path, modificationTime, length, content) per file — the standard
    way raw image/audio dirs enter the lakehouse. Fixture files are
    synthesized from documents DISTRIBUTEDLY (foreachPartition writes on
    the executors — no driver collect(); local mode shares one
    filesystem, on a cluster the target would be a shared store and at
    scale this reads s3://bucket/imgs/ with path-glob pruning)."""
    import tempfile

    media_dir = tempfile.mkdtemp(prefix="pis_media_")
    fixture = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)  # deterministic subset, no bare limit
        .repartition(4)
    )

    def _write_files(rows):  # self-contained closure: executors run it
        import os  # noqa: PLC0415

        for r in rows:
            with open(os.path.join(media_dir, f"{r.doc_id}.bin"), "wb") as fh:
                fh.write(r.text.encode())

    fixture.foreachPartition(_write_files)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(media_dir)
    )
    return files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length"),
        F.sha2(F.col("content"), 256).alias("sha"),
    ).orderBy("file_name")


@query("llm_multimodal_resize")  # rows-only: Python decode stage
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline stage (1:1): payload → downscaled payload +
    integrity sha. Aggregated read-back proves the binary round-trip."""
    docs = read_table(spark, sf_dir, "documents")
    mm = attach_payload(docs, "text", "doc_id")
    resized = resize_media(mm.select("doc_id", "payload"), max_dim=64)
    return resized.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("resized_sha").alias("n_distinct_payloads"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


@query("llm_multimodal_frames")  # rows-only: Python decode stage
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (1→N fan-out): each payload yields 4 frame
    rows with per-frame hashes — the video-keyframe extraction shape."""
    docs = read_table(spark, sf_dir, "documents")
    mm = attach_payload(docs, "text", "doc_id")
    frames = sample_frames(mm.select("doc_id", "payload"), n_frames=4)
    return frames.groupBy("frame_no").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("frame_sha").alias("n_distinct_frames"),
        F.sum("n_frame_bytes").alias("total_bytes"),
    )
