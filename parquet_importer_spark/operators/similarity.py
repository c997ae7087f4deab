"""Similarity search over embedding columns (SURVEY §2.J llm_sim_topk).

Two tiers, as a 100-TB design requires:

- **brute-force top-k vs a query vector**: broadcast the 1-row query,
  cosine via zip_with/aggregate (codegen'd, no Python), then
  TakeOrderedAndProject — per-partition local top-k, driver merges
  k·partitions rows. Linear scan, zero shuffle of the corpus.
- **LSH-bucketed pairwise (the scale path)**: random-hyperplane-style
  sign buckets — here the deterministic variant: the sign bits of a
  fixed subset of dimensions. Pairwise cosine runs only within a
  bucket, turning O(n²) into Σ O(nᵦ²). Deterministic → SQL-oracle-able;
  swap the fixed dims for seeded random hyperplanes at production scale
  (same plan shape, still no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_importer_spark.functions.vectors import cosine
from parquet_importer_spark.io import parallelize


def topk_cosine(
    corpus: DataFrame,
    query_vec_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k most similar corpus vectors to the (single-row) query.

    ``query_vec_df`` must have one row with column ``qvec``. Broadcast
    cross join keeps the corpus scan shuffle-free.
    """
    q = F.broadcast(query_vec_df)
    scored = parallelize(corpus).crossJoin(q).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def sign_bucket(vec: Column, dims: int = 8) -> Column:
    """Deterministic LSH bucket: '0'/'1' string of the sign bits of the
    first ``dims`` components (1 = non-negative)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(dims)),
            lambda i: F.when(F.element_at(vec, i) >= 0, "1").otherwise("0"),
        ),
        "",
    )


def bucketed_topk_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_dims: int = 4,
    top: int = 20,
) -> DataFrame:
    """Most-similar vector pairs, searched only within LSH sign buckets.

    Approximate by construction (cross-bucket pairs are never scored) but
    fully deterministic. Returns top pairs under the total order
    (cos_sim desc, id_1, id_2).
    """
    b = parallelize(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    left = b.select(
        F.col("id").alias("id_1"), F.col("v").alias("v1"), "bucket"
    )
    right = b.select(
        F.col("id").alias("id_2"), F.col("v").alias("v2"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("id_1") < F.col("id_2"))
    scored = pairs.select(
        "bucket",
        "id_1",
        "id_2",
        F.round(cosine(F.col("v1"), F.col("v2")), 6).alias("cos_sim"),
    )
    return scored.orderBy(
        F.col("cos_sim").desc(), F.col("id_1").asc(), F.col("id_2").asc()
    ).limit(top)
