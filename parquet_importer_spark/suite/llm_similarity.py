"""§2.J — similarity search over the embeddings table.

Brute-force cosine top-k (broadcast query, no corpus shuffle) as the
exact baseline; LSH sign-bucketed pairwise as the scale path. Both are
pure higher-order-function arithmetic — fold order is list order, so
DuckDB reproduces every similarity bit-for-bit (rounded to 6 to absorb
nothing: the folds are identical — rounding only guards future drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_importer_spark.functions.vectors import oracle_cosine
from parquet_importer_spark.io import parallelize, read_table
from parquet_importer_spark.operators.similarity import (
    bucketed_topk_pairs,
    embedding_near_dup_pairs,
    ivf_topk,
    topk_cosine,
)
from parquet_importer_spark.registry import query


@query(
    "llm_sim_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND({oracle_cosine('embedding', 'qvec')}, 6) AS cos_sim
    FROM embeddings CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 by cosine against the vec_id=0 query vector.
    Plan: broadcast 1-row query → codegen'd fold per row →
    TakeOrderedAndProject (per-partition top-k, no global sort)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    return topk_cosine(emb, qdf, "embedding", "vec_id", k=10)


@query(
    "llm_sim_pairs_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(range(1, 5),
               i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '')
               AS bucket
      FROM embeddings
    )
    SELECT x.bucket, x.vec_id AS id_1, y.vec_id AS id_2,
           ROUND({oracle_cosine('x.embedding', 'y.embedding')}, 6) AS cos_sim
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ORDER BY cos_sim DESC, id_1 ASC, id_2 ASC
    LIMIT 20
    """,
)
def llm_sim_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest pairs: sign-bit LSH buckets (first 4 dims →
    16 buckets) shrink the pairwise space ~16×; exact cosine within
    buckets; top-20 deterministic. At production scale swap fixed dims
    for seeded random hyperplanes + multi-probe — same plan shape."""
    return bucketed_topk_pairs(
        read_table(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        bucket_dims=4,
        top=20,
    )


@query(
    "llm_dedup_embedding",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(range(1, 5),
               i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), '')
               AS bucket
      FROM embeddings
    )
    SELECT id_1, id_2, cos_sim FROM (
      SELECT x.vec_id AS id_1, y.vec_id AS id_2,
             ROUND({oracle_cosine('x.embedding', 'y.embedding')}, 6) AS cos_sim
      FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    ) WHERE cos_sim >= 0.4
    """,
)
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bit LSH prune →
    exact cosine ≥ threshold. The synthetic corpus is random (max
    in-bucket cosine ~0.5), so the demo threshold is 0.4; real embedding
    spaces use ~0.95 — same plan, one constant."""
    return embedding_near_dup_pairs(
        read_table(spark, sf_dir, "embeddings"),
        "embedding",
        "vec_id",
        bucket_dims=4,
        threshold=0.4,
    )


@query(
    "llm_sim_ivf",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
    ),
    assigned AS (
      SELECT id, cid AS cluster, v FROM (
        SELECT e.vec_id AS id, e.embedding AS v, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND({oracle_cosine('e.embedding', 'c.cvec')}, 6)
                            DESC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT cid AS cluster FROM cent CROSS JOIN q
      ORDER BY ROUND({oracle_cosine('cvec', 'qvec')}, 6) DESC, cid ASC
      LIMIT 4
    )
    SELECT a.id AS vec_id, a.cluster,
           ROUND({oracle_cosine('a.v', 'qvec')}, 6) AS cos_sim
    FROM assigned a JOIN probes USING (cluster) CROSS JOIN q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def llm_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, the scale path past brute force: assign every vector to
    its nearest of 16 deterministic centroids (one slim max_by shuffle),
    probe the 4 clusters nearest the query, exact-score only inside them
    — ~4/16 of the corpus scanned instead of all of it."""
    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    return ivf_topk(
        emb, qdf, "embedding", "vec_id", n_centroids=16, nprobe=4, k=10
    )


@query("llm_sim_ivf_kmeans")  # rows-only: k-means float reduction order
def llm_sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with LEARNED centroids — the production swap llm_sim_ivf's
    docstring promises: MLlib k-means (seeded, distributed fit, KB-scale
    centers) feeds the identical assignment/probe/exact-score machinery.
    Rows-only: k-means results depend on float reduction order across
    partitionings, so no SQL oracle can be bit-stable."""
    from parquet_importer_spark.operators.similarity import kmeans_centroids

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    cent = kmeans_centroids(emb, "embedding", n_centroids=16, seed=42)
    return ivf_topk(
        emb, qdf, "embedding", "vec_id", nprobe=4, k=10, centroids=cent
    )


@query(
    "llm_sim_nearest_per_label",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT label, vec_id,
             ROUND({oracle_cosine('embedding', 'qvec')}, 6) AS cos_sim
      FROM embeddings CROSS JOIN q
    ),
    ranked AS (
      SELECT label, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY cos_sim DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT label, vec_id, cos_sim FROM ranked WHERE rn = 1
    """,
)
def llm_sim_nearest_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ANN: the single nearest vector to the query within each
    label class — window top-1 over the scored scan (one shuffle on
    label, which rides the same partitioning as any later per-label agg)."""
    from pyspark.sql import Window

    from parquet_importer_spark.functions.vectors import cosine

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    )
    scored = emb.crossJoin(qdf).select(
        "label",
        "vec_id",
        F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "vec_id", "cos_sim")
    )


@query(
    "llm_sim_range",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({oracle_cosine('embedding', 'qvec')}, 6) AS cos_sim
    FROM embeddings CROSS JOIN q
    WHERE {oracle_cosine('embedding', 'qvec')} >= 0.2
    """,
)
def llm_sim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range similarity search: every vector with cosine ≥ τ against the
    broadcast query — the retrieval-filter dual of top-k. Unlike top-k
    there is no ordering stage at all: the plan is scan → codegen'd fold
    → filter, embarrassingly parallel at any corpus size."""
    from parquet_importer_spark.functions.vectors import cosine

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    )
    sim = cosine(F.col("embedding"), F.col("qvec"))
    return (
        emb.crossJoin(qdf)
        .filter(sim >= 0.2)
        .select("vec_id", "label", F.round(sim, 6).alias("cos_sim"))
    )


@query(
    "llm_embed_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             GREATEST(list_max(list_transform(embedding,
                               x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) / scale * 127.0)
                         AS INTEGER)) AS q8
      FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           CAST(list_min(q8) AS INTEGER) AS q_min,
           CAST(list_max(q8) AS INTEGER) AS q_max,
           ROUND(list_sum(list_transform(q8, v -> CAST(v AS DOUBLE)
                                                  * CAST(v AS DOUBLE))), 1)
             AS q_energy
    FROM q
    """,
)
def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (per-vector max-abs scale →
    [-127,127]) — the 4× ANN memory/bandwidth shrink every production
    vector index applies before search. Pure array-expression math, no
    shuffle; the summary columns (range + energy) certify the codes
    without hauling the arrays through the compare. round() is
    half-away-from-zero in both engines (Spark non-ANSI `round` and
    DuckDB agree on exact halves like 0.5/127)."""
    emb = parallelize(read_table(spark, sf_dir, "embeddings"))
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.greatest(
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(xd(x)))),
        F.lit(1e-12),
    )
    s = emb.select("vec_id", "embedding", scale.alias("scale"))
    q8 = F.transform(
        F.col("embedding"),
        lambda x: F.round(xd(x) / F.col("scale") * 127.0).cast("int"),
    )
    q = s.select("vec_id", "scale", q8.alias("q8"))
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_min("q8").alias("q_min"),
        F.array_max("q8").alias("q_max"),
        F.round(
            F.aggregate(
                "q8", F.lit(0.0), lambda acc, v: acc + xd(v) * xd(v)
            ),
            1,
        ).alias("q_energy"),
    )


@query(
    "llm_sim_topk_batch",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 4
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND({oracle_cosine('e.embedding', 'q.qvec')}, 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    )
    SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, cos_sim
    FROM ranked WHERE rnk <= 5
    """,
)
def llm_sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched k-NN retrieval — production retrieval is never one query:
    top-5 neighbors for each of a broadcast query batch, in ONE corpus
    scan (each corpus row scores against every query in-loop, then a
    per-query window top-k). Corpus never shuffles for scoring; the only
    exchange carries (qid, vec_id, score) triples, pruned to k·|Q| rows
    by the rank filter. At 100 TB batch further: chunk the query set so
    each broadcast fits executor memory, one scan per chunk."""
    from pyspark.sql import Window

    from parquet_importer_spark.functions.vectors import cosine

    emb = read_table(spark, sf_dir, "embeddings")
    qdf = F.broadcast(
        emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
    )
    scored = (
        emb.crossJoin(qdf)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "rnk", "vec_id", "cos_sim")
    )


@query(
    "llm_embed_centroid_dist",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i.i AS pos,
             CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings, LATERAL (
        SELECT unnest(range(1, len(embedding) + 1)) AS i
      ) i
    ),
    cent AS (
      SELECT label, pos,
             ROUND(CAST(SUM(CAST(round(x, 6) AS DECIMAL(30,8)))
                        AS DOUBLE), 6) / COUNT(*) AS c
      FROM ex GROUP BY label, pos
    ),
    cvec AS (
      SELECT label, list(c ORDER BY pos) AS centroid FROM cent GROUP BY label
    )
    SELECT e.vec_id, e.label,
           ROUND(list_sum(list_transform(list_zip(e.embedding, v.centroid),
             p -> (CAST(p[1] AS DOUBLE) - p[2])
                  * (CAST(p[1] AS DOUBLE) - p[2]))), 6) AS dist2
    FROM embeddings e JOIN cvec v ON e.label = v.label
    """,
)
def llm_embed_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring: squared L2 distance of every
    vector to its LABEL's centroid — the distance-to-class-center
    signal curation pipelines threshold to drop mislabeled/garbage
    samples before training.

    Bit-portability: the centroid's cross-ROW mean is order-dependent
    in doubles, so components quantize to the 6-dp grid, accumulate in
    exact decimal, snap back to the grid, then one IEEE division —
    identical on both engines (the registry exact_avg recipe applied
    per dimension). The per-vector distance is then a position-ORDERED
    fold like every other vector op here.

    Scale shape: explode to (label, pos, x) rows → partial-aggregated
    groupBy — the classic mergeable element-wise mean, no single
    reducer sees a whole class; centroids (n_labels × dim rows →
    n_labels arrays) broadcast back to the un-shuffled corpus."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "label",
        F.col("pos0"),
        F.round(F.col("xf").cast("double"), 6).alias("xq"),
    )
    cent = ex.groupBy("label", "pos0").agg(
        (
            F.round(F.sum(F.col("xq").cast("decimal(30,8)")).cast("double"), 6)
            / F.count(F.lit(1))
        ).alias("c")
    )
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos0", "c"))),
            lambda s: s["c"],
        ).alias("centroid")
    )
    diff2 = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
    )
    return emb.join(F.broadcast(cvec), "label").select(
        "vec_id",
        "label",
        F.round(
            F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("dist2"),
    )


@query("llm_emb_pca_power")  # rows-only: cross-row float sums (order-dependent)
def llm_emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by distributed
    POWER ITERATION — the building block of corpus-level spectral
    diagnostics (anisotropy measurement, whitening, spectral dedup of
    embedding spaces): v ← normalize(Σ_rows x·(xᵀv)), 8 rounds from a
    deterministic uniform start.

    Why rows-only: each round's per-dimension sums accumulate doubles
    across rows, which is partition-order-dependent — the INVARIANTS
    (unit norm, Rayleigh-quotient growth, planted-direction recovery)
    are pinned in tests/test_round4_ops.py instead of a bit-exact
    oracle.

    Scale shape: per round, ONE map-side projection (dot product with
    the broadcast v — a 64-float literal, never a join) and one
    explode → groupBy(pos) partial-aggregated sum producing d rows; the
    d-vector collect is dimension-sized, not corpus-sized. 8 rounds =
    8 slim aggregations over an un-shuffled corpus scan (the scan is
    re-read per round; at 100 TB you'd cache or checkpoint the
    normalized input once)."""
    import math

    emb = read_table(spark, sf_dir, "embeddings")
    # dimension probe is an eager 1-row job at construction time; guard
    # the empty-table case explicitly instead of crashing on None[0]
    head = emb.select("embedding").head(1)
    if not head:
        return spark.createDataFrame(
            [], "pos int, component double, eigenvalue double"
        )
    dim = len(head[0][0])
    v = [1.0 / math.sqrt(dim)] * dim
    eigval = 0.0
    for _ in range(8):
        v_lit = F.array(*[F.lit(float(x)) for x in v])
        s = F.aggregate(
            F.zip_with(
                F.col("embedding"), v_lit, lambda x, c: x.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        contrib = emb.select(
            F.posexplode(
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double") * s
                )
            ).alias("pos", "w")
        )
        rows = (
            contrib.groupBy("pos").agg(F.sum("w").alias("w")).collect()
        )
        w = [0.0] * dim
        for r in rows:
            w[r.pos] = r.w
        eigval = math.sqrt(sum(x * x for x in w))
        if eigval == 0.0:
            break
        v = [x / eigval for x in w]
    return spark.createDataFrame(
        [(i, float(v[i]), float(eigval)) for i in range(dim)],
        "pos int, component double, eigenvalue double",
    )
