"""Production-scale LSH presets: the 128/16 MinHash profile and sign-bit
multi-probe must not lose planted near-duplicates relative to the toy
configs the sf-scale oracles check.

Fixtures are synthetic and seeded — the planted ground truth is known
exactly, so recall is measurable, not estimated."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from parquet_importer_spark.operators.dedup import (
    MINHASH_PROFILES,
    minhash_lsh_pairs,
)
from parquet_importer_spark.operators.similarity import (
    bucketed_scored_pairs,
    embedding_near_dup_pairs,
)


def _planted_corpus(n_base: int = 30, doc_len: int = 30, vocab: int = 4000):
    """n_base docs, each with a planted near-dup (drop 2 tokens →
    shingle Jaccard well above 0.7), plus unrelated noise docs."""
    rng = random.Random(1234)
    rows = []
    planted = []
    for i in range(n_base):
        toks = [f"w{rng.randrange(vocab)}" for _ in range(doc_len)]
        rows.append((2 * i, " ".join(toks)))
        rows.append((2 * i + 1, " ".join(toks[:-2])))
        planted.append((2 * i, 2 * i + 1))
    for j in range(n_base):
        toks = [f"w{rng.randrange(vocab)}" for _ in range(doc_len)]
        rows.append((1000 + j, " ".join(toks)))
    return rows, planted


def _recall(result_df, planted):
    got = {(r.id_1, r.id_2) for r in result_df.collect()}
    return sum(1 for p in planted if p in got) / len(planted)


def test_minhash_production_profile_recall(spark):
    rows, planted = _planted_corpus()
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    assert MINHASH_PROFILES["production"] == {"num_hashes": 128, "bands": 16}
    recalls = {
        name: _recall(
            minhash_lsh_pairs(
                docs, "text", "doc_id", jaccard_threshold=0.5, **prof
            ),
            planted,
        )
        for name, prof in MINHASH_PROFILES.items()
    }
    assert recalls["production"] >= recalls["toy"]
    # 0.9-Jaccard pairs land in >=1 of 16 8-row bands w.p. ~1-(1-0.9^8)^16
    assert recalls["production"] >= 0.95


def _planted_vectors(n_base: int = 40, dim: int = 16):
    """Near-dup pairs whose FIRST component straddles zero: +eps in the
    original, -eps in the copy — single-bucket sign LSH provably splits
    every planted pair, multi-probe must recover them."""
    rng = random.Random(99)
    rows = []
    planted = []
    for i in range(n_base):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        v[0] = 0.004
        w = list(v)
        w[0] = -0.004
        rows.append((2 * i, v))
        rows.append((2 * i + 1, w))
        planted.append((2 * i, 2 * i + 1))
    return rows, planted


def test_multiprobe_recovers_straddling_pairs(spark):
    rows, planted = _planted_vectors()
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    single = embedding_near_dup_pairs(emb, threshold=0.99)
    probed = embedding_near_dup_pairs(emb, threshold=0.99, probe_epsilon=0.01)
    r_single = _recall(single, planted)
    r_probed = _recall(probed, planted)
    assert r_single == 0.0, "sign bit of the straddling dim splits every pair"
    assert r_probed == 1.0, "multi-probe must recover all straddling pairs"


def test_multiprobe_is_superset_and_deduped(spark):
    rows, _ = _planted_vectors()
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    single = {
        (r.id_1, r.id_2) for r in bucketed_scored_pairs(emb).collect()
    }
    probed_rows = bucketed_scored_pairs(emb, probe_epsilon=0.01).collect()
    probed = {(r.id_1, r.id_2) for r in probed_rows}
    assert single <= probed
    assert len(probed_rows) == len(probed), "probe dedupe leaves one row/pair"


def test_probe_epsilon_none_matches_legacy_bucketing(spark):
    """probe_epsilon=None must be bit-identical to the original
    single-bucket path (the oracle-checked suite queries rely on it)."""
    rows, _ = _planted_vectors(n_base=10)
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    legacy = sorted(
        (r.bucket, r.id_1, r.id_2, r.cos_sim)
        for r in bucketed_scored_pairs(emb).collect()
    )
    from parquet_importer_spark.operators.similarity import sign_bucket

    recomputed = sorted(
        (r.bucket, r.id_1, r.id_2)
        for r in emb.select(
            sign_bucket(F.col("embedding"), 4).alias("bucket"), "vec_id"
        )
        .alias("a")
        .join(
            emb.select(
                sign_bucket(F.col("embedding"), 4).alias("bucket"), "vec_id"
            ).alias("b"),
            "bucket",
        )
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            "bucket",
            F.col("a.vec_id").alias("id_1"),
            F.col("b.vec_id").alias("id_2"),
        )
        .collect()
    )
    assert [t[:3] for t in legacy] == recomputed


@pytest.mark.parametrize("profile", ["toy", "production"])
def test_minhash_profiles_run_on_real_table(spark, profile):
    from parquet_importer_spark.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = minhash_lsh_pairs(
        docs, "text", "doc_id", jaccard_threshold=0.3,
        **MINHASH_PROFILES[profile],
    )
    assert out.columns == ["id_1", "id_2", "n_shared_bands", "jaccard"]
    assert out.count() >= 0


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """Learned-centroid IVF must place most of the true top-10 (by exact
    brute-force cosine) into its probed result — the recall contract that
    makes IVF usable as an ANN index."""
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
        topk_cosine,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    truth = {r.vec_id for r in topk_cosine(emb, qdf, k=10).collect()}
    cent = kmeans_centroids(emb, "embedding", n_centroids=8, seed=42)
    assert cent.count() == 8
    got = {
        r.vec_id
        for r in ivf_topk(emb, qdf, nprobe=4, k=10, centroids=cent).collect()
    }
    assert len(truth & got) >= 6, f"IVF recall too low: {truth & got}"


def test_affine_family_production_recall(spark):
    """The affine universal-hash family must match the seeded-md5
    family's recall at the production profile — the 128× md5 saving
    must not cost planted near-duplicates."""
    from parquet_importer_spark.operators.dedup import (
        affine_minhash_lsh_pairs,
    )

    rows, planted = _planted_corpus()
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    recall = _recall(
        affine_minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.5,
            **MINHASH_PROFILES["production"],
        ),
        planted,
    )
    assert recall >= 0.95


def test_adaptive_sign_bits_schedule():
    """Bit count must hold the historical 4 at every driver test SF
    (so oracle results are unchanged) and grow logarithmically with the
    corpus so in-bucket pair expansion — n²/2^bits — stays linear in n.
    The arithmetic must mirror the SQL oracle's
    GREATEST(4, LEAST(16, CEIL(LOG2(GREATEST(n/125.0, 1.0))))) exactly."""
    from parquet_importer_spark.operators.similarity import adaptive_sign_bits

    assert adaptive_sign_bits(0) == 4
    assert adaptive_sign_bits(20) == 4      # sf0.001 embeddings
    assert adaptive_sign_bits(200) == 4     # sf0.01
    assert adaptive_sign_bits(2000) == 4    # sf0.1 (2000/125 = 16 → exactly 4)
    assert adaptive_sign_bits(2001) == 5    # first growth step
    assert adaptive_sign_bits(20000) == 8   # sf1 replica fixture
    assert adaptive_sign_bits(10**9) == 16  # clamped
    # linearity invariant: occupancy n/2^bits never exceeds 2×target
    # until the clamp engages
    for n in (300, 5000, 77_777, 1_000_000, 5_000_000):
        bits = adaptive_sign_bits(n)
        assert n / (1 << bits) <= 250, (n, bits)
