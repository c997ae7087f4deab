"""Bucket/posting-cap valves: ON by default (10k — a no-op below 10k
docs/vectors, so test-SF results stay oracle-exact) and, when tightened,
they bound the pair space exactly as documented."""

from __future__ import annotations

from parquet_importer_spark.io import read_table
from parquet_importer_spark.operators.dedup import (
    jaccard_topk_pairs,
    minhash_lsh_pairs,
)
from parquet_importer_spark.operators.similarity import bucketed_scored_pairs

SF = "/root/testdata/sf0.001"


def test_minhash_cap_bounds_candidates(spark):
    docs = read_table(spark, SF, "documents")
    uncapped = minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.1)
    wide = minhash_lsh_pairs(
        docs, "text", "doc_id", jaccard_threshold=0.1, max_bucket=1_000_000
    )
    assert wide.count() == uncapped.count(), "huge cap must be a no-op"
    assert (
        minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.1, max_bucket=1
        ).count()
        == 0
    ), "cap=1 drops every pair-producing bucket"


def test_jaccard_posting_cap(spark):
    docs = read_table(spark, SF, "documents")
    uncapped = jaccard_topk_pairs(docs, "text", "doc_id", top=5)
    wide = jaccard_topk_pairs(docs, "text", "doc_id", top=5, max_posting=1_000_000)
    assert [r.asDict() for r in wide.collect()] == [
        r.asDict() for r in uncapped.collect()
    ]
    assert (
        jaccard_topk_pairs(docs, "text", "doc_id", top=5, max_posting=1).count() == 0
    )


def test_embedding_bucket_cap(spark):
    emb = read_table(spark, SF, "embeddings")
    uncapped = bucketed_scored_pairs(emb).count()
    assert bucketed_scored_pairs(emb, max_bucket=1_000_000).count() == uncapped
    assert bucketed_scored_pairs(emb, max_bucket=1).count() == 0


def test_default_caps_active_and_exact(spark):
    """The scale valves default ON (not None) — and at test SF the
    default cap is provably a no-op vs an explicitly uncapped run."""
    import inspect

    assert inspect.signature(minhash_lsh_pairs).parameters["max_bucket"].default == 10_000
    assert inspect.signature(jaccard_topk_pairs).parameters["max_posting"].default == 10_000
    assert (
        inspect.signature(bucketed_scored_pairs).parameters["max_bucket"].default
        == 10_000
    )

    docs = read_table(spark, SF, "documents")
    assert (
        minhash_lsh_pairs(docs, "text", "doc_id", jaccard_threshold=0.1).count()
        == minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.1, max_bucket=None
        ).count()
    )
    assert [
        r.asDict() for r in jaccard_topk_pairs(docs, "text", "doc_id", top=5).collect()
    ] == [
        r.asDict()
        for r in jaccard_topk_pairs(
            docs, "text", "doc_id", top=5, max_posting=None
        ).collect()
    ]
    emb = read_table(spark, SF, "embeddings")
    assert (
        bucketed_scored_pairs(emb).count()
        == bucketed_scored_pairs(emb, max_bucket=None).count()
    )
