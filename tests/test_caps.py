"""Bucket/posting-cap valves: off by default (oracle-exact), and when
enabled they bound the pair space exactly as documented."""

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
