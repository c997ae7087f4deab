"""Round-3 operator semantics: cross-corpus MinHash pairs (fuzzy
contamination), Bloom decontamination accounting, BM25 ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_importer_spark.operators.dedup import minhash_lsh_cross_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_pairs_never_emit_within_side(spark):
    """Two identical docs on the SAME side must not pair; a planted
    probe/corpus near-dup must."""
    probe = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different content words here now ok yes"),
        ],
    )
    corpus = _docs(
        spark,
        [
            (101, "alpha beta gamma delta epsilon zeta eta theta"),
            (102, "alpha beta gamma delta epsilon zeta eta theta"),
            (103, "unrelated corpus document about other matters entirely"),
        ],
    )
    got = minhash_lsh_cross_pairs(
        probe, corpus, "text", "doc_id", jaccard_threshold=0.5, k=2
    ).collect()
    pairs = {(r.probe_id, r.corpus_id) for r in got}
    assert (1, 101) in pairs and (1, 102) in pairs
    # 101/102 are identical but both corpus-side — never a pair; and
    # probe ids only ever appear on the probe side of a pair
    assert all(p in (1, 2) and c > 100 for p, c in pairs)
    assert all(r.jaccard == 1.0 for r in got if r.probe_id == 1)


def test_cross_pairs_side_cap_bounds_expansion(spark):
    """max_side drops a bucket whose corpus list exceeds the cap."""
    probe = _docs(spark, [(1, "same same text here")])
    corpus = _docs(
        spark, [(100 + i, "same same text here") for i in range(6)]
    )
    uncapped = minhash_lsh_cross_pairs(
        probe, corpus, "text", "doc_id", jaccard_threshold=0.1, k=2
    )
    capped = minhash_lsh_cross_pairs(
        probe, corpus, "text", "doc_id", jaccard_threshold=0.1, k=2,
        max_side=5,
    )
    assert uncapped.count() == 6
    assert capped.count() == 0


def test_bloom_counts_consistent(spark):
    """Bloom hits must be a superset of exact hits (no false negatives),
    and false positives must be exactly bloom minus exact per source."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_contamination_bloom"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected at least one source group"
    for r in rows:
        assert r.n_bloom_hits >= r.n_exact_hits
        assert r.n_false_positives == r.n_bloom_hits - r.n_exact_hits
        assert r.n_test >= r.n_bloom_hits


def test_bm25_ranks_all_query_terms_highest(spark):
    """A doc containing all three query terms repeatedly must outscore a
    doc containing none (which must not appear at all)."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_index_bm25"](spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_cross_pairs_consistent_with_full_pairs(spark):
    """On the same corpus, cross-corpus pairs must be EXACTLY the
    within-corpus pairs that straddle the side boundary (same banding,
    same threshold) — orientation normalized."""
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.dedup import minhash_lsh_pairs

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    probe = d.filter(F.col("doc_id") % 2 == 0)
    corpus = d.filter(F.col("doc_id") % 2 == 1)
    full = minhash_lsh_pairs(
        d, "text", "doc_id", jaccard_threshold=0.1, k=2
    ).collect()
    cross = minhash_lsh_cross_pairs(
        probe, corpus, "text", "doc_id", jaccard_threshold=0.1, k=2
    ).collect()
    want = {
        tuple(sorted((r.id_1, r.id_2)))
        for r in full
        if (r.id_1 % 2) != (r.id_2 % 2)
    }
    got = {tuple(sorted((r.probe_id, r.corpus_id))) for r in cross}
    assert got == want
