"""Property-based invariants (SURVEY §5.4) on tiny generated frames.

Hypothesis drives the inputs; each Spark job is a few rows, so examples
are capped low — the value is edge-case coverage (empty strings,
whitespace runs, duplicate rows, unicode), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from parquet_importer_spark.functions.text import shingles, token_count, tokens
from parquet_importer_spark.operators.dedup import (
    exact_dedup_groups,
    normalized_text_hash,
    simhash16,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
docs = st.lists(
    st.text(alphabet=" abcdeé\t", min_size=0, max_size=40), min_size=1, max_size=8
)


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@SETTINGS
@given(texts=docs)
def test_exact_dedup_partitions_rows(spark, texts):
    """Dedup groups partition the input: copy counts sum to row count,
    and identical normalized text always lands in one group."""
    df = _doc_df(spark, texts)
    groups = exact_dedup_groups(df, "text", "doc_id").collect()
    assert sum(g.n_copies for g in groups) == len(texts)
    hashes = [g.content_hash for g in groups]
    assert len(hashes) == len(set(hashes))


@SETTINGS
@given(texts=docs)
def test_dedup_hash_is_whitespace_invariant(spark, texts):
    """Normalization: leading/trailing space and case changes never
    split a group."""
    df = _doc_df(spark, texts)
    a = df.select(normalized_text_hash(F.col("text")).alias("h"))
    b = df.select(
        normalized_text_hash(F.upper(F.concat(F.lit("  "), F.col("text")))).alias("h")
    )
    assert [r.h for r in a.collect()] == [r.h for r in b.collect()]


@SETTINGS
@given(texts=docs, k=st.integers(min_value=2, max_value=4))
def test_shingle_count_bound(spark, texts, k):
    """Non-empty docs yield between 1 and n_tokens-k+1 distinct
    k-gram shingles (distinct can only shrink), never zero."""
    df = _doc_df(spark, texts)
    rows = df.select(
        token_count(F.col("text")).alias("n"),
        F.size(shingles(F.col("text"), k)).alias("s"),
    ).collect()
    for r in rows:
        assert 1 <= r.s <= max(r.n - k + 1, 1)


@SETTINGS
@given(texts=docs)
def test_simhash_shape_and_determinism(spark, texts):
    """SimHash is 16 chars of 0/1 and a pure function of the text."""
    df = _doc_df(spark, texts)
    one = df.select(simhash16(F.col("text")).alias("h")).collect()
    two = df.select(simhash16(F.col("text")).alias("h")).collect()
    assert one == two
    for r in one:
        assert len(r.h) == 16 and set(r.h) <= {"0", "1"}


@SETTINGS
@given(
    xs=st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=10),
    ys=st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=10),
)
def test_union_all_counts_add(spark, xs, ys):
    a = spark.createDataFrame([(v,) for v in xs], "v int")
    b = spark.createDataFrame([(v,) for v in ys], "v int")
    assert a.union(b).count() == len(xs) + len(ys)
    assert a.union(b).distinct().count() == len(set(xs) | set(ys))


@SETTINGS
@given(xs=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=12))
def test_filter_partitions_input(spark, xs):
    """pred + NOT pred partition every (non-null) row — the filter
    complement invariant behind filter_boolean/filter_null."""
    df = spark.createDataFrame([(v,) for v in xs], "v int")
    p = F.col("v") > 0
    assert df.filter(p).count() + df.filter(~p).count() == len(xs)


@SETTINGS
@given(
    xs=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=12),
    k=st.integers(min_value=1, max_value=5),
)
def test_topk_is_sorted_prefix(spark, xs, k):
    """ORDER BY + LIMIT k (TakeOrderedAndProject) must equal the first k
    of the fully sorted output."""
    df = spark.createDataFrame([(v,) for v in xs], "v int")
    top = [r.v for r in df.orderBy(F.col("v").desc()).limit(k).collect()]
    assert top == sorted(xs, reverse=True)[:k]


@SETTINGS
@given(texts=docs)
def test_tokens_roundtrip_token_count(spark, texts):
    """token_count == size(tokens) — the two builders never drift."""
    df = _doc_df(spark, texts)
    rows = df.select(
        token_count(F.col("text")).alias("a"),
        F.size(tokens(F.col("text"))).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in rows)


def test_connected_components_invariants(spark):
    """Cluster assignment is a partition of the node set: every node
    labeled exactly once, labels are component minima, and directly
    connected nodes share a label."""
    from parquet_importer_spark.operators.dedup import connected_components

    # two chains and a singleton: {1-2-3-4}, {10-11}, {20}
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 20)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {
        r.node: r.lab for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=14,
    )
)
def test_twophase_cc_matches_naive_on_random_graphs(spark, edges):
    """large-star/small-star and naive min-label propagation must
    produce the IDENTICAL labeling on arbitrary small graphs (self
    loops and duplicate edges included — both must be tolerated)."""
    from parquet_importer_spark.operators.dedup import (
        connected_components,
        connected_components_twophase,
    )

    nodes = spark.createDataFrame([(i,) for i in range(12)], "node long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    naive = {
        r.node: r.lab for r in connected_components(nodes, e).collect()
    }
    two = {
        r.node: r.lab
        for r in connected_components_twophase(nodes, e).collect()
    }
    assert naive == two


def test_twophase_cc_matches_naive_on_deep_chain(spark):
    """large-star/small-star must label a DIAMETER-63 path graph — the
    adversarial case where naive min-label propagation needs 63 rounds
    — within its default round budget, and must agree with the naive
    algorithm on a mixed graph (chain + star + triangle + singleton)."""
    from parquet_importer_spark.operators.dedup import (
        connected_components,
        connected_components_twophase,
    )

    chain_nodes = spark.createDataFrame(
        [(i,) for i in range(64)], "node long"
    )
    chain_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    got = {
        r.node: r.lab
        for r in connected_components_twophase(
            chain_nodes, chain_edges, max_iter=10
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}

    mixed_nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 22, 30)],
        "node long",
    )
    mixed_edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1),       # reversed chain
         (10, 11), (10, 12),                    # star
         (20, 21), (21, 22), (22, 20)],         # triangle
        "src long, dst long",
    )
    naive = {
        r.node: r.lab
        for r in connected_components(mixed_nodes, mixed_edges).collect()
    }
    twophase = {
        r.node: r.lab
        for r in connected_components_twophase(
            mixed_nodes, mixed_edges
        ).collect()
    }
    assert naive == twophase
    assert twophase[30] == 30  # singleton labels itself


def test_dedup_clusters_partition_docs(spark, sf_dir):
    """llm_dedup_clusters: every doc appears exactly once; identical
    normalized text ⇒ same cluster; cluster_id is the cluster min."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_dedup_clusters"](spark, sf_dir).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)
    exact = QUERIES["llm_dedup_exact"](spark, sf_dir).collect()
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    dup_groups = [r for r in exact if r.n_copies > 1]
    # exact-duplicate hash groups must land in one cluster each; at
    # least assert the canonical doc's cluster is shared group-wide
    # (membership is doc-level, but hash groups induce star edges)
    for g in dup_groups:
        assert g.canonical_id in cluster_of


def test_gopher_keep_is_conjunction(spark, sf_dir):
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_filter_gopher"](spark, sf_dir).collect()
    for r in rows:
        assert r.keep == (r.len_ok and r.tok_len_ok and r.stop_ok and r.alpha_ok)
    assert any(r.keep for r in rows) and any(not r.keep for r in rows), (
        "thresholds should split the corpus, not rubber-stamp it"
    )


def test_repetition_fractions_bounded(spark, sf_dir):
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["llm_repetition"](spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.dup_token_frac <= 1.0
        assert 0.0 <= r.dup_3gram_frac <= 1.0


def test_approx_quantiles_bracketed_and_monotone(spark, sf_dir):
    """Every group's GK rank-bracket flag must hold (the same contract
    the bound oracle hash-checks at sf0.01, re-asserted here at the
    local SF), and the exact min/max must be ordered."""
    from parquet_importer_spark.suite import QUERIES

    rows = QUERIES["agg_approx_quantile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lo <= r.hi
        assert r.within_q25 and r.within_q50 and r.within_q75, r


def test_editdist_pairs_find_planted_single_char_mutations(spark):
    """Recall check the oracle hash cannot provide: pairs of documents
    that differ by exactly ONE character (within the verify prefix)
    must surface with edit_dist == 1 — they share almost all shingles,
    so LSH banding recalls them, and the Levenshtein verify must score
    the mutation as a single edit."""
    from parquet_importer_spark.operators.dedup import minhash_editdist_pairs

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a stitch in time saves nine and a rolling stone gathers no moss",
        "pack my box with five dozen liquor jugs for the county fair day",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, t.replace("o", "0", 1)))  # one-char OCR flip
    # plus unrelated noise docs that must NOT pair with anything
    rows += [(100, "completely unrelated text about spark physical plans"),
             (101, "different again entirely with no overlap whatsoever")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_1, r.id_2): r.edit_dist
        for r in minhash_editdist_pairs(
            df, "text", "doc_id", max_edit=60, prefix=120
        ).collect()
    }
    for i in range(len(base)):
        pair = (2 * i, 2 * i + 1)
        assert pair in got, f"planted mutation pair {pair} not recalled"
        assert got[pair] == 1, (pair, got[pair])
    assert all(100 not in p and 101 not in p for p in got)
