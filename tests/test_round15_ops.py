"""Round-15 optimization-round tests.

Pins for internals the round restructured: graph_pagerank's
single-exchange round (operators/graph.py) must stay bit-identical to
the dedicated-dangling-aggregate form it replaced, including on graphs
that exercise the sentinel seed (no dangling nodes at all).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401


def _reference_pagerank(nodes, edges, n_iter, damping=0.85):
    """The pre-r15 loop, verbatim semantics: dedicated dangling
    aggregate + base-side left join per round. Kept here as the float-
    contract reference for the single-exchange rewrite."""
    n = nodes.count()
    edges = edges.localCheckpoint(eager=True)
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = (
        nodes.select(F.col("id").alias("node"))
        .join(out_deg, "node", "left")
        .withColumn("out_deg", F.coalesce(F.col("out_deg"), F.lit(0)))
        .localCheckpoint(eager=True)
    )
    ranks = base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    d15 = "decimal(38,15)"
    for _ in range(n_iter):
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(
                F.round(F.sum(F.col("rank").cast(d15)).cast("double"), 15),
                F.lit(0.0),
            ).alias("d")
        )
        contribs = (
            edges.join(
                ranks.filter(F.col("out_deg") > 0),
                edges["src"] == F.col("node"),
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(
                F.round(
                    F.sum(F.col("c").cast(d15)).cast("double"), 15
                ).alias("in_mass")
            )
        )
        ranks = (
            base.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "out_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("d") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")


def test_pagerank_single_exchange_matches_reference(spark):  # noqa: F811
    """The r15 single-exchange round (sentinel dangling group + presence
    messages in ONE shuffle) must reproduce the old two-pass form's
    doubles EXACTLY — the decimal-sum-snap contract is bit-level."""
    from parquet_importer_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # a clique (0,1,2), a chain 3->4->5, isolates 6,7 (dangling), and a
    # dangling sink 5 — mixes contributing, receiving-only and dangling
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (3, 4), (4, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r.node: r.rank
        for r in pagerank(nodes, edges, n_iter=4).collect()
    }
    want = {
        r.node: r.rank
        for r in _reference_pagerank(nodes, edges, n_iter=4).collect()
    }
    assert got == want  # exact double equality, not approx


def test_kmeans_centroids_partitioning_invariant(spark):  # noqa: F811
    """The r15 hand-rolled Lloyd fit must produce IDENTICAL centers
    regardless of input partitioning — the decimal-exact snapped means
    are the property that makes llm_sim_ivf_kmeans's recall bound a
    code constant instead of a reduction-order coin flip (the MLlib
    fit it replaced had no such guarantee)."""
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {
        r.cid: list(r.cvec)
        for r in kmeans_centroids(emb, n_centroids=8, seed=42).collect()
    }
    b = {
        r.cid: list(r.cvec)
        for r in kmeans_centroids(
            emb.repartition(17), n_centroids=8, seed=42
        ).collect()
    }
    assert a == b  # exact double equality across partitionings


def test_pagerank_no_dangling_graph(spark):  # noqa: F811
    """No dangling nodes at all: the sentinel group holds only the
    0.0 seed row, so d must be exactly 0.0 every round — equal ranks on
    a symmetric cycle, summing to 1."""
    from parquet_importer_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {r.node: r.rank for r in pagerank(nodes, edges, n_iter=6).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert max(out.values()) == pytest.approx(min(out.values()), abs=1e-12)
