"""Iterative graph analytics over document-relation edges (EXT scope:
rank/centrality signals for corpus curation — e.g. propagate quality
through a near-duplicate/similarity graph).

Same scale discipline as operators/dedup.connected_components: every
iteration is one slim shuffle (join on node id) + one aggregate, with
``localCheckpoint`` truncating lineage so round N's plan doesn't
re-execute rounds 1..N-1.

Float contract (what makes the 10-round fixpoint hash-checkable
against an UNROLLED SQL oracle): the only order-dependent operation
in PageRank is the per-node contribution sum, so contributions
accumulate in DECIMAL(38,15) — c casts to 15 decimals (deterministic:
decimal midpoints are not representable as binary doubles, so both
engines' double→decimal casts see no tie), the sum is exact with
unscaled value ≤ 10^15 < 2^53, and the cast back to double snaps to
the 15dp grid via ROUND(..., 15) (a ≤1-ulp conversion difference is
under half the grid step). Every other op — rank/out_deg, the damping
affine map, dangling/n — is a single identical IEEE expression given
identical inputs, so ranks match bit-for-bit by induction over
rounds. The dangling mass uses the same decimal-sum-snap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Standard damped PageRank with uniform dangling-mass
    redistribution, fixed ``n_iter`` rounds.

    ``nodes``: one row per node (column ``id_col``). ``edges``: directed
    (src, dst) pairs — pass both directions for an undirected graph.

    Per round: contributions = rank/out_degree shuffled on dst (slim
    (dst, contrib) rows), one aggregate, dangling mass folded back
    uniformly. At 100 TB this is the canonical iterative-join workload:
    partition both sides on the node id once and every round's join
    reuses that partitioning; localCheckpoint bounds the plan.
    """
    n = nodes.count()
    # materialize edges ONCE: every eager round below joins against
    # them, and an expensive upstream (e.g. an LSH candidate pipeline)
    # would otherwise re-execute n_iter times
    edges = edges.localCheckpoint(eager=True)
    out_deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    base = (
        nodes.select(F.col(id_col).alias("node"))
        .join(out_deg, "node", "left")
        .withColumn("out_deg", F.coalesce(F.col("out_deg"), F.lit(0)))
        .localCheckpoint(eager=True)
    )
    ranks = base.select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    _D15 = "decimal(38,15)"
    for _ in range(n_iter):
        # dangling mass stays IN the plan: a 1-row aggregate broadcast
        # into the rank update — zero extra driver round-trips per
        # round (a per-round scalar fetch would be O(1) data but 10
        # driver hops per run). Float contract unchanged: the
        # decimal-sum-snap gives the identical double, and d/n is the
        # same single IEEE division on either side of the boundary.
        dangling = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(
                F.round(
                    F.sum(F.col("rank").cast(_D15)).cast("double"), 15
                ),
                F.lit(0.0),
            ).alias("d")
        )
        contribs = (
            edges.join(
                ranks.filter(F.col("out_deg") > 0),
                edges[src_col] == F.col("node"),
            )
            .select(
                F.col(dst_col).alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(
                F.round(
                    F.sum(F.col("c").cast(_D15)).cast("double"), 15
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
            # lazy: lineage still truncates at each round boundary, but
            # materialization folds into the consumer's job instead of
            # forcing one driver-scheduled job per round. Local wall
            # time is unchanged (the LSH edge build dominates); on a
            # cluster this removes 10 sequential driver->scheduler
            # round-trips per run.
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")
