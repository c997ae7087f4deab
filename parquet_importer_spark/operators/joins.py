"""Join algorithms beyond Spark's builtins: as-of and range joins.

The reference implements no joins at all (SURVEY §2.C); these are the
EXT operators a time-series/analytics workload needs, built so they
scale: the as-of join is a union-merge (ONE hash shuffle on the key,
sort within partitions, zero pairwise expansion) — the shape you want
at 100 TB, where a naive range-join + row_number explodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """Nearest-match join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction="backward"; "forward" = earliest
    right row with ``right_ts >= left_ts``; "nearest" = whichever of
    the two is closer in time, preferring the earlier on exact ties),
    per key ``on``.

    Algorithm (union sort-merge): tag both sides, union on
    (key, ts, side), and carry the most recent right payload forward with
    ``last(ignorenulls)`` over an unbounded-preceding row frame. Right
    rows sort before left rows at equal ts, so the match is inclusive.

    Scale: one shuffle on ``on``; within-partition sort; no expansion.
    Ties in ``right_ts`` within a key are resolved by the payload's
    struct ordering via ``max`` upstream — callers should de-duplicate
    right to one row per (key, ts) for full determinism.

    Right rows with a NULL ``right_ts`` are dropped up front: they have
    no position on the time axis, and in direction="nearest" a null ts
    inside a matched struct would make both distance comparisons false
    and silently fall through to the prev candidate.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right = right.filter(F.col(right_ts).isNotNull())

    lcols = [c for c in left.columns]
    rcols = [c for c in right.columns if c != on]

    l_struct = F.struct(*[F.col(c) for c in lcols]).alias("__l")
    r_struct = F.struct(*[F.col(c) for c in rcols]).alias("__r")

    r_struct_type = right.select(F.struct(*rcols).alias("__r")).schema["__r"].dataType
    l_struct_type = left.select(F.struct(*lcols).alias("__l")).schema["__l"].dataType

    l2 = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct,
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r2 = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct_type).alias("__l"),
        r_struct,
    )
    u = l2.unionByName(r2)

    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
    else:
        # nearest: BOTH candidates ride one sort — the latest right at
        # or before (prev, inclusive: right sorts before left on ties,
        # so an equal-ts match lands here with distance 0 and wins) and
        # the earliest right strictly after (next) — then pick the
        # smaller time distance, preferring prev on exact ties. Still
        # ONE shuffle on the key; no second pass, no expansion.
        asc = Window.partitionBy("__k").orderBy(
            F.col("__ts").asc(), F.col("__side").asc()
        )
        prev = F.last("__r", ignorenulls=True).over(
            asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        nxt = F.first("__r", ignorenulls=True).over(
            asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        d_prev = F.col("__ts").cast("double") - prev.getField(
            right_ts
        ).cast("double")
        d_next = nxt.getField(right_ts).cast("double") - F.col(
            "__ts"
        ).cast("double")
        matched = (
            F.when(prev.isNull(), nxt)
            .when(nxt.isNull(), prev)
            .when(d_next < d_prev, nxt)
            .otherwise(prev)
        )
        u = u.withColumn("__match_n", matched)
        out = (
            u.filter(F.col("__side") == 1)
            .select("__l.*", F.col("__match_n").alias("__match"))
        )
        for c in rcols:
            out = out.withColumn(c, F.col("__match").getField(c))
        return out.drop("__match")

    out = (
        u.withColumn("__match", matched)
        .filter(F.col("__side") == 1)
        .select("__l.*", "__match")
    )
    for c in rcols:
        out = out.withColumn(c, F.col("__match").getField(c))
    return out.drop("__match")


def range_join(
    left: DataFrame,
    right: DataFrame,
    predicate: Column,
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval join on an arbitrary range predicate.

    With a small right side (dimension of intervals — calendars, buckets,
    SLAs) Spark plans BroadcastNestedLoopJoin: each task streams its left
    partition against the in-memory right — no shuffle. For two big
    sides, pre-bucket both on coarse time grain and equi-join the bucket
    first (see streaming/sessionize for the same trick).
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, predicate, "inner")
