"""Round-9 unit coverage: the integer threshold chain that replaced
float ceil(log2) knobs, the widened prefix-filter pad, and the
prefix-filter upgrades' output invariance.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_importer_spark.operators.similarity import (
    int_threshold_bucket,
    int_threshold_bucket_sql,
)

SF_ORACLE = "/root/testdata/sf0.01"


def _expected_s(n: int, base: int, factor: int, max_s: int) -> int:
    s = 0
    while s < max_s and n > base * factor**s:
        s += 1
    return s


@pytest.mark.parametrize(
    "base,factor,max_s",
    [(5000, 2, 8), (2500, 4, 12)],
)
def test_int_threshold_bucket_engines_agree(spark, base, factor, max_s):
    """Spark chain == DuckDB chain == mathematical definition at every
    boundary (n = base*factor^s, +/-1) — exactly the points where the
    retired float ceil(log2(n/base)) could flip by 1 ulp per engine."""
    ns = sorted(
        {1, base - 1, base, base + 1}
        | {
            base * factor**s + d
            for s in range(max_s + 2)
            for d in (-1, 0, 1)
        }
    )
    sql = int_threshold_bucket_sql("n", base, factor, max_s)
    con = duckdb.connect()
    for n in ns:
        want = _expected_s(n, base, factor, max_s)
        got_duck = con.sql(f"SELECT {sql} FROM (SELECT {n}::BIGINT AS n)").fetchone()[0]
        assert got_duck == want, f"duckdb n={n}: {got_duck} != {want}"
    rows = spark.createDataFrame([(n,) for n in ns], "n bigint")
    got = {
        r["n"]: r["s"]
        for r in rows.select(
            "n", int_threshold_bucket(F.col("n"), base, factor, max_s).alias("s")
        ).collect()
    }
    for n in ns:
        assert got[n] == _expected_s(n, base, factor, max_s), f"spark n={n}"


def test_int_threshold_bucket_values_mapping(spark):
    vals = [1000 * 2**s for s in range(13)]
    sql = int_threshold_bucket_sql("n", 2500, 4, 12, values=vals)
    con = duckdb.connect()
    for n in (1, 2500, 2501, 2500 * 4**3, 2500 * 4**12 + 1):
        want = vals[_expected_s(n, 2500, 4, 12)]
        got = con.sql(f"SELECT {sql} FROM (SELECT {n}::BIGINT AS n)").fetchone()[0]
        assert got == want, f"n={n}: {got} != {want}"


def test_prefix_filter_max_df_overflow_guard(spark):
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.dedup import prefix_filter_jaccard_pairs

    with pytest.raises(ValueError, match="overflows"):
        prefix_filter_jaccard_pairs(
            read_table(spark, SF_ORACLE, "documents"),
            "text",
            "doc_id",
            k=3,
            max_df=10**12,
        ).count()


def test_prefix_filter_int_rank_path_matches_capped_string_path(spark):
    """The uncapped int-rank path and the capped string path (cap set
    above every real df, so nothing is actually pruned) realize the
    SAME total order and must emit identical pair sets — the bijection
    argument, checked end-to-end."""
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = read_table(spark, SF_ORACLE, "documents")
    key = lambda r: (r["d1"], r["d2"], r["inter_sz"], r["union_sz"], r["jacc"])  # noqa: E731
    uncapped = sorted(
        map(key, prefix_filter_jaccard_pairs(docs, "text", "doc_id", k=3).collect())
    )
    capped = sorted(
        map(
            key,
            prefix_filter_jaccard_pairs(
                docs, "text", "doc_id", k=3, max_df=10**9
            ).collect(),
        )
    )
    assert uncapped == capped
    assert len(uncapped) > 0


def test_prefix_filter_from_sets_requires_distinct(spark):
    """prefix_filter_jaccard_pairs_from_sets treats set_col as SETS
    (round-9 advice: duplicates inflate df/union while array_intersect
    dedupes, silently corrupting Jaccard). Round-10 verdict item 6
    closed the footgun: the helper now array_distincts the explode
    itself, so a duplicate-bearing caller gets TRUE Jaccards, not
    corrupted ones. Pin three things: (1) a bag input and its
    array_distinct'ed form produce IDENTICAL, correct output; (2) the
    true Jaccard values are right; (3) both in-repo callers feed
    distinct arrays anyway, so the internal guard is a no-op scan for
    them."""
    from parquet_importer_spark.functions.text import shingles, shingles_all
    from parquet_importer_spark.io import read_table
    from parquet_importer_spark.operators.dedup import (
        prefix_filter_jaccard_pairs_from_sets,
    )

    # |{a,b,c,d} ∩ {a,b,c,e}| / |∪| = 3/5; the bag row duplicates 'a'
    bag = spark.createDataFrame(
        [(1, ["a", "a", "b", "c", "d"]), (2, ["a", "b", "c", "e"])],
        "doc_id int, g array<string>",
    )
    run = lambda df: {  # noqa: E731
        (r["d1"], r["d2"]): (r["inter_sz"], r["union_sz"], float(r["jacc"]))
        for r in prefix_filter_jaccard_pairs_from_sets(
            df, "doc_id", "g", t_num=1, t_den=2
        ).collect()
    }
    from_bag = run(bag)
    from_set = run(bag.select("doc_id", F.array_distinct("g").alias("g")))
    assert from_set[(1, 2)] == (3, 5, 0.6)
    # pre-fix the duplicate inflated sz(doc1) 4→5 (union 6, jacc 0.5);
    # the internal array_distinct now makes the bag row identical
    assert from_bag == from_set

    # caller safety: shingles() (used by both in-repo callers) is
    # array_distinct(shingles_all()) — no duplicates can reach the helper
    docs = read_table(spark, SF_ORACLE, "documents").limit(50)
    dup_rows = (
        docs.select(shingles(F.col("text"), 2).alias("g"))
        .filter(F.size("g") != F.size(F.array_distinct("g")))
        .count()
    )
    assert dup_rows == 0
    # and shingles_all (the bag variant) is NOT fed to the helper: the
    # distinction exists, so this corpus genuinely exercises it
    bag_rows = (
        docs.select(shingles_all(F.col("text"), 2).alias("g"))
        .filter(F.size("g") != F.size(F.array_distinct("g")))
        .count()
    )
    assert bag_rows > 0
