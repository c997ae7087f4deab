"""Oracle parity sweep at an arbitrary scale factor (default sf0.1 —
10× the driver's sf0.01 gate). Catches scale-dependent fragility the
gate can't see: decimal→double conversion drift (SURVEY §7.4.8), tie
instability in larger groups, float sums crossing representability
thresholds.

Run: python tools/parity_sweep.py [sf_dir [query_name ...]]
(exit 1 on any mismatch; with names given, only those oracle pairs run)
"""
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import duckdb

import __spark_entry__ as e
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    # per-row projections (cast_coerce, fn_math) return O(n) rows and
    # the compare collects both sides fully: the 1 g default driver
    # heap OOMs at sf1's ~6M rows (round 13) while the box has 128 g
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs, oracles = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )


# reuse the test suite's canonicalizer/compare (NULL/bytes/list/timestamp
# handling + first-diff reporting) so this tool can never disagree with
# tests/test_parity.py on the same data
from tests.parity import compare  # noqa: E402

#: oracles DOCUMENTED as pinned to the sf0.01 gate path (their SQL
#: hardcodes it — the driver contract fixes oracle runs at sf0.01, so
#: an sf_dir-generic Spark side vs a pinned oracle is by-design
#: asymmetric at any other SF): skip them with a note instead of
#: reporting a false mismatch.
SF_PINNED = {
    "scan_rowgroup_stats": (
        "oracle reads parquet_metadata('/root/testdata/sf0.01/...') "
        "by documented design (suite/scans.py)"
    ),
}

#: oracles whose SQL is resource-bound ABOVE the gate SF (they stay
#: authoritative at and below sf0.01): skipped only for larger SFs.
OVER_GATE_RESOURCE = {
    "graph_kcore": (
        "the ORACLE (unrolled iterative k-core peeling in SQL) is "
        "resource-bound one decade above the gate: DuckDB spills past "
        "the ~56 GB free local disk at sf0.1 even with a 90 GB memory "
        "limit (round 13, 195 s to disk-full). The SPARK side is fine "
        "at this and two more decades (SCALE_LADDER sf10 rung + sf30 "
        "mid-rung) — an oracle scalability wall, not an engine one; "
        "the sf0.01 gate pair and the sf0.001 sweep pair stay "
        "authoritative"
    ),
}

only = set(sys.argv[2:])
if only:
    unknown = only - set(oracles)
    assert not unknown, f"unknown oracle names: {sorted(unknown)}"
    oracles = {k: v for k, v in oracles.items() if k in only}
import re  # noqa: E402

_sf_m = re.search(r"sf([0-9.]+)", SF)
_sf_val = float(_sf_m.group(1)) if _sf_m else None
if "/sf0.01" not in SF.rstrip("/"):
    for k, why in SF_PINNED.items():
        if k in oracles:
            del oracles[k]
            print(f"{k}: SKIPPED at {SF} — {why}")
if _sf_val is not None and _sf_val > 0.01:
    for k, why in OVER_GATE_RESOURCE.items():
        if k in oracles:
            del oracles[k]
            print(f"{k}: SKIPPED at {SF} — {why}")

fails = 0
for name in oracles:
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(oracles[name]).df()
        compare(sdf, odf, name)
    except AssertionError as ex:
        print(f"{name}: MISMATCH {str(ex)[:200]}")
        fails += 1
    except Exception as ex:  # noqa: BLE001 — report and continue the sweep
        print(f"{name}: ERROR {str(ex)[:160]}")
        fails += 1
print(f"done, fails={fails} ({len(oracles)} oracle pairs at {SF})")
sys.exit(1 if fails else 0)
