"""Oracle parity sweep at an arbitrary scale factor (default sf0.1 —
10× the driver's sf0.01 gate). Catches scale-dependent fragility the
gate can't see: decimal→double conversion drift (SURVEY §7.4.8), tie
instability in larger groups, float sums crossing representability
thresholds.

Run: python tools/parity_sweep.py [sf_dir]   (exit 1 on any mismatch)
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as e
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
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


def vhash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) if isinstance(v, float) else str(v) for v in r)
        for r in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:12]


fails = 0
for name in oracles:
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(oracles[name]).df()
        ok = (
            len(sdf) == len(odf)
            and sorted(sdf.columns) == sorted(odf.columns)
            and vhash(sdf) == vhash(odf)
        )
    except Exception as ex:  # noqa: BLE001 — report and continue the sweep
        print(f"{name}: ERROR {str(ex)[:160]}")
        fails += 1
        continue
    if not ok:
        print(f"{name}: spark={len(sdf)} oracle={len(odf)} -> MISMATCH")
        fails += 1
print(f"done, fails={fails} ({len(oracles)} oracle pairs at {SF})")
sys.exit(1 if fails else 0)
