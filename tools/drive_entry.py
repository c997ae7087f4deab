"""Driver simulation: consume /root/repo/__spark_entry__.py exactly as the
verification driver does — import boundary only, no internal imports.

Usage: python drive_entry.py [query_name ...]
With names given, only those queries run (incremental re-verify after
touching a few operators); with none, the full registry runs."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as e
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry() at sf0.001
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0
print(df.limit(3).toPandas().to_string())

# 2. oracle comparison at sf0.01 (the driver's gate)
SF = "/root/testdata/sf0.01"
qs, oracles = e.queries(), e.oracle_sql()
assert set(oracles) <= set(qs), "oracle keys must be subset of queries"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def vhash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) if isinstance(v, float) else str(v) for v in r)
        for r in pdf[cols].itertuples(index=False)
    )
    return hashlib.sha256(str(rows).encode()).hexdigest()[:12]

only = set(sys.argv[1:])
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown query names: {sorted(unknown)}"
    qs = {k: v for k, v in qs.items() if k in only}

fails = 0
for name, fn in qs.items():
    sdf = fn(spark, SF).toPandas()
    if name in oracles:
        odf = con.execute(oracles[name]).df()
        ok = (len(sdf) == len(odf)
              and sorted(sdf.columns) == sorted(odf.columns)
              and vhash(sdf) == vhash(odf))
        print(f"{name}: spark={len(sdf)} oracle={len(odf)} "
              f"hash_match={vhash(sdf)==vhash(odf)} -> {'OK' if ok else 'MISMATCH'}")
        fails += 0 if ok else 1
    else:
        print(f"{name}: rows-only, {len(sdf)} rows")

# 3. probes
print("--- probes ---")
# trailing slash in sf_dir (driver may normalize differently)
p = e.queries()["flagship_pricing_summary"](spark, SF + "/").count()
print(f"probe trailing-slash sf_dir: {p} rows")
# repeat entry() — schema stability
df2 = e.entry(spark)
assert [f.name for f in df2.schema] == [f.name for f in df.schema]
print("probe repeat entry(): schema stable")
# queries() dict is fresh each call (driver may mutate)
d1 = e.queries(); d1.clear()
assert e.queries(), "queries() returned a shared mutated dict!"
print("probe queries() mutation: isolated")

sys.exit(1 if fails else 0)
