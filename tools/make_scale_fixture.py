"""Synthesize an sf1.0-equivalent fixture from the driver's sf0.1 data.

Round-6 verdict item 6: the scale ladder tops out at sf0.1, so any
super-linear surprise in the expensive queries (LSH, graph,
clustering) would first appear on a real cluster. This builds a 10×
replica at /root/repo/.scale/sf1 (gitignored — derived data) that
preserves the workload SHAPE a 10× corpus would have:

- region/nation copy through (dimensions don't scale).
- customer/supplier/part/orders/lineitem/events replicate 10× with a
  +10M·r key offset applied consistently across foreign keys, so join
  fan-outs scale linearly (every order still has its lineitems, every
  lineitem still finds its part/supplier).
- documents replicate 10× with every TOKEN tagged `_r{r}` in replicas
  r ≥ 1: token/shingle vocabulary grows 10× and cross-replica docs
  share no shingles, so the duplicate-cluster size distribution of the
  original corpus repeats 10× instead of every doc gaining 9 exact
  twins (which would make LSH bucket pair-expansion quadratic in the
  replica count — a workload no real 10× crawl has).
- embeddings replicate 10× with deterministic small noise per replica,
  so semantic-dedup cluster sizes grow ~10× but identical-vector
  pathologies don't appear.

Deterministic end to end (seeded numpy; duckdb SQL). ~6M lineitem /
50k documents / 20k embeddings. Run: python tools/make_scale_fixture.py
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import sys

SRC = "/root/testdata/sf0.1"
# usage: python tools/make_scale_fixture.py [replicas] [name]
# default 10 replicas -> .scale/sf1; `100 sf10` builds the 100x ladder
# rung used by tools/scale_ladder.py (same tagging scheme, so the
# duplicate-cluster distribution repeats per replica at every rung)
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
_NAME = sys.argv[2] if len(sys.argv) > 2 else "sf1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", _NAME
)
OFF = 10_000_000


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rng = range(REPLICAS)

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation"):
        write(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

    reps = "(SELECT unnest(range(0, %d)) AS r)" % REPLICAS

    write("customer", f"""
        SELECT c_custkey + r*{OFF} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', {reps}""")
    write("supplier", f"""
        SELECT s_suppkey + r*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {reps}""")
    write("part", f"""
        SELECT p_partkey + r*{OFF} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet', {reps}""")
    write("orders", f"""
        SELECT o_orderkey + r*{OFF} AS o_orderkey, o_custkey + r*{OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {reps}""")
    write("lineitem", f"""
        SELECT l_orderkey + r*{OFF} AS l_orderkey, l_partkey + r*{OFF} AS l_partkey,
               l_suppkey + r*{OFF} AS l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate
        FROM '{SRC}/lineitem.parquet', {reps}""")
    write("events", f"""
        SELECT event_id + r*{OFF} AS event_id, ts, user_id + r*{OFF} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', {reps}""")
    write("documents", f"""
        SELECT doc_id + r*{OFF} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_r' || r, 'g')
               END AS text,
               lang, source,
               CAST(len(CASE WHEN r = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1_r' || r, 'g')
               END) AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet', {reps}""")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label").to_numpy()
    parts = []
    for r in rng:
        noise = (
            np.zeros_like(vec)
            if r == 0
            else np.random.RandomState(1000 + r).uniform(-2e-3, 2e-3, vec.shape).astype(np.float32)
        )
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vid + r * OFF, type=pa.int64()),
                    "embedding": pa.array((vec + noise).tolist(), type=pa.list_(pa.float32())),
                    "label": pa.array(lab, type=pa.int32()),
                }
            )
        )
    # row_group_size matters: pyarrow's default (1Mi rows) wrote the
    # sf100 embeddings as TWO 1M-row groups, and Spark's vectorized
    # parquet reader assigns whole row groups to byte-splits — so 30 of
    # 32 scan tasks read ZERO rows and every per-row-heavy embedding op
    # ran its map stage at parallelism 2 (round 10: this single layout
    # flaw, not any plan shape, produced the ladder's three worst
    # embedding rows). Rows are wide (64 floats ≈ 600 B), so 65536-row
    # groups ≈ 25–40 MB — under Spark's split size at every rung, which
    # keeps every scheduled scan task non-empty.
    pq.write_table(
        pa.concat_tables(parts),
        f"{DST}/embeddings.parquet",
        row_group_size=65536,
    )
    print(f"embeddings: {len(vid) * REPLICAS} rows")


if __name__ == "__main__":
    main()
