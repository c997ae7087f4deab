"""Partition-invariance probe: prove query results don't depend on the
engine configuration by running each key under two deliberately
different layouts and comparing an order-insensitive value hash.

    python tools/partition_probe.py llm_char_entropy spatial_knn_join
    python tools/partition_probe.py          # the default probe list

Config A = local[5] / spark.sql.shuffle.partitions=7 (awkward, prime),
config B = local[32] / 32 (the test suite's). A key passes iff the two
hashes are byte-identical at sf0.01. This is the mechanical form of the
round-8 ad-hoc probe (SURVEY §8, "Partition-invariance probe"): the
decimal/integer-grid float contracts are supposed to make every
oracle-checked result independent of partitioning — a failure here
means a float accumulated order-dependently or a knob read an
engine-layout value, both of which WILL diverge on a real cluster.

Each config runs in its own subprocess (a SparkSession's master can't
change in-process).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

#: float-heavy / knob-bearing keys probed by default: the round-8 list
#: plus every round-9-changed key
DEFAULT_KEYS = (
    "llm_emb_pca_power",
    "llm_emb_whiten",
    "agg_ols_by_group",
    "agg_welch_ttest",
    "agg_mannwhitney_u",
    "ts_ewma",
    "ts_double_ewma_forecast",
    "agg_bootstrap_ci",
    "agg_rfm_rankcut",
    "ts_attribution_touch",
    "graph_pagerank",
    # round 9
    "llm_char_entropy",
    "llm_dedup_minhash_mllib",
    "llm_dedup_prefix_filter",
    "spatial_knn_join",
    "spatial_dbscan_core",
    # round 11: the slim INT-array verify keys, the three new scale
    # siblings (window caps / adaptive-k knobs), the decimal-grid
    # entropy flip, and the bucketed change-point rewrite — all probed
    # bit-identical under local[5]/7 vs local[32]/32 in-round
    "llm_dedup_near",
    "llm_dedup_containment",
    "llm_dedup_affine",
    "llm_sim_pairs_lsh_capped",
    "llm_semdedup_adaptive",
    "llm_dedup_embedding_capped",
    "llm_multimodal",
    "ts_change_points",
    # round 12/13: the decimal-promoted moment keys (overflow-class
    # fixes — the decimal accumulate is order-free by construction,
    # but the probe list's contract is every round-changed float-heavy
    # key; agg_ols_by_group already appears above)
    "ts_cross_correlation",
    "ts_autocorr",
    # round 13: the sf1-sweep signed-zero fixes (double-accumulated
    # statistics whose sign at exact-zero is partition-order noise —
    # the +0.0 normalization is precisely a partition-invariance
    # repair, so these two belong here permanently) and the
    # total-ordered LIMIT
    "agg_stats",
    "llm_dsir_weights",
    "limit_probe",
)

_CHILD = r"""
import hashlib, json, sys
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master({master!r})
         .config("spark.sql.shuffle.partitions", {shuffle!r})
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquet_importer_spark.suite import QUERIES
out = {{}}
for key in {keys!r}:
    df = QUERIES[key](spark, {sf!r})
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    h = hashlib.sha256(repr((cols, rows)).encode()).hexdigest()
    out[key] = (len(rows), h)
print("PROBE_JSON:" + json.dumps(out))
spark.stop()
"""


def run_config(master: str, shuffle: str, keys: tuple) -> dict:
    code = _CHILD.format(root=ROOT, master=master, shuffle=shuffle, keys=keys, sf=SF)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_JSON:"):
            return json.loads(line[len("PROBE_JSON:"):])
    raise RuntimeError(
        f"probe child ({master}) failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    keys = tuple(sys.argv[1:]) or DEFAULT_KEYS
    a = run_config("local[5]", "7", keys)
    b = run_config("local[32]", "32", keys)
    bad = [k for k in keys if a[k] != b[k]]
    for k in keys:
        mark = "OK " if a[k] == b[k] else "DIVERGED"
        print(f"{mark} {k}: rows={a[k][0]} hash={a[k][1][:16]}")
    if bad:
        print(f"FAILED: {bad}")
        sys.exit(1)
    print(f"all {len(keys)} keys bit-identical under local[5]/7 vs local[32]/32")


if __name__ == "__main__":
    main()
