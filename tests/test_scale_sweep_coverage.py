"""SCALE_SWEEP.json coverage guard (round-8 verdict item 5).

The full-registry scale sweep is the repo's strongest 100-TB-design
evidence; a silently dropped key would read as "covered" when it
isn't. Enforce: every registered query appears in the sweep results
except the documented live-Postgres sinks (tools/scale_sweep.py SKIP),
and no sweep row names a query that no longer exists (renames must
re-sweep, not inherit stale timings).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "SCALE_SWEEP.json")


def test_sweep_covers_registry_minus_live_sinks():
    if not os.path.exists(SWEEP):
        return  # pre-first-sweep working tree
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from parquet_importer_spark.suite import QUERIES

    import scale_sweep

    with open(SWEEP) as fh:
        rows = json.load(fh)["results"]
    missing = sorted(set(QUERIES) - set(rows) - scale_sweep.SKIP)
    stale = sorted(set(rows) - set(QUERIES))
    assert not missing, f"registry keys never swept: {missing}"
    assert not stale, f"sweep rows for unregistered keys: {stale}"
