"""Regression tripwire for every plan showcased in PLANS.md.

tools/explain_plans.py pins scale-relevant invariants of each showcased
query's formatted plan into tests/plan_invariants.json (which join
strategies appear, whether any parquet scan has non-empty
PushedFilters, how many exchanges the initial plan schedules, and that
no CartesianProduct exists). This test rebuilds every plan at the same
SF and diffs against the pins, so a lost pushdown, a broadcast
degrading into a shuffle, or a new exchange fails pytest the moment it
happens instead of surfacing in the next PLANS.md review (round-6
verdict item 7). After an INTENTIONAL plan change, regenerate with
`python tools/explain_plans.py` and commit the refreshed pin file
alongside PLANS.md.
"""

from __future__ import annotations

import json
import os

import pytest

import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from explain_plans import SF_DIR, SHOWCASE, plan_fingerprint  # noqa: E402

_PINS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_invariants.json")
with open(_PINS_PATH) as _fh:
    PINS = json.load(_fh)


def test_pin_file_covers_showcase():
    """Every PLANS.md showcase entry must carry a pin (and vice versa),
    so regenerating one without the other is caught."""
    assert sorted(PINS) == sorted(q for q, _ in SHOWCASE)


@pytest.mark.parametrize("qid", sorted(PINS))
def test_plan_invariants_hold(spark, qid):
    from parquet_importer_spark.suite import QUERIES

    plan = (
        QUERIES[qid](spark, SF_DIR)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    got, want = plan_fingerprint(plan), PINS[qid]
    assert "CartesianProduct" not in got["markers"], f"{qid} plans a cartesian product"
    missing = set(want["markers"]) - set(got["markers"])
    added = set(got["markers"]) - set(want["markers"])
    assert not missing and not added, (
        f"{qid}: plan shape drifted — lost {sorted(missing)}, "
        f"gained {sorted(added)}; if intentional, regenerate "
        "tools/explain_plans.py pins"
    )
    assert got["nonempty_pushed_filters"] == want["nonempty_pushed_filters"], (
        f"{qid}: parquet filter pushdown state changed"
    )
    assert got["exchanges"] <= want["exchanges"], (
        f"{qid}: initial plan schedules {got['exchanges']} exchanges, "
        f"pinned at {want['exchanges']} — a new shuffle appeared"
    )
