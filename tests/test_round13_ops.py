"""Round-13 pins: the cold-denominator discipline promoted from
narrative (general rule 10) to instrument default in
tools/scale_ladder.py (round-12 verdict item 5 + ADVICE), and the
rung-refresh consistency fix (a re-timed numerator must never sit next
to a stale cold ratio)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ladder():
    spec = importlib.util.spec_from_file_location(
        "scale_ladder", os.path.join(REPO, "tools", "scale_ladder.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_needs_cold_rebase_on_warm_biased_pair():
    """The synthetic warm-biased pair from the round-12 census: a cold
    sf100 numerator over a JIT-hot sf10 denominator reads xlin_c 1.45
    — the ladder must demand a cold re-base for it, and must NOT for a
    sub-1.2 row or a row that already carries its cold denominator."""
    m = _ladder()
    warm_biased = {"sf10": 10.0, "sf100": 145.0, "xlin_c": 1.45}
    assert m._needs_cold_rebase(warm_biased)
    linear = {"sf10": 10.0, "sf100": 95.0, "xlin_c": 0.95}
    assert not m._needs_cold_rebase(linear)
    already_rebased = {
        "sf10": 10.0,
        "sf100": 145.0,
        "xlin_c": 1.45,
        "sf10_cold": 14.9,
        "xlin_c_cold": 0.97,
    }
    assert not m._needs_cold_rebase(already_rebased)
    mid_rung = {"sf10": 10.0, "sf30": 45.0, "xlin_m": 1.5}
    assert m._needs_cold_rebase(mid_rung)


def test_auto_cold_rebase_triggers_cold_child(tmp_path, monkeypatch):
    """Feeding the ladder a recorded warm-biased row must spawn the
    --cold-sf10-one child for exactly that key; a linear row must
    spawn nothing (the re-base lands BEFORE the >1.2 reading can be
    adjudicated from the warm denominator alone)."""
    import subprocess

    m = _ladder()
    path = tmp_path / "SCALE_LADDER.json"
    path.write_text(json.dumps({
        "results": {
            "warm_biased_key": {
                "sf10": 10.0, "sf100": 145.0, "xlin_c": 1.45,
            },
            "linear_key": {"sf10": 10.0, "sf100": 95.0, "xlin_c": 0.95},
        },
        "errors": {},
    }))
    calls: list[list[str]] = []
    monkeypatch.setattr(
        subprocess, "run", lambda cmd, **kw: calls.append(cmd)
    )
    monkeypatch.setattr(m, "_sweep_sink_tmp", lambda: None)

    m._auto_cold_rebase("warm_biased_key", str(path))
    assert len(calls) == 1
    assert "--cold-sf10-one" in calls[0]
    assert calls[0][-1] == "warm_biased_key"

    m._auto_cold_rebase("linear_key", str(path))
    assert len(calls) == 1, "linear row must not trigger a cold re-time"


def test_base_retime_merges_instead_of_replacing():
    """Round-13 find: a base ladder re-time (sf01/sf1/sf10) used to
    REPLACE the key's row wholesale, silently destroying measured
    third-decade fields (sf100/sf30/metrics/exclusion notes). The merge
    must preserve them, recompute their warm ratios against the new
    sf10 denominator, and DELETE the cold-campaign fields (they were
    measured against the code state of their campaign)."""
    m = _ladder()
    old = {
        "sf01": 10.9, "sf1": 19.4, "sf10": 201.3,
        "xlin_a": 0.18, "xlin_b": 1.04,
        "sf100": 900.0, "xlin_c": 0.45, "sf100_metrics": {"x": 1},
        "sf30": 256.9, "xlin_m": 0.43, "rung_mid_mem": "48g",
        "sf100_note": "disk-bound",
        "sf10_cold": 150.0, "xlin_c_cold": 0.6, "xlin_m_cold": 0.57,
    }
    new = {"sf01": 15.0, "sf1": 17.1, "sf10": 127.6,
           "xlin_a": 0.11, "xlin_b": 0.75}
    merged = m._merge_base_row(old, new)
    assert merged["sf10"] == 127.6 and merged["xlin_b"] == 0.75
    assert merged["sf100"] == 900.0 and merged["sf30"] == 256.9
    assert merged["sf100_metrics"] == {"x": 1}
    assert merged["sf100_note"] == "disk-bound"
    assert merged["xlin_c"] == 0.71    # 900 / (10 * 127.6)
    assert merged["xlin_m"] == 0.67    # 256.9 / (3 * 127.6)
    for gone in ("sf10_cold", "xlin_c_cold", "xlin_m_cold"):
        assert gone not in merged
    # a key with no prior row passes through untouched
    assert m._merge_base_row({}, dict(new)) == new


def test_refresh_cold_ratios_tracks_retimed_numerators():
    """Round-12 ADVICE: _rung3_one re-times sf100 and recomputes
    xlin_c but left xlin_c_cold stale — since cold ratios take
    adjudication precedence, a stale green cold ratio could mask a
    real sf100 regression. The refresh helper must recompute both cold
    ratios from sf10_cold, and be a no-op without a cold denominator."""
    m = _ladder()
    row = {
        "sf10": 10.0,
        "sf10_cold": 14.0,
        "sf100": 290.0,       # regressed numerator (was ~140)
        "xlin_c": 2.9,
        "xlin_c_cold": 1.0,   # stale — computed against the OLD sf100
        "sf30": 63.0,
        "xlin_m_cold": 0.5,   # stale too
    }
    m._refresh_cold_ratios(row)
    assert row["xlin_c_cold"] == 2.07   # 290 / (10 * 14)
    assert row["xlin_m_cold"] == 1.5    # 63 / (3 * 14)

    no_cold = {"sf10": 10.0, "sf100": 140.0, "xlin_c": 1.4}
    m._refresh_cold_ratios(no_cold)
    assert "xlin_c_cold" not in no_cold
