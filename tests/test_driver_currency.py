"""Driver-row currency guard (round-8 verdict item 8).

The declared verification bar is a green DRIVER row for the code AS
SHIPPED: a hash-green row recorded before a rewrite certifies the old
implementation, not the current one. Round 8 shipped 11 rewrites whose
rows predated the change; the fix was a one-off forensic list. This
test makes the discipline permanent: any registered query whose
implementing function's source lines changed since the newest
CORRECTNESS_r{N}.json was recorded MUST be scheduled for re-check in
``__spark_entry__._FORCE_RECHECK`` with a round value > N (so the
rotation puts it at the front of the next driver window and graduates
it automatically once the driver re-confirms).

Granularity is the decorated function's source span per git diff
(base = the commit that last touched the newest correctness file,
compared against the WORKING TREE, so uncommitted edits count too).
Docstring-only edits flag conservatively — a cheap re-check beats a
stale certification. Shared-helper edits (operators/*) are out of
scope here; in practice every helper change this repo has shipped also
touched its suite-level consumers' docstrings, which this guard sees.
"""

from __future__ import annotations

import glob
import importlib.util
import inspect
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_currency", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _newest_correctness() -> tuple[int, str] | None:
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    if not files:
        return None
    newest = max(
        files, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
    )
    rnd = int(re.search(r"r(\d+)", os.path.basename(newest)).group(1))
    base = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", os.path.basename(newest)],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    return (rnd, base) if base else None


def _changed_ranges(base: str) -> dict[str, list[tuple[int, int]]]:
    """{repo-relative path: [(new_start, new_end_inclusive), ...]} for
    every suite/package .py changed between base and the working tree."""
    names = subprocess.run(
        ["git", "diff", "--name-only", base, "--", "parquet_importer_spark"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    out: dict[str, list[tuple[int, int]]] = {}
    for path in names:
        if not path.endswith(".py"):
            continue
        diff = subprocess.run(
            ["git", "diff", "-U0", base, "--", path],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        ranges = []
        for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", diff, re.M):
            start = int(m.group(1))
            count = int(m.group(2)) if m.group(2) is not None else 1
            # a pure deletion (count 0) still perturbs the surrounding
            # function — anchor it to the preceding line
            ranges.append((max(start, 1), max(start + count - 1, start)))
        if ranges:
            out[path] = ranges
    return out


def test_changed_queries_are_scheduled_for_recheck():
    meta = _newest_correctness()
    if meta is None:
        return  # round 1: no driver history, everything is tier-new
    rnd, base = meta
    changed = _changed_ranges(base)
    if not changed:
        return

    import sys

    sys.path.insert(0, REPO)
    from parquet_importer_spark.suite import QUERIES

    entry = _entry_module()
    latest = entry._driver_latest(REPO)

    offenders = []
    for key, fn in QUERIES.items():
        fn = inspect.unwrap(fn)
        try:
            src = inspect.getsourcefile(fn)
            lines, start = inspect.getsourcelines(fn)
        except (OSError, TypeError):
            continue
        rel = os.path.relpath(src, REPO)
        spans = changed.get(rel)
        if not spans:
            continue
        end = start + len(lines) - 1
        if not any(a <= end and b >= start for a, b in spans):
            continue
        # this key's implementation changed since round `rnd` recorded
        if key not in latest:
            continue  # never driver-checked: already in the priority tier
        if not entry._green(latest[key][1]):
            continue  # errored latest row: already tier 0
        scheduled = entry._FORCE_RECHECK.get(key, 0) > latest[key][0]
        if not scheduled:
            offenders.append(
                f"{key} (latest green r{latest[key][0]}, source {rel}:{start})"
            )
    assert not offenders, (
        "queries changed since CORRECTNESS_r%d but not scheduled in "
        "__spark_entry__._FORCE_RECHECK: %s" % (rnd, ", ".join(offenders))
    )


def test_force_recheck_keys_are_registered():
    import sys

    sys.path.insert(0, REPO)
    from parquet_importer_spark.suite import QUERIES

    entry = _entry_module()
    unknown = [k for k in entry._FORCE_RECHECK if k not in QUERIES]
    assert not unknown, f"_FORCE_RECHECK names unknown queries: {unknown}"
