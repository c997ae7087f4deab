"""Full-registry scale sweep: time EVERY registered query at sf0.1 and
at the 10x sf1 replica (.scale/sf1, tools/make_scale_fixture.py) and
report xlin = sec_sf1 / (10 * sec_sf0.1) per query.

The headline-only scale ladder in bench.py missed spatial_knn_join's
diagonal-skew blow-up for two rounds because that query is not in
HEADLINE — this sweep closes that blind spot. Run it once per round:

    python tools/scale_sweep.py            # everything
    python tools/scale_sweep.py llm_ graph_   # prefix filter

Writes SCALE_SWEEP.json at the repo root: {query: {sf01, sf1, xlin}},
sorted by xlin descending, plus the failures. Queries are timed with a
single noop-sink run per SF (cheap queries are noise-dominated — the
sweep's signal is the ORDER-OF-MAGNITUDE xlin of the expensive tail,
not per-query precision; bench.py owns the precise numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".scale", "sf1")

#: queries that mutate external state (live DB sinks) or are priced in
#: minutes at sf1 by semantic design (unbounded-density DBSCAN counts
#: every eps-pair; its docstring owns the quadratic) — skipped to keep
#: the sweep under ~15 min; everything else runs.
SKIP = frozenset({"sink_postgis", "sink_postgres_copy"})


def main() -> None:
    from parquet_importer_spark.session import get_spark
    from parquet_importer_spark.suite import QUERIES

    only = tuple(sys.argv[1:])
    spark = get_spark("scale-sweep")
    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    names = [
        n
        for n in QUERIES
        if n not in SKIP and (not only or any(n.startswith(p) for p in only))
    ]
    def timed(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 2)

    for i, name in enumerate(names):
        row: dict = {}
        try:
            row["sf01"] = timed(name, SF01)
            row["sf1"] = timed(name, SF1)
            if row["sf01"] > row["sf1"]:
                # a 10x input running FASTER is ambient noise (Janino
                # codegen on first plan compile, GC) by definition —
                # re-time both and keep the min (round-8 verdict item 5:
                # ts_gap_fill read 15.6 s sf0.1 vs 5.0 s sf1 on one run)
                row["sf01"] = min(row["sf01"], timed(name, SF01))
                row["sf1"] = min(row["sf1"], timed(name, SF1))
            row["xlin"] = round(row["sf1"] / (10.0 * max(row["sf01"], 0.05)), 2)
            results[name] = row
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:160]
        if (i + 1) % 25 == 0:
            done = sorted(results.values(), key=lambda r: -r["xlin"])
            print(
                f"[{i + 1}/{len(names)}] worst xlin so far: "
                f"{done[0]['xlin'] if done else '-'}",
                file=sys.stderr,
            )
    # merge over previous runs so prefix-filtered sweeps accumulate
    # into one whole-registry picture
    path = os.path.join(ROOT, "SCALE_SWEEP.json")
    prior: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                prior = json.load(fh).get("results", {})
        except (OSError, ValueError):
            prior = {}
    prior.update(results)
    ordered = dict(sorted(prior.items(), key=lambda kv: -kv[1]["xlin"]))
    out = {"results": ordered, "errors": errors}
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    over = [(n, r) for n, r in ordered.items() if r["xlin"] > 1.2]
    print(f"{len(results)} queries swept, {len(errors)} errors")
    print(f"xlin > 1.2 ({len(over)}):")
    for n, r in over:
        print(f"  {r['xlin']:5.2f}  {n}  ({r['sf01']}s -> {r['sf1']}s)")


if __name__ == "__main__":
    main()
