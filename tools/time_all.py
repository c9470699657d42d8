"""One-shot wall-time sweep of EVERY registered query (not just the
bench HEADLINE set) at a given sf_dir.

Usage: PYTHONPATH=/root/repo python tools/time_all.py [sf_dir] [out.json]
           [--steady-above SECONDS] [query ...]

Each query runs ONCE (noop sink, cache cleared after each), so cold
numbers include codegen compile and are only good for RANKING —
finding the tail-slow queries worth a real best-of-3 look — not for
round-over-round comparison (that is bench.py's job).

``--steady-above S`` (default 1.5) re-runs every query whose cold
time exceeded S once more and records the second run as ``steady`` —
the number that separates a real tail-slow plan from first-run
whole-stage-codegen compile (~2-8 s on big HOF expressions, ms
steady). The per-round gate is on STEADY time: no steady query > 3 s
without an in-artifact justification.

Output JSON: {query: {"cold": s, "steady": s|null}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from model_presto_spark.plans.queries import QUERIES  # noqa: E402
from model_presto_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    steady_above = 1.5
    if "--steady-above" in argv:
        i = argv.index("--steady-above")
        steady_above = float(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    out = argv[1] if len(argv) > 1 else "/tmp/time_all.json"
    only = set(argv[2:])
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")

    from model_presto_spark.io import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    def run_once(spec) -> float:
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    times: dict[str, dict] = {}
    todo = [
        (name, spec)
        for name, spec in QUERIES.items()
        if not only or name in only
    ]
    for i, (name, spec) in enumerate(todo):
        try:
            cold = run_once(spec)
            times[name] = {"cold": cold, "steady": None}
        except Exception as e:  # noqa: BLE001
            times[name] = {"cold": float("nan"), "steady": None}
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(todo)}", file=sys.stderr)

    # steady-state pass: second run for everything cold-slow (codegen
    # caches are warm inside the same session, so this isolates real
    # plan cost from first-run compile)
    for name, spec in todo:
        if times[name]["cold"] == times[name]["cold"] and times[name][
            "cold"
        ] > steady_above:
            try:
                times[name]["steady"] = run_once(spec)
            except Exception as e:  # noqa: BLE001
                print(f"ERROR steady {name}: {e}", file=sys.stderr)
            spark.catalog.clearCache()

    with open(out, "w") as f:
        json.dump(times, f, indent=0, sort_keys=True)

    def key(kv):
        st = kv[1]["steady"]
        c = kv[1]["cold"]
        v = st if st is not None else c
        return -(v if v == v else 0)

    ranked = sorted(times.items(), key=key)
    print(f"{'cold':>8}  {'steady':>8}  query")
    for name, t in ranked[:40]:
        st = f"{t['steady']:8.3f}" if t["steady"] is not None else "       -"
        print(f"{t['cold']:8.3f}  {st}  {name}")
    total = sum(t["cold"] for t in times.values() if t["cold"] == t["cold"])
    print(f"total cold {total:.1f}s over {len(times)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
