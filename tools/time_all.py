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

In-sweep steady readings are NOT authoritative: a single JVM that has
just executed 723 heavy queries carries accumulated codegen-cache /
checkpoint heap pressure (the same pathology that OOMed stress_bench
and was fixed there with a fresh JVM per size suite), and round-8
measured it inflating steady times up to 3.5x (q32 8.13 in-sweep vs
2.28 fresh-JVM the same evening). ``--fresh-recheck`` therefore
re-runs every query whose in-sweep steady exceeded 3 s in a FRESH
subprocess JVM, 4 runs each, recording best-of-last-3 as
``quiet_best3`` — the number the per-round tail gate is on.

Output JSON: {query: {"cold": s, "steady": s|null,
"quiet_best3": s (recheck queries only), "quiet_runs": [...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from model_presto_spark.plans.queries import QUERIES  # noqa: E402
from model_presto_spark.session import get_spark  # noqa: E402


def _fresh_recheck(sf_dir: str, names: list[str]) -> dict[str, dict]:
    """Best-of-last-3 quiet re-measure of ``names`` in ONE fresh
    subprocess JVM (free of the sweep JVM's accumulated codegen /
    checkpoint heap pressure). Returns {name: {"quiet_best3", "quiet_runs"}}."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        tmp_out = f.name
    child = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--recheck-child",
            sf_dir,
            tmp_out,
            *names,
        ],
        env={**os.environ, "PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))},
        stdout=sys.stderr,
        stderr=subprocess.DEVNULL,
        check=False,
    )
    if child.returncode != 0:
        print(f"fresh-recheck child exited {child.returncode}", file=sys.stderr)
        return {}
    with open(tmp_out) as f:
        return json.load(f)


def _recheck_child(sf_dir: str, out: str, names: list[str]) -> int:
    spark = get_spark("time-all-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    from model_presto_spark.io import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    res: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        res[name] = {"quiet_best3": min(runs[1:]), "quiet_runs": runs}
        print(f"recheck {name}: {runs}", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(res, f)
    return 0


def main() -> int:
    argv = list(sys.argv[1:])
    steady_above = 1.5
    if "--steady-above" in argv:
        i = argv.index("--steady-above")
        steady_above = float(argv[i + 1])
        del argv[i : i + 2]
    fresh_recheck = "--fresh-recheck" in argv
    if fresh_recheck:
        argv.remove("--fresh-recheck")
    recheck_above = 3.0
    if "--recheck-above" in argv:
        i = argv.index("--recheck-above")
        recheck_above = float(argv[i + 1])
        del argv[i : i + 2]
    if "--recheck-child" in argv:
        argv.remove("--recheck-child")
        return _recheck_child(argv[0], argv[1], argv[2:])
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

    if fresh_recheck:
        hot = [
            name
            for name, t in times.items()
            if t["steady"] is not None and t["steady"] > recheck_above
        ]
        if hot:
            print(f"fresh-JVM recheck of {len(hot)} queries", file=sys.stderr)
            for name, r in _fresh_recheck(sf_dir, sorted(hot)).items():
                times[name].update(r)

    with open(out, "w") as f:
        json.dump(times, f, indent=0, sort_keys=True)

    def key(kv):
        t = kv[1]
        v = t.get("quiet_best3") or t["steady"] or t["cold"]
        return -(v if v == v else 0)

    ranked = sorted(times.items(), key=key)
    print(f"{'cold':>8}  {'steady':>8}  {'quiet3':>8}  query")
    for name, t in ranked[:40]:
        st = f"{t['steady']:8.3f}" if t["steady"] is not None else "       -"
        qb = (
            f"{t['quiet_best3']:8.3f}" if t.get("quiet_best3") is not None
            else "       -"
        )
        print(f"{t['cold']:8.3f}  {st}  {qb}  {name}")
    total = sum(t["cold"] for t in times.values() if t["cold"] == t["cold"])
    print(f"total cold {total:.1f}s over {len(times)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
