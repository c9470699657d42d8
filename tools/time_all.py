"""One-shot wall-time sweep of EVERY registered query (not just the
bench HEADLINE set) at a given sf_dir.

Usage: PYTHONPATH=/root/repo python tools/time_all.py [sf_dir] [out.json]

Each query runs ONCE (noop sink, cache cleared after each), so numbers
include codegen compile and are only good for RANKING — finding the
tail-slow queries worth a real best-of-3 look — not for round-over-round
comparison (that is bench.py's job).
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all.json"
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")

    from model_presto_spark.io import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    times: dict[str, float] = {}
    for i, (name, spec) in enumerate(QUERIES.items()):
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = float("nan")
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(QUERIES)}", file=sys.stderr)

    with open(out, "w") as f:
        json.dump(times, f, indent=0, sort_keys=True)
    ranked = sorted(times.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0))
    for name, t in ranked[:40]:
        print(f"{t:8.3f}  {name}")
    total = sum(t for t in times.values() if t == t)
    print(f"total {total:.1f}s over {len(times)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
