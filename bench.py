"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice after a session warmup; the best time is
reported (steady-state throughput, not JVM startup).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from model_presto_spark.plans.queries import QUERIES  # noqa: E402
from model_presto_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, spec, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = spec.fn(spark, sf_dir)
    # Force full execution without driver materialization cost dominating.
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: touch each table once so OS page cache is hot for all runs.
    from model_presto_spark.io import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    times: dict[str, float] = {}
    for name, spec in QUERIES.items():
        best = None
        try:
            for _ in range(2):
                t = run_once(spark, spec, SF_DIR)
                best = t if best is None else min(best, t)
        except Exception:
            best = float("nan")
        times[name] = round(best, 4)

    total = round(sum(t for t in times.values() if t == t), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
