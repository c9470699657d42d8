"""At-scale A/B evidence for the spread() family (round-9 deliverable).

Round 7/8 added ``spread()`` (round-robin repartition to cluster
parallelism, io.py) in front of the CPU folds of knn_join,
ann_lsh_join and the dedup/tokenize passes, with the reasoning: a
few-file scan serializes per-row HOF work onto a few cores, and one
skinny shuffle buys full-width parallelism. The knob
``spark.model_presto.spread.mode=never`` no-ops it for deployments
whose scans are already wide. This tool produces the measured
evidence for both halves of that claim:

- NARROW layout (1 parquet file — this repo's testdata shape, and the
  shape of any small-dimension scan at cluster scale): spread=always
  vs never on knn_join (64-d sqeuclidean + cosine, q45/q35-style),
  knn_join 2-d (q23-style, the known local pessimization), and
  ann_lsh_join (8x64 hyperplane fold, q40-style).
- WIDE layout (32 parquet files — a stand-in for the tens of
  thousands of splits a 100 TB table scan has): same A/B; spread is
  expected neutral-to-negative, which is why the knob exists.

Candidate-set sizes scale the fold work (n_cand x n_probe x dim
mults) past the shuffle cost so the sf0.1 "too small to amortize"
objection is answered at the top size.

Usage: python tools/spread_stress.py [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCRATCH = "/tmp/spread_stress_r9"
DIM = 64
SIZES = {"s20k": 20_000, "s100k": 100_000}
N_PROBES = 20


def gen_embeddings(spark, n: int, path_narrow: str, path_wide: str) -> None:
    import pandas as pd

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(map(list, vecs))}
    )
    df = spark.createDataFrame(pdf)
    df.coalesce(1).write.mode("overwrite").parquet(path_narrow)
    df.repartition(32).write.mode("overwrite").parquet(path_wide)


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "STRESS_r15.json"
    from pyspark.sql import functions as F

    from model_presto_spark.operators.knn import ann_lsh_join, knn_join
    from model_presto_spark.session import get_spark

    spark = get_spark("spread-stress")
    spark.sparkContext.setLogLevel("ERROR")

    layouts: dict[str, dict[str, str]] = {}
    for tag, n in SIZES.items():
        narrow = f"{SCRATCH}/{tag}/narrow"
        wide = f"{SCRATCH}/{tag}/wide"
        if not (os.path.exists(narrow) and os.path.exists(wide)):
            gen_embeddings(spark, n, narrow, wide)
        layouts[tag] = {"narrow": narrow, "wide": wide}

    def run_op(op: str, path: str) -> None:
        emb = spark.read.parquet(path)
        probes = emb.where(f"vec_id < {N_PROBES}").toDF("probe_id", "vec")
        cands = emb.toDF("cid", "vec")
        if op == "knn64_sqeuclidean":
            out = knn_join(probes, cands, "probe_id", "cid", "vec", "vec",
                           k=5, metric="sqeuclidean", exclude_self=True)
        elif op == "knn64_cosine":
            out = knn_join(probes, cands, "probe_id", "cid", "vec", "vec",
                           k=5, metric="cosine", exclude_self=True)
        elif op == "knn2":
            p2 = probes.selectExpr("probe_id", "slice(vec, 1, 2) AS vec")
            c2 = cands.selectExpr("cid", "slice(vec, 1, 2) AS vec")
            out = knn_join(p2, c2, "probe_id", "cid", "vec", "vec",
                           k=5, metric="sqeuclidean", exclude_self=True)
        elif op == "ann_lsh":
            out = ann_lsh_join(emb.toDF("probe_id", "vec"), cands,
                               "probe_id", "cid", "vec", "vec",
                               k=5, dim=DIM, planes=8)
        else:
            raise ValueError(op)
        out.write.format("noop").mode("overwrite").save()

    ops = ["knn64_sqeuclidean", "knn64_cosine", "knn2", "ann_lsh"]
    results: dict = {"sizes": SIZES, "dim": DIM, "n_probes": N_PROBES,
                     "timings": {}}
    for tag in SIZES:
        for layout, path in layouts[tag].items():
            for mode in ("always", "never"):
                spark.conf.set("spark.model_presto.spread.mode", mode)
                for op in ops:
                    # ann over 100k x 100k same-bucket pairs is a
                    # genuine O(n^2/2^planes) rerank — cap ann at 20k
                    if op == "ann_lsh" and tag != "s20k":
                        continue
                    key = f"{tag}.{layout}.{op}.{mode}"
                    spark.sparkContext.setJobDescription(key)
                    results["timings"][key] = timed(lambda: run_op(op, path))
                    print(key, results["timings"][key], flush=True)
    spark.conf.set("spark.model_presto.spread.mode", "always")

    t = results["timings"]
    results["ratios_always_over_never"] = {
        k[: -len(".always")]: round(t[k] / t[k[: -len(".always")] + ".never"], 3)
        for k in t
        if k.endswith(".always")
    }
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_json)


if __name__ == "__main__":
    main()
