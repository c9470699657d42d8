"""Relational-side scale stress: synthesize orders/lineitem at 1x
and 10x the sf0.1 row counts and fit scaling exponents for the
heaviest relational operators (bipartite projection, VWAP windows,
moments, weighted median, TPC-H Q1 shape, HITS).

Complements tools/stress_bench.py (document/embedding side). The
synthesis multiplies the real sf0.1 tables by a literal replica
spine with key re-mapping, so distributions (including the skew
profile) are preserved while sizes scale exactly.

Usage: PYTHONPATH=. python tools/relational_stress.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from model_presto_spark.io import load_table  # noqa: E402
from model_presto_spark.session import get_spark  # noqa: E402

SCRATCH = "/tmp/rel_stress"
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(spark, mult: int, tag: str) -> str:
    """Write orders/lineitem at `mult` replicas with disjoint keys."""
    out = os.path.join(SCRATCH, tag)
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    reps = F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("rep")
    o = load_table(spark, SRC, "orders")
    li = load_table(spark, SRC, "lineitem")
    okey_span = o.agg(F.max("o_orderkey")).first()[0] + 1
    ckey_span = o.agg(F.max("o_custkey")).first()[0] + 1
    (
        o.select("*", reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * okey_span).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("rep") * ckey_span).alias("o_custkey"),
            "o_orderstatus",
            "o_totalprice",
            # shift each replica by `rep` days so time-series ops see
            # a longer, denser calendar rather than exact duplicates
            (F.col("o_orderdate") + F.make_interval(days=F.col("rep"))).alias(
                "o_orderdate"
            ),
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    (
        li.select("*", reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * okey_span).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            (F.col("l_shipdate") + F.make_interval(days=F.col("rep"))).alias(
                "l_shipdate"
            ),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def run_suite(spark, sf_dir: str) -> dict:
    t = {}
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    t0 = time.time()
    n_q1 = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
        .count()
    )
    t["tpch_q1"] = time.time() - t0
    spark.catalog.clearCache()

    from model_presto_spark.operators.stats import weighted_median

    t0 = time.time()
    n_wm = weighted_median(li, "l_returnflag", "l_extendedprice", "l_quantity").count()
    t["weighted_median"] = time.time() - t0
    spark.catalog.clearCache()

    t0 = time.time()
    x = F.col("l_quantity")
    n_mom = (
        li.groupBy("l_returnflag")
        .agg(F.sum(x), F.sum(x * x), F.sum(x * x * x), F.sum(x * x * x * x))
        .count()
    )
    t["moments"] = time.time() - t0
    spark.catalog.clearCache()

    t0 = time.time()
    wk = li.groupBy(
        "l_returnflag", F.date_trunc("week", "l_shipdate").alias("w")
    ).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pv"),
        F.sum("l_quantity").alias("vol"),
    )
    n_vwap = wk.count()
    t["vwap_weekly"] = time.time() - t0
    spark.catalog.clearCache()

    # bipartite projection: the heaviest new relational op (pairs
    # inside each customer's supplier set)
    t0 = time.time()
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = e.select("c", F.col("s").alias("s1"))
    b = e.select("c", F.col("s").alias("s2"))
    n_pairs = (
        a.join(b, "c")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)))
        .count()
    )
    t["bipartite_projection"] = time.time() - t0
    spark.catalog.clearCache()

    from model_presto_spark.operators.graph import hits

    t0 = time.time()
    n_hits = hits(
        e.select(F.col("c").alias("src"), F.col("s").alias("dst")),
        iterations=2,
    ).count()
    t["hits"] = time.time() - t0
    spark.catalog.clearCache()

    t["_counts"] = {
        "q1_groups": n_q1,
        "wm_groups": n_wm,
        "moment_groups": n_mom,
        "vwap_weeks": n_vwap,
        "copurchase_pairs": n_pairs,
        "hits_nodes": n_hits,
    }
    return t


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "RELSTRESS.json"
    spark = get_spark("relational-stress")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    sizes = {}
    for mult, tag in ((1, "m1"), (10, "m10")):
        d = materialize(spark, mult, tag)
        sizes[tag] = load_table(spark, d, "lineitem").count()
        results[tag] = run_suite(spark, d)
        print(tag, json.dumps({k: round(v, 3) for k, v in results[tag].items() if isinstance(v, float)}))

    ratio = sizes["m10"] / sizes["m1"]
    exponents = {}
    for op in ("tpch_q1", "weighted_median", "moments", "vwap_weekly",
               "bipartite_projection", "hits"):
        r = results["m10"][op] / max(results["m1"][op], 1e-9)
        exponents[op] = round(math.log(r) / math.log(ratio), 3)
    summary = {
        "rows": sizes,
        "timings": {t: {k: round(v, 3) for k, v in results[t].items() if isinstance(v, float)} for t in results},
        "counts": {t: results[t]["_counts"] for t in results},
        "scaling_exponent": exponents,
        # bipartite pair-gen is super-linear in shared-customer density
        # by definition; everything else must stay near-linear
        "pass": all(e < 1.4 for k, e in exponents.items()
                    if k != "bipartite_projection"),
    }
    print(json.dumps(summary))
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
