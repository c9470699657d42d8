"""Physical-plan audit over every declared query.

For each query: capture .explain('formatted') and report
- parquet scans with missing column pruning (ReadSchema width)
- PushedFilters presence when the query filters scanned columns
- join strategies (broadcast vs sort-merge vs nested-loop)
- WholeStageCodegen span count (JVM codegen coverage)
- Python-eval stages (BatchEvalPython / ArrowEvalPython / MapInPandas)
  — expected ONLY at the declared UDF boundary (encoder, decode)

Usage: PYTHONPATH=. python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from model_presto_spark.plans.queries import QUERIES  # noqa: E402
from model_presto_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> dict:
    scans = re.findall(r"Scan parquet[^\n]*", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "query": name,
        "scans": len(scans),
        "scan_cols": [len(s.split(",")) if s.strip() else 0 for s in read_schemas],
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
        "exchanges": plan.count("Exchange"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"{'query':28s} {'scans':>5s} {'cols':>10s} {'pushed':>6s} "
        f"{'BHJ':>3s} {'SMJ':>3s} {'BNLJ':>4s} {'cg':>3s} {'py':>3s} {'exch':>4s}"
    )
    results: list[dict] = []
    errors: list[str] = []
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            a = audit_one(name, plan_text(df))
            results.append(a)
            print(
                f"{a['query']:28s} {a['scans']:5d} {str(a['scan_cols']):>10s} "
                f"{a['pushed_filters']:6d} {a['bhj']:3d} {a['smj']:3d} "
                f"{a['bnlj']:4d} {a['codegen']:3d} {a['python']:3d} {a['exchanges']:4d}"
            )
        except Exception as e:  # pragma: no cover
            errors.append(name)
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
    # ---- gate summary: the plan-hygiene bar the audit enforces ----------
    # scans > 10 means a CTE/branch is being re-expanded per reference
    # (fix: localCheckpoint the shared base, as q118/q152 do). BNLJ is
    # acceptable ONLY when one side is a scalar/tiny aggregate being
    # broadcast (kNN thresholds, normalization constants) — every hit
    # is listed so new non-scalar ones stand out in round-over-round
    # diffs.
    fat = [a for a in results if a["scans"] > 10]
    bnlj = [a for a in results if a["bnlj"] > 0]
    print(f"\n== gate: {len(results)} audited, {len(errors)} errors ==")
    print(f"scans>10 ({len(fat)}): " + ", ".join(f"{a['query']}={a['scans']}" for a in fat))
    print(f"bnlj>0 ({len(bnlj)}): " + ", ".join(f"{a['query']}={a['bnlj']}" for a in bnlj))
    if errors:
        print("errors: " + ", ".join(errors))


if __name__ == "__main__":
    main()
