"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB
over the same parquet tables, then compares row count, column names,
and an order-insensitive value multiset (floats canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def canon(v) -> str:
    """Type-sensitive canonical form (the driver hashes Arrow values, so a
    DuckDB decimal128 SUM vs a Spark BIGINT is a mismatch even when equal)."""
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if v == int(v) and abs(v) < 1e15:
            return "f:" + str(int(v))
        return "f:" + repr(v)
    if isinstance(v, int):
        return "i:" + str(v)
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from model_presto_spark.io import TABLES, table_path
    from model_presto_spark.plans.queries import QUERIES
    from model_presto_spark.session import get_spark

    spark = get_spark("check-correctness")

    con = duckdb.connect()
    import os

    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok    {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            ores = con.execute(spec.oracle).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if len(srows) != len(ores):
            problems.append(f"rowcount spark={len(srows)} oracle={len(ores)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sm = rows_to_multiset(scols, srows)
            om = rows_to_multiset(ocols, ores)
            if sm != om:
                diffs = [(a, b) for a, b in zip(sm, om) if a != b]
                problems.append(f"values differ ({len(diffs)} rows), first: {diffs[:2]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print(f"\n{len(QUERIES) - len(failures)}/{len(QUERIES) if not only else len(only)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
