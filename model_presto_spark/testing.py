"""Shared oracle-comparison helpers (used by tests/ and tools/)."""

from __future__ import annotations

import math
import os

import duckdb

from model_presto_spark.io import TABLES, table_path


def canon(v) -> str:
    """Canonical string for one cell (order-insensitive hashing)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rows_to_multiset(cols: list[str], rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_query(spark, con, spec, sf_dir: str) -> list[str]:
    """Run one QuerySpec on both engines; return list of problems."""
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return []  # rows-only check: ran without error
    ores = con.execute(spec.oracle).fetchall()
    ocols = [d[0] for d in con.description]
    problems = []
    if len(srows) != len(ores):
        problems.append(f"rowcount spark={len(srows)} oracle={len(ores)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        sm = rows_to_multiset(scols, srows)
        om = rows_to_multiset(ocols, ores)
        if sm != om:
            diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            problems.append(f"values differ, first diffs: {diffs}")
    return problems
