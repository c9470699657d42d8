"""Vector column functions (embedding similarity).

All JVM-side Catalyst expressions. Folds are sequential
left-to-right, matching DuckDB's ``list_reduce`` order, so dot
products and norms are bit-identical across engines (both promote
float elements to double before accumulating).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return 1.0 - cosine_similarity(a, b)


def cosine_similarity_sql(a: str, b: str) -> str:
    """SQL-string twin of ``cosine_similarity`` (guide §7.3 — one
    ``F.expr`` parse instead of ~100 py4j round-trips per call site).
    Spells the IDENTICAL expression tree: per-element double casts via
    ``transform`` (matching ``as_double``), sequential left-to-right
    folds, ``0.0D`` double literals — so values stay bit-identical to
    the Column version and the DuckDB oracle."""
    ad = f"transform({a}, x -> CAST(x AS DOUBLE))"
    bd = f"transform({b}, x -> CAST(x AS DOUBLE))"
    dot_sql = (
        f"aggregate(zip_with({ad}, {bd}, (x, y) -> x * y), "
        f"0.0D, (acc, x) -> acc + x)"
    )
    na = f"SQRT(aggregate({ad}, 0.0D, (acc, x) -> acc + x * x))"
    nb = f"SQRT(aggregate({bd}, 0.0D, (acc, x) -> acc + x * x))"
    return f"{dot_sql} / ({na} * {nb})"


def sq_euclidean(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_euclidean_int(a: Column, b: Column) -> Column:
    """Squared euclidean over integer-quantized vectors (integer math
    in the fold; one cast at the end). Elements widen to int before
    the difference — tinyint-tinyint can reach ±254 and would throw
    under ANSI arithmetic."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("int") - y.cast("int"))
            * (x.cast("int") - y.cast("int")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).cast("double")
