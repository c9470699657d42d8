"""As-of (nearest-time) join with tolerance.

Reference semantics: per (pixel, month), pick the observation whose
timestamp is nearest the month midpoint within a tolerance
(reference: presto-tolbi/presto/dataops/pipelines/dynamicworld.py:108-137 —
``dateDist = abs(ts - mid)``, sort asc, keep first within
``max(nearest_dist, 15 days)``). Spark 4 has no native ASOF join, so
this implements it as a *range join + rank* composition that Catalyst
plans as a normal equi-join with a range residual (broadcast or
sort-merge) followed by one window — fully distributed, no
driver-side materialization.

At 100 TB the tolerance predicate is what keeps this tractable: it
bounds the join fan-out to a time band instead of a full per-key
history, and AQE splits skewed keys. Small right sides broadcast
automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    left_key: list[str] | str | None = None,
) -> DataFrame:
    """For each left row, attach the right row nearest in time.

    Parameters
    ----------
    on: equality key column name(s) shared by both sides.
    left_ts / right_ts: timestamp column names.
    tolerance: SQL interval body (e.g. ``"1 hour"``, ``"30 days"``);
        None = unbounded.
    direction: ``backward`` (right_ts <= left_ts, nearest from below —
        the pandas ``merge_asof`` default), ``forward``
        (right_ts >= left_ts), or ``nearest`` (min abs distance).
    left_key: column(s) that uniquely identify a left row. When given,
        the dedup window partitions by exactly these — a narrow shuffle
        and sort key. When None, every left column forms the partition
        key (safe for any input, but a wide sort key; declare the
        unique key on hot paths).

    Left rows with no match are kept with nulls (left-outer
    semantics). Deterministic tie-break at equal distance: the
    lexicographically-largest right payload row. Left rows must be
    unique (per ``left_key`` when declared, else as whole rows —
    they form the window partition key).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if isinstance(left_key, str):
        left_key = [left_key]

    # Disambiguate right columns that collide with left ones; drop the
    # right copy of the equality keys after the join.
    l_cols = set(left.columns)
    renames = {c: (c + suffix if c in l_cols else c) for c in right.columns}
    r = right.select([F.col(c).alias(renames[c]) for c in right.columns])
    r_ts = renames[right_ts]
    r_payload = [renames[c] for c in right.columns if c not in keys]

    lt, rt = F.col(left_ts), F.col(r_ts)
    if direction == "backward":
        cond: Column = rt <= lt
        if tolerance is not None:
            cond = cond & (rt >= lt - F.expr(f"INTERVAL {tolerance}"))
        # Timestamp subtraction yields an orderable DayTimeInterval —
        # valid for TIMESTAMP, TIMESTAMP_NTZ and DATE alike (a cast to
        # double is illegal for TIMESTAMP_NTZ in Spark 4).
        dist = lt - rt
    elif direction == "forward":
        cond = rt >= lt
        if tolerance is not None:
            cond = cond & (rt <= lt + F.expr(f"INTERVAL {tolerance}"))
        dist = rt - lt
    elif direction == "nearest":
        cond = F.lit(True)
        if tolerance is not None:
            cond = (rt >= lt - F.expr(f"INTERVAL {tolerance}")) & (
                rt <= lt + F.expr(f"INTERVAL {tolerance}")
            )
        dist = F.abs(lt - rt)
    else:
        raise ValueError(f"unknown direction: {direction}")

    for k in keys:
        cond = (left[k] == r[renames[k]]) & cond

    joined = left.join(r, cond, "left").drop(*[renames[k] for k in keys])
    part_cols = left_key if left_key else left.columns
    w = Window.partitionBy(*[left[c] for c in part_cols]).orderBy(
        dist.asc_nulls_last(), *[F.col(c).desc() for c in r_payload]
    )
    return (
        joined.withColumn("__asof_rn", F.row_number().over(w))
        .filter(F.col("__asof_rn") == 1)
        .drop("__asof_rn")
    )
