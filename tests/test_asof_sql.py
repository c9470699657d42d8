"""Pin the SQL-string-built asof_join to a Column-built reference.

Round-9 rewrote asof_join's condition / distance / dedup-window
expressions as SQL strings parsed JVM-side (guide §7.3: the Column API
cost ~595 py4j round-trips per q13 build). The physical plans are
byte-identical (plans/r09/q13*,q49*), but a plan capture covers only
the two bench queries' shapes; this test pins BIT-equality of the
results against the former Column-by-Column construction across every
direction × tolerance × left_key combination, on data with ties,
out-of-tolerance rows, and unmatched left rows.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from model_presto_spark.operators.asof import asof_join


def _reference_asof(
    left, right, on, left_ts, right_ts,
    tolerance=None, direction="backward", suffix="_right", left_key=None,
):
    """The pre-round-9 Column-built implementation, verbatim."""
    keys = [on] if isinstance(on, str) else list(on)
    if isinstance(left_key, str):
        left_key = [left_key]
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
        raise ValueError(direction)
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


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    # left: per-user probe timestamps, incl. a user with no right rows
    # (left-outer null path) and one whose matches are out of tolerance.
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T12:00:00")),
            (2, 10, _ts("2024-01-01T18:00:00")),
            (3, 20, _ts("2024-01-02T00:00:00")),
            (4, 30, _ts("2024-01-01T00:00:00")),  # no right rows for user 30
            (5, 20, _ts("2024-01-05T00:00:00")),  # far from any user-20 row
        ],
        "probe_id INT, user_id INT, ts TIMESTAMP",
    )
    # right: observations, incl. exact-distance ties (two rows
    # equidistant from a probe) to exercise the payload tie-break, and
    # a colliding column name ('ts') to exercise the rename path.
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T11:00:00"), 1.0, "a"),
            (10, _ts("2024-01-01T11:30:00"), 2.0, "b"),
            (10, _ts("2024-01-01T12:30:00"), 3.0, "c"),
            # tie for probe 2 @18:00 under 'nearest': 17:00 and 19:00
            (10, _ts("2024-01-01T17:00:00"), 4.0, "d"),
            (10, _ts("2024-01-01T19:00:00"), 5.0, "e"),
            (20, _ts("2024-01-01T23:00:00"), 6.0, "f"),
            (20, _ts("2024-01-02T01:00:00"), 7.0, "g"),
        ],
        "user_id INT, ts TIMESTAMP, value DOUBLE, tag STRING",
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, "90 MINUTES"])
@pytest.mark.parametrize("left_key", ["probe_id", None])
def test_asof_sql_matches_column_reference(
    frames, direction, tolerance, left_key
):
    left, right = frames
    kwargs = dict(
        on="user_id", left_ts="ts", right_ts="ts",
        tolerance=tolerance, direction=direction, left_key=left_key,
    )
    got = asof_join(left, right, **kwargs)
    want = _reference_asof(left, right, **kwargs)
    assert got.columns == want.columns
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_asof_multi_key_and_unmatched(frames, spark):
    left, right = frames
    # multi-column equality key: (user_id, shard)
    l2 = left.withColumn("shard", F.col("probe_id") % 2)
    r2 = right.withColumn("shard", F.lit(1))
    kwargs = dict(
        on=["user_id", "shard"], left_ts="ts", right_ts="ts",
        tolerance="1 DAY", direction="backward", left_key="probe_id",
    )
    got = asof_join(l2, r2, **kwargs)
    want = _reference_asof(l2, r2, **kwargs)
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # every left row survives (left-outer)
    assert got.count() == l2.count()
