"""Property-based tests (SURVEY §5.4) with hypothesis: the
reference's inline-assert invariants generalized — pad length, mask
budget bounds, split completeness, similarity ranges."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

# One shared tiny settings profile: each example spins Spark jobs, so
# keep example counts small but meaningful.
FAST = settings(max_examples=8, deadline=None)


@given(
    arr=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=0, max_size=30),
    length=st.integers(1, 24),
)
@FAST
def test_pad_series_length_invariant(spark, arr, length):
    """pad_array invariant (dynamicworld.py:28): non-empty in ->
    exactly ``length`` out; empty stays empty; prefix preserved."""
    from model_presto_spark.operators.timeseries import pad_series

    df = spark.createDataFrame([Row(a=arr)], "a: array<double>")
    out = df.select(pad_series(F.col("a"), length).alias("v")).collect()[0].v
    if not arr:
        assert out == []
    else:
        assert len(out) == length
        assert out[: min(len(arr), length)] == arr[: min(len(arr), length)]
        if len(arr) < length:
            assert all(x == arr[-1] for x in out[len(arr):])


@given(
    n=st.integers(1, 40),
    ratio=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]),
    seed=st.integers(0, 3),
)
@FAST
def test_mask_budget_bounds(spark, n, ratio, seed):
    """Masking budget invariant (masking.py:83): 0 <= budget <= T,
    deterministic in (key, seed)."""
    from model_presto_spark.ml.masking import mask_budget, timestep_mask

    df = spark.range(n)
    out = df.select(
        mask_budget(timestep_mask(F.col("id"), 12, ratio, seed)).alias("b")
    ).collect()
    assert all(0 <= r.b <= 12 for r in out)
    if ratio == 0.0:
        assert all(r.b == 0 for r in out)


@given(
    fracs=st.sampled_from(
        [{"a": 0.5, "b": 0.5}, {"a": 0.8, "b": 0.1, "c": 0.1}, {"x": 1.0}]
    ),
    n=st.integers(1, 200),
)
@FAST
def test_hash_split_partition_property(spark, fracs, n):
    """Splits are a partition: complete, disjoint, deterministic."""
    from model_presto_spark.operators.splits import hash_split

    df = spark.range(n)
    out = hash_split(df, "id", fracs)
    assert out.count() == n  # complete, one split per row
    names = {r.split for r in out.select("split").distinct().collect()}
    assert names <= set(fracs)


@given(
    a=st.lists(st.text(alphabet="abc", min_size=1, max_size=3),
               min_size=1, max_size=8),
    b=st.lists(st.text(alphabet="abc", min_size=1, max_size=3),
               min_size=1, max_size=8),
)
@FAST
def test_jaccard_range_and_symmetry(spark, a, b):
    from model_presto_spark.functions.text import jaccard

    df = spark.createDataFrame(
        [Row(x=list(set(a)), y=list(set(b)))]
    )
    r = df.select(
        jaccard(F.col("x"), F.col("y")).alias("ab"),
        jaccard(F.col("y"), F.col("x")).alias("ba"),
    ).collect()[0]
    assert 0.0 <= r.ab <= 1.0
    assert r.ab == r.ba
    if set(a) == set(b):
        assert r.ab == 1.0


@given(
    ts=st.lists(st.integers(0, 100_000), min_size=1, max_size=40),
    gap=st.integers(1, 10_000),
)
@FAST
def test_sessionize_matches_linear_reference(spark, ts, gap):
    """Gap sessionization == the obvious single-pass reference over
    the sorted run (one entity; seconds-scale timestamps)."""
    import datetime as dt

    from model_presto_spark.operators.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=t), i) for i, t in enumerate(sorted(ts))
    ]
    df = spark.createDataFrame(rows, "uid int, ts timestamp, eid int")
    got = {
        r["eid"]: r["session_idx"]
        for r in sessionize(df, "uid", "ts", gap, order_tiebreak="eid").collect()
    }
    # linear reference
    want, sid, prev = {}, 0, None
    for i, t in enumerate(sorted(ts)):
        if prev is None or t - prev > gap:
            sid += 1
        want[i] = sid
        prev = t
    assert got == want


@given(
    pts=st.lists(st.integers(0, 50_000), min_size=0, max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(0, 20_000)),
        min_size=0,
        max_size=10,
    ),
    band=st.integers(60, 7_200),
)
@FAST
def test_interval_join_matches_naive_property(spark, pts, ivs, band):
    """Banded interval join == naive range predicate for arbitrary
    points, intervals (start + nonneg length), and band widths."""
    import datetime as dt

    from model_presto_spark.operators.temporal import interval_join

    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    pdf = spark.createDataFrame(
        [(i, t(s)) for i, s in enumerate(pts)] or [(0, t(0))][:0],
        "pid int, pt timestamp",
    ) if pts else None
    if not pts or not ivs:
        return  # nothing to compare
    idf = spark.createDataFrame(
        [(j, t(lo), t(lo + ln)) for j, (lo, ln) in enumerate(ivs)],
        "iid int, lo timestamp, hi timestamp",
    )
    banded = interval_join(pdf, idf, "pt", "lo", "hi", band)
    got = sorted((r["iid"], r["pid"]) for r in banded.collect())
    want = sorted(
        (j, i)
        for i, s in enumerate(pts)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= s <= lo + ln
    )
    assert got == want
