"""Unit tests: sessionization, banded interval join, hash-rank
sampling (round-3 temporal/sampling operators)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour) + dt.timedelta(minutes=minute)


def test_sessionize_gap_semantics(spark):
    from model_presto_spark.operators.temporal import sessionize

    rows = [
        # user 1: three events inside one hour, then a 5h gap
        (1, _ts(1, 9, 0), 100),
        (1, _ts(1, 9, 30), 101),
        (1, _ts(1, 10, 0), 102),
        (1, _ts(1, 15, 1), 103),
        # user 2: single event
        (2, _ts(1, 12, 0), 200),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_seconds=3600, order_tiebreak="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {100: 1, 101: 1, 102: 1, 103: 2, 200: 1}


def test_sessionize_boundary_is_exclusive(spark):
    """A gap of exactly gap_seconds does NOT split the session
    (split requires strictly greater)."""
    from model_presto_spark.operators.temporal import sessionize

    rows = [(1, _ts(1, 9, 0), 1), (1, _ts(1, 10, 0), 2), (1, _ts(1, 11, 1), 3)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    out = sessionize(df, "user_id", "ts", gap_seconds=3600, order_tiebreak="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_interval_join_matches_naive_range_join(spark):
    """The banded equi-join must produce exactly the pairs the naive
    range predicate defines — including intervals spanning multiple
    bands and points on inclusive bounds."""
    from model_presto_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(i, _ts(1, 0, i * 7)) for i in range(60)], "pid int, pt timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (0, _ts(1, 0, 0), _ts(1, 0, 21)),     # inclusive both ends
            (1, _ts(1, 0, 30), _ts(1, 2, 30)),    # spans many 15-min bands
            (2, _ts(1, 3, 0), _ts(1, 3, 1)),      # sub-band interval
            (3, _ts(2, 0, 0), _ts(2, 1, 0)),      # empty
        ],
        "iid int, lo timestamp, hi timestamp",
    )
    banded = interval_join(points, intervals, "pt", "lo", "hi", band_seconds=900)
    naive = intervals.join(
        points, F.col("pt").between(F.col("lo"), F.col("hi"))
    )
    key = lambda r: (r["iid"], r["pid"])
    assert sorted(map(key, banded.collect())) == sorted(map(key, naive.collect()))
    # and no duplicates from band replication
    assert banded.count() == banded.select("iid", "pid").distinct().count()


def test_hash_rank_sample_deterministic_and_stable(spark):
    from model_presto_spark.operators.splits import hash_rank_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(200)], "id long, cls string"
    )
    s1 = {r["id"] for r in hash_rank_sample(df, "id", 10, ["cls"]).collect()}
    s2 = {r["id"] for r in hash_rank_sample(df, "id", 10, ["cls"]).collect()}
    assert s1 == s2 and len(s1) == 20
    # stability under growth: shrinking the corpus never *adds* churn
    # beyond removals — survivors of the big corpus that remain in the
    # small corpus stay sampled unless displaced by nothing (subset
    # corpus has fewer competitors, so every surviving sampled id of
    # the superset that is still present must again be sampled).
    sub = df.filter(F.col("id") < 100)
    ssub = {r["id"] for r in hash_rank_sample(sub, "id", 10, ["cls"]).collect()}
    assert (s1 & {i for i in range(100)}) <= ssub
    # global (unstratified) path
    g = hash_rank_sample(df, "id", 7).collect()
    assert len(g) == 7


def test_interval_join_plan_has_no_nested_loop(spark):
    """The banded rewrite must plan as an equi-join (hash/sort-merge),
    never the BroadcastNestedLoopJoin a raw range predicate gets."""
    from model_presto_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(i, _ts(1, 0, i)) for i in range(10)], "pid int, pt timestamp"
    )
    intervals = spark.createDataFrame(
        [(0, _ts(1, 0, 0), _ts(1, 0, 30))], "iid int, lo timestamp, hi timestamp"
    )
    plan = (
        interval_join(points, intervals, "pt", "lo", "hi", 900)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_mix_plan_and_apply(spark):
    """Budget math: capped rates, share normalization, deterministic
    application (same kept set on repeat runs)."""
    from model_presto_spark.operators.mixing import apply_mix, mix_plan

    rows = [(f"s{i%2}", i, 100) for i in range(40)]  # 2 sources, 2000 tok each
    df = spark.createDataFrame(rows, "source string, id long, n_tok int")
    w = F.when(F.col("source") == "s0", F.lit(3.0)).otherwise(F.lit(1.0))
    plan = mix_plan(df, "source", w, F.col("n_tok"), budget_tokens=2000)
    rates = {r["source"]: r["keep_rate"] for r in plan.collect()}
    # s0 target: 2000*0.75=1500 of 2000 -> 0.75; s1: 500 of 2000 -> 0.25
    assert abs(rates["s0"] - 0.75) < 1e-12 and abs(rates["s1"] - 0.25) < 1e-12
    k1 = sorted(r["id"] for r in apply_mix(df, plan, "source", "id").collect())
    k2 = sorted(r["id"] for r in apply_mix(df, plan, "source", "id").collect())
    assert k1 == k2 and 0 < len(k1) < 40
    # cap: huge budget -> rate 1.0 -> everything kept
    plan_all = mix_plan(df, "source", w, F.col("n_tok"), budget_tokens=10**9)
    assert apply_mix(df, plan_all, "source", "id").count() == 40


def test_interpolate_series_golden(spark):
    from model_presto_spark.operators.timeseries import interpolate_series

    rows = [
        ("a", 0, 10.0), ("a", 1, None), ("a", 2, None), ("a", 3, 40.0),
        ("a", 4, None),            # trailing gap -> bfill/ffill = 40
        ("b", 0, None), ("b", 1, 5.0),  # leading gap -> 5
        ("c", 0, None),            # all-null entity stays null
    ]
    df = spark.createDataFrame(rows, "e string, i int, v double")
    got = {
        (r.e, r.i): r.vf
        for r in interpolate_series(df, "e", "i", "v", "vf").collect()
    }
    assert got[("a", 1)] == 20.0 and got[("a", 2)] == 30.0  # linear
    assert got[("a", 4)] == 40.0   # trailing ffill
    assert got[("b", 0)] == 5.0    # leading bfill
    assert got[("c", 0)] is None   # nothing to fill from


def test_apply_mix_epochs_upsampling(spark):
    from model_presto_spark.operators.mixing import apply_mix, apply_mix_epochs

    df = spark.createDataFrame(
        [("a", i, 10) for i in range(40)] + [("b", 100 + i, 10) for i in range(40)],
        "source string, doc_id bigint, n_tok int",
    )
    plan = spark.createDataFrame(
        [("a", 2.5), ("b", 0.5)], "source string, keep_rate double"
    )
    out = apply_mix_epochs(df, plan, "source", "doc_id").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault((r.source, r.doc_id), []).append(r.epoch)
    # source a: every doc has 2 or 3 copies, epochs contiguous from 1
    a_counts = [sorted(v) for (s, d), v in by_doc.items() if s == "a"]
    assert all(v in ([1, 2], [1, 2, 3]) for v in a_counts)
    assert len(a_counts) == 40
    frac3 = sum(1 for v in a_counts if len(v) == 3) / 40
    assert 0.2 < frac3 < 0.8  # hash coin ~50%
    # source b: 0 or 1 copies, ~half the docs
    b_docs = [d for (s, d) in by_doc if s == "b"]
    assert 5 < len(b_docs) < 35
    # rates <= 1 degrade exactly to apply_mix
    only_b = apply_mix(df, plan, "source", "doc_id").where("source = 'b'")
    assert {r.doc_id for r in only_b.collect()} == set(b_docs)
    # determinism
    again = apply_mix_epochs(df, plan, "source", "doc_id").collect()
    assert {(r.source, r.doc_id, r.epoch) for r in again} == {
        (r.source, r.doc_id, r.epoch) for r in out
    }


# ---------------------------------------------------------------------------
# Rolling anomaly detection + EWMA
# ---------------------------------------------------------------------------


def test_rolling_zscore_flags_planted_spike(spark):
    from model_presto_spark.operators.timeseries import rolling_zscore

    # flat-ish series with one big spike at position 12
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 10.8, 9.9, 10.1, 10.4, 9.8,
            10.3, 10.0, 50.0, 10.1, 9.9]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, value double")
    out = {r.t: r for r in rolling_zscore(
        df, "uid", ["t"], "value", window=10, min_periods=5, threshold=3.0
    ).collect()}
    assert out[12].is_anomaly and out[12].z > 3.0
    # early rows have no z (insufficient history), and are not flagged
    assert out[2].z is None and not out[2].is_anomaly
    # normal rows before the spike are unflagged
    assert not out[11].is_anomaly
    # the spike contaminates the TRAILING baseline of later rows but
    # those rows themselves are normal: never flagged
    assert not out[13].is_anomaly and not out[14].is_anomaly


def test_rolling_zscore_constant_baseline_no_flag(spark):
    from model_presto_spark.operators.timeseries import rolling_zscore

    rows = [(1, i, 5.0) for i in range(8)] + [(1, 8, 9.0)]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, value double")
    out = {r.t: r for r in rolling_zscore(
        df, "uid", ["t"], "value", window=10, min_periods=5
    ).collect()}
    # stddev of the constant baseline is 0 -> z undefined, not a flag
    assert out[8].z is None and not out[8].is_anomaly


def test_ewma_matches_pandas(spark):
    import pandas as pd
    import pytest

    from model_presto_spark.operators.timeseries import ewma

    rng_vals = [3.0, 7.5, 1.25, 9.0, 4.5, 6.75, 2.0, 8.25, 5.5, 0.5]
    rows = [(u, i, v + u) for u in (1, 2) for i, v in enumerate(rng_vals)]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, value double")
    got = {(r.uid, r.t): r.ewma for r in ewma(
        df, "uid", ["t"], "value", alpha=0.3
    ).collect()}
    for u in (1, 2):
        expect = (
            pd.Series([v + u for v in rng_vals]).ewm(alpha=0.3, adjust=True).mean()
        )
        for i, e in enumerate(expect):
            assert got[(u, i)] == pytest.approx(e, rel=1e-12)


def test_cohort_retention_matrix(spark):
    import datetime as _dt

    from model_presto_spark.operators.temporal import cohort_retention

    def ts(day):
        return _dt.datetime(2024, 1, day, 12)

    rows = [
        (1, ts(1)), (1, ts(1)), (1, ts(2)), (1, ts(4)),  # dup same day
        (2, ts(1)), (2, ts(4)),
        (3, ts(2)),
    ]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp")
    out = {
        (r.cohort, r.offset): r.n_active
        for r in cohort_retention(df, "uid", "ts", "day").collect()
    }
    d0 = (_dt.date(2024, 1, 1) - _dt.date(1970, 1, 1)).days
    # cohort Jan-1: users 1+2 on day 0; user 1 on day 1; both on day 3
    assert out[(d0, 0)] == 2 and out[(d0, 1)] == 1 and out[(d0, 3)] == 2
    # cohort Jan-2: user 3 only
    assert out[(d0 + 1, 0)] == 1
    assert len(out) == 4


def test_mad_outliers_robust_to_contamination(spark):
    """MAD flags a spike that the same-strength mean/std baseline
    misses when the series is contaminated by several outliers."""
    import pytest

    from model_presto_spark.operators.timeseries import mad_outliers

    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.3, 9.7, 10.1, 9.9,
            80.0, 85.0, 90.0]  # 3 contaminating spikes
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, value double")
    out = {r.t: r for r in mad_outliers(df, "uid", "value", 3.5).collect()}
    for t in (10, 11, 12):
        assert out[t].is_outlier and out[t].modified_z > 3.5
    for t in range(10):
        assert not out[t].is_outlier
    # the median sits on the clean majority (7th of 13 sorted
    # values), untouched by the three large spikes
    assert out[0].med == pytest.approx(10.1)


def test_mad_outliers_constant_series(spark):
    from model_presto_spark.operators.timeseries import mad_outliers

    df = spark.createDataFrame(
        [(1, i, 5.0) for i in range(6)], "uid bigint, t bigint, value double"
    )
    out = mad_outliers(df, "uid", "value").collect()
    assert all(r.modified_z is None and not r.is_outlier for r in out)


def test_cusum_matches_sequential_reference(spark):
    """The window closed form equals the textbook sequential
    recurrence, and detects a planted level shift."""
    import pytest

    from model_presto_spark.operators.timeseries import cusum

    vals = [10.1, 9.9, 10.0, 10.2, 9.8, 10.0,          # in control
            11.5, 11.4, 11.6, 11.5, 11.7]               # shifted +1.5
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, value double")
    out = {r.t: r for r in cusum(
        df, "uid", ["t"], "value", target=10.0, slack=0.25, threshold=3.0
    ).collect()}

    s_up = s_dn = 0.0
    for i, v in enumerate(vals):
        s_up = max(0.0, s_up + (v - 10.25))
        s_dn = max(0.0, s_dn + (9.75 - v))
        assert out[i].cusum_up == pytest.approx(s_up, abs=1e-9)
        assert out[i].cusum_down == pytest.approx(s_dn, abs=1e-9)
    # no drift during the in-control phase, detected after the shift
    assert not any(out[i].drift for i in range(6))
    assert out[10].drift


def test_transition_matrix_golden(spark):
    import pytest

    from model_presto_spark.operators.temporal import transition_matrix

    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"),
        (2, 0, "a"), (2, 1, "a"),
        (3, 0, "c"),  # singleton sequence -> no transitions
    ]
    df = spark.createDataFrame(rows, "uid bigint, t bigint, s string")
    out = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_matrix(df, "uid", ["t"], "s").collect()
    }
    # from 'a': a->b twice (user 1), a->a once (user 2), a->... none across users
    assert out[("a", "b")] == (2, pytest.approx(2 / 3))
    assert out[("a", "a")] == (1, pytest.approx(1 / 3))
    assert out[("b", "a")][0] == 1
    # no cross-entity bigrams, no from-'c' rows
    assert all(k[0] != "c" for k in out)
    # probabilities normalize per source state
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in out.items():
        sums[f] += p
    for f, s in sums.items():
        assert s == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# round-4 additions: SCD2 intervals, day streaks, sequence mining
# ---------------------------------------------------------------------------
def test_scd2_intervals_collapses_islands(spark):
    import datetime as dt

    from model_presto_spark.operators.temporal import scd2_intervals

    d = dt.date
    rows = [
        (1, d(2024, 1, 1), "a"),
        (1, d(2024, 1, 2), "a"),
        (1, d(2024, 1, 3), "b"),
        (1, d(2024, 1, 4), "a"),  # a returns: NEW version, not merged
        (2, d(2024, 1, 1), "x"),
    ]
    df = spark.createDataFrame(rows, "k bigint, day date, state string")
    out = sorted(
        scd2_intervals(df, "k", "day", "state").collect(),
        key=lambda r: (r["k"], r["version"]),
    )
    u1 = [r for r in out if r["k"] == 1]
    assert [(r["state"], r["valid_from"], r["valid_to"], r["version"]) for r in u1] == [
        ("a", d(2024, 1, 1), d(2024, 1, 2), 1),
        ("b", d(2024, 1, 3), d(2024, 1, 3), 2),
        ("a", d(2024, 1, 4), d(2024, 1, 4), 3),
    ]
    assert u1[0]["n_observations"] == 2


def test_day_streaks_hand_case(spark):
    import datetime as dt

    from model_presto_spark.operators.temporal import day_streaks

    d = dt.date
    rows = (
        [(1, d(2024, 1, i)) for i in (1, 2, 3, 5, 6, 10)]
        + [(1, d(2024, 1, 2))]  # duplicate day collapses
        + [(2, d(2024, 1, 1))]
    )
    df = spark.createDataFrame(rows, "k bigint, day date")
    out = {r["k"]: r for r in day_streaks(df, "k", "day").collect()}
    assert out[1]["longest_streak"] == 3  # 1-2-3
    assert out[1]["n_streaks"] == 3  # {1,2,3}, {5,6}, {10}
    assert out[1]["active_days"] == 6
    assert out[2]["longest_streak"] == 1


def test_sequence_counts_ordered_within_entity(spark):
    from model_presto_spark.operators.temporal import sequence_counts

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "k bigint, t int, s string")
    out = {
        (r["step1"], r["step2"], r["step3"]): r["n_occurrences"]
        for r in sequence_counts(df, "k", ["t"], "s", n=3).collect()
    }
    assert out[("a", "b", "c")] == 2
    assert out[("b", "c", "a")] == 1
    # sequences never cross entities: ('c','a','b') would need k=1's
    # tail to join k=2's head
    assert ("c", "a", "b") not in out
    # n=2 equals bigram counting
    out2 = {
        (r["step1"], r["step2"]): r["n_occurrences"]
        for r in sequence_counts(df, "k", ["t"], "s", n=2).collect()
    }
    assert out2[("a", "b")] == 2 and out2[("c", "a")] == 1
