"""Hand-case tests for operators/behavior.py (ordered funnel, RFM,
attribution, Benford). Oracle parity of q118-q121 lives in
test_queries_oracle; these pin the operator semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

TS = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, event_id bigint"
    )


def test_ordered_funnel_requires_strict_order(spark):
    from model_presto_spark.operators.behavior import ordered_funnel

    rows = [
        # user 1: full ordered chain
        (1, TS(2024, 1, 1), "signup", 1),
        (1, TS(2024, 1, 2), "view", 2),
        (1, TS(2024, 1, 3), "purchase", 3),
        # user 2: purchase BEFORE view -> stops at view
        (2, TS(2024, 1, 1), "signup", 4),
        (2, TS(2024, 1, 2), "purchase", 5),
        (2, TS(2024, 1, 3), "view", 6),
        # user 3: no signup -> counts nowhere
        (3, TS(2024, 1, 1), "view", 7),
        (3, TS(2024, 1, 2), "purchase", 8),
    ]
    out = {
        r["step"]: r["n_entities"]
        for r in ordered_funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["signup", "view", "purchase"],
        ).collect()
    }
    assert out == {"signup": 2, "view": 2, "purchase": 1}


def test_ordered_funnel_max_span(spark):
    from model_presto_spark.operators.behavior import ordered_funnel

    rows = [
        (1, TS(2024, 1, 1), "signup", 1),
        (1, TS(2024, 1, 2), "view", 2),       # inside 7 days
        (1, TS(2024, 2, 1), "purchase", 3),   # outside
        (2, TS(2024, 1, 1), "signup", 4),
        (2, TS(2024, 1, 2), "view", 5),
        (2, TS(2024, 1, 3), "purchase", 6),
    ]
    out = {
        r["step"]: r["n_entities"]
        for r in ordered_funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            ["signup", "view", "purchase"], max_span="7 days",
        ).collect()
    }
    assert out == {"signup": 2, "view": 2, "purchase": 1}


def test_rfm_scores_rank_direction(spark):
    from model_presto_spark.operators.behavior import rfm_scores

    rows = [
        # user 1: recent, frequent, big spender
        (1, TS(2024, 1, 10), "purchase", 1),
        (1, TS(2024, 1, 9), "purchase", 2),
        (1, TS(2024, 1, 8), "purchase", 3),
        # user 2: stale, rare, small
        (2, TS(2024, 1, 1), "purchase", 4),
    ]
    df = _ev(spark, rows).withColumn(
        "value", F.when(F.col("user_id") == 1, 100.0).otherwise(1.0)
    )
    out = {
        r["user_id"]: r
        for r in rfm_scores(df, "user_id", "ts", "value", n_tiles=2).collect()
    }
    assert out[1]["r_score"] == 1 and out[2]["r_score"] == 2
    assert out[1]["f_score"] == 1 and out[1]["m_score"] == 1
    assert out[1]["recency_days"] == 0 and out[2]["recency_days"] == 9
    assert out[1]["segment"] == "111" and out[2]["segment"] == "222"


def test_attribution_last_touch_and_linear(spark):
    from model_presto_spark.operators.behavior import attribution

    rows = [
        (1, TS(2024, 1, 1), "click", 1),
        (1, TS(2024, 1, 2), "view", 2),
        (1, TS(2024, 1, 3), "purchase", 3),   # last touch: view
        (2, TS(2024, 1, 1), "view", 4),
        (2, TS(2024, 1, 2), "purchase", 5),   # last touch: view
        (3, TS(2024, 1, 1), "purchase", 6),   # no prior touch: excluded
    ]
    ev = _ev(spark, rows)
    last = {
        r["touch_type"]: r
        for r in attribution(
            ev, "user_id", "ts", "event_type", ["click", "view"],
            "purchase", id_col="event_id", model="last_touch",
        ).collect()
    }
    assert last["view"]["credit"] == 2.0 and "click" not in last
    lin = {
        r["touch_type"]: r
        for r in attribution(
            ev, "user_id", "ts", "event_type", ["click", "view"],
            "purchase", id_col="event_id", model="linear",
        ).collect()
    }
    # user 1 splits 0.5/0.5; user 2 gives view 1.0
    assert lin["click"]["credit"] == pytest.approx(0.5)
    assert lin["view"]["credit"] == pytest.approx(1.5)
    assert lin["view"]["n_conversions"] == 2
    assert lin["click"]["n_conversions"] == 1


def test_benford_digits_spine_and_chi2(spark):
    import math

    from model_presto_spark.operators.behavior import benford_digits

    # values all starting with digit 1 -> digits 2..9 have n=0 but
    # still appear and contribute expected mass to chi2
    df = spark.createDataFrame(
        [(float(v),) for v in (1.2, 10.5, 150.0, 1999.0)], "v double"
    )
    out = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1]["observed"] == 1.0 and out[2]["n"] == 0
    # chi2 = sum over digits of (obs-exp)^2/exp * N
    exp = [math.log10(1 + 1 / d) for d in range(1, 10)]
    chi = ((1 - exp[0]) ** 2 / exp[0] + sum(e for e in exp[1:])) * 4
    assert out[1]["chi2"] == pytest.approx(chi, rel=1e-9)
