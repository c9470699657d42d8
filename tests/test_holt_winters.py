"""Golden test: operators/timeseries.holt_winters vs a plain Python
replay of the textbook additive recurrence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from model_presto_spark.operators.timeseries import holt_winters


def _py_holt_winters(ys, p, a, g, d):
    m1 = sum(ys[:p]) / p
    m2 = sum(ys[p : 2 * p]) / p
    lvl, b = m1, (m2 - m1) / p
    s = [y - m1 for y in ys[:p]]
    sse = 0.0
    for y in ys[p:]:
        s_old = s[0]
        err = y - (lvl + b + s_old)
        l_new = a * (y - s_old) + (1 - a) * (lvl + b)
        b_new = g * (l_new - lvl) + (1 - g) * b
        s_new = d * (y - l_new) + (1 - d) * s_old
        lvl, b = l_new, b_new
        s = s[1:] + [s_new]
        sse += err * err
    return lvl, b, s, sse


@pytest.mark.parametrize("p,a,g,d", [(7, 0.4, 0.2, 0.3), (4, 0.5, 0.1, 0.2)])
def test_holt_winters_matches_python(spark, p, a, g, d):
    # Deterministic synthetic series: trend + seasonality + wobble,
    # on a 2dp grid like the cent-rounded production inputs.
    n = 6 * p + 3
    ys = [
        round(100 + 1.5 * t + 10 * ((t % p) - p / 2) + ((t * 7) % 5), 2)
        for t in range(n)
    ]
    df = spark.createDataFrame([(ys,)], "ys array<double>")
    row = df.select(
        holt_winters(F.col("ys"), p, a, g, d).alias("st")
    ).collect()[0]["st"]
    lvl, b, s, sse = _py_holt_winters(ys, p, a, g, d)
    assert row["l"] == pytest.approx(lvl, abs=1e-9)
    assert row["b"] == pytest.approx(b, abs=1e-9)
    assert row["sse"] == pytest.approx(sse, rel=1e-9)
    assert len(row["s"]) == p
    for got, want in zip(row["s"], s):
        assert got == pytest.approx(want, abs=1e-9)


def test_holt_winters_flat_series_zero_seasonals(spark):
    # A constant series must fit level=const, trend=0, seasonals=0,
    # sse=0 exactly.
    ys = [50.0] * 20
    df = spark.createDataFrame([(ys,)], "ys array<double>")
    row = df.select(
        holt_winters(F.col("ys"), 7, 0.4, 0.2, 0.3).alias("st")
    ).collect()[0]["st"]
    assert row["l"] == pytest.approx(50.0, abs=1e-12)
    assert row["b"] == pytest.approx(0.0, abs=1e-12)
    assert row["sse"] == pytest.approx(0.0, abs=1e-12)
    assert all(abs(x) < 1e-12 for x in row["s"])
