"""Mosaiks-1d (M9) and threshold-sweep (M10) tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from model_presto_spark.ml.mosaiks import (
    best_threshold,
    make_kernels,
    mosaiks_features,
    threshold_sweep,
)


def test_mosaiks_golden(spark):
    # kernel [1, -1]: conv over [1,3,2] -> relu([-2, 1]) -> mean 0.5
    series = [1.0, 3.0, 2.0]
    df = spark.createDataFrame([Row(s=series)])
    out = df.select(
        mosaiks_features(F.col("s"), [[1.0, -1.0]], num_timesteps=3).alias("f")
    ).collect()[0].f
    assert out == [pytest.approx(0.5)]


def test_mosaiks_matches_numpy(spark):
    kernels = make_kernels(n_kernels=4, width=3, seed=7)
    rng = np.random.default_rng(3)
    series = [float(x) for x in rng.standard_normal(12)]
    df = spark.createDataFrame([Row(s=series)])
    got = df.select(
        mosaiks_features(F.col("s"), kernels, num_timesteps=12).alias("f")
    ).collect()[0].f
    arr = np.array(series)
    for ki, kern in enumerate(kernels):
        conv = np.array(
            [np.dot(arr[t : t + 3], kern) for t in range(10)]
        )
        expected = np.maximum(conv, 0).mean()
        assert got[ki] == pytest.approx(expected, rel=1e-12)


def test_threshold_sweep_golden(spark):
    # scores/labels constructed so threshold 0.5 is optimal
    rows = [
        Row(score=0.9, y=1), Row(score=0.8, y=1), Row(score=0.6, y=1),
        Row(score=0.4, y=0), Row(score=0.2, y=0), Row(score=0.1, y=0),
        Row(score=0.3, y=1),  # one hard positive
    ]
    df = spark.createDataFrame(rows)
    sweep = threshold_sweep(df, "score", "y")
    at5 = sweep.filter(F.col("threshold") == 0.5).collect()[0]
    assert (at5.tp, at5.fp, at5.fn, at5.tn) == (3, 0, 1, 3)
    # threshold 0.3 catches the hard positive at the cost of one FP:
    # F1 = 8/9 there vs 6/7 at 0.5 -> 0.3 is the argmax
    at3 = sweep.filter(F.col("threshold") == 0.3).collect()[0]
    assert (at3.tp, at3.fp, at3.fn, at3.tn) == (4, 1, 0, 2)
    assert best_threshold(sweep) == pytest.approx(0.3)
