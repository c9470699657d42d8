"""Tests for operators/stats.py and timeseries.seasonal_decompose."""

from __future__ import annotations

import numpy as np
import pytest


def test_grouped_ols_exact_line(spark):
    from model_presto_spark.operators.stats import grouped_ols

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(10)]
    rows += [("b", float(x), 5.0 - x) for x in range(5)]
    rows += [("c", 1.0, 3.0), ("c", 1.0, 4.0)]  # zero x variance
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in grouped_ols(df, "g", "x", "y").collect()}
    assert out["a"]["slope"] == pytest.approx(2.0)
    assert out["a"]["intercept"] == pytest.approx(1.0)
    assert out["a"]["r2"] == pytest.approx(1.0)
    assert out["b"]["slope"] == pytest.approx(-1.0)
    assert out["c"]["slope"] is None and out["c"]["r2"] is None


def _vec_df(spark, M):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(M)],
        "vec_id bigint, embedding array<float>",
    )


def test_covariance_and_correlation_match_numpy(spark):
    from model_presto_spark.operators.stats import (
        correlation_matrix,
        covariance_matrix,
    )

    rng = np.random.default_rng(3)
    M = rng.normal(size=(40, 5)).astype("float32")
    df = _vec_df(spark, M)
    C = np.cov(M.astype("float64"), rowvar=False)
    R = np.corrcoef(M.astype("float64"), rowvar=False)
    cov = {(r["i"], r["j"]): r["cov"]
           for r in covariance_matrix(df, "vec_id", "embedding", 5).collect()}
    corr = {(r["i"], r["j"]): r["corr"]
            for r in correlation_matrix(df, "vec_id", "embedding", 5).collect()}
    for i in range(5):
        for j in range(5):
            assert cov[(i, j)] == pytest.approx(C[i, j], rel=1e-6, abs=1e-9)
            assert corr[(i, j)] == pytest.approx(R[i, j], rel=1e-6, abs=1e-9)


def test_pca_project_matches_numpy(spark):
    from model_presto_spark.operators.stats import pca_project

    rng = np.random.default_rng(7)
    # anisotropic cloud: dominant direction along (1,1,0)/sqrt(2)
    base = rng.normal(size=(60, 3)) * np.array([3.0, 0.5, 0.1])
    rot = np.array(
        [[1 / np.sqrt(2), 1 / np.sqrt(2), 0],
         [-1 / np.sqrt(2), 1 / np.sqrt(2), 0],
         [0, 0, 1.0]]
    )
    M = (base @ rot).astype("float32")
    df = _vec_df(spark, M)
    out = {r["vec_id"]: r["pc"] for r in
           pca_project(df, "vec_id", "embedding", dims=3, k=2).collect()}
    X = M.astype("float64")
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    mu = X.mean(axis=0)
    for ci, idx in enumerate(order):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        expect = (X - mu) @ v
        got = np.array([out[i][ci] for i in range(len(X))])
        assert np.allclose(got, expect, rtol=1e-5, atol=1e-6)
    # whitening scales variance to ~1
    w = {r["vec_id"]: r["pc"] for r in
         pca_project(df, "vec_id", "embedding", dims=3, k=2, whiten=True).collect()}
    col0 = np.array([w[i][0] for i in range(len(X))])
    assert np.var(col0, ddof=1) == pytest.approx(1.0, rel=1e-4)


def test_seasonal_decompose_recovers_planted_cycle(spark):
    import datetime as dt

    from model_presto_spark.operators.timeseries import seasonal_decompose

    season = [5.0, -3.0, 1.0, 0.0, -1.0, 2.0, -4.0]
    rows = []
    for t in range(28):
        val = 100.0 + 0.0 * t + season[t % 7]
        rows.append(("s", dt.date(2024, 1, 1) + dt.timedelta(days=t), val))
    df = spark.createDataFrame(rows, "k string, d date, value double")
    out = seasonal_decompose(df, "k", "d", "value", period=7).collect()
    by_t = {r["d"]: r for r in out}
    mid = dt.date(2024, 1, 10)
    # flat trend recovered exactly away from edges; seasonal matches
    # the planted (already zero-mean) cycle; residual ~ 0
    assert by_t[mid]["trend"] == pytest.approx(100.0)
    assert by_t[mid]["seasonal"] == pytest.approx(
        season[(mid - dt.date(2024, 1, 1)).days % 7], abs=1e-9
    )
    assert by_t[mid]["residual"] == pytest.approx(0.0, abs=1e-9)
    # edges: trend null where the centered window is incomplete
    assert by_t[dt.date(2024, 1, 1)]["trend"] is None


def test_kcore_peel_converges_on_planted_core(spark):
    from pyspark.sql import functions as F

    from model_presto_spark.operators.graph import kcore_peel

    # K5 clique (every node degree 4) + a pendant path hanging off it
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    path = [(4, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(clique + path, "src bigint, dst bigint")
    out = {r["node"]: r for r in kcore_peel(e, k=3, rounds=4).collect()}
    assert all(out[i]["in_core"] for i in range(5))
    assert not out[11]["in_core"] and not out[12]["in_core"]
    # node 10's pendant chain peels away; the clique's degrees hold
    assert out[0]["degree"] >= 3
    assert out[12]["degree"] == 0
