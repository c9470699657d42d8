"""Tests: MLlib eval heads (M5/M6), geo expressions (F16/F22/F23),
grid operators (F24/F25, J4)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from model_presto_spark.functions import geo as G


# --- heads -------------------------------------------------------------------


def _emb_df(spark, n=200, d=8, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        y = i % 2
        center = 1.0 if y else -1.0
        rows.append(
            Row(id=i, embedding=[float(v) for v in rng.normal(center, 0.5, d)], y=y)
        )
    return spark.createDataFrame(rows)


def test_logistic_head_fit_and_score(spark):
    from model_presto_spark.ml.heads import fit_head, score_head

    df = _emb_df(spark)
    model = fit_head(df, "embedding", "y", head="logistic")
    scored = score_head(model, df, "embedding")
    acc = scored.filter(F.col("prediction") == F.col("y")).count() / 200
    assert acc > 0.95  # linearly separable by construction
    assert "probability" in scored.columns


def test_random_forest_head(spark):
    from model_presto_spark.ml.heads import fit_head, score_head

    df = _emb_df(spark, n=120)
    model = fit_head(df, "embedding", "y", head="random_forest", balanced=False)
    scored = score_head(model, df, "embedding")
    acc = scored.filter(F.col("prediction") == F.col("y")).count() / 120
    assert acc > 0.9


def test_linear_regression_head(spark):
    from model_presto_spark.ml.heads import fit_head, score_head

    rows = [
        Row(id=i, embedding=[float(i), 1.0], target=2.0 * i + 3.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    model = fit_head(df, "embedding", "target", head="linear", balanced=False)
    scored = score_head(model, df, "embedding", out_col="pred")
    err = scored.agg(F.max(F.abs(F.col("pred") - F.col("target")))).collect()[0][0]
    assert err < 1e-6


def test_unknown_head_raises(spark):
    from model_presto_spark.ml.heads import fit_head

    with pytest.raises(ValueError):
        fit_head(_emb_df(spark, n=4), "embedding", "y", head="nope")


# --- geo ---------------------------------------------------------------------


def test_unit_sphere_golden(spark):
    df = spark.createDataFrame([Row(lat=0.0, lon=0.0), Row(lat=90.0, lon=0.0)])
    out = df.select(G.latlon_to_unit_sphere(F.col("lat"), F.col("lon")).alias("v")).collect()
    assert np.allclose(out[0].v, [1.0, 0.0, 0.0], atol=1e-12)
    assert np.allclose(out[1].v, [0.0, 0.0, 1.0], atol=1e-12)


def test_web_mercator_golden(spark):
    df = spark.createDataFrame([Row(lat=0.0, lon=180.0)])
    v = df.select(G.web_mercator(F.col("lat"), F.col("lon")).alias("m")).collect()[0].m
    assert abs(v.x - math.pi * 6378137.0) < 1e-6
    assert abs(v.y) < 1e-6


def test_local_metres_and_haversine_agree(spark):
    # 0.01 deg of latitude ~ 1113.2 m; both measures should agree closely
    df = spark.createDataFrame([Row(lat=45.01, lon=3.0, lat0=45.0, lon0=3.0)])
    row = df.select(
        G.local_metres(F.col("lat"), F.col("lon"), F.col("lat0"), F.col("lon0")).alias("lm"),
        G.haversine_m(F.col("lat0"), F.col("lon0"), F.col("lat"), F.col("lon")).alias("hv"),
    ).collect()[0]
    assert abs(row.lm.dy_m - 1113.2) < 1.0
    assert abs(row.hv - row.lm.dy_m) < 2.0


def test_square_buffer_roundtrip(spark):
    df = spark.createDataFrame([Row(lat=10.0, lon=20.0)])
    b = df.select(
        G.square_buffer_bbox(F.col("lat"), F.col("lon"), F.lit(1000.0)).alias("b")
    ).collect()[0].b
    assert b.min_lat < 10.0 < b.max_lat
    assert b.min_lon < 20.0 < b.max_lon
    # latitude half-side is 1000 m worth of degrees
    assert abs((b.max_lat - 10.0) * G.DEG_LAT_M - 1000.0) < 1e-6


# --- grid --------------------------------------------------------------------


def test_bilinear_identity(spark):
    from model_presto_spark.operators.grid import bilinear_resample

    px = spark.createDataFrame(
        [Row(r=i, c=j, v=float(i * 10 + j)) for i in range(4) for j in range(4)]
    )
    out = bilinear_resample(px, "r", "c", "v", scale=1.0, out_rows=4, out_cols=4)
    got = {(r.row, r.col): r.value for r in out.collect()}
    assert got[(2, 3)] == 23.0  # scale 1 == identity


def test_bilinear_midpoint(spark):
    from model_presto_spark.operators.grid import bilinear_resample

    px = spark.createDataFrame(
        [Row(r=i, c=j, v=float(i * 2 + j * 4)) for i in range(3) for j in range(3)]
    )
    out = bilinear_resample(px, "r", "c", "v", scale=2.0, out_rows=5, out_cols=5)
    got = {(r.row, r.col): r.value for r in out.collect()}
    # output (1,1) -> source (0.5, 0.5): mean of v(0,0),v(0,1),v(1,0),v(1,1)
    assert got[(1, 1)] == pytest.approx((0.0 + 4.0 + 2.0 + 6.0) / 4)
    assert got[(2, 2)] == pytest.approx(6.0)  # lands exactly on (1,1)


def test_terrain_derivatives_plane(spark):
    from model_presto_spark.operators.grid import terrain_derivatives

    # elevation = 2*col -> dz/dx = 2, dz/dy = 0
    px = spark.createDataFrame(
        [Row(r=i, c=j, elev=2.0 * j) for i in range(3) for j in range(5)]
    )
    out = terrain_derivatives(px, "r", "c", "elev", cell_size=1.0)
    rows = out.filter((F.col("r") == 1) & (F.col("c") == 2)).collect()[0]
    assert rows.slope_deg == pytest.approx(math.degrees(math.atan(2.0)))


def test_positional_concat(spark):
    from model_presto_spark.operators.grid import positional_concat

    a = spark.createDataFrame([Row(x=1), Row(x=2), Row(x=3)])
    b = spark.createDataFrame([Row(y="a"), Row(y="b"), Row(y="c")])
    out = positional_concat(a, b).orderBy("x").collect()
    assert [(r.x, r.y) for r in out] == [(1, "a"), (2, "b"), (3, "c")]


def test_multi_output_head_matches_independent_fits(spark):
    """M6 literal form: multi-output = one independent head per label
    (sklearn MultiOutputClassifier semantics) — predictions for each
    output must equal the individually-fitted head's predictions."""
    import numpy as np
    from pyspark.sql import Row

    from model_presto_spark.ml.heads import (
        fit_head,
        fit_multi_output_head,
        score_head,
        score_multi_output,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        v = rng.normal(size=8)
        rows.append(
            Row(
                id=i,
                emb=[float(x) for x in v],
                crop=int(v[0] + 0.2 * v[1] > 0),
                water=int(v[2] - v[3] > 0.1),
            )
        )
    df = spark.createDataFrame(rows).coalesce(2)
    models = fit_multi_output_head(df, "emb", ["crop", "water"])
    out = score_multi_output(models, df, "emb")
    assert set(out.columns) == {"id", "emb", "crop", "water", "pred_crop", "pred_water"}
    # parity with per-label fits
    for lbl in ("crop", "water"):
        solo = score_head(fit_head(df, "emb", lbl), df, "emb", out_col="p")
        got = {r.id: r[f"pred_{lbl}"] for r in out.collect()}
        want = {r.id: r.p for r in solo.collect()}
        assert got == want
    # the heads are genuinely independent: at least one id differs
    # between the two outputs' predictions
    preds = out.select("pred_crop", "pred_water").collect()
    assert any(r.pred_crop != r.pred_water for r in preds)
    # sanity: learnable signal
    acc = out.where(F.col("pred_crop") == F.col("crop")).count() / 200
    assert acc > 0.8
