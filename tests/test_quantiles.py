"""exact_grouped_quantiles == percentile(), bit-for-bit, on both the
whole-group path (n <= accuracy) and the sketch-bracket path
(n > accuracy, forced via a tiny accuracy)."""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F

from model_presto_spark.operators.quantiles import exact_grouped_quantiles


def _check(spark, rows, accuracy, probs=(0.25, 0.5, 0.75)):
    df = spark.createDataFrame(rows, "g string, x double, y double")
    quantiles = [("x", p, f"x_p{int(p * 100)}") for p in probs]
    quantiles.append(("y", 0.5, "y_med"))
    got = {
        tuple(r[0:1]): r
        for r in exact_grouped_quantiles(df, ["g"], quantiles, accuracy=accuracy)
        .orderBy("g")
        .collect()
    }
    exp_aggs = [
        F.expr(f"percentile(x, {p})").alias(f"x_p{int(p * 100)}") for p in probs
    ]
    exp_aggs.append(F.expr("percentile(y, 0.5)").alias("y_med"))
    exp = {tuple(r[0:1]): r for r in df.groupBy("g").agg(*exp_aggs).collect()}
    assert set(got) == set(exp)
    for k in exp:
        for f in exp[k].asDict():
            if f == "g":
                continue
            e, a = exp[k][f], got[k][f]
            if e is None:
                assert a is None, (k, f, a)
            else:
                assert a is not None and math.isclose(a, e, rel_tol=0, abs_tol=1e-9), (
                    k,
                    f,
                    e,
                    a,
                )


def test_small_groups_whole_path(spark):
    rng = random.Random(7)
    rows = []
    for g, n in [("a", 1), ("b", 2), ("c", 3), ("d", 17), ("e", 100)]:
        for _ in range(n):
            rows.append((g, rng.uniform(-5, 5), float(rng.randint(0, 3))))
    # all-null value column in one group; nulls sprinkled in another
    rows.append(("z", None, None))
    rows += [("e", None, None)] * 5
    _check(spark, rows, accuracy=10_000)


def test_sketch_bracket_path_forced(spark):
    """accuracy=200 with 2000-row groups forces the bracket regime."""
    rng = random.Random(11)
    rows = []
    for g in ("p", "q"):
        for _ in range(2000):
            rows.append((g, rng.gauss(0, 100), rng.uniform(0, 1)))
    # heavy ties at the median of group 'r' (bracket widens to the ties)
    rows += [("r", 42.0, 1.0)] * 1500 + [("r", rng.uniform(50, 60), 0.0) for _ in range(500)]
    _check(spark, rows, accuracy=200)


def test_null_group_key_is_a_group(spark):
    rows = [("a", 1.0, 0.0), ("a", 3.0, 0.0), (None, 10.0, 1.0), (None, 20.0, 1.0), (None, 40.0, 1.0)]
    _check(spark, rows, accuracy=10_000, probs=(0.5,))


def test_integer_column_returns_double(spark):
    df = spark.createDataFrame(
        [("a", i, (i * 7) % 13) for i in range(1, 202)], "g string, x long, y long"
    )
    got = exact_grouped_quantiles(
        df, ["g"], [("x", 0.5, "mx"), ("y", 0.25, "qy")], accuracy=50
    )
    assert dict(got.dtypes)["mx"] == "double"
    exp = df.groupBy("g").agg(
        F.expr("percentile(x, 0.5)").alias("mx"),
        F.expr("percentile(y, 0.25)").alias("qy"),
    )
    g, e = got.collect()[0], exp.collect()[0]
    assert math.isclose(g["mx"], e["mx"], abs_tol=1e-9)
    assert math.isclose(g["qy"], e["qy"], abs_tol=1e-9)


def test_two_group_columns(spark):
    rng = random.Random(5)
    rows = [
        (f"s{i % 2}", i % 3, rng.uniform(0, 100), rng.uniform(-1, 1))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "s string, k int, x double, y double")
    got = {
        (r["s"], r["k"]): r["med"]
        for r in exact_grouped_quantiles(
            df, ["s", "k"], [("x", 0.5, "med")], accuracy=300
        ).collect()
    }
    exp = {
        (r["s"], r["k"]): r["med"]
        for r in df.groupBy("s", "k")
        .agg(F.expr("percentile(x, 0.5)").alias("med"))
        .collect()
    }
    assert got.keys() == exp.keys()
    for k in exp:
        assert math.isclose(got[k], exp[k], abs_tol=1e-9), k


def test_extreme_probs_and_duplicates(spark):
    rng = random.Random(3)
    rows = [("s", float(rng.randint(0, 9)), float(rng.randint(0, 1))) for _ in range(3000)]
    _check(spark, rows, accuracy=250, probs=(0.0, 0.01, 0.5, 0.99, 1.0))


def test_bit_parity_with_percentile_no_tolerance(spark):
    """The interpolation uses Spark Percentile's exact algebraic form
    ((1-g)*lo + g*hi), so results must be BIT-identical — == with no
    tolerance — on both the whole-group and bracket paths."""
    rng = random.Random(23)
    rows = [
        (f"g{i % 3}", rng.uniform(-1e6, 1e6), rng.gauss(0, 1))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    probs = (0.1, 0.25, 0.5, 0.9)
    quantiles = [("x", p, f"x{int(p * 100)}") for p in probs] + [
        ("y", 0.5, "ym")
    ]
    for accuracy in (150, 10_000):  # bracket path / whole-group path
        got = {
            r["g"]: r
            for r in exact_grouped_quantiles(
                df, ["g"], quantiles, accuracy=accuracy
            ).collect()
        }
        exp_aggs = [
            F.expr(f"percentile(x, {p})").alias(f"x{int(p * 100)}")
            for p in probs
        ] + [F.expr("percentile(y, 0.5)").alias("ym")]
        exp = {r["g"]: r for r in df.groupBy("g").agg(*exp_aggs).collect()}
        for k in exp:
            for f in ("x10", "x25", "x50", "x90", "ym"):
                assert got[k][f] == exp[k][f], (accuracy, k, f)


def test_extra_aggs_ride_refine_pass(spark):
    """extra_aggs (moments fused into the refine aggregation, r08
    optimization) must equal a direct groupBy().agg() over the input —
    on both the whole-group and bracket paths — and must not disturb
    the quantile outputs."""
    rng = random.Random(41)
    rows = [
        (f"g{i % 4}", rng.uniform(-100, 100), float(rng.randint(0, 9)))
        for i in range(2000)
    ]
    rows.append(("z", None, None))  # all-null group still gets moments row
    df = spark.createDataFrame(rows, "g string, x double, y double")
    exp = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.avg("x").alias("mx"),
            F.stddev_samp("x").alias("sx"),
            F.expr("percentile(x, 0.5)").alias("xm"),
        )
        .collect()
    }
    for accuracy in (100, 10_000):  # bracket path / whole-group path
        got = {
            r["g"]: r
            for r in exact_grouped_quantiles(
                df,
                ["g"],
                [("x", 0.5, "xm")],
                accuracy=accuracy,
                extra_aggs=[
                    F.avg("x").alias("mx"),
                    F.stddev_samp("x").alias("sx"),
                ],
            ).collect()
        }
        assert set(got) == set(exp)
        for k in exp:
            for f in ("mx", "sx", "xm"):
                e, a = exp[k][f], got[k][f]
                if e is None:
                    assert a is None, (accuracy, k, f, a)
                else:
                    assert math.isclose(a, e, rel_tol=0, abs_tol=1e-9), (
                        accuracy, k, f, e, a,
                    )
