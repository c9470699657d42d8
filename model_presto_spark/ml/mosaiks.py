"""Mosaiks-1d featurization (M9) and threshold sweep (M10) as pure
column expressions.

Reference semantics: Mosaiks1d applies a bank of random 1-d
convolution kernels over the timestep axis, ReLU, then mean-pools
(reference: presto-tolbi/presto/model.py:126-145); the multilabel
threshold sweep scores binarization thresholds 0.1..0.9 against
metrics (presto-tolbi/presto/eval/treesat_eval.py:254-300,
thresholds at :171-172).

Spark-first: the kernel bank is a driver-side constant embedded as
plan literals (like the LSH hyperplanes); convolution over a series
array column is a higher-order-function dot product — no UDF, no
shuffle. The threshold sweep is a crossJoin against a tiny threshold
dimension followed by grouped conditional aggregates — one pass over
the scores for ALL thresholds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def make_kernels(
    n_kernels: int = 8, width: int = 3, seed: int = 7
) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(width)] for _ in range(n_kernels)]


def mosaiks_features(
    series: Column, kernels: list[list[float]], num_timesteps: int = 12
) -> Column:
    """1-d conv bank + ReLU + mean-pool over a per-row value series
    (array<double> of length ``num_timesteps``) -> array<double> of
    len(kernels) features.

    Valid positions: t in [1, T - w + 1]; each output feature is
    mean_t(relu(sum_j series[t+j] * k[j])) — all literal arithmetic
    inside codegen.
    """
    def one_kernel(kern: list[float]) -> Column:
        # real closure: a default-arg lambda param would be parsed by
        # pyspark as an extra HOF lambda variable
        n_pos = num_timesteps - len(kern) + 1
        conv = F.transform(
            F.sequence(F.lit(1), F.lit(n_pos)),
            lambda t: F.greatest(
                sum(
                    F.element_at(series, t + j) * F.lit(kern[j])
                    for j in range(len(kern))
                ),
                F.lit(0.0),
            ),
        )
        return F.aggregate(conv, F.lit(0.0), lambda a, x: a + x) / F.lit(
            float(n_pos)
        )

    return F.array(*[one_kernel(k) for k in kernels])


def threshold_sweep(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Binary metrics at every threshold in one distributed pass.

    crossJoin against the broadcast threshold dimension multiplies
    rows by |thresholds| (tiny), then a single groupBy(threshold)
    computes tp/fp/fn/tn and F1 for all thresholds — the reference's
    per-threshold python loop collapsed into one shuffle.
    """
    spark = scored.sparkSession
    th = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    s, l = F.col(score_col), F.col(label_col)
    pred = (s >= F.col("threshold")).cast("int")
    pairs = scored.crossJoin(F.broadcast(th)).select(
        "threshold", l.cast("int").alias("__y"), pred.alias("__p")
    )
    agg = pairs.groupBy("threshold").agg(
        F.count_if((F.col("__y") == 1) & (F.col("__p") == 1)).alias("tp"),
        F.count_if((F.col("__y") == 0) & (F.col("__p") == 1)).alias("fp"),
        F.count_if((F.col("__y") == 1) & (F.col("__p") == 0)).alias("fn"),
        F.count_if((F.col("__y") == 0) & (F.col("__p") == 0)).alias("tn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )


def best_threshold(sweep: DataFrame) -> float:
    """argmax-F1 threshold (ties -> smallest threshold), collected as
    one scalar (treesat_eval.py:171-172 persisted thresholds)."""
    row = sweep.orderBy(F.col("f1").desc(), F.col("threshold").asc()).first()
    return float(row["threshold"])
