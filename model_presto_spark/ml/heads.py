"""Eval heads over embeddings (M5/M6): fit small supervised models
on embedding columns, score distributed.

Reference semantics: sklearn heads — LogisticRegression (balanced),
RandomForest, LinearRegression — fit on collected embeddings, then
used for eval (reference: presto-tolbi/presto/eval/eval.py:150-212,
esp. :191-209; the fine-tuned linear+sigmoid head
presto-tolbi/presto/model.py:96-109).

Spark-first: Spark MLlib equivalents fit *distributed* (no driver
collect of the feature matrix — at 100 TB of embeddings that is the
whole ballgame) and score via ``model.transform`` which stays
JVM-side. The embedding ``array<float>`` column converts to an ML
vector with ``array_to_vector`` — a zero-copy-ish cast, not a UDF.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADS = {
    "logistic": lambda: LogisticRegression(
        featuresCol="__feat", labelCol="__lbl", maxIter=50
    ),
    "random_forest": lambda: RandomForestClassifier(
        featuresCol="__feat", labelCol="__lbl", numTrees=20, seed=42
    ),
    "linear": lambda: LinearRegression(featuresCol="__feat", labelCol="__lbl"),
    "random_forest_reg": lambda: RandomForestRegressor(
        featuresCol="__feat", labelCol="__lbl", numTrees=20, seed=42
    ),
}


def _prep(df: DataFrame, embedding_col: str, label_col: str) -> DataFrame:
    return df.select(
        *df.columns,
        array_to_vector(
            F.col(embedding_col).cast("array<double>")
        ).alias("__feat"),
        F.col(label_col).cast("double").alias("__lbl"),
    )


def fit_head(
    train: DataFrame,
    embedding_col: str,
    label_col: str,
    head: str = "logistic",
    balanced: bool = True,
):
    """Fit an eval head distributed. ``balanced=True`` reproduces
    sklearn's class_weight='balanced' (eval.py:191-199) via a weight
    column n/(k*n_c) — computed with one aggregate, joined broadcast."""
    if head not in _HEADS:
        raise ValueError(f"head must be one of {sorted(_HEADS)}")
    est = _HEADS[head]()
    data = _prep(train, embedding_col, label_col)
    if balanced and head in ("logistic", "random_forest"):
        counts = data.groupBy("__lbl").agg(F.count(F.lit(1)).alias("__n_c"))
        n = data.count()
        k = counts.count()
        data = data.join(F.broadcast(counts), "__lbl").withColumn(
            "__w", F.lit(float(n)) / (F.lit(float(k)) * F.col("__n_c"))
        )
        est.setWeightCol("__w")
    return est.fit(data)


def score_head(
    model, df: DataFrame, embedding_col: str, out_col: str = "prediction"
) -> DataFrame:
    """Distributed scoring; keeps input columns, adds prediction (and
    probability array for classifiers)."""
    scored = model.transform(_prep_nolabel(df, embedding_col))
    cols = [c for c in df.columns] + [F.col("prediction").alias(out_col)]
    if "probability" in scored.columns:
        cols.append(vector_to_array(F.col("probability")).alias("probability"))
    return scored.select(*cols)


def _prep_nolabel(df: DataFrame, embedding_col: str) -> DataFrame:
    return df.select(
        *df.columns,
        array_to_vector(F.col(embedding_col).cast("array<double>")).alias("__feat"),
    )


class EarlyStopping:
    """Patience-based early stopping on a driver-side metric loop
    (M8, reference: presto-tolbi/presto/eval/eval.py:123-135).

    Training epochs are driver-orchestrated in Spark too (each epoch
    is a distributed job); the stopping rule itself is scalar state.

    >>> es = EarlyStopping(patience=2)
    >>> for epoch_loss in losses:
    ...     if es.should_stop(epoch_loss): break
    """

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: float | None = None
        self.bad_epochs = 0

    def should_stop(self, val_loss: float) -> bool:
        if self.best is None or val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


def fit_multi_output_head(
    train: DataFrame,
    embedding_col: str,
    label_cols: list[str],
    head: str = "logistic",
    balanced: bool = True,
) -> dict[str, object]:
    """M6 literal form — sklearn's ``MultiOutputClassifier`` semantics
    (reference: presto-tolbi/presto/eval/eval.py:191-209): one
    INDEPENDENT binary estimator per output label, no cross-label
    coupling. Returns {label_col: fitted_model}.

    Each per-label fit is a distributed MLlib job over the same
    training frame (feature prep is re-derived per fit — cheap
    relative to the fit itself; persist the frame upstream if the
    label list is long). The per-label threshold sweep
    (``mosaiks.threshold_sweep``) composes on top of each output's
    probability column exactly as the reference tunes per-label
    operating points.
    """
    return {
        lbl: fit_head(train, embedding_col, lbl, head=head, balanced=balanced)
        for lbl in label_cols
    }


def score_multi_output(
    models: dict[str, object],
    df: DataFrame,
    embedding_col: str,
    prefix: str = "pred_",
) -> DataFrame:
    """Score every per-label model, returning the input columns plus
    one ``{prefix}{label}`` prediction column per output.

    Spark shape: each model.transform is a JVM-side projection (no
    shuffle, no Python); chaining K transforms yields one narrow
    pipeline the optimizer fuses — the scoring pass over 100 TB of
    embeddings stays a single scan regardless of K.
    """
    scored = _prep_nolabel(df, embedding_col)
    base_cols = list(df.columns)
    out_cols: list[str] = []
    for lbl, model in models.items():
        m = model.copy() if hasattr(model, "copy") else model
        col = f"{prefix}{lbl}"
        try:
            m = m.setPredictionCol(col)
            # avoid column collisions between chained classifier
            # transforms
            if hasattr(m, "setProbabilityCol"):
                m = m.setProbabilityCol(f"__prob_{lbl}")
            if hasattr(m, "setRawPredictionCol"):
                m = m.setRawPredictionCol(f"__raw_{lbl}")
        except AttributeError:
            pass
        scored = m.transform(scored)
        out_cols.append(col)
    return scored.select(*base_cols, *out_cols)
