"""Distributed statistical-modeling operators.

- ``grouped_ols``: closed-form simple linear regression per group
  from first/second moments — one aggregation, no iterations.
- ``covariance_matrix`` / ``correlation_matrix``: long-form pairwise
  moments over an embedding column's dimensions.
- ``pca_project``: covariance -> driver-side eigendecomposition of
  the (dim x dim) matrix -> projection/whitening as closed-form
  expressions. The d x d eigen problem is O(d^3) on the driver for
  d <= a few thousand — the matrix, not the data, crosses the
  driver boundary (same contract as IVF's k centroids).

Scale shapes: moments are map-side-combinable aggregations; the
pairwise dimension join is co-partitioned on the row id and costs
O(n * d^2) arithmetic — inherent to covariance, not a plan artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple OLS y = a + b*x from moment sums:
    one aggregation computing n, Σx, Σy, Σxy, Σx², Σy², then

        b  = (n Σxy − Σx Σy) / (n Σx² − (Σx)²)
        a  = (Σy − b Σx) / n
        r² = (n Σxy − Σx Σy)² / ((n Σx² − (Σx)²)(n Σy² − (Σy)²))

    Output: (group, n, slope, intercept, r2); groups with zero x
    variance yield null slope/intercept/r2. Identical expression
    trees in the oracle give cross-engine float parity.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    dx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    dy = m["n"] * m["syy"] - m["sy"] * m["sy"]
    num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    slope = F.when(dx != 0.0, num / dx)
    return m.select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        F.when(dx != 0.0, (m["sy"] - (num / dx) * m["sx"]) / m["n"]).alias(
            "intercept"
        ),
        F.when((dx != 0.0) & (dy != 0.0), num * num / (dx * dy)).alias("r2"),
    )


def _long_form(df: DataFrame, id_col: str, vec_col: str, dims: int) -> DataFrame:
    from model_presto_spark.functions.vectors import as_double

    return df.select(
        F.col(id_col).alias("__rid"),
        F.posexplode(F.slice(as_double(F.col(vec_col)), 1, dims)).alias(
            "d", "x"
        ),
    )


def covariance_matrix(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    sample: bool = True,
) -> DataFrame:
    """Pairwise covariance of the first ``dims`` vector dimensions,
    long form: (i, j, cov) for all i, j (0-based). The pair stream
    is a co-partitioned self-join on the row id (O(n·d²) rows —
    covariance's inherent cost); means come from the same long-form
    relation. ``sample=True`` divides by n-1.
    """
    long = _long_form(df, id_col, vec_col, dims).persist()
    a = long.select("__rid", F.col("d").alias("i"), F.col("x").alias("xi"))
    b = long.select("__rid", F.col("d").alias("j"), F.col("x").alias("xj"))
    prod = (
        a.join(b, "__rid")
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("xi").alias("si"),
            F.sum("xj").alias("sj"),
            F.sum(F.col("xi") * F.col("xj")).alias("sij"),
        )
    )
    denom = F.col("n") - 1.0 if sample else F.col("n")
    return prod.select(
        "i",
        "j",
        (
            (F.col("sij") - F.col("si") * F.col("sj") / F.col("n")) / denom
        ).alias("cov"),
    )


def correlation_matrix(
    df: DataFrame, id_col: str, vec_col: str, dims: int
) -> DataFrame:
    """Pearson correlations from the covariance relation: cov(i,j) /
    sqrt(cov(i,i) cov(j,j)) — one extra self-join on the (tiny,
    d²-sized) covariance relation."""
    cov = covariance_matrix(df, id_col, vec_col, dims).persist()
    diag = cov.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("k"), F.col("cov").alias("var")
    )
    di = diag.select(F.col("k").alias("i"), F.col("var").alias("vi"))
    dj = diag.select(F.col("k").alias("j"), F.col("var").alias("vj"))
    return (
        cov.join(di, "i")
        .join(dj, "j")
        .select(
            "i",
            "j",
            F.when(
                (F.col("vi") > 0) & (F.col("vj") > 0),
                F.col("cov") / F.sqrt(F.col("vi") * F.col("vj")),
            ).alias("corr"),
        )
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    k: int = 2,
    whiten: bool = False,
) -> DataFrame:
    """Project vectors onto the top-k principal components.

    The (dims x dims) covariance collects to the driver (d² scalars
    — the model, not the data), numpy's symmetric eigensolver orders
    components by descending eigenvalue (sign fixed: largest-|.|
    loading made positive for determinism), and the projection is a
    closed-form dot-product expression per component over the
    mean-centered vector. ``whiten=True`` divides each component by
    sqrt(eigenvalue). Output: (id, pc array<double> length k).
    """
    import numpy as np

    cov_rows = covariance_matrix(df, id_col, vec_col, dims).collect()
    C = np.zeros((dims, dims))
    for r in cov_rows:
        C[r["i"], r["j"]] = r["cov"]
    means_row = (
        _long_form(df, id_col, vec_col, dims)
        .groupBy("d")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    mu = np.zeros(dims)
    for r in means_row:
        mu[r["d"]] = r["m"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps, evs = [], []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
        evs.append(max(float(vals[idx]), 0.0))
    from model_presto_spark.functions.vectors import as_double

    vec = as_double(F.col(vec_col))
    pcs = []
    for ci, v in enumerate(comps):
        terms = F.aggregate(
            F.zip_with(
                F.slice(vec, 1, dims),
                F.array(*[F.lit(float(x)) for x in v]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        centered = terms - F.lit(float(np.dot(mu, v)))
        if whiten and evs[ci] > 0:
            centered = centered / F.lit(float(np.sqrt(evs[ci])))
        pcs.append(centered)
    return df.select(
        F.col(id_col), F.array(*pcs).alias("pc")
    )
