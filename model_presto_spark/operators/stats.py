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


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    out_col: str = "weighted_median",
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total weight (lower weighted
    median — deterministic, no interpolation).

    Window algebra only: one shuffle on the group key, a running
    weight sum ordered by (value, weight), and a min over qualifying
    rows. Rows tied on (value, weight) have engine-chosen order, but
    the LOWER-median result is invariant to it: the min qualifying
    VALUE cannot change when equal values swap places. (Extensions
    that return the qualifying ROW would need a real unique-id
    tie-break.) Weighted quantiles are the piece
    Spark's ``percentile`` family lacks (it is frequency-weighted
    only via ``percentile(col, p, freq)`` with *integer* freq; this
    accepts arbitrary non-negative double weights).
    """
    from pyspark.sql import Window

    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc(), F.col(weight_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(group_col)
    cum = F.sum(weight_col).over(w_ord)
    tot = F.sum(weight_col).over(w_all)
    qual = F.when(cum * 2 >= tot, F.col(value_col))
    return (
        df.withColumn("_qual", qual)
        .groupBy(group_col)
        .agg(F.min("_qual").alias(out_col))
    )


def clamped_running_balance(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    delta_col: str,
    out_col: str = "balance",
) -> DataFrame:
    """Non-negative running balance b_t = max(0, b_{t-1} + delta_t)
    in closed form — no recursion, no UDF.

    Identity: with prefix sums P_t, the clamped recurrence equals
    ``P_t - min(0, min_{j<=t} P_j)`` — one running sum plus one
    running min over the same ordered window. The standard inventory
    /credit-ledger primitive that naive window SQL cannot express
    without recursion.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # a window function cannot nest inside another window function,
    # so materialize the prefix column before taking its running min
    prefix = F.sum(delta_col).over(w)
    df2 = df.withColumn("_prefix", prefix)
    w2 = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df2.withColumn("_runmin", F.min("_prefix").over(w2))
        .withColumn(
            out_col,
            F.col("_prefix") - F.least(F.lit(0.0), F.col("_runmin")),
        )
        .drop("_prefix", "_runmin")
    )


def theil_sen_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "ts_slope",
) -> DataFrame:
    """Per-group Theil-Sen estimator: the median of pairwise slopes
    (y_j - y_i)/(x_j - x_i) over all i<j with distinct x.

    Robust complement to ``grouped_ols`` (up to ~29% outlier
    contamination). The pair generation is an in-group self-join —
    O(n_g^2) per group by definition of the estimator, so cap the
    group size upstream (aggregate to a coarser x first, as q145
    does with daily totals). The join is co-partitioned on the group
    key: one shuffle of each side, pairs never leave their executor.
    """
    a = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).alias("_xa"),
        F.col(y_col).alias("_ya"),
    )
    b = df.select(
        F.col(group_col).alias("_g"),
        F.col(x_col).alias("_xb"),
        F.col(y_col).alias("_yb"),
    )
    pairs = a.join(b, "_g").where(F.col("_xb") > F.col("_xa"))
    slopes = pairs.select(
        "_g",
        ((F.col("_yb") - F.col("_ya")) / (F.col("_xb") - F.col("_xa"))).alias(
            "_slope"
        ),
    )
    return slopes.groupBy("_g").agg(
        F.expr("percentile(_slope, 0.5)").alias(out_col)
    ).withColumnRenamed("_g", group_col)


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    is_a_col: str,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Two-sample Mann-Whitney U with midrank ties and the
    tie-corrected normal-approximation z, per group.

    ``is_a_col`` is 1 for sample A rows, 0 for sample B. Computed on
    the per-distinct-value counts relation, never per-row ranks:
    avg_rank(v) = (#values below v) + (n_v + 1)/2 via one running
    count, so the shuffle is on (group, value) counts — the same
    counts-first discipline as the exact AUC (binary_auc above). All
    sums stay dyadic-exact until the final z division. Groups with an
    empty side are dropped (U undefined).

    Returns: group_cols + n_a, n_b, u_stat, z (unrounded doubles).
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    pv = df.groupBy(*gcols, value_col).agg(
        F.sum(F.col(is_a_col)).cast("bigint").alias("__na"),
        F.sum(1 - F.col(is_a_col)).cast("bigint").alias("__nb"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = pv.withColumn(
        "__cum", F.coalesce(F.sum("__n").over(w), F.lit(0).cast("bigint"))
    )
    agg = (
        rk.groupBy(*gcols)
        .agg(
            F.sum("__na").cast("bigint").alias("n_a"),
            F.sum("__nb").cast("bigint").alias("n_b"),
            F.sum(
                F.col("__na") * (F.col("__cum") + (F.col("__n") + 1) / 2.0)
            ).alias("__ra"),
            F.sum(
                F.col("__n").cast("double") * F.col("__n") * F.col("__n")
                - F.col("__n")
            ).alias("__tie"),
        )
        .where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    u = F.col("__ra") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    mu = F.col("n_a").cast("double") * F.col("n_b") / 2.0
    nn = F.col("n_a") + F.col("n_b")
    sigma2 = (F.col("n_a").cast("double") * F.col("n_b") / 12.0) * (
        (nn + 1) - F.col("__tie") / (nn.cast("double") * (nn - 1))
    )
    return agg.select(
        *gcols,
        "n_a",
        "n_b",
        u.alias("u_stat"),
        ((u - mu) / F.sqrt(sigma2)).alias("z"),
    )
