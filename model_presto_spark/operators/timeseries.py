"""Calendar-window composites and fixed-length series operators.

The reference's temporal core: per-month composites with a constant
fallback for empty months (reference: src/optimization.py:127-147
``ee.Algorithms.If(size>0, median, constant(-1))``; month loop at
src/crop_mapping_processing_data_collection_monthly.py:722-733),
fixed 12-step windows clipped from a longer series
(presto-tolbi/presto/dataops/dataset.py:280-287), edge-padding to
length (presto-tolbi/presto/dataops/pipelines/dynamicworld.py:14-29
``pad_array``), and cyclic month indexing
(presto-tolbi/presto/presto.py:197-215).

Spark-first shape: the month spine is a tiny generated dimension
(one row per month) cross-joined to the key dimension and
left-joined to the aggregated facts — the fallback becomes
``coalesce(agg, lit(fill))``. Catalyst broadcasts the spine; the
only shuffle is the fact aggregation itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_AGGS = {
    "mean": F.avg,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
}


def month_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per calendar month in [start, end] (inclusive),
    column ``month_start`` (date). Generated, not scanned — a
    broadcast-sized dimension exactly like the reference's month
    loop bounds (.._monthly.py:722-733)."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )


def monthly_composite(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    agg: str = "median",
    fill: float = -1.0,
    spine_start: str | None = None,
    spine_end: str | None = None,
) -> DataFrame:
    """Per-(key, month) composite with constant fallback for months
    with no observations (P21/A1/W1).

    Returns one row per key x month with ``month_start`` and
    ``composite`` columns; months absent from the data get ``fill``
    (the reference's constant(-1) image). If spine bounds are not
    given, the observed [min, max] month range is used.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    spark = df.sparkSession
    month = F.date_trunc("month", F.col(ts_col)).cast("date").alias("month_start")
    facts = (
        df.select(*keys, month, F.col(value_col).alias("__v"))
        .groupBy(*keys, "month_start")
        .agg(_AGGS[agg](F.col("__v")).alias("__agg"))
    )
    if spine_start is None or spine_end is None:
        bounds = df.select(
            F.min(F.date_trunc("month", F.col(ts_col)).cast("date")).alias("lo"),
            F.max(F.date_trunc("month", F.col(ts_col)).cast("date")).alias("hi"),
        ).collect()[0]
        spine_start, spine_end = str(bounds["lo"]), str(bounds["hi"])
    spine = month_spine(spark, spine_start, spine_end)
    key_dim = df.select(*keys).distinct()
    grid = key_dim.crossJoin(F.broadcast(spine))
    return grid.join(facts, [*keys, "month_start"], "left").select(
        *keys,
        "month_start",
        F.coalesce(F.col("__agg"), F.lit(float(fill))).alias("composite"),
    )


def pad_series(arr: Column, length: int) -> Column:
    """Edge-pad (repeat last element) then truncate to fixed length
    (reference ``pad_array``, dynamicworld.py:14-29). Empty arrays
    stay empty (nothing to repeat)."""
    padded = F.when(
        F.size(arr) >= length, arr
    ).otherwise(
        F.concat(
            arr,
            F.array_repeat(
                F.element_at(arr, -1), F.lit(length) - F.size(arr)
            ),
        )
    )
    return F.when(F.size(arr) == 0, arr).otherwise(F.slice(padded, 1, length))


def clip_window(arr: Column, start: int, length: int) -> Column:
    """Fixed-length window starting at 1-based ``start`` (reference
    12-step clip, dataset.py:280-287)."""
    return F.slice(arr, start, length)


def cyclic_month(start_month: Column, pos: Column) -> Column:
    """0-based month index cycled mod 12 (reference month_to_tensor,
    presto.py:197-215 ``fmod(arange(m, m+seq), 12)``)."""
    return F.pmod(start_month + pos, F.lit(12))


def stride_sample(df: DataFrame, row_col: str, col_col: str, every: int) -> DataFrame:
    """Systematic grid subsampling — every Nth row/col (reference
    SAMPLE_EVERY=10, ee_pipeline.py:18,34-47). A pushdown-friendly
    filter, applied before any wide op."""
    return df.filter(
        (F.pmod(F.col(row_col), F.lit(every)) == 0)
        & (F.pmod(F.col(col_col), F.lit(every)) == 0)
    )


def patch_pool(
    df: DataFrame,
    i_col: str,
    j_col: str,
    value_col: str,
    patch: int,
    agg: str = "mean",
) -> DataFrame:
    """Mean (or other) pooling over p x p spatial patches (reference
    resize_and_average_arrays, eval.py:393-404). groupBy on the
    quantized grid key — one shuffle, map-side partial aggs."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    return (
        df.groupBy(
            F.floor(F.col(i_col) / patch).alias("patch_i"),
            F.floor(F.col(j_col) / patch).alias("patch_j"),
        )
        .agg(_AGGS[agg](F.col(value_col)).alias("pooled"))
    )


def interpolate_series(
    df: DataFrame, entity_col: str, idx_col: str, value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear gap-fill of a row-form series: null ``value_col`` rows
    get ``prev + (next - prev) * (idx - prev_idx) / (next_idx -
    prev_idx)`` from the nearest non-null neighbors within the
    entity; leading/trailing gaps take the nearest available value
    (ffill/bfill). ``idx_col`` must be numeric (day index, epoch...).

    One shuffle on the entity key; the four neighbor lookups are
    IGNORE NULLS window functions over the same sort, so Catalyst
    evaluates them in a single Window stage per direction — the
    standard scale-out gap-fill (no per-entity collect, no UDF).
    Pair with a spine join (month_spine / a generate_series cross
    join) to materialize the missing rows first."""
    out = out_col or value_col
    v, i = F.col(value_col), F.col(idx_col)
    w = Window.partitionBy(entity_col).orderBy(idx_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    # Forward carries as a GROWING frame on the reversed order: Spark
    # evaluates (0, unboundedFollowing) frames by rescanning to the
    # partition end for every row — O(series²) per entity — while
    # (unboundedPreceding, 0) frames update incrementally. "Next
    # non-null at or after idx" == "last non-null at or before idx in
    # descending idx order" (callers pass one row per (entity, idx)).
    fwd = Window.partitionBy(entity_col).orderBy(F.desc(idx_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_i = F.last(F.when(v.isNotNull(), i), ignorenulls=True).over(back)
    next_v = F.last(v, ignorenulls=True).over(fwd)
    next_i = F.last(F.when(v.isNotNull(), i), ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (i - prev_i) / (next_i - prev_i)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNotNull() & next_v.isNotNull(), interp)
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return df.withColumn(out, filled)


def rolling_zscore(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 10,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window anomaly score: how far each point sits from
    its OWN recent history.

    The baseline is the ``window`` rows strictly BEFORE the current
    one (the point never launders itself into its baseline), so the
    operator is streaming-compatible. One Window stage per entity
    key — a single shuffle on ``entity_col``; mean/stddev/count all
    share the frame. ``z`` is null until ``min_periods`` history
    exists or when the baseline is constant (stddev 0).

    Adds: rolling_mean, rolling_std, z, is_anomaly (|z|>=threshold).
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col)
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    cnt = F.count(v).over(w)
    z = F.when((cnt >= min_periods) & (sd > 0), (v - mean) / sd)
    return (
        df.withColumn("rolling_mean", mean)
        .withColumn("rolling_std", sd)
        .withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.when(F.col("z").isNotNull(), F.abs(F.col("z")) >= threshold)
            .otherwise(F.lit(False)),
        )
    )


def ewma(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average, exact (pandas
    ``ewm(adjust=True)`` semantics), as pure window algebra.

    The recurrence y_t = (sum_i (1-a)^(t-i) x_i) / (sum_i (1-a)^(t-i))
    factors through s_t = sum_i x_i * (1-a)^(-i): two running-sum
    windows over u_i = x_i * (1-a)^(-i) and the weight stream, scaled
    back by (1-a)^t. One shuffle on the entity key, no UDF.

    Numerical bound: (1-a)^(-i) overflows double once
    ``i * ln(1/(1-a)) > ~709`` — e.g. ~2000 points per entity at
    a=0.3, ~6700 at a=0.1. Within the bound the computation is exact;
    for longer series, window the series (or lower a) — the factor
    is re-based per partition window, not global.
    """
    beta = 1.0 - alpha
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # 0-based position within the series
    pos = F.row_number().over(w) - 1
    inv = F.pow(F.lit(beta), -pos.cast("double"))
    u = F.col(value_col) * inv
    num = F.sum(u).over(run)
    den = F.sum(inv).over(run)
    back = F.pow(F.lit(beta), pos.cast("double"))
    # (num * back) / (den * back) == weighted mean with weights
    # (1-a)^(t-i); multiplying both by back keeps magnitudes tame
    return df.withColumn(out_col, (num * back) / (den * back))


def mad_outliers(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-entity outlier flags via the median absolute
    deviation (Iglewicz-Hoberg modified z-score).

    Unlike mean/stddev (rolling_zscore), the MAD baseline is immune
    to the outliers it is hunting — a handful of extreme points
    cannot drag the center or inflate the spread. Two grouped exact
    medians (one shuffle each on the entity key; Catalyst computes
    ``percentile`` as a typed aggregate, no collect), broadcast back
    by entity. ``modified_z = 0.6745 * (x - median) / mad``; mad==0
    (constant majority) yields null z and no flag.

    Adds: med, mad, modified_z, is_outlier.
    """
    from pyspark import StorageLevel

    med = df.groupBy(entity_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    # with_med feeds two branches (the MAD aggregation and the final
    # join-back) — persist so the source scan + median join run once
    with_med = df.join(med, entity_col).persist(StorageLevel.MEMORY_AND_DISK)
    mad = with_med.groupBy(entity_col).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad")
    )
    out = with_med.join(mad, entity_col)
    z = F.when(
        F.col("mad") > 0,
        0.6745 * (F.col(value_col) - F.col("med")) / F.col("mad"),
    )
    return out.withColumn("modified_z", z).withColumn(
        "is_outlier",
        F.coalesce(F.abs(z) >= threshold, F.lit(False)),
    )


def cusum(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
) -> DataFrame:
    """One-sided CUSUM drift detection as pure window algebra.

    The textbook recurrence ``S_t = max(0, S_{t-1} + (x_t - target -
    slack))`` looks inherently sequential, but has the closed form
    ``S_t = A_t - min(A_0..A_t)`` where ``A`` is the running sum of
    the deviations — so upward AND downward statistics are four
    running-window aggregates sharing one sort: a single shuffle per
    entity key, no UDF, no recursion.

    Adds: cusum_up, cusum_down (both >= 0), drift (|either| >=
    threshold). ``target`` is the in-control mean; ``slack`` the
    half-dead-band k.
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    dev_up = F.col(value_col) - F.lit(target + slack)
    dev_dn = F.lit(target - slack) - F.col(value_col)
    a_up = F.sum(dev_up).over(run)
    a_dn = F.sum(dev_dn).over(run)
    # min over A including a virtual A_0 = 0 start (clamp at zero)
    s_up = a_up - F.least(F.min(a_up).over(run), F.lit(0.0))
    s_dn = a_dn - F.least(F.min(a_dn).over(run), F.lit(0.0))
    return (
        df.withColumn("cusum_up", s_up)
        .withColumn("cusum_down", s_dn)
        .withColumn(
            "drift",
            (F.col("cusum_up") >= threshold)
            | (F.col("cusum_down") >= threshold),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal decomposition (STL-lite, the moving-average
    classical method): per series key,

      trend(t)    = centered moving average over ``period`` points
                    (null where the window is incomplete — the
                    standard edge behavior)
      seasonal(p) = mean of (value - trend) per phase p = position
                    mod period, re-centered to sum to zero
      residual    = value - trend - seasonal

    Two windows over the key-partitioned series + one tiny
    (key, phase) aggregation joined back — one shuffle of the series
    plus a phase-sized broadcast. Even periods use the standard
    2x(period) centered average (half-weight endpoints).

    Output: (key, t, value, phase, trend, seasonal, residual).
    """
    w = Window.partitionBy(key_col).orderBy(t_col)
    half = period // 2
    if period % 2 == 1:
        trend = F.avg(F.col(value_col)).over(w.rowsBetween(-half, half))
        cnt = F.count(F.col(value_col)).over(w.rowsBetween(-half, half))
        trend = F.when(cnt == period, trend)
    else:
        # 2xMA: average of the two length-`period` windows offset by
        # one — equals half-weighting the two endpoints
        t1 = F.sum(F.col(value_col)).over(w.rowsBetween(-half, half - 1))
        c1 = F.count(F.col(value_col)).over(w.rowsBetween(-half, half - 1))
        t2 = F.sum(F.col(value_col)).over(w.rowsBetween(-half + 1, half))
        c2 = F.count(F.col(value_col)).over(w.rowsBetween(-half + 1, half))
        trend = F.when(
            (c1 == period) & (c2 == period),
            (t1 + t2) / F.lit(2.0 * period),
        )
    pos = F.row_number().over(w) - 1
    staged = df.select(
        key_col,
        t_col,
        F.col(value_col).cast("double").alias("value"),
        F.pmod(pos, F.lit(period)).cast("int").alias("phase"),
        trend.alias("trend"),
    )
    phase_means = staged.groupBy(key_col, "phase").agg(
        F.avg(F.col("value") - F.col("trend")).alias("pm")
    )
    centering = phase_means.groupBy(key_col).agg(
        F.avg("pm").alias("pm_mean")
    )
    seasonal = (
        phase_means.join(centering, key_col)
        .select(
            key_col,
            "phase",
            (F.col("pm") - F.col("pm_mean")).alias("seasonal"),
        )
    )
    return (
        staged.join(F.broadcast(seasonal), [key_col, "phase"])
        .select(
            key_col,
            t_col,
            "value",
            "phase",
            "trend",
            "seasonal",
            (F.col("value") - F.col("trend") - F.col("seasonal")).alias(
                "residual"
            ),
        )
    )


def holt_winters(
    ys: Column,
    period: int,
    alpha: float,
    beta: float,
    gamma: float,
) -> Column:
    """Additive Holt-Winters fold over an ordered series array.

    ``ys`` must be an array<double> of at least ``2 * period + 1``
    points, already reduced to an exact grid (e.g. cent-rounded) so
    the sequential fold is bit-identical across engines.  Classic
    deterministic initialization: level = mean of the first season,
    trend = (mean of season 2 - mean of season 1) / period, seasonal
    indices = first-season deviations from the level.  The fold then
    replays t = period+1..n with the one-step-ahead SSE accumulated
    pre-update.

    Returns a struct column ``(l, b, s: array<double>, sse)`` where
    ``s`` is rotated so ``s[1]`` is always the NEXT time step's
    seasonal index (so the one-step forecast is ``l + b + s[1]``).

    Scale shape: the recurrence is sequential in t by nature, but t
    is the bounded calendar axis — the distributed work is the
    upstream aggregation that produced ``ys``; this fold is O(n)
    per series inside one projection (no shuffle, no UDF).
    """
    p = period
    a, g, d = F.lit(float(alpha)), F.lit(float(beta)), F.lit(float(gamma))

    def _mean_of(sl: Column) -> Column:
        return (
            F.aggregate(sl, F.lit(0.0), lambda acc, x: acc + x) / float(p)
        )

    m1 = _mean_of(F.slice(ys, 1, p))
    m2 = _mean_of(F.slice(ys, p + 1, p))
    l0 = m1
    b0 = (m2 - m1) / float(p)
    s0 = F.transform(F.slice(ys, 1, p), lambda y: y - m1)
    init = F.struct(
        l0.alias("l"), b0.alias("b"), s0.alias("s"), F.lit(0.0).alias("sse")
    )

    def _merge(acc: Column, y: Column) -> Column:
        s_old = F.element_at(acc["s"], 1)
        lb = acc["l"] + acc["b"]
        l_new = a * (y - s_old) + (F.lit(1.0) - a) * lb
        b_new = (
            g * ((a * (y - s_old) + (F.lit(1.0) - a) * lb) - acc["l"])
            + (F.lit(1.0) - g) * acc["b"]
        )
        s_new = (
            d * (y - (a * (y - s_old) + (F.lit(1.0) - a) * lb))
            + (F.lit(1.0) - d) * s_old
        )
        err = y - (lb + s_old)
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                F.slice(acc["s"], 2, p - 1), F.array(s_new)
            ).alias("s"),
            (acc["sse"] + err * err).alias("sse"),
        )

    return F.aggregate(
        F.slice(ys, p + 1, F.size(ys) - p), init, _merge
    )
