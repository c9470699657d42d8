"""Conformance queries: round-7 operator batch #2 (q219+) — max
drawdown, Cutler RSI, seasonal-naive forecast accuracy, degree
assortativity, empirical-Bayes source quality, UNPIVOT/melt.

Float-parity discipline: every recurrence/window input here is first
reduced to EXACT integers (cents via ROUND(x*100) -> BIGINT, or raw
counts) so windowed sums are bit-identical across engines — daily
revenue sums of doubles differ between Spark's running-window fold
and DuckDB's segment-tree combine at ~1e-11, which is enough to
straddle ROUND boundaries (the q200 cents pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL

# Shared daily-revenue-in-cents relation: one shuffle on
# (event_type, day); cents are exact BIGINTs from then on.
_DAILY_CENTS_SQL = """
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS cents
      FROM events GROUP BY event_type, day
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value") * 100, 0).cast("bigint").alias("cents"))


# ---------------------------------------------------------------------------
# Q219 — Maximum drawdown per series (running-peak window)
# ---------------------------------------------------------------------------
# Equity curve = prefix sum of daily cents; peak = running max;
# drawdown = peak - equity (exact integer cents, so the argmax day
# is deterministic).  The 100 TB shape: the only big shuffle is the
# daily pre-aggregation; the per-series windows run over ~days rows.
_Q219_ORACLE = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    eq AS (
      SELECT event_type, day,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS equity_c
      FROM daily
    ), dd AS (
      SELECT event_type, day, equity_c,
             MAX(equity_c) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING)
               - equity_c AS dd_c
      FROM eq
    ), ext AS (
      SELECT *,
             MAX(dd_c) OVER (PARTITION BY event_type) AS max_dd_c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day DESC) AS rn_last
      FROM dd
    )
    SELECT event_type,
           ROUND(MAX(dd_c) / 100.0 + 5e-10, 2) AS max_drawdown,
           MIN(CASE WHEN dd_c = max_dd_c THEN day END) AS trough_day,
           ROUND(MAX(equity_c) / 100.0 + 5e-10, 2) AS peak_equity,
           ROUND(MAX(CASE WHEN rn_last = 1 THEN equity_c END) / 100.0
                 + 5e-10, 2) AS final_equity
    FROM ext
    GROUP BY event_type
    ORDER BY event_type
"""


@register(
    "q219_drawdown",
    _Q219_ORACLE,
    doc="Maximum drawdown, trough day, peak and final equity per "
    "event-type series.  Prefix-sum + running-max windows over "
    "exact integer cents (daily sums rounded to the cent grid "
    "before the recurrence, so peak/trough comparisons cannot be "
    "flipped by float summation order).  One shuffle to daily "
    "grain; windows run per series.",
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    eq = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(w).alias("equity_c"),
    ).withColumn("peak_c", F.max("equity_c").over(w))
    dd = eq.withColumn("dd_c", F.col("peak_c") - F.col("equity_c"))
    wp = Window.partitionBy("event_type")
    dd = dd.withColumn("max_dd_c", F.max("dd_c").over(wp)).withColumn(
        "rn_last",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.col("day").desc())
        ),
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.round(F.max("dd_c") / 100.0 + 5e-10, 2).alias("max_drawdown"),
            F.min(
                F.when(F.col("dd_c") == F.col("max_dd_c"), F.col("day"))
            ).alias("trough_day"),
            F.round(F.max("equity_c") / 100.0 + 5e-10, 2).alias(
                "peak_equity"
            ),
            F.round(
                F.max(F.when(F.col("rn_last") == 1, F.col("equity_c")))
                / 100.0
                + 5e-10,
                2,
            ).alias("final_equity"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q220 — Cutler's RSI (14-day SMA of gains/losses)
# ---------------------------------------------------------------------------
# RSI over the daily-cents series: change = diff, then a 14-row
# trailing mean of gains and of losses (Cutler's SMA variant — the
# windowed form; Wilder's EWMA recurrence is q134's machinery).
# Gains/losses are exact integer cents, so the 14-day sums are
# exact and RS = gain/loss divides identical doubles both engines.
_Q220_N = 14

_Q220_RSI_EXPR = """CASE WHEN loss_c = 0 THEN 100.0
                 ELSE 100.0 - 100.0 /
                      (1.0 + CAST(gain_c AS DOUBLE) / loss_c) END"""

_Q220_ORACLE = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    chg AS (
      SELECT event_type, day,
             cents - LAG(cents) OVER (PARTITION BY event_type
                                      ORDER BY day) AS d_c
      FROM daily
    ), g AS (
      SELECT event_type, day,
             SUM(CASE WHEN d_c > 0 THEN d_c ELSE 0 END)
               OVER w AS gain_c,
             SUM(CASE WHEN d_c < 0 THEN -d_c ELSE 0 END)
               OVER w AS loss_c,
             COUNT(d_c) OVER w AS n_chg
      FROM chg
      WHERE d_c IS NOT NULL
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_Q220_N - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           {_R6.format(x=_Q220_RSI_EXPR)}
             AS rsi
    FROM g
    WHERE n_chg = {_Q220_N}
    ORDER BY event_type, day
"""


@register(
    "q220_rsi",
    _Q220_ORACLE,
    doc="Cutler's RSI-14 per event-type series: lag-diff of daily "
    "cents, trailing 14-row sums of gains and losses (exact "
    "integers), RSI = 100 - 100/(1+RS) only on full windows.  "
    "Daily pre-aggregation is the one big shuffle; diffs and "
    "trailing sums are per-series windows.",
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    ws = Window.partitionBy("event_type").orderBy("day")
    chg = daily.select(
        "event_type",
        "day",
        (F.col("cents") - F.lag("cents").over(ws)).alias("d_c"),
    ).where(F.col("d_c").isNotNull())
    wt = ws.rowsBetween(-(_Q220_N - 1), 0)
    g = chg.select(
        "event_type",
        "day",
        F.sum(F.when(F.col("d_c") > 0, F.col("d_c")).otherwise(0))
        .over(wt)
        .alias("gain_c"),
        F.sum(F.when(F.col("d_c") < 0, -F.col("d_c")).otherwise(0))
        .over(wt)
        .alias("loss_c"),
        F.count("d_c").over(wt).alias("n_chg"),
    ).where(F.col("n_chg") == _Q220_N)
    rsi = F.when(F.col("loss_c") == 0, F.lit(100.0)).otherwise(
        100.0
        - 100.0
        / (1.0 + F.col("gain_c").cast("double") / F.col("loss_c"))
    )
    return g.select(
        "event_type", "day", r6(rsi).alias("rsi")
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Q221 — Seasonal-naive forecast accuracy (MAE/RMSE/sMAPE/MASE)
# ---------------------------------------------------------------------------
# Backtest the lag-7 seasonal-naive forecaster on daily event
# counts: errors on days 8+, MASE scaled by the same-window naive
# lag-1 MAE.  Counts are exact integers end to end; only the final
# ratios are doubles.
_Q221_ORACLE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ), fc AS (
      SELECT event_type, day, y,
             LAG(y, 7) OVER w AS yhat,
             LAG(y, 1) OVER w AS yprev
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), e AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_eval,
             SUM(ABS(y - yhat)) AS sae,
             SUM((y - yhat) * (y - yhat)) AS sse,
             SUM(ABS(y - yhat) * 2.0 / (y + yhat)) AS ssmape,
             SUM(ABS(y - yprev)) AS snaive
      FROM fc WHERE yhat IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n_eval,
           ROUND(CAST(sae AS DOUBLE) / n_eval + 5e-12, 6) AS mae,
           ROUND(SQRT(CAST(sse AS DOUBLE) / n_eval) + 5e-12, 6) AS rmse,
           ROUND(100.0 * ssmape / n_eval + 5e-12, 6) AS smape,
           ROUND(CAST(sae AS DOUBLE) / snaive + 5e-12, 6) AS mase
    FROM e ORDER BY event_type
"""


@register(
    "q221_forecast_accuracy",
    _Q221_ORACLE,
    doc="Seasonal-naive (lag-7) backtest per event-type daily "
    "counts: MAE, RMSE, sMAPE, and MASE scaled by the lag-1 naive "
    "MAE over the same evaluation window.  Integer counts end to "
    "end; one shuffle to daily grain, per-series lag windows, "
    "tiny final aggregate.",
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    fc = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("yhat"),
        F.lag("y", 1).over(w).alias("yprev"),
    ).where(F.col("yhat").isNotNull())
    err = F.col("y") - F.col("yhat")
    e = fc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(err)).alias("sae"),
        F.sum(err * err).alias("sse"),
        F.sum(F.abs(err) * 2.0 / (F.col("y") + F.col("yhat"))).alias(
            "ssmape"
        ),
        F.sum(F.abs(F.col("y") - F.col("yprev"))).alias("snaive"),
    )
    return e.select(
        "event_type",
        "n_eval",
        F.round(
            F.col("sae").cast("double") / F.col("n_eval") + 5e-12, 6
        ).alias("mae"),
        F.round(
            F.sqrt(F.col("sse").cast("double") / F.col("n_eval")) + 5e-12,
            6,
        ).alias("rmse"),
        F.round(100.0 * F.col("ssmape") / F.col("n_eval") + 5e-12, 6).alias(
            "smape"
        ),
        F.round(
            F.col("sae").cast("double") / F.col("snaive") + 5e-12, 6
        ).alias("mase"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Q222 — Degree assortativity (Pearson over edge endpoints)
# ---------------------------------------------------------------------------
# Newman's degree-assortativity coefficient on the derived
# customer/order graph: Pearson correlation of endpoint degrees
# over the symmetrized directed edge list.  Degrees are integers,
# every moment is an exact integer sum — the coefficient divides
# identical doubles in both engines.
_Q222_MOD = 200

_Q222_EXPR = (
    "(CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "(SQRT(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * "
    " SQRT(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
)

_Q222_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT
             CAST(least(o_custkey % {_Q222_MOD},
                        o_orderkey % {_Q222_MOD}) AS BIGINT) AS a,
             CAST(greatest(o_custkey % {_Q222_MOD},
                           o_orderkey % {_Q222_MOD}) AS BIGINT) AS b
      FROM orders
      WHERE o_custkey % {_Q222_MOD} <> o_orderkey % {_Q222_MOD}
    ), sym AS (
      SELECT a AS u, b AS v FROM e
      UNION ALL
      SELECT b AS u, a AS v FROM e
    ), deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
      FROM sym GROUP BY u
    ), pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym s
      JOIN deg du ON du.node = s.u
      JOIN deg dv ON dv.node = s.v
    ), mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy,
             SUM(x * y) AS sxy
      FROM pairs
    )
    SELECT m AS n_endpoints,
           {_R6.format(x=_Q222_EXPR)} AS assortativity
    FROM mom
"""


@register(
    "q222_assortativity",
    _Q222_ORACLE,
    doc="Newman degree assortativity on the derived graph: degree "
    "table once (one groupBy), joined to both endpoints of the "
    "symmetrized edge list, Pearson from exact integer moments.  "
    "Edges and degrees shuffle on node id; the moment reduce is "
    "map-side combined to a scalar.",
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = (F.col("o_custkey") % _Q222_MOD).cast("bigint")
    b = (F.col("o_orderkey") % _Q222_MOD).cast("bigint")
    e = (
        orders.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # Referenced twice (join to both endpoints) — materialize.
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    du = deg.select(F.col("node").alias("nu"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("nv"), F.col("d").alias("y"))
    pairs = sym.join(F.broadcast(du), sym.u == du.nu).join(
        F.broadcast(dv), sym.v == dv.nv
    )
    mom = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        md * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(md * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return mom.select(
        F.col("m").alias("n_endpoints"),
        r6(num / den).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Q223 — Empirical-Bayes shrunk source quality
# ---------------------------------------------------------------------------
# Per-source "long document" rate shrunk toward the corpus rate
# with a pseudo-count prior: shrunk = (k + m*p0) / (n + m).  The
# ranking flip between raw and shrunk rates is what the estimator
# is for — small sources get pulled to the prior.  Integer counts
# + one global scalar; all divisions identical both engines.
_Q223_M = 20
_Q223_CHARS = 600

_Q223_ORACLE = f"""
    WITH per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(CASE WHEN n_chars > {_Q223_CHARS} THEN 1 END)
                  AS BIGINT) AS k_long
      FROM documents GROUP BY source
    ), gpr AS (
      SELECT CAST(SUM(k_long) AS DOUBLE) / SUM(n_docs) AS p0 FROM per_src
    )
    SELECT s.source, s.n_docs, s.k_long,
           {_R6.format(x='CAST(s.k_long AS DOUBLE) / s.n_docs')} AS raw_rate,
           {_R6.format(
               x=f'(s.k_long + {_Q223_M} * g.p0) / (s.n_docs + {_Q223_M})'
           )} AS shrunk_rate
    FROM per_src s CROSS JOIN gpr g
    ORDER BY s.source
"""


@register(
    "q223_eb_source_quality",
    _Q223_ORACLE,
    doc="Empirical-Bayes (pseudo-count) shrinkage of per-source "
    "long-document rates toward the corpus rate: "
    "(k + m*p0)/(n + m), m=20.  One aggregation to per-source "
    "integer counts, global prior as a broadcast scalar — the "
    "domain-reputation scorer for crawl curation.",
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("n_chars") > _Q223_CHARS, 1)).alias("k_long"),
    )
    per_src = per_src.localCheckpoint(eager=False)  # reused: rows + prior
    glob = per_src.agg(
        (
            F.sum("k_long").cast("double") / F.sum("n_docs")
        ).alias("p0")
    )
    return (
        per_src.crossJoin(F.broadcast(glob))
        .select(
            "source",
            "n_docs",
            "k_long",
            r6(F.col("k_long").cast("double") / F.col("n_docs")).alias(
                "raw_rate"
            ),
            r6(
                (F.col("k_long") + _Q223_M * F.col("p0"))
                / (F.col("n_docs") + _Q223_M)
            ).alias("shrunk_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Q224 — UNPIVOT / melt (wide measures -> long), profiled
# ---------------------------------------------------------------------------
# Native DataFrame.unpivot (Spark's melt) of four lineitem measures
# into (measure, value) rows, then a per-measure profile.  The
# unpivot is a zero-shuffle generate; the profile is one tiny-key
# aggregation.  Sums are rounded at cent grain (2dp inputs).
_Q224_ORACLE = """
    WITH long AS (
      SELECT measure, value FROM (
        SELECT l_quantity, l_extendedprice, l_discount, l_tax
        FROM lineitem
      ) UNPIVOT (value FOR measure IN
                 (l_quantity, l_extendedprice, l_discount, l_tax))
    )
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value) + 5e-10, 2) AS min_v,
           ROUND(MAX(value) + 5e-10, 2) AS max_v,
           ROUND(SUM(value) + 5e-10, 2) AS sum_v
    FROM long GROUP BY measure ORDER BY measure
"""


@register(
    "q224_unpivot_profile",
    _Q224_ORACLE,
    doc="Wide-to-long UNPIVOT (DataFrame.unpivot / SQL UNPIVOT) of "
    "four lineitem measures plus a per-measure profile.  The melt "
    "is a narrow generate (no shuffle); the profile aggregates on "
    "a 4-key space with map-side combine.",
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value") + 5e-10, 2).alias("min_v"),
            F.round(F.max("value") + 5e-10, 2).alias("max_v"),
            F.round(F.sum("value") + 5e-10, 2).alias("sum_v"),
        )
        .orderBy("measure")
    )
