"""Conformance queries: analytics family #3 (q142+) — grid-DBSCAN
density clustering, categorical entropy/Gini, Bollinger bands, and
the Theil-Sen robust trend. Oracle conventions as everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL
_r6 = r6


# ---------------------------------------------------------------------------
# Q142 — grid-DBSCAN: above-average-density cells merged by adjacency
# ---------------------------------------------------------------------------
_Q142_W = 32

# coefficient choice: r+c parity must vary (2*user_id keeps qlon's
# user term even so the sum's parity follows user_id), otherwise the
# derived grid is a checkerboard with no orthogonal adjacency at all
_Q142_ORACLE = f"""
    WITH RECURSIVE pts AS (
      SELECT ((user_id * 7919 + event_id) % {_Q142_W}) AS r,
             ((event_id * 104729 + 2 * user_id) % {_Q142_W}) AS c
      FROM events
    ), cells AS (
      SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY r, c
    ), tot AS (
      SELECT SUM(n) AS t, COUNT(*) AS nc FROM cells
    ), dense AS (
      SELECT r * {_Q142_W} + c AS cell_id, r, c FROM cells
      WHERE n * (SELECT nc FROM tot) > (SELECT t FROM tot)
    ), half AS (
      SELECT d.cell_id AS a, d.cell_id + 1 AS b
      FROM dense d JOIN dense e ON e.cell_id = d.cell_id + 1
      WHERE d.c < {_Q142_W - 1}
      UNION ALL
      SELECT d.cell_id AS a, d.cell_id + {_Q142_W} AS b
      FROM dense d JOIN dense e ON e.cell_id = d.cell_id + {_Q142_W}
      WHERE d.r < {_Q142_W - 1}
    ), edges AS (
      SELECT a, b FROM half UNION ALL SELECT b AS a, a AS b FROM half
    ), walk(node, reach) AS (
      SELECT cell_id, cell_id FROM dense
      UNION
      SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a
    ), comp AS (
      SELECT node, MIN(reach) AS cluster FROM walk GROUP BY node
    ), sizes AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY cluster
    )
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY cluster_size
"""


@register(
    "q142_grid_dbscan",
    _Q142_ORACLE,
    doc="Grid-DBSCAN (operators/graph.py grid_density_clusters): "
    "quantize points to a 32x32 grid, keep above-average-density "
    "cells (exact integer threshold n*n_cells > total), merge "
    "orthogonal neighbors with connected components. Cell-id "
    "equi-joins replace any distance cross-join — the reduction "
    "that makes density clustering linear at scale; the oracle "
    "closes the same adjacency with a recursive CTE (q55 pattern).",
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.graph import grid_density_clusters

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("user_id") * 7919 + F.col("event_id")) % _Q142_W).alias("r"),
        ((F.col("event_id") * 104729 + 2 * F.col("user_id")) % _Q142_W).alias(
            "c"
        ),
    )
    cells = pts.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("nc")
    )
    dense = (
        cells.crossJoin(F.broadcast(tot))
        .where(F.col("n") * F.col("nc") > F.col("t"))
        .select("r", "c")
    )
    clusters = grid_density_clusters(dense, "r", "c", grid_w=_Q142_W)
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


# ---------------------------------------------------------------------------
# Q143 — categorical entropy + Gini impurity per user segment
# ---------------------------------------------------------------------------
_Q143_ORACLE = f"""
    WITH seg AS (
      SELECT (user_id % 10) AS segment, event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT segment, SUM(cnt) AS n FROM seg GROUP BY segment
    ), p AS (
      SELECT s.segment, CAST(s.cnt AS DOUBLE) / t.n AS p, t.n
      FROM seg s JOIN tot t ON t.segment = s.segment
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_events,
           {_R6.format(x='SUM(-p * ln(p))')} AS entropy_nats,
           {_R6.format(x='1.0 - SUM(p * p)')} AS gini
    FROM p GROUP BY segment
"""


@register(
    "q143_entropy_gini",
    _Q143_ORACLE,
    doc="Shannon entropy (nats) and Gini impurity of the event-type "
    "mix per user segment: two grouped aggregations, category "
    "probabilities never leave the executors. The mixture-diversity "
    "audit for sampling/mixing stages (complements q70 domain_mix).",
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seg = ev.groupBy(
        (F.col("user_id") % 10).alias("segment"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = seg.groupBy("segment").agg(F.sum("cnt").alias("n"))
    p = seg.join(F.broadcast(tot), "segment").select(
        "segment", (F.col("cnt").cast("double") / F.col("n")).alias("p"),
        "n",
    )
    return p.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_events"),
        _r6(F.sum(-F.col("p") * F.log(F.col("p")))).alias("entropy_nats"),
        _r6(F.lit(1.0) - F.sum(F.col("p") * F.col("p"))).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Q144 — Bollinger bands over the daily order-revenue series
# ---------------------------------------------------------------------------
_Q144_ORACLE = f"""
    WITH daily AS (
      SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1
    ), roll AS (
      SELECT day, revenue,
             AVG(revenue) OVER w AS m,
             STDDEV_SAMP(revenue) OVER w AS s,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           {_R6.format(x='revenue')} AS revenue,
           {_R6.format(x='m')} AS ma7,
           {_R6.format(x='CASE WHEN wn >= 7 AND s > 0 THEN (revenue - m) / s ELSE 0.0 END')}
             AS band_z
    FROM roll
"""


@register(
    "q144_bollinger",
    _Q144_ORACLE,
    doc="Bollinger z-score of daily revenue vs its 7-day rolling "
    "mean/std: one groupBy collapses the stream to the (tiny) daily "
    "series before any window — the global-ordered window runs on "
    "~2.4k rows, not the raw table (the pre-aggregate-then-window "
    "discipline for single-series analytics at scale).",
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    roll = daily.select(
        "day",
        "revenue",
        F.avg("revenue").over(w).alias("m"),
        F.stddev_samp("revenue").over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    return roll.select(
        "day",
        _r6(F.col("revenue")).alias("revenue"),
        _r6(F.col("m")).alias("ma7"),
        _r6(
            F.when(
                (F.col("wn") >= 7) & (F.col("s") > 0),
                (F.col("revenue") - F.col("m")) / F.col("s"),
            ).otherwise(F.lit(0.0))
        ).alias("band_z"),
    )


# ---------------------------------------------------------------------------
# Q145 — Theil-Sen robust trend of daily revenue per returnflag
# ---------------------------------------------------------------------------
_Q145_ORACLE = f"""
    WITH daily AS (
      SELECT l_returnflag,
             CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS x,
             SUM(l_extendedprice) AS y
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    ), slopes AS (
      SELECT a.l_returnflag,
             (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM daily a JOIN daily b
        ON a.l_returnflag = b.l_returnflag AND b.x > a.x
    )
    SELECT l_returnflag,
           {_R6.format(x='quantile_cont(slope, 0.5)')} AS ts_slope
    FROM slopes GROUP BY l_returnflag
"""


@register(
    "q145_theil_sen",
    _Q145_ORACLE,
    doc="Theil-Sen robust trend (median of pairwise slopes, "
    "operators/stats.py theil_sen_slope) over 1995's daily revenue "
    "per returnflag. The stream pre-aggregates to ~365 points per "
    "group BEFORE the O(n^2) pair join — the group-key-co-partitioned "
    "self-join never touches raw rows; the estimator's quadratic "
    "cost is paid on the collapsed series only.",
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.stats import theil_sen_slope

    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(
            "l_returnflag",
            F.floor(
                F.unix_timestamp("l_shipdate") / F.lit(86400)
            ).cast("bigint").alias("x"),
        )
        .agg(F.sum("l_extendedprice").alias("y"))
    )
    out = theil_sen_slope(
        daily.select("l_returnflag", F.col("x").cast("double").alias("x"), "y"),
        "l_returnflag",
        "x",
        "y",
    )
    return out.select("l_returnflag", _r6(F.col("ts_slope")).alias("ts_slope"))
