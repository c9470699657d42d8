"""Conformance queries: cost-basis / inventory algebra + SQL-surface
batch #4 (q344+) — FIFO lot matching as interval algebra, moving-
average cost basis via merged-stream conditional windows, FIFO
remaining-inventory aging, grouped ordered string aggregation
(listagg), and time-based RANGE window frames.

FIFO is the showcase: lot matching is usually written as a recursive
per-row loop, but FIFO has a closed form — buy lots and sell demands
are both intervals on the per-user cumulative-quantity axis, and the
units sell s takes from lot l are exactly the overlap of the two
intervals.  That turns the whole computation into two window passes
and one banded self-join (equi on user, range residual on the
cumulative axis) — no recursion, no UDF, and per-user bounded pair
fan-out.  (True WAC/LIFO are genuinely recursive — the moving-average
query below states the non-depleting approximation and says so.)

All lot arithmetic is integer (quantities derive from event_id,
prices in cents), so FIFO results compare bit-for-bit across engines.

Reference anchors: the reference's eval pipelines page through
ordered per-entity event slices (cropharvest_eval.py:167 chunked
pagination) — these queries pin the per-entity ordered-window algebra
that replaces such loops at engine scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register

# Shared lot schema: integer quantity 1-5 derived from event_id,
# price in cents.  'purchase' events are buys, 'click' events sells.
_LOTS_SQL = """
  SELECT user_id, ts, event_id,
         event_id % 5 + 1 AS qty,
         CAST(ROUND(value * 100) AS BIGINT) AS price_c
  FROM events WHERE event_type = '{kind}'
"""


def _lots(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == kind)
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_id") % 5 + 1).alias("qty"),
        F.round(F.col("value") * 100).cast("bigint").alias("price_c"),
    )


def _cum(df: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("c_hi", F.sum("qty").over(w)).withColumn(
        "c_lo", F.col("c_hi") - F.col("qty")
    )


# ---------------------------------------------------------------------------
# Q344 — FIFO lot matching (interval algebra, no recursion)
# ---------------------------------------------------------------------------
_Q344_ORACLE = f"""
    WITH buys AS ({_LOTS_SQL.format(kind='purchase')}),
    sells AS ({_LOTS_SQL.format(kind='click')}),
    lots AS (
      SELECT user_id, price_c, qty,
             SUM(qty) OVER w AS b_hi, SUM(qty) OVER w - qty AS b_lo
      FROM buys WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sints AS (
      SELECT user_id, price_c, qty,
             SUM(qty) OVER w AS s_hi, SUM(qty) OVER w - qty AS s_lo
      FROM sells WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), matched AS (
      SELECT s.user_id,
             LEAST(l.b_hi, s.s_hi) - GREATEST(l.b_lo, s.s_lo) AS mq,
             l.price_c AS buy_c, s.price_c AS sell_c
      FROM sints s JOIN lots l ON l.user_id = s.user_id
       AND l.b_lo < s.s_hi AND s.s_lo < l.b_hi
    )
    SELECT user_id, CAST(SUM(mq) AS BIGINT) AS matched_qty,
           CAST(SUM(mq * buy_c) AS BIGINT) AS fifo_cost_c,
           CAST(SUM(mq * sell_c) AS BIGINT) AS proceeds_c,
           CAST(SUM(mq * (sell_c - buy_c)) AS BIGINT) AS pnl_c
    FROM matched GROUP BY user_id
    ORDER BY pnl_c DESC, user_id LIMIT 50
"""


@register(
    "q344_fifo_lots",
    _Q344_ORACLE,
    doc="FIFO realized P&L per user via the closed form: buy lots "
    "and sell demands are intervals on the per-user cumulative-"
    "quantity axis; units matched = interval overlap.  Two window "
    "passes (one shuffle each on user_id) + one user-equi join with "
    "the overlap residual — pair fan-out bounded per user, no "
    "recursion, all-integer arithmetic.  At 100 TB the join stays "
    "entity-co-partitioned; the d-squared-per-entity guard applies "
    "as in the co-purchase projection.",
)
def q344(spark: SparkSession, sf_dir: str) -> DataFrame:
    lots = _cum(_lots(spark, sf_dir, "purchase")).select(
        F.col("user_id").alias("b_user"),
        F.col("price_c").alias("buy_c"),
        F.col("c_hi").alias("b_hi"),
        F.col("c_lo").alias("b_lo"),
    )
    sints = _cum(_lots(spark, sf_dir, "click")).select(
        "user_id",
        F.col("price_c").alias("sell_c"),
        F.col("c_hi").alias("s_hi"),
        F.col("c_lo").alias("s_lo"),
    )
    mq = F.least(F.col("b_hi"), F.col("s_hi")) - F.greatest(
        F.col("b_lo"), F.col("s_lo")
    )
    return (
        sints.join(
            lots,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_lo") < F.col("s_hi"))
            & (F.col("s_lo") < F.col("b_hi")),
        )
        .withColumn("mq", mq)
        .groupBy("user_id")
        .agg(
            F.sum("mq").cast("bigint").alias("matched_qty"),
            F.sum(F.col("mq") * F.col("buy_c")).cast("bigint").alias("fifo_cost_c"),
            F.sum(F.col("mq") * F.col("sell_c")).cast("bigint").alias("proceeds_c"),
            F.sum(F.col("mq") * (F.col("sell_c") - F.col("buy_c")))
            .cast("bigint")
            .alias("pnl_c"),
        )
        .orderBy(F.col("pnl_c").desc(), "user_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Q345 — FIFO remaining-inventory aging
# ---------------------------------------------------------------------------
# The complement of Q344: units NOT yet consumed, valued at their lot
# price and bucketed by lot age.  FIFO consumption of a lot is the
# overlap of the lot interval with (0, total_sold], so remaining =
# qty - clamp(total_sold - lot_lo into [0, qty]).  One window pass +
# one broadcastable per-user scalar join.
_Q345_ORACLE = f"""
    WITH buys AS ({_LOTS_SQL.format(kind='purchase')}),
    sold AS (
      SELECT user_id, CAST(SUM(event_id % 5 + 1) AS BIGINT) AS s_tot
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), lots AS (
      SELECT user_id, ts, price_c, qty,
             SUM(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id) - qty
               AS b_lo
      FROM buys
    ), rem AS (
      SELECT l.ts,
             l.qty - LEAST(l.qty, GREATEST(0, COALESCE(s.s_tot, 0) - l.b_lo))
               AS rq,
             l.price_c
      FROM lots l LEFT JOIN sold s ON s.user_id = l.user_id
    )
    SELECT CASE WHEN ts >= TIMESTAMP '2024-01-22' THEN 'fresh'
                WHEN ts >= TIMESTAMP '2024-01-11' THEN 'mid'
                ELSE 'aged' END AS bucket,
           CAST(SUM(rq) AS BIGINT) AS units,
           CAST(SUM(rq * price_c) AS BIGINT) AS value_c
    FROM rem WHERE rq > 0
    GROUP BY bucket ORDER BY bucket
"""


@register(
    "q345_inventory_aging",
    _Q345_ORACLE,
    doc="FIFO remaining-inventory value by lot-age bucket: remaining "
    "units of a lot = lot size minus the overlap of its cumulative "
    "interval with (0, total_sold] — one user-keyed window pass, "
    "one join against the per-user sold total, 3-row rollup.  "
    "Closes the Q344 story: matched + remaining = bought, with no "
    "per-lot state machine.",
)
def q345(spark: SparkSession, sf_dir: str) -> DataFrame:
    lots = _cum(_lots(spark, sf_dir, "purchase"))
    sold = (
        _lots(spark, sf_dir, "click")
        .groupBy(F.col("user_id").alias("s_user"))
        .agg(F.sum("qty").cast("bigint").alias("s_tot"))
    )
    rq = F.col("qty") - F.least(
        F.col("qty"),
        F.greatest(F.lit(0).cast("bigint"), F.coalesce(F.col("s_tot"), F.lit(0)) - F.col("c_lo")),
    )
    bucket = (
        F.when(F.col("ts") >= "2024-01-22", "fresh")
        .when(F.col("ts") >= "2024-01-11", "mid")
        .otherwise("aged")
    )
    return (
        lots.join(sold, lots.user_id == F.col("s_user"), "left")
        .withColumn("rq", rq)
        .filter(F.col("rq") > 0)
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum("rq").cast("bigint").alias("units"),
            F.sum(F.col("rq") * F.col("price_c")).cast("bigint").alias("value_c"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Q346 — moving-average cost basis (merged-stream conditional window)
# ---------------------------------------------------------------------------
# Average buy price as-of each sell (strictly earlier events).  True
# WAC depletes the pool at every sell and is genuinely recursive;
# the moving average over ALL prior buys is the standard window-
# expressible approximation and is stated as such.  Pattern: union
# the two event kinds into one stream, window once, and let CASE
# route the accumulation — one shuffle total.
_Q346_ORACLE = f"""
    WITH buys AS ({_LOTS_SQL.format(kind='purchase')}),
    sells AS ({_LOTS_SQL.format(kind='click')}),
    merged AS (
      SELECT user_id, ts, event_id, qty, price_c, 1 AS is_buy FROM buys
      UNION ALL
      SELECT user_id, ts, event_id, qty, price_c, 0 AS is_buy FROM sells
    ), wst AS (
      SELECT user_id, event_id, qty, price_c, is_buy,
             SUM(CASE WHEN is_buy = 1 THEN qty ELSE 0 END) OVER w AS cum_bq,
             SUM(CASE WHEN is_buy = 1 THEN qty * price_c ELSE 0 END) OVER w
               AS cum_bc
      FROM merged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sells,
           CAST(SUM(CASE WHEN price_c > ROUND(cum_bc * 1.0 / cum_bq + 5e-12, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above_basis,
           ROUND(SUM(qty * (price_c - ROUND(cum_bc * 1.0 / cum_bq + 5e-12, 6)))
                 + 5e-10, 2) AS est_spread_c
    FROM wst
    WHERE is_buy = 0 AND cum_bq > 0
    GROUP BY user_id
    ORDER BY user_id
"""


@register(
    "q346_moving_avg_basis",
    _Q346_ORACLE,
    doc="Moving-average cost basis as-of each sell: one merged "
    "event stream, one user-keyed window with a strictly-prior "
    "frame, CASE-routed accumulation of the buy leg only (the "
    "q120-attribution pattern).  Documented as the non-depleting "
    "approximation — true WAC is recursive and not window-"
    "expressible.  Basis rounded to 6dp before the compare/spread "
    "so engines agree at boundaries.",
)
def q346(spark: SparkSession, sf_dir: str) -> DataFrame:
    buys = _lots(spark, sf_dir, "purchase").withColumn("is_buy", F.lit(1))
    sells = _lots(spark, sf_dir, "click").withColumn("is_buy", F.lit(0))
    merged = buys.unionByName(sells)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wst = merged.withColumn(
        "cum_bq",
        F.sum(F.when(F.col("is_buy") == 1, F.col("qty")).otherwise(0)).over(w),
    ).withColumn(
        "cum_bc",
        F.sum(
            F.when(F.col("is_buy") == 1, F.col("qty") * F.col("price_c")).otherwise(0)
        ).over(w),
    )
    basis = F.round(F.col("cum_bc") * 1.0 / F.col("cum_bq") + 5e-12, 6)
    return (
        wst.filter((F.col("is_buy") == 0) & (F.col("cum_bq") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sells"),
            F.sum(F.when(F.col("price_c") > basis, 1).otherwise(0))
            .cast("bigint")
            .alias("n_above_basis"),
            F.round(
                F.sum(F.col("qty") * (F.col("price_c") - basis)) + 5e-10, 2
            ).alias("est_spread_c"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Q347 — grouped ordered string aggregation (listagg)
# ---------------------------------------------------------------------------
# The engine surface gap: LISTAGG / string_agg with a deterministic
# ORDER BY.  Spark has no ordered string_agg aggregate — the
# equivalent plan is collect_list -> array_sort -> array_join, which
# keeps duplicates and yields the identical string.
_Q347_ORACLE = """
    SELECT l.l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           string_agg(p.p_name, ',' ORDER BY p.p_name) AS parts_csv
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1999-06-01'
      AND o.o_orderdate <  TIMESTAMP '1999-07-01'
    GROUP BY l.l_orderkey
    ORDER BY l.l_orderkey
"""


@register(
    "q347_listagg",
    _Q347_ORACLE,
    doc="LISTAGG with deterministic ORDER BY: Spark's equivalent is "
    "collect_list -> array_sort -> array_join (duplicates kept, "
    "byte-identical CSV).  The orderdate filter semi-joins the fact "
    "table before collection; part names broadcast.  Note "
    "collect_list's collection order is nondeterministic — the "
    "array_sort is what makes the aggregate well-defined, same as "
    "the ORDER BY inside string_agg.",
)
def q347(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-06-01")
        & (F.col("o_orderdate") < "1999-07-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(F.array_sort(F.collect_list("p_name")), ",").alias(
                "parts_csv"
            ),
        )
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# Q348 — time-based RANGE window frame (trailing 7 days)
# ---------------------------------------------------------------------------
# Per event: how many events and how much value the same user
# produced in the trailing 7 days INCLUDING this one.  RANGE frames
# over a physical time axis are the one window-frame family no other
# query exercises (q53/q153 use ROWS frames; q141 uses hopping
# windows).  Both engines run the frame on exact epoch microseconds.
_US_7D = 7 * 86400 * 1000000

_Q348_ORACLE = f"""
    WITH base AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us,
             CAST(ROUND(value * 100) AS BIGINT) AS val_c
      FROM events
    ), framed AS (
      SELECT event_id, user_id, ts,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
             CAST(SUM(val_c) OVER w AS BIGINT) AS val_7d_c
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN {_US_7D} PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n_7d, val_7d_c
    FROM framed
    WHERE ts >= TIMESTAMP '2024-01-28'
    ORDER BY event_id
"""


@register(
    "q348_time_range_frame",
    _Q348_ORACLE,
    doc="Trailing-7-day RANGE window frame on exact epoch "
    "microseconds — the time-based frame family (vs the ROWS "
    "frames of q53/q153).  One user-keyed window pass; the output "
    "filter keeps the final 3 days while the frame looks back over "
    "the full month (filter must NOT push below the window).  "
    "Integer cents keep the frame sums exact.",
)
def q348(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (session tz
        # is UTC, so the cast is value-preserving like DuckDB epoch_us)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("val_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_US_7D, Window.currentRow)
    )
    return (
        ev.withColumn("n_7d", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("val_7d_c", F.sum("val_c").over(w).cast("bigint"))
        .filter(F.col("ts") >= "2024-01-28")
        .select("event_id", "user_id", "n_7d", "val_7d_c")
        .orderBy("event_id")
    )
