"""Conformance queries batch #51 (q449+) — join-order cost
enumeration, histogram CE accuracy, percentile-merge bias,
temporal Ripley's K, and stream-join state sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q449 — join-order cost enumeration with exact intermediates
# ---------------------------------------------------------------------------
# The three orders for lineitem |><| orders |><| customer, costed by
# the sum of intermediate result sizes with EXACT cardinalities:
# (L*O) first rides the FK (|L| rows), (O*C) first is smaller
# (|O| rows), and (L*C) first has no join key — a cross product
# priced arithmetically, never executed.  The cheapest-order flag is
# what a Selinger-style enumerator would pick.
_Q449_ORACLE = """
    WITH szs AS (
      SELECT (SELECT COUNT(*) FROM lineitem) AS nl,
             (SELECT COUNT(*) FROM orders) AS no,
             (SELECT COUNT(*) FROM customer) AS nc,
             (SELECT COUNT(*) FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey) AS lo,
             (SELECT COUNT(*) FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey) AS oc
    ), plans AS (
      SELECT '1_lineitem_orders_first' AS join_order, lo AS first_join_rows,
             lo AS total_cost FROM szs
      UNION ALL
      SELECT '2_orders_customer_first', oc, oc FROM szs
      UNION ALL
      SELECT '3_lineitem_customer_cross', nl * nc, nl * nc FROM szs
    )
    SELECT join_order,
           CAST(first_join_rows AS BIGINT) AS first_join_rows,
           CAST(total_cost AS BIGINT) AS total_cost,
           total_cost = (SELECT MIN(total_cost) FROM plans) AS is_best
    FROM plans ORDER BY join_order
"""


@register(
    "q449_join_order_cost",
    _Q449_ORACLE,
    doc="Selinger-style join-order costing with exact intermediate "
    "cardinalities for the L-O-C three-way join: FK order pays |L|, "
    "the dimension-first order pays |O|, and the keyless pair is a "
    "priced-not-executed cross product — the enumeration table "
    "behind the optimizer's choice (CE audits q402/q430's consumer).",
)
def q449(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    szs = (
        li.agg(F.count(F.lit(1)).alias("nl"))
        .crossJoin(o.agg(F.count(F.lit(1)).alias("no")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("nc")))
        .crossJoin(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .agg(F.count(F.lit(1)).alias("lo"))
        )
        .crossJoin(
            o.join(c, o.o_custkey == c.c_custkey)
            .agg(F.count(F.lit(1)).alias("oc"))
        )
        # one row of five statistics, referenced by three plan branches
        # + the best-cost aggregate: cut lineage so the branches don't
        # re-run the two count-joins each (plan audit: 84 scans)
        .localCheckpoint(eager=True)
    )
    plans = (
        szs.select(
            F.lit("1_lineitem_orders_first").alias("join_order"),
            F.col("lo").alias("first_join_rows"),
            F.col("lo").alias("total_cost"),
        )
        .unionAll(
            szs.select(
                F.lit("2_orders_customer_first"), F.col("oc"), F.col("oc")
            )
        )
        .unionAll(
            szs.select(
                F.lit("3_lineitem_customer_cross"),
                F.col("nl") * F.col("nc"),
                F.col("nl") * F.col("nc"),
            )
        )
    )
    best = plans.agg(F.min("total_cost").alias("mc"))
    return (
        plans.crossJoin(F.broadcast(best))
        .select(
            "join_order",
            F.col("first_join_rows").cast("bigint").alias("first_join_rows"),
            F.col("total_cost").cast("bigint").alias("total_cost"),
            (F.col("total_cost") == F.col("mc")).alias("is_best"),
        )
        .orderBy("join_order")
    )


# ---------------------------------------------------------------------------
# Q450 — histogram cardinality-estimation accuracy
# ---------------------------------------------------------------------------
# Equi-width vs equi-depth 32-bucket histograms on o_totalprice,
# both asked to estimate the same three range predicates under the
# uniform-within-bucket assumption, scored by q-error against the
# actual counts: the direct measurement of why optimizers keep
# equi-depth statistics.
_Q450_ORACLE = """
    WITH mm AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             COUNT(*) AS n
      FROM orders
    ), ew AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - lo) * 32.0 / (hi - lo))
                        AS INT), 31) AS b, COUNT(*) AS c
      FROM orders, mm GROUP BY 1
    ), fences AS (
      SELECT quantile_cont(o_totalprice,
               list_transform(generate_series(1, 31), i -> i / 32.0)) AS f
      FROM orders
    ), preds AS (
      SELECT * FROM (VALUES
        ('lt_80k',   0.0,     80000.0),
        ('mid_band', 120000.0, 180000.0),
        ('gt_280k',  280000.0, 1e9)) p(pred, plo, phi)
    ), ew_est AS (
      SELECT p.pred,
             SUM(ew.c * GREATEST(0.0, LEAST(
               (LEAST(p.phi, mm.lo + (ew.b + 1) * (mm.hi - mm.lo) / 32.0)
                - GREATEST(p.plo, mm.lo + ew.b * (mm.hi - mm.lo) / 32.0))
               / ((mm.hi - mm.lo) / 32.0), 1.0))) AS est
      FROM preds p, ew, mm GROUP BY p.pred
    ), ed_est AS (
      SELECT p.pred,
             SUM(GREATEST(0.0, LEAST(
               (LEAST(p.phi, CASE WHEN g.i = 32 THEN mm.hi
                                  ELSE f.f[g.i] END)
                - GREATEST(p.plo, CASE WHEN g.i = 1 THEN mm.lo
                                       ELSE f.f[g.i - 1] END))
               / NULLIF((CASE WHEN g.i = 32 THEN mm.hi ELSE f.f[g.i] END)
                 - (CASE WHEN g.i = 1 THEN mm.lo ELSE f.f[g.i - 1] END), 0),
               1.0)) * mm.n / 32.0) AS est
      FROM preds p, fences f, mm, generate_series(1, 32) g(i)
      GROUP BY p.pred
    ), act AS (
      SELECT p.pred, COUNT(*) FILTER (WHERE o.o_totalprice >= p.plo
                                        AND o.o_totalprice < p.phi) AS actual
      FROM preds p, orders o GROUP BY p.pred
    )
    SELECT a.pred, method,
           CAST(ROUND(est) AS BIGINT) AS est_rows,
           CAST(a.actual AS BIGINT) AS actual_rows,
           ROUND(GREATEST(est / NULLIF(a.actual, 0),
                          a.actual / NULLIF(est, 0)) + 5e-12, 6) AS q_error
    FROM (
      SELECT pred, 'equi_width' AS method, est FROM ew_est
      UNION ALL
      SELECT pred, 'equi_depth', est FROM ed_est
    ) e JOIN act a ON a.pred = e.pred
    ORDER BY a.pred, method
"""


@register(
    "q450_histogram_ce_audit",
    _Q450_ORACLE,
    doc="Equi-width vs equi-depth 32-bucket histograms estimating "
    "three range predicates under uniform-within-bucket, scored by "
    "q-error against exact counts — why optimizers keep equi-depth "
    "statistics (q429/q430's estimation-quality sibling).",
)
def q450(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    ew = (
        o.crossJoin(F.broadcast(mm))
        .groupBy(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    * 32.0
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
                F.lit(31),
            ).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fences = o.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(i / 32.0) for i in range(1, 32)])
        ).alias("f")
    )
    preds = spark.createDataFrame(
        [
            ("lt_80k", 0.0, 80000.0),
            ("mid_band", 120000.0, 180000.0),
            ("gt_280k", 280000.0, 1e9),
        ],
        "pred string, plo double, phi double",
    )
    width = (F.col("hi") - F.col("lo")) / 32.0
    blo = F.col("lo") + F.col("b") * width
    bhi = F.col("lo") + (F.col("b") + 1) * width
    ew_est = (
        # ew is the 32-bin histogram (bounded), but broadcast the
        # 3-row literal side explicitly so the build side is
        # statically bounded in the plan
        ew.crossJoin(F.broadcast(preds))
        .crossJoin(F.broadcast(mm))
        .groupBy("pred")
        .agg(
            F.sum(
                F.col("c")
                * F.greatest(
                    F.lit(0.0),
                    F.least(
                        (F.least(F.col("phi"), bhi) - F.greatest(F.col("plo"), blo))
                        / width,
                        F.lit(1.0),
                    ),
                )
            ).alias("est")
        )
        .select("pred", F.lit("equi_width").alias("method"), "est")
    )
    gi = spark.range(1, 33).select(F.col("id").cast("int").alias("i"))
    fhi = F.when(F.col("i") == 32, F.col("hi")).otherwise(
        F.element_at(F.col("f"), F.col("i"))
    )
    flo = F.when(F.col("i") == 1, F.col("lo")).otherwise(
        F.element_at(F.col("f"), F.col("i") - 1)
    )
    ed_est = (
        preds.crossJoin(F.broadcast(fences))
        .crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(gi))
        .groupBy("pred")
        .agg(
            F.sum(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        (
                            F.least(F.col("phi"), fhi)
                            - F.greatest(F.col("plo"), flo)
                        )
                        / F.nullif(fhi - flo, F.lit(0.0)),
                        F.lit(1.0),
                    ),
                )
                * F.col("n")
                / 32.0
            ).alias("est")
        )
        .select("pred", F.lit("equi_depth").alias("method"), "est")
    )
    act = (
        # 3-row literal on the BROADCAST side: preds.crossJoin(o)
        # made Spark build-right on orders — broadcasting the fact
        # table (audit-caught; catastrophic at scale)
        o.select("o_totalprice")
        .crossJoin(F.broadcast(preds))
        .groupBy("pred")
        .agg(
            F.count(
                F.when(
                    (F.col("o_totalprice") >= F.col("plo"))
                    & (F.col("o_totalprice") < F.col("phi")),
                    1,
                )
            ).alias("actual")
        )
    )
    est = ew_est.unionAll(ed_est)
    return (
        est.join(act, "pred")
        .select(
            "pred",
            "method",
            F.round("est").cast("bigint").alias("est_rows"),
            F.col("actual").cast("bigint").alias("actual_rows"),
            r6(
                F.greatest(
                    F.col("est") / F.nullif(F.col("actual").cast("double"), F.lit(0.0)),
                    F.col("actual") / F.nullif(F.col("est"), F.lit(0.0)),
                )
            ).alias("q_error"),
        )
        .orderBy("pred", "method")
    )


# ---------------------------------------------------------------------------
# Q451 — "never average percentiles" bias measurement
# ---------------------------------------------------------------------------
# Per-shard p95 of order prices averaged (the classic dashboard
# mistake) vs the pooled p95, plus the count-weighted average and
# the max-of-shards upper bound: quantiles are not mergeable, and
# this query prices the error.
_Q451_ORACLE = """
    WITH sh AS (
      SELECT o_orderkey % 32 AS shard,
             quantile_cont(o_totalprice, 0.95) AS p95,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ), pooled AS (
      SELECT quantile_cont(o_totalprice, 0.95) AS p95 FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           ROUND(AVG(sh.p95) + 5e-10, 4) AS avg_of_p95,
           ROUND(SUM(sh.p95 * sh.n) / SUM(sh.n) + 5e-10, 4)
             AS weighted_avg_p95,
           ROUND(MAX(sh.p95) + 5e-10, 4) AS max_of_p95,
           ROUND((SELECT p95 FROM pooled) + 5e-10, 4) AS pooled_p95,
           ROUND(AVG(sh.p95) - (SELECT p95 FROM pooled) + 5e-10, 4)
             AS avg_bias
    FROM sh
"""


@register(
    "q451_percentile_merge_bias",
    _Q451_ORACLE,
    doc="Quantiles are not mergeable: average / weighted-average / "
    "max of 32 per-shard p95s vs the pooled p95, with the signed "
    "bias — the dashboard-aggregation trap priced exactly "
    "(mergeable-histogram q436 is the fix).",
)
def q451(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    sh = o.groupBy((F.col("o_orderkey") % 32).alias("shard")).agg(
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )
    pooled = o.agg(F.percentile("o_totalprice", F.lit(0.95)).alias("pp95"))
    r4 = lambda c: F.round(c + F.lit(5e-10), 4)  # noqa: E731
    return sh.crossJoin(F.broadcast(pooled)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        r4(F.avg("p95")).alias("avg_of_p95"),
        r4(F.sum(F.col("p95") * F.col("n")) / F.sum("n")).alias(
            "weighted_avg_p95"
        ),
        r4(F.max("p95")).alias("max_of_p95"),
        r4(F.first("pp95")).alias("pooled_p95"),
        r4(F.avg("p95") - F.first("pp95")).alias("avg_bias"),
    )


# ---------------------------------------------------------------------------
# Q452 — temporal Ripley's K (event clustering across scales)
# ---------------------------------------------------------------------------
# Are purchase times clustered?  1-D Ripley's K at 1h/6h/24h on a
# user-sampled week of purchases: ordered-pair counts within each
# radius via a 24h-block chunked join (never all-pairs), normalized
# by T/(n(n-1)); the ratio to the CSR expectation 2t reads
# clustering directly (>1 clustered, <1 inhibited).
_Q452_ORACLE = """
    WITH pts AS (
      SELECT epoch_us(ts) AS t
      FROM events
      WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 7
        AND user_id % 5 = 0
    ), win AS (
      SELECT MAX(t) - MIN(t) AS tspan, COUNT(*) AS n FROM pts
    ), pairs AS (
      SELECT ABS(a.t - b.t) AS dt
      FROM pts a JOIN pts b
        ON b.t <> a.t AND ABS(a.t - b.t) <= 86400000000
    ), cnts AS (
      SELECT SUM(CASE WHEN dt <= 3600000000 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN dt <= 21600000000 THEN 1 ELSE 0 END) AS c6,
             SUM(CASE WHEN dt <= 86400000000 THEN 1 ELSE 0 END) AS c24
      FROM pairs
    )
    SELECT r.radius_hr,
           CAST(r.c AS BIGINT) AS pair_count,
           ROUND(win.tspan / 3.6e9 * r.c
                 / (win.n * 1.0 * (win.n - 1)) + 5e-12, 6) AS k_hr,
           ROUND(win.tspan / 3.6e9 * r.c
                 / (win.n * 1.0 * (win.n - 1))
                 / (2.0 * r.radius_hr) + 5e-12, 6) AS k_over_csr
    FROM (
      SELECT 1 AS radius_hr, c1 AS c FROM cnts
      UNION ALL SELECT 6, c6 FROM cnts
      UNION ALL SELECT 24, c24 FROM cnts
    ) r, win
    ORDER BY r.radius_hr
"""


@register(
    "q452_ripley_k",
    _Q452_ORACLE,
    doc="1-D temporal Ripley's K at 1h/6h/24h radii over a sampled "
    "purchase week: block-chunked pair counting (equi-join on 24h "
    "blocks, never all-pairs), K normalized by T/(n(n-1)) and read "
    "against the CSR expectation 2t — the scale-resolved clustering "
    "measure beside burstiness (q156) and interarrival fit (q255).",
)
def q452(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase")
        & (F.dayofmonth("ts") <= 7)
        & (F.col("user_id") % 5 == 0)
    )
    pts = ev.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("t"))
    day_us = 86400000000
    # chunk on 24h blocks; each left point probes its own and both
    # neighbor blocks so every |dt| <= 24h pair appears exactly once
    a = pts.select(
        F.col("t").alias("ta"),
        F.explode_outer(
            F.array(
                (F.col("t") / day_us).cast("bigint") - 1,
                (F.col("t") / day_us).cast("bigint"),
                (F.col("t") / day_us).cast("bigint") + 1,
            )
        ).alias("blk"),
    )
    b = pts.select(
        F.col("t").alias("tb"), (F.col("t") / day_us).cast("bigint").alias("blk")
    )
    pairs = a.join(b, "blk").filter(
        (F.col("tb") != F.col("ta"))
        & (F.abs(F.col("ta") - F.col("tb")) <= day_us)
    )
    cnts = pairs.agg(
        F.sum(
            F.when(F.abs(F.col("ta") - F.col("tb")) <= 3600000000, 1).otherwise(0)
        ).alias("c1"),
        F.sum(
            F.when(F.abs(F.col("ta") - F.col("tb")) <= 21600000000, 1).otherwise(0)
        ).alias("c6"),
        F.count(F.lit(1)).alias("c24"),
    )
    win = pts.agg(
        (F.max("t") - F.min("t")).alias("tspan"), F.count(F.lit(1)).alias("n")
    )
    radii = (
        cnts.select(F.lit(1).alias("radius_hr"), F.col("c1").alias("c"))
        .unionAll(cnts.select(F.lit(6), F.col("c6")))
        .unionAll(cnts.select(F.lit(24), F.col("c24")))
    )
    k = (
        F.col("tspan")
        / F.lit(3.6e9)
        * F.col("c")
        / (F.col("n") * 1.0 * (F.col("n") - 1))
    )
    return (
        radii.crossJoin(F.broadcast(win))
        .select(
            "radius_hr",
            F.col("c").cast("bigint").alias("pair_count"),
            r6(k).alias("k_hr"),
            r6(k / (2.0 * F.col("radius_hr"))).alias("k_over_csr"),
        )
        .orderBy("radius_hr")
    )


# ---------------------------------------------------------------------------
# Q453 — stream-join state sizing by watermark width
# ---------------------------------------------------------------------------
# A stream-stream join holding W of history buffers, at any instant,
# every event younger than W.  The endpoint sweep (+1 at arrival,
# -1 at expiry) gives the exact buffered-row curve; its max and
# time-average, plus the hottest single key's peak, are the state
# store sizing numbers for each candidate watermark (1h / 6h / 24h).
_Q453_ORACLE = """
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE EXTRACT(day FROM ts) <= 7
    ), ws AS (
      SELECT * FROM (VALUES (1, 3600000000), (6, 21600000000),
                            (24, 86400000000)) w(w_hr, w_us)
    ), pts AS (
      SELECT w.w_hr, e.t AS tt, 1 AS delta FROM ev e, ws w
      UNION ALL
      SELECT w.w_hr, e.t + w.w_us, -1 FROM ev e, ws w
    ), stp AS (
      SELECT w_hr, tt, SUM(delta) AS d FROM pts GROUP BY w_hr, tt
    ), sw AS (
      SELECT w_hr,
             SUM(d) OVER (PARTITION BY w_hr ORDER BY tt) AS conc,
             LEAD(tt) OVER (PARTITION BY w_hr ORDER BY tt) - tt AS dt
      FROM stp
    ), gstate AS (
      SELECT w_hr, MAX(conc) AS max_rows,
             SUM(conc * dt) * 1.0 / SUM(dt) AS avg_rows
      FROM sw WHERE dt IS NOT NULL GROUP BY w_hr
    ), keyed AS (
      SELECT w.w_hr, e.user_id, e.t,
             COUNT(*) OVER (PARTITION BY w.w_hr, e.user_id ORDER BY e.t
                            RANGE BETWEEN w.w_us PRECEDING AND CURRENT ROW)
               AS k
      FROM ev e, ws w
    ), hot AS (
      SELECT w_hr, MAX(k) AS max_key_rows FROM keyed GROUP BY w_hr
    )
    SELECT g.w_hr AS watermark_hr,
           CAST(g.max_rows AS BIGINT) AS max_state_rows,
           ROUND(g.avg_rows + 5e-10, 4) AS avg_state_rows,
           CAST(h.max_key_rows AS BIGINT) AS max_key_rows
    FROM gstate g JOIN hot h ON h.w_hr = g.w_hr
    ORDER BY watermark_hr
"""


@register(
    "q453_stream_state_sizing",
    _Q453_ORACLE,
    doc="Stream-stream join state sizing per candidate watermark "
    "(1h/6h/24h): exact buffered-row curve by arrival/expiry "
    "endpoint sweep (max + time-average) and the hottest key's "
    "peak via a RANGE window — the state-store planning table for "
    "streaming/pipeline.py (watermark-audit q166's capacity "
    "sibling).",
)
def q453(spark: SparkSession, sf_dir: str) -> DataFrame:
    evt = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    ev = evt.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    ws = spark.createDataFrame(
        [(1, 3600000000), (6, 21600000000), (24, 86400000000)],
        "w_hr int, w_us long",
    )
    evw = ev.crossJoin(F.broadcast(ws))
    pts = evw.select(
        "w_hr", F.col("t").alias("tt"), F.lit(1).alias("delta")
    ).unionAll(
        evw.select("w_hr", (F.col("t") + F.col("w_us")).alias("tt"), F.lit(-1))
    )
    stp = pts.groupBy("w_hr", "tt").agg(F.sum("delta").alias("d"))
    w = Window.partitionBy("w_hr").orderBy("tt")
    sw = stp.select(
        "w_hr",
        F.sum("d").over(w).alias("conc"),
        (F.lead("tt").over(w) - F.col("tt")).alias("dt"),
    )
    glob = (
        sw.filter(F.col("dt").isNotNull())
        .groupBy("w_hr")
        .agg(
            F.max("conc").alias("max_rows"),
            (F.sum(F.col("conc") * F.col("dt")) * 1.0 / F.sum("dt")).alias(
                "avg_rows"
            ),
        )
    )
    # rangeBetween needs a literal bound; do it per watermark width
    hot_parts = []
    for w_hr, w_us in [(1, 3600000000), (6, 21600000000), (24, 86400000000)]:
        kwin = (
            Window.partitionBy("user_id")
            .orderBy("t")
            .rangeBetween(-w_us, Window.currentRow)
        )
        hot_parts.append(
            ev.select(F.count(F.lit(1)).over(kwin).alias("k")).agg(
                F.lit(w_hr).alias("w_hr"), F.max("k").alias("max_key_rows")
            )
        )
    hot = hot_parts[0].unionAll(hot_parts[1]).unionAll(hot_parts[2])
    return (
        glob.join(hot, "w_hr")
        .select(
            F.col("w_hr").alias("watermark_hr"),
            F.col("max_rows").cast("bigint").alias("max_state_rows"),
            F.round(F.col("avg_rows") + F.lit(5e-10), 4).alias("avg_state_rows"),
            F.col("max_key_rows").cast("bigint").alias("max_key_rows"),
        )
        .orderBy("watermark_hr")
    )
