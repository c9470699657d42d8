"""Conformance queries batch #77 (q579+) — EDF schedulability, promo
pull-forward, Otsu thresholding, Weisfeiler-Leman refinement, and
Katz centrality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q579 — earliest-deadline-first replay with measured lateness
# ---------------------------------------------------------------------------
# User-day spans become jobs (release = span start, deadline = span
# end, service = one second per event); EDF processes them in
# deadline order and the fold tracks the machine clock against each
# deadline — max and mean lateness plus the utilization bound (the
# real-time scheduling view beside interval scheduling q542/q555 and
# the Lindley queue q538).
_Q579_ORACLE = """
    WITH jobs AS MATERIALIZED (
      SELECT MIN(epoch_us(ts)) // 1000000 AS r,
             MAX(epoch_us(ts)) // 1000000 AS dl,
             CAST(COUNT(*) AS BIGINT) AS svc
      FROM events WHERE EXTRACT(day FROM ts) <= 3 AND user_id % 5 = 0
      GROUP BY user_id, EXTRACT(day FROM ts)
      HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
    ), ser AS (
      SELECT list([r, dl, svc] ORDER BY dl, r, svc) AS xs,
             COUNT(*) AS n, SUM(svc) AS total_svc,
             MAX(dl) - MIN(r) AS span
      FROM jobs
    ), sim AS (
      SELECT n, total_svc, span,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT), 0, 0, 0], xs),
          (st, x) -> [
            GREATEST(st[1], x[1]) + x[3],
            st[2] + GREATEST(GREATEST(st[1], x[1]) + x[3] - x[2],
                             CAST(0 AS BIGINT)),
            GREATEST(st[3], GREATEST(st[1], x[1]) + x[3] - x[2]),
            st[4] + CASE WHEN GREATEST(st[1], x[1]) + x[3] > x[2]
                         THEN 1 ELSE 0 END
          ]
        ) AS st
      FROM ser
    )
    SELECT CAST(n AS BIGINT) AS n_jobs,
           ROUND(total_svc * 1.0 / span + 5e-12, 6) AS utilization,
           CAST(st[4] AS BIGINT) AS n_late,
           ROUND(st[2] * 1.0 / n + 5e-10, 4) AS mean_lateness_s,
           CAST(st[3] AS BIGINT) AS max_lateness_s
    FROM sim
"""


@register(
    "q579_edf_lateness",
    _Q579_ORACLE,
    doc="Earliest-deadline-first replay: user-day jobs (release, "
    "deadline, one second of service per event) processed in "
    "deadline order by a clock-carrying fold — tardy count, mean "
    "and max lateness against the utilization bound — real-time "
    "scheduling beside interval selection (q542/q555) and Lindley "
    "waits (q538).",
)
def q579(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.dayofmonth("ts") <= 3) & (F.col("user_id") % 5 == 0)
    )
    t = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000)
    jobs = (
        ev.groupBy("user_id", F.dayofmonth("ts").alias("dy"))
        .agg(
            F.min(t).alias("r"),
            F.max(t).alias("dl"),
            F.count(F.lit(1)).cast("bigint").alias("svc"),
        )
        .filter(F.col("r") < F.col("dl"))
    )
    ser = jobs.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dl", "r", "svc"))),
            lambda s: F.array(s.r, s.dl, s.svc),
        ).alias("xs"),
        F.count(F.lit(1)).alias("n"),
        F.sum("svc").alias("total_svc"),
        (F.max("dl") - F.min("r")).alias("span"),
    )
    zero = F.lit(0).cast("bigint")

    def step(st, x):
        start = F.greatest(F.element_at(st, 1), F.element_at(x, 1))
        fin = start + F.element_at(x, 3)
        late = fin - F.element_at(x, 2)
        return F.array(
            fin,
            F.element_at(st, 2) + F.greatest(late, zero),
            F.greatest(F.element_at(st, 3), late),
            F.element_at(st, 4) + F.when(late > 0, 1).otherwise(0),
        )

    sim = ser.select(
        "n",
        "total_svc",
        "span",
        F.aggregate(F.col("xs"), F.array(zero, zero, zero, zero), step).alias(
            "st"
        ),
    )
    return sim.select(
        F.col("n").cast("bigint").alias("n_jobs"),
        r6(F.col("total_svc") * 1.0 / F.col("span")).alias("utilization"),
        F.element_at("st", 4).cast("bigint").alias("n_late"),
        F.round(
            F.element_at("st", 2) * 1.0 / F.col("n") + F.lit(5e-10), 4
        ).alias("mean_lateness_s"),
        F.element_at("st", 3).cast("bigint").alias("max_lateness_s"),
    )


# ---------------------------------------------------------------------------
# Q580 — promo pull-forward (the post-spike dip)
# ---------------------------------------------------------------------------
# After each top-decile revenue day, the next three days' average is
# compared against the non-adjacent baseline: the dip quantifies how
# much of a spike is demand borrowed from the future rather than
# created — the pantry-loading correction every promo lift estimate
# (q407/q384) needs.
_Q580_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), thr AS (
      SELECT quantile_cont(v, 0.9) AS q90 FROM daily
    ), spikes AS MATERIALIZED (
      SELECT d FROM daily, thr WHERE v >= q90
    ), post AS (
      SELECT DISTINCT dd.d
      FROM spikes s
      JOIN daily dd ON dd.d BETWEEN s.d + 1 AND s.d + 3
      WHERE NOT EXISTS (SELECT 1 FROM spikes s2 WHERE s2.d = dd.d)
    ), base AS (
      SELECT dd.d, dd.v FROM daily dd
      WHERE NOT EXISTS (SELECT 1 FROM spikes s WHERE s.d = dd.d)
        AND NOT EXISTS (SELECT 1 FROM post p WHERE p.d = dd.d)
    )
    SELECT CAST((SELECT COUNT(*) FROM spikes) AS BIGINT) AS n_spike_days,
           CAST((SELECT COUNT(*) FROM post) AS BIGINT) AS n_post_days,
           ROUND((SELECT AVG(v) FROM daily dd
                  JOIN post p ON p.d = dd.d) / 100.0 + 5e-8, 2)
             AS post_spike_avg_usd,
           ROUND((SELECT AVG(v) FROM base) / 100.0 + 5e-8, 2)
             AS baseline_avg_usd,
           ROUND(((SELECT AVG(v) FROM daily dd JOIN post p ON p.d = dd.d)
                  - (SELECT AVG(v) FROM base))
                 / (SELECT AVG(v) FROM base) + 5e-12, 6)
             AS pull_forward_dip
"""


@register(
    "q580_pull_forward",
    _Q580_ORACLE,
    doc="Promo pull-forward: average revenue in the three days after "
    "each top-decile spike vs the non-adjacent baseline — the "
    "post-spike dip that says how much promo lift (q407/q384) is "
    "borrowed demand rather than created demand.",
)
def q580(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("v")
        # lineage cut: daily feeds threshold/spike/post/base branches
        # (plan audit: 22 scans with persist-only lineage)
    ).localCheckpoint(eager=False)
    thr = daily.agg(F.percentile("v", F.lit(0.9)).alias("q90"))
    spikes = daily.crossJoin(F.broadcast(thr)).filter(
        F.col("v") >= F.col("q90")
    ).select("d").localCheckpoint(eager=False)
    sp2 = spikes.select(F.col("d").alias("sd"))
    post = (
        sp2.crossJoin(daily.select(F.col("d").alias("dd")))
        .filter(F.col("dd").between(F.col("sd") + 1, F.col("sd") + 3))
        .select(F.col("dd").alias("d"))
        .distinct()
        .join(spikes, "d", "left_anti")
        .localCheckpoint(eager=False)
    )
    base = daily.join(spikes, "d", "left_anti").join(post, "d", "left_anti")
    post_avg = daily.join(post, "d").agg(F.avg("v").alias("pa"))
    base_avg = base.agg(F.avg("v").alias("ba"))
    ns = spikes.agg(F.count(F.lit(1)).alias("n_spikes"))
    np_ = post.agg(F.count(F.lit(1)).alias("n_post"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        ns.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(post_avg))
        .crossJoin(F.broadcast(base_avg))
        .select(
            F.col("n_spikes").cast("bigint").alias("n_spike_days"),
            F.col("n_post").cast("bigint").alias("n_post_days"),
            r2(F.col("pa") / 100.0).alias("post_spike_avg_usd"),
            r2(F.col("ba") / 100.0).alias("baseline_avg_usd"),
            r6((F.col("pa") - F.col("ba")) / F.col("ba")).alias(
                "pull_forward_dip"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q581 — Otsu's threshold on the value distribution
# ---------------------------------------------------------------------------
# The image-binarization classic pointed at event values: 64-bin
# histogram, between-class variance w0 w1 (mu0 - mu1)^2 maximized
# over cut points via cumulative sums — the automatic high/low
# threshold with its variance curve context (the 1-D clustering
# answer beside Lloyd q268 and best-split q249).
_Q581_ORACLE = """
    WITH mm AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
      WHERE value IS NOT NULL
    ), h AS MATERIALIZED (
      SELECT LEAST(CAST(FLOOR((value - lo) * 64.0 / (hi - lo)) AS INT),
                   63) AS b,
             COUNT(*) AS c
      FROM events, mm WHERE value IS NOT NULL GROUP BY 1
    ), cum AS (
      SELECT b, c,
             SUM(c) OVER (ORDER BY b) AS cw,
             SUM(c * (b + 0.5)) OVER (ORDER BY b) AS cm,
             (SELECT SUM(c) FROM h) AS n,
             (SELECT SUM(c * (b + 0.5)) FROM h) AS tm
      FROM h
    ), bc AS (
      SELECT b,
             (cw * 1.0 / n) * (1 - cw * 1.0 / n)
             * POW(cm / cw - (tm - cm) / (n - cw), 2) AS bcv
      FROM cum WHERE cw < n
    )
    SELECT CAST(bc.b AS BIGINT) AS otsu_bin,
           ROUND(mm.lo + (bc.b + 1) * (mm.hi - mm.lo) / 64.0 + 5e-10, 4)
             AS otsu_threshold,
           ROUND(bc.bcv + 5e-10, 4) AS between_class_var,
           ROUND((SELECT MAX(bcv) FROM bc) + 5e-10, 4) AS max_bcv
    FROM bc, mm
    ORDER BY bc.bcv DESC, bc.b LIMIT 3
"""


@register(
    "q581_otsu_threshold",
    _Q581_ORACLE,
    doc="Otsu's automatic threshold on event values: 64-bin "
    "histogram, between-class variance from cumulative weight and "
    "mass sums, the top-3 cut points — the image-binarization "
    "classic as the 1-D two-cluster answer (Lloyd q268 / best-split "
    "q249's closed-form sibling).",
)
def q581(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    h = (
        ev.crossJoin(F.broadcast(mm))
        .groupBy(
            F.least(
                F.floor(
                    (F.col("value") - F.col("lo"))
                    * 64.0
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
                F.lit(63),
            ).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = h.agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * (F.col("b") + 0.5)).alias("tm")
    )
    w = Window.orderBy("b")
    cum = h.select(
        "b",
        F.sum("c").over(w).alias("cw"),
        F.sum(F.col("c") * (F.col("b") + 0.5)).over(w).alias("cm"),
    ).crossJoin(F.broadcast(tot))
    w0 = F.col("cw") * 1.0 / F.col("n")
    bcv = (
        w0
        * (1 - w0)
        * F.pow(
            F.col("cm") / F.col("cw")
            - (F.col("tm") - F.col("cm")) / (F.col("n") - F.col("cw")),
            2,
        )
    )
    bc = cum.filter(F.col("cw") < F.col("n")).select(
        "b", bcv.alias("bcv")
    ).localCheckpoint(eager=False)
    mx = bc.agg(F.max("bcv").alias("max_bcv"))
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        bc.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("b").cast("bigint").alias("otsu_bin"),
            r4(
                F.col("lo") + (F.col("b") + 1) * (F.col("hi") - F.col("lo")) / 64.0
            ).alias("otsu_threshold"),
            r4(F.col("bcv")).alias("between_class_var"),
            r4(F.col("max_bcv")).alias("max_bcv"),
        )
        .orderBy(F.desc("between_class_var"), "otsu_bin")
        .limit(3)
    )


# ---------------------------------------------------------------------------
# Q582 — Weisfeiler-Leman color refinement fingerprints
# ---------------------------------------------------------------------------
# Two 20-node graphs (customer-modulo and supplier-modulo edge
# rules) refined for two WL rounds: each node's color becomes the
# md5 of its sorted neighbor-color multiset, and the color-class
# histograms are the graphs' WL fingerprints — distinguishable
# graphs differ, the 1-WL test that bounds GNN expressiveness.
_Q582_ORACLE = """
    WITH e1 AS MATERIALIZED (
      SELECT DISTINCT CAST(o_custkey % 20 AS BIGINT) AS u,
             CAST(o_orderkey % 20 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 20 <> o_orderkey % 20
    ), e2 AS MATERIALIZED (
      SELECT DISTINCT CAST(l_suppkey % 20 AS BIGINT) AS u,
             CAST(l_partkey % 20 AS BIGINT) AS v
      FROM lineitem WHERE l_suppkey % 20 <> l_partkey % 20
    ), g AS MATERIALIZED (
      SELECT 'g1' AS g, u, v FROM (
        SELECT u, v FROM e1 UNION SELECT v, u FROM e1)
      UNION ALL
      SELECT 'g2', u, v FROM (
        SELECT u, v FROM e2 UNION SELECT v, u FROM e2)
    ), c0 AS MATERIALIZED (
      SELECT g.g, n.i AS nd, CAST('x' AS VARCHAR) AS col
      FROM (SELECT DISTINCT g FROM g) g,
           (SELECT UNNEST(generate_series(0, 19)) AS i) n
    ), c1 AS MATERIALIZED (
      SELECT c.g, c.nd,
             md5(COALESCE(string_agg(nb.col, ',' ORDER BY nb.col), ''))
               AS col
      FROM c0 c LEFT JOIN (
        SELECT g.g, g.u, c2.col FROM g JOIN c0 c2
          ON c2.g = g.g AND c2.nd = g.v) nb
        ON nb.g = c.g AND nb.u = c.nd
      GROUP BY c.g, c.nd
    ), c2r AS MATERIALIZED (
      SELECT c.g, c.nd,
             md5(COALESCE(string_agg(nb.col, ',' ORDER BY nb.col), ''))
               AS col
      FROM c1 c LEFT JOIN (
        SELECT g.g, g.u, cx.col FROM g JOIN c1 cx
          ON cx.g = g.g AND cx.nd = g.v) nb
        ON nb.g = c.g AND nb.u = c.nd
      GROUP BY c.g, c.nd
    ), fp AS (
      SELECT g, COUNT(DISTINCT col) AS n_colors,
             MAX(cnt) AS largest_class
      FROM (SELECT g, col, COUNT(*) AS cnt FROM c2r GROUP BY g, col)
      GROUP BY g
    )
    SELECT f1.n_colors AS g1_colors, f1.largest_class AS g1_largest,
           f2.n_colors AS g2_colors, f2.largest_class AS g2_largest,
           f1.n_colors <> f2.n_colors
             OR f1.largest_class <> f2.largest_class AS wl_distinguishable
    FROM (SELECT * FROM fp WHERE g = 'g1') f1,
         (SELECT * FROM fp WHERE g = 'g2') f2
"""


@register(
    "q582_weisfeiler_leman",
    _Q582_ORACLE,
    doc="1-WL color refinement: two modulo graphs refined for two "
    "rounds (node color = md5 of the sorted neighbor-color "
    "multiset), color-class fingerprints compared — the graph-"
    "isomorphism test that bounds GNN expressiveness, on the graph "
    "stack (q98/q243/q466).",
)
def q582(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e1 = (
        o.select(
            (F.col("o_custkey") % 20).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 20).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e2 = (
        li.select(
            (F.col("l_suppkey") % 20).cast("bigint").alias("u"),
            (F.col("l_partkey") % 20).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def sym(e, tag):
        return (
            e.select("u", "v")
            .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .select(F.lit(tag).alias("g"), "u", "v")
        )

    g = sym(e1, "g1").unionAll(sym(e2, "g2")).localCheckpoint(eager=False)
    gids = spark.createDataFrame([("g1",), ("g2",)], "g string")
    nodes = spark.range(0, 20).select(F.col("id").alias("nd"))
    col = gids.crossJoin(F.broadcast(nodes)).select(
        "g", "nd", F.lit("x").alias("col")
    )
    for _ in range(2):
        nbcols = g.join(
            col.select(F.col("g"), F.col("nd").alias("v"), F.col("col").alias("nc")),
            ["g", "v"],
        ).select("g", F.col("u").alias("nd"), "nc")
        col = (
            col.join(nbcols, ["g", "nd"], "left")
            .groupBy("g", "nd")
            .agg(
                F.md5(
                    F.coalesce(
                        F.array_join(F.sort_array(F.collect_list("nc")), ","),
                        F.lit(""),
                    )
                ).alias("col")
            )
        ).localCheckpoint(eager=False)
    fp = (
        col.groupBy("g", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("g")
        .agg(
            F.count_distinct("col").alias("n_colors"),
            F.max("cnt").alias("largest_class"),
        )
    )
    f1 = fp.filter(F.col("g") == "g1").select(
        F.col("n_colors").alias("g1_colors"),
        F.col("largest_class").alias("g1_largest"),
    )
    f2 = fp.filter(F.col("g") == "g2").select(
        F.col("n_colors").alias("g2_colors"),
        F.col("largest_class").alias("g2_largest"),
    )
    return f1.crossJoin(F.broadcast(f2)).select(
        "g1_colors",
        "g1_largest",
        "g2_colors",
        "g2_largest",
        (
            (F.col("g1_colors") != F.col("g2_colors"))
            | (F.col("g1_largest") != F.col("g2_largest"))
        ).alias("wl_distinguishable"),
    )


# ---------------------------------------------------------------------------
# Q583 — Katz centrality by attenuated-walk iteration
# ---------------------------------------------------------------------------
# x <- beta A x + 1 iterated five times on the modulo contact graph
# (beta 0.1, well under 1/lambda1 from q503, so the series
# converges): Katz counts walks of every length with geometric
# decay — the centrality that sees beyond degree without PageRank's
# normalization; top five nodes with degree alongside.
_Q583_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 30 AS BIGINT) AS u,
             CAST(o_orderkey % 30 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 30 <> o_orderkey % 30
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), x0 AS (
      SELECT g.i AS nd, CAST(1.0 AS DOUBLE) AS x
      FROM generate_series(0, 29) g(i)
    ), x1 AS MATERIALIZED (
      SELECT n.nd, 1 + 0.1 * COALESCE(SUM(xx.x), 0) AS x
      FROM x0 n LEFT JOIN e ON e.u = n.nd
      LEFT JOIN x0 xx ON xx.nd = e.v
      GROUP BY n.nd
    ), x2 AS MATERIALIZED (
      SELECT n.nd, 1 + 0.1 * COALESCE(SUM(xx.x), 0) AS x
      FROM x1 n LEFT JOIN e ON e.u = n.nd
      LEFT JOIN x1 xx ON xx.nd = e.v
      GROUP BY n.nd
    ), x3 AS MATERIALIZED (
      SELECT n.nd, 1 + 0.1 * COALESCE(SUM(xx.x), 0) AS x
      FROM x2 n LEFT JOIN e ON e.u = n.nd
      LEFT JOIN x2 xx ON xx.nd = e.v
      GROUP BY n.nd
    ), x4 AS MATERIALIZED (
      SELECT n.nd, 1 + 0.1 * COALESCE(SUM(xx.x), 0) AS x
      FROM x3 n LEFT JOIN e ON e.u = n.nd
      LEFT JOIN x3 xx ON xx.nd = e.v
      GROUP BY n.nd
    ), x5 AS MATERIALIZED (
      SELECT n.nd, 1 + 0.1 * COALESCE(SUM(xx.x), 0) AS x
      FROM x4 n LEFT JOIN e ON e.u = n.nd
      LEFT JOIN x4 xx ON xx.nd = e.v
      GROUP BY n.nd
    ), deg AS (
      SELECT u AS nd, COUNT(*) AS k FROM e GROUP BY u
    )
    SELECT CAST(x5.nd AS BIGINT) AS node,
           ROUND(x5.x + 5e-12, 6) AS katz,
           CAST(COALESCE(deg.k, 0) AS BIGINT) AS degree
    FROM x5 LEFT JOIN deg ON deg.nd = x5.nd
    ORDER BY ROUND(x5.x + 5e-12, 6) DESC, x5.nd LIMIT 5
"""


@register(
    "q583_katz_centrality",
    _Q583_ORACLE,
    doc="Katz centrality by five unrolled rounds of x <- 1 + 0.1 A x "
    "on the modulo contact graph (beta safely under 1/lambda1 from "
    "q503): geometric-decay walk counting, top-5 nodes with degree "
    "alongside — the centrality between degree and PageRank (q87) "
    "/ HITS (q137).",
)
def q583(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 30).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 30).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=False)
    x = spark.range(0, 30).select(F.col("id").alias("nd"), F.lit(1.0).alias("x"))
    for _ in range(5):
        nb = (
            e.join(x.select(F.col("nd").alias("v"), "x"), "v")
            .groupBy("u")
            .agg(F.sum("x").alias("sx"))
            .select(F.col("u").alias("nd"), "sx")
        )
        x = (
            spark.range(0, 30)
            .select(F.col("id").alias("nd"))
            .join(nb, "nd", "left")
            .select(
                "nd", (1 + 0.1 * F.coalesce("sx", F.lit(0.0))).alias("x")
            )
            .localCheckpoint(eager=False)
        )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("k")).select(
        F.col("u").alias("nd"), "k"
    )
    return (
        x.join(deg, "nd", "left")
        .select(
            F.col("nd").cast("bigint").alias("node"),
            r6(F.col("x")).alias("katz"),
            F.coalesce("k", F.lit(0)).cast("bigint").alias("degree"),
        )
        .orderBy(F.desc("katz"), "node")
        .limit(5)
    )
