"""Conformance queries batch #56 (q474+) — online ELO ratings,
natural cubic spline interpolation, Voronoi cell statistics, exact
binomial overbooking, and first-fit-decreasing bin packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q474 — online ELO ratings as a state-array fold
# ---------------------------------------------------------------------------
# Eight players (nation codes) rated over a deterministic match
# stream: the fold carries all eight ratings and each match updates
# two of them via the logistic expectation (K = 32).  The ONLINE
# path-dependent counterpart of the static Bradley-Terry MLE
# (q315) — order of play matters here, and both engines replay the
# identical sequence.
_Q474_ORACLE = """
    WITH m AS (
      SELECT o_orderkey AS k,
             CAST(o_custkey % 8 AS BIGINT) AS i,
             CAST((o_custkey // 8) % 8 AS BIGINT) AS j,
             CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE 0.0 END AS w
      FROM orders
      WHERE o_orderkey % 200 = 0 AND o_custkey % 8 <> (o_custkey // 8) % 8
    ), ser AS (
      SELECT list([CAST(i AS DOUBLE), CAST(j AS DOUBLE), CAST(w AS DOUBLE)] ORDER BY k) AS ms,
             COUNT(*) AS n_matches
      FROM m
    ), sim AS (
      SELECT n_matches,
        list_reduce(
          list_prepend(list_transform(generate_series(1, 8),
                                      z -> CAST(1000.0 AS DOUBLE)), ms),
          (r, x) -> list_transform(r, (v, idx) ->
            CASE
              WHEN idx - 1 = CAST(x[1] AS BIGINT) THEN
                v + 32.0 * (x[3] - 1.0
                  / (1.0 + POW(10.0,
                       (r[CAST(x[2] AS INT) + 1]
                        - r[CAST(x[1] AS INT) + 1]) / 400.0)))
              WHEN idx - 1 = CAST(x[2] AS BIGINT) THEN
                v + 32.0 * ((1.0 - x[3]) - 1.0
                  / (1.0 + POW(10.0,
                       (r[CAST(x[1] AS INT) + 1]
                        - r[CAST(x[2] AS INT) + 1]) / 400.0)))
              ELSE v END)
        ) AS ratings
      FROM ser
    )
    SELECT g.p AS player,
           ROUND(sim.ratings[g.p + 1] + 5e-8, 2) AS elo,
           CAST(sim.n_matches AS BIGINT) AS n_matches
    FROM sim, generate_series(0, 7) g(p)
    ORDER BY player
"""


@register(
    "q474_elo_fold",
    _Q474_ORACLE,
    doc="Online ELO (K = 32) over a deterministic match stream as one "
    "fold carrying the 8-player rating vector — the path-dependent "
    "online rating next to the static Bradley-Terry MLE (q315); "
    "both engines replay the identical sequence so ratings agree "
    "to rounding.",
)
def q474(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = o.filter(
        (F.col("o_orderkey") % 200 == 0)
        & (F.col("o_custkey") % 8 != F.floor(F.col("o_custkey") / 8) % 8)
    ).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 8).cast("double").alias("i"),
        (F.floor(F.col("o_custkey") / 8) % 8).cast("double").alias("j"),
        F.when(F.round(F.col("o_totalprice") * 100).cast("bigint") % 2 == 0, 1.0)
        .otherwise(0.0)
        .alias("w"),
    )
    ser = m.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("k", "i", "j", "w"))),
            lambda s: F.array(s.i, s.j, s.w),
        ).alias("ms"),
        F.count(F.lit(1)).alias("n_matches"),
    )
    init = F.array(*[F.lit(1000.0) for _ in range(8)])

    def step(r, x):
        i = F.element_at(x, 1)
        j = F.element_at(x, 2)
        w = F.element_at(x, 3)
        ri = F.element_at(r, i.cast("int") + 1)
        rj = F.element_at(r, j.cast("int") + 1)
        ei = 1.0 / (1.0 + F.pow(F.lit(10.0), (rj - ri) / 400.0))
        ej = 1.0 / (1.0 + F.pow(F.lit(10.0), (ri - rj) / 400.0))
        return F.transform(
            r,
            lambda v, idx: F.when(idx.cast("double") == i, v + 32.0 * (w - ei))
            .when(idx.cast("double") == j, v + 32.0 * ((1.0 - w) - ej))
            .otherwise(v),
        )

    sim = ser.select(
        "n_matches", F.aggregate(F.col("ms"), init, step).alias("ratings")
    )
    g = spark.range(0, 8).select(F.col("id").cast("int").alias("p"))
    return (
        sim.crossJoin(F.broadcast(g))
        .select(
            F.col("p").cast("bigint").alias("player"),
            F.round(
                F.element_at("ratings", F.col("p") + 1) + F.lit(5e-8), 2
            ).alias("elo"),
            F.col("n_matches").cast("bigint").alias("n_matches"),
        )
        .orderBy("player")
    )


# ---------------------------------------------------------------------------
# Q475 — natural cubic spline via Thomas-algorithm folds
# ---------------------------------------------------------------------------
# Knots = revenue on even days; the tridiagonal system for the
# spline's second derivatives solves with the Thomas algorithm as
# two folds (forward elimination appending the primed coefficients,
# back substitution over the reverse).  The spline midpoint closed
# form (y_avg - (M_i + M_{i+1}) h^2 / 16) is then scored against
# the TRUE odd-day revenue vs plain linear interpolation — measured
# interpolation gain (linear interpolation join q257's upgrade).
_Q475_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 30
      GROUP BY 1
    ), knots AS (
      SELECT list(v ORDER BY d) FILTER (WHERE d % 2 = 0) AS y,
             list(v ORDER BY d) FILTER (WHERE d % 2 = 1 AND d > 1 AND d < 29)
               AS mid
      FROM daily
    ), rhs AS (
      SELECT y, mid,
             list_transform(generate_series(2, len(y) - 1),
               i -> 6.0 * (y[i + 1] - 2 * y[i] + y[i - 1]) / 4.0) AS dvec
      FROM knots
    ), fwd AS (
      SELECT y, mid, dvec,
        list_reduce(
          list_prepend([[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)]],
                       list_transform(dvec,
                         x -> [[x, CAST(0.0 AS DOUBLE)]])),
          (acc, d) -> list_append(acc,
            [1.0 / (4.0 - acc[len(acc)][1]),
             (d[1][1] - acc[len(acc)][2]) / (4.0 - acc[len(acc)][1])])
        ) AS cp
      FROM rhs
    ), bwd AS (
      SELECT y, mid,
        list_reduce(
          list_prepend([CAST(0.0 AS DOUBLE)], list_transform(
            generate_series(1, len(cp) - 1),
            i -> [cp[len(cp) + 1 - i][1], cp[len(cp) + 1 - i][2]])),
          (ms, c) -> list_prepend(c[2] - c[1] * ms[1], ms)
        ) AS m_inner
      FROM fwd
    ), m AS (
      SELECT y, mid,
             list_concat(list_prepend(CAST(0.0 AS DOUBLE), m_inner),
                         [CAST(0.0 AS DOUBLE)]) AS mm
      FROM bwd
    ), sc AS (
      SELECT len(y) AS n_knots,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
          generate_series(1, len(mid)),
          i -> ABS((y[i] + y[i + 1]) / 2.0
                   - (mm[i] + mm[i + 1]) * 4.0 / 16.0 - mid[i]))),
          (a, b) -> a + b) / len(mid) AS spline_mae,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
          generate_series(1, len(mid)),
          i -> ABS((y[i] + y[i + 1]) / 2.0 - mid[i]))),
          (a, b) -> a + b) / len(mid) AS linear_mae
      FROM m
    )
    SELECT CAST(n_knots AS BIGINT) AS n_knots,
           ROUND(spline_mae / 100.0 + 5e-8, 2) AS spline_mae_usd,
           ROUND(linear_mae / 100.0 + 5e-8, 2) AS linear_mae_usd,
           ROUND(linear_mae / spline_mae + 5e-12, 6) AS gain
    FROM sc
"""


@register(
    "q475_cubic_spline",
    _Q475_ORACLE,
    doc="Natural cubic spline through even-day revenue knots: the "
    "tridiagonal second-derivative system solved by the Thomas "
    "algorithm as two folds (forward elimination, reverse back-"
    "substitution), midpoint closed form scored against true "
    "odd-day values vs linear interpolation — measured smoothness "
    "gain, identical fold order in both engines.",
)
def q475(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 30)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("v")
    )
    knots = daily.agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("d") % 2 == 0, F.struct("d", "v"))
                )
            ),
            lambda s: s.v,
        ).alias("y"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("d") % 2 == 1) & (F.col("d") > 1) & (F.col("d") < 29),
                        F.struct("d", "v"),
                    )
                )
            ),
            lambda s: s.v,
        ).alias("mid"),
    )
    y = F.col("y")
    rhs = knots.select(
        "y",
        "mid",
        F.transform(
            F.sequence(F.lit(2), F.size(y) - 1),
            lambda i: 6.0
            * (
                F.element_at(y, (i + 1).cast("int"))
                - 2 * F.element_at(y, i.cast("int"))
                + F.element_at(y, (i - 1).cast("int"))
            )
            / 4.0,
        ).alias("dvec"),
    )
    # forward elimination: append [c', d'] pairs
    fwd = rhs.select(
        "y",
        "mid",
        "dvec",
        F.aggregate(
            F.col("dvec"),
            F.array(F.array(F.lit(0.0), F.lit(0.0))),
            lambda acc, d: F.concat(
                acc,
                F.array(
                    F.array(
                        1.0
                        / (
                            4.0
                            - F.element_at(F.element_at(acc, F.size(acc)), 1)
                        ),
                        (d - F.element_at(F.element_at(acc, F.size(acc)), 2))
                        / (
                            4.0
                            - F.element_at(F.element_at(acc, F.size(acc)), 1)
                        ),
                    )
                ),
            ),
        ).alias("cp"),
    )
    # back substitution over the reversed primed rows, prepending
    cp = F.col("cp")
    bwd = fwd.select(
        "y",
        "mid",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.size(cp) - 1),
                lambda i: F.array(
                    F.element_at(
                        F.element_at(cp, (F.size(cp) + 1 - i).cast("int")), 1
                    ),
                    F.element_at(
                        F.element_at(cp, (F.size(cp) + 1 - i).cast("int")), 2
                    ),
                ),
            ),
            F.array(F.lit(0.0)),
            lambda ms, c: F.concat(
                F.array(
                    F.element_at(c, 2) - F.element_at(c, 1) * F.element_at(ms, 1)
                ),
                ms,
            ),
        ).alias("m_inner"),
    )
    mdf = bwd.select(
        "y",
        "mid",
        F.concat(
            F.array(F.lit(0.0)), F.col("m_inner"), F.array(F.lit(0.0))
        ).alias("mm"),
    )
    mm = F.col("mm")
    mid = F.col("mid")
    spline_terms = F.transform(
        F.sequence(F.lit(1), F.size(mid)),
        lambda i: F.abs(
            (F.element_at(y, i.cast("int")) + F.element_at(y, (i + 1).cast("int")))
            / 2.0
            - (
                F.element_at(mm, i.cast("int"))
                + F.element_at(mm, (i + 1).cast("int"))
            )
            * 4.0
            / 16.0
            - F.element_at(mid, i.cast("int"))
        ),
    )
    linear_terms = F.transform(
        F.sequence(F.lit(1), F.size(mid)),
        lambda i: F.abs(
            (F.element_at(y, i.cast("int")) + F.element_at(y, (i + 1).cast("int")))
            / 2.0
            - F.element_at(mid, i.cast("int"))
        ),
    )
    sc = mdf.select(
        F.size("y").alias("n_knots"),
        (
            F.aggregate(spline_terms, F.lit(0.0), lambda a, b: a + b)
            / F.size(mid)
        ).alias("spline_mae"),
        (
            F.aggregate(linear_terms, F.lit(0.0), lambda a, b: a + b)
            / F.size(mid)
        ).alias("linear_mae"),
    )
    return sc.select(
        F.col("n_knots").cast("bigint").alias("n_knots"),
        F.round(F.col("spline_mae") / 100.0 + F.lit(5e-8), 2).alias(
            "spline_mae_usd"
        ),
        F.round(F.col("linear_mae") / 100.0 + F.lit(5e-8), 2).alias(
            "linear_mae_usd"
        ),
        r6(F.col("linear_mae") / F.col("spline_mae")).alias("gain"),
    )


# ---------------------------------------------------------------------------
# Q476 — Voronoi cell statistics (nearest-seed partition)
# ---------------------------------------------------------------------------
# Five seed customers' (balance, spend) points partition the whole
# cloud by nearest-seed (ties to the smaller seed id): per-cell
# population, centroid, and radius — the discrete Voronoi tessellation
# that 1-NN classification induces (kNN q23 / geometric median q463's
# spatial-structure sibling).
_Q476_ORACLE = """
    WITH pts AS (
      SELECT c.c_custkey AS id, ROUND(c.c_acctbal * 100) AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1000.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), seeds AS (
      SELECT id AS sid, x AS sx, y AS sy FROM pts
      WHERE id IN (1, 300, 600, 900, 1200)
    ), asg AS (
      SELECT p.id, p.x, p.y, s.sid,
             ROW_NUMBER() OVER (PARTITION BY p.id
               ORDER BY (p.x - s.sx) * (p.x - s.sx)
                        + (p.y - s.sy) * (p.y - s.sy), s.sid) AS rk
      FROM pts p CROSS JOIN seeds s
    )
    SELECT CAST(sid AS BIGINT) AS seed,
           CAST(COUNT(*) AS BIGINT) AS cell_size,
           ROUND(AVG(x) / 100.0 + 5e-8, 2) AS centroid_balance_usd,
           ROUND(AVG(y) / 10.0 + 5e-8, 2) AS centroid_spend_kusd
    FROM asg WHERE rk = 1
    GROUP BY sid ORDER BY seed
"""


@register(
    "q476_voronoi_cells",
    _Q476_ORACLE,
    doc="Voronoi tessellation of the (balance, spend) cloud around "
    "five seed customers: nearest-seed assignment (1-NN with "
    "seed-id tiebreak) and per-cell population/centroid — the "
    "spatial partition structure behind 1-NN classification (q23) "
    "and Lloyd's step (q268).",
)
def q476(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1000.0
            ).alias("y")
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.round(F.col("c_acctbal") * 100).alias("x"),
            "y",
        )
    )
    seeds = pts.filter(F.col("id").isin(1, 300, 600, 900, 1200)).select(
        F.col("id").alias("sid"), F.col("x").alias("sx"), F.col("y").alias("sy")
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    asg = pts.crossJoin(F.broadcast(seeds)).select(
        "id",
        "x",
        "y",
        "sid",
        F.row_number()
        .over(Window.partitionBy("id").orderBy(d2, "sid"))
        .alias("rk"),
    )
    return (
        asg.filter(F.col("rk") == 1)
        .groupBy("sid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cell_size"),
            F.round(F.avg("x") / 100.0 + F.lit(5e-8), 2).alias(
                "centroid_balance_usd"
            ),
            F.round(F.avg("y") / 10.0 + F.lit(5e-8), 2).alias(
                "centroid_spend_kusd"
            ),
        )
        .select(F.col("sid").cast("bigint").alias("seed"), "cell_size",
                "centroid_balance_usd", "centroid_spend_kusd")
        .orderBy("seed")
    )


# ---------------------------------------------------------------------------
# Q477 — exact binomial overbooking optimization
# ---------------------------------------------------------------------------
# 100 seats, show-up probability measured from the data (share of
# finished orders); for each booking level N in 100..115, the exact
# binomial tail gives P(bumped) and the expected overage, and the
# profit model (fare 1, bump cost 3) picks the optimal overbooking
# level.  Binomial pmf via relational log-factorial prefix sums —
# the q441 machinery pointed at a revenue-management decision.
_Q477_ORACLE = """
    WITH p AS (
      SELECT SUM(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0 END)
               / COUNT(*) AS ps
      FROM orders
    ), lf AS (
      SELECT g.k, SUM(LN(g2.k)) AS lfact
      FROM generate_series(1, 130) g(k)
      JOIN generate_series(1, 130) g2(k) ON g2.k <= g.k
      GROUP BY g.k
    ), lf0 AS (
      SELECT k, lfact FROM lf UNION ALL SELECT 0, 0.0
    ), lv AS (
      SELECT n.n, k.k,
             EXP(ln.lfact - lk.lfact - lnk.lfact
                 + k.k * LN(p.ps) + (n.n - k.k) * LN(1 - p.ps)) AS pmf
      FROM generate_series(100, 115) n(n)
      JOIN generate_series(0, 115) k(k) ON k.k <= n.n
      JOIN lf0 ln ON ln.k = n.n
      JOIN lf0 lk ON lk.k = k.k
      JOIN lf0 lnk ON lnk.k = n.n - k.k
      CROSS JOIN p
    ), agg AS (
      SELECT n,
             SUM(CASE WHEN k > 100 THEN pmf ELSE 0 END) AS p_bump,
             SUM(CASE WHEN k > 100 THEN (k - 100) * pmf ELSE 0 END)
               AS e_overage,
             SUM(LEAST(k, 100) * pmf) AS e_boarded
      FROM lv GROUP BY n
    )
    SELECT CAST(a.n AS BIGINT) AS n_booked,
           ROUND(p.ps + 5e-12, 6) AS p_show,
           ROUND(a.p_bump + 5e-12, 6) AS p_bump,
           ROUND(a.e_overage + 5e-12, 6) AS expected_bumps,
           ROUND(a.n * p.ps - 3.0 * a.e_overage + 5e-10, 4)
             AS expected_profit,
           a.n * p.ps - 3.0 * a.e_overage =
             (SELECT MAX(n * p.ps - 3.0 * e_overage) FROM agg)
             AS is_optimal
    FROM agg a, p ORDER BY n_booked
"""


@register(
    "q477_overbooking",
    _Q477_ORACLE,
    doc="Exact binomial overbooking table: measured show probability, "
    "P(bump) and expected overage for booking levels 100-115 from "
    "relational log-factorial pmfs, profit-optimal level flagged — "
    "revenue management on the q441 integer-Beta machinery.",
)
def q477(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    p = o.agg(
        (
            F.sum(F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("ps")
    )
    lf = (
        spark.range(1, 131)
        .select(F.col("id").alias("k"), F.log(F.col("id").cast("double")).alias("l"))
        .select("k", F.sum("l").over(Window.orderBy("k")).alias("lfact"))
    )
    lf0 = lf.unionAll(
        spark.range(0, 1).select(F.col("id").alias("k"), F.lit(0.0).alias("lfact"))
    )
    ns = spark.range(100, 116).select(F.col("id").alias("n"))
    ks = spark.range(0, 116).select(F.col("id").alias("k"))
    grid = ns.crossJoin(F.broadcast(ks)).filter(F.col("k") <= F.col("n"))
    lvj = (
        grid.join(
            F.broadcast(lf0.select(F.col("k").alias("n"), F.col("lfact").alias("ln_"))),
            "n",
        )
        .join(
            F.broadcast(lf0.select(F.col("k"), F.col("lfact").alias("lk_"))), "k"
        )
        .join(
            F.broadcast(
                lf0.select(F.col("k").alias("nk"), F.col("lfact").alias("lnk_"))
            ),
            F.col("nk") == F.col("n") - F.col("k"),
        )
        .crossJoin(F.broadcast(p))
        .select(
            "n",
            "k",
            F.exp(
                F.col("ln_")
                - F.col("lk_")
                - F.col("lnk_")
                + F.col("k") * F.log("ps")
                + (F.col("n") - F.col("k")) * F.log(1 - F.col("ps"))
            ).alias("pmf"),
        )
    )
    agg = lvj.groupBy("n").agg(
        F.sum(F.when(F.col("k") > 100, F.col("pmf")).otherwise(0.0)).alias(
            "p_bump"
        ),
        F.sum(
            F.when(F.col("k") > 100, (F.col("k") - 100) * F.col("pmf")).otherwise(
                0.0
            )
        ).alias("e_overage"),
    )
    best = agg.crossJoin(F.broadcast(p)).agg(
        F.max(F.col("n") * F.col("ps") - 3.0 * F.col("e_overage")).alias("bestv")
    )
    return (
        agg.crossJoin(F.broadcast(p))
        .crossJoin(F.broadcast(best))
        .select(
            F.col("n").cast("bigint").alias("n_booked"),
            r6(F.col("ps")).alias("p_show"),
            r6(F.col("p_bump")).alias("p_bump"),
            r6(F.col("e_overage")).alias("expected_bumps"),
            F.round(
                F.col("n") * F.col("ps") - 3.0 * F.col("e_overage") + F.lit(5e-10),
                4,
            ).alias("expected_profit"),
            (
                F.col("n") * F.col("ps") - 3.0 * F.col("e_overage")
                == F.col("bestv")
            ).alias("is_optimal"),
        )
        .orderBy("n_booked")
    )


# ---------------------------------------------------------------------------
# Q478 — first-fit-decreasing bin packing (file compaction)
# ---------------------------------------------------------------------------
# Compact sampled documents into 4096-char bins with the actual FFD
# algorithm: items sorted descending, each folded into the first bin
# with room — the inner first-fit search is itself a fold over the
# bin-load array carrying [cursor, found].  Bin count lands within
# 11/9 OPT of the ceil(total/cap) lower bound — the real compaction
# planner the shuffle/skew tables (q438) assume exists.
_Q478_ORACLE = """
    WITH items AS (
      SELECT list(n_chars ORDER BY n_chars DESC, doc_id) AS xs,
             SUM(n_chars) AS total, COUNT(*) AS n_items
      FROM documents WHERE doc_id % 17 = 0
    ), packed AS (
      SELECT n_items, total,
        list_reduce(
          list_prepend(CAST([] AS BIGINT[]), list_transform(xs, x -> [x])),
          (bins, it) -> CASE
            WHEN list_reduce(
                   list_prepend([CAST(0 AS BIGINT), 0], list_transform(
                     bins, b -> [b])),
                   (st, b) -> CASE
                     WHEN st[2] > 0 THEN [st[1] + 1, st[2]]
                     WHEN b[1] + it[1] <= 4096 THEN [st[1] + 1, st[1] + 1]
                     ELSE [st[1] + 1, 0] END
                 )[2] = 0
            THEN list_append(bins, it[1])
            ELSE list_transform(bins, (b, i) ->
              CASE WHEN i = list_reduce(
                     list_prepend([CAST(0 AS BIGINT), 0], list_transform(
                       bins, b2 -> [b2])),
                     (st, b2) -> CASE
                       WHEN st[2] > 0 THEN [st[1] + 1, st[2]]
                       WHEN b2[1] + it[1] <= 4096 THEN [st[1] + 1, st[1] + 1]
                       ELSE [st[1] + 1, 0] END
                   )[2]
                   THEN b + it[1] ELSE b END)
          END
        ) AS bins
      FROM items
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(total AS BIGINT) AS total_chars,
           CAST(len(bins) AS BIGINT) AS n_bins_ffd,
           CAST(CEIL(total / 4096.0) AS BIGINT) AS lower_bound,
           ROUND(len(bins) * 1.0 / CEIL(total / 4096.0) + 5e-12, 6)
             AS ffd_over_lb,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), bins),
                            (a, b) -> GREATEST(a, b)) AS BIGINT)
             AS max_bin_load
    FROM packed
"""


@register(
    "q478_ffd_bin_packing",
    _Q478_ORACLE,
    doc="First-fit-decreasing bin packing of sampled documents into "
    "4096-char bins, executed (not estimated): items fold into the "
    "bin-load array, the first-fit search is an inner fold carrying "
    "[cursor, found] — bin count vs the ceil(total/cap) lower "
    "bound, the compaction algorithm behind small-file planning "
    "(q438's skew tables assume it).",
)
def q478(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    items = docs.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("n_chars")).alias("neg"), "doc_id"))
            ),
            lambda s: -s.neg,
        ).alias("xs"),
        F.sum("n_chars").alias("total"),
        F.count(F.lit(1)).alias("n_items"),
    )
    zero = F.lit(0).cast("bigint")

    def first_fit(bins, it):
        # fold over bins carrying [cursor, found_index (0 = none)]
        return F.element_at(
            F.aggregate(
                bins,
                F.array(zero, zero),
                lambda st, b: F.when(
                    F.element_at(st, 2) > 0,
                    F.array(F.element_at(st, 1) + 1, F.element_at(st, 2)),
                )
                .when(
                    b + it <= 4096,
                    F.array(
                        F.element_at(st, 1) + 1, F.element_at(st, 1) + 1
                    ),
                )
                .otherwise(F.array(F.element_at(st, 1) + 1, zero)),
            ),
            2,
        )

    def step(bins, it):
        idx = first_fit(bins, it)
        return F.when(idx == 0, F.concat(bins, F.array(it))).otherwise(
            F.transform(
                bins,
                lambda b, i: F.when(i + 1 == idx, b + it).otherwise(b),
            )
        )

    packed = items.select(
        "n_items",
        "total",
        F.aggregate(
            F.col("xs"), F.array().cast("array<bigint>"), step
        ).alias("bins"),
    )
    return packed.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("total").cast("bigint").alias("total_chars"),
        F.size("bins").cast("bigint").alias("n_bins_ffd"),
        F.ceil(F.col("total") / 4096.0).cast("bigint").alias("lower_bound"),
        r6(F.size("bins") * 1.0 / F.ceil(F.col("total") / 4096.0)).alias(
            "ffd_over_lb"
        ),
        F.aggregate(
            F.col("bins"), zero, lambda a, b: F.greatest(a, b)
        )
        .cast("bigint")
        .alias("max_bin_load"),
    )
