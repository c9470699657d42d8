"""Conformance queries batch #93 (q659+) — the Frisch-Waugh-Lovell
identity, a Baum-Welch EM step, market microstructure spreads,
space-filling-curve locality, and competing-risks incidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q659 — Frisch-Waugh-Lovell: partialling-out equals multivariate OLS
# ---------------------------------------------------------------------------
# Spend on (balance, nation-bloc): the two-regressor OLS coefficient
# on balance from the closed-form normal equations, and the same
# coefficient via FWL — residualize y and x1 on x2, regress residual
# on residual — must agree to machine precision. The theorem that
# justifies "controlling for" anything.
_Q659_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) / 1e5 AS x1,
             CAST(c.c_nationkey % 5 AS DOUBLE) AS x2,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ), m AS (
      SELECT AVG(x1) AS mx1, AVG(x2) AS mx2, AVG(y) AS my FROM u
    ), s AS (
      SELECT SUM((x1 - m.mx1) * (x1 - m.mx1)) AS s11,
             SUM((x2 - m.mx2) * (x2 - m.mx2)) AS s22,
             SUM((x1 - m.mx1) * (x2 - m.mx2)) AS s12,
             SUM((x1 - m.mx1) * (y - m.my)) AS s1y,
             SUM((x2 - m.mx2) * (y - m.my)) AS s2y
      FROM u, m GROUP BY m.mx1, m.mx2, m.my
    ), direct AS (
      SELECT (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2,
             s12 / s22 AS g_x, s2y / s22 AS g_y
      FROM s
    ), fwl AS (
      SELECT SUM(((u.x1 - m.mx1) - d.g_x * (u.x2 - m.mx2))
                 * ((u.y - m.my) - d.g_y * (u.x2 - m.mx2)))
               / SUM(((u.x1 - m.mx1) - d.g_x * (u.x2 - m.mx2))
                     * ((u.x1 - m.mx1) - d.g_x * (u.x2 - m.mx2))) AS b1_fwl
      FROM u, direct d,
           (SELECT AVG(x1) AS mx1, AVG(x2) AS mx2, AVG(y) AS my FROM u) m
      GROUP BY d.b1
    )
    SELECT ROUND(d.b1 + 5e-12, 6) AS b1_direct,
           ROUND(f.b1_fwl + 5e-12, 6) AS b1_partialled,
           ROUND(d.b2 + 5e-12, 6) AS b2_direct,
           ABS(d.b1 - f.b1_fwl) < 1e-9 AS fwl_identity_holds
    FROM direct d, fwl f
"""


@register(
    "q659_fwl_partialling",
    _Q659_ORACLE,
    doc="Frisch-Waugh-Lovell: the balance coefficient from "
    "two-regressor normal equations equals the slope of "
    "residualized-y on residualized-x1 (both partialled on the "
    "nation bloc) to machine precision — the identity behind "
    "'controlling for', sharpening partial correlation (q326).",
)
def q659(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("y")
        )
        .select(
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("x1"),
            (F.col("c_nationkey") % 5).cast("double").alias("x2"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    m = u.agg(
        F.avg("x1").alias("mx1"), F.avg("x2").alias("mx2"), F.avg("y").alias("my")
    )
    um = u.crossJoin(F.broadcast(m))
    s = um.agg(
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("x1") - F.col("mx1"))).alias(
            "s11"
        ),
        F.sum((F.col("x2") - F.col("mx2")) * (F.col("x2") - F.col("mx2"))).alias(
            "s22"
        ),
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("x2") - F.col("mx2"))).alias(
            "s12"
        ),
        F.sum((F.col("x1") - F.col("mx1")) * (F.col("y") - F.col("my"))).alias(
            "s1y"
        ),
        F.sum((F.col("x2") - F.col("mx2")) * (F.col("y") - F.col("my"))).alias(
            "s2y"
        ),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    direct = s.select(
        ((F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det).alias(
            "b1"
        ),
        ((F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det).alias(
            "b2"
        ),
        (F.col("s12") / F.col("s22")).alias("g_x"),
        (F.col("s2y") / F.col("s22")).alias("g_y"),
    )
    rx = (F.col("x1") - F.col("mx1")) - F.col("g_x") * (F.col("x2") - F.col("mx2"))
    ry = (F.col("y") - F.col("my")) - F.col("g_y") * (F.col("x2") - F.col("mx2"))
    fwl = (
        um.crossJoin(F.broadcast(direct))
        .groupBy("b1")
        .agg((F.sum(rx * ry) / F.sum(rx * rx)).alias("b1_fwl"))
    )
    return direct.join(fwl, "b1").select(
        r6(F.col("b1")).alias("b1_direct"),
        r6(F.col("b1_fwl")).alias("b1_partialled"),
        r6(F.col("b2")).alias("b2_direct"),
        (F.abs(F.col("b1") - F.col("b1_fwl")) < 1e-9).alias(
            "fwl_identity_holds"
        ),
    )


# ---------------------------------------------------------------------------
# Q660 — one Baum-Welch re-estimation step for a 2-state HMM
# ---------------------------------------------------------------------------
# Daily revenue up/down as emissions of a 2-state HMM with fixed
# initial parameters: the forward and backward recursions run as
# appending folds, gammas and xis assembled relationally by array
# indexing, and the M-step re-estimates the self-transition
# probabilities — the EM update that the forward pass (q529) feeds.
_BW_A = (0.7, 0.3, 0.4, 0.6)
_BW_B = (0.6, 0.4, 0.3, 0.7)  # B[state][obs]: b1(0), b1(1), b2(0), b2(1)


def _bw_fwd(el, ob: str) -> str:
    a1 = f"{el(-2)}"
    a2 = f"{el(-1)}"
    b1 = f"(CASE WHEN {ob} = 0 THEN {_BW_B[0]} ELSE {_BW_B[1]} END)"
    b2 = f"(CASE WHEN {ob} = 0 THEN {_BW_B[2]} ELSE {_BW_B[3]} END)"
    n1 = f"(({a1} * {_BW_A[0]} + {a2} * {_BW_A[2]}) * {b1})"
    n2 = f"(({a1} * {_BW_A[1]} + {a2} * {_BW_A[3]}) * {b2})"
    return n1, n2


def _bw_bwd(el, ob: str) -> str:
    b1n = f"{el(-2)}"
    b2n = f"{el(-1)}"
    e1 = f"(CASE WHEN {ob} = 0 THEN {_BW_B[0]} ELSE {_BW_B[1]} END)"
    e2 = f"(CASE WHEN {ob} = 0 THEN {_BW_B[2]} ELSE {_BW_B[3]} END)"
    n1 = f"({_BW_A[0]} * {e1} * {b1n} + {_BW_A[1]} * {e2} * {b2n})"
    n2 = f"({_BW_A[2]} * {e1} * {b1n} + {_BW_A[3]} * {e2} * {b2n})"
    return n1, n2


def _bw_oracle() -> str:
    f1, f2 = _bw_fwd(lambda k: f"acc[{k}]", "x[1]")
    g1, g2 = _bw_bwd(lambda k: f"acc[{k}]", "x[1]")
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   SUM(ROUND(value * 100)) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), obs_rows AS MATERIALIZED (
      SELECT t - 1 AS t,
             CASE WHEN x > LAG(x) OVER (ORDER BY t) THEN 1 ELSE 0 END AS o
      FROM daily QUALIFY LAG(x) OVER (ORDER BY t) IS NOT NULL
    ), arrs AS MATERIALIZED (
      SELECT COUNT(*) AS tt,
             list(CAST(o AS DOUBLE) ORDER BY t) AS obs
      FROM obs_rows
    ), fwd AS MATERIALIZED (
      SELECT tt, obs,
             list_reduce(
               list_prepend(
                 [CAST(0.5 AS DOUBLE)
                    * (CASE WHEN obs[1] = 0 THEN {_BW_B[0]}
                       ELSE {_BW_B[1]} END),
                  CAST(0.5 AS DOUBLE)
                    * (CASE WHEN obs[1] = 0 THEN {_BW_B[2]}
                       ELSE {_BW_B[3]} END)],
                 list_transform(obs[2:], y -> [y])),
               (acc, x) -> list_concat(acc, [{f1}, {f2}])
             ) AS fa,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE), 1],
                 list_transform(list_reverse(obs[2:]), y -> [y])),
               (acc, x) -> list_concat(acc, [{g1}, {g2}])
             ) AS fb
      FROM arrs
    ), lik AS (
      SELECT tt, obs, fa, fb,
             fa[2 * tt - 1] + fa[2 * tt] AS l
      FROM fwd
    ), terms AS MATERIALIZED (
      SELECT l.tt, l.l, g.t,
             l.fa[2 * g.t - 1] AS a1, l.fa[2 * g.t] AS a2,
             l.fb[2 * (l.tt - g.t) + 1] AS b1,
             l.fb[2 * (l.tt - g.t) + 2] AS b2,
             CASE WHEN g.t < l.tt THEN l.obs[g.t + 1] END AS onx,
             CASE WHEN g.t < l.tt
                  THEN l.fb[2 * (l.tt - g.t) - 1] END AS b1n,
             CASE WHEN g.t < l.tt
                  THEN l.fb[2 * (l.tt - g.t)] END AS b2n
      FROM lik l CROSS JOIN (
        SELECT UNNEST(range(1, 200)) AS t) g
      WHERE g.t <= l.tt
    ), estep AS (
      SELECT MAX(l) AS l,
             SUM(CASE WHEN onx IS NOT NULL THEN a1 * b1 END) AS den1,
             SUM(CASE WHEN onx IS NOT NULL THEN a2 * b2 END) AS den2,
             SUM(a1 * {_BW_A[0]}
                 * (CASE WHEN onx = 0 THEN {_BW_B[0]}
                    ELSE {_BW_B[1]} END) * b1n) AS xi11,
             SUM(a2 * {_BW_A[3]}
                 * (CASE WHEN onx = 0 THEN {_BW_B[2]}
                    ELSE {_BW_B[3]} END) * b2n) AS xi22,
             MAX(ABS(a1 * b1 + a2 * b2 - l)) AS maxdev
      FROM terms
    )
    SELECT ROUND(LN(l) + 5e-12, 6) AS loglik,
           ROUND(xi11 / den1 + 5e-12, 6) AS new_a11,
           ROUND(xi22 / den2 + 5e-12, 6) AS new_a22,
           maxdev / l < 1e-9 AS forward_backward_consistent
    FROM estep
"""


_Q660_ORACLE = _bw_oracle()


@register(
    "q660_baum_welch_step",
    _Q660_ORACLE,
    doc="One Baum-Welch EM step on a 2-state HMM over daily "
    "revenue up/down emissions: forward and backward recursions as "
    "appending folds, xi/gamma sums assembled by array indexing, "
    "self-transitions re-estimated, with the alpha*beta = "
    "likelihood invariant checked — the learning step above the "
    "forward pass (q529) and Viterbi (q444).",
)
def q660(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).alias("x")
    ).select(
        F.row_number().over(Window.orderBy("d")).alias("t"), "x"
    )
    obs_rows = daily.select(
        (F.col("t") - 1).alias("t"),
        F.when(
            F.col("x") > F.lag("x").over(Window.orderBy("t")), 1
        ).otherwise(0).alias("o"),
        F.lag("x").over(Window.orderBy("t")).alias("xl"),
    ).filter(F.col("xl").isNotNull())
    f1, f2 = _bw_fwd(lambda k: f"element_at(acc, {k})", "element_at(x, 1)")
    g1, g2 = _bw_bwd(lambda k: f"element_at(acc, {k})", "element_at(x, 1)")
    b = _BW_B
    fwd_expr = (
        "aggregate(transform(slice(obs, 2, 1000), y -> array(y)), "
        f"array(CAST(0.5 AS DOUBLE) * (CASE WHEN element_at(obs, 1) = 0 "
        f"THEN {b[0]} ELSE {b[1]} END), "
        f"CAST(0.5 AS DOUBLE) * (CASE WHEN element_at(obs, 1) = 0 "
        f"THEN {b[2]} ELSE {b[3]} END)), "
        f"(acc, x) -> concat(acc, array({f1}, {f2})))"
    )
    bwd_expr = (
        "aggregate(transform(reverse(slice(obs, 2, 1000)), y -> array(y)), "
        "array(CAST(1 AS DOUBLE), 1), "
        f"(acc, x) -> concat(acc, array({g1}, {g2})))"
    )
    arrs = obs_rows.agg(
        F.count(F.lit(1)).cast("int").alias("tt"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("t", "o"))),
            lambda s: s["o"].cast("double"),
        ).alias("obs"),
    )
    fwd = arrs.select(
        "tt", "obs", F.expr(fwd_expr).alias("fa"), F.expr(bwd_expr).alias("fb")
    )
    lik = fwd.select(
        "tt",
        "obs",
        "fa",
        "fb",
        (
            F.element_at("fa", 2 * F.col("tt") - 1)
            + F.element_at("fa", 2 * F.col("tt"))
        ).alias("l"),
    )
    grid = spark.range(1, 200).select(F.col("id").cast("int").alias("t"))
    terms = (
        lik.crossJoin(F.broadcast(grid))
        .filter(F.col("t") <= F.col("tt"))
        .select(
            "tt",
            "l",
            "t",
            F.element_at("fa", 2 * F.col("t") - 1).alias("a1"),
            F.element_at("fa", 2 * F.col("t")).alias("a2"),
            F.element_at("fb", 2 * (F.col("tt") - F.col("t")) + 1).alias("b1"),
            F.element_at("fb", 2 * (F.col("tt") - F.col("t")) + 2).alias("b2"),
            F.when(
                F.col("t") < F.col("tt"),
                F.element_at("obs", F.col("t") + 1),
            ).alias("onx"),
            F.when(
                F.col("t") < F.col("tt"),
                F.element_at("fb", 2 * (F.col("tt") - F.col("t")) - 1),
            ).alias("b1n"),
            F.when(
                F.col("t") < F.col("tt"),
                F.element_at("fb", 2 * (F.col("tt") - F.col("t"))),
            ).alias("b2n"),
        )
    )
    a = _BW_A
    e1 = F.when(F.col("onx") == 0, b[0]).otherwise(b[1])
    e2 = F.when(F.col("onx") == 0, b[2]).otherwise(b[3])
    estep = terms.agg(
        F.max("l").alias("l"),
        F.sum(
            F.when(F.col("onx").isNotNull(), F.col("a1") * F.col("b1"))
        ).alias("den1"),
        F.sum(
            F.when(F.col("onx").isNotNull(), F.col("a2") * F.col("b2"))
        ).alias("den2"),
        F.sum(F.col("a1") * a[0] * e1 * F.col("b1n")).alias("xi11"),
        F.sum(F.col("a2") * a[3] * e2 * F.col("b2n")).alias("xi22"),
        F.max(
            F.abs(
                F.col("a1") * F.col("b1") + F.col("a2") * F.col("b2")
                - F.col("l")
            )
        ).alias("maxdev"),
    )
    return estep.select(
        r6(F.log("l")).alias("loglik"),
        r6(F.col("xi11") / F.col("den1")).alias("new_a11"),
        r6(F.col("xi22") / F.col("den2")).alias("new_a22"),
        (F.col("maxdev") / F.col("l") < 1e-9).alias(
            "forward_backward_consistent"
        ),
    )


# ---------------------------------------------------------------------------
# Q661 — Roll's implied bid-ask spread
# ---------------------------------------------------------------------------
# Successive order prices as a trade tape: Roll's model maps the
# negative first-order autocovariance of price changes to an
# implied effective spread 2 sqrt(-cov) — microstructure from
# nothing but the tape, in exact whole-dollar integers.
_Q661_ORACLE = """
    WITH tape AS MATERIALIZED (
      SELECT rn, CAST(ROUND(o_totalprice) AS DOUBLE) AS p
      FROM (SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 500
    ), d AS MATERIALIZED (
      SELECT rn, p - LAG(p) OVER (ORDER BY rn) AS dp
      FROM tape QUALIFY LAG(p) OVER (ORDER BY rn) IS NOT NULL
    ), dd AS MATERIALIZED (
      SELECT dp, LAG(dp) OVER (ORDER BY rn) AS dpl
      FROM d QUALIFY LAG(dp) OVER (ORDER BY rn) IS NOT NULL
    ), cv AS (
      SELECT COUNT(*) AS n,
             SUM(dp * dpl) / COUNT(*)
               - (SUM(dp) / COUNT(*)) * (SUM(dpl) / COUNT(*)) AS cov1
      FROM dd
    )
    SELECT CAST(n AS BIGINT) AS n_diffs,
           ROUND(cov1 + 5e-10, 4) AS autocovariance,
           ROUND(CASE WHEN cov1 < 0 THEN 2 * SQRT(-cov1) END
                 + 5e-10, 4) AS roll_spread,
           ROUND(CASE WHEN cov1 < 0 THEN 2 * SQRT(-cov1) END
                 / (SELECT AVG(p) FROM tape) * 1e4 + 5e-10, 4)
             AS spread_bps,
           cov1 < 0 AS model_admissible
    FROM cv
"""


@register(
    "q661_roll_spread",
    _Q661_ORACLE,
    doc="Roll's implied spread: the first-order autocovariance of "
    "successive order-price changes, mapped to the effective spread "
    "2 sqrt(-cov) with its basis-point size — bid-ask bounce "
    "microstructure from the tape alone, beside VWAP (q139) and "
    "price dispersion (q554).",
)
def q661(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    tape = o.select(
        F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        F.round("o_totalprice").cast("double").alias("p"),
    ).filter(F.col("rn") <= 500).localCheckpoint(eager=False)
    d = tape.select(
        "rn", (F.col("p") - F.lag("p").over(Window.orderBy("rn"))).alias("dp")
    ).filter(F.col("dp").isNotNull())
    dd = d.select(
        "dp", F.lag("dp").over(Window.orderBy("rn")).alias("dpl")
    ).filter(F.col("dpl").isNotNull())
    n = F.count(F.lit(1))
    cv = dd.agg(
        n.alias("n"),
        (
            F.sum(F.col("dp") * F.col("dpl")) / n
            - (F.sum("dp") / n) * (F.sum("dpl") / n)
        ).alias("cov1"),
    )
    avgp = tape.agg(F.avg("p").alias("ap"))
    spread = F.when(F.col("cov1") < 0, 2 * F.sqrt(-F.col("cov1")))
    return cv.crossJoin(F.broadcast(avgp)).select(
        F.col("n").cast("bigint").alias("n_diffs"),
        F.round(F.col("cov1") + F.lit(5e-10), 4).alias("autocovariance"),
        F.round(spread + F.lit(5e-10), 4).alias("roll_spread"),
        F.round(spread / F.col("ap") * 1e4 + F.lit(5e-10), 4).alias(
            "spread_bps"
        ),
        (F.col("cov1") < 0).alias("model_admissible"),
    )


# ---------------------------------------------------------------------------
# Q662 — Hilbert vs Z-order curve locality on a 16x16 grid
# ---------------------------------------------------------------------------
# Customers binned into a 16x16 (balance x spend) grid; each
# occupied cell gets its Hilbert index (the xy2d rotation fold over
# bit levels 8,4,2,1) and its Z-order index (bit interleave). Over
# edge-adjacent occupied cell pairs, the average index gap measures
# clustering-key locality — why Hilbert beats Z-order (q456) for
# range scans.
def _hilbert_fold(xv: str, yv: str, dv: str, sv: str):
    rx = f"(CASE WHEN FLOOR({xv} / {sv}) % 2 = 1 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN FLOOR({yv} / {sv}) % 2 = 1 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
        f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
    )
    d2 = f"({dv} + {sv} * {sv} * {quad})"
    nx = (
        f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN 15 - {yv} "
        f"WHEN {ry} = 0 THEN {yv} ELSE {xv} END)"
    )
    ny = (
        f"(CASE WHEN {ry} = 0 AND {rx} = 1 THEN 15 - {xv} "
        f"WHEN {ry} = 0 THEN {xv} ELSE {yv} END)"
    )
    return d2, nx, ny


def _hilbert_expr(dialect: str) -> str:
    if dialect == "duck":
        d2, nx, ny = _hilbert_fold("acc[2]", "acc[3]", "acc[1]", "s[1]")
        return (
            "list_reduce(list_prepend([CAST(0 AS DOUBLE), xg, yg], "
            "[[CAST(8 AS DOUBLE)], [4], [2], [1]]), "
            f"(acc, s) -> [{d2}, {nx}, {ny}])[1]"
        )
    d2, nx, ny = _hilbert_fold(
        "element_at(acc, 2)",
        "element_at(acc, 3)",
        "element_at(acc, 1)",
        "element_at(s, 1)",
    )
    return (
        "element_at(aggregate("
        "array(array(CAST(8 AS DOUBLE)), array(4D), array(2D), array(1D)), "
        "array(CAST(0 AS DOUBLE), xg, yg), "
        f"(acc, s) -> array({d2}, {nx}, {ny})), 1)"
    )


_Q662_ORACLE = f"""
    WITH spend AS MATERIALIZED (
      SELECT c.c_custkey AS ck, c.c_acctbal AS bal,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS sp
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), binned AS MATERIALIZED (
      SELECT CAST(NTILE(16) OVER (ORDER BY bal, ck) - 1 AS DOUBLE) AS xg,
             CAST(NTILE(16) OVER (ORDER BY sp, ck) - 1 AS DOUBLE) AS yg
      FROM spend
    ), cells AS MATERIALIZED (
      SELECT DISTINCT xg, yg FROM binned
    ), keyed AS MATERIALIZED (
      SELECT xg, yg,
             {_hilbert_expr('duck')} AS h,
             FLOOR(xg / 8) % 2 * 128 + FLOOR(yg / 8) % 2 * 64
               + FLOOR(xg / 4) % 2 * 32 + FLOOR(yg / 4) % 2 * 16
               + FLOOR(xg / 2) % 2 * 8 + FLOOR(yg / 2) % 2 * 4
               + xg % 2 * 2 + yg % 2 AS z
      FROM cells
    ), adj AS (
      SELECT a.h AS ha, b.h AS hb, a.z AS za, b.z AS zb
      FROM keyed a JOIN keyed b
        ON (b.xg = a.xg + 1 AND b.yg = a.yg)
        OR (b.xg = a.xg AND b.yg = a.yg + 1)
    )
    SELECT CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST(COUNT(*) AS BIGINT) AS n_adjacent_pairs,
           ROUND(AVG(ABS(ha - hb)) + 5e-12, 6) AS avg_hilbert_gap,
           ROUND(AVG(ABS(za - zb)) + 5e-12, 6) AS avg_zorder_gap,
           AVG(ABS(ha - hb)) < AVG(ABS(za - zb)) AS hilbert_wins
    FROM adj
"""


@register(
    "q662_hilbert_curve",
    _Q662_ORACLE,
    doc="Hilbert vs Z-order locality: occupied 16x16 (balance x "
    "spend) cells indexed by the xy2d rotation fold and by bit "
    "interleave, average index gap over edge-adjacent cells "
    "compared — the clustering-key geometry behind Z-order layout "
    "(q456), showing why Hilbert scans tighter ranges.",
)
def q662(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
            ).alias("sp")
        )
        .select(
            F.col("c_custkey").alias("ck"), F.col("c_acctbal").alias("bal"), "sp"
        )
    )
    binned = spend.select(
        (F.ntile(16).over(Window.orderBy("bal", "ck")) - 1)
        .cast("double")
        .alias("xg"),
        (F.ntile(16).over(Window.orderBy("sp", "ck")) - 1)
        .cast("double")
        .alias("yg"),
    )
    cells = binned.distinct().localCheckpoint(eager=False)
    zbits = (
        F.floor(F.col("xg") / 8) % 2 * 128
        + F.floor(F.col("yg") / 8) % 2 * 64
        + F.floor(F.col("xg") / 4) % 2 * 32
        + F.floor(F.col("yg") / 4) % 2 * 16
        + F.floor(F.col("xg") / 2) % 2 * 8
        + F.floor(F.col("yg") / 2) % 2 * 4
        + F.col("xg") % 2 * 2
        + F.col("yg") % 2
    )
    keyed = cells.select(
        "xg", "yg", F.expr(_hilbert_expr("spark")).alias("h"), zbits.alias("z")
    ).localCheckpoint(eager=False)
    b = keyed.select(
        F.col("xg").alias("bx"),
        F.col("yg").alias("by"),
        F.col("h").alias("hb"),
        F.col("z").alias("zb"),
    )
    adj = keyed.join(
        b,
        ((F.col("bx") == F.col("xg") + 1) & (F.col("by") == F.col("yg")))
        | ((F.col("bx") == F.col("xg")) & (F.col("by") == F.col("yg") + 1)),
    )
    ncells = cells.agg(F.count(F.lit(1)).alias("nc"))
    return adj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adjacent_pairs"),
        r6(F.avg(F.abs(F.col("h") - F.col("hb")))).alias("avg_hilbert_gap"),
        r6(F.avg(F.abs(F.col("z") - F.col("zb")))).alias("avg_zorder_gap"),
        (
            F.avg(F.abs(F.col("h") - F.col("hb")))
            < F.avg(F.abs(F.col("z") - F.col("zb")))
        ).alias("hilbert_wins"),
    ).crossJoin(F.broadcast(ncells)).select(
        F.col("nc").cast("bigint").alias("n_cells"),
        "n_adjacent_pairs",
        "avg_hilbert_gap",
        "avg_zorder_gap",
        "hilbert_wins",
    )


# ---------------------------------------------------------------------------
# Q663 — competing risks: cumulative incidence functions
# ---------------------------------------------------------------------------
# For each user, the first purchase and the first click compete;
# whichever comes first is that user's event. With full-month
# observation the Aalen-Johansen estimator reduces to empirical
# subdistribution functions: CIF_k(h) = P(T <= h, cause k) over all
# users — cause-specific incidence that one-risk survival (q108)
# cannot give.
_Q663_ORACLE = """
    WITH t0 AS (
      SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS start_us FROM events
    ), firsts AS MATERIALIZED (
      SELECT e.user_id AS u,
             MIN(CASE WHEN e.event_type = 'purchase'
                      THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END) AS fp,
             MIN(CASE WHEN e.event_type = 'click'
                      THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END) AS fc
      FROM events e GROUP BY e.user_id
    ), typed AS MATERIALIZED (
      SELECT f.u,
             CASE WHEN f.fp IS NOT NULL
                    AND (f.fc IS NULL OR f.fp <= f.fc) THEN 1
                  WHEN f.fc IS NOT NULL THEN 2 ELSE 0 END AS cause,
             (LEAST(COALESCE(f.fp, 9e18), COALESCE(f.fc, 9e18))
              - t.start_us) / 3.6e9 AS th
      FROM firsts f, t0 t
    ), horizons AS (
      SELECT UNNEST([6, 12, 24, 48, 96]) AS h
    ), n_all AS (
      SELECT COUNT(*) AS n FROM typed
    )
    SELECT CAST(hz.h AS BIGINT) AS horizon_hours,
           ROUND(SUM(CASE WHEN t.cause = 1 AND t.th <= hz.h
                          THEN 1 ELSE 0 END) * 1.0 / na.n + 5e-12, 6)
             AS cif_purchase,
           ROUND(SUM(CASE WHEN t.cause = 2 AND t.th <= hz.h
                          THEN 1 ELSE 0 END) * 1.0 / na.n + 5e-12, 6)
             AS cif_click,
           ROUND(SUM(CASE WHEN t.cause > 0 AND t.th <= hz.h
                          THEN 1 ELSE 0 END) * 1.0 / na.n + 5e-12, 6)
             AS cif_any
    FROM horizons hz CROSS JOIN typed t CROSS JOIN n_all na
    GROUP BY hz.h, na.n
    ORDER BY hz.h
"""


@register(
    "q663_competing_risks",
    _Q663_ORACLE,
    doc="Competing risks: first purchase vs first click per user, "
    "cause-specific cumulative incidence CIF_k(h) at 6-96h horizons "
    "(Aalen-Johansen reducing to empirical subdistributions under "
    "full observation) — what single-risk KM survival (q108) "
    "overstates.",
)
def q663(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t0 = e.agg(F.min(us).alias("start_us"))
    firsts = e.groupBy(F.col("user_id").alias("u")).agg(
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("fp"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("fc"),
    )
    typed = firsts.crossJoin(F.broadcast(t0)).select(
        "u",
        F.when(
            F.col("fp").isNotNull()
            & (F.col("fc").isNull() | (F.col("fp") <= F.col("fc"))),
            1,
        )
        .when(F.col("fc").isNotNull(), 2)
        .otherwise(0)
        .alias("cause"),
        (
            (
                F.least(
                    F.coalesce(F.col("fp"), F.lit(9e18)),
                    F.coalesce(F.col("fc"), F.lit(9e18)),
                )
                - F.col("start_us")
            )
            / 3.6e9
        ).alias("th"),
    ).localCheckpoint(eager=False)
    horizons = spark.createDataFrame([(6,), (12,), (24,), (48,), (96,)], ["h"])
    n_all = typed.agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(horizons)
        .crossJoin(typed)
        .crossJoin(F.broadcast(n_all))
        .groupBy("h", "n")
        .agg(
            r6(
                F.sum(
                    F.when(
                        (F.col("cause") == 1) & (F.col("th") <= F.col("h")), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.col("n")
            ).alias("cif_purchase"),
            r6(
                F.sum(
                    F.when(
                        (F.col("cause") == 2) & (F.col("th") <= F.col("h")), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.col("n")
            ).alias("cif_click"),
            r6(
                F.sum(
                    F.when(
                        (F.col("cause") > 0) & (F.col("th") <= F.col("h")), 1
                    ).otherwise(0)
                )
                * 1.0
                / F.col("n")
            ).alias("cif_any"),
        )
        .select(
            F.col("h").cast("bigint").alias("horizon_hours"),
            "cif_purchase",
            "cif_click",
            "cif_any",
        )
        .orderBy("horizon_hours")
    )
