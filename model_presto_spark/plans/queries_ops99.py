"""Conformance queries batch #99 (q689+) — GARCH filtering, welfare
triangles, classical cipher cracking, random-matrix eigenvalue
tests, and certainty equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q689 — GARCH(1,1) conditional-variance filter
# ---------------------------------------------------------------------------
# Daily revenue returns filtered through sigma2_t = omega + 0.1
# r_{t-1}^2 + 0.85 sigma2_{t-1} with variance targeting (omega =
# 0.05 var_bar): the volatility clustering path as a fold, reporting
# final / peak / mean conditional vol — the econometrician's vol
# filter beside EWMA (q134) and OU calibration (q654).
def _garch_fold(el, rv: str) -> str:
    s2 = f"(omega + 0.1 * {rv} * {rv} + 0.85 * {el(1)})"
    return ", ".join(
        [
            s2,
            f"GREATEST({el(2)}, {s2})",
            f"{el(3)} + {s2}",
        ]
    )


_Q689_ORACLE = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t, x
      FROM (SELECT EXTRACT(day FROM ts) AS d,
                   SUM(ROUND(value * 100)) AS x
            FROM events GROUP BY EXTRACT(day FROM ts))
    ), rets AS MATERIALIZED (
      SELECT t, x * 1.0 / LAG(x) OVER (ORDER BY t) - 1 AS r
      FROM daily QUALIFY LAG(x) OVER (ORDER BY t) IS NOT NULL
    ), vb AS (
      SELECT AVG(r * r) - AVG(r) * AVG(r) AS v, COUNT(*) AS n FROM rets
    ), folded AS (
      SELECT v.v, v.n,
             list_reduce(
               list_prepend([v.v, v.v, CAST(0 AS DOUBLE)],
                            list(r2 ORDER BY t)),
               (acc, x) -> [{_garch_fold(lambda k: f'acc[{k}]', 'x[1]')}]
             ) AS f
      FROM (SELECT t, [r] AS r2,
                   0.05 * (SELECT v FROM vb) AS omega
            FROM rets) q, vb v
      GROUP BY v.v, v.n, omega
    )
    SELECT CAST(n AS BIGINT) AS n_returns,
           ROUND(SQRT(v) + 5e-12, 6) AS longrun_vol,
           ROUND(SQRT(f[1]) + 5e-12, 6) AS final_vol,
           ROUND(SQRT(f[2]) + 5e-12, 6) AS peak_vol,
           ROUND(SQRT(f[3] / n) + 5e-12, 6) AS rms_vol,
           ROUND(CAST(0.95 AS DOUBLE) + 5e-12, 6) AS persistence
    FROM folded
"""


@register(
    "q689_garch_filter",
    _Q689_ORACLE,
    doc="GARCH(1,1) filter with variance targeting (alpha 0.1, beta "
    "0.85): daily-return conditional variances as a fold, final / "
    "peak / RMS vol vs the long-run level — volatility clustering "
    "beside EWMA smoothing (q134) and OU half-life (q654).",
)
def q689(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).alias("x")
    ).select(F.row_number().over(Window.orderBy("d")).alias("t"), "x")
    rets = daily.select(
        "t",
        (F.col("x") * 1.0 / F.lag("x").over(Window.orderBy("t")) - 1).alias(
            "r"
        ),
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    vb = rets.agg(
        (F.avg(F.col("r") * F.col("r")) - F.avg("r") * F.avg("r")).alias("v"),
        F.count(F.lit(1)).alias("n"),
    )
    fold = (
        "aggregate(xs, array(v, v, CAST(0 AS DOUBLE)), (acc, x) -> array("
        + _garch_fold(lambda k: f"element_at(acc, {k})", "element_at(x, 1)")
        + "))"
    )
    folded = (
        rets.crossJoin(F.broadcast(vb))
        .groupBy("v", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "r"))),
                lambda s: F.array(s["r"]),
            ).alias("xs")
        )
        .select(
            "v",
            "n",
            (0.05 * F.col("v")).alias("omega"),
            "xs",
        )
        .select("v", "n", F.expr(fold).alias("f"))
    )
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    return folded.select(
        F.col("n").cast("bigint").alias("n_returns"),
        r6(F.sqrt("v")).alias("longrun_vol"),
        r6(F.sqrt(fe(1))).alias("final_vol"),
        r6(F.sqrt(fe(2))).alias("peak_vol"),
        r6(F.sqrt(fe(3) / F.col("n"))).alias("rms_vol"),
        r6(F.lit(0.95)).alias("persistence"),
    )


# ---------------------------------------------------------------------------
# Q690 — consumer surplus and deadweight loss of a price increase
# ---------------------------------------------------------------------------
# A linear demand curve fit across parts (units sold on retail
# price), evaluated at the mean price: consumer surplus as the
# demand triangle, the welfare loss of a 10% price rise split into
# transfer and deadweight triangle — the surplus accounting above
# raw elasticity (q389) and monopoly pricing (q517).
_Q690_ORACLE = """
    WITH dem AS MATERIALIZED (
      SELECT ROUND(p.p_retailprice) AS price,
             SUM(l.l_quantity) AS q
      FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      GROUP BY ROUND(p.p_retailprice)
    ), fit AS (
      SELECT COUNT(*) AS n, AVG(price) AS mp, AVG(q) AS mq,
             (SUM(price * q) - COUNT(*) * AVG(price) * AVG(q))
               / (SUM(price * price)
                  - COUNT(*) * AVG(price) * AVG(price)) AS b
      FROM dem
    ), welfare AS (
      SELECT n, mp, mq, b,
             mq - b * mp AS a,
             mq + b * (mp * 1.1 - mp) AS q_new
      FROM fit
    )
    SELECT CAST(n AS BIGINT) AS n_price_points,
           ROUND(b + 5e-12, 6) AS demand_slope,
           b < 0 AS downward_sloping,
           ROUND(CASE WHEN b < 0
                      THEN 0.5 * mq * (a / (-b) - mp) END + 5e-10, 4)
             AS consumer_surplus,
           ROUND(CASE WHEN b < 0
                      THEN q_new * (mp * 0.1) END + 5e-10, 4)
             AS transfer_to_seller,
           ROUND(CASE WHEN b < 0
                      THEN 0.5 * (mq - q_new) * (mp * 0.1) END + 5e-10, 4)
             AS deadweight_loss
    FROM welfare
"""


@register(
    "q690_deadweight_loss",
    _Q690_ORACLE,
    doc="Welfare triangles: linear demand fit (units on rounded "
    "retail price), consumer surplus at the mean price, and a 10% "
    "price rise split into seller transfer and Harberger deadweight "
    "triangle (guarded on a downward slope) — surplus accounting "
    "above elasticity (q389) and monopoly price (q517).",
)
def q690(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    dem = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.round("p_retailprice").alias("price"))
        .agg(F.sum("l_quantity").alias("q"))
    )
    n = F.count(F.lit(1))
    fit = dem.agg(
        n.alias("n"),
        F.avg("price").alias("mp"),
        F.avg("q").alias("mq"),
        (
            (F.sum(F.col("price") * F.col("q")) - n * F.avg("price") * F.avg("q"))
            / (
                F.sum(F.col("price") * F.col("price"))
                - n * F.avg("price") * F.avg("price")
            )
        ).alias("b"),
    )
    welfare = fit.select(
        "n",
        "mp",
        "mq",
        "b",
        (F.col("mq") - F.col("b") * F.col("mp")).alias("a"),
        (F.col("mq") + F.col("b") * (F.col("mp") * 1.1 - F.col("mp"))).alias(
            "q_new"
        ),
    )
    down = F.col("b") < 0
    return welfare.select(
        F.col("n").cast("bigint").alias("n_price_points"),
        r6(F.col("b")).alias("demand_slope"),
        down.alias("downward_sloping"),
        F.round(
            F.when(
                down,
                0.5 * F.col("mq") * (F.col("a") / (-F.col("b")) - F.col("mp")),
            )
            + F.lit(5e-10),
            4,
        ).alias("consumer_surplus"),
        F.round(
            F.when(down, F.col("q_new") * (F.col("mp") * 0.1)) + F.lit(5e-10),
            4,
        ).alias("transfer_to_seller"),
        F.round(
            F.when(
                down, 0.5 * (F.col("mq") - F.col("q_new")) * (F.col("mp") * 0.1)
            )
            + F.lit(5e-10),
            4,
        ).alias("deadweight_loss"),
    )


# ---------------------------------------------------------------------------
# Q691 — cracking a Caesar cipher by chi-square frequency analysis
# ---------------------------------------------------------------------------
# The lowest-id English document's letters are Caesar-shifted by a
# data-derived key; trying all 26 shifts against the standard
# English letter-frequency table and minimizing chi-square recovers
# the key — classical cryptanalysis in one groupBy, beside Shamir
# (q686) and Hamming (q681).
_ENG_FREQ = [
    ("a", 0.08167), ("b", 0.01492), ("c", 0.02782), ("d", 0.04253),
    ("e", 0.12702), ("f", 0.02228), ("g", 0.02015), ("h", 0.06094),
    ("i", 0.06966), ("j", 0.00153), ("k", 0.00772), ("l", 0.04025),
    ("m", 0.02406), ("n", 0.06749), ("o", 0.07507), ("p", 0.01929),
    ("q", 0.00095), ("r", 0.05987), ("s", 0.06327), ("t", 0.09056),
    ("u", 0.02758), ("v", 0.00978), ("w", 0.02360), ("x", 0.00150),
    ("y", 0.01974), ("z", 0.00074),
]

_FREQ_VALUES_DUCK = ", ".join(
    (
        f"(CAST({i} AS BIGINT), CAST({f} AS DOUBLE))"
        if i == 0
        else f"({i}, {f})"
    )
    for i, (_, f) in enumerate(_ENG_FREQ)
)

_Q691_ORACLE = f"""
    WITH key_k AS (
      SELECT CAST(COUNT(*) % 25 + 1 AS BIGINT) AS k0 FROM orders
    ), doc AS MATERIALIZED (
      SELECT SUBSTR(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'),
                    1, 200) AS s
      FROM documents WHERE lang = 'en' ORDER BY doc_id LIMIT 1
    ), letters AS MATERIALIZED (
      SELECT ascii(SUBSTR(d.s, g.i, 1)) - 97 AS li
      FROM doc d CROSS JOIN (SELECT UNNEST(range(1, 201)) AS i) g
      WHERE g.i <= LENGTH(d.s)
    ), cnt AS MATERIALIZED (
      SELECT (li + (SELECT k0 FROM key_k)) % 26 AS ci, COUNT(*) AS c
      FROM letters GROUP BY 1
    ), nn AS (
      SELECT SUM(c) AS n FROM cnt
    ), freq AS (
      SELECT * FROM (VALUES {_FREQ_VALUES_DUCK}) AS t(fi, ef)
    ), chi AS MATERIALIZED (
      SELECT s.sh,
             SUM(POW(COALESCE(c2.c, 0) - f.ef * nn.n, 2)
                 / (f.ef * nn.n)) AS chi2
      FROM (SELECT UNNEST(range(0, 26)) AS sh) s
      CROSS JOIN freq f
      CROSS JOIN nn
      LEFT JOIN cnt c2 ON c2.ci = (f.fi + s.sh) % 26
      GROUP BY s.sh, nn.n
    ), best AS (
      SELECT sh, chi2 FROM chi
      ORDER BY ROUND(chi2 + 5e-10, 4), sh LIMIT 1
    )
    SELECT k.k0 AS true_shift,
           CAST(b.sh AS BIGINT) AS recovered_shift,
           b.sh = k.k0 AS cracked,
           ROUND(b.chi2 + 5e-10, 4) AS chi2_best,
           ROUND((SELECT chi2 FROM chi WHERE sh = 0) + 5e-10, 4)
             AS chi2_unshifted
    FROM best b, key_k k
"""


@register(
    "q691_caesar_crack",
    _Q691_ORACLE,
    doc="Caesar cipher cracked by frequency analysis: a data-derived "
    "shift applied to an English document's letter counts, all 26 "
    "candidate shifts scored by chi-square against the standard "
    "English frequency table, argmin recovering the key — "
    "classical cryptanalysis beside Shamir (q686).",
)
def q691(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = _t(spark, sf_dir, "documents")
    key_k = o.agg((F.count(F.lit(1)) % 25 + 1).alias("k0"))
    doc = (
        d.filter(F.col("lang") == "en")
        .orderBy("doc_id")
        .limit(1)
        .select(
            F.substring(
                F.regexp_replace(F.lower("text"), "[^a-z]", ""), 1, 200
            ).alias("s")
        )
    )
    idx = spark.range(1, 201).select(F.col("id").cast("int").alias("i"))
    letters = (
        doc.crossJoin(F.broadcast(idx))
        .filter(F.col("i") <= F.length("s"))
        .select((F.ascii(F.expr("substr(s, i, 1)")) - 97).alias("li"))
    )
    cnt = (
        letters.crossJoin(F.broadcast(key_k))
        .groupBy(((F.col("li") + F.col("k0")) % 26).alias("ci"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    nn = cnt.agg(F.sum("c").alias("n"))
    freq = spark.createDataFrame(
        [(i, f) for i, (_, f) in enumerate(_ENG_FREQ)], ["fi", "ef"]
    )
    shifts = spark.range(0, 26).select(F.col("id").cast("int").alias("sh"))
    chi = (
        F.broadcast(shifts)
        .crossJoin(F.broadcast(freq))
        .crossJoin(F.broadcast(nn))
        .join(
            cnt,
            F.col("ci") == (F.col("fi") + F.col("sh")) % 26,
            "left",
        )
        .groupBy("sh", "n")
        .agg(
            F.sum(
                F.pow(
                    F.coalesce(F.col("c"), F.lit(0)) - F.col("ef") * F.col("n"),
                    2,
                )
                / (F.col("ef") * F.col("n"))
            ).alias("chi2")
        )
        .localCheckpoint(eager=False)
    )
    best = chi.orderBy(
        F.round(F.col("chi2") + F.lit(5e-10), 4), "sh"
    ).limit(1)
    chi0 = chi.filter(F.col("sh") == 0).select(
        F.col("chi2").alias("chi2_0")
    )
    return (
        best.crossJoin(F.broadcast(key_k))
        .crossJoin(F.broadcast(chi0))
        .select(
            F.col("k0").cast("bigint").alias("true_shift"),
            F.col("sh").cast("bigint").alias("recovered_shift"),
            (F.col("sh") == F.col("k0")).alias("cracked"),
            F.round(F.col("chi2") + F.lit(5e-10), 4).alias("chi2_best"),
            F.round(F.col("chi2_0") + F.lit(5e-10), 4).alias(
                "chi2_unshifted"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q693 — Marchenko-Pastur test on the return correlation matrix
# ---------------------------------------------------------------------------
# The five nation-bloc return correlation matrix's top eigenvalue
# (40-round power-iteration fold with per-step normalization) vs
# the Marchenko-Pastur upper edge (1 + sqrt(p/T))^2: an eigenvalue
# above the noise band is real common structure — random matrix
# theory guarding the shrinkage (q626) and min-variance (q403)
# stack.
def _mp_fold(el) -> str:
    comps = []
    for i in range(1, 6):
        comps.append(
            "("
            + " + ".join(f"c_{i}_{j} * {el(j)}" for j in range(1, 6))
            + ")"
        )
    nrm = "SQRT(" + " + ".join(f"{c} * {c}" for c in comps) + ")"
    return ", ".join(f"{c} / {nrm}" for c in comps)


_Q693_ORACLE = f"""
    WITH nd AS MATERIALIZED (
      SELECT c.c_nationkey % 5 AS a, EXTRACT(day FROM e.ts) AS d,
             SUM(ROUND(e.value * 100)) AS rev
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey % 5, EXTRACT(day FROM e.ts)
    ), rr AS MATERIALIZED (
      SELECT a, d, rev * 1.0 / LAG(rev) OVER (PARTITION BY a ORDER BY d)
               - 1 AS r
      FROM nd QUALIFY LAG(rev) OVER (PARTITION BY a ORDER BY d) IS NOT NULL
    ), pairs AS MATERIALIZED (
      SELECT x.a AS i, y.a AS j, corr(x.r, y.r) AS rho
      FROM rr x JOIN rr y ON y.d = x.d
      GROUP BY x.a, y.a
    ), tlen AS (
      SELECT COUNT(*) * 1.0 / 5 AS t FROM rr
    ), cmat AS (
      SELECT {", ".join(
        f"MAX(CASE WHEN i = {i - 1} AND j = {j - 1} THEN rho END)"
        f" AS c_{i}_{j}" for i in range(1, 6) for j in range(1, 6))}
      FROM pairs
    ), folded AS (
      SELECT *,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE), 0.8, 0.6, 0.4, 0.2],
                            list_transform(range(1, 41),
                                           t -> [CAST(t AS DOUBLE),
                                                 0, 0, 0, 0])),
               (acc, x) -> [{_mp_fold(lambda k: f'acc[{k}]')}]
             ) AS v
      FROM cmat
    ), ray AS (
      SELECT f.*, t.t,
             {" + ".join(
               " + ".join(
                 f"f.v[{i}] * f.c_{i}_{j} * f.v[{j}]"
                 for j in range(1, 6))
               for i in range(1, 6))} AS lam1
      FROM folded f, tlen t
    )
    SELECT ROUND(lam1 + 5e-12, 6) AS lambda_1,
           ROUND(POW(1 + SQRT(5 / t), 2) + 5e-12, 6) AS mp_upper_edge,
           ROUND(5 / t + 5e-12, 6) AS q_ratio,
           lam1 > POW(1 + SQRT(5 / t), 2) AS genuine_structure,
           ROUND(ABS(v[1] + v[2] + v[3] + v[4] + v[5])
                 / SQRT(5.0) + 5e-12, 6) AS market_mode_alignment
    FROM ray
"""


@register(
    "q693_marchenko_pastur",
    _Q693_ORACLE,
    doc="Marchenko-Pastur eigenvalue test: top eigenvalue of the "
    "5-bloc return correlation matrix by a normalized power-"
    "iteration fold vs the (1 + sqrt(p/T))^2 noise edge, with the "
    "market-mode alignment of the eigenvector — random matrix "
    "theory over the shrinkage (q626) / min-variance (q403) stack.",
)
def q693(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            (F.col("c_nationkey") % 5).alias("a"), F.dayofmonth("ts").alias("d")
        )
        .agg(F.sum(F.round(F.col("value") * 100)).alias("rev"))
    )
    w = Window.partitionBy("a").orderBy("d")
    rr = nd.select(
        "a",
        "d",
        (F.col("rev") * 1.0 / F.lag("rev").over(w) - 1).alias("r"),
    ).filter(F.col("r").isNotNull()).localCheckpoint(eager=False)
    x = rr.select(F.col("a").alias("i"), "d", F.col("r").alias("ri"))
    y = rr.select(F.col("a").alias("j"), "d", F.col("r").alias("rj"))
    pairs = (
        x.join(y, "d")
        .groupBy("i", "j")
        .agg(F.corr("ri", "rj").alias("rho"))
    )
    tlen = rr.agg((F.count(F.lit(1)) * 1.0 / 5).alias("t"))
    cmat = pairs.agg(
        *[
            F.max(
                F.when(
                    (F.col("i") == i - 1) & (F.col("j") == j - 1), F.col("rho")
                )
            ).alias(f"c_{i}_{j}")
            for i in range(1, 6)
            for j in range(1, 6)
        ]
    )
    fold = (
        "aggregate(transform(sequence(1, 40), "
        "t -> array(CAST(t AS DOUBLE), 0, 0, 0, 0)), "
        "array(CAST(1 AS DOUBLE), 0.8, 0.6, 0.4, 0.2), "
        "(acc, x) -> array("
        + _mp_fold(lambda k: f"element_at(acc, {k})")
        + "))"
    )
    folded = cmat.select("*", F.expr(fold).alias("v"))
    ve = lambda k: F.element_at("v", k)  # noqa: E731
    lam1 = sum(
        (
            ve(i) * F.col(f"c_{i}_{j}") * ve(j)
            for i in range(1, 6)
            for j in range(1, 6)
            if not (i == 1 and j == 1)
        ),
        ve(1) * F.col("c_1_1") * ve(1),
    )
    edge = F.pow(1 + F.sqrt(5 / F.col("t")), 2)
    return folded.crossJoin(F.broadcast(tlen)).select(
        r6(lam1).alias("lambda_1"),
        r6(edge).alias("mp_upper_edge"),
        r6(5 / F.col("t")).alias("q_ratio"),
        (lam1 > edge).alias("genuine_structure"),
        r6(
            F.abs(ve(1) + ve(2) + ve(3) + ve(4) + ve(5)) / F.sqrt(F.lit(5.0))
        ).alias("market_mode_alignment"),
    )


# ---------------------------------------------------------------------------
# Q694 — CRRA certainty equivalents of the daily revenue lottery
# ---------------------------------------------------------------------------
# Treating daily revenue as a lottery, the certainty equivalent
# under CRRA utility: gamma 0.5 -> (E sqrt x)^2, gamma 1 -> the
# geometric mean, gamma 2 -> the harmonic mean; the risk premium
# mean - CE prices the volatility — decision theory under the Kelly
# (q565) and newsvendor (q417) policies.
_Q694_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
      FROM events GROUP BY EXTRACT(day FROM ts)
    ), stats AS (
      SELECT AVG(x) AS mu,
             POW(AVG(SQRT(x)), 2) AS ce_half,
             EXP(AVG(LN(x))) AS ce_one,
             1 / AVG(1 / x) AS ce_two
      FROM daily
    ), rows_g AS (
      SELECT CAST(0.5 AS DOUBLE) AS gamma, ce_half AS ce, mu FROM stats
      UNION ALL
      SELECT 1.0, ce_one, mu FROM stats
      UNION ALL
      SELECT 2.0, ce_two, mu FROM stats
    )
    SELECT ROUND(gamma + 5e-12, 6) AS gamma,
           ROUND(ce + 5e-10, 4) AS certainty_equivalent,
           ROUND(mu - ce + 5e-10, 4) AS risk_premium,
           ROUND((mu - ce) / mu + 5e-12, 6) AS premium_share
    FROM rows_g
    ORDER BY gamma
"""


@register(
    "q694_certainty_equivalent",
    _Q694_ORACLE,
    doc="CRRA certainty equivalents of the daily revenue lottery: "
    "gamma 0.5/1/2 giving the squared-sqrt-mean, geometric and "
    "harmonic means, risk premium mu - CE and its share — decision "
    "theory under Kelly sizing (q565) and newsvendor stocking "
    "(q417).",
)
def q694(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    stats = daily.agg(
        F.avg("x").alias("mu"),
        F.pow(F.avg(F.sqrt("x")), 2).alias("ce_half"),
        F.exp(F.avg(F.log("x"))).alias("ce_one"),
        (1 / F.avg(1 / F.col("x"))).alias("ce_two"),
    )
    rows = (
        stats.select(
            F.lit(0.5).alias("gamma"), F.col("ce_half").alias("ce"), "mu"
        )
        .unionAll(
            stats.select(
                F.lit(1.0).alias("gamma"), F.col("ce_one").alias("ce"), "mu"
            )
        )
        .unionAll(
            stats.select(
                F.lit(2.0).alias("gamma"), F.col("ce_two").alias("ce"), "mu"
            )
        )
    )
    return rows.select(
        r6(F.col("gamma")).alias("gamma"),
        F.round(F.col("ce") + F.lit(5e-10), 4).alias("certainty_equivalent"),
        F.round(F.col("mu") - F.col("ce") + F.lit(5e-10), 4).alias(
            "risk_premium"
        ),
        r6((F.col("mu") - F.col("ce")) / F.col("mu")).alias("premium_share"),
    ).orderBy("gamma")
