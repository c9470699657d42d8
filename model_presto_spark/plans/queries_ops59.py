"""Conformance queries batch #59 (q489+) — Galton-Watson extinction,
two-component Gaussian EM, Johnson-Lindenstrauss projection audit,
maximal-marginal-relevance re-ranking, and embedding quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q489 — Galton-Watson extinction probability
# ---------------------------------------------------------------------------
# Offspring distribution = first-week purchase counts per user capped
# at 3; the branching process dies out with probability q = smallest
# fixed point of the PGF G(s) = p0 + p1 s + p2 s^2 + p3 s^3, found
# by 30 fixed-point steps from 0 inside one fold.  The analytic
# counterpart of the cascade simulations (q404/q405): m <= 1 means
# certain extinction, m > 1 leaves survival probability 1 - q.
_Q489_ORACLE = """
    WITH allu AS (
      SELECT DISTINCT user_id FROM events
    ), wk AS (
      SELECT a.user_id,
             LEAST(COALESCE(p.c, 0), 3) AS k
      FROM allu a LEFT JOIN (
        SELECT user_id, COUNT(*) AS c FROM events
        WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 7
        GROUP BY user_id) p ON p.user_id = a.user_id
    ), pd AS (
      SELECT SUM(CASE WHEN k = 0 THEN 1.0 ELSE 0 END) / COUNT(*) AS p0,
             SUM(CASE WHEN k = 1 THEN 1.0 ELSE 0 END) / COUNT(*) AS p1,
             SUM(CASE WHEN k = 2 THEN 1.0 ELSE 0 END) / COUNT(*) AS p2,
             SUM(CASE WHEN k = 3 THEN 1.0 ELSE 0 END) / COUNT(*) AS p3
      FROM wk
    ), it AS (
      SELECT p0, p1, p2, p3,
        list_reduce(
          list_prepend([CAST(0.0 AS DOUBLE)],
            list_transform(generate_series(1, 30),
                           z -> [CAST(z AS DOUBLE)])),
          (s, z) -> [p0 + p1 * s[1] + p2 * s[1] * s[1]
                     + p3 * s[1] * s[1] * s[1]]
        )[1] AS q
      FROM pd
    )
    SELECT ROUND(p1 + 2 * p2 + 3 * p3 + 5e-12, 6) AS mean_offspring,
           ROUND(p0 + 5e-12, 6) AS p_zero,
           ROUND(q + 5e-12, 6) AS extinction_prob,
           ROUND(1 - q + 5e-12, 6) AS survival_prob,
           ROUND(ABS(q - (p0 + p1 * q + p2 * q * q + p3 * q * q * q))
                 + 5e-12, 6) AS fixed_point_residual,
           (p1 + 2 * p2 + 3 * p3) > 1 AS supercritical
    FROM it
"""


@register(
    "q489_galton_watson",
    _Q489_ORACLE,
    doc="Galton-Watson extinction probability from the measured "
    "offspring distribution (week-1 purchase counts capped at 3): "
    "30 PGF fixed-point steps in one fold, survival probability "
    "and the fixed-point residual as the convergence audit — the "
    "analytic branching-process counterpart of the cascade "
    "simulations (q404/q405).",
)
def q489(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    allu = ev.select("user_id").distinct()
    p = (
        ev.filter((F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 7))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wk = allu.join(p, "user_id", "left").select(
        F.least(F.coalesce(F.col("c"), F.lit(0)), F.lit(3)).alias("k")
    )
    n = F.count(F.lit(1))
    pd_ = wk.agg(
        (F.sum(F.when(F.col("k") == 0, 1.0).otherwise(0.0)) / n).alias("p0"),
        (F.sum(F.when(F.col("k") == 1, 1.0).otherwise(0.0)) / n).alias("p1"),
        (F.sum(F.when(F.col("k") == 2, 1.0).otherwise(0.0)) / n).alias("p2"),
        (F.sum(F.when(F.col("k") == 3, 1.0).otherwise(0.0)) / n).alias("p3"),
    )
    g = lambda s: (  # noqa: E731
        F.col("p0")
        + F.col("p1") * s
        + F.col("p2") * s * s
        + F.col("p3") * s * s * s
    )
    it = pd_.select(
        "p0",
        "p1",
        "p2",
        "p3",
        F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda z: F.array(z.cast("double")),
                ),
                F.array(F.lit(0.0)),
                lambda s, z: F.array(g(F.element_at(s, 1))),
            ),
            1,
        ).alias("q"),
    )
    q = F.col("q")
    m = F.col("p1") + 2 * F.col("p2") + 3 * F.col("p3")
    return it.select(
        r6(m).alias("mean_offspring"),
        r6(F.col("p0")).alias("p_zero"),
        r6(q).alias("extinction_prob"),
        r6(1 - q).alias("survival_prob"),
        r6(F.abs(q - g(q))).alias("fixed_point_residual"),
        (m > 1).alias("supercritical"),
    )


# ---------------------------------------------------------------------------
# Q490 — two-component Gaussian mixture by unrolled EM
# ---------------------------------------------------------------------------
# Five E/M rounds on order prices from quartile-split initialization:
# the E-step responsibilities are row expressions, each M-step is one
# aggregate of weighted moments — EM with zero iteration framework.
# Means/sigmas in dollars at 2dp and the mixing weight at 6dp keep
# the cross-engine float-sum noise far below the rounding grid.
_Q490_ORACLE = """
    WITH x AS MATERIALIZED (
      SELECT o_totalprice AS v FROM orders
    ), init AS (
      SELECT quantile_cont(v, 0.25) AS mu1, quantile_cont(v, 0.75) AS mu2,
             stddev_pop(v) AS sg, CAST(0.5 AS DOUBLE) AS w
      FROM x
    ), e1 AS MATERIALIZED (
      SELECT SUM(r) AS sr, SUM(r * v) AS srx, SUM(r * v * v) AS srxx,
             SUM(1 - r) AS sq, SUM((1 - r) * v) AS sqx,
             SUM((1 - r) * v * v) AS sqxx, COUNT(*) AS n
      FROM (
        SELECT v, w * EXP(-(v - mu1) * (v - mu1) / (2 * sg * sg)) / sg
                 / (w * EXP(-(v - mu1) * (v - mu1) / (2 * sg * sg)) / sg
                    + (1 - w) * EXP(-(v - mu2) * (v - mu2)
                                    / (2 * sg * sg)) / sg) AS r
        FROM x, init)
    ), p1 AS (
      SELECT sr / n AS w, srx / sr AS mu1,
             SQRT(srxx / sr - (srx / sr) * (srx / sr)) AS s1,
             sqx / sq AS mu2,
             SQRT(sqxx / sq - (sqx / sq) * (sqx / sq)) AS s2
      FROM e1
    ), e2 AS MATERIALIZED (
      SELECT SUM(r) AS sr, SUM(r * v) AS srx, SUM(r * v * v) AS srxx,
             SUM(1 - r) AS sq, SUM((1 - r) * v) AS sqx,
             SUM((1 - r) * v * v) AS sqxx, COUNT(*) AS n
      FROM (
        SELECT v, w * EXP(-(v - mu1) * (v - mu1) / (2 * s1 * s1)) / s1
                 / (w * EXP(-(v - mu1) * (v - mu1) / (2 * s1 * s1)) / s1
                    + (1 - w) * EXP(-(v - mu2) * (v - mu2)
                                    / (2 * s2 * s2)) / s2) AS r
        FROM x, p1)
    ), p2 AS (
      SELECT sr / n AS w, srx / sr AS mu1,
             SQRT(srxx / sr - (srx / sr) * (srx / sr)) AS s1,
             sqx / sq AS mu2,
             SQRT(sqxx / sq - (sqx / sq) * (sqx / sq)) AS s2
      FROM e2
    ), e3 AS MATERIALIZED (
      SELECT SUM(r) AS sr, SUM(r * v) AS srx, SUM(r * v * v) AS srxx,
             SUM(1 - r) AS sq, SUM((1 - r) * v) AS sqx,
             SUM((1 - r) * v * v) AS sqxx, COUNT(*) AS n
      FROM (
        SELECT v, w * EXP(-(v - mu1) * (v - mu1) / (2 * s1 * s1)) / s1
                 / (w * EXP(-(v - mu1) * (v - mu1) / (2 * s1 * s1)) / s1
                    + (1 - w) * EXP(-(v - mu2) * (v - mu2)
                                    / (2 * s2 * s2)) / s2) AS r
        FROM x, p2)
    ), p3 AS (
      SELECT sr / n AS w, srx / sr AS mu1,
             SQRT(srxx / sr - (srx / sr) * (srx / sr)) AS s1,
             sqx / sq AS mu2,
             SQRT(sqxx / sq - (sqx / sq) * (sqx / sq)) AS s2
      FROM e3
    )
    SELECT ROUND(w + 5e-12, 6) AS weight_1,
           ROUND(mu1 + 5e-8, 2) AS mu1_usd,
           ROUND(s1 + 5e-8, 2) AS sigma1_usd,
           ROUND(mu2 + 5e-8, 2) AS mu2_usd,
           ROUND(s2 + 5e-8, 2) AS sigma2_usd
    FROM p3
"""


@register(
    "q490_gaussian_em",
    _Q490_ORACLE,
    doc="Two-component Gaussian mixture fitted by three unrolled EM "
    "rounds from quartile initialization: E-step responsibilities "
    "as row expressions, M-steps as weighted-moment aggregates — "
    "the canonical latent-variable algorithm with zero driver "
    "iteration (Lloyd q268 is its hard-assignment special case).",
)
def q490(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    x = o.select(F.col("o_totalprice").alias("v")).localCheckpoint(eager=False)
    init = x.agg(
        F.percentile("v", F.lit(0.25)).alias("mu1"),
        F.percentile("v", F.lit(0.75)).alias("mu2"),
        F.stddev_pop("v").alias("sg"),
    ).select("mu1", "mu2", F.col("sg").alias("s1"), F.col("sg").alias("s2"),
             F.lit(0.5).alias("w"))
    params = init
    for _ in range(3):
        v = F.col("v")
        d1 = (
            F.col("w")
            * F.exp(-(v - F.col("mu1")) * (v - F.col("mu1"))
                    / (2 * F.col("s1") * F.col("s1")))
            / F.col("s1")
        )
        d2 = (
            (1 - F.col("w"))
            * F.exp(-(v - F.col("mu2")) * (v - F.col("mu2"))
                    / (2 * F.col("s2") * F.col("s2")))
            / F.col("s2")
        )
        r = d1 / (d1 + d2)
        e = x.crossJoin(F.broadcast(params)).select("v", r.alias("r")).agg(
            F.sum("r").alias("sr"),
            F.sum(F.col("r") * F.col("v")).alias("srx"),
            F.sum(F.col("r") * F.col("v") * F.col("v")).alias("srxx"),
            F.sum(1 - F.col("r")).alias("sq"),
            F.sum((1 - F.col("r")) * F.col("v")).alias("sqx"),
            F.sum((1 - F.col("r")) * F.col("v") * F.col("v")).alias("sqxx"),
            F.count(F.lit(1)).alias("n"),
        )
        params = e.select(
            (F.col("sr") / F.col("n")).alias("w"),
            (F.col("srx") / F.col("sr")).alias("mu1"),
            F.sqrt(
                F.col("srxx") / F.col("sr")
                - (F.col("srx") / F.col("sr")) * (F.col("srx") / F.col("sr"))
            ).alias("s1"),
            (F.col("sqx") / F.col("sq")).alias("mu2"),
            F.sqrt(
                F.col("sqxx") / F.col("sq")
                - (F.col("sqx") / F.col("sq")) * (F.col("sqx") / F.col("sq"))
            ).alias("s2"),
        )
    r2 = lambda c: F.round(c + F.lit(5e-8), 2)  # noqa: E731
    return params.select(
        r6(F.col("w")).alias("weight_1"),
        r2(F.col("mu1")).alias("mu1_usd"),
        r2(F.col("s1")).alias("sigma1_usd"),
        r2(F.col("mu2")).alias("mu2_usd"),
        r2(F.col("s2")).alias("sigma2_usd"),
    )


# ---------------------------------------------------------------------------
# Q491 — Johnson-Lindenstrauss projection distortion audit
# ---------------------------------------------------------------------------
# 64-d embeddings projected to 8-d by a hash-deterministic +-1
# matrix scaled 1/sqrt(8); pairwise squared-distance ratios on the
# sampled pairs quantify the distortion the JL lemma bounds — the
# feasibility measurement behind projecting before ANN (q40/q468).
_Q491_ORACLE = """
    WITH e AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id % 5 = 0
    ), proj AS MATERIALIZED (
      SELECT vec_id,
             list_transform(generate_series(0, 7), j ->
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(generate_series(1, 64), d ->
                   v[d] * (CASE WHEN ((d - 1) * 8 + j) * 2654435761
                                     % 4294967296 < 2147483648
                                THEN 1.0 ELSE -1.0 END))),
                 (a, b) -> a + b) / SQRT(8.0)) AS p
      FROM e
    ), pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 d -> (a.v[d] - b.v[d]) * (a.v[d] - b.v[d]))),
               (x, y) -> x + y) AS d64,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 8),
                 d -> (pa.p[d] - pb.p[d]) * (pa.p[d] - pb.p[d]))),
               (x, y) -> x + y) AS d8
      FROM e a JOIN e b ON b.vec_id > a.vec_id
      JOIN proj pa ON pa.vec_id = a.vec_id
      JOIN proj pb ON pb.vec_id = b.vec_id
    ), ratios AS (
      SELECT d8 / d64 AS ratio FROM pairs WHERE d64 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ratio) + 5e-12, 6) AS mean_ratio,
           ROUND(quantile_cont(ratio, 0.05) + 5e-12, 6) AS p05_ratio,
           ROUND(quantile_cont(ratio, 0.95) + 5e-12, 6) AS p95_ratio,
           ROUND(MAX(ABS(LN(ratio))) + 5e-12, 6) AS max_log_distortion
    FROM ratios
"""


@register(
    "q491_jl_projection",
    _Q491_ORACLE,
    doc="Johnson-Lindenstrauss audit: 64-d -> 8-d projection by a "
    "hash-deterministic +-1/sqrt(8) matrix, pairwise squared-"
    "distance ratio distribution (mean/p05/p95/max log distortion) "
    "on sampled pairs — measures what projecting before ANN "
    "(q40/q468) costs, with a fully reproducible 'random' matrix.",
)
def q491(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.io import spread

    # spread before the checkpoint: the pairwise zip_with folds below
    # (~5M interpreted lambda frames) inherit the checkpoint's
    # partitioning, and the single-file embeddings scan is 1 partition
    # at sf0.1 (the round-5 pathology #3)
    e = (
        spread(_t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint(eager=False)
    )
    sign = lambda d, j: F.when(  # noqa: E731
        ((d - 1) * 8 + j) * 2654435761 % 4294967296 < 2147483648, 1.0
    ).otherwise(-1.0)
    proj = e.select(
        "vec_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.lit(64)),
                    lambda d: F.element_at(F.col("v"), d.cast("int"))
                    * sign(d, j),
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / F.sqrt(F.lit(8.0)),
        ).alias("p"),
    )
    a = e.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    pa = proj.select(F.col("vec_id").alias("i"), F.col("p").alias("pa"))
    pb = proj.select(F.col("vec_id").alias("j"), F.col("p").alias("pb"))
    pairs = (
        a.join(F.broadcast(b), F.col("j") > F.col("i"))
        .join(pa, "i")
        .join(F.broadcast(pb), "j")
        .select(
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda x, y: x + y,
            ).alias("d64"),
            F.aggregate(
                F.zip_with("pa", "pb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda x, y: x + y,
            ).alias("d8"),
        )
    )
    ratios = pairs.filter(F.col("d64") > 0).select(
        (F.col("d8") / F.col("d64")).alias("ratio")
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        r6(F.avg("ratio")).alias("mean_ratio"),
        r6(F.percentile("ratio", F.lit(0.05))).alias("p05_ratio"),
        r6(F.percentile("ratio", F.lit(0.95))).alias("p95_ratio"),
        r6(F.max(F.abs(F.log("ratio")))).alias("max_log_distortion"),
    )


# ---------------------------------------------------------------------------
# Q492 — maximal marginal relevance re-ranking
# ---------------------------------------------------------------------------
# Retrieval diversification: 20 candidates ranked by cosine to the
# label-0 centroid, then five greedy MMR picks maximizing
# 0.7 * relevance - 0.3 * max-similarity-to-selected (unrolled
# argmax rounds, id tiebreak on bitwise-identical scores) — the
# diversity re-ranker that sits after retrieval fusion (q109) and
# before context packing (q74).
_Q492_ORACLE = """
    WITH e AS MATERIALIZED (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b)) AS nrm
      FROM embeddings
    ), ctr0 AS (
      SELECT g.d, AVG(e.v[g.d]) AS cx
      FROM e, generate_series(1, 64) g(d)
      WHERE e.label = 0 GROUP BY g.d
    ), ctr AS (
      SELECT list(cx ORDER BY d) AS c FROM ctr0
    ), ctrn AS (
      SELECT c, SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(c, x -> x * x)), (a, b) -> a + b)) AS cn
      FROM ctr
    ), rel AS MATERIALIZED (
      SELECT e.vec_id, e.v, e.nrm,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 d -> e.v[d] * ctrn.c[d])), (a, b) -> a + b)
               / (e.nrm * ctrn.cn) AS r
      FROM e, ctrn
    ), cand AS MATERIALIZED (
      SELECT vec_id, v, nrm, r,
             ROW_NUMBER() OVER (ORDER BY r DESC, vec_id) AS rk
      FROM rel
    ), c20 AS MATERIALIZED (
      SELECT * FROM cand WHERE rk <= 20
    ), sim AS MATERIALIZED (
      SELECT a.vec_id AS i, b.vec_id AS j,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 d -> a.v[d] * b.v[d])), (x, y) -> x + y)
               / (a.nrm * b.nrm) AS s
      FROM c20 a JOIN c20 b ON b.vec_id <> a.vec_id
    ), pick1 AS (
      SELECT vec_id, r FROM c20 ORDER BY r DESC, vec_id LIMIT 1
    ), pick2 AS (
      SELECT c.vec_id, c.r FROM c20 c, pick1 p1
      JOIN sim s ON s.i = c.vec_id AND s.j = p1.vec_id
      WHERE c.vec_id <> p1.vec_id
      ORDER BY 0.7 * c.r - 0.3 * s.s DESC, c.vec_id LIMIT 1
    ), pick3 AS (
      SELECT c.vec_id, c.r FROM c20 c, pick1 p1, pick2 p2
      WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id)
      ORDER BY 0.7 * c.r - 0.3 * GREATEST(
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p1.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p2.vec_id))
        DESC, c.vec_id LIMIT 1
    ), pick4 AS (
      SELECT c.vec_id, c.r FROM c20 c, pick1 p1, pick2 p2, pick3 p3
      WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id, p3.vec_id)
      ORDER BY 0.7 * c.r - 0.3 * GREATEST(
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p1.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p2.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p3.vec_id))
        DESC, c.vec_id LIMIT 1
    ), pick5 AS (
      SELECT c.vec_id, c.r FROM c20 c, pick1 p1, pick2 p2, pick3 p3,
                                 pick4 p4
      WHERE c.vec_id NOT IN (p1.vec_id, p2.vec_id, p3.vec_id, p4.vec_id)
      ORDER BY 0.7 * c.r - 0.3 * GREATEST(
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p1.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p2.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p3.vec_id),
        (SELECT s FROM sim WHERE i = c.vec_id AND j = p4.vec_id))
        DESC, c.vec_id LIMIT 1
    )
    SELECT rnk, CAST(vec_id AS BIGINT) AS vec_id,
           ROUND(r + 5e-12, 6) AS relevance
    FROM (
      SELECT 1 AS rnk, vec_id, r FROM pick1
      UNION ALL SELECT 2, vec_id, r FROM pick2
      UNION ALL SELECT 3, vec_id, r FROM pick3
      UNION ALL SELECT 4, vec_id, r FROM pick4
      UNION ALL SELECT 5, vec_id, r FROM pick5
    ) ORDER BY rnk
"""


@register(
    "q492_mmr_rerank",
    _Q492_ORACLE,
    doc="Maximal marginal relevance: top-20 candidates by cosine to "
    "the label-0 centroid, five greedy picks maximizing "
    "0.7 rel - 0.3 max-sim-to-selected (unrolled argmax rounds, "
    "bitwise-stable scores, id tiebreak) — the retrieval "
    "diversifier between fusion (q109) and packing (q74).",
)
def q492(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .select(
            "vec_id",
            "label",
            "v",
            F.sqrt(
                F.aggregate(
                    F.transform("v", lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            ).alias("nrm"),
        )
        .localCheckpoint(eager=False)
    )
    comp = e.filter(F.col("label") == 0).select(
        F.posexplode("v").alias("d0", "x")
    )
    ctr = comp.groupBy("d0").agg(F.avg("x").alias("cx"))
    ctrv = ctr.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d0", "cx"))), lambda s: s.cx
        ).alias("c")
    ).select(
        "c",
        F.sqrt(
            F.aggregate(
                F.transform("c", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            )
        ).alias("cn"),
    )
    rel = e.crossJoin(F.broadcast(ctrv)).select(
        "vec_id",
        "v",
        "nrm",
        (
            F.aggregate(
                F.zip_with("v", "c", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / (F.col("nrm") * F.col("cn"))
        ).alias("r"),
    )
    from pyspark.sql import Window

    c20 = (
        rel.select(
            "vec_id",
            "v",
            "nrm",
            "r",
            F.row_number().over(Window.orderBy(F.desc("r"), "vec_id")).alias("rk"),
        )
        .filter(F.col("rk") <= 20)
        .localCheckpoint(eager=False)
    )
    s_a = c20.select(
        F.col("vec_id").alias("i"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    s_b = c20.select(
        F.col("vec_id").alias("j"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    sim = (
        s_a.join(F.broadcast(s_b), F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            (
                F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda x, y: x + y,
                )
                / (F.col("na") * F.col("nb"))
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    picks = []
    pool = c20.select("vec_id", "r")
    for rnk in range(1, 6):
        if not picks:
            best = pool.orderBy(F.desc("r"), "vec_id").limit(1)
        else:
            sel = picks[0].select(F.col("vec_id").alias("j"))
            for pdf in picks[1:]:
                sel = sel.unionAll(pdf.select(F.col("vec_id").alias("j")))
            maxsim = (
                sim.join(F.broadcast(sel), "j")
                .groupBy("i")
                .agg(F.max("s").alias("ms"))
            )
            chosen = picks[0].select("vec_id")
            for pdf in picks[1:]:
                chosen = chosen.unionAll(pdf.select("vec_id"))
            best = (
                pool.join(chosen, "vec_id", "left_anti")
                .join(maxsim, pool.vec_id == maxsim.i)
                .orderBy(F.desc(0.7 * F.col("r") - 0.3 * F.col("ms")), "vec_id")
                .limit(1)
                .select("vec_id", "r")
            )
        # eager checkpoint per greedy round: pick k+1's plan references
        # EVERY earlier pick (chosen-set anti-join + max-sim), so an
        # un-truncated lineage re-nests the whole candidate pipeline per
        # round (plan audit: 403 scans). Each pick is one row — the
        # checkpoint job is trivial and the final plan is 5 RDD scans.
        picks.append(best.select("vec_id", "r").localCheckpoint(eager=True))
    out = None
    for rnk, pdf in enumerate(picks, 1):
        row = pdf.select(
            F.lit(rnk).alias("rnk"),
            F.col("vec_id").cast("bigint").alias("vec_id"),
            r6(F.col("r")).alias("relevance"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("rnk")


# ---------------------------------------------------------------------------
# Q493 — embedding scalar quantization (uniform vs quantile codebook)
# ---------------------------------------------------------------------------
# 4-bit-per-dimension compression of the embedding table two ways:
# uniform 16-level grid over [min, max] vs a 16-level equal-mass
# quantile codebook (bin midpoint reconstruction) — MSE and SQNR per
# scheme decide how a vector store shrinks 8x (the storage side of
# ANN q40 / IVF; JL q491 is the dimension side).
_Q493_ORACLE = """
    WITH comp AS MATERIALIZED (
      SELECT CAST(embedding[g.d] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(d)
    ), mm AS (
      SELECT MIN(x) AS lo, MAX(x) AS hi, var_pop(x) AS vr FROM comp
    ), fences AS (
      SELECT quantile_cont(x, list_transform(generate_series(1, 15),
                                             i -> i / 16.0)) AS f,
             quantile_cont(x, list_transform(generate_series(1, 16),
                                             i -> (2.0 * i - 1) / 32.0)) AS m
      FROM comp
    ), err AS (
      SELECT
        AVG((x - (lo + (FLOOR(LEAST((x - lo) * 16.0 / (hi - lo), 15.9999))
                        + 0.5) * (hi - lo) / 16.0))
            * (x - (lo + (FLOOR(LEAST((x - lo) * 16.0 / (hi - lo), 15.9999))
                          + 0.5) * (hi - lo) / 16.0))) AS mse_u,
        AVG((x - m[1 + len(list_filter(f, v -> v < x))])
            * (x - m[1 + len(list_filter(f, v -> v < x))]))
          AS mse_q
      FROM comp, mm, fences
    )
    SELECT CAST((SELECT COUNT(*) FROM comp) AS BIGINT) AS n_values,
           ROUND(err.mse_u + 5e-12, 6) AS mse_uniform,
           ROUND(err.mse_q + 5e-12, 6) AS mse_quantile,
           ROUND(10 * LN(mm.vr / err.mse_u) / LN(10.0) + 5e-10, 4)
             AS sqnr_uniform_db,
           ROUND(10 * LN(mm.vr / err.mse_q) / LN(10.0) + 5e-10, 4)
             AS sqnr_quantile_db
    FROM err, mm
"""


@register(
    "q493_embedding_quantization",
    _Q493_ORACLE,
    doc="4-bit scalar quantization of the embedding table: uniform "
    "16-level grid vs equal-mass quantile codebook (mass-midpoint "
    "reconstruction), MSE and SQNR per scheme — the 8x vector-store "
    "compression decision (JL q491 covers the dimension axis, this "
    "the precision axis).",
)
def q493(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.explode_outer(F.col("embedding").cast("array<double>")).alias("x")
    ).filter(F.col("x").isNotNull()).localCheckpoint(eager=False)
    mm = comp.agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.var_pop("x").alias("vr"),
    )
    fences = comp.agg(
        F.percentile(
            "x", F.array(*[F.lit(i / 16.0) for i in range(1, 16)])
        ).alias("f"),
        F.percentile(
            "x", F.array(*[F.lit((2.0 * i - 1) / 32.0) for i in range(1, 17)])
        ).alias("m"),
    )
    j = comp.crossJoin(F.broadcast(mm)).crossJoin(F.broadcast(fences))
    lo, hi = F.col("lo"), F.col("hi")
    recon_u = lo + (
        F.floor(F.least((F.col("x") - lo) * 16.0 / (hi - lo), F.lit(15.9999)))
        + 0.5
    ) * (hi - lo) / 16.0
    bin_q = 1 + F.size(F.filter(F.col("f"), lambda v: v < F.col("x")))
    recon_q = F.element_at(F.col("m"), bin_q.cast("int"))
    err = j.agg(
        F.avg((F.col("x") - recon_u) * (F.col("x") - recon_u)).alias("mse_u"),
        F.avg((F.col("x") - recon_q) * (F.col("x") - recon_q)).alias("mse_q"),
        F.count(F.lit(1)).alias("n_values"),
        F.first("vr").alias("vr"),
    )
    return err.select(
        F.col("n_values").cast("bigint").alias("n_values"),
        r6(F.col("mse_u")).alias("mse_uniform"),
        r6(F.col("mse_q")).alias("mse_quantile"),
        F.round(
            10 * F.log(F.col("vr") / F.col("mse_u")) / F.log(F.lit(10.0))
            + F.lit(5e-10),
            4,
        ).alias("sqnr_uniform_db"),
        F.round(
            10 * F.log(F.col("vr") / F.col("mse_q")) / F.log(F.lit(10.0))
            + F.lit(5e-10),
            4,
        ).alias("sqnr_quantile_db"),
    )
