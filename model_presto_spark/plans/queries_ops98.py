"""Conformance queries batch #98 (q684+) — open queueing networks,
absorbing Markov funnels, threshold secret sharing, position
auctions, and conjoint analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register

_JK_TYPES = ["click", "error", "signup", "view"]


# ---------------------------------------------------------------------------
# Q684 — Jackson network: traffic equations and per-station M/M/1
# ---------------------------------------------------------------------------
# Four event types are stations; external arrival rates come from
# first-events-per-user, routing probabilities from consecutive
# same-user transitions scaled by 0.5 (half the flow exits). The
# traffic equations lambda = gamma + P^T lambda converge by a
# 25-round 4-vector fold, then each station gets M/M/1 utilization
# and wait at mu = 1.25 lambda — the network layer above single
# queues (q538/q457/q672).
def _jk_fold(el) -> str:
    exprs = []
    for j in range(1, 5):
        terms = [f"g_{j}"]
        for i in range(1, 5):
            terms.append(f"p_{i}_{j} * {el(i)}")
        exprs.append(" + ".join(terms))
    return ", ".join(exprs)


def _jk_case(col: str) -> str:
    w = " ".join(
        f"WHEN '{t}' THEN {i + 1}" for i, t in enumerate(_JK_TYPES)
    )
    return f"(CASE {col} {w} END)"


_Q684_ORACLE = f"""
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
      WHERE event_type IN ('click', 'error', 'signup', 'view')
    ), hours AS (
      SELECT (MAX(us) - MIN(us)) / 3.6e9 AS h FROM ev
    ), gamma AS MATERIALIZED (
      SELECT {_jk_case('f.et')} AS st, COUNT(*) * 1.0 / hr.h AS g
      FROM (SELECT u, MIN_BY(et, us) AS et FROM ev GROUP BY u) f,
           hours hr
      GROUP BY {_jk_case('f.et')}, hr.h
    ), trans AS MATERIALIZED (
      SELECT {_jk_case('et')} AS i,
             {_jk_case('LEAD(et) OVER (PARTITION BY u ORDER BY us)')} AS j
      FROM ev
      QUALIFY LEAD(et) OVER (PARTITION BY u ORDER BY us) IS NOT NULL
    ), pmat AS (
      SELECT i, j, 0.5 * COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY i) AS p
      FROM trans GROUP BY i, j
    ), wide AS (
      SELECT {", ".join(
        f"COALESCE(MAX(CASE WHEN i = {i} AND j = {j} THEN p END), 0)"
        f" AS p_{i}_{j}" for i in range(1, 5) for j in range(1, 5))},
             {", ".join(
        f"(SELECT COALESCE(MAX(g), 0) FROM gamma WHERE st = {j})"
        f" AS g_{j}" for j in range(1, 5))}
      FROM pmat
    ), folded AS (
      SELECT *,
             list_reduce(
               list_prepend([g_1, g_2, g_3, g_4],
                            list_transform(range(1, 26),
                                           t -> [CAST(t AS DOUBLE), 0, 0, 0])),
               (acc, x) -> [{_jk_fold(lambda k: f'acc[{k}]')}]
             ) AS lam
      FROM wide
    )
    SELECT g.j AS station,
           ROUND(f.lam[g.j] * 0 + (CASE g.j
             WHEN 1 THEN f.g_1 WHEN 2 THEN f.g_2
             WHEN 3 THEN f.g_3 ELSE f.g_4 END) + 5e-12, 6)
             AS external_rate,
           ROUND(f.lam[g.j] + 5e-12, 6) AS total_rate,
           ROUND(1 / 1.25 + 5e-12, 6) AS utilization,
           ROUND(1 / (1.25 * f.lam[g.j] - f.lam[g.j]) + 5e-12, 6)
             AS mm1_sojourn_hours
    FROM folded f CROSS JOIN (SELECT UNNEST(range(1, 5)) AS j) g
    ORDER BY g.j
"""


@register(
    "q684_jackson_network",
    _Q684_ORACLE,
    doc="Jackson open network: four event-type stations, external "
    "rates from first events, routing from same-user transitions "
    "scaled 0.5, traffic equations solved by a 25-round vector "
    "fold, per-station M/M/1 sojourn at mu = 1.25 lambda — the "
    "network layer above single-queue models (q538, q457, q672).",
)
def q684(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_JK_TYPES)
    )
    st = lambda col: (  # noqa: E731
        F.when(col == "click", 1)
        .when(col == "error", 2)
        .when(col == "signup", 3)
        .otherwise(4)
    )
    ev = e.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("et"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).localCheckpoint(eager=False)
    hours = ev.agg(((F.max("us") - F.min("us")) / 3.6e9).alias("h"))
    firsts = ev.groupBy("u").agg(F.min_by("et", "us").alias("et"))
    gamma = (
        firsts.crossJoin(F.broadcast(hours))
        .groupBy(st(F.col("et")).alias("stn"), "h")
        .agg((F.count(F.lit(1)) * 1.0 / F.col("h")).alias("g"))
        .select("stn", "g")
    )
    wu = Window.partitionBy("u").orderBy("us")
    trans = ev.select(
        st(F.col("et")).alias("i"),
        st(F.lead("et").over(wu)).alias("j"),
        F.lead("et").over(wu).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pmat = (
        trans.groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "i",
            "j",
            (
                0.5 * F.col("c") / F.sum("c").over(Window.partitionBy("i"))
            ).alias("p"),
        )
    )
    wide = pmat.agg(
        *[
            F.coalesce(
                F.max(
                    F.when((F.col("i") == i) & (F.col("j") == j), F.col("p"))
                ),
                F.lit(0.0),
            ).alias(f"p_{i}_{j}")
            for i in range(1, 5)
            for j in range(1, 5)
        ]
    )
    gwide = gamma.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("stn") == j, F.col("g"))), F.lit(0.0)
            ).alias(f"g_{j}")
            for j in range(1, 5)
        ]
    )
    fold = (
        "aggregate(transform(sequence(1, 25), "
        "t -> array(CAST(t AS DOUBLE), 0, 0, 0)), "
        "array(g_1, g_2, g_3, g_4), "
        "(acc, x) -> array("
        + _jk_fold(lambda k: f"element_at(acc, {k})")
        + "))"
    )
    folded = wide.crossJoin(F.broadcast(gwide)).select(
        "*", F.expr(fold).alias("lam")
    )
    stations = spark.range(1, 5).select(F.col("id").cast("int").alias("j"))
    lamj = F.element_at("lam", F.col("j"))
    gj = (
        F.when(F.col("j") == 1, F.col("g_1"))
        .when(F.col("j") == 2, F.col("g_2"))
        .when(F.col("j") == 3, F.col("g_3"))
        .otherwise(F.col("g_4"))
    )
    return (
        folded.crossJoin(F.broadcast(stations))
        .select(
            F.col("j").alias("station"),
            r6(lamj * 0 + gj).alias("external_rate"),
            r6(lamj).alias("total_rate"),
            r6(F.lit(1 / 1.25)).alias("utilization"),
            r6(1 / (1.25 * lamj - lamj)).alias("mm1_sojourn_hours"),
        )
        .orderBy("station")
    )


# ---------------------------------------------------------------------------
# Q685 — absorbing Markov chain: expected steps and conversion
# ---------------------------------------------------------------------------
# Event types click/error/signup/view are transient states; a
# 'purchase' next-event absorbs as conversion, end-of-history
# absorbs as churn. The fundamental-matrix quantities come from the
# folds t <- 1 + Q t (expected steps) and b <- r + Q b (conversion
# probability) — the absorbing-chain view of the funnel behind
# Markov attribution (q242).
_Q685_ORACLE = f"""
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u, event_type AS et,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), steps AS MATERIALIZED (
      SELECT {_jk_case('et')} AS i,
             LEAD(et) OVER (PARTITION BY u ORDER BY us) AS nxt
      FROM ev
      WHERE et IN ('click', 'error', 'signup', 'view')
        OR et = 'purchase'
      QUALIFY et IN ('click', 'error', 'signup', 'view')
    ), counted AS MATERIALIZED (
      SELECT i,
             CASE WHEN nxt IS NULL THEN 'churn'
                  WHEN nxt = 'purchase' THEN 'purchase'
                  ELSE 'go' END AS kind,
             CASE WHEN nxt IN ('click', 'error', 'signup', 'view')
                  THEN {_jk_case('nxt')} END AS j,
             COUNT(*) AS c
      FROM steps GROUP BY 1, 2, 3
    ), tots AS (
      SELECT i, SUM(c) AS n FROM counted GROUP BY i
    ), wide AS (
      SELECT {", ".join(
        "COALESCE(MAX(CASE WHEN c2.i = %d AND c2.j = %d AND c2.kind = 'go' "
        "THEN c2.c * 1.0 / t.n END), 0) AS q_%d_%d" % (i, j, i, j)
        for i in range(1, 5) for j in range(1, 5))},
             {", ".join(
        "COALESCE(MAX(CASE WHEN c2.i = %d AND c2.kind = 'purchase' "
        "THEN c2.c * 1.0 / t.n END), 0) AS r_%d" % (i, i)
        for i in range(1, 5))}
      FROM counted c2 JOIN tots t ON t.i = c2.i
    ), folded AS (
      SELECT *,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE), 1, 1, 1],
                            list_transform(range(1, 41),
                                           t -> [CAST(t AS DOUBLE), 0, 0, 0])),
               (acc, x) -> [{", ".join(
                 "1 + " + " + ".join(
                   f"q_{i}_{j} * acc[{j}]" for j in range(1, 5))
                 for i in range(1, 5))}]
             ) AS tvec,
             list_reduce(
               list_prepend([r_1, r_2, r_3, r_4],
                            list_transform(range(1, 41),
                                           t -> [CAST(t AS DOUBLE), 0, 0, 0])),
               (acc, x) -> [{", ".join(
                 f"r_{i} + " + " + ".join(
                   f"q_{i}_{j} * acc[{j}]" for j in range(1, 5))
                 for i in range(1, 5))}]
             ) AS bvec
      FROM wide
    )
    SELECT g.j AS state,
           ROUND(f.tvec[g.j] + 5e-12, 6) AS expected_steps,
           ROUND(f.bvec[g.j] + 5e-12, 6) AS p_convert,
           ROUND(1 - f.bvec[g.j] + 5e-12, 6) AS p_churn
    FROM folded f CROSS JOIN (SELECT UNNEST(range(1, 5)) AS j) g
    ORDER BY g.j
"""


@register(
    "q685_absorbing_chain",
    _Q685_ORACLE,
    doc="Absorbing Markov funnel: transient event states, purchase "
    "and end-of-history absorbing, expected steps t = (I-Q)^-1 1 "
    "and conversion probability b = (I-Q)^-1 r by 40-round vector "
    "folds — the fundamental-matrix quantities behind Markov "
    "attribution (q242) and stationary analysis (q240).",
)
def q685(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    st = lambda col: (  # noqa: E731
        F.when(col == "click", 1)
        .when(col == "error", 2)
        .when(col == "signup", 3)
        .otherwise(4)
    )
    ev = e.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("et"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).filter(F.col("et").isin("click", "error", "signup", "view", "purchase"))
    wu = Window.partitionBy("u").orderBy("us")
    steps = ev.select(
        "et",
        st(F.col("et")).alias("i"),
        F.lead("et").over(wu).alias("nxt"),
    ).filter(F.col("et").isin(*_JK_TYPES))
    counted = steps.groupBy(
        "i",
        F.when(F.col("nxt").isNull(), "churn")
        .when(F.col("nxt") == "purchase", "purchase")
        .otherwise("go")
        .alias("kind"),
        F.when(
            F.col("nxt").isin(*_JK_TYPES), st(F.col("nxt"))
        ).alias("j"),
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    tots = counted.groupBy("i").agg(F.sum("c").alias("n"))
    cj = counted.join(tots, "i")
    wide = cj.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("i") == i)
                        & (F.col("j") == j)
                        & (F.col("kind") == "go"),
                        F.col("c") * 1.0 / F.col("n"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"q_{i}_{j}")
            for i in range(1, 5)
            for j in range(1, 5)
        ],
        *[
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("i") == i) & (F.col("kind") == "purchase"),
                        F.col("c") * 1.0 / F.col("n"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"r_{i}")
            for i in range(1, 5)
        ],
    )
    tbody = ", ".join(
        "1 + "
        + " + ".join(f"q_{i}_{j} * element_at(acc, {j})" for j in range(1, 5))
        for i in range(1, 5)
    )
    bbody = ", ".join(
        f"r_{i} + "
        + " + ".join(f"q_{i}_{j} * element_at(acc, {j})" for j in range(1, 5))
        for i in range(1, 5)
    )
    tfold = (
        "aggregate(transform(sequence(1, 40), "
        "t -> array(CAST(t AS DOUBLE), 0, 0, 0)), "
        "array(CAST(1 AS DOUBLE), 1, 1, 1), "
        f"(acc, x) -> array({tbody}))"
    )
    bfold = (
        "aggregate(transform(sequence(1, 40), "
        "t -> array(CAST(t AS DOUBLE), 0, 0, 0)), "
        "array(r_1, r_2, r_3, r_4), "
        f"(acc, x) -> array({bbody}))"
    )
    folded = wide.select(
        "*", F.expr(tfold).alias("tvec"), F.expr(bfold).alias("bvec")
    )
    states = spark.range(1, 5).select(F.col("id").cast("int").alias("j"))
    return (
        folded.crossJoin(F.broadcast(states))
        .select(
            F.col("j").alias("state"),
            r6(F.element_at("tvec", F.col("j"))).alias("expected_steps"),
            r6(F.element_at("bvec", F.col("j"))).alias("p_convert"),
            r6(1 - F.element_at("bvec", F.col("j"))).alias("p_churn"),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# Q686 — Shamir secret sharing over GF(251)
# ---------------------------------------------------------------------------
# Secret = order count mod 251, quadratic polynomial with
# hash-derived coefficients, five shares; three shares reconstruct
# exactly via Lagrange at zero (precomputed modular inverses for
# the fixed abscissas), two shares provably do not — threshold
# cryptography in pure modular arithmetic.
def _lag3(p: int, xs):
    cs = []
    for xi in xs:
        num, den = 1, 1
        for xj in xs:
            if xj != xi:
                num = (num * (-xj)) % p
                den = (den * (xi - xj)) % p
        cs.append((num * pow(den, -1, p)) % p)
    return cs


_P = 251
_C135 = _lag3(_P, [1, 3, 5])
_C13 = []
for xi, xj in ((1, 3), (3, 1)):
    _C13.append(((-xj) % _P) * pow((xi - xj) % _P, -1, _P) % _P)

_Q686_ORACLE = f"""
    WITH sec AS (
      SELECT COUNT(*) % 251 AS s,
             (COUNT(*) * 2654435761) % 251 AS a1,
             (COUNT(*) * 40503) % 251 AS a2
      FROM orders
    ), shares AS (
      SELECT s, a1, a2,
             (s + a1 * 1 + a2 * 1) % 251 AS y1,
             (s + a1 * 2 + a2 * 4) % 251 AS y2,
             (s + a1 * 3 + a2 * 9) % 251 AS y3,
             (s + a1 * 4 + a2 * 16) % 251 AS y4,
             (s + a1 * 5 + a2 * 25) % 251 AS y5
      FROM sec
    )
    SELECT CAST(s AS BIGINT) AS secret,
           CAST(y1 AS BIGINT) AS share1,
           CAST(y3 AS BIGINT) AS share3,
           CAST(y5 AS BIGINT) AS share5,
           CAST((y1 * {_C135[0]} + y3 * {_C135[1]} + y5 * {_C135[2]})
                % 251 AS BIGINT) AS reconstructed_3shares,
           (y1 * {_C135[0]} + y3 * {_C135[1]} + y5 * {_C135[2]}) % 251 = s
             AS threshold_met,
           (y1 * {_C13[0]} + y3 * {_C13[1]}) % 251 = s
             AS two_shares_leak
    FROM shares
"""


@register(
    "q686_shamir_sharing",
    _Q686_ORACLE,
    doc="Shamir (3,5) secret sharing over GF(251): hash-derived "
    "quadratic, five shares, exact Lagrange-at-zero reconstruction "
    "from shares 1/3/5 and demonstrable failure from two — modular "
    "threshold cryptography beside Hamming ECC (q681) and CRC "
    "(q666).",
)
def q686(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    sec = o.agg(
        (n % 251).alias("s"),
        ((n * 2654435761) % 251).alias("a1"),
        ((n * 40503) % 251).alias("a2"),
    )
    y = lambda x: (  # noqa: E731
        (F.col("s") + F.col("a1") * x + F.col("a2") * x * x) % 251
    )
    shares = sec.select(
        "s",
        y(1).alias("y1"),
        y(2).alias("y2"),
        y(3).alias("y3"),
        y(4).alias("y4"),
        y(5).alias("y5"),
    )
    rec3 = (
        F.col("y1") * _C135[0]
        + F.col("y3") * _C135[1]
        + F.col("y5") * _C135[2]
    ) % 251
    rec2 = (F.col("y1") * _C13[0] + F.col("y3") * _C13[1]) % 251
    return shares.select(
        F.col("s").cast("bigint").alias("secret"),
        F.col("y1").cast("bigint").alias("share1"),
        F.col("y3").cast("bigint").alias("share3"),
        F.col("y5").cast("bigint").alias("share5"),
        rec3.cast("bigint").alias("reconstructed_3shares"),
        (rec3 == F.col("s")).alias("threshold_met"),
        (rec2 == F.col("s")).alias("two_shares_leak"),
    )


# ---------------------------------------------------------------------------
# Q687 — GSP vs VCG position auction
# ---------------------------------------------------------------------------
# The five top brands bid their average item revenue for three ad
# slots with CTRs 1 / 0.6 / 0.3: GSP charges the next bid per
# click, VCG charges the externality sum (ctr_{m-1} - ctr_m) b_{m+1}
# — per-slot prices and the revenue gap between the auction Google
# runs and the truthful one, beside second-price (q416) and reserve
# optimization (q496).
_Q687_ORACLE = """
    WITH bids AS MATERIALIZED (
      SELECT p.p_brand AS b,
             AVG(ROUND(l.l_extendedprice * 100)) / 1e5 AS bid,
             ROW_NUMBER() OVER (
               ORDER BY AVG(ROUND(l.l_extendedprice * 100)) DESC,
                        p.p_brand) AS rk
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
      ORDER BY AVG(ROUND(l.l_extendedprice * 100)) DESC, p.p_brand
      LIMIT 5
    ), wide AS (
      SELECT MAX(CASE WHEN rk = 1 THEN b END) AS b1,
             MAX(CASE WHEN rk = 2 THEN b END) AS b2,
             MAX(CASE WHEN rk = 3 THEN b END) AS b3,
             MAX(CASE WHEN rk = 1 THEN bid END) AS v1,
             MAX(CASE WHEN rk = 2 THEN bid END) AS v2,
             MAX(CASE WHEN rk = 3 THEN bid END) AS v3,
             MAX(CASE WHEN rk = 4 THEN bid END) AS v4
      FROM bids
    ), priced AS (
      SELECT g.k AS slot,
             CASE g.k WHEN 1 THEN w.b1 WHEN 2 THEN w.b2 ELSE w.b3 END
               AS winner,
             CASE g.k WHEN 1 THEN w.v1 WHEN 2 THEN w.v2 ELSE w.v3 END
               AS bid,
             CASE g.k WHEN 1 THEN 1.0 WHEN 2 THEN 0.6 ELSE 0.3 END AS ctr,
             CASE g.k WHEN 1 THEN w.v2 WHEN 2 THEN w.v3 ELSE w.v4 END
               AS gsp_price,
             CASE g.k
               WHEN 3 THEN 0.3 * w.v4
               WHEN 2 THEN (0.6 - 0.3) * w.v3 + 0.3 * w.v4
               ELSE (1.0 - 0.6) * w.v2 + (0.6 - 0.3) * w.v3 + 0.3 * w.v4
             END AS vcg_total
      FROM wide w CROSS JOIN (SELECT UNNEST(range(1, 4)) AS k) g
    )
    SELECT CAST(slot AS BIGINT) AS slot, winner,
           ROUND(bid + 5e-12, 6) AS bid,
           ROUND(gsp_price + 5e-12, 6) AS gsp_price_per_click,
           ROUND(vcg_total / ctr + 5e-12, 6) AS vcg_price_per_click,
           ROUND(ctr * gsp_price - vcg_total + 5e-12, 6)
             AS gsp_premium
    FROM priced
    ORDER BY slot
"""


@register(
    "q687_gsp_auction",
    _Q687_ORACLE,
    doc="Position auction: top-5 brand bids over 3 slots (CTR 1/0.6/"
    "0.3), GSP next-bid pricing vs VCG externality pricing per "
    "slot and the GSP revenue premium — the sponsored-search "
    "mechanism beside second-price (q416) and optimal reserve "
    "(q496).",
)
def q687(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bids = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.avg(F.round(F.col("l_extendedprice") * 100)) / 1e5).alias("bid")
        )
        .orderBy(F.desc("bid"), "p_brand")
        .limit(5)
        .select(
            F.col("p_brand").alias("b"),
            "bid",
            F.row_number().over(Window.orderBy(F.desc("bid"), "p_brand")).alias(
                "rk"
            ),
        )
    )
    wide = bids.agg(
        *[
            F.max(F.when(F.col("rk") == k, F.col("b"))).alias(f"b{k}")
            for k in (1, 2, 3)
        ],
        *[
            F.max(F.when(F.col("rk") == k, F.col("bid"))).alias(f"v{k}")
            for k in (1, 2, 3, 4)
        ],
    )
    slots = spark.range(1, 4).select(F.col("id").cast("int").alias("slot"))
    k = F.col("slot")
    winner = (
        F.when(k == 1, F.col("b1")).when(k == 2, F.col("b2")).otherwise(
            F.col("b3")
        )
    )
    bid = (
        F.when(k == 1, F.col("v1")).when(k == 2, F.col("v2")).otherwise(
            F.col("v3")
        )
    )
    ctr = F.when(k == 1, 1.0).when(k == 2, 0.6).otherwise(0.3)
    gsp = (
        F.when(k == 1, F.col("v2")).when(k == 2, F.col("v3")).otherwise(
            F.col("v4")
        )
    )
    vcg = (
        F.when(k == 3, 0.3 * F.col("v4"))
        .when(k == 2, (0.6 - 0.3) * F.col("v3") + 0.3 * F.col("v4"))
        .otherwise(
            (1.0 - 0.6) * F.col("v2")
            + (0.6 - 0.3) * F.col("v3")
            + 0.3 * F.col("v4")
        )
    )
    return (
        wide.crossJoin(F.broadcast(slots))
        .select(
            k.cast("bigint").alias("slot"),
            winner.alias("winner"),
            r6(bid).alias("bid"),
            r6(gsp).alias("gsp_price_per_click"),
            r6(vcg / ctr).alias("vcg_price_per_click"),
            r6(ctr * gsp - vcg).alias("gsp_premium"),
        )
        .orderBy("slot")
    )


# ---------------------------------------------------------------------------
# Q688 — conjoint partworths from part attributes
# ---------------------------------------------------------------------------
# Retail price decomposed into main-effect partworths: per-level
# mean deviations from the grand mean for brand, type family
# (first word) and size quartile, each attribute's importance being
# its partworth range's share — survey conjoint's workhorse run on
# catalog data.
_Q688_ORACLE = """
    WITH parts AS MATERIALIZED (
      SELECT p_brand AS brand,
             SPLIT_PART(p_type, ' ', 1) AS tfam,
             NTILE(4) OVER (ORDER BY p_size, p_partkey) AS szq,
             ROUND(p_retailprice * 100) / 100 AS price
      FROM part
    ), gm AS (
      SELECT AVG(price) AS g FROM parts
    ), levels AS MATERIALIZED (
      SELECT 'brand' AS attr, brand AS lvl, AVG(price) AS m, COUNT(*) AS n
      FROM parts GROUP BY brand
      UNION ALL
      SELECT 'type', tfam, AVG(price), COUNT(*) FROM parts GROUP BY tfam
      UNION ALL
      SELECT 'size_q', CAST(szq AS VARCHAR), AVG(price), COUNT(*)
      FROM parts GROUP BY szq
    ), pw AS MATERIALIZED (
      SELECT l.attr, l.lvl, l.n, l.m - g.g AS partworth
      FROM levels l, gm g
    ), ranges AS (
      SELECT attr, MAX(partworth) - MIN(partworth) AS rng FROM pw
      GROUP BY attr
    ), tot AS (
      SELECT SUM(rng) AS tr FROM ranges
    )
    SELECT p.attr AS attribute, p.lvl AS level,
           CAST(p.n AS BIGINT) AS n_parts,
           ROUND(p.partworth + 5e-10, 4) AS partworth,
           ROUND(r.rng / t.tr + 5e-12, 6) AS attribute_importance
    FROM pw p
    JOIN ranges r ON r.attr = p.attr
    CROSS JOIN tot t
    ORDER BY ROUND(ABS(p.partworth) + 5e-10, 4) DESC, p.attr, p.lvl
    LIMIT 12
"""


@register(
    "q688_conjoint_partworths",
    _Q688_ORACLE,
    doc="Main-effects conjoint: retail-price partworths (per-level "
    "mean deviations from the grand mean) for brand, type family "
    "and size quartile, attribute importance as partworth-range "
    "share, top-12 strongest levels — marketing's utility "
    "decomposition beside target encoding (q207) and WoE (q226).",
)
def q688(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    parts = p.select(
        F.col("p_brand").alias("brand"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("tfam"),
        F.ntile(4).over(Window.orderBy("p_size", "p_partkey")).alias("szq"),
        (F.round(F.col("p_retailprice") * 100) / 100).alias("price"),
    ).localCheckpoint(eager=False)
    gm = parts.agg(F.avg("price").alias("g"))

    def lv(attr: str, col):
        return parts.groupBy(col.alias("lvl")).agg(
            F.avg("price").alias("m"), F.count(F.lit(1)).alias("n")
        ).select(F.lit(attr).alias("attr"), "lvl", "m", "n")

    levels = (
        lv("brand", F.col("brand"))
        .unionAll(lv("type", F.col("tfam")))
        .unionAll(lv("size_q", F.col("szq").cast("string")))
    )
    pw = levels.crossJoin(F.broadcast(gm)).select(
        "attr", "lvl", "n", (F.col("m") - F.col("g")).alias("partworth")
    ).localCheckpoint(eager=False)
    ranges = pw.groupBy("attr").agg(
        (F.max("partworth") - F.min("partworth")).alias("rng")
    )
    tot = ranges.agg(F.sum("rng").alias("tr"))
    return (
        pw.join(F.broadcast(ranges), "attr")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("attr").alias("attribute"),
            F.col("lvl").alias("level"),
            F.col("n").cast("bigint").alias("n_parts"),
            F.round(F.col("partworth") + F.lit(5e-10), 4).alias("partworth"),
            r6(F.col("rng") / F.col("tr")).alias("attribute_importance"),
        )
        .orderBy(
            F.round(F.abs(F.col("partworth")) + F.lit(5e-10), 4).desc(),
            "attribute",
            "level",
        )
        .limit(12)
    )
