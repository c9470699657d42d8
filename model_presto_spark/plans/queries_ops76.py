"""Conformance queries batch #76 (q574+) — cross-device session
stitching, the gravity model, Clarke-Wright savings, Prim's MST,
and two-way invoice matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q574 — cross-device session stitching, scored against truth
# ---------------------------------------------------------------------------
# Each user's events split across two synthetic "devices"
# (event_id parity); the stitcher links device pairs that co-occur
# within 120s at least 3 times — and because the true user_id is
# known, precision and recall of the linkage are exact.  Identity
# resolution as a windowed co-occurrence join (Fellegi-Sunter q254's
# behavioral sibling).
_Q574_ORACLE = """
    WITH dev AS MATERIALIZED (
      SELECT user_id * 2 + event_id % 2 AS device, user_id,
             epoch_us(ts) // 1000000 AS t
      FROM events WHERE EXTRACT(day FROM ts) <= 7
    ), buckets AS MATERIALIZED (
      SELECT DISTINCT device, user_id, t // 120 AS b FROM dev
    ), cand AS MATERIALIZED (
      SELECT a.device AS d1, b.device AS d2,
             MAX(a.user_id) AS u1, MAX(b.user_id) AS u2,
             COUNT(*) AS hits
      FROM buckets a JOIN buckets b
        ON b.b = a.b AND b.device > a.device
      GROUP BY a.device, b.device
      HAVING COUNT(*) >= 3
    ), truth AS (
      SELECT COUNT(DISTINCT user_id) AS n_true_pairs
      FROM dev GROUP BY ()
    ), truth2 AS (
      SELECT COUNT(*) AS n_true FROM (
        SELECT user_id FROM dev GROUP BY user_id
        HAVING COUNT(DISTINCT device) = 2)
    ), score AS (
      SELECT COUNT(*) AS n_pred,
             SUM(CASE WHEN u1 = u2 THEN 1 ELSE 0 END) AS n_correct
      FROM cand
    )
    SELECT CAST(s.n_pred AS BIGINT) AS predicted_links,
           CAST(s.n_correct AS BIGINT) AS correct_links,
           CAST(t2.n_true AS BIGINT) AS true_pairs,
           ROUND(s.n_correct * 1.0 / NULLIF(s.n_pred, 0) + 5e-12, 6)
             AS precision,
           ROUND(s.n_correct * 1.0 / NULLIF(t2.n_true, 0) + 5e-12, 6)
             AS recall
    FROM score s, truth2 t2
"""


@register(
    "q574_session_stitching",
    _Q574_ORACLE,
    doc="Cross-device identity stitching: device pairs (synthetic "
    "event-parity split) linked when they co-occur in >= 3 "
    "120-second buckets, scored with exact precision/recall against "
    "the known user — behavioral identity resolution beside "
    "Fellegi-Sunter (q254) and linkage eval (q366).",
)
def q574(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    dev = ev.select(
        (F.col("user_id") * 2 + F.col("event_id") % 2).alias("device"),
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).alias("t"),
    )
    buckets = dev.select(
        "device", "user_id", F.floor(F.col("t") / 120).alias("b")
    ).distinct().localCheckpoint(eager=False)
    a = buckets.select(
        F.col("device").alias("d1"), F.col("user_id").alias("u1"), "b"
    )
    b = buckets.select(
        F.col("device").alias("d2"), F.col("user_id").alias("u2"), "b"
    )
    cand = (
        a.join(b, ["b"])
        .filter(F.col("d2") > F.col("d1"))
        .groupBy("d1", "d2")
        .agg(
            F.max("u1").alias("u1"),
            F.max("u2").alias("u2"),
            F.count(F.lit(1)).alias("hits"),
        )
        .filter(F.col("hits") >= 3)
    )
    truth2 = (
        dev.groupBy("user_id")
        .agg(F.count_distinct("device").alias("nd"))
        .filter(F.col("nd") == 2)
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    score = cand.agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(F.when(F.col("u1") == F.col("u2"), 1).otherwise(0)).alias(
            "n_correct"
        ),
    )
    return score.crossJoin(F.broadcast(truth2)).select(
        F.col("n_pred").cast("bigint").alias("predicted_links"),
        F.col("n_correct").cast("bigint").alias("correct_links"),
        F.col("n_true").cast("bigint").alias("true_pairs"),
        r6(
            F.col("n_correct") * 1.0 / F.nullif(F.col("n_pred"), F.lit(0))
        ).alias("precision"),
        r6(
            F.col("n_correct") * 1.0 / F.nullif(F.col("n_true"), F.lit(0))
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Q575 — the gravity model of trade flows
# ---------------------------------------------------------------------------
# Nation-pair order flows (modulo cells) regressed on the product of
# the endpoint masses and the ring distance, in logs, by the Cramer
# 3x3 solve: the canonical spatial-economics fit — a mass elasticity
# near 1 and a NEGATIVE distance elasticity are the signatures
# (Metcalfe q541 and shift-share q524's spatial cousin).
_Q575_ORACLE = """
    WITH flow AS MATERIALIZED (
      SELECT CAST(o_custkey % 15 AS BIGINT) AS i,
             CAST(o_orderkey % 15 AS BIGINT) AS j, COUNT(*) AS f
      FROM orders WHERE o_custkey % 15 <> o_orderkey % 15
      GROUP BY 1, 2
    ), mass AS (
      SELECT i AS n, SUM(f) AS m FROM (
        SELECT i, f FROM flow UNION ALL SELECT j, f FROM flow)
      GROUP BY i
    ), reg AS (
      SELECT LN(fl.f * 1.0) AS y,
             LN(ma.m * 1.0 * mb.m) AS x1,
             LN(LEAST(ABS(fl.i - fl.j), 15 - ABS(fl.i - fl.j)) * 1.0) AS x2
      FROM flow fl
      JOIN mass ma ON ma.n = fl.i
      JOIN mass mb ON mb.n = fl.j
    ), m AS (
      SELECT COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
             SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
             SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      FROM reg
    ), c AS (
      SELECT n,
             s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
             s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
             s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS tss
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)
                 + 5e-12, 6) AS mass_elasticity,
           ROUND((c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12)
                 + 5e-12, 6) AS distance_elasticity,
           ROUND(((c1y * (c1y * c22 - c2y * c12)
                   + c2y * (c2y * c11 - c1y * c12))
                  / (c11 * c22 - c12 * c12)) / tss + 5e-12, 6) AS r2
    FROM c
"""


@register(
    "q575_gravity_model",
    _Q575_ORACLE,
    doc="Gravity model: nation-pair order flows on log mass product "
    "and log ring distance by the Cramer 3x3 solve — mass "
    "elasticity near 1, negative distance elasticity, R^2 — the "
    "spatial-economics workhorse beside shift-share (q524) and "
    "Moran's I (q552).",
)
def q575(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    flow = (
        o.select(
            (F.col("o_custkey") % 15).cast("bigint").alias("i"),
            (F.col("o_orderkey") % 15).cast("bigint").alias("j"),
        )
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint(eager=False)
    )
    mass = (
        flow.select(F.col("i").alias("n"), "f")
        .unionAll(flow.select(F.col("j").alias("n"), "f"))
        .groupBy("n")
        .agg(F.sum("f").alias("m"))
    )
    ma = mass.select(F.col("n").alias("i"), F.col("m").alias("mi"))
    mb = mass.select(F.col("n").alias("j"), F.col("m").alias("mj"))
    ring = F.least(
        F.abs(F.col("i") - F.col("j")), 15 - F.abs(F.col("i") - F.col("j"))
    )
    reg = (
        flow.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            F.log(F.col("f") * 1.0).alias("y"),
            F.log(F.col("mi") * 1.0 * F.col("mj")).alias("x1"),
            F.log(ring * 1.0).alias("x2"),
        )
    )
    m = reg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    c = m.select(
        "n",
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("tss"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det
    b2 = (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det
    ess = (
        F.col("c1y") * (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12"))
        + F.col("c2y")
        * (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12"))
    ) / det
    return c.select(
        n.cast("bigint").alias("n_pairs"),
        r6(b1).alias("mass_elasticity"),
        r6(b2).alias("distance_elasticity"),
        r6(ess / F.col("tss")).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Q576 — Clarke-Wright savings with a greedy disjoint merge
# ---------------------------------------------------------------------------
# Route savings s_ij = d_0i + d_0j - d_ij for the 11 non-depot
# cities: the savings list sorted descending, and a greedy pass
# (fold with a used-endpoint bitmask) that merges disjoint pairs —
# first-iteration Clarke-Wright, the classical VRP constructor on
# the q486/q561 distance matrix.
_Q576_ORACLE = """
    WITH city AS MATERIALIZED (
      SELECT c_nationkey AS n, AVG(c_acctbal) AS x,
             AVG(c_custkey % 1000) AS y
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), dist AS MATERIALIZED (
      SELECT a.n AS i, b.n AS j,
             SQRT((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)) AS d
      FROM city a, city b
    ), sav AS MATERIALIZED (
      SELECT di.j AS i, dj.j AS j,
             di.d + dj.d - dij.d AS s
      FROM dist di
      JOIN dist dj ON di.i = 0 AND dj.i = 0 AND dj.j > di.j
      JOIN dist dij ON dij.i = di.j AND dij.j = dj.j
      WHERE di.j > 0 AND dj.j > 0
    ), ordered AS (
      SELECT i, j, s, ROW_NUMBER() OVER (ORDER BY s DESC, i, j) AS rk
      FROM sav
    ), greedy AS (
      SELECT list_reduce(
               list_prepend([CAST(0 AS BIGINT), 0, 0],
                 (SELECT list([i, j, CAST(ROUND(s * 1000) AS BIGINT)]
                              ORDER BY rk) FROM ordered)),
               (st, x) -> CASE
                 WHEN (st[1] // CAST(POW(2, x[1]) AS BIGINT)) % 2 = 0
                  AND (st[1] // CAST(POW(2, x[2]) AS BIGINT)) % 2 = 0
                 THEN [st[1] + CAST(POW(2, x[1]) AS BIGINT)
                       + CAST(POW(2, x[2]) AS BIGINT),
                       st[2] + 1, st[3] + x[3]]
                 ELSE st END
             ) AS st
    )
    SELECT CAST((SELECT COUNT(*) FROM sav) AS BIGINT) AS n_pairs,
           ROUND((SELECT MAX(s) FROM sav) + 5e-10, 4) AS best_saving,
           CAST(g.st[2] AS BIGINT) AS greedy_merges,
           ROUND(g.st[3] / 1000.0 + 5e-10, 4) AS greedy_total_saving
    FROM greedy g
"""


@register(
    "q576_clarke_wright",
    _Q576_ORACLE,
    doc="Clarke-Wright savings on the 12-city instance: s_ij = d_0i + "
    "d_0j - d_ij for all non-depot pairs, then a greedy fold with a "
    "used-endpoint bitmask merging disjoint pairs in savings order "
    "(integer-scaled savings so the fold stays exact) — the VRP "
    "route constructor beside the TSP tour (q486) and 2-opt (q561).",
)
def q576(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    city = c.groupBy(F.col("c_nationkey").alias("n")).agg(
        F.avg("c_acctbal").alias("x"), F.avg(F.col("c_custkey") % 1000).alias("y")
    )
    a = city.select(
        F.col("n").alias("i"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = city.select(
        F.col("n").alias("j"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dist = a.crossJoin(F.broadcast(b)).select(
        "i",
        "j",
        F.sqrt(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
        ).alias("d"),
    ).localCheckpoint(eager=False)
    d0 = dist.filter(F.col("i") == 0).select(
        F.col("j").alias("node"), F.col("d").alias("d0")
    )
    di = d0.select(F.col("node").alias("i"), F.col("d0").alias("d0i"))
    dj = d0.select(F.col("node").alias("j"), F.col("d0").alias("d0j"))
    sav = (
        dist.filter((F.col("i") > 0) & (F.col("j") > F.col("i")))
        .join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i", "j", (F.col("d0i") + F.col("d0j") - F.col("d")).alias("s")
        )
        .localCheckpoint(eager=False)
    )
    ordered = sav.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("s")).alias("ns"), "i", "j", "s"))
            ),
            lambda r: F.array(
                r.i.cast("bigint"),
                r.j.cast("bigint"),
                F.round(r.s * 1000).cast("bigint"),
            ),
        ).alias("xs")
    )
    zero = F.lit(0).cast("bigint")

    def bit(mask, k):
        return F.floor(
            mask / F.pow(F.lit(2.0), k.cast("double")).cast("bigint")
        ) % 2

    def step(st, x):
        mask = F.element_at(st, 1)
        i = F.element_at(x, 1)
        j = F.element_at(x, 2)
        free = (bit(mask, i) == 0) & (bit(mask, j) == 0)
        return F.when(
            free,
            F.array(
                mask
                + F.pow(F.lit(2.0), i.cast("double")).cast("bigint")
                + F.pow(F.lit(2.0), j.cast("double")).cast("bigint"),
                F.element_at(st, 2) + 1,
                F.element_at(st, 3) + F.element_at(x, 3),
            ),
        ).otherwise(st)

    greedy = ordered.select(
        F.aggregate(F.col("xs"), F.array(zero, zero, zero), step).alias("st")
    )
    stats = sav.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.max("s").alias("best_s")
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return stats.crossJoin(F.broadcast(greedy)).select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        r4(F.col("best_s")).alias("best_saving"),
        F.element_at("st", 2).cast("bigint").alias("greedy_merges"),
        r4(F.element_at("st", 3) / 1000.0).alias("greedy_total_saving"),
    )


# ---------------------------------------------------------------------------
# Q577 — Prim's minimum spanning tree as a fold
# ---------------------------------------------------------------------------
# Eleven rounds grow the tree from city 0: the fold carries
# [tree-bitmask, total-weight-millis], each round's inner fold scans
# the 144-entry distance matrix for the cheapest tree/non-tree edge
# — MST weight certified BELOW the q486 NN tour (every tour contains
# a spanning tree) and above half the greedy matching; the last
# classical graph constructor the suite was missing.
_Q577_ORACLE = """
    WITH city AS MATERIALIZED (
      SELECT c_nationkey AS n, AVG(c_acctbal) AS x,
             AVG(c_custkey % 1000) AS y
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), dmat AS MATERIALIZED (
      SELECT list(CAST(ROUND(d * 1000) AS BIGINT) ORDER BY i, j) AS dm
      FROM (
        SELECT a.n AS i, b.n AS j,
               SQRT((a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y)) AS d
        FROM city a, city b)
    ), prim AS (
      SELECT dm,
        list_reduce(
          list_prepend([CAST(1 AS BIGINT), 0],
            list_transform(generate_series(1, 11),
                           z -> [CAST(z AS BIGINT)])),
          (st, z) -> [
            st[1] + CAST(POW(2,
              list_reduce(
                list_prepend([CAST(4611686018427387904 AS BIGINT), -1],
                  list_transform(generate_series(0, 143),
                                 e -> [CAST(e AS BIGINT)])),
                (b, e) -> CASE
                  WHEN (st[1] // CAST(POW(2, e[1] // 12) AS BIGINT)) % 2 = 1
                   AND (st[1] // CAST(POW(2, e[1] % 12) AS BIGINT)) % 2 = 0
                   AND dm[CAST(e[1] AS INT) + 1] < b[1]
                  THEN [dm[CAST(e[1] AS INT) + 1], e[1] % 12]
                  ELSE b END)[2]) AS BIGINT),
            st[2] + list_reduce(
                list_prepend([CAST(4611686018427387904 AS BIGINT), -1],
                  list_transform(generate_series(0, 143),
                                 e -> [CAST(e AS BIGINT)])),
                (b, e) -> CASE
                  WHEN (st[1] // CAST(POW(2, e[1] // 12) AS BIGINT)) % 2 = 1
                   AND (st[1] // CAST(POW(2, e[1] % 12) AS BIGINT)) % 2 = 0
                   AND dm[CAST(e[1] AS INT) + 1] < b[1]
                  THEN [dm[CAST(e[1] AS INT) + 1], e[1] % 12]
                  ELSE b END)[1]
          ]
        ) AS st
      FROM dmat
    ), nn AS (
      SELECT SUM(dm[CAST(p * 12 + ((p + 1) % 12) AS INT) + 1]) AS ident_len
      FROM dmat, (SELECT UNNEST(generate_series(0, 11)) AS p)
    )
    SELECT ROUND(prim.st[2] / 1000.0 + 5e-10, 4) AS mst_weight,
           CAST(11 AS BIGINT) AS n_edges,
           prim.st[1] = 4095 AS all_nodes_reached,
           ROUND(nn.ident_len / 1000.0 + 5e-10, 4) AS identity_tour_len,
           prim.st[2] <= nn.ident_len AS mst_below_tour
    FROM prim, nn
"""


@register(
    "q577_prim_mst",
    _Q577_ORACLE,
    doc="Prim's MST as a fold: eleven rounds carry [tree-bitmask, "
    "weight-millis], each round's inner fold scans the flattened "
    "distance matrix for the cheapest crossing edge (integer-scaled "
    "weights, exact) — full-coverage bitmask and the MST <= tour "
    "certificate against the identity tour (the constructor under "
    "TSP q486/q561 and Clarke-Wright q576).",
)
def q577(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    city = c.groupBy(F.col("c_nationkey").alias("n")).agg(
        F.avg("c_acctbal").alias("x"), F.avg(F.col("c_custkey") % 1000).alias("y")
    )
    a = city.select(
        F.col("n").alias("i"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = city.select(
        F.col("n").alias("j"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dmat = (
        a.crossJoin(F.broadcast(b))
        .select(
            "i",
            "j",
            F.round(
                F.sqrt(
                    (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                    + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
                )
                * 1000
            )
            .cast("bigint")
            .alias("d"),
        )
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", "j", "d"))),
                lambda s: s.d,
            ).alias("dm")
        )
    )
    dm = F.col("dm")
    big = F.lit(4611686018427387904).cast("bigint")
    neg1 = F.lit(-1).cast("bigint")

    def bit(mask, k):
        return F.floor(
            mask / F.pow(F.lit(2.0), k.cast("double")).cast("bigint")
        ) % 2

    def best_edge(st):
        mask = F.element_at(st, 1)
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(143)), lambda e: e.cast("bigint")
            ),
            F.array(big, neg1),
            lambda bacc, e: F.when(
                (bit(mask, F.floor(e / 12)) == 1)
                & (bit(mask, e % 12) == 0)
                & (
                    F.element_at(dm, e.cast("int") + 1)
                    < F.element_at(bacc, 1)
                ),
                F.array(F.element_at(dm, e.cast("int") + 1), e % 12),
            ).otherwise(bacc),
        )

    def step(st, z):
        be = best_edge(st)
        return F.array(
            F.element_at(st, 1)
            + F.pow(
                F.lit(2.0), F.element_at(be, 2).cast("double")
            ).cast("bigint"),
            F.element_at(st, 2) + F.element_at(be, 1),
        )

    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    prim = dmat.select(
        "dm",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(11)), lambda z: z.cast("bigint")
            ),
            F.array(one, zero),
            step,
        ).alias("st"),
    )
    ident = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda p: F.element_at(
                dm, (p * 12 + ((p + 1) % 12)).cast("int") + 1
            ),
        ),
        zero,
        lambda x, y: x + y,
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return prim.select(
        r4(F.element_at("st", 2) / 1000.0).alias("mst_weight"),
        F.lit(11).cast("bigint").alias("n_edges"),
        (F.element_at("st", 1) == 4095).alias("all_nodes_reached"),
        r4(ident / 1000.0).alias("identity_tour_len"),
        (F.element_at("st", 2) <= ident).alias("mst_below_tour"),
    )


# ---------------------------------------------------------------------------
# Q578 — two-way invoice matching with tolerance bands
# ---------------------------------------------------------------------------
# Order headers matched against their lineitem-reconstructed
# invoices: exact cents match, within-0.1%, within-1%, and the
# unmatched tail — with the mean signed gap attributing the
# difference to tax/discount handling.  The reconciliation table
# behind close processes (double-charge q306 and FIFO lots q344's
# audit sibling).
_Q578_ORACLE = """
    WITH inv AS (
      SELECT l_orderkey AS k,
             SUM(ROUND(l_extendedprice * (1 - l_discount)
                       * (1 + l_tax) * 100)) AS amt
      FROM lineitem GROUP BY l_orderkey
    ), m AS (
      SELECT o.o_orderkey, ROUND(o.o_totalprice * 100) AS header,
             i.amt AS invoice,
             ABS(ROUND(o.o_totalprice * 100) - i.amt) AS gap,
             ABS(ROUND(o.o_totalprice * 100) - i.amt)
               / ROUND(o.o_totalprice * 100) AS rel_gap
      FROM orders o JOIN inv i ON i.k = o.o_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_orders,
           ROUND(AVG(CASE WHEN gap = 0 THEN 1.0 ELSE 0 END) + 5e-12, 6)
             AS exact_match_rate,
           ROUND(AVG(CASE WHEN rel_gap <= 0.001 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS within_10bp,
           ROUND(AVG(CASE WHEN rel_gap <= 0.01 THEN 1.0 ELSE 0 END)
                 + 5e-12, 6) AS within_1pct,
           ROUND(AVG((invoice - header) / 100.0) + 5e-8, 2)
             AS mean_signed_gap_usd,
           ROUND(MAX(rel_gap) + 5e-12, 6) AS worst_rel_gap
    FROM m
"""


@register(
    "q578_two_way_match",
    _Q578_ORACLE,
    doc="Two-way match: order headers vs lineitem-reconstructed "
    "invoices (discount and tax applied) at exact / 10bp / 1% "
    "tolerance bands, with the mean signed gap and the worst "
    "relative mismatch — the reconciliation table behind financial "
    "close (double-charge q306 / Deming q431's accounting use).",
)
def q578(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    inv = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            )
        ).alias("amt")
    )
    header = F.round(F.col("o_totalprice") * 100)
    m = o.join(inv, o.o_orderkey == inv.k).select(
        header.alias("header"),
        F.col("amt").alias("invoice"),
        F.abs(header - F.col("amt")).alias("gap"),
        (F.abs(header - F.col("amt")) / header).alias("rel_gap"),
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_orders"),
        r6(F.avg(F.when(F.col("gap") == 0, 1.0).otherwise(0.0))).alias(
            "exact_match_rate"
        ),
        r6(
            F.avg(F.when(F.col("rel_gap") <= 0.001, 1.0).otherwise(0.0))
        ).alias("within_10bp"),
        r6(
            F.avg(F.when(F.col("rel_gap") <= 0.01, 1.0).otherwise(0.0))
        ).alias("within_1pct"),
        F.round(
            F.avg((F.col("invoice") - F.col("header")) / 100.0) + F.lit(5e-8), 2
        ).alias("mean_signed_gap_usd"),
        r6(F.max("rel_gap")).alias("worst_rel_gap"),
    )
