"""Conformance queries batch #58 (q484+) — discrete PID control,
farthest-first k-center seeding, nearest-neighbor TSP tour,
Sinkhorn entropic optimal transport, and RLE sort-order advising.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q484 — discrete PID controller replay
# ---------------------------------------------------------------------------
# A PID loop (Kp 0.6, Ki 0.1, Kd 0.05) holds a plant at the mean
# demand setpoint while the real demeaned daily demand acts as the
# disturbance: one fold carries [y, integral, prev_error, sum_e2,
# sum_|e|, max_|e|] and replays the whole month.  Same fold order in
# both engines, so the tracking-error metrics agree — control theory
# replayed inside the engine (the feedback sibling of the open-loop
# simulations q445/q470).
_Q484_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(COUNT(*) AS DOUBLE) AS dem
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), sp AS (
      SELECT SUM(dem) / COUNT(*) AS s FROM daily
    ), ser AS (
      SELECT list([dem] ORDER BY d) AS ds, sp.s
      FROM daily, sp GROUP BY sp.s
    ), sim AS (
      SELECT s,
        list_reduce(
          list_prepend([s, CAST(0.0 AS DOUBLE), 0.0, 0.0, 0.0, 0.0], ds),
          (a, x) -> [
            a[1] + 0.5 * (0.6 * (s - a[1]) + 0.1 * (a[2] + (s - a[1]))
                          + 0.05 * ((s - a[1]) - a[3]))
                 + 0.2 * (x[1] - s),
            a[2] + (s - a[1]),
            s - a[1],
            a[4] + (s - a[1]) * (s - a[1]),
            a[5] + ABS(s - a[1]),
            GREATEST(a[6], ABS(s - a[1]))
          ]
        ) AS st
      FROM ser
    )
    SELECT ROUND(s + 5e-10, 4) AS setpoint,
           ROUND(st[4] / 28.0 + 5e-10, 4) AS mse,
           ROUND(st[5] / 28.0 + 5e-10, 4) AS mae,
           ROUND(st[6] + 5e-10, 4) AS max_abs_err,
           ROUND(ABS(s - st[1]) + 5e-10, 4) AS final_abs_err
    FROM sim
"""


@register(
    "q484_pid_controller",
    _Q484_ORACLE,
    doc="Discrete PID loop (Kp/Ki/Kd = 0.6/0.1/0.05) holding a plant "
    "at the mean-demand setpoint against real demeaned demand "
    "shocks, replayed as one fold carrying plant state, integral, "
    "previous error and tracking metrics — feedback control beside "
    "the open-loop folds (bandit q445, inventory q470).",
)
def q484(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("dem")
    )
    ser = daily.agg(
        (F.sum("dem") / F.count(F.lit(1))).alias("s"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "dem"))), lambda r: r.dem
        ).alias("ds"),
    )
    s = F.col("s")

    def step(a, x):
        y = F.element_at(a, 1)
        integ = F.element_at(a, 2)
        eprev = F.element_at(a, 3)
        e = s - y
        u = 0.6 * e + 0.1 * (integ + e) + 0.05 * (e - eprev)
        return F.array(
            y + 0.5 * u + 0.2 * (x - s),
            integ + e,
            e,
            F.element_at(a, 4) + e * e,
            F.element_at(a, 5) + F.abs(e),
            F.greatest(F.element_at(a, 6), F.abs(e)),
        )

    z = F.lit(0.0)
    sim = ser.select(
        "s",
        F.aggregate(F.col("ds"), F.array(s, z, z, z, z, z), step).alias("st"),
    )
    r4 = lambda c: F.round(c + F.lit(5e-10), 4)  # noqa: E731
    return sim.select(
        r4(s).alias("setpoint"),
        r4(F.element_at("st", 4) / 28.0).alias("mse"),
        r4(F.element_at("st", 5) / 28.0).alias("mae"),
        r4(F.element_at("st", 6)).alias("max_abs_err"),
        r4(F.abs(s - F.element_at("st", 1))).alias("final_abs_err"),
    )


# ---------------------------------------------------------------------------
# Q485 — farthest-first traversal (2-approx k-center seeding)
# ---------------------------------------------------------------------------
# Gonzalez's algorithm on the (balance, spend) cloud: start at the
# lowest-id point, three times add the point farthest from the seed
# set (deterministic id tiebreak), then report the k-center coverage
# radius — the seeding rule that bounds within 2x of optimal,
# vs the naive first-4-ids baseline radius.
_Q485_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT c.c_custkey AS id, ROUND(c.c_acctbal * 100) AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1000.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), s1 AS (SELECT id, x, y FROM pts ORDER BY id LIMIT 1),
    s2 AS (
      SELECT p.id, p.x, p.y FROM pts p, s1
      ORDER BY (p.x - s1.x) * (p.x - s1.x) + (p.y - s1.y) * (p.y - s1.y)
        DESC, p.id LIMIT 1
    ), s3 AS (
      SELECT p.id, p.x, p.y FROM pts p, s1, s2
      ORDER BY LEAST(
        (p.x - s1.x) * (p.x - s1.x) + (p.y - s1.y) * (p.y - s1.y),
        (p.x - s2.x) * (p.x - s2.x) + (p.y - s2.y) * (p.y - s2.y))
        DESC, p.id LIMIT 1
    ), s4 AS (
      SELECT p.id, p.x, p.y FROM pts p, s1, s2, s3
      ORDER BY LEAST(
        (p.x - s1.x) * (p.x - s1.x) + (p.y - s1.y) * (p.y - s1.y),
        (p.x - s2.x) * (p.x - s2.x) + (p.y - s2.y) * (p.y - s2.y),
        (p.x - s3.x) * (p.x - s3.x) + (p.y - s3.y) * (p.y - s3.y))
        DESC, p.id LIMIT 1
    ), radius AS (
      SELECT MAX(LEAST(
        (p.x - s1.x) * (p.x - s1.x) + (p.y - s1.y) * (p.y - s1.y),
        (p.x - s2.x) * (p.x - s2.x) + (p.y - s2.y) * (p.y - s2.y),
        (p.x - s3.x) * (p.x - s3.x) + (p.y - s3.y) * (p.y - s3.y),
        (p.x - s4.x) * (p.x - s4.x) + (p.y - s4.y) * (p.y - s4.y))) AS r2
      FROM pts p, s1, s2, s3, s4
    ), naive AS (
      SELECT MAX(m) AS r2 FROM (
        SELECT p.id, MIN((p.x - q.x) * (p.x - q.x)
                         + (p.y - q.y) * (p.y - q.y)) AS m
        FROM pts p, (SELECT * FROM pts ORDER BY id LIMIT 4) q
        GROUP BY p.id
      )
    )
    SELECT CAST(s1.id AS BIGINT) AS seed1, CAST(s2.id AS BIGINT) AS seed2,
           CAST(s3.id AS BIGINT) AS seed3, CAST(s4.id AS BIGINT) AS seed4,
           ROUND(SQRT(radius.r2) / 100.0 + 5e-8, 2) AS coverage_radius,
           ROUND(SQRT(naive.r2) / 100.0 + 5e-8, 2) AS naive_radius,
           ROUND(SQRT(naive.r2 / radius.r2) + 5e-12, 6) AS improvement
    FROM s1, s2, s3, s4, radius, naive
"""


@register(
    "q485_farthest_first",
    _Q485_ORACLE,
    doc="Gonzalez farthest-first traversal for 4-center seeding on "
    "the (balance, spend) cloud: three argmax-of-min-distance "
    "rounds from the lowest-id start, k-center coverage radius vs "
    "the naive first-4-ids baseline — the 2-approximation seeding "
    "behind Lloyd's step (q268) and silhouette (q269).",
)
def q485(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        # lineage cut: every farthest-first round cross-joins pts with
        # ALL previous seeds, so persist() lineage re-nests per round
        # (plan audit: 68 scans)
        .localCheckpoint(eager=False)
    )

    def d2(sx, sy):
        return (F.col("x") - F.col(sx)) * (F.col("x") - F.col(sx)) + (
            F.col("y") - F.col(sy)
        ) * (F.col("y") - F.col(sy))

    def seed_cols(df, tag):
        return df.select(
            F.col("id").alias(f"id{tag}"),
            F.col("x").alias(f"x{tag}"),
            F.col("y").alias(f"y{tag}"),
        )

    s1 = seed_cols(pts.orderBy("id").limit(1), "1").localCheckpoint(eager=True)
    p2 = pts.crossJoin(F.broadcast(s1))
    s2 = seed_cols(
        p2.orderBy(F.desc(d2("x1", "y1")), "id").limit(1).select("id", "x", "y"),
        "2",
    ).localCheckpoint(eager=True)
    p3 = pts.crossJoin(F.broadcast(s1)).crossJoin(F.broadcast(s2))
    s3 = seed_cols(
        p3.orderBy(F.desc(F.least(d2("x1", "y1"), d2("x2", "y2"))), "id")
        .limit(1)
        .select("id", "x", "y"),
        "3",
    ).localCheckpoint(eager=True)
    p4 = (
        pts.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(s3))
    )
    s4 = seed_cols(
        p4.orderBy(
            F.desc(F.least(d2("x1", "y1"), d2("x2", "y2"), d2("x3", "y3"))), "id"
        )
        .limit(1)
        .select("id", "x", "y"),
        "4",
    ).localCheckpoint(eager=True)
    full = (
        pts.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(s3))
        .crossJoin(F.broadcast(s4))
    )
    radius = full.agg(
        F.max(
            F.least(
                d2("x1", "y1"), d2("x2", "y2"), d2("x3", "y3"), d2("x4", "y4")
            )
        ).alias("r2")
    )
    nv = pts.orderBy("id").limit(4).select(
        F.col("id").alias("qid"), F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    naive = (
        pts.crossJoin(F.broadcast(nv))
        .groupBy("id")
        .agg(
            F.min(
                (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
                + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
            ).alias("m")
        )
        .agg(F.max("m").alias("nr2"))
    )
    return (
        s1.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(s3))
        .crossJoin(F.broadcast(s4))
        .crossJoin(F.broadcast(radius))
        .crossJoin(F.broadcast(naive))
        .select(
            F.col("id1").cast("bigint").alias("seed1"),
            F.col("id2").cast("bigint").alias("seed2"),
            F.col("id3").cast("bigint").alias("seed3"),
            F.col("id4").cast("bigint").alias("seed4"),
            F.round(F.sqrt("r2") / 100.0 + F.lit(5e-8), 2).alias(
                "coverage_radius"
            ),
            F.round(F.sqrt("nr2") / 100.0 + F.lit(5e-8), 2).alias("naive_radius"),
            r6(F.sqrt(F.col("nr2") / F.col("r2"))).alias("improvement"),
        )
    )


# ---------------------------------------------------------------------------
# Q486 — nearest-neighbor TSP tour over nation centroids
# ---------------------------------------------------------------------------
# Twelve city centroids, the greedy NN tour from city 0 executed as
# a fold whose accumulator is [current, visited_bitmask, tour_len]
# against a flattened 144-entry distance matrix; the inner
# nearest-unvisited search is a fold over city indices.  Tour length
# audited against the degree lower bound sum(two smallest incident
# edges)/2 — combinatorial heuristics with a certificate.
_Q486_ORACLE = """
    WITH city AS MATERIALIZED (
      SELECT c_nationkey AS n, AVG(c_acctbal) AS x,
             AVG(c_custkey % 1000) AS y
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), dmat AS (
      SELECT list(d ORDER BY i, j) AS dm FROM (
        SELECT a.n AS i, b.n AS j,
               SQRT((a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y)) AS d
        FROM city a, city b
      )
    ), tour AS (
      SELECT dm,
        list_reduce(
          list_prepend([CAST(0.0 AS DOUBLE), 1.0, 0.0],
            list_transform(generate_series(1, 11),
                           z -> [CAST(z AS DOUBLE)])),
          (a, stp) -> [
            CAST(list_reduce(
              list_prepend([1e18, CAST(-1.0 AS DOUBLE), 0.0],
                list_transform(generate_series(0, 11),
                               c -> [CAST(c AS DOUBLE)])),
              (b, cc) -> CASE
                WHEN CAST(a[2] AS BIGINT) // CAST(POW(2, cc[1]) AS BIGINT)
                       % 2 = 1 THEN b
                WHEN dm[CAST(a[1] * 12 + cc[1] AS INT) + 1] < b[1]
                  THEN [dm[CAST(a[1] * 12 + cc[1] AS INT) + 1], cc[1], 0.0]
                ELSE b END
            )[2] AS DOUBLE),
            a[2] + POW(2, list_reduce(
              list_prepend([1e18, CAST(-1.0 AS DOUBLE), 0.0],
                list_transform(generate_series(0, 11),
                               c -> [CAST(c AS DOUBLE)])),
              (b, cc) -> CASE
                WHEN CAST(a[2] AS BIGINT) // CAST(POW(2, cc[1]) AS BIGINT)
                       % 2 = 1 THEN b
                WHEN dm[CAST(a[1] * 12 + cc[1] AS INT) + 1] < b[1]
                  THEN [dm[CAST(a[1] * 12 + cc[1] AS INT) + 1], cc[1], 0.0]
                ELSE b END
            )[2]),
            a[3] + list_reduce(
              list_prepend([1e18, CAST(-1.0 AS DOUBLE), 0.0],
                list_transform(generate_series(0, 11),
                               c -> [CAST(c AS DOUBLE)])),
              (b, cc) -> CASE
                WHEN CAST(a[2] AS BIGINT) // CAST(POW(2, cc[1]) AS BIGINT)
                       % 2 = 1 THEN b
                WHEN dm[CAST(a[1] * 12 + cc[1] AS INT) + 1] < b[1]
                  THEN [dm[CAST(a[1] * 12 + cc[1] AS INT) + 1], cc[1], 0.0]
                ELSE b END
            )[1]
          ]
        ) AS st
      FROM dmat
    ), closed AS (
      SELECT st[3] + tour.dm[CAST(st[1] * 12 AS INT) + 1] AS tour_len
      FROM tour
    ), lb AS (
      SELECT SUM((m1 + m2) / 2.0) AS lower_bound FROM (
        SELECT i, MIN(d) AS m1,
               MIN(CASE WHEN rk = 2 THEN d END) AS m2
        FROM (
          SELECT a.n AS i, SQRT((a.x - b.x) * (a.x - b.x)
                                + (a.y - b.y) * (a.y - b.y)) AS d,
                 ROW_NUMBER() OVER (PARTITION BY a.n
                   ORDER BY SQRT((a.x - b.x) * (a.x - b.x)
                                 + (a.y - b.y) * (a.y - b.y)), b.n) AS rk
          FROM city a JOIN city b ON b.n <> a.n
        ) WHERE rk <= 2 GROUP BY i
      )
    )
    SELECT ROUND(closed.tour_len + 5e-10, 4) AS nn_tour_len,
           ROUND(lb.lower_bound + 5e-10, 4) AS degree_lower_bound,
           ROUND(closed.tour_len / lb.lower_bound + 5e-12, 6)
             AS approx_ratio
    FROM closed, lb
"""


@register(
    "q486_tsp_nearest_neighbor",
    _Q486_ORACLE,
    doc="Greedy nearest-neighbor TSP tour over 12 nation centroids as "
    "a fold ([current, visited-bitmask, length] accumulator, inner "
    "argmin fold over the flattened 144-entry distance matrix), "
    "closed back to the start and certified against the half-sum-"
    "of-two-smallest-edges lower bound — combinatorial heuristic "
    "plus certificate in pure relational algebra.",
)
def q486(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    pairs = a.crossJoin(F.broadcast(b)).select(
        "i",
        "j",
        F.sqrt(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
        ).alias("d"),
    )
    dmat = pairs.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "j", "d"))), lambda s: s.d
        ).alias("dm")
    )
    dm = F.col("dm")

    def nearest(a_acc):
        # inner fold over city ids: [bestd, bestj, 0]
        cur = F.element_at(a_acc, 1)
        mask = F.element_at(a_acc, 2)
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(11)), lambda cc: cc.cast("double")
            ),
            F.array(F.lit(1e18), F.lit(-1.0), F.lit(0.0)),
            lambda bst, cc: F.when(
                F.floor(
                    mask.cast("bigint") / F.pow(F.lit(2.0), cc).cast("bigint")
                )
                % 2
                == 1,
                bst,
            )
            .when(
                F.element_at(dm, (cur * 12 + cc).cast("int") + 1)
                < F.element_at(bst, 1),
                F.array(
                    F.element_at(dm, (cur * 12 + cc).cast("int") + 1),
                    cc,
                    F.lit(0.0),
                ),
            )
            .otherwise(bst),
        )

    def step(a_acc, stp):
        best = nearest(a_acc)
        return F.array(
            F.element_at(best, 2),
            F.element_at(a_acc, 2) + F.pow(F.lit(2.0), F.element_at(best, 2)),
            F.element_at(a_acc, 3) + F.element_at(best, 1),
        )

    tour = dmat.select(
        "dm",
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(11)), lambda z: z.cast("double")),
            F.array(F.lit(0.0), F.lit(1.0), F.lit(0.0)),
            step,
        ).alias("st"),
    )
    closed = tour.select(
        (
            F.element_at("st", 3)
            + F.element_at(dm, (F.element_at("st", 1) * 12).cast("int") + 1)
        ).alias("tour_len")
    )
    ranked = pairs.filter(F.col("i") != F.col("j")).select(
        "i",
        "d",
        F.row_number().over(Window.partitionBy("i").orderBy("d", "j")).alias("rk"),
    )
    lb = (
        ranked.filter(F.col("rk") <= 2)
        .groupBy("i")
        .agg(F.sum("d").alias("two_min"))
        .agg((F.sum("two_min") / 2.0).alias("lower_bound"))
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return closed.crossJoin(F.broadcast(lb)).select(
        r4(F.col("tour_len")).alias("nn_tour_len"),
        r4(F.col("lower_bound")).alias("degree_lower_bound"),
        r6(F.col("tour_len") / F.col("lower_bound")).alias("approx_ratio"),
    )


# ---------------------------------------------------------------------------
# Q487 — Sinkhorn entropic optimal transport (5x5)
# ---------------------------------------------------------------------------
# Move the AUTOMOBILE customer mass distribution over nations 0-4
# onto the BUILDING one at cost |i-j|: six unrolled Sinkhorn
# scalings (u = r / Kv, v = c / K^T u) on the Gibbs kernel
# exp(-C/0.5), then the transport plan cost and the marginal
# residuals as the convergence audit — entropic OT beside IPF
# raking (q278, the cost-free special case) and 1-D Wasserstein
# (q247, the closed-form special case).
_Q487_ORACLE = """
    WITH marg AS (
      SELECT c_nationkey AS n,
             SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1.0 ELSE 0 END)
               AS ra,
             SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0 END)
               AS cb
      FROM customer WHERE c_nationkey < 5 GROUP BY c_nationkey
    ), norm AS MATERIALIZED (
      SELECT n, ra / (SELECT SUM(ra) FROM marg) AS r,
             cb / (SELECT SUM(cb) FROM marg) AS c
      FROM marg
    ), kmat AS MATERIALIZED (
      SELECT a.n AS i, b.n AS j, EXP(-ABS(a.n - b.n) / 0.5) AS k
      FROM norm a, norm b
    ), v0 AS (SELECT n, CAST(1.0 AS DOUBLE) AS v FROM norm),
    u1 AS MATERIALIZED (
      SELECT nm.n, nm.r / SUM(k.k * v0.v) AS u
      FROM norm nm JOIN kmat k ON k.i = nm.n JOIN v0 ON v0.n = k.j
      GROUP BY nm.n, nm.r
    ), v1 AS MATERIALIZED (
      SELECT nm.n, nm.c / SUM(k.k * u1.u) AS v
      FROM norm nm JOIN kmat k ON k.j = nm.n JOIN u1 ON u1.n = k.i
      GROUP BY nm.n, nm.c
    ), u2 AS MATERIALIZED (
      SELECT nm.n, nm.r / SUM(k.k * v1.v) AS u
      FROM norm nm JOIN kmat k ON k.i = nm.n JOIN v1 ON v1.n = k.j
      GROUP BY nm.n, nm.r
    ), v2 AS MATERIALIZED (
      SELECT nm.n, nm.c / SUM(k.k * u2.u) AS v
      FROM norm nm JOIN kmat k ON k.j = nm.n JOIN u2 ON u2.n = k.i
      GROUP BY nm.n, nm.c
    ), u3 AS MATERIALIZED (
      SELECT nm.n, nm.r / SUM(k.k * v2.v) AS u
      FROM norm nm JOIN kmat k ON k.i = nm.n JOIN v2 ON v2.n = k.j
      GROUP BY nm.n, nm.r
    ), v3 AS MATERIALIZED (
      SELECT nm.n, nm.c / SUM(k.k * u3.u) AS v
      FROM norm nm JOIN kmat k ON k.j = nm.n JOIN u3 ON u3.n = k.i
      GROUP BY nm.n, nm.c
    ), plan_p AS MATERIALIZED (
      SELECT k.i, k.j, u3.u * k.k * v3.v AS p
      FROM kmat k JOIN u3 ON u3.n = k.i JOIN v3 ON v3.n = k.j
    ), res AS (
      SELECT MAX(ABS(rm - rr)) AS mr FROM (
        SELECT pp.i, SUM(pp.p) AS rm, ANY_VALUE(nm.r) AS rr
        FROM plan_p pp JOIN norm nm ON nm.n = pp.i
        GROUP BY pp.i)
    )
    SELECT ROUND(SUM(p * ABS(i - j)) + 5e-12, 6) AS transport_cost,
           ROUND(SUM(p) + 5e-12, 6) AS total_mass,
           ROUND(MAX(res.mr) + 5e-12, 6) AS max_row_residual
    FROM plan_p, res
"""


@register(
    "q487_sinkhorn_ot",
    _Q487_ORACLE,
    doc="Entropic optimal transport between segment mass "
    "distributions over nations 0-4: six unrolled Sinkhorn scalings "
    "on the exp(-|i-j|/0.5) Gibbs kernel, plan cost + marginal "
    "residual audit — OT beside IPF raking (q278) and 1-D "
    "Wasserstein (q247).",
)
def q487(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    marg = c.groupBy(F.col("c_nationkey").alias("n")).agg(
        F.sum(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1.0).otherwise(0.0)).alias(
            "ra"
        ),
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1.0).otherwise(0.0)).alias(
            "cb"
        ),
    )
    tots = marg.agg(F.sum("ra").alias("ta"), F.sum("cb").alias("tb"))
    norm = marg.crossJoin(F.broadcast(tots)).select(
        "n",
        (F.col("ra") / F.col("ta")).alias("r"),
        (F.col("cb") / F.col("tb")).alias("c"),
    ).localCheckpoint(eager=False)
    ni = norm.select(F.col("n").alias("i"), F.col("r"))
    nj = norm.select(F.col("n").alias("j"), F.col("c"))
    kmat = ni.crossJoin(F.broadcast(nj)).select(
        "i", "j", F.exp(-F.abs(F.col("i") - F.col("j")) / 0.5).alias("k")
    ).localCheckpoint(eager=False)
    v = norm.select(F.col("n").alias("j"), F.lit(1.0).alias("v"))
    for _ in range(3):
        u = (
            kmat.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("k") * F.col("v")).alias("kv"))
            .join(F.broadcast(ni), "i")
            .select("i", (F.col("r") / F.col("kv")).alias("u"))
            # eager per Sinkhorn round: u/v reference each other across
            # rounds, so lineage doubles per iteration without a cut
            # (plan audit: 152 scans)
            .localCheckpoint(eager=True)
        )
        v = (
            kmat.join(F.broadcast(u), "i")
            .groupBy("j")
            .agg(F.sum(F.col("k") * F.col("u")).alias("ku"))
            .join(F.broadcast(nj), "j")
            .select("j", (F.col("c") / F.col("ku")).alias("v"))
            .localCheckpoint(eager=True)
        )
    plan = (
        kmat.join(F.broadcast(u), "i")
        .join(F.broadcast(v), "j")
        .select("i", "j", (F.col("u") * F.col("k") * F.col("v")).alias("p"))
    )
    cost = plan.agg(
        F.sum(F.col("p") * F.abs(F.col("i") - F.col("j"))).alias("tc"),
        F.sum("p").alias("tm"),
    )
    rowres = (
        plan.groupBy("i")
        .agg(F.sum("p").alias("rm"))
        .join(F.broadcast(ni), "i")
        .agg(F.max(F.abs(F.col("rm") - F.col("r"))).alias("mr"))
    )
    return cost.crossJoin(F.broadcast(rowres)).select(
        r6(F.col("tc")).alias("transport_cost"),
        r6(F.col("tm")).alias("total_mass"),
        r6(F.col("mr")).alias("max_row_residual"),
    )


# ---------------------------------------------------------------------------
# Q488 — RLE run counts: the sort-order advisor
# ---------------------------------------------------------------------------
# How compressible is each column under each candidate sort order?
# Run counts of returnflag / linestatus / ship-month when the table
# is laid out by shipdate, by (returnflag, linestatus), or by
# suppkey: runs per column = 1 + sum(value != previous) along the
# layout order — the statistic that picks a table's sort key for
# RLE-encoded formats (zone maps q429 and Z-order q456 complete the
# layout trilogy).
_Q488_ORACLE = """
    WITH laid AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS sm,
             ROW_NUMBER() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                         l_returnflag, l_linestatus) AS r_date,
             ROW_NUMBER() OVER (ORDER BY l_returnflag, l_linestatus,
                                         l_orderkey, l_linenumber,
                                         l_shipdate) AS r_flag,
             ROW_NUMBER() OVER (ORDER BY l_suppkey, l_orderkey, l_linenumber,
                                         l_returnflag, l_linestatus,
                                         l_shipdate) AS r_supp
      FROM lineitem
    ), runs AS (
      SELECT 'by_shipdate' AS layout,
             1 + SUM(drf) AS rf_runs, 1 + SUM(dls) AS ls_runs,
             1 + SUM(dsm) AS sm_runs
      FROM (
        SELECT CASE WHEN rf <> LAG(rf) OVER (ORDER BY r_date)
                    THEN 1 ELSE 0 END AS drf,
               CASE WHEN ls <> LAG(ls) OVER (ORDER BY r_date)
                    THEN 1 ELSE 0 END AS dls,
               CASE WHEN sm <> LAG(sm) OVER (ORDER BY r_date)
                    THEN 1 ELSE 0 END AS dsm
        FROM laid)
      UNION ALL
      SELECT 'by_flag_status', 1 + SUM(drf), 1 + SUM(dls), 1 + SUM(dsm)
      FROM (
        SELECT CASE WHEN rf <> LAG(rf) OVER (ORDER BY r_flag)
                    THEN 1 ELSE 0 END AS drf,
               CASE WHEN ls <> LAG(ls) OVER (ORDER BY r_flag)
                    THEN 1 ELSE 0 END AS dls,
               CASE WHEN sm <> LAG(sm) OVER (ORDER BY r_flag)
                    THEN 1 ELSE 0 END AS dsm
        FROM laid)
      UNION ALL
      SELECT 'by_suppkey', 1 + SUM(drf), 1 + SUM(dls), 1 + SUM(dsm)
      FROM (
        SELECT CASE WHEN rf <> LAG(rf) OVER (ORDER BY r_supp)
                    THEN 1 ELSE 0 END AS drf,
               CASE WHEN ls <> LAG(ls) OVER (ORDER BY r_supp)
                    THEN 1 ELSE 0 END AS dls,
               CASE WHEN sm <> LAG(sm) OVER (ORDER BY r_supp)
                    THEN 1 ELSE 0 END AS dsm
        FROM laid)
    )
    SELECT layout,
           CAST(rf_runs AS BIGINT) AS returnflag_runs,
           CAST(ls_runs AS BIGINT) AS linestatus_runs,
           CAST(sm_runs AS BIGINT) AS shipmonth_runs,
           ROUND((SELECT COUNT(*) FROM laid) * 3.0
                 / (rf_runs + ls_runs + sm_runs) + 5e-10, 4)
             AS rle_compression
    FROM runs ORDER BY layout
"""


@register(
    "q488_rle_sort_advisor",
    _Q488_ORACLE,
    doc="RLE sort-key advisor: run counts of returnflag/linestatus/"
    "ship-month under three physical layouts (1 + sum of "
    "change-points along each order), with the aggregate RLE "
    "compression each layout buys — completing the physical-design "
    "trilogy with zone maps (q429) and Z-order (q456).",
)
def q488(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Run counting per candidate layout via operators/layout.py
    # ordered_run_counts: the previous version sorted the whole
    # relation through SIX single-task global windows (a row_number
    # materialization per layout, then a second global sort over it);
    # the operator range-buckets on a monotone function of each
    # layout's leading key, counts adjacent changes in parallel
    # per-bucket windows, and reconciles bucket boundaries from the
    # extremal structs (exact — the order lists are total orders).
    # 6.5 s steady -> ~2 s at sf0.1, and no single-task stage scales
    # with the relation.
    from model_presto_spark.operators.layout import ordered_run_counts

    laid = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.month("l_shipdate").cast("bigint").alias("sm"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
    )
    vals = ["rf", "ls", "sm"]

    def runs(order_cols, bucket, label):
        rc = ordered_run_counts(laid, order_cols, vals, bucket)
        return rc.select(
            F.lit(label).alias("layout"),
            "rf_runs",
            "ls_runs",
            "sm_runs",
            "n",
        )

    out = (
        runs(
            ["l_shipdate", "l_orderkey", "l_linenumber", "rf", "ls"],
            F.year("l_shipdate") * 12 + F.month("l_shipdate"),
            "by_shipdate",
        )
        .unionAll(
            runs(
                ["rf", "ls", "l_orderkey", "l_linenumber", "l_shipdate"],
                F.concat("rf", "ls"),
                "by_flag_status",
            )
        )
        .unionAll(
            runs(
                [
                    "l_suppkey",
                    "l_orderkey",
                    "l_linenumber",
                    "rf",
                    "ls",
                    "l_shipdate",
                ],
                F.floor(F.col("l_suppkey") / 64),
                "by_suppkey",
            )
        )
    )
    return out.select(
        "layout",
        F.col("rf_runs").cast("bigint").alias("returnflag_runs"),
        F.col("ls_runs").cast("bigint").alias("linestatus_runs"),
        F.col("sm_runs").cast("bigint").alias("shipmonth_runs"),
        F.round(
            F.col("n") * 3.0
            / (F.col("rf_runs") + F.col("ls_runs") + F.col("sm_runs"))
            + F.lit(5e-10),
            4,
        ).alias("rle_compression"),
    ).orderBy("layout")
