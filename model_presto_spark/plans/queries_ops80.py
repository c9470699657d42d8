"""Conformance queries batch #80 (q594+) — stochastic dominance,
the airport cost game, Anscombe-pair mining, SJF vs FIFO, and the
median of means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q594 — first- and second-order stochastic dominance
# ---------------------------------------------------------------------------
# Spend distributions of two nation blocs compared on a 19-point
# grid: FSD requires one CDF below the other everywhere; SSD only
# that its INTEGRAL stays below (risk-averse preference) — the
# dominance tests that rank lotteries where means and variances
# (q146) cannot, with the max violation margins reported.
_Q594_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT CASE WHEN c.c_nationkey < 12 THEN 'a' ELSE 'b' END AS blk,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e5 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), mm AS (
      SELECT MIN(y) AS lo, MAX(y) AS hi FROM u
    ), grid AS (
      SELECT mm.lo + g.i * (mm.hi - mm.lo) / 20.0 AS x
      FROM generate_series(1, 19) g(i), mm
    ), cdfs AS MATERIALIZED (
      SELECT gr.x,
             AVG(CASE WHEN u.blk = 'a' AND u.y <= gr.x THEN 1.0
                      WHEN u.blk = 'a' THEN 0 END) AS fa,
             AVG(CASE WHEN u.blk = 'b' AND u.y <= gr.x THEN 1.0
                      WHEN u.blk = 'b' THEN 0 END) AS fb
      FROM grid gr, u GROUP BY gr.x
    ), integ AS (
      SELECT x, fa, fb,
             SUM(fa) OVER (ORDER BY x) AS ia,
             SUM(fb) OVER (ORDER BY x) AS ib
      FROM cdfs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
           ROUND(MAX(fa - fb) + 5e-12, 6) AS max_fsd_violation_a,
           ROUND(MAX(fb - fa) + 5e-12, 6) AS max_fsd_violation_b,
           BOOL_AND(fa <= fb + 1e-12) AS a_fsd_dominates,
           BOOL_AND(ia <= ib + 1e-12) AS a_ssd_dominates,
           ROUND(MAX(ia - ib) + 5e-12, 6) AS max_ssd_violation_a
    FROM integ
"""


@register(
    "q594_stochastic_dominance",
    _Q594_ORACLE,
    doc="Stochastic dominance between two nation blocs' spend: FSD "
    "(CDF everywhere below) and SSD (integrated CDF below — the "
    "risk-averse ordering) tested on a 19-point grid with max "
    "violation margins — lottery ranking where moments (q146) and "
    "tests (q147/q393) stay silent.",
)
def q594(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e5
            ).alias("y")
        )
        .select(
            F.when(F.col("c_nationkey") < 12, "a").otherwise("b").alias("blk"),
            "y",
        )
        .localCheckpoint(eager=False)
    )
    mm = u.agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
    grid = (
        spark.range(1, 20)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(mm))
        .select(
            (
                F.col("lo") + F.col("i") * (F.col("hi") - F.col("lo")) / 20.0
            ).alias("x")
        )
    )
    cdfs = (
        grid.crossJoin(u)
        .groupBy("x")
        .agg(
            F.avg(
                F.when((F.col("blk") == "a") & (F.col("y") <= F.col("x")), 1.0)
                .when(F.col("blk") == "a", 0.0)
            ).alias("fa"),
            F.avg(
                F.when((F.col("blk") == "b") & (F.col("y") <= F.col("x")), 1.0)
                .when(F.col("blk") == "b", 0.0)
            ).alias("fb"),
        )
    )
    w = Window.orderBy("x")
    integ = cdfs.select(
        "x",
        "fa",
        "fb",
        F.sum("fa").over(w).alias("ia"),
        F.sum("fb").over(w).alias("ib"),
    )
    return integ.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grid"),
        r6(F.max(F.col("fa") - F.col("fb"))).alias("max_fsd_violation_a"),
        r6(F.max(F.col("fb") - F.col("fa"))).alias("max_fsd_violation_b"),
        F.min(
            (F.col("fa") <= F.col("fb") + 1e-12).cast("int")
        ).cast("boolean").alias("a_fsd_dominates"),
        F.min(
            (F.col("ia") <= F.col("ib") + 1e-12).cast("int")
        ).cast("boolean").alias("a_ssd_dominates"),
        r6(F.max(F.col("ia") - F.col("ib"))).alias("max_ssd_violation_a"),
    )


# ---------------------------------------------------------------------------
# Q595 — the airport game: Shapley cost sharing in closed form
# ---------------------------------------------------------------------------
# Nations as airlines needing runway length = their largest order;
# the airport game's Shapley value has the famous closed form: each
# incremental runway segment is split equally among the airlines
# that need it (all with demand >= the segment start) — computed
# with one sort + suffix counts, plus the efficiency check that
# shares sum to the longest runway.
_Q595_ORACLE = """
    WITH need AS MATERIALIZED (
      SELECT c.c_nationkey AS airline,
             MAX(ROUND(o.o_totalprice * 100)) AS runway
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ), ranked AS (
      SELECT airline, runway,
             ROW_NUMBER() OVER (ORDER BY runway, airline) AS rk,
             COUNT(*) OVER () AS n,
             LAG(runway, 1, 0) OVER (ORDER BY runway, airline) AS prev
      FROM need
    ), seg AS (
      SELECT airline, runway, rk, n,
             SUM((runway - prev) * 1.0 / (n - rk + 1))
               OVER (ORDER BY rk) AS share
      FROM ranked
    )
    SELECT CAST(airline AS BIGINT) AS airline,
           ROUND(runway / 100.0 + 5e-8, 2) AS runway_usd,
           ROUND(share / 100.0 + 5e-8, 2) AS shapley_share_usd,
           ROUND((SELECT SUM(
                    (r2.runway - r2.prev) * 1.0 / (r2.n - r2.rk + 1))
                  FROM ranked r2) / 100.0 + 5e-8, 2) AS total_allocated_usd,
           ROUND((SELECT MAX(runway) FROM need) / 100.0 + 5e-8, 2)
             AS longest_runway_usd
    FROM seg ORDER BY runway DESC, airline LIMIT 5
"""


@register(
    "q595_airport_game",
    _Q595_ORACLE,
    doc="The airport cost game solved in closed form: each runway "
    "segment's cost split equally among airlines needing it "
    "(cumulative (len_k - len_{k-1})/(n-k+1) over the demand sort), "
    "efficiency audited against the longest runway — structured "
    "cooperative games beyond brute-force Shapley (q310/q567).",
)
def q595(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    need = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("airline"))
        .agg(F.max(F.round(F.col("o_totalprice") * 100)).alias("runway"))
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("runway", "airline")
    ranked = need.select(
        "airline",
        "runway",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.lag("runway", 1, 0).over(w).alias("prev"),
    )
    seg = ranked.select(
        "airline",
        "runway",
        F.sum(
            (F.col("runway") - F.col("prev")) * 1.0 / (F.col("n") - F.col("rk") + 1)
        )
        .over(Window.orderBy("rk"))
        .alias("share"),
        (
            (F.col("runway") - F.col("prev")) * 1.0 / (F.col("n") - F.col("rk") + 1)
        ).alias("inc"),
    ).localCheckpoint(eager=False)
    total = seg.agg(F.sum("inc").alias("tot"))
    longest = need.agg(F.max("runway").alias("lr"))
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return (
        seg.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(longest))
        .select(
            F.col("airline").cast("bigint").alias("airline"),
            r2(F.col("runway") / 100.0).alias("runway_usd"),
            r2(F.col("share") / 100.0).alias("shapley_share_usd"),
            r2(F.col("tot") / 100.0).alias("total_allocated_usd"),
            r2(F.col("lr") / 100.0).alias("longest_runway_usd"),
        )
        .orderBy(F.desc("runway_usd"), "airline")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q596 — Anscombe hunting: same summaries, different distributions
# ---------------------------------------------------------------------------
# Among all nation pairs, find the ones whose spend distributions
# have the CLOSEST means and variances but the LARGEST KS distance —
# the data-mined Anscombe demonstration that summary-statistic
# equality (q146) is not distributional equality (q147), scored by
# ks / (1 + stat_distance).
_Q596_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_nationkey AS g,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e5 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ), stats AS MATERIALIZED (
      SELECT g, COUNT(*) AS n, AVG(y) AS mu, stddev_pop(y) AS sd
      FROM u GROUP BY g
    ), ranked AS MATERIALIZED (
      SELECT g, y,
             PERCENT_RANK() OVER (PARTITION BY g ORDER BY y) AS pr
      FROM u
    ), grid AS (
      SELECT g.i / 20.0 AS q FROM generate_series(1, 19) g(i)
    ), qs AS MATERIALIZED (
      SELECT r.g, gr.q,
             MAX(CASE WHEN r.pr <= gr.q THEN r.y END) AS qv
      FROM ranked r, grid gr GROUP BY r.g, gr.q
    ), ksd AS MATERIALIZED (
      SELECT a.g AS g1, b.g AS g2,
             MAX(ABS(a.qv - b.qv)) AS qdist
      FROM qs a JOIN qs b ON b.q = a.q AND b.g > a.g
      GROUP BY a.g, b.g
    ), pairs AS (
      SELECT k.g1, k.g2, k.qdist,
             ABS(sa.mu - sb.mu) + ABS(sa.sd - sb.sd) AS stat_dist,
             k.qdist / (0.01 + ABS(sa.mu - sb.mu) + ABS(sa.sd - sb.sd))
               AS anscombe_score
      FROM ksd k
      JOIN stats sa ON sa.g = k.g1
      JOIN stats sb ON sb.g = k.g2
    )
    SELECT CAST(g1 AS BIGINT) AS nation_a, CAST(g2 AS BIGINT) AS nation_b,
           ROUND(stat_dist + 5e-10, 4) AS summary_distance,
           ROUND(qdist + 5e-10, 4) AS quantile_distance,
           ROUND(anscombe_score + 5e-10, 4) AS anscombe_score
    FROM pairs ORDER BY anscombe_score DESC, g1, g2 LIMIT 5
"""


@register(
    "q596_anscombe_hunt",
    _Q596_ORACLE,
    doc="Anscombe-pair mining: nation pairs with near-identical "
    "(mean, sd) spend summaries but maximal quantile-function "
    "distance, scored qdist/(eps + statdist) — the data-mined "
    "demonstration that matching summaries (q146) never implies "
    "matching distributions (q147's lesson, hunted).",
)
def q596(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e5
            ).alias("y")
        )
        .select(F.col("c_nationkey").alias("g"), "y")
        .localCheckpoint(eager=False)
    )
    stats = u.groupBy("g").agg(
        F.avg("y").alias("mu"), F.stddev_pop("y").alias("sd")
    )
    ranked = u.select(
        "g",
        "y",
        F.percent_rank().over(Window.partitionBy("g").orderBy("y")).alias("pr"),
    )
    grid = spark.range(1, 20).select((F.col("id") / 20.0).alias("q"))
    qs = (
        ranked.crossJoin(F.broadcast(grid))
        .groupBy("g", "q")
        .agg(F.max(F.when(F.col("pr") <= F.col("q"), F.col("y"))).alias("qv"))
        .localCheckpoint(eager=False)
    )
    a = qs.select(F.col("g").alias("g1"), "q", F.col("qv").alias("qa"))
    b = qs.select(F.col("g").alias("g2"), "q", F.col("qv").alias("qb"))
    ksd = (
        a.join(b, "q")
        .filter(F.col("g2") > F.col("g1"))
        .groupBy("g1", "g2")
        .agg(F.max(F.abs(F.col("qa") - F.col("qb"))).alias("qdist"))
    )
    sa = stats.select(
        F.col("g").alias("g1"), F.col("mu").alias("mua"), F.col("sd").alias("sda")
    )
    sb = stats.select(
        F.col("g").alias("g2"), F.col("mu").alias("mub"), F.col("sd").alias("sdb")
    )
    pairs = (
        ksd.join(F.broadcast(sa), "g1")
        .join(F.broadcast(sb), "g2")
        .select(
            "g1",
            "g2",
            "qdist",
            (
                F.abs(F.col("mua") - F.col("mub"))
                + F.abs(F.col("sda") - F.col("sdb"))
            ).alias("stat_dist"),
        )
        .select(
            "g1",
            "g2",
            "qdist",
            "stat_dist",
            (F.col("qdist") / (0.01 + F.col("stat_dist"))).alias(
                "anscombe_score"
            ),
        )
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        pairs.select(
            F.col("g1").cast("bigint").alias("nation_a"),
            F.col("g2").cast("bigint").alias("nation_b"),
            r4(F.col("stat_dist")).alias("summary_distance"),
            r4(F.col("qdist")).alias("quantile_distance"),
            r4(F.col("anscombe_score")).alias("anscombe_score"),
        )
        .orderBy(F.desc("anscombe_score"), "nation_a", "nation_b")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# Q597 — shortest-job-first vs FIFO: the mean-wait theorem, measured
# ---------------------------------------------------------------------------
# The same job batch (user-day spans, service = event count) run
# through two non-preemptive disciplines as two folds: FIFO in
# release order and SJF in size order — SJF's mean wait must come
# out below FIFO's (the optimality theorem as a measured
# certificate), while the max wait shows the starvation price.
_Q597_ORACLE = """
    WITH jobs AS MATERIALIZED (
      SELECT MIN(epoch_us(ts)) // 1000000 AS r,
             CAST(COUNT(*) AS BIGINT) AS svc
      FROM events WHERE EXTRACT(day FROM ts) = 1
      GROUP BY user_id
    ), fifo AS (
      SELECT list_reduce(
               list_prepend([CAST(0 AS BIGINT), 0, 0],
                 (SELECT list([r, svc] ORDER BY r, svc) FROM jobs)),
               (st, x) -> [
                 GREATEST(st[1], x[1]) + x[2],
                 st[2] + GREATEST(st[1] - x[1], CAST(0 AS BIGINT)),
                 GREATEST(st[3], GREATEST(st[1] - x[1], CAST(0 AS BIGINT)))
               ]
             ) AS st
    ), sjf AS (
      SELECT list_reduce(
               list_prepend([CAST(0 AS BIGINT), 0, 0],
                 (SELECT list([r, svc] ORDER BY svc, r) FROM jobs)),
               (st, x) -> [
                 GREATEST(st[1], x[1]) + x[2],
                 st[2] + GREATEST(st[1] - x[1], CAST(0 AS BIGINT)),
                 GREATEST(st[3], GREATEST(st[1] - x[1], CAST(0 AS BIGINT)))
               ]
             ) AS st
    ), n AS (SELECT COUNT(*) AS n FROM jobs)
    SELECT CAST(n.n AS BIGINT) AS n_jobs,
           ROUND(fifo.st[2] * 1.0 / n.n + 5e-10, 4) AS fifo_mean_wait_s,
           ROUND(sjf.st[2] * 1.0 / n.n + 5e-10, 4) AS sjf_mean_wait_s,
           CAST(fifo.st[3] AS BIGINT) AS fifo_max_wait_s,
           CAST(sjf.st[3] AS BIGINT) AS sjf_max_wait_s,
           sjf.st[2] <= fifo.st[2] AS sjf_optimality_holds
    FROM fifo, sjf, n
"""


@register(
    "q597_sjf_vs_fifo",
    _Q597_ORACLE,
    doc="SJF vs FIFO on the same job batch (two clock-carrying "
    "folds, size order vs release order): SJF's mean wait below "
    "FIFO's as the measured optimality certificate, max waits "
    "showing the starvation price — the discipline comparison "
    "completing EDF (q579), WFQ (q584) and Lindley (q538).",
)
def q597(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") == 1)
    jobs = ev.groupBy("user_id").agg(
        F.floor(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))) / 1000000
        ).alias("r"),
        F.count(F.lit(1)).cast("bigint").alias("svc"),
    ).localCheckpoint(eager=False)
    zero = F.lit(0).cast("bigint")

    def run(order_cols):
        ser = jobs.agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(*order_cols))),
                lambda s: F.array(s.r, s.svc),
            ).alias("xs")
        )

        def step(st, x):
            wait = F.greatest(F.element_at(st, 1) - F.element_at(x, 1), zero)
            return F.array(
                F.greatest(F.element_at(st, 1), F.element_at(x, 1))
                + F.element_at(x, 2),
                F.element_at(st, 2) + wait,
                F.greatest(F.element_at(st, 3), wait),
            )

        return ser.select(
            F.aggregate(F.col("xs"), F.array(zero, zero, zero), step).alias("st")
        )

    fifo = run(["r", "svc"]).select(
        F.element_at("st", 2).alias("fw"), F.element_at("st", 3).alias("fm")
    )
    sjf = run(["svc", "r"]).select(
        F.element_at("st", 2).alias("sw"), F.element_at("st", 3).alias("sm")
    )
    n = jobs.agg(F.count(F.lit(1)).alias("n"))
    return (
        fifo.crossJoin(F.broadcast(sjf))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("bigint").alias("n_jobs"),
            F.round(F.col("fw") * 1.0 / F.col("n") + F.lit(5e-10), 4).alias(
                "fifo_mean_wait_s"
            ),
            F.round(F.col("sw") * 1.0 / F.col("n") + F.lit(5e-10), 4).alias(
                "sjf_mean_wait_s"
            ),
            F.col("fm").cast("bigint").alias("fifo_max_wait_s"),
            F.col("sm").cast("bigint").alias("sjf_max_wait_s"),
            (F.col("sw") <= F.col("fw")).alias("sjf_optimality_holds"),
        )
    )


# ---------------------------------------------------------------------------
# Q598 — median of means (the modern robust estimator)
# ---------------------------------------------------------------------------
# Spend estimated three ways: the plain mean, the median of 16
# hash-bucket means (sub-Gaussian concentration under heavy tails),
# and the 10% trimmed mean — with the heavy-tail diagnosis
# (kurtosis) explaining when MoM earns its keep (Huber q279 and the
# jackknife q593 are the neighbors).
_Q598_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_custkey AS id,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 100.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    ), buckets AS (
      SELECT (id * 2654435761) % 4294967296 % 16 AS b, AVG(y) AS bmean
      FROM u GROUP BY (id * 2654435761) % 4294967296 % 16
    ), trim AS (
      SELECT AVG(y) AS tmean FROM (
        SELECT y, PERCENT_RANK() OVER (ORDER BY y, id) AS pr FROM u)
      WHERE pr >= 0.1 AND pr <= 0.9
    ), mom AS (
      SELECT quantile_cont(bmean, 0.5) AS m FROM buckets
    ), mu0 AS (
      SELECT AVG(y) AS mean, COUNT(*) AS n FROM u
    ), base AS (
      SELECT mu0.n, mu0.mean,
             AVG(POW(u.y - mu0.mean, 4)) / POW(stddev_pop(u.y), 4) AS kurt
      FROM u, mu0 GROUP BY mu0.n, mu0.mean
    )
    SELECT CAST(base.n AS BIGINT) AS n_customers,
           ROUND(base.mean + 5e-10, 4) AS plain_mean,
           ROUND(mom.m + 5e-10, 4) AS median_of_means,
           ROUND(trim.tmean + 5e-10, 4) AS trimmed_mean_10,
           ROUND(base.kurt + 5e-10, 4) AS kurtosis
    FROM base, mom, trim
"""


@register(
    "q598_median_of_means",
    _Q598_ORACLE,
    doc="Median of means: 16 hash-bucket means medianed (the "
    "sub-Gaussian robust estimator), beside the plain and 10% "
    "trimmed means with the kurtosis diagnosis — modern robust "
    "estimation next to Huber (q279) and the grouped jackknife "
    "(q593).",
)
def q598(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 100.0
            ).alias("y")
        )
        .select(F.col("c_custkey").alias("id"), "y")
        .localCheckpoint(eager=False)
    )
    buckets = u.groupBy(
        ((F.col("id") * 2654435761) % 4294967296 % 16).alias("b")
    ).agg(F.avg("y").alias("bmean"))
    mom = buckets.agg(F.percentile("bmean", F.lit(0.5)).alias("m"))
    ranked = u.select(
        "y", F.percent_rank().over(Window.orderBy("y", "id")).alias("pr")
    )
    trim = ranked.filter(
        (F.col("pr") >= 0.1) & (F.col("pr") <= 0.9)
    ).agg(F.avg("y").alias("tmean"))
    mu = u.agg(F.avg("y").alias("mean"), F.count(F.lit(1)).alias("n"))
    kurt = (
        u.crossJoin(F.broadcast(mu))
        .agg(
            (
                F.avg(F.pow(F.col("y") - F.col("mean"), 4))
                / F.pow(F.stddev_pop("y"), 4)
            ).alias("kurt")
        )
    )
    r4 = lambda cexpr: F.round(cexpr + F.lit(5e-10), 4)  # noqa: E731
    return (
        mu.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(trim))
        .crossJoin(F.broadcast(kurt))
        .select(
            F.col("n").cast("bigint").alias("n_customers"),
            r4(F.col("mean")).alias("plain_mean"),
            r4(F.col("m")).alias("median_of_means"),
            r4(F.col("tmean")).alias("trimmed_mean_10"),
            r4(F.col("kurt")).alias("kurtosis"),
        )
    )
