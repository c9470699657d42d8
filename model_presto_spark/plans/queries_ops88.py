"""Conformance queries batch #88 (q634+) — districting fairness,
age of information, changepoint segmentation, no-regret learning
dynamics, and dominant-resource fair allocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q634 — gerrymandering metrics: efficiency gap and mean-median
# ---------------------------------------------------------------------------
# Nations are districts, customer-key parity the two parties: wasted
# votes (loser's all, winner's surplus past the majority threshold)
# give the efficiency gap; the median-vs-mean district vote share
# gives the mean-median skew — the two standard partisan-fairness
# audits of any districting plan.
_Q634_ORACLE = """
    WITH dist AS MATERIALIZED (
      SELECT c_nationkey AS dk,
             SUM(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS va,
             SUM(CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END) AS vb
      FROM customer GROUP BY c_nationkey
    ), w AS (
      SELECT dk, va, vb, va + vb AS tot,
             va * 1.0 / (va + vb) AS sha,
             CASE WHEN va > vb THEN 1 ELSE 0 END AS win_a,
             CASE WHEN va > vb
                  THEN va - (CAST(FLOOR((va + vb) / 2) AS BIGINT) + 1)
                  ELSE va END AS wa,
             CASE WHEN va > vb
                  THEN vb
                  ELSE vb - (CAST(FLOOR((va + vb) / 2) AS BIGINT) + 1)
             END AS wb
      FROM dist
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_districts,
           CAST(SUM(win_a) AS BIGINT) AS seats_a,
           ROUND(SUM(va) * 1.0 / SUM(tot) + 5e-12, 6) AS vote_share_a,
           ROUND(SUM(win_a) * 1.0 / COUNT(*) + 5e-12, 6) AS seat_share_a,
           ROUND((SUM(wa) - SUM(wb)) * 1.0 / SUM(tot) + 5e-12, 6)
             AS efficiency_gap,
           ROUND(MEDIAN(sha) - AVG(sha) + 5e-12, 6) AS mean_median
    FROM w
"""


@register(
    "q634_efficiency_gap",
    _Q634_ORACLE,
    doc="Partisan-fairness audit of a districting plan: wasted-vote "
    "efficiency gap (loser's votes plus winner's surplus over the "
    "majority threshold, net, over total votes) and the mean-median "
    "vote-share skew across nation-districts — the two standard "
    "gerrymandering detectors, next to apportionment (q266).",
)
def q634(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    dist = c.groupBy(F.col("c_nationkey").alias("dk")).agg(
        F.sum(F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0)).alias("va"),
        F.sum(F.when(F.col("c_custkey") % 2 == 1, 1).otherwise(0)).alias("vb"),
    )
    tot = F.col("va") + F.col("vb")
    thresh = F.floor(tot / 2).cast("bigint") + 1
    w = dist.select(
        "va",
        "vb",
        tot.alias("tot"),
        (F.col("va") * 1.0 / tot).alias("sha"),
        F.when(F.col("va") > F.col("vb"), 1).otherwise(0).alias("win_a"),
        F.when(F.col("va") > F.col("vb"), F.col("va") - thresh)
        .otherwise(F.col("va"))
        .alias("wa"),
        F.when(F.col("va") > F.col("vb"), F.col("vb"))
        .otherwise(F.col("vb") - thresh)
        .alias("wb"),
    )
    return w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_districts"),
        F.sum("win_a").cast("bigint").alias("seats_a"),
        r6(F.sum("va") * 1.0 / F.sum("tot")).alias("vote_share_a"),
        r6(F.sum("win_a") * 1.0 / F.count(F.lit(1))).alias("seat_share_a"),
        r6((F.sum("wa") - F.sum("wb")) * 1.0 / F.sum("tot")).alias(
            "efficiency_gap"
        ),
        r6(F.expr("percentile(sha, 0.5)") - F.avg("sha")).alias("mean_median"),
    )


# ---------------------------------------------------------------------------
# Q635 — age of information (AoI) of per-user update streams
# ---------------------------------------------------------------------------
# Each user's events are status updates: between updates the
# information age grows linearly, so average AoI over the horizon is
# the sawtooth integral sum(gap^2)/2 (plus the tail to the global
# horizon) over elapsed time, and peak AoI is the largest gap — the
# freshness metric that mean latency hides.
_Q635_ORACLE = """
    WITH ev AS MATERIALIZED (
      SELECT user_id AS u,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), hz AS (
      SELECT MAX(us) AS hend FROM ev
    ), eligible AS (
      SELECT u FROM ev GROUP BY u HAVING COUNT(*) >= 5
    ), gaps AS MATERIALIZED (
      SELECT e.u,
             (e.us - LAG(e.us) OVER (PARTITION BY e.u ORDER BY e.us))
               / 3.6e9 AS g,
             e.us
      FROM ev e JOIN eligible el ON el.u = e.u
    ), per AS (
      SELECT g.u,
             (SUM(COALESCE(g.g * g.g, 0)) / 2
              + POW((h.hend - MAX(g.us)) / 3.6e9, 2) / 2)
               / ((h.hend - MIN(g.us)) / 3.6e9) AS avg_aoi,
             GREATEST(MAX(g.g), (h.hend - MAX(g.us)) / 3.6e9) AS peak_aoi
      FROM gaps g, hz h
      GROUP BY g.u, h.hend
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(avg_aoi) + 5e-12, 6) AS mean_avg_aoi_h,
           ROUND(AVG(peak_aoi) + 5e-12, 6) AS mean_peak_aoi_h,
           ROUND(MAX(peak_aoi) + 5e-12, 6) AS max_peak_aoi_h
    FROM per
"""


@register(
    "q635_age_of_information",
    _Q635_ORACLE,
    doc="Age of information: per-user update streams' sawtooth "
    "integral sum(gap^2)/2 over elapsed time to the global horizon "
    "gives average AoI, the largest gap the peak AoI (hours) — the "
    "freshness metric of update systems, orthogonal to interarrival "
    "fit (q255) and watermark lag (q166).",
)
def q635(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    ev = e.select(
        F.col("user_id").alias("u"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).localCheckpoint(eager=False)
    hz = ev.agg(F.max("us").alias("hend"))
    eligible = ev.groupBy("u").agg(F.count(F.lit(1)).alias("n")).filter(
        F.col("n") >= 5
    ).select("u")
    w = Window.partitionBy("u").orderBy("us")
    gaps = ev.join(eligible, "u").select(
        "u",
        ((F.col("us") - F.lag("us").over(w)) / 3.6e9).alias("g"),
        "us",
    )
    tail = (F.col("hend") - F.max("us")) / 3.6e9
    per = (
        gaps.crossJoin(F.broadcast(hz))
        .groupBy("u", "hend")
        .agg(
            (
                (
                    F.sum(F.coalesce(F.col("g") * F.col("g"), F.lit(0.0))) / 2
                    + F.pow((F.max("us") * -1 + F.col("hend")) / 3.6e9, 2) / 2
                )
                / ((F.col("hend") - F.min("us")) / 3.6e9)
            ).alias("avg_aoi"),
            F.greatest(F.max("g"), tail).alias("peak_aoi"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        r6(F.avg("avg_aoi")).alias("mean_avg_aoi_h"),
        r6(F.avg("peak_aoi")).alias("mean_peak_aoi_h"),
        r6(F.max("peak_aoi")).alias("max_peak_aoi_h"),
    )


# ---------------------------------------------------------------------------
# Q636 — changepoint detection by binary segmentation
# ---------------------------------------------------------------------------
# Daily revenue (exact k-cent units) split where the SSE reduction
# is largest, then each half split again — two-level binary
# segmentation via cumulative sums, entirely relational. Cumulative
# integer sums make every candidate's gain bitwise identical across
# engines, so the argmax needs no tolerance.
_Q636_ORACLE = """
    WITH daily AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
      FROM events GROUP BY EXTRACT(day FROM ts)
    ), cum AS MATERIALIZED (
      SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, d, x,
             SUM(x) OVER (ORDER BY d) AS cx,
             SUM(x * x) OVER (ORDER BY d) AS cx2,
             COUNT(*) OVER () AS n,
             SUM(x) OVER () AS sx,
             SUM(x * x) OVER () AS sx2
      FROM daily
    ), g1 AS (
      SELECT rn, d,
             (sx2 - sx * sx / n)
             - ((cx2 - cx * cx / rn)
                + ((sx2 - cx2) - (sx - cx) * (sx - cx) / (n - rn))) AS gain,
             sx2 - sx * sx / n AS sse0
      FROM cum WHERE rn >= 3 AND rn <= n - 3
    ), s1 AS (
      SELECT rn AS t1, d AS d1, gain AS gain1, sse0 FROM g1
      ORDER BY gain DESC, rn LIMIT 1
    ), gl AS (
      SELECT c.rn, c.d,
             (cl.cx2 - cl.cx * cl.cx / s.t1)
             - ((c.cx2 - c.cx * c.cx / c.rn)
                + ((cl.cx2 - c.cx2)
                   - (cl.cx - c.cx) * (cl.cx - c.cx) / (s.t1 - c.rn)))
               AS gain
      FROM cum c, s1 s, (SELECT cx, cx2 FROM cum, s1 WHERE rn = t1) cl
      WHERE c.rn < s.t1
    ), gr AS (
      SELECT c.rn, c.d,
             ((c2.sx2 - c2.cx2t) - (c2.sx - c2.cxt) * (c2.sx - c2.cxt)
                / (c2.n - c2.t1))
             - (((c.cx2 - c2.cx2t)
                 - (c.cx - c2.cxt) * (c.cx - c2.cxt) / (c.rn - c2.t1))
                + ((c2.sx2 - c.cx2)
                   - (c2.sx - c.cx) * (c2.sx - c.cx) / (c2.n - c.rn)))
               AS gain
      FROM cum c,
           (SELECT cum.cx AS cxt, cum.cx2 AS cx2t, cum.n, cum.sx, cum.sx2,
                   s1.t1
            FROM cum, s1 WHERE cum.rn = s1.t1) c2
      WHERE c.rn > c2.t1 AND c.rn < c2.n
    ), bl AS (
      SELECT d AS dl, gain AS gl FROM gl ORDER BY gain DESC, rn LIMIT 1
    ), br AS (
      SELECT d AS dr, gain AS gr FROM gr ORDER BY gain DESC, rn LIMIT 1
    )
    SELECT s.d1 AS split1_day,
           ROUND(s.gain1 / s.sse0 + 5e-12, 6) AS var_explained1,
           bl.dl AS split_left_day, br.dr AS split_right_day,
           ROUND((s.gain1 + bl.gl + br.gr) / s.sse0 + 5e-12, 6)
             AS var_explained_total
    FROM s1 s, bl, br
"""


@register(
    "q636_binary_segmentation",
    _Q636_ORACLE,
    doc="Two-level binary segmentation: daily revenue split at the "
    "max-SSE-reduction day, each half re-split, via cumulative "
    "integer sums so every candidate gain is bitwise reproducible — "
    "the changepoint detector complementing CUSUM drift (q97) with "
    "actual break locations.",
)
def q636(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    )
    wo = Window.orderBy("d")
    wall = Window.partitionBy()
    cum = daily.select(
        F.row_number().over(wo).alias("rn"),
        "d",
        "x",
        F.sum("x").over(wo).alias("cx"),
        F.sum(F.col("x") * F.col("x")).over(wo).alias("cx2"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(wall).alias("sx2"),
    ).localCheckpoint(eager=False)
    sse0 = F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")
    sse_l = F.col("cx2") - F.col("cx") * F.col("cx") / F.col("rn")
    sse_r = (F.col("sx2") - F.col("cx2")) - (F.col("sx") - F.col("cx")) * (
        F.col("sx") - F.col("cx")
    ) / (F.col("n") - F.col("rn"))
    g1 = cum.filter(
        (F.col("rn") >= 3) & (F.col("rn") <= F.col("n") - 3)
    ).select(
        "rn", "d", (sse0 - (sse_l + sse_r)).alias("gain"), sse0.alias("sse0")
    )
    s1 = (
        g1.orderBy(F.desc("gain"), "rn")
        .limit(1)
        .select(
            F.col("rn").alias("t1"),
            F.col("d").alias("d1"),
            F.col("gain").alias("gain1"),
            "sse0",
        )
    )
    at_t1 = cum.join(F.broadcast(s1), cum.rn == F.col("t1")).select(
        F.col("cx").alias("cxt"),
        F.col("cx2").alias("cx2t"),
        "t1",
        F.col("n").alias("nn"),
        F.col("sx").alias("sxx"),
        F.col("sx2").alias("sxx2"),
    )
    lseg = cum.crossJoin(F.broadcast(at_t1)).filter(F.col("rn") < F.col("t1"))
    gl = lseg.select(
        "rn",
        "d",
        (
            (F.col("cx2t") - F.col("cxt") * F.col("cxt") / F.col("t1"))
            - (
                (F.col("cx2") - F.col("cx") * F.col("cx") / F.col("rn"))
                + (
                    (F.col("cx2t") - F.col("cx2"))
                    - (F.col("cxt") - F.col("cx"))
                    * (F.col("cxt") - F.col("cx"))
                    / (F.col("t1") - F.col("rn"))
                )
            )
        ).alias("gain"),
    )
    rseg = cum.crossJoin(F.broadcast(at_t1)).filter(
        (F.col("rn") > F.col("t1")) & (F.col("rn") < F.col("nn"))
    )
    gr = rseg.select(
        "rn",
        "d",
        (
            (
                (F.col("sxx2") - F.col("cx2t"))
                - (F.col("sxx") - F.col("cxt"))
                * (F.col("sxx") - F.col("cxt"))
                / (F.col("nn") - F.col("t1"))
            )
            - (
                (
                    (F.col("cx2") - F.col("cx2t"))
                    - (F.col("cx") - F.col("cxt"))
                    * (F.col("cx") - F.col("cxt"))
                    / (F.col("rn") - F.col("t1"))
                )
                + (
                    (F.col("sxx2") - F.col("cx2"))
                    - (F.col("sxx") - F.col("cx"))
                    * (F.col("sxx") - F.col("cx"))
                    / (F.col("nn") - F.col("rn"))
                )
            )
        ).alias("gain"),
    )
    bl = gl.orderBy(F.desc("gain"), "rn").limit(1).select(
        F.col("d").alias("dl"), F.col("gain").alias("gl")
    )
    br = gr.orderBy(F.desc("gain"), "rn").limit(1).select(
        F.col("d").alias("dr"), F.col("gain").alias("gr")
    )
    return (
        s1.crossJoin(F.broadcast(bl))
        .crossJoin(F.broadcast(br))
        .select(
            F.col("d1").alias("split1_day"),
            r6(F.col("gain1") / F.col("sse0")).alias("var_explained1"),
            F.col("dl").alias("split_left_day"),
            F.col("dr").alias("split_right_day"),
            r6(
                (F.col("gain1") + F.col("gl") + F.col("gr")) / F.col("sse0")
            ).alias("var_explained_total"),
        )
    )


# ---------------------------------------------------------------------------
# Q637 — regret matching converging to correlated equilibrium
# ---------------------------------------------------------------------------
# Sixty deterministic rounds of regret matching (expected-utility
# updates, no sampling) in a data-parameterized game of chicken:
# cumulative positive regrets define each round's mixed strategy,
# and the time-averaged strategies approach the correlated
# equilibrium — Hart-Mas-Colell's no-regret dynamics as a fold.
def _rm_fold(el: str, v: str) -> str:
    s = lambda k: f"{el}[{k}]" if el == "acc" else f"element_at(acc, {k})"
    p10, p11 = f"GREATEST({s(1)}, 0)", f"GREATEST({s(2)}, 0)"
    p20, p21 = f"GREATEST({s(3)}, 0)", f"GREATEST({s(4)}, 0)"
    s10 = f"(CASE WHEN {p10} + {p11} > 0 THEN {p10} / ({p10} + {p11}) ELSE 0.5 END)"
    s20 = f"(CASE WHEN {p20} + {p21} > 0 THEN {p20} / ({p20} + {p21}) ELSE 0.5 END)"
    u1a = f"({s20} * {v} + (1 - {s20}) * 2)"
    u1b = f"({s20} * ({v} + 1) + (1 - {s20}) * 0)"
    ub1 = f"({s10} * {u1a} + (1 - {s10}) * {u1b})"
    u2a = f"({s10} * {v} + (1 - {s10}) * 2)"
    u2b = f"({s10} * ({v} + 1) + (1 - {s10}) * 0)"
    ub2 = f"({s20} * {u2a} + (1 - {s20}) * {u2b})"
    arr = ", ".join(
        [
            f"{s(1)} + {u1a} - {ub1}",
            f"{s(2)} + {u1b} - {ub1}",
            f"{s(3)} + {u2a} - {ub2}",
            f"{s(4)} + {u2b} - {ub2}",
            f"{s(5)} + {s10}",
            f"{s(6)} + (1 - {s10})",
            f"{s(7)} + {s20}",
            f"{s(8)} + (1 - {s20})",
        ]
    )
    return arr


_Q637_ORACLE = f"""
    WITH param AS (
      SELECT CAST(COUNT(*) % 4 + 6 AS DOUBLE) AS v FROM orders
    ), folded AS (
      SELECT v,
             list_reduce(
               list_prepend([CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0],
                            list_transform(range(1, 61),
                                           i -> [CAST(i AS DOUBLE)])),
               (acc, x) -> [{_rm_fold('acc', 'v')}]
             ) AS f
      FROM param
    )
    SELECT ROUND(v + 5e-12, 6) AS swerve_payoff,
           ROUND(f[5] / 60 + 5e-12, 6) AS avg_p1_action0,
           ROUND(f[7] / 60 + 5e-12, 6) AS avg_p2_action0,
           ROUND(GREATEST(f[1], f[2], 0) / 60 + 5e-12, 6) AS p1_avg_regret,
           ROUND(GREATEST(f[3], f[4], 0) / 60 + 5e-12, 6) AS p2_avg_regret
    FROM folded
"""

_RM_SPARK_FOLD = (
    "aggregate(sequence(1, 60), "
    "array(CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0), "
    "(acc, x) -> array(" + _rm_fold("element_at", "v") + "))"
)


@register(
    "q637_regret_matching",
    _Q637_ORACLE,
    doc="Hart-Mas-Colell regret matching as a deterministic fold: 60 "
    "expected-utility rounds in a chicken game whose swerve payoff "
    "comes from the data, positive-regret-proportional strategies, "
    "time-averaged play and vanishing average regret — no-regret "
    "learning next to the static equilibria (q562, q416).",
)
def q637(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    param = o.agg(
        (F.count(F.lit(1)) % 4 + 6).cast("double").alias("v")
    )
    folded = param.select("v", F.expr(_RM_SPARK_FOLD).alias("f"))
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    return folded.select(
        r6(F.col("v")).alias("swerve_payoff"),
        r6(fe(5) / 60).alias("avg_p1_action0"),
        r6(fe(7) / 60).alias("avg_p2_action0"),
        r6(F.greatest(fe(1), fe(2), F.lit(0.0)) / 60).alias("p1_avg_regret"),
        r6(F.greatest(fe(3), fe(4), F.lit(0.0)) / 60).alias("p2_avg_regret"),
    )


# ---------------------------------------------------------------------------
# Q638 — dominant resource fairness (DRF) allocation
# ---------------------------------------------------------------------------
# Six tenants with (cpu, mem) task demands derived from their keys
# share a 100/100 cluster: DRF equalizes dominant shares, so the
# waterline sigma* = min over resources of capacity / sum(demand_r /
# dominant_r) is closed-form — compared against equal-task-count
# allocation via Jain's fairness index on dominant shares.
_Q638_ORACLE = """
    WITH top6 AS MATERIALIZED (
      SELECT o_custkey AS ck, COUNT(*) AS n
      FROM orders GROUP BY o_custkey
      ORDER BY COUNT(*) DESC, o_custkey LIMIT 6
    ), dem AS MATERIALIZED (
      SELECT ck, CAST(1 + ck % 3 AS DOUBLE) AS cpu,
             CAST(1 + ck % 4 AS DOUBLE) AS mem,
             GREATEST((1 + ck % 3) / 100.0, (1 + ck % 4) / 100.0) AS dom
      FROM top6
    ), water AS (
      SELECT LEAST(100.0 / SUM(cpu / dom), 100.0 / SUM(mem / dom)) AS sigma,
             CASE WHEN 100.0 / SUM(cpu / dom) <= 100.0 / SUM(mem / dom)
                  THEN 'cpu' ELSE 'mem' END AS binding,
             LEAST(100.0 / SUM(cpu), 100.0 / SUM(mem)) AS eq_tasks
      FROM dem
    ), jain AS (
      SELECT POW(SUM(d.dom * w.eq_tasks), 2)
               / (COUNT(*) * SUM(POW(d.dom * w.eq_tasks, 2))) AS j_eq
      FROM dem d, water w GROUP BY w.eq_tasks
    )
    SELECT d.ck AS tenant,
           CAST(d.cpu AS BIGINT) AS cpu_demand,
           CAST(d.mem AS BIGINT) AS mem_demand,
           ROUND(w.sigma / d.dom + 5e-12, 6) AS drf_tasks,
           ROUND(w.sigma + 5e-12, 6) AS dominant_share,
           w.binding AS binding_resource,
           ROUND(j.j_eq + 5e-12, 6) AS jain_equal_alloc
    FROM dem d, water w, jain j
    ORDER BY d.ck
"""


@register(
    "q638_dominant_resource_fairness",
    _Q638_ORACLE,
    doc="Dominant resource fairness: six tenants' (cpu, mem) demands "
    "against a 100/100 cluster, DRF waterline sigma* = min_r C_r / "
    "sum(demand_r/dominant) equalizing dominant shares, vs the "
    "equal-task allocation scored by Jain's fairness index — the "
    "multi-resource scheduler math (Ghodsi et al.), beyond "
    "single-resource water-filling (q256).",
)
def q638(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    top6 = (
        o.groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "ck")
        .limit(6)
    )
    dem = top6.select(
        "ck",
        (1 + F.col("ck") % 3).cast("double").alias("cpu"),
        (1 + F.col("ck") % 4).cast("double").alias("mem"),
        F.greatest(
            (1 + F.col("ck") % 3) / 100.0, (1 + F.col("ck") % 4) / 100.0
        ).alias("dom"),
    ).localCheckpoint(eager=False)
    water = dem.agg(
        F.least(
            100.0 / F.sum(F.col("cpu") / F.col("dom")),
            100.0 / F.sum(F.col("mem") / F.col("dom")),
        ).alias("sigma"),
        F.when(
            100.0 / F.sum(F.col("cpu") / F.col("dom"))
            <= 100.0 / F.sum(F.col("mem") / F.col("dom")),
            "cpu",
        )
        .otherwise("mem")
        .alias("binding"),
        F.least(100.0 / F.sum("cpu"), 100.0 / F.sum("mem")).alias("eq_tasks"),
    )
    jain = (
        dem.crossJoin(F.broadcast(water))
        .groupBy("eq_tasks")
        .agg(
            (
                F.pow(F.sum(F.col("dom") * F.col("eq_tasks")), 2)
                / (
                    F.count(F.lit(1))
                    * F.sum(F.pow(F.col("dom") * F.col("eq_tasks"), 2))
                )
            ).alias("j_eq")
        )
        .select("j_eq")
    )
    return (
        dem.crossJoin(F.broadcast(water))
        .crossJoin(F.broadcast(jain))
        .select(
            F.col("ck").alias("tenant"),
            F.col("cpu").cast("bigint").alias("cpu_demand"),
            F.col("mem").cast("bigint").alias("mem_demand"),
            r6(F.col("sigma") / F.col("dom")).alias("drf_tasks"),
            r6(F.col("sigma")).alias("dominant_share"),
            F.col("binding").alias("binding_resource"),
            r6(F.col("j_eq")).alias("jain_equal_alloc"),
        )
        .orderBy("tenant")
    )
