"""Conformance queries batch #101 (q700+) — performance attribution,
tokenizer merges, variance-based sensitivity, energy distance, and
online perceptron learning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q700 — Brinson-Fachler performance attribution
# ---------------------------------------------------------------------------
# AUTOMOBILE customers as the portfolio, everyone as the benchmark,
# five nation-bloc sectors, first-half spend shares as weights and
# half-over-half growth as returns: each sector's active return
# split into allocation (wp - wb)(rb_s - rb), selection wb(rp_s -
# rb_s) and interaction — the attribution identity every fund
# report runs.
_Q700_ORACLE = """
    WITH flows AS MATERIALIZED (
      SELECT c.c_nationkey % 5 AS sector,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                  THEN 1 ELSE 0 END AS in_p,
             SUM(CASE WHEN EXTRACT(day FROM e.ts) <= 15
                      THEN ROUND(e.value * 100) ELSE 0 END) AS h1,
             SUM(CASE WHEN EXTRACT(day FROM e.ts) > 15
                      THEN ROUND(e.value * 100) ELSE 0 END) AS h2
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey % 5, 2
    ), grp AS MATERIALIZED (
      SELECT sector,
             SUM(CASE WHEN in_p = 1 THEN h1 ELSE 0 END) AS p1,
             SUM(CASE WHEN in_p = 1 THEN h2 ELSE 0 END) AS p2,
             SUM(h1) AS b1, SUM(h2) AS b2
      FROM flows GROUP BY sector
    ), weighted AS MATERIALIZED (
      SELECT sector,
             CASE WHEN SUM(p1) OVER () > 0
                  THEN p1 * 1.0 / SUM(p1) OVER () END AS wp,
             b1 * 1.0 / SUM(b1) OVER () AS wb,
             CASE WHEN p1 > 0 THEN p2 * 1.0 / p1 - 1 END AS rp,
             CASE WHEN b1 > 0 THEN b2 * 1.0 / b1 - 1 END AS rb_s
      FROM grp
    ), bench AS (
      SELECT SUM(wb * rb_s) AS rb FROM weighted
    )
    SELECT w.sector,
           ROUND(w.wp + 5e-12, 6) AS weight_portfolio,
           ROUND(w.wb + 5e-12, 6) AS weight_benchmark,
           ROUND(w.rp + 5e-12, 6) AS return_portfolio,
           ROUND(w.rb_s + 5e-12, 6) AS return_benchmark,
           ROUND((w.wp - w.wb) * (w.rb_s - b.rb) + 5e-12, 6) AS allocation,
           ROUND(w.wb * (w.rp - w.rb_s) + 5e-12, 6) AS selection,
           ROUND((w.wp - w.wb) * (w.rp - w.rb_s) + 5e-12, 6) AS interaction
    FROM weighted w, bench b
    ORDER BY w.sector
"""


@register(
    "q700_brinson_attribution",
    _Q700_ORACLE,
    doc="Brinson-Fachler attribution: AUTOMOBILE portfolio vs the "
    "all-customer benchmark over five nation-bloc sectors, "
    "half-over-half growth as returns, active return split into "
    "allocation, selection and interaction per sector — fund "
    "reporting's identity beside revenue waterfalls (q406) and "
    "mix-rate decomposition (q370).",
)
def q700(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    flows = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            (F.col("c_nationkey") % 5).alias("sector"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("in_p"),
        )
        .agg(
            F.sum(
                F.when(
                    F.dayofmonth("ts") <= 15, F.round(F.col("value") * 100)
                ).otherwise(0)
            ).alias("h1"),
            F.sum(
                F.when(
                    F.dayofmonth("ts") > 15, F.round(F.col("value") * 100)
                ).otherwise(0)
            ).alias("h2"),
        )
    )
    grp = flows.groupBy("sector").agg(
        F.sum(F.when(F.col("in_p") == 1, F.col("h1")).otherwise(0)).alias("p1"),
        F.sum(F.when(F.col("in_p") == 1, F.col("h2")).otherwise(0)).alias("p2"),
        F.sum("h1").alias("b1"),
        F.sum("h2").alias("b2"),
    )
    wall = Window.partitionBy()
    weighted = grp.select(
        "sector",
        F.when(
            F.sum("p1").over(wall) > 0,
            F.col("p1") * 1.0 / F.sum("p1").over(wall),
        ).alias("wp"),
        (F.col("b1") * 1.0 / F.sum("b1").over(wall)).alias("wb"),
        F.when(
            F.col("p1") > 0, F.col("p2") * 1.0 / F.col("p1") - 1
        ).alias("rp"),
        F.when(
            F.col("b1") > 0, F.col("b2") * 1.0 / F.col("b1") - 1
        ).alias("rb_s"),
    ).localCheckpoint(eager=False)
    bench = weighted.agg(
        F.sum(F.col("wb") * F.col("rb_s")).alias("rb")
    )
    return (
        weighted.crossJoin(F.broadcast(bench))
        .select(
            "sector",
            r6(F.col("wp")).alias("weight_portfolio"),
            r6(F.col("wb")).alias("weight_benchmark"),
            r6(F.col("rp")).alias("return_portfolio"),
            r6(F.col("rb_s")).alias("return_benchmark"),
            r6(
                (F.col("wp") - F.col("wb")) * (F.col("rb_s") - F.col("rb"))
            ).alias("allocation"),
            r6(F.col("wb") * (F.col("rp") - F.col("rb_s"))).alias("selection"),
            r6(
                (F.col("wp") - F.col("wb")) * (F.col("rp") - F.col("rb_s"))
            ).alias("interaction"),
        )
        .orderBy("sector")
    )


# ---------------------------------------------------------------------------
# Q701 — one BPE merge step on the English corpus
# ---------------------------------------------------------------------------
# Character streams of English documents: the most frequent
# adjacent distinct-symbol pair becomes the first merged token
# (distinct symbols cannot overlap, so every occurrence merges),
# shrinking the token count — the greedy step that byte-pair
# tokenizers (q62's budgets, q386's coverage) iterate thousands of
# times.
_Q701_ORACLE = """
    WITH docs AS MATERIALIZED (
      SELECT doc_id, REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g') AS s
      FROM documents WHERE lang = 'en'
    ), chars AS MATERIALIZED (
      SELECT d.doc_id, g.i,
             SUBSTR(d.s, CAST(g.i AS BIGINT), 1) AS ch,
             SUBSTR(d.s, CAST(g.i AS BIGINT) + 1, 1) AS nxt
      FROM docs d
      CROSS JOIN (SELECT UNNEST(range(1, 4001)) AS i) g
      WHERE g.i <= LENGTH(d.s)
    ), n_tok AS (
      SELECT COUNT(*) AS n FROM chars
    ), pairs AS MATERIALIZED (
      SELECT ch || nxt AS pair, COUNT(*) AS c
      FROM chars WHERE nxt <> '' AND nxt <> ch
      GROUP BY ch || nxt
    ), top_pair AS (
      SELECT pair, c FROM pairs ORDER BY c DESC, pair LIMIT 1
    )
    SELECT t.pair AS merged_pair,
           CAST(t.c AS BIGINT) AS merge_count,
           CAST(n.n AS BIGINT) AS tokens_before,
           CAST(n.n - t.c AS BIGINT) AS tokens_after,
           ROUND(t.c * 1.0 / n.n + 5e-12, 6) AS pair_share,
           ROUND((n.n - t.c) * 1.0 / n.n + 5e-12, 6) AS compression_ratio
    FROM top_pair t, n_tok n
"""


@register(
    "q701_bpe_merge",
    _Q701_ORACLE,
    doc="One byte-pair-encoding merge: character streams of English "
    "documents, the most frequent adjacent distinct-symbol pair "
    "(distinct symbols never overlap, so count = merges) becomes a "
    "token, shrinking the stream — the greedy tokenizer step under "
    "token budgeting (q62) and vocabulary coverage (q386).",
)
def q701(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    docs = d.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z]", "").alias("s"),
    )
    idx = spark.range(1, 4001).select(F.col("id").cast("int").alias("i"))
    chars = (
        docs.crossJoin(F.broadcast(idx))
        .filter(F.col("i") <= F.length("s"))
        .select(
            F.expr("substr(s, i, 1)").alias("ch"),
            F.expr("substr(s, i + 1, 1)").alias("nxt"),
        )
        .localCheckpoint(eager=False)
    )
    n_tok = chars.agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        chars.filter((F.col("nxt") != "") & (F.col("nxt") != F.col("ch")))
        .groupBy(F.concat("ch", "nxt").alias("pair"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_pair = pairs.orderBy(F.desc("c"), "pair").limit(1)
    return top_pair.crossJoin(F.broadcast(n_tok)).select(
        F.col("pair").alias("merged_pair"),
        F.col("c").cast("bigint").alias("merge_count"),
        F.col("n").cast("bigint").alias("tokens_before"),
        (F.col("n") - F.col("c")).cast("bigint").alias("tokens_after"),
        r6(F.col("c") * 1.0 / F.col("n")).alias("pair_share"),
        r6((F.col("n") - F.col("c")) * 1.0 / F.col("n")).alias(
            "compression_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Q702 — first-order Sobol sensitivity indices
# ---------------------------------------------------------------------------
# A revenue response f(x, y) = x y + 0.5 x^2 evaluated on the
# independent product grid of balance-decile and spend-decile means:
# S1_x = Var_x(E_y f) / Var(f) and S1_y likewise, the remainder
# being interaction — variance-based global sensitivity beyond the
# one-at-a-time tornado (q547).
_Q702_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) / 1e5 AS bal,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1e6 AS sp,
             c.c_custkey AS ck
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), xd AS MATERIALIZED (
      SELECT AVG(bal) AS x FROM (
        SELECT bal, NTILE(10) OVER (ORDER BY bal, ck) AS dx FROM u)
      GROUP BY dx
    ), yd AS MATERIALIZED (
      SELECT AVG(sp) AS y FROM (
        SELECT sp, NTILE(10) OVER (ORDER BY sp, ck) AS dy FROM u)
      GROUP BY dy
    ), grid AS MATERIALIZED (
      SELECT x, y, x * y + 0.5 * x * x AS f FROM xd, yd
    ), tot AS (
      SELECT AVG(f) AS mf, AVG(f * f) - AVG(f) * AVG(f) AS vf FROM grid
    ), condx AS (
      SELECT x, AVG(f) AS ef FROM grid GROUP BY x
    ), condy AS (
      SELECT y, AVG(f) AS ef FROM grid GROUP BY y
    ), s1 AS (
      SELECT (SELECT AVG((ef - t.mf) * (ef - t.mf)) FROM condx) / t.vf AS sx,
             (SELECT AVG((ef - t.mf) * (ef - t.mf)) FROM condy) / t.vf AS sy,
             t.vf
      FROM tot t
    )
    SELECT ROUND(sx + 5e-12, 6) AS sobol_x_balance,
           ROUND(sy + 5e-12, 6) AS sobol_y_spend,
           ROUND(1 - sx - sy + 5e-12, 6) AS interaction_share,
           ROUND(vf + 5e-10, 4) AS total_variance,
           sx > sy AS balance_dominates
    FROM s1
"""


@register(
    "q702_sobol_first_order",
    _Q702_ORACLE,
    doc="First-order Sobol indices of f(x,y) = xy + 0.5x^2 on the "
    "independent product grid of balance- and spend-decile means: "
    "S1 = Var(E[f|.])/Var(f) per input plus the interaction "
    "remainder — variance-based global sensitivity beyond the "
    "tornado diagram (q547) and linear SHAP (q537).",
)
def q702(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
                / 1e6
            ).alias("sp")
        )
        .select(
            (F.round(F.col("c_acctbal") * 100) / 1e5).alias("bal"),
            "sp",
            F.col("c_custkey").alias("ck"),
        )
        # lineage cut: u feeds both decile marginals (plan audit: 22
        # scans with persist-only lineage)
        .localCheckpoint(eager=False)
    )
    xd = (
        u.select(
            "bal", F.ntile(10).over(Window.orderBy("bal", "ck")).alias("dx")
        )
        .groupBy("dx")
        .agg(F.avg("bal").alias("x"))
        .select("x")
    )
    yd = (
        u.select(
            "sp", F.ntile(10).over(Window.orderBy("sp", "ck")).alias("dy")
        )
        .groupBy("dy")
        .agg(F.avg("sp").alias("y"))
        .select("y")
    )
    grid = xd.crossJoin(yd).select(
        "x",
        "y",
        (F.col("x") * F.col("y") + 0.5 * F.col("x") * F.col("x")).alias("f"),
    ).localCheckpoint(eager=False)
    tot = grid.agg(
        F.avg("f").alias("mf"),
        (F.avg(F.col("f") * F.col("f")) - F.avg("f") * F.avg("f")).alias("vf"),
    )
    condx = grid.groupBy("x").agg(F.avg("f").alias("ef"))
    condy = grid.groupBy("y").agg(F.avg("f").alias("ef"))
    vx = condx.crossJoin(F.broadcast(tot)).agg(
        (
            F.avg((F.col("ef") - F.col("mf")) * (F.col("ef") - F.col("mf")))
            / F.max("vf")
        ).alias("sx")
    )
    vy = condy.crossJoin(F.broadcast(tot)).agg(
        (
            F.avg((F.col("ef") - F.col("mf")) * (F.col("ef") - F.col("mf")))
            / F.max("vf")
        ).alias("sy")
    )
    return (
        vx.crossJoin(F.broadcast(vy))
        .crossJoin(F.broadcast(tot))
        .select(
            r6(F.col("sx")).alias("sobol_x_balance"),
            r6(F.col("sy")).alias("sobol_y_spend"),
            r6(1 - F.col("sx") - F.col("sy")).alias("interaction_share"),
            F.round(F.col("vf") + F.lit(5e-10), 4).alias("total_variance"),
            (F.col("sx") > F.col("sy")).alias("balance_dominates"),
        )
    )


# ---------------------------------------------------------------------------
# Q703 — energy distance between two price distributions
# ---------------------------------------------------------------------------
# URGENT vs LOW order prices (first 200 each): the energy statistic
# E = 2 E|X-Y| - E|X-X'| - E|Y-Y'| and its scaled test version
# nm/(n+m) E — a characteristic-function-complete two-sample test
# that beats KS (q147) and CvM (q668) against multi-feature
# alternatives, exact in whole dollars.
_Q703_ORACLE = """
    WITH xs AS MATERIALIZED (
      SELECT ROUND(o_totalprice) AS v
      FROM (SELECT o_totalprice, ROW_NUMBER() OVER (ORDER BY o_orderkey)
              AS rn
            FROM orders WHERE o_orderpriority = '1-URGENT')
      WHERE rn <= 200
    ), ys AS MATERIALIZED (
      SELECT ROUND(o_totalprice) AS v
      FROM (SELECT o_totalprice, ROW_NUMBER() OVER (ORDER BY o_orderkey)
              AS rn
            FROM orders WHERE o_orderpriority = '5-LOW')
      WHERE rn <= 200
    ), terms AS (
      SELECT (SELECT AVG(ABS(a.v - b.v) * 1.0) FROM xs a, ys b) AS axy,
             (SELECT AVG(ABS(a.v - b.v) * 1.0) FROM xs a, xs b) AS axx,
             (SELECT AVG(ABS(a.v - b.v) * 1.0) FROM ys a, ys b) AS ayy,
             (SELECT COUNT(*) FROM xs) AS n,
             (SELECT COUNT(*) FROM ys) AS m
    )
    SELECT CAST(n AS BIGINT) AS n_x,
           CAST(m AS BIGINT) AS n_y,
           ROUND(axy + 5e-10, 4) AS mean_cross_distance,
           ROUND(2 * axy - axx - ayy + 5e-10, 4) AS energy_distance,
           ROUND((n * m * 1.0 / (n + m)) * (2 * axy - axx - ayy)
                 + 5e-10, 4) AS energy_statistic,
           2 * axy - axx - ayy > 0 AS distributions_differ_direction
    FROM terms
"""


@register(
    "q703_energy_distance",
    _Q703_ORACLE,
    doc="Energy distance: URGENT vs LOW order prices (200 each), "
    "E = 2E|X-Y| - E|X-X'| - E|Y-Y'| and the nm/(n+m)-scaled "
    "statistic, exact whole-dollar arithmetic — the characteristic-"
    "function-complete two-sample test beside KS (q147), CvM "
    "(q668) and MMD (q427).",
)
def q703(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def sample(prio: str, nm: str) -> DataFrame:
        return (
            # first-200-by-key via TakeOrderedAndProject (per-partition
            # heaps), not a single-task global row_number window
            o.filter(F.col("o_orderpriority") == prio)
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey")
            .limit(200)
            .select(F.round("o_totalprice").alias(nm))
        )

    xs = sample("1-URGENT", "xv").localCheckpoint(eager=False)
    ys = sample("5-LOW", "yv").localCheckpoint(eager=False)
    axy = xs.crossJoin(ys).agg(
        F.avg(F.abs(F.col("xv") - F.col("yv")) * 1.0).alias("axy")
    )
    axx = xs.crossJoin(xs.withColumnRenamed("xv", "xv2")).agg(
        F.avg(F.abs(F.col("xv") - F.col("xv2")) * 1.0).alias("axx")
    )
    ayy = ys.crossJoin(ys.withColumnRenamed("yv", "yv2")).agg(
        F.avg(F.abs(F.col("yv") - F.col("yv2")) * 1.0).alias("ayy")
    )
    nx = xs.agg(F.count(F.lit(1)).alias("n"))
    my = ys.agg(F.count(F.lit(1)).alias("m"))
    e = 2 * F.col("axy") - F.col("axx") - F.col("ayy")
    return (
        axy.crossJoin(F.broadcast(axx))
        .crossJoin(F.broadcast(ayy))
        .crossJoin(F.broadcast(nx))
        .crossJoin(F.broadcast(my))
        .select(
            F.col("n").cast("bigint").alias("n_x"),
            F.col("m").cast("bigint").alias("n_y"),
            F.round(F.col("axy") + F.lit(5e-10), 4).alias(
                "mean_cross_distance"
            ),
            F.round(e + F.lit(5e-10), 4).alias("energy_distance"),
            F.round(
                (F.col("n") * F.col("m") * 1.0 / (F.col("n") + F.col("m"))) * e
                + F.lit(5e-10),
                4,
            ).alias("energy_statistic"),
            (e > 0).alias("distributions_differ_direction"),
        )
    )


# ---------------------------------------------------------------------------
# Q705 — perceptron training replayed as a fold
# ---------------------------------------------------------------------------
# Rosenblatt's perceptron on 200 standardized (balance, order-count)
# points labeling AUTOMOBILE vs rest, three fixed-order epochs as a
# fold over the tripled sample: mistake-driven updates w += y x,
# then the final boundary's training error scored relationally —
# online learning beside Oja's PCA stream (q644).
def _perc_fold(el) -> str:
    marg = (
        f"(x[3] * ({el(1)} * x[1] + {el(2)} * x[2] + {el(3)}))"
    )
    upd = f"CASE WHEN {marg} <= 0 THEN 1 ELSE 0 END"
    return ", ".join(
        [
            f"{el(1)} + ({upd}) * x[3] * x[1]",
            f"{el(2)} + ({upd}) * x[3] * x[2]",
            f"{el(3)} + ({upd}) * x[3]",
            f"{el(4)} + ({upd})",
        ]
    )


_Q705_ORACLE = f"""
    WITH raw AS MATERIALIZED (
      SELECT c.c_custkey AS ck,
             ROUND(c.c_acctbal * 100) AS xa,
             COUNT(o.o_orderkey) AS xb,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                  THEN 1.0 ELSE -1.0 END AS y
      FROM (SELECT c_custkey, c_acctbal, c_mktsegment,
                   ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
            FROM customer) c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE c.rn <= 200
      GROUP BY c.c_custkey, c.c_acctbal, c.c_mktsegment
    ), mom AS (
      SELECT COUNT(*) AS n, AVG(xa) AS ma, AVG(xb) AS mb,
             SQRT(AVG(xa * xa) - AVG(xa) * AVG(xa)) AS sa,
             SQRT(AVG(xb * xb) - AVG(xb) * AVG(xb)) AS sb
      FROM raw
    ), std AS MATERIALIZED (
      SELECT r.ck, (r.xa - m.ma) / m.sa AS x1,
             (r.xb - m.mb) / m.sb AS x2, r.y
      FROM raw r, mom m
    ), arr AS (
      SELECT list([x1, x2, y] ORDER BY ck) AS xs1 FROM std
    ), folded AS (
      SELECT list_reduce(
               list_prepend([CAST(0 AS DOUBLE), 0, 0, 0],
                 list_concat(list_concat(xs1, xs1), xs1)),
               (acc, x) -> [{_perc_fold(lambda k: f'acc[{k}]')}]
             ) AS f
      FROM arr
    ), err AS (
      SELECT AVG(CASE WHEN s.y * (fd.f[1] * s.x1 + fd.f[2] * s.x2
                                  + fd.f[3]) <= 0
                      THEN 1.0 ELSE 0 END) AS e
      FROM std s, folded fd
    )
    SELECT ROUND((SELECT f[1] FROM folded) + 5e-12, 6) AS w_balance,
           ROUND((SELECT f[2] FROM folded) + 5e-12, 6) AS w_orders,
           ROUND((SELECT f[3] FROM folded) + 5e-12, 6) AS bias,
           CAST((SELECT f[4] FROM folded) AS BIGINT) AS n_updates,
           ROUND((SELECT e FROM err) + 5e-12, 6) AS training_error
"""


@register(
    "q705_perceptron_fold",
    _Q705_ORACLE,
    doc="Rosenblatt perceptron as a fold: three fixed-order epochs "
    "over 200 standardized (balance, order-count) points labeled "
    "AUTOMOBILE vs rest, mistake-driven updates, final boundary "
    "scored for training error — online classification beside "
    "Oja's streaming PCA (q644) and Fisher LDA (q696).",
)
def q705(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    raw = (
        # first-200-by-key via TakeOrderedAndProject, not a global window
        c.select("c_custkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(200)
        .join(o, F.col("c_custkey") == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("xb"))
        .select(
            F.col("c_custkey").alias("ck"),
            F.round(F.col("c_acctbal") * 100).alias("xa"),
            "xb",
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1.0)
            .otherwise(-1.0)
            .alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    mom = raw.agg(
        F.avg("xa").alias("ma"),
        F.avg("xb").alias("mb"),
        F.sqrt(F.avg(F.col("xa") * F.col("xa")) - F.avg("xa") * F.avg("xa")).alias(
            "sa"
        ),
        F.sqrt(F.avg(F.col("xb") * F.col("xb")) - F.avg("xb") * F.avg("xb")).alias(
            "sb"
        ),
    )
    std = raw.crossJoin(F.broadcast(mom)).select(
        "ck",
        ((F.col("xa") - F.col("ma")) / F.col("sa")).alias("x1"),
        ((F.col("xb") - F.col("mb")) / F.col("sb")).alias("x2"),
        "y",
    ).localCheckpoint(eager=False)
    arr = std.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ck", "x1", "x2", "y"))),
            lambda s: F.array(s["x1"], s["x2"], s["y"]),
        ).alias("xs1")
    )
    fold = (
        "aggregate(concat(concat(xs1, xs1), xs1), "
        "array(CAST(0 AS DOUBLE), 0, 0, 0), "
        "(acc, x) -> array("
        + _perc_fold(lambda k: f"element_at(acc, {k})").replace(
            "x[1]", "element_at(x, 1)"
        ).replace("x[2]", "element_at(x, 2)").replace(
            "x[3]", "element_at(x, 3)"
        )
        + "))"
    )
    folded = arr.select(F.expr(fold).alias("f"))
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    err = (
        std.crossJoin(F.broadcast(folded))
        .agg(
            F.avg(
                F.when(
                    F.col("y")
                    * (
                        F.element_at("f", 1) * F.col("x1")
                        + F.element_at("f", 2) * F.col("x2")
                        + F.element_at("f", 3)
                    )
                    <= 0,
                    1.0,
                ).otherwise(0.0)
            ).alias("e")
        )
    )
    return folded.crossJoin(F.broadcast(err)).select(
        r6(fe(1)).alias("w_balance"),
        r6(fe(2)).alias("w_orders"),
        r6(fe(3)).alias("bias"),
        fe(4).cast("bigint").alias("n_updates"),
        r6(F.col("e")).alias("training_error"),
    )
