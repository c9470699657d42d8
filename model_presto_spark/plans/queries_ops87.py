"""Conformance queries batch #87 (q629+) — critical-path scheduling,
Misra-Gries space-saving sketch, corpus keyness, synthetic control,
and reservoir-sampling replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q629 — critical-path method on layered task DAGs
# ---------------------------------------------------------------------------
# Each order is a project: lineitems are tasks (duration = quantity)
# in layers of two, every task depending on all of the previous
# layer. Makespan = sum of per-layer maxima, slack = layer max minus
# own duration — CPM's forward pass, fully relational, giving the
# parallelism (serial / makespan) a scheduler could extract.
_Q629_ORACLE = """
    WITH layers AS MATERIALIZED (
      SELECT l_orderkey AS ok,
             CAST(FLOOR((l_linenumber - 1) / 2) AS BIGINT) AS layer,
             MAX(l_quantity) AS mx, SUM(l_quantity) AS sm,
             COUNT(*) AS cnt
      FROM lineitem
      GROUP BY l_orderkey, FLOOR((l_linenumber - 1) / 2)
    ), proj AS (
      SELECT ok, SUM(mx) AS makespan, SUM(sm) AS serial,
             SUM(cnt * mx - sm) AS slack, SUM(cnt) AS nt
      FROM layers GROUP BY ok
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_projects,
           ROUND(AVG(serial / makespan) + 5e-12, 6) AS avg_parallelism,
           ROUND(MAX(serial / makespan) + 5e-12, 6) AS max_parallelism,
           ROUND(AVG(makespan) + 5e-12, 6) AS avg_makespan,
           ROUND(SUM(slack) * 1.0 / SUM(serial) + 5e-12, 6) AS slack_share
    FROM proj
"""


@register(
    "q629_critical_path",
    _Q629_ORACLE,
    doc="Critical-path method: per-order layered task DAG (layers of "
    "two lineitems, full inter-layer dependencies), makespan as the "
    "sum of layer maxima, per-task slack, and the achievable "
    "parallelism ratio — CPM's forward pass done relationally.",
)
def q629(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    layers = li.groupBy(
        F.col("l_orderkey").alias("ok"),
        F.floor((F.col("l_linenumber") - 1) / 2).cast("bigint").alias("layer"),
    ).agg(
        F.max("l_quantity").alias("mx"),
        F.sum("l_quantity").alias("sm"),
        F.count(F.lit(1)).alias("cnt"),
    )
    proj = layers.groupBy("ok").agg(
        F.sum("mx").alias("makespan"),
        F.sum("sm").alias("serial"),
        F.sum(F.col("cnt") * F.col("mx") - F.col("sm")).alias("slack"),
    )
    return proj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_projects"),
        r6(F.avg(F.col("serial") / F.col("makespan"))).alias("avg_parallelism"),
        r6(F.max(F.col("serial") / F.col("makespan"))).alias("max_parallelism"),
        r6(F.avg("makespan")).alias("avg_makespan"),
        r6(F.sum("slack") * 1.0 / F.sum("serial")).alias("slack_share"),
    )


# ---------------------------------------------------------------------------
# Q630 — Misra-Gries space-saving heavy hitters as a fold
# ---------------------------------------------------------------------------
# The k=4-counter Misra-Gries summary replayed over the first 400
# orders' customer buckets (custkey % 12): match -> increment, empty
# slot -> install, full -> decrement all. The deterministic stream
# sketch behind every "top talkers" dashboard, checked against its
# frequency guarantee (true - est <= N/k) on the true mode.
def _mg_fold(el, xv: str) -> str:
    m = (
        f"CASE WHEN {el(1)}={xv} THEN 1 WHEN {el(3)}={xv} THEN 2 "
        f"WHEN {el(5)}={xv} THEN 3 WHEN {el(7)}={xv} THEN 4 ELSE 0 END"
    )
    z = (
        f"CASE WHEN {el(2)}=0 THEN 1 WHEN {el(4)}=0 THEN 2 "
        f"WHEN {el(6)}=0 THEN 3 WHEN {el(8)}=0 THEN 4 ELSE 0 END"
    )
    slots = []
    for p in range(1, 9):
        i = (p + 1) // 2
        if p % 2 == 1:  # key slot
            slots.append(
                f"CASE WHEN ({m}) > 0 THEN {el(p)} "
                f"WHEN ({z}) = {i} THEN {xv} ELSE {el(p)} END"
            )
        else:  # count slot
            slots.append(
                f"CASE WHEN ({m}) = {i} THEN {el(p)} + 1 "
                f"WHEN ({m}) > 0 THEN {el(p)} "
                f"WHEN ({z}) = {i} THEN 1 "
                f"WHEN ({z}) > 0 THEN {el(p)} "
                f"ELSE {el(p)} - 1 END"
            )
    return "[" + ", ".join(slots) + "]"


_MG_INIT = "CAST(-1 AS DOUBLE), 0, -1, 0, -1, 0, -1, 0"

_Q630_ORACLE = f"""
    WITH stream AS MATERIALIZED (
      SELECT rn, CAST(o_custkey % 12 AS DOUBLE) AS xv
      FROM (SELECT o_custkey,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 400
    ), folded AS (
      SELECT COUNT(*) AS n,
             list_reduce(
               list_prepend([{_MG_INIT}],
                            list([xv] ORDER BY rn)),
               (acc, x) -> {_mg_fold(lambda k: f'acc[{k}]', 'x[1]')}
             ) AS f
      FROM stream
    ), truth AS (
      SELECT xv AS tk, COUNT(*) AS tc FROM stream
      GROUP BY xv ORDER BY COUNT(*) DESC, xv LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(tk AS BIGINT) AS true_top_key,
           CAST(tc AS BIGINT) AS true_top_count,
           CAST(CASE WHEN f[1] = tk THEN f[2] WHEN f[3] = tk THEN f[4]
                     WHEN f[5] = tk THEN f[6] WHEN f[7] = tk THEN f[8]
                     ELSE 0 END AS BIGINT) AS mg_estimate,
           CAST((CASE WHEN f[2] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN f[4] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN f[6] > 0 THEN 1 ELSE 0 END)
              + (CASE WHEN f[8] > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS live_counters,
           tc - (CASE WHEN f[1] = tk THEN f[2] WHEN f[3] = tk THEN f[4]
                      WHEN f[5] = tk THEN f[6] WHEN f[7] = tk THEN f[8]
                      ELSE 0 END) <= n / 4.0 AS guarantee_ok
    FROM folded, truth
"""

_MG_SPARK_FOLD = (
    "aggregate(xs, array(" + _MG_INIT + "), (acc, x) -> "
    + _mg_fold(lambda k: f"element_at(acc,{k})", "x").replace("[", "array(", 1)[:-1]
    + ")"
    + ")"
)


@register(
    "q630_space_saving",
    _Q630_ORACLE,
    doc="Misra-Gries k=4 heavy-hitter sketch replayed as a fold over "
    "the first 400 orders' customer buckets (match/install/"
    "decrement-all), with the true mode's count checked against the "
    "frequency guarantee true - est <= N/k — the deterministic "
    "companion to the CMS sketch (q195).",
)
def q630(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    stream = (
        o.select(
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
            (F.col("o_custkey") % 12).cast("double").alias("xv"),
        )
        .filter(F.col("rn") <= 400)
        .localCheckpoint(eager=False)
    )
    folded = stream.agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "xv"))),
            lambda s: s.xv,
        ).alias("xs"),
    ).select("n", F.expr(_MG_SPARK_FOLD).alias("f"))
    truth = (
        stream.groupBy("xv")
        .agg(F.count(F.lit(1)).alias("tc"))
        .orderBy(F.desc("tc"), "xv")
        .limit(1)
        .select(F.col("xv").alias("tk"), "tc")
    )
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    est = (
        F.when(fe(1) == F.col("tk"), fe(2))
        .when(fe(3) == F.col("tk"), fe(4))
        .when(fe(5) == F.col("tk"), fe(6))
        .when(fe(7) == F.col("tk"), fe(8))
        .otherwise(0.0)
    )
    live = sum(
        F.when(fe(k) > 0, 1).otherwise(0) for k in (2, 4, 6, 8)
    )
    return folded.crossJoin(F.broadcast(truth)).select(
        F.col("n").cast("bigint").alias("n_items"),
        F.col("tk").cast("bigint").alias("true_top_key"),
        F.col("tc").cast("bigint").alias("true_top_count"),
        est.cast("bigint").alias("mg_estimate"),
        live.cast("bigint").alias("live_counters"),
        (F.col("tc") - est <= F.col("n") / 4.0).alias("guarantee_ok"),
    )


# ---------------------------------------------------------------------------
# Q631 — Dunning log-likelihood keyness
# ---------------------------------------------------------------------------
# Which words mark the largest English source apart from the rest of
# the English corpus? The G^2 log-likelihood keyness statistic per
# token (expected counts from pooled rates), top-10 by G^2 — corpus
# linguistics' standard keyword extractor, sharper than raw tf-idf
# for contrastive vocabularies.
_Q631_ORACLE = """
    WITH en AS MATERIALIZED (
      SELECT source, lower(text) AS txt FROM documents WHERE lang = 'en'
    ), top_src AS (
      SELECT source FROM en GROUP BY source
      ORDER BY COUNT(*) DESC, source LIMIT 1
    ), toks AS MATERIALIZED (
      SELECT CASE WHEN e.source = (SELECT source FROM top_src)
                  THEN 1 ELSE 0 END AS ina,
             unnest(regexp_extract_all(e.txt, '[a-z]{3,}')) AS tok
      FROM en e
    ), cnt AS MATERIALIZED (
      SELECT tok, SUM(ina) AS a, SUM(1 - ina) AS b
      FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(a) AS na, SUM(b) AS nb FROM cnt
    ), g AS (
      SELECT c.tok, c.a, c.b,
             2 * ((CASE WHEN c.a > 0 THEN
                     c.a * LN(c.a / ((c.a + c.b) * t.na / (t.na + t.nb)))
                   ELSE 0 END)
                + (CASE WHEN c.b > 0 THEN
                     c.b * LN(c.b / ((c.a + c.b) * t.nb / (t.na + t.nb)))
                   ELSE 0 END)) AS g2,
             c.a * 1.0 / t.na > c.b * 1.0 / t.nb AS over_a
      FROM cnt c, tot t
      WHERE c.a + c.b >= 20
    )
    SELECT tok, CAST(a AS BIGINT) AS cnt_top_source,
           CAST(b AS BIGINT) AS cnt_rest,
           ROUND(g2 + 5e-12, 6) AS g2_keyness,
           over_a AS overused_in_top_source
    FROM g
    ORDER BY ROUND(g2 + 5e-12, 6) DESC, tok
    LIMIT 10
"""


@register(
    "q631_keyness_loglik",
    _Q631_ORACLE,
    doc="Dunning G^2 log-likelihood keyness: token counts of the "
    "largest English source vs the rest of the English corpus, "
    "expected counts from pooled rates, top-10 contrastive "
    "keywords — corpus linguistics' keyword extractor, the "
    "contrastive complement to tf-idf (q73) and corpus KL (q106).",
)
def q631(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    en = d.select("source", F.lower("text").alias("txt")).localCheckpoint(eager=False)
    top_src = (
        en.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "source")
        .limit(1)
        .select(F.col("source").alias("tsrc"))
    )
    toks = (
        en.crossJoin(F.broadcast(top_src))
        .select(
            F.when(F.col("source") == F.col("tsrc"), 1).otherwise(0).alias("ina"),
            F.explode_outer(
                F.expr("regexp_extract_all(txt, '[a-z]{3,}', 0)")
            ).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
    )
    cnt = toks.groupBy("tok").agg(
        F.sum("ina").alias("a"), F.sum(1 - F.col("ina")).alias("b")
    )
    tot = cnt.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    t = F.col("a") + F.col("b")
    g2 = 2 * (
        F.when(
            F.col("a") > 0,
            F.col("a")
            * F.log(F.col("a") / (t * F.col("na") / (F.col("na") + F.col("nb")))),
        ).otherwise(0.0)
        + F.when(
            F.col("b") > 0,
            F.col("b")
            * F.log(F.col("b") / (t * F.col("nb") / (F.col("na") + F.col("nb")))),
        ).otherwise(0.0)
    )
    g = (
        cnt.filter(t >= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("a").cast("bigint").alias("cnt_top_source"),
            F.col("b").cast("bigint").alias("cnt_rest"),
            r6(g2).alias("g2_keyness"),
            (F.col("a") * 1.0 / F.col("na") > F.col("b") * 1.0 / F.col("nb")).alias(
                "overused_in_top_source"
            ),
        )
    )
    return g.orderBy(F.desc("g2_keyness"), "tok").limit(10)


# ---------------------------------------------------------------------------
# Q632 — synthetic control with a closed-form donor weight
# ---------------------------------------------------------------------------
# Nation-bloc 0 is "treated" at day 16: the two donor blocs most
# pre-period-correlated with it are blended with the least-squares
# convex weight w* = sum(u v)/sum(v v) clamped to [0,1] (exact on
# cents-scaled integers), and the post-period gap to the synthetic
# twin is the ATT — Abadie's estimator reduced to its 2-donor core.
_Q632_ORACLE = """
    WITH nd AS MATERIALIZED (
      SELECT c.c_nationkey % 5 AS bloc, EXTRACT(day FROM e.ts) AS d,
             ROUND(SUM(ROUND(e.value * 100)) / 1000.0) AS rev
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY c.c_nationkey % 5, EXTRACT(day FROM e.ts)
    ), tr AS MATERIALIZED (
      SELECT d, rev AS t FROM nd WHERE bloc = 0
    ), don AS MATERIALIZED (
      SELECT bloc, d, rev AS s FROM nd WHERE bloc > 0
    ), ranked AS (
      SELECT dn.bloc,
             ROW_NUMBER() OVER (
               ORDER BY ROUND(corr(dn.s, tr.t), 9) DESC, dn.bloc) AS rk
      FROM don dn JOIN tr ON tr.d = dn.d
      WHERE dn.d <= 15
      GROUP BY dn.bloc
    ), wide AS MATERIALIZED (
      SELECT tr.d, tr.t, s1.s AS s1, s2.s AS s2
      FROM tr
      JOIN don s1 ON s1.d = tr.d
        AND s1.bloc = (SELECT bloc FROM ranked WHERE rk = 1)
      JOIN don s2 ON s2.d = tr.d
        AND s2.bloc = (SELECT bloc FROM ranked WHERE rk = 2)
    ), fit AS (
      SELECT LEAST(1.0, GREATEST(0.0,
               SUM((t - s2) * (s1 - s2)) * 1.0
                 / SUM((s1 - s2) * (s1 - s2)))) AS w
      FROM wide WHERE d <= 15
    ), donors AS (
      SELECT MAX(CASE WHEN rk = 1 THEN bloc END) AS donor1,
             MAX(CASE WHEN rk = 2 THEN bloc END) AS donor2
      FROM ranked
    ), agg AS (
      SELECT f.w,
             SQRT(AVG(CASE WHEN w2.d <= 15 THEN
                 POW(w2.t - (f.w * w2.s1 + (1 - f.w) * w2.s2), 2)
               END)) AS pre_rmse,
             AVG(CASE WHEN w2.d > 15 THEN
                 w2.t - (f.w * w2.s1 + (1 - f.w) * w2.s2)
               END) AS post_att
      FROM wide w2, fit f
      GROUP BY f.w
    )
    SELECT d.donor1, d.donor2,
           ROUND(a.w + 5e-12, 6) AS best_weight,
           ROUND(a.pre_rmse + 5e-12, 6) AS pre_rmse,
           ROUND(a.post_att + 5e-12, 6) AS post_att
    FROM agg a, donors d
"""


@register(
    "q632_synthetic_control",
    _Q632_ORACLE,
    doc="Synthetic control, 2-donor core: pick the two nation blocs "
    "most pre-period-correlated with the treated bloc, blend them "
    "with the closed-form least-squares convex weight, report "
    "pre-fit RMSE and the post-period ATT gap — Abadie's estimator "
    "on top of the DiD/placebo stack (q235/q608).",
)
def q632(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nd = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(
            (F.col("c_nationkey") % 5).alias("bloc"),
            F.dayofmonth("ts").alias("d"),
        )
        .agg(
            F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("rev")
        )
        # lineage cut: treated/donor splits + two donor selections all
        # re-reference this (plan audit: 30 scans with persist-only
        # lineage)
        .localCheckpoint(eager=False)
    )
    tr = nd.filter(F.col("bloc") == 0).select("d", F.col("rev").alias("t"))
    don = nd.filter(F.col("bloc") > 0).select(
        "bloc", "d", F.col("rev").alias("s")
    )
    ranked = (
        don.filter(F.col("d") <= 15)
        .join(tr, "d")
        .groupBy("bloc")
        .agg(F.round(F.corr("s", "t"), 9).alias("rho"))
        .select(
            "bloc",
            F.row_number().over(Window.orderBy(F.desc("rho"), "bloc")).alias("rk"),
        )
    )
    d1 = ranked.filter(F.col("rk") == 1).select(F.col("bloc").alias("b1"))
    d2 = ranked.filter(F.col("rk") == 2).select(F.col("bloc").alias("b2"))
    s1 = don.crossJoin(F.broadcast(d1)).filter(
        F.col("bloc") == F.col("b1")
    ).select("d", F.col("s").alias("s1"), "b1")
    s2 = don.crossJoin(F.broadcast(d2)).filter(
        F.col("bloc") == F.col("b2")
    ).select("d", F.col("s").alias("s2"), "b2")
    wide = tr.join(s1, "d").join(s2, "d").localCheckpoint(eager=False)
    fit = wide.filter(F.col("d") <= 15).agg(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.sum((F.col("t") - F.col("s2")) * (F.col("s1") - F.col("s2")))
                * 1.0
                / F.sum(
                    (F.col("s1") - F.col("s2")) * (F.col("s1") - F.col("s2"))
                ),
            ),
        ).alias("w")
    )
    synth = F.col("w") * F.col("s1") + (1 - F.col("w")) * F.col("s2")
    return (
        wide.crossJoin(F.broadcast(fit))
        .groupBy("w", "b1", "b2")
        .agg(
            r6(
                F.sqrt(
                    F.avg(
                        F.when(
                            F.col("d") <= 15, F.pow(F.col("t") - synth, 2)
                        )
                    )
                )
            ).alias("pre_rmse"),
            r6(
                F.avg(F.when(F.col("d") > 15, F.col("t") - synth))
            ).alias("post_att"),
        )
        .select(
            F.col("b1").alias("donor1"),
            F.col("b2").alias("donor2"),
            r6(F.col("w")).alias("best_weight"),
            "pre_rmse",
            "post_att",
        )
    )


# ---------------------------------------------------------------------------
# Q633 — reservoir sampling (Algorithm R) replayed deterministically
# ---------------------------------------------------------------------------
# Vitter's Algorithm R over the first 300 orders' prices with k=10:
# item i > k replaces slot j = 1 + hash(i) mod i when j <= k. The
# multiplicative-hash replay makes the uniform sample reproducible
# in both engines — the streaming-sampling primitive behind every
# bounded-memory profiler.
def _res_fold(el, xv: str, seq_body: str) -> str:
    i = f"({el(1)} + 1)"
    j = f"(1 + (({i} * 2654435761) % 4294967296) % {i})"
    repl = (
        f"{el(2)} + (CASE WHEN {i} > 10 AND {j} <= 10 THEN 1 ELSE 0 END)"
    )
    slot = (
        f"CASE WHEN {i} <= 10 AND CAST(s AS DOUBLE) = {i} THEN {xv} "
        f"WHEN {i} > 10 AND CAST(s AS DOUBLE) = {j} THEN {xv} "
        f"ELSE {el('s + 2')} END"
    )
    return (
        f"{seq_body.replace('BODY', slot)}"
        .replace("HEAD", f"[{i}, {repl}]")
    )


_Q633_ORACLE = f"""
    WITH stream AS MATERIALIZED (
      SELECT rn, CAST(ROUND(o_totalprice * 100) AS DOUBLE) AS xv
      FROM (SELECT o_totalprice,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 300
    ), folded AS (
      SELECT list_reduce(
               list_prepend(
                 [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                 list([xv] ORDER BY rn)),
               (acc, x) -> {_res_fold(
                   lambda k: f'acc[{k}]', 'x[1]',
                   'list_concat(HEAD, list_transform(range(1, 11), s -> BODY))')}
             ) AS f
      FROM stream
    )
    SELECT CAST(f[1] AS BIGINT) AS n_items,
           CAST(f[2] AS BIGINT) AS replacements,
           ROUND(list_sum(f[3:12]) / 100.0 + 5e-8, 2) AS reservoir_sum,
           ROUND(list_min(f[3:12]) / 100.0 + 5e-8, 2) AS reservoir_min,
           ROUND(list_max(f[3:12]) / 100.0 + 5e-8, 2) AS reservoir_max
    FROM folded
"""

_RES_SPARK_FOLD = (
    "aggregate(xs, array(CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), "
    "(acc, x) -> "
    + _res_fold(
        lambda k: f"element_at(acc, {k})",
        "x",
        "concat(HEAD, transform(sequence(1, 10), s -> BODY))",
    ).replace("[", "array(", 1).replace("]", ")", 1)
    + ")"
)


@register(
    "q633_reservoir_sampling",
    _Q633_ORACLE,
    doc="Vitter's Algorithm R replayed as a fold: k=10 reservoir over "
    "the first 300 orders' prices, slot j = 1 + hash(i) mod i, "
    "hash-deterministic so both engines draw the identical sample — "
    "the bounded-memory uniform-sampling primitive (the streaming "
    "cousin of q65's hash sample).",
)
def q633(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    stream = o.select(
        F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        F.round(F.col("o_totalprice") * 100).cast("double").alias("xv"),
    ).filter(F.col("rn") <= 300)
    folded = stream.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "xv"))),
            lambda s: s.xv,
        ).alias("xs")
    ).select(F.expr(_RES_SPARK_FOLD).alias("f"))
    res = F.slice("f", 3, 10)
    return folded.select(
        F.element_at("f", 1).cast("bigint").alias("n_items"),
        F.element_at("f", 2).cast("bigint").alias("replacements"),
        F.round(
            F.aggregate(res, F.lit(0.0), lambda a, v: a + v) / 100.0
            + F.lit(5e-8),
            2,
        ).alias("reservoir_sum"),
        F.round(F.array_min(res) / 100.0 + F.lit(5e-8), 2).alias(
            "reservoir_min"
        ),
        F.round(F.array_max(res) / 100.0 + F.lit(5e-8), 2).alias(
            "reservoir_max"
        ),
    )
