"""Conformance queries batch #95 (q669+) — concentration bounds vs
exact tails, maximum subarray, AIMD congestion control, M/G/1
waiting times, and skip-list level statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q669 — Hoeffding and Chernoff bounds vs the exact binomial tail
# ---------------------------------------------------------------------------
# The first 200 orders' URGENT share vs the population share: the
# exact upper binomial tail (relational log-factorials), the
# Chernoff-KL bound exp(-n KL(phat||p)) and the Hoeffding bound
# exp(-2n t^2) — how loose each guarantee is against truth, the
# math that prices sampled-aggregate error contracts (q399).
_Q669_ORACLE = """
    WITH pop AS (
      SELECT AVG(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1.0 ELSE 0 END) AS p
      FROM orders
    ), samp AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS k
      FROM (SELECT o_orderpriority,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 200
    ), lf AS MATERIALIZED (
      SELECT j, SUM(LN(CASE WHEN j2 = 0 THEN 1 ELSE j2 END))
                  OVER (ORDER BY j2) AS lfac
      FROM (SELECT UNNEST(range(0, 201)) AS j,
                   UNNEST(range(0, 201)) AS j2)
    ), tail AS (
      SELECT SUM(EXP(ln_c.lfn - l1.lfac - l2.lfac
                     + ln_c.j * LN(ln_c.p)
                     + (ln_c.n - ln_c.j) * LN(1 - ln_c.p))) AS exact_tail
      FROM (
        SELECT g.j, s.n, s.k, p.p,
               (SELECT lfac FROM lf WHERE lf.j = s.n) AS lfn
        FROM samp s, pop p,
             (SELECT UNNEST(range(0, 201)) AS j) g
        WHERE g.j >= s.k AND g.j <= s.n
      ) ln_c
      JOIN lf l1 ON l1.j = ln_c.j
      JOIN lf l2 ON l2.j = ln_c.n - ln_c.j
    )
    SELECT CAST(s.n AS BIGINT) AS n_sample,
           ROUND(s.k * 1.0 / s.n + 5e-12, 6) AS p_hat,
           ROUND(p.p + 5e-12, 6) AS p_true,
           ROUND(t.exact_tail + 5e-12, 6) AS exact_tail,
           ROUND(CASE WHEN s.k * 1.0 / s.n > p.p THEN
                   EXP(-s.n * ((s.k * 1.0 / s.n)
                               * LN((s.k * 1.0 / s.n) / p.p)
                               + (1 - s.k * 1.0 / s.n)
                               * LN((1 - s.k * 1.0 / s.n) / (1 - p.p))))
                 ELSE 1.0 END + 5e-12, 6) AS chernoff_bound,
           ROUND(EXP(-2 * s.n * POW(s.k * 1.0 / s.n - p.p, 2))
                 + 5e-12, 6) AS hoeffding_bound,
           t.exact_tail <= EXP(-2 * s.n * POW(s.k * 1.0 / s.n - p.p, 2))
               + 1e-9
             AS exact_within_hoeffding
    FROM samp s, pop p, tail t
"""


@register(
    "q669_hoeffding_vs_exact",
    _Q669_ORACLE,
    doc="Concentration-bound audit: exact upper binomial tail of the "
    "200-order URGENT share (relational log-factorials) vs the "
    "Chernoff-KL and Hoeffding bounds — the looseness ladder that "
    "prices sampled-aggregate error contracts (q399) and SPRT "
    "thresholds (q234).",
)
def q669(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pop = o.agg(
        F.avg(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1.0).otherwise(0.0)
        ).alias("p")
    )
    samp = (
        o.select(
            "o_orderpriority",
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        )
        .filter(F.col("rn") <= 200)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("k"),
        )
    )
    lf = spark.range(0, 201).select(
        F.col("id").alias("j"),
        F.sum(
            F.log(F.when(F.col("id") == 0, 1).otherwise(F.col("id")))
        )
        .over(Window.orderBy("id"))
        .alias("lfac"),
    ).localCheckpoint(eager=False)
    sp = samp.crossJoin(F.broadcast(pop))
    lfn = lf.select(F.col("j").alias("jn"), F.col("lfac").alias("lfn"))
    grid = (
        sp.crossJoin(F.broadcast(lf.select(F.col("j"), F.col("lfac").alias("l1"))))
        .filter((F.col("j") >= F.col("k")) & (F.col("j") <= F.col("n")))
        .join(F.broadcast(lfn), F.col("jn") == F.col("n"))
        .join(
            F.broadcast(
                lf.select(F.col("j").alias("j2"), F.col("lfac").alias("l2"))
            ),
            F.col("j2") == F.col("n") - F.col("j"),
        )
    )
    tail = grid.agg(
        F.sum(
            F.exp(
                F.col("lfn")
                - F.col("l1")
                - F.col("l2")
                + F.col("j") * F.log("p")
                + (F.col("n") - F.col("j")) * F.log(1 - F.col("p"))
            )
        ).alias("exact_tail"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.max("p").alias("p"),
    )
    ph = F.col("k") * 1.0 / F.col("n")
    kl = ph * F.log(ph / F.col("p")) + (1 - ph) * F.log(
        (1 - ph) / (1 - F.col("p"))
    )
    hoef = F.exp(-2 * F.col("n") * F.pow(ph - F.col("p"), 2))
    return tail.select(
        F.col("n").cast("bigint").alias("n_sample"),
        r6(ph).alias("p_hat"),
        r6(F.col("p")).alias("p_true"),
        r6(F.col("exact_tail")).alias("exact_tail"),
        r6(F.when(ph > F.col("p"), F.exp(-F.col("n") * kl)).otherwise(1.0)).alias(
            "chernoff_bound"
        ),
        r6(hoef).alias("hoeffding_bound"),
        (F.col("exact_tail") <= hoef + 1e-9).alias("exact_within_hoeffding"),
    )


# ---------------------------------------------------------------------------
# Q670 — maximum subarray (Kadane) over demeaned daily revenue
# ---------------------------------------------------------------------------
# The best consecutive run of days — the span with the largest total
# revenue above trend — found by Kadane's fold with start/end
# tracking: state [best, cur, bs, be, cs, idx], strict improvement
# so the first maximal window wins identically in both engines.
def _kadane_fold(el, dv: str) -> str:
    idx = f"({el(6)} + 1)"
    cur2 = f"(CASE WHEN {el(2)} > 0 THEN {el(2)} + {dv} ELSE {dv} END)"
    cs2 = f"(CASE WHEN {el(2)} > 0 THEN {el(5)} ELSE {idx} END)"
    return ", ".join(
        [
            f"CASE WHEN {cur2} > {el(1)} THEN {cur2} ELSE {el(1)} END",
            cur2,
            f"CASE WHEN {cur2} > {el(1)} THEN {cs2} ELSE {el(3)} END",
            f"CASE WHEN {cur2} > {el(1)} THEN {idx} ELSE {el(4)} END",
            cs2,
            idx,
        ]
    )


_Q670_ORACLE = f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             ROUND(SUM(ROUND(value * 100)) / 1000.0) AS x
      FROM events GROUP BY EXTRACT(day FROM ts)
    ), mu AS (
      SELECT AVG(x) AS m FROM daily
    ), folded AS (
      SELECT list_reduce(
               list_prepend([CAST(-1e18 AS DOUBLE), 0, 0, 0, 0, 0],
                            list([d.x - mu.m] ORDER BY d.d)),
               (acc, x) -> [{_kadane_fold(lambda k: f'acc[{k}]', 'x[1]')}]
             ) AS f
      FROM daily d, mu
      GROUP BY mu.m
    )
    SELECT ROUND(f[1] + 5e-10, 4) AS best_run_excess,
           CAST(f[3] AS BIGINT) AS start_day,
           CAST(f[4] AS BIGINT) AS end_day,
           CAST(f[4] - f[3] + 1 AS BIGINT) AS run_length
    FROM folded
"""

_KADANE_SPARK = (
    "aggregate(xs, array(CAST(-1e18 AS DOUBLE), 0, 0, 0, 0, 0), "
    "(acc, x) -> array("
    + _kadane_fold(lambda k: f"element_at(acc, {k})", "element_at(x, 1)")
    + "))"
)


@register(
    "q670_max_subarray",
    _Q670_ORACLE,
    doc="Kadane's maximum-subarray fold over demeaned daily revenue "
    "with start/end tracking (strict improvement, first maximal "
    "window) — the best above-trend run of days, the algorithmic "
    "core under drawdown (q219) and streak (q116) analytics.",
)
def q670(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.round(F.sum(F.round(F.col("value") * 100)) / 1000.0).alias("x")
    ).localCheckpoint(eager=False)
    mu = daily.agg(F.avg("x").alias("m"))
    folded = (
        daily.crossJoin(F.broadcast(mu))
        .groupBy("m")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("d", (F.col("x") - F.col("m")).alias("dx"))
                    )
                ),
                lambda s: F.array(s["dx"]),
            ).alias("xs")
        )
        .select(F.expr(_KADANE_SPARK).alias("f"))
    )
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    return folded.select(
        F.round(fe(1) + F.lit(5e-10), 4).alias("best_run_excess"),
        fe(3).cast("bigint").alias("start_day"),
        fe(4).cast("bigint").alias("end_day"),
        (fe(4) - fe(3) + 1).cast("bigint").alias("run_length"),
    )


# ---------------------------------------------------------------------------
# Q671 — AIMD congestion-window replay
# ---------------------------------------------------------------------------
# TCP's additive-increase/multiplicative-decrease over 200 RTTs:
# +1 per round, halve (floor, min 1) on hash-deterministic losses
# (~2.7% rate), ceiling from the data — the sawtooth whose average
# window is the classic 1/sqrt(p) law, replayed bit-identically.
def _aimd_fold(el, cap: str) -> str:
    i = f"({el(4)} + 1)"
    loss = (
        f"((({i} * 2654435761) % 4294967296) % 37 = 0)"
    )
    w2 = (
        f"(CASE WHEN {loss} THEN "
        f"GREATEST(FLOOR({el(1)} / 2), 1) "
        f"ELSE LEAST({el(1)} + 1, {cap}) END)"
    )
    return ", ".join(
        [
            w2,
            f"{el(2)} + {w2}",
            f"{el(3)} + (CASE WHEN {loss} THEN 1 ELSE 0 END)",
            i,
        ]
    )


_Q671_ORACLE = f"""
    WITH cap AS (
      SELECT CAST(9 + COUNT(*) % 24 AS DOUBLE) AS c FROM orders
    ), folded AS (
      SELECT c,
             list_reduce(
               list_prepend([CAST(1 AS DOUBLE), 0, 0, 0],
                            list_transform(range(1, 201),
                                           i -> [CAST(i AS DOUBLE)])),
               (acc, x) -> [{_aimd_fold(lambda k: f'acc[{k}]', 'c')}]
             ) AS f
      FROM cap
    )
    SELECT ROUND(c + 5e-12, 6) AS window_cap,
           CAST(f[1] AS BIGINT) AS final_cwnd,
           ROUND(f[2] / 200 + 5e-12, 6) AS avg_cwnd,
           CAST(f[3] AS BIGINT) AS n_losses,
           ROUND(f[2] / 200 / c + 5e-12, 6) AS utilization
    FROM folded
"""

_AIMD_SPARK = (
    "aggregate(sequence(1, 200), array(CAST(1 AS DOUBLE), 0, 0, 0), "
    "(acc, x) -> array("
    + _aimd_fold(lambda k: f"element_at(acc, {k})", "c")
    + "))"
)


@register(
    "q671_aimd_replay",
    _Q671_ORACLE,
    doc="AIMD congestion control replayed as a fold: +1 per RTT, "
    "halve on hash-deterministic losses, data-derived window "
    "ceiling, 200 rounds — TCP's sawtooth and its average-window "
    "law, beside token bucket (q267) and retry backoff (q528).",
)
def q671(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cap = o.agg((9 + F.count(F.lit(1)) % 24).cast("double").alias("c"))
    folded = cap.select("c", F.expr(_AIMD_SPARK).alias("f"))
    fe = lambda k: F.element_at("f", k)  # noqa: E731
    return folded.select(
        r6(F.col("c")).alias("window_cap"),
        fe(1).cast("bigint").alias("final_cwnd"),
        r6(fe(2) / 200).alias("avg_cwnd"),
        fe(3).cast("bigint").alias("n_losses"),
        r6(fe(2) / 200 / F.col("c")).alias("utilization"),
    )


# ---------------------------------------------------------------------------
# Q672 — Pollaczek-Khinchine: M/G/1 waiting from empirical moments
# ---------------------------------------------------------------------------
# Lineitem quantities as empirical service times at fixed rho = 0.9:
# the P-K mean wait W = rho E[S] (1 + CV^2) / (2 (1 - rho)) — the
# data contributes the squared coefficient of variation, the
# variability penalty an M/M/1 model (q538/q457) misses.
_Q672_ORACLE = """
    WITH s AS (
      SELECT COUNT(*) AS n,
             AVG(l_quantity) AS es,
             AVG(l_quantity * l_quantity) AS es2
      FROM lineitem
    )
    SELECT CAST(n AS BIGINT) AS n_services,
           ROUND(es + 5e-12, 6) AS mean_service,
           ROUND((es2 - es * es) / (es * es) + 5e-12, 6) AS scv,
           ROUND(0.9 * es * (1 + (es2 - es * es) / (es * es))
                 / (2 * (1 - 0.9)) + 5e-12, 6) AS pk_mean_wait,
           ROUND((1 + (es2 - es * es) / (es * es)) / 2 + 5e-12, 6)
             AS wait_vs_mm1_ratio,
           (es2 - es * es) / (es * es) > 1 AS more_variable_than_exponential
    FROM s
"""


@register(
    "q672_pollaczek_khinchine",
    _Q672_ORACLE,
    doc="Pollaczek-Khinchine M/G/1 mean wait at rho = 0.9 with the "
    "empirical service distribution (lineitem quantities): the "
    "(1 + CV^2)/2 variability penalty over M/M/1 — why heavy-tailed "
    "service wrecks queues, beyond Lindley (q538) and Erlang "
    "(q457/q656).",
)
def q672(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_quantity").alias("es"),
        F.avg(F.col("l_quantity") * F.col("l_quantity")).alias("es2"),
    )
    scv = (F.col("es2") - F.col("es") * F.col("es")) / (
        F.col("es") * F.col("es")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_services"),
        r6(F.col("es")).alias("mean_service"),
        r6(scv).alias("scv"),
        r6(0.9 * F.col("es") * (1 + scv) / (2 * (1 - 0.9))).alias(
            "pk_mean_wait"
        ),
        r6((1 + scv) / 2).alias("wait_vs_mm1_ratio"),
        (scv > 1).alias("more_variable_than_exponential"),
    )


# ---------------------------------------------------------------------------
# Q673 — skip-list level audit with deterministic coin flips
# ---------------------------------------------------------------------------
# The first 512 orders inserted into a skip list whose promotion
# coins are hash trailing-zero bits (p = 1/2, cap 8): nodes per
# level vs the n/2^(l-1) expectation, total pointer overhead vs the
# 2n asymptote — the probabilistic index whose balance needs no
# rebalancing, beside linear probing (q570) and B-tree sizing
# (q443).
_Q673_ORACLE = """
    WITH keys AS MATERIALIZED (
      SELECT o_orderkey AS k,
             (o_orderkey * 2654435761) % 4294967296 AS h
      FROM (SELECT o_orderkey,
                   ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 512
    ), lev AS MATERIALIZED (
      SELECT k,
             CASE WHEN h % 128 = 0 THEN 8
                  WHEN h % 64 = 0 THEN 7
                  WHEN h % 32 = 0 THEN 6
                  WHEN h % 16 = 0 THEN 5
                  WHEN h % 8 = 0 THEN 4
                  WHEN h % 4 = 0 THEN 3
                  WHEN h % 2 = 0 THEN 2
                  ELSE 1 END AS lvl
      FROM keys
    ), tot AS (
      SELECT COUNT(*) AS n, SUM(lvl) AS ptrs, MAX(lvl) AS maxl FROM lev
    ), per AS (
      SELECT g.l,
             SUM(CASE WHEN lev.lvl >= g.l THEN 1 ELSE 0 END) AS nodes
      FROM lev CROSS JOIN (SELECT UNNEST(range(1, 9)) AS l) g
      GROUP BY g.l
    )
    SELECT CAST(p.l AS BIGINT) AS level,
           CAST(p.nodes AS BIGINT) AS nodes_at_level,
           ROUND(t.n / POW(2, p.l - 1) + 5e-12, 6) AS expected_nodes,
           ROUND(p.nodes / (t.n / POW(2, p.l - 1)) + 5e-12, 6)
             AS observed_over_expected,
           ROUND(t.ptrs * 1.0 / t.n + 5e-12, 6) AS pointers_per_key,
           CAST(t.maxl AS BIGINT) AS max_level
    FROM per p, tot t
    WHERE p.nodes > 0
    ORDER BY p.l
"""


@register(
    "q673_skiplist_levels",
    _Q673_ORACLE,
    doc="Skip-list level audit: 512 keys promoted by hash "
    "trailing-zero coins (p = 1/2, cap 8), per-level node counts vs "
    "the n/2^(l-1) expectation and pointer overhead vs the 2n "
    "asymptote — the probabilistically balanced index beside linear "
    "probing (q570) and index sizing (q443).",
)
def q673(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    keys = (
        o.select(
            "o_orderkey",
            F.row_number().over(Window.orderBy("o_orderkey")).alias("rn"),
        )
        .filter(F.col("rn") <= 512)
        .select(
            F.col("o_orderkey").alias("k"),
            ((F.col("o_orderkey") * 2654435761) % 4294967296).alias("h"),
        )
    )
    h = F.col("h")
    lev = keys.select(
        "k",
        F.when(h % 128 == 0, 8)
        .when(h % 64 == 0, 7)
        .when(h % 32 == 0, 6)
        .when(h % 16 == 0, 5)
        .when(h % 8 == 0, 4)
        .when(h % 4 == 0, 3)
        .when(h % 2 == 0, 2)
        .otherwise(1)
        .alias("lvl"),
    ).localCheckpoint(eager=False)
    tot = lev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lvl").alias("ptrs"),
        F.max("lvl").alias("maxl"),
    )
    grid = spark.range(1, 9).select(F.col("id").alias("l"))
    per = (
        lev.crossJoin(F.broadcast(grid))
        .groupBy("l")
        .agg(
            F.sum(
                F.when(F.col("lvl") >= F.col("l"), 1).otherwise(0)
            ).alias("nodes")
        )
    )
    exp_n = F.col("n") / F.pow(F.lit(2.0), F.col("l") - 1)
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(F.col("nodes") > 0)
        .select(
            F.col("l").cast("bigint").alias("level"),
            F.col("nodes").cast("bigint").alias("nodes_at_level"),
            r6(exp_n).alias("expected_nodes"),
            r6(F.col("nodes") / exp_n).alias("observed_over_expected"),
            r6(F.col("ptrs") * 1.0 / F.col("n")).alias("pointers_per_key"),
            F.col("maxl").cast("bigint").alias("max_level"),
        )
        .orderBy("level")
    )
