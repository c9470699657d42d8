"""Conformance queries batch #68 (q534+) — Rasch PROX calibration,
greedy-draft fair division, process conformance, exact linear SHAP,
and the Lindley queue recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q534 — Rasch (1PL) item difficulties by the PROX algorithm
# ---------------------------------------------------------------------------
# Persons = buying customers, items = top-8 brands, response = ever
# bought: PROX estimates item difficulty as the centered log-odds
# expanded by sqrt(1 + var(person logits)/2.9) — the closed-form
# normal-approximation calibration psychometricians run before MLE,
# here as two aggregates (person and item margins) — the
# test-calibration lens beside Bradley-Terry (q315).
_Q534_ORACLE = """
    WITH items AS MATERIALIZED (
      SELECT p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, brand LIMIT 8
    ), resp AS MATERIALIZED (
      SELECT o.o_custkey AS person, i.brand,
             MAX(CASE WHEN p.p_brand = i.brand THEN 1 ELSE 0 END) AS x
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      CROSS JOIN items i
      GROUP BY o.o_custkey, i.brand
    ), person AS (
      SELECT person, SUM(x) AS r FROM resp GROUP BY person
      HAVING SUM(x) > 0 AND SUM(x) < 8
    ), plogit AS (
      SELECT AVG(LN(r / (8.0 - r))) AS mu_b,
             var_pop(LN(r / (8.0 - r))) AS var_b
      FROM person
    ), item AS (
      SELECT r.brand, SUM(r.x) AS s, COUNT(*) AS n
      FROM resp r JOIN person pe ON pe.person = r.person
      GROUP BY r.brand
    ), raw AS (
      SELECT brand, s, n, LN((n - s) * 1.0 / s) AS d_raw FROM item
    ), ctr AS (
      SELECT AVG(d_raw) AS d_bar FROM raw
    )
    SELECT raw.brand,
           ROUND(raw.s * 1.0 / raw.n + 5e-12, 6) AS p_bought,
           ROUND((raw.d_raw - ctr.d_bar)
                 * SQRT(1 + plogit.var_b / 2.9) + plogit.mu_b * 0
                 + 5e-12, 6) AS prox_difficulty,
           ROUND(plogit.var_b + 5e-12, 6) AS person_logit_var
    FROM raw, ctr, plogit
    ORDER BY prox_difficulty DESC, raw.brand
"""


@register(
    "q534_rasch_prox",
    _Q534_ORACLE,
    doc="Rasch 1PL item difficulties by PROX: centered item log-odds "
    "expanded by sqrt(1 + person-logit variance / 2.9) over the "
    "customer x brand response matrix (extreme scorers excluded) — "
    "the closed-form psychometric calibration beside Bradley-Terry "
    "(q315) and Fleiss kappa (q290).",
)
def q534(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lp = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        o, li.l_orderkey == o.o_orderkey
    ).localCheckpoint(eager=False)
    items = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(8)
        .select(F.col("p_brand").alias("brand"))
    )
    # sparse ownership + dense persons x items grid — the
    # crossJoin(items) form shuffled |lp| x 8 rows just to materialize
    # the x=0 cells (same rewrite as q623, measured 3.2 -> 2.2 s there)
    owned = (
        lp.join(F.broadcast(items), lp.p_brand == F.col("brand"))
        .groupBy(F.col("o_custkey").alias("person"), "brand")
        .agg(F.lit(1).alias("x1"))
    )
    persons_all = lp.select(F.col("o_custkey").alias("person")).distinct()
    resp = (
        persons_all.crossJoin(F.broadcast(items))
        .join(owned, ["person", "brand"], "left")
        .select("person", "brand", F.coalesce("x1", F.lit(0)).alias("x"))
        .localCheckpoint(eager=False)
    )
    person = resp.groupBy("person").agg(F.sum("x").alias("r")).filter(
        (F.col("r") > 0) & (F.col("r") < 8)
    )
    plogit = person.agg(
        F.avg(F.log(F.col("r") / (8.0 - F.col("r")))).alias("mu_b"),
        F.var_pop(F.log(F.col("r") / (8.0 - F.col("r")))).alias("var_b"),
    )
    item = (
        resp.join(person.select("person"), "person")
        .groupBy("brand")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    raw = item.select(
        "brand",
        "s",
        "n",
        F.log((F.col("n") - F.col("s")) * 1.0 / F.col("s")).alias("d_raw"),
    )
    ctr = raw.agg(F.avg("d_raw").alias("d_bar"))
    return (
        raw.crossJoin(F.broadcast(ctr))
        .crossJoin(F.broadcast(plogit))
        .select(
            "brand",
            r6(F.col("s") * 1.0 / F.col("n")).alias("p_bought"),
            r6(
                (F.col("d_raw") - F.col("d_bar"))
                * F.sqrt(1 + F.col("var_b") / 2.9)
                + F.col("mu_b") * 0
            ).alias("prox_difficulty"),
            r6(F.col("var_b")).alias("person_logit_var"),
        )
        .orderBy(F.desc("prox_difficulty"), "brand")
    )


# ---------------------------------------------------------------------------
# Q535 — greedy-draft fair division with the max-item certificate
# ---------------------------------------------------------------------------
# Two partners alternately draft nations by revenue (A picks ranks
# 1,3,5..., B picks 2,4,6...): shares, the first-pick advantage, and
# the classic guarantee |share_A - share_B| <= largest item verified
# as a certificate — fair division next to the auctions (q416/q496)
# and social choice (q448/q520).
_Q535_ORACLE = """
    WITH nat AS (
      SELECT c.c_nationkey AS nation,
             CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ), ranked AS (
      SELECT nation, rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, nation) AS rk
      FROM nat
    ), split AS (
      SELECT SUM(CASE WHEN rk % 2 = 1 THEN rev ELSE 0 END) AS a_share,
             SUM(CASE WHEN rk % 2 = 0 THEN rev ELSE 0 END) AS b_share,
             MAX(rev) AS max_item, COUNT(*) AS n_items
      FROM ranked
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           ROUND(a_share / 100.0 + 5e-8, 2) AS a_share_usd,
           ROUND(b_share / 100.0 + 5e-8, 2) AS b_share_usd,
           ROUND((a_share - b_share) / 100.0 + 5e-8, 2) AS first_pick_edge_usd,
           ROUND(max_item / 100.0 + 5e-8, 2) AS max_item_usd,
           a_share - b_share <= max_item AND a_share >= b_share
             AS guarantee_holds
    FROM split
"""


@register(
    "q535_greedy_draft",
    _Q535_ORACLE,
    doc="Alternating greedy draft of nations by revenue between two "
    "partners: shares, the first-pick edge, and the fair-division "
    "guarantee 0 <= A - B <= largest item verified as a certificate "
    "— division mechanics beside auctions (q416/q496) and voting "
    "(q448/q520).",
)
def q535(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("rev"))
    )
    ranked = nat.select(
        "rev",
        F.row_number().over(Window.orderBy(F.desc("rev"), "nation")).alias("rk"),
    )
    split = ranked.agg(
        F.sum(F.when(F.col("rk") % 2 == 1, F.col("rev")).otherwise(0)).alias(
            "a_share"
        ),
        F.sum(F.when(F.col("rk") % 2 == 0, F.col("rev")).otherwise(0)).alias(
            "b_share"
        ),
        F.max("rev").alias("max_item"),
        F.count(F.lit(1)).alias("n_items"),
    )
    r2 = lambda cexpr: F.round(cexpr + F.lit(5e-8), 2)  # noqa: E731
    return split.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        r2(F.col("a_share") / 100.0).alias("a_share_usd"),
        r2(F.col("b_share") / 100.0).alias("b_share_usd"),
        r2((F.col("a_share") - F.col("b_share")) / 100.0).alias(
            "first_pick_edge_usd"
        ),
        r2(F.col("max_item") / 100.0).alias("max_item_usd"),
        (
            (F.col("a_share") - F.col("b_share") <= F.col("max_item"))
            & (F.col("a_share") >= F.col("b_share"))
        ).alias("guarantee_holds"),
    )


# ---------------------------------------------------------------------------
# Q536 — process-mining conformance (directly-follows fitness)
# ---------------------------------------------------------------------------
# Per-user directly-follows pairs against the normative journey
# model {signup->view, view->{view,click}, click->{purchase,view},
# purchase->view}: conformance fitness = allowed share, plus the six
# heaviest transitions flagged — process mining's conformance check
# on top of the raw transition matrix (q100) and funnels (q118).
_Q536_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), pairs AS (
      SELECT event_type AS a, nxt AS b, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY event_type, nxt
    ), model AS (
      SELECT * FROM (VALUES
        ('signup', 'view'), ('view', 'view'), ('view', 'click'),
        ('click', 'purchase'), ('click', 'view'), ('purchase', 'view'))
        m(a, b)
    ), marked AS (
      SELECT p.a, p.b, p.n,
             EXISTS (SELECT 1 FROM model m
                     WHERE m.a = p.a AND m.b = p.b) AS allowed
      FROM pairs p
    ), fit AS (
      SELECT SUM(CASE WHEN allowed THEN n ELSE 0 END) * 1.0 / SUM(n)
               AS fitness
      FROM marked
    )
    SELECT m.a AS from_event, m.b AS to_event,
           CAST(m.n AS BIGINT) AS n_transitions,
           m.allowed,
           ROUND((SELECT fitness FROM fit) + 5e-12, 6) AS model_fitness
    FROM marked m
    ORDER BY m.n DESC, m.a, m.b LIMIT 6
"""


@register(
    "q536_process_conformance",
    _Q536_ORACLE,
    doc="Process-mining conformance: user-journey directly-follows "
    "pairs scored against the normative model, fitness = allowed "
    "transition share, six heaviest transitions with their verdicts "
    "— conformance checking over the raw Markov transitions (q100) "
    "and ordered funnel (q118).",
)
def q536(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("a"), F.col("nxt").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    model = spark.createDataFrame(
        [
            ("signup", "view"), ("view", "view"), ("view", "click"),
            ("click", "purchase"), ("click", "view"), ("purchase", "view"),
        ],
        "a string, b string",
    ).select("a", "b", F.lit(1).alias("ok"))
    marked = pairs.join(F.broadcast(model), ["a", "b"], "left").select(
        "a", "b", "n", F.col("ok").isNotNull().alias("allowed")
    )
    fit = marked.agg(
        (
            F.sum(F.when(F.col("allowed"), F.col("n")).otherwise(0))
            * 1.0
            / F.sum("n")
        ).alias("fitness")
    )
    return (
        marked.crossJoin(F.broadcast(fit))
        .select(
            F.col("a").alias("from_event"),
            F.col("b").alias("to_event"),
            F.col("n").cast("bigint").alias("n_transitions"),
            "allowed",
            r6(F.col("fitness")).alias("model_fitness"),
        )
        .orderBy(F.desc("n_transitions"), "from_event", "to_event")
        .limit(6)
    )


# ---------------------------------------------------------------------------
# Q537 — exact SHAP for the linear model
# ---------------------------------------------------------------------------
# For the q499 two-regressor OLS, the Shapley attribution of feature
# j for customer i is EXACTLY beta_j (x_ij - mean_j); five sampled
# customers get their per-feature attributions plus the additivity
# identity prediction - mean_prediction = sum of attributions,
# verified to 1e-6 — model explanation with a certificate (game
# Shapley q310's ML twin).
_Q537_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_custkey AS id,
             LN(1 + COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0)) AS y,
             LN(c.c_acctbal + 10000.0) AS x1,
             LN(1.0 + COUNT(o.o_orderkey)) AS x2
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), m AS (
      SELECT COUNT(*) AS n, AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my,
             SUM(x1 * x1) - COUNT(*) * AVG(x1) * AVG(x1) AS c11,
             SUM(x1 * x2) - COUNT(*) * AVG(x1) * AVG(x2) AS c12,
             SUM(x2 * x2) - COUNT(*) * AVG(x2) * AVG(x2) AS c22,
             SUM(x1 * y) - COUNT(*) * AVG(x1) * AVG(y) AS c1y,
             SUM(x2 * y) - COUNT(*) * AVG(x2) * AVG(y) AS c2y
      FROM u
    ), beta AS (
      SELECT m1, m2, my,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      FROM m
    )
    SELECT CAST(u.id AS BIGINT) AS custkey,
           ROUND(b.my + b.b1 * (u.x1 - b.m1) + b.b2 * (u.x2 - b.m2)
                 + 5e-12, 6) AS prediction,
           ROUND(b.b1 * (u.x1 - b.m1) + 5e-12, 6) AS shap_balance,
           ROUND(b.b2 * (u.x2 - b.m2) + 5e-12, 6) AS shap_orders,
           ABS((b.b1 * (u.x1 - b.m1) + b.b2 * (u.x2 - b.m2))
               - ((b.my + b.b1 * (u.x1 - b.m1) + b.b2 * (u.x2 - b.m2))
                  - b.my)) < 1e-9 AS additivity_ok
    FROM u, beta b
    WHERE u.id % 300 = 1
    ORDER BY custkey
"""


@register(
    "q537_linear_shap",
    _Q537_ORACLE,
    doc="Exact SHAP attributions for the two-regressor OLS: "
    "beta_j (x_ij - mean_j) per feature for five sampled customers "
    "with the additivity identity verified — closed-form model "
    "explanation (game-theoretic Shapley q310's ML counterpart, on "
    "q499's regression).",
)
def q537(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.log(
                1
                + F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)
                )
            ).alias("y"),
            F.log(1.0 + F.count("o_orderkey")).alias("x2"),
        )
        .select(
            F.col("c_custkey").alias("id"),
            "y",
            F.log(F.col("c_acctbal") + 10000.0).alias("x1"),
            "x2",
        )
        .localCheckpoint(eager=False)
    )
    n = F.count(F.lit(1))
    m = u.agg(
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
        (F.sum(F.col("x1") * F.col("x1")) - n * F.avg("x1") * F.avg("x1")).alias(
            "c11"
        ),
        (F.sum(F.col("x1") * F.col("x2")) - n * F.avg("x1") * F.avg("x2")).alias(
            "c12"
        ),
        (F.sum(F.col("x2") * F.col("x2")) - n * F.avg("x2") * F.avg("x2")).alias(
            "c22"
        ),
        (F.sum(F.col("x1") * F.col("y")) - n * F.avg("x1") * F.avg("y")).alias(
            "c1y"
        ),
        (F.sum(F.col("x2") * F.col("y")) - n * F.avg("x2") * F.avg("y")).alias(
            "c2y"
        ),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    beta = m.select(
        "m1",
        "m2",
        "my",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias(
            "b1"
        ),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias(
            "b2"
        ),
    )
    s1 = F.col("b1") * (F.col("x1") - F.col("m1"))
    s2 = F.col("b2") * (F.col("x2") - F.col("m2"))
    pred = F.col("my") + s1 + s2
    return (
        u.filter(F.col("id") % 300 == 1)
        .crossJoin(F.broadcast(beta))
        .select(
            F.col("id").cast("bigint").alias("custkey"),
            r6(pred).alias("prediction"),
            r6(s1).alias("shap_balance"),
            r6(s2).alias("shap_orders"),
            (F.abs((s1 + s2) - (pred - F.col("my"))) < 1e-9).alias(
                "additivity_ok"
            ),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Q538 — Lindley recursion: single-server waiting times replayed
# ---------------------------------------------------------------------------
# Purchases as arrivals, value-proportional service times (exact
# integer microseconds): the Lindley recursion W_{n+1} =
# max(0, W_n + S_n - A_{n+1}) replays the whole queue in one
# integer fold — mean/max wait, delay probability and utilization,
# the operational counterpart of the Erlang-C steady state (q457)
# and the Little's-law audit (q419).
_Q538_ORACLE = """
    WITH arr AS (
      SELECT epoch_us(ts) AS t,
             CAST(ROUND(value * 100) AS BIGINT) * 500 AS s_us,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ), gaps AS (
      SELECT rn, s_us,
             t - LAG(t) OVER (ORDER BY rn) AS a_us,
             LAG(s_us) OVER (ORDER BY rn) AS prev_s
      FROM arr
    ), ser AS (
      SELECT list([a_us, prev_s] ORDER BY rn) AS xs,
             SUM(prev_s) AS tot_s, SUM(a_us) AS tot_a, COUNT(*) AS n
      FROM gaps WHERE a_us IS NOT NULL
    ), sim AS (
      SELECT n, tot_s, tot_a,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT), 0, 0, 0], xs),
          (st, x) -> [
            GREATEST(CAST(0 AS BIGINT), st[1] + x[2] - x[1]),
            st[2] + GREATEST(CAST(0 AS BIGINT), st[1] + x[2] - x[1]),
            GREATEST(st[3], GREATEST(CAST(0 AS BIGINT),
                                     st[1] + x[2] - x[1])),
            st[4] + CASE WHEN st[1] + x[2] - x[1] > 0 THEN 1 ELSE 0 END
          ]
        ) AS st
      FROM ser
    )
    SELECT CAST(n AS BIGINT) AS n_jobs,
           ROUND(tot_s * 1.0 / tot_a + 5e-12, 6) AS utilization,
           ROUND(st[2] * 1.0 / n / 1e6 + 5e-10, 4) AS mean_wait_s,
           ROUND(st[3] / 1e6 + 5e-10, 4) AS max_wait_s,
           ROUND(st[4] * 1.0 / n + 5e-12, 6) AS frac_delayed
    FROM sim
"""


@register(
    "q538_lindley_queue",
    _Q538_ORACLE,
    doc="Lindley recursion W' = max(0, W + S - A) replaying the "
    "purchase queue with value-proportional service times in one "
    "integer fold — mean/max wait, delay fraction and utilization; "
    "the trajectory-level counterpart of Erlang-C (q457) and the "
    "Little's-law audit (q419).",
)
def q538(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.orderBy("rn")
    arr = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        (F.round(F.col("value") * 100).cast("bigint") * 500).alias("s_us"),
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("rn"),
    )
    gaps = arr.select(
        "rn",
        (F.col("t") - F.lag("t").over(w)).alias("a_us"),
        F.lag("s_us").over(w).alias("prev_s"),
    ).filter(F.col("a_us").isNotNull())
    ser = gaps.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rn", "a_us", "prev_s"))),
            lambda s: F.array(s.a_us, s.prev_s),
        ).alias("xs"),
        F.sum("prev_s").alias("tot_s"),
        F.sum("a_us").alias("tot_a"),
        F.count(F.lit(1)).alias("n"),
    )
    zero = F.lit(0).cast("bigint")

    def step(st, x):
        wnew = F.greatest(
            zero, F.element_at(st, 1) + F.element_at(x, 2) - F.element_at(x, 1)
        )
        return F.array(
            wnew,
            F.element_at(st, 2) + wnew,
            F.greatest(F.element_at(st, 3), wnew),
            F.element_at(st, 4)
            + F.when(
                F.element_at(st, 1) + F.element_at(x, 2) - F.element_at(x, 1) > 0,
                1,
            ).otherwise(0),
        )

    sim = ser.select(
        "n",
        "tot_s",
        "tot_a",
        F.aggregate(F.col("xs"), F.array(zero, zero, zero, zero), step).alias(
            "st"
        ),
    )
    return sim.select(
        F.col("n").cast("bigint").alias("n_jobs"),
        r6(F.col("tot_s") * 1.0 / F.col("tot_a")).alias("utilization"),
        F.round(
            F.element_at("st", 2) * 1.0 / F.col("n") / 1e6 + F.lit(5e-10), 4
        ).alias("mean_wait_s"),
        F.round(F.element_at("st", 3) / 1e6 + F.lit(5e-10), 4).alias(
            "max_wait_s"
        ),
        r6(F.element_at("st", 4) * 1.0 / F.col("n")).alias("frac_delayed"),
    )
