"""Conformance queries batch #50 (q444+) — max-plus Viterbi fold,
exact-integer bandit replay, missingness mechanics audit, LZ78
sequence complexity, and Borda/Condorcet rank aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q444 — Viterbi decoding in the max-plus semiring
# ---------------------------------------------------------------------------
# Two-state HMM over the daily purchase-count regime (obs = day's
# count above/below the integer mean), with INTEGER emission
# (+2 match / -3 mismatch) and transition (stay +1 / switch -2)
# scores: Viterbi is exact max-plus DP, and the chosen-predecessor
# bits pack into a BIGINT path mask carried through the fold — so
# score AND decoded path are integer-exact, no float tie risk.
_Q444_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d, COUNT(*) AS c
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), thr AS (
      SELECT CAST(SUM(c) // COUNT(*) AS BIGINT) AS t FROM daily
    ), obs AS (
      SELECT list(CASE WHEN c >= t THEN 1 ELSE 0 END ORDER BY d) AS o
      FROM daily, thr GROUP BY t
    ), dp AS (
      SELECT o,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT), 0, 0, 0], list_transform(o, x -> [x])),
          (a, ob) -> [
            (CASE WHEN ob[1] = 1 THEN 2 ELSE -3 END)
              + GREATEST(a[1] + 1, a[2] - 2),
            (CASE WHEN ob[1] = 0 THEN 2 ELSE -3 END)
              + GREATEST(a[2] + 1, a[1] - 2),
            (CASE WHEN a[1] + 1 >= a[2] - 2 THEN a[3] ELSE a[4] END) * 2 + 1,
            (CASE WHEN a[2] + 1 >= a[1] - 2 THEN a[4] ELSE a[3] END) * 2
          ]
        ) AS st
      FROM obs
    )
    SELECT CAST(len(o) AS BIGINT) AS n_days,
           CAST(GREATEST(st[1], st[2]) AS BIGINT) AS best_score,
           CAST(CASE WHEN st[1] >= st[2] THEN st[3] ELSE st[4] END AS BIGINT)
             AS path_bits,
           CAST(bit_count(CAST(
             CASE WHEN st[1] >= st[2] THEN st[3] ELSE st[4] END AS BIGINT)
           ) AS BIGINT) AS n_high_days
    FROM dp
"""


@register(
    "q444_viterbi_maxplus",
    _Q444_ORACLE,
    doc="Two-state Viterbi over the daily demand regime in the "
    "max-plus semiring: integer emission/transition scores folded "
    "left-to-right with the per-state best-path BITMASK carried in "
    "the accumulator — decoded path and score both integer-exact "
    "(the DP-as-fold family with DTW q439).",
)
def q444(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    obs = daily.agg(
        F.floor(F.sum("c") / F.count(F.lit(1))).alias("t"),
        F.sort_array(F.collect_list(F.struct("d", "c"))).alias("dc"),
    ).select(
        F.transform(
            "dc", lambda s: F.when(s.c >= F.col("t"), 1).otherwise(0).cast("bigint")
        ).alias("o")
    )
    zero = F.lit(0).cast("bigint")

    def step(a, ob):
        h = F.element_at(a, 1)
        low = F.element_at(a, 2)
        ph = F.element_at(a, 3)
        pl = F.element_at(a, 4)
        return F.array(
            F.when(ob == 1, 2).otherwise(-3).cast("bigint")
            + F.greatest(h + 1, low - 2),
            F.when(ob == 0, 2).otherwise(-3).cast("bigint")
            + F.greatest(low + 1, h - 2),
            F.when(h + 1 >= low - 2, ph).otherwise(pl) * 2 + 1,
            F.when(low + 1 >= h - 2, pl).otherwise(ph) * 2,
        )

    dp = obs.select(
        "o",
        F.aggregate(
            F.col("o"), F.array(zero, zero, zero, zero), step
        ).alias("st"),
    )
    s1 = F.element_at("st", 1)
    s2 = F.element_at("st", 2)
    path = F.when(s1 >= s2, F.element_at("st", 3)).otherwise(F.element_at("st", 4))
    return dp.select(
        F.size("o").cast("bigint").alias("n_days"),
        F.greatest(s1, s2).cast("bigint").alias("best_score"),
        path.cast("bigint").alias("path_bits"),
        F.bit_count(path).cast("bigint").alias("n_high_days"),
    )


# ---------------------------------------------------------------------------
# Q445 — epsilon-greedy bandit replay (exact-integer policy)
# ---------------------------------------------------------------------------
# Two arms = mean purchase vs click value per day; the policy
# explores on a fixed schedule (day mod 4 == 1, alternating arms)
# and otherwise exploits the higher cumulative mean — compared via
# cross-multiplication (sumA * nB >= sumB * nA), so every decision
# is integer arithmetic and the whole trajectory is reproducible
# bit-for-bit in both engines.  Regret is measured against the
# best-in-hindsight arm.
_Q445_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN ROUND(value * 100) ELSE 0 END) AS BIGINT) AS ra,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN ROUND(value * 100) ELSE 0 END) AS BIGINT) AS rb
      FROM events WHERE EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), ser AS (
      SELECT list([d, ra, rb] ORDER BY d) AS days FROM daily
    ), sim AS (
      SELECT days,
        list_reduce(
          list_prepend([CAST(0 AS BIGINT), 0, 0, 0, 0], days),
          (a, x) -> CASE
            WHEN (x[1] % 4 = 1 AND (x[1] // 4) % 2 = 0)
              OR (x[1] % 4 <> 1
                  AND (a[2] = 0 OR (a[4] > 0 AND a[1] * a[4] >= a[3] * a[2])))
            THEN [a[1] + x[2], a[2] + 1, a[3], a[4], a[5] + x[2]]
            ELSE [a[1], a[2], a[3] + x[3], a[4] + 1, a[5] + x[3]]
          END
        ) AS st
      FROM ser
    ), best AS (
      SELECT GREATEST(SUM(ra), SUM(rb)) AS best_total FROM daily
    )
    SELECT CAST(st[2] AS BIGINT) AS pulls_a,
           CAST(st[4] AS BIGINT) AS pulls_b,
           CAST(st[5] AS BIGINT) AS reward_c,
           CAST(best.best_total AS BIGINT) AS hindsight_best_c,
           CAST(best.best_total - st[5] AS BIGINT) AS regret_c
    FROM sim, best
"""


@register(
    "q445_bandit_replay",
    _Q445_ORACLE,
    doc="Epsilon-greedy bandit simulation as a fold over day rows: "
    "fixed alternating exploration schedule, greedy arm chosen by "
    "cross-multiplied cumulative means (pure integer compare, no "
    "float tie risk), regret vs the hindsight-best arm — "
    "sequential-decision simulation without leaving the engine "
    "(policy-replay q379's online sibling).",
)
def q445(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 28)
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.round(F.col("value") * 100))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("ra"),
        F.sum(
            F.when(F.col("event_type") == "click", F.round(F.col("value") * 100))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("rb"),
    )
    ser = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "ra", "rb"))).alias("days")
    )
    zero = F.lit(0).cast("bigint")

    def step(a, x):
        sa, na = F.element_at(a, 1), F.element_at(a, 2)
        sb, nb = F.element_at(a, 3), F.element_at(a, 4)
        tot = F.element_at(a, 5)
        pick_a = (
            (x.d % 4 == 1) & ((F.floor(x.d / 4) % 2) == 0)
        ) | (
            (x.d % 4 != 1)
            & ((na == 0) | ((nb > 0) & (sa * nb >= sb * na)))
        )
        return F.when(
            pick_a, F.array(sa + x.ra, na + 1, sb, nb, tot + x.ra)
        ).otherwise(F.array(sa, na, sb + x.rb, nb + 1, tot + x.rb))

    sim = ser.select(
        F.aggregate(
            F.col("days"), F.array(zero, zero, zero, zero, zero), step
        ).alias("st")
    )
    best = daily.agg(
        F.greatest(F.sum("ra"), F.sum("rb")).cast("bigint").alias("best_total")
    )
    return sim.crossJoin(F.broadcast(best)).select(
        F.element_at("st", 2).cast("bigint").alias("pulls_a"),
        F.element_at("st", 4).cast("bigint").alias("pulls_b"),
        F.element_at("st", 5).cast("bigint").alias("reward_c"),
        F.col("best_total").alias("hindsight_best_c"),
        (F.col("best_total") - F.element_at("st", 5))
        .cast("bigint")
        .alias("regret_c"),
    )


# ---------------------------------------------------------------------------
# Q446 — missingness mechanics audit
# ---------------------------------------------------------------------------
# Is missingness informative?  Per event type: null rates of value
# and props, their co-missingness lift P(both null)/(P(v)P(p)), and
# the value-mean shift conditional on props missing — the MCAR/MAR
# screening table imputation decisions depend on.
_Q446_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) + 5e-12, 6) AS value_null_frac,
           ROUND(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) + 5e-12, 6) AS props_null_frac,
           ROUND(
             (SUM(CASE WHEN value IS NULL AND props IS NULL THEN 1 ELSE 0 END)
              * 1.0 * COUNT(*))
             / NULLIF(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                      * 1.0 * SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END),
                      0) + 5e-12, 6) AS comiss_lift,
           ROUND(AVG(CASE WHEN props IS NULL THEN value END)
                 - AVG(CASE WHEN props IS NOT NULL THEN value END)
                 + 5e-10, 4) AS value_shift_props_null
    FROM events
    GROUP BY event_type ORDER BY event_type
"""


@register(
    "q446_missingness_audit",
    _Q446_ORACLE,
    doc="Missingness mechanics: per-event-type null rates, "
    "co-missingness lift P(both)/(P(v)P(p)), and the value-mean "
    "shift conditional on props being null — the MCAR-vs-informative "
    "screening table that gates imputation (null-semantics q183's "
    "statistical sibling).",
)
def q446(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    vn = F.when(F.col("value").isNull(), 1).otherwise(0)
    pn = F.when(F.col("props").isNull(), 1).otherwise(0)
    n = F.count(F.lit(1))
    return (
        ev.groupBy("event_type")
        .agg(
            n.cast("bigint").alias("n"),
            r6(F.sum(vn) * 1.0 / n).alias("value_null_frac"),
            r6(F.sum(pn) * 1.0 / n).alias("props_null_frac"),
            r6(
                (F.sum(vn * pn) * 1.0 * n)
                / F.nullif(F.sum(vn) * 1.0 * F.sum(pn), F.lit(0))
            ).alias("comiss_lift"),
            F.round(
                F.avg(F.when(F.col("props").isNull(), F.col("value")))
                - F.avg(F.when(F.col("props").isNotNull(), F.col("value")))
                + F.lit(5e-10),
                4,
            ).alias("value_shift_props_null"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q447 — LZ78 sequence complexity as a dictionary-building fold
# ---------------------------------------------------------------------------
# The daily revenue up/down bit sequence parsed by LZ78 incremental
# parsing inside one fold: the accumulator's head is the current
# phrase, its tail the growing dictionary — phrase count (plus an
# unfinished tail) is the complexity, normalized by n/log2(n), the
# randomness proxy used for data-quality screens.  Exact string
# operations, zero float in the parse.
_Q447_ORACLE = """
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             CAST(SUM(ROUND(value * 100)) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), bits0 AS (
      SELECT d,
             CASE WHEN v >= LAG(v) OVER (ORDER BY d) THEN '1' ELSE '0' END
               AS bit,
             LAG(v) OVER (ORDER BY d) AS pv
      FROM daily
    ), bits AS (
      SELECT list(bit ORDER BY d) AS b FROM bits0 WHERE pv IS NOT NULL
    ), parsed AS (
      SELECT b,
        list_reduce(
          list_prepend([''], list_transform(b, x -> [x])),
          (acc, x) -> CASE
            WHEN list_contains(acc[2:], acc[1] || x[1])
              THEN list_concat([acc[1] || x[1]], acc[2:])
            ELSE list_concat([''], list_append(acc[2:], acc[1] || x[1]))
          END
        ) AS st
      FROM bits
    )
    SELECT CAST(len(b) AS BIGINT) AS n_bits,
           CAST(len(st) - 1 + (CASE WHEN st[1] <> '' THEN 1 ELSE 0 END)
                AS BIGINT) AS lz_phrases,
           ROUND((len(st) - 1 + (CASE WHEN st[1] <> '' THEN 1 ELSE 0 END))
                 / (len(b) / (LN(len(b)) / LN(2.0))) + 5e-12, 6)
             AS normalized_complexity
    FROM parsed
"""


@register(
    "q447_lz_complexity",
    _Q447_ORACLE,
    doc="LZ78 incremental-parse complexity of the revenue up/down bit "
    "sequence as one fold (accumulator head = current phrase, tail "
    "= dictionary), normalized by the n/log2 n random-sequence "
    "rate — the compressibility screen beside entropy (q143) and "
    "permutation entropy (q263), parse fully exact.",
)
def q447(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("bigint").alias("v")
    )
    w = Window.orderBy("d")
    bits = (
        daily.select(
            "d", F.lag("v").over(w).alias("pv"), F.col("v")
        )
        .filter(F.col("pv").isNotNull())
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "d",
                            F.when(F.col("v") >= F.col("pv"), "1")
                            .otherwise("0")
                            .alias("bit"),
                        )
                    )
                ),
                lambda s: s.bit,
            ).alias("b")
        )
    )

    def step(acc, x):
        cur = F.element_at(acc, 1)
        dic = F.slice(acc, F.lit(2), F.size(acc) - 1)
        c2 = F.concat(cur, x)
        return F.when(
            F.array_contains(dic, c2), F.concat(F.array(c2), dic)
        ).otherwise(F.concat(F.array(F.lit("")), dic, F.array(c2)))

    parsed = bits.select(
        "b",
        F.aggregate(F.col("b"), F.array(F.lit("")), step).alias("st"),
    )
    phrases = (
        F.size("st")
        - 1
        + F.when(F.element_at("st", 1) != "", 1).otherwise(0)
    )
    nb = F.size("b")
    return parsed.select(
        nb.cast("bigint").alias("n_bits"),
        phrases.cast("bigint").alias("lz_phrases"),
        r6(
            phrases / (nb / (F.log(nb.cast("double")) / F.log(F.lit(2.0))))
        ).alias("normalized_complexity"),
    )


# ---------------------------------------------------------------------------
# Q448 — Borda and Condorcet/Copeland rank aggregation
# ---------------------------------------------------------------------------
# Five market segments rank 25 nations by revenue; social choice
# aggregates the five ballots: Borda score (sum of 25 - rank),
# pairwise Condorcet duels, and the Copeland score (wins - losses).
# Shows Borda and Copeland winners diverging when preference cycles
# exist — rank aggregation beside RRF (q109) and Kendall's W (q319).
_Q448_ORACLE = """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
             CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS r
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ), ranks AS (
      SELECT seg, nat,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY r DESC, nat) AS rk
      FROM rev
    ), borda AS (
      SELECT nat, SUM(25 - rk) AS borda,
             SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS n_first
      FROM ranks GROUP BY nat
    ), duel AS (
      SELECT a.nat AS i, b.nat AS j,
             SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS wins
      FROM ranks a JOIN ranks b ON b.seg = a.seg AND b.nat <> a.nat
      GROUP BY a.nat, b.nat
    ), cope AS (
      SELECT i AS nat,
             SUM(CASE WHEN wins > 2 THEN 1 WHEN wins < 3 THEN -1
                      ELSE 0 END) AS copeland
      FROM duel GROUP BY i
    )
    SELECT b.nat AS nation, CAST(b.borda AS BIGINT) AS borda_score,
           CAST(c.copeland AS BIGINT) AS copeland_score,
           CAST(b.n_first AS BIGINT) AS n_first_place
    FROM borda b JOIN cope c ON c.nat = b.nat
    ORDER BY borda_score DESC, nation LIMIT 10
"""


@register(
    "q448_borda_condorcet",
    _Q448_ORACLE,
    doc="Rank aggregation over five segment ballots of 25 nations: "
    "Borda scores, pairwise Condorcet duels, Copeland wins-losses "
    "— the social-choice aggregate beside RRF fusion (q109) and "
    "Bradley-Terry (q315); divergent winners expose preference "
    "cycles.",
)
def q448(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nat")
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("r"))
    )
    ranks = rev.select(
        "seg",
        "nat",
        F.row_number()
        .over(Window.partitionBy("seg").orderBy(F.desc("r"), "nat"))
        .alias("rk"),
    )
    borda = ranks.groupBy("nat").agg(
        F.sum(25 - F.col("rk")).alias("borda"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias("n_first"),
    )
    a = ranks.select(
        F.col("seg").alias("sa"), F.col("nat").alias("i"), F.col("rk").alias("ra")
    )
    b = ranks.select(
        F.col("seg").alias("sb"), F.col("nat").alias("j"), F.col("rk").alias("rb")
    )
    duel = (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(F.sum(F.when(F.col("ra") < F.col("rb"), 1).otherwise(0)).alias("wins"))
    )
    cope = duel.groupBy(F.col("i").alias("nat")).agg(
        F.sum(
            F.when(F.col("wins") > 2, 1).when(F.col("wins") < 3, -1).otherwise(0)
        ).alias("copeland")
    )
    return (
        borda.join(cope, "nat")
        .select(
            F.col("nat").alias("nation"),
            F.col("borda").cast("bigint").alias("borda_score"),
            F.col("copeland").cast("bigint").alias("copeland_score"),
            F.col("n_first").cast("bigint").alias("n_first_place"),
        )
        .orderBy(F.desc("borda_score"), "nation")
        .limit(10)
    )
