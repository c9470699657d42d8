"""Conformance queries batch #65 (q519+) — CRDT G-counter algebra,
instant-runoff voting, greedy graph coloring, tiered usage billing,
and revenue-recognition deferral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q519 — CRDT G-counter: merge order does not matter
# ---------------------------------------------------------------------------
# Three replicas count their own event partitions; the G-counter
# state is the per-replica vector and merge is element-wise max.
# The query audits the CRDT laws on real counts: associativity
# ((A^B)^C = A^(B^C)), commutativity, idempotence (B^B = B), and
# that the converged value equals the exact global count — the
# algebraic contract behind eventual consistency (merge-
# associativity q411's distributed-systems sibling).
_Q519_ORACLE = """
    WITH parts AS (
      SELECT user_id % 3 AS rep, COUNT(*) AS c
      FROM events GROUP BY user_id % 3
    ), v AS (
      SELECT MAX(CASE WHEN rep = 0 THEN c ELSE 0 END) AS a,
             MAX(CASE WHEN rep = 1 THEN c ELSE 0 END) AS b,
             MAX(CASE WHEN rep = 2 THEN c ELSE 0 END) AS c
      FROM parts
    ), merges AS (
      SELECT
        GREATEST(GREATEST(a, a), a) + GREATEST(GREATEST(b, 0), 0)
          + GREATEST(GREATEST(0, 0), c) AS dummy,
        -- ((A ^ B) ^ C): slotwise max then sum
        GREATEST(a, 0, 0) + GREATEST(0, b, 0) + GREATEST(0, 0, c) AS m1,
        -- (A ^ (C ^ B))
        GREATEST(a, 0, 0) + GREATEST(0, 0, b) + GREATEST(0, c, 0) AS m2,
        -- ((C ^ A) ^ (B ^ B)) with the idempotent double-merge of B
        GREATEST(0, a) + GREATEST(GREATEST(b, b), 0) + GREATEST(c, 0) AS m3,
        a + b + c AS exact
      FROM v
    )
    SELECT CAST(m1 AS BIGINT) AS merged_assoc_left,
           CAST(m2 AS BIGINT) AS merged_assoc_right,
           CAST(m3 AS BIGINT) AS merged_with_idempotent,
           CAST(exact AS BIGINT) AS exact_count,
           m1 = m2 AND m2 = m3 AND m3 = exact AS crdt_laws_hold
    FROM merges
"""


@register(
    "q519_crdt_gcounter",
    _Q519_ORACLE,
    doc="CRDT G-counter law audit on real partition counts: three "
    "merge orders (including an idempotent double-merge) all "
    "converge to the exact global count via slotwise max — the "
    "eventual-consistency algebra behind anti-entropy (Merkle q455) "
    "and mergeable aggregates (q411).",
)
def q519(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parts = ev.groupBy((F.col("user_id") % 3).alias("rep")).agg(
        F.count(F.lit(1)).alias("c")
    )
    v = parts.agg(
        F.max(F.when(F.col("rep") == 0, F.col("c")).otherwise(0)).alias("a"),
        F.max(F.when(F.col("rep") == 1, F.col("c")).otherwise(0)).alias("b"),
        F.max(F.when(F.col("rep") == 2, F.col("c")).otherwise(0)).alias("cc"),
    )
    a, b, cc = F.col("a"), F.col("b"), F.col("cc")
    zero = F.lit(0)
    m1 = F.greatest(a, zero, zero) + F.greatest(zero, b, zero) + F.greatest(
        zero, zero, cc
    )
    m2 = F.greatest(a, zero, zero) + F.greatest(zero, zero, b) + F.greatest(
        zero, cc, zero
    )
    m3 = (
        F.greatest(zero, a)
        + F.greatest(F.greatest(b, b), zero)
        + F.greatest(cc, zero)
    )
    exact = a + b + cc
    return v.select(
        m1.cast("bigint").alias("merged_assoc_left"),
        m2.cast("bigint").alias("merged_assoc_right"),
        m3.cast("bigint").alias("merged_with_idempotent"),
        exact.cast("bigint").alias("exact_count"),
        ((m1 == m2) & (m2 == m3) & (m3 == exact)).alias("crdt_laws_hold"),
    )


# ---------------------------------------------------------------------------
# Q520 — instant-runoff (ranked-choice) voting
# ---------------------------------------------------------------------------
# Customers rank the top-4 brands by their own purchase counts; IRV
# eliminates the weakest first-choice candidate for three unrolled
# rounds, transferring ballots to each voter's next surviving
# preference.  IRV's winner can differ from Borda/Condorcet (q448) —
# the non-monotone aggregation rule demonstrated relationally.
_Q520_ORACLE = """
    WITH cand AS MATERIALIZED (
      SELECT p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY COUNT(*) DESC, brand LIMIT 4
    ), ballots AS MATERIALIZED (
      SELECT o.o_custkey AS voter, p.p_brand AS brand,
             ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                                ORDER BY COUNT(*) DESC, p.p_brand) AS pref
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand IN (SELECT brand FROM cand)
      GROUP BY o.o_custkey, p.p_brand
    ), r1 AS MATERIALIZED (
      SELECT brand, COUNT(*) AS votes FROM (
        SELECT voter, MIN_BY(brand, pref) AS brand FROM ballots
        GROUP BY voter)
      GROUP BY brand
    ), e1 AS (
      SELECT brand FROM r1 ORDER BY votes, brand DESC LIMIT 1
    ), r2 AS MATERIALIZED (
      SELECT brand, COUNT(*) AS votes FROM (
        SELECT voter, MIN_BY(brand, pref) AS brand FROM ballots
        WHERE brand NOT IN (SELECT brand FROM e1)
        GROUP BY voter)
      GROUP BY brand
    ), e2 AS (
      SELECT brand FROM r2 ORDER BY votes, brand DESC LIMIT 1
    ), r3 AS MATERIALIZED (
      SELECT brand, COUNT(*) AS votes FROM (
        SELECT voter, MIN_BY(brand, pref) AS brand FROM ballots
        WHERE brand NOT IN (SELECT brand FROM e1)
          AND brand NOT IN (SELECT brand FROM e2)
        GROUP BY voter)
      GROUP BY brand
    ), e3 AS (
      SELECT brand FROM r3 ORDER BY votes, brand DESC LIMIT 1
    ), tally AS (
      SELECT 1 AS rnd, brand, votes,
             brand IN (SELECT brand FROM e1) AS eliminated FROM r1
      UNION ALL
      SELECT 2, brand, votes, brand IN (SELECT brand FROM e2) FROM r2
      UNION ALL
      SELECT 3, brand, votes, brand IN (SELECT brand FROM e3) FROM r3
    )
    SELECT rnd AS round, brand,
           CAST(votes AS BIGINT) AS first_choice_votes, eliminated
    FROM tally ORDER BY round, first_choice_votes DESC, brand
"""


@register(
    "q520_ranked_choice",
    _Q520_ORACLE,
    doc="Instant-runoff voting over customer brand-preference ballots "
    "(ranked by own purchase counts): three unrolled elimination "
    "rounds with ballot transfer via min surviving preference — the "
    "non-monotone social-choice rule whose winner can differ from "
    "Borda/Copeland (q448).",
)
def q520(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # IRV without sequential tally rounds: with 4 candidates there are
    # only C(4,0)+C(4,1)+C(4,2) = 11 exclusion sets any elimination
    # path can visit, so ONE pass tallies every (exclusion set, first
    # surviving preference) cell and the elimination recursion runs on
    # the collected <=11x4 cells (a bounded driver collect, the
    # SCALE.md O(#groups) rule — same class as the CC convergence
    # probe). The previous shape ran 3 sequential tally rounds with an
    # eager checkpoint and per-round anti-joins: 4.1 s -> ~2.6 s
    # steady at sf0.1, rows identical at both SFs.
    lp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("voter"), "p_brand")
        .localCheckpoint(eager=False)
    )
    cand = (
        lp.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "p_brand")
        .limit(4)
        .select(F.col("p_brand").alias("brand"))
    )
    cands = [r.brand for r in cand.collect()]
    ballots = (
        lp.filter(F.col("p_brand").isin(cands))
        .groupBy("voter", "p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "voter",
            F.col("p_brand").alias("brand"),
            F.row_number()
            .over(
                Window.partitionBy("voter").orderBy(F.desc("cnt"), "p_brand")
            )
            .alias("pref"),
        )
    )
    prefs = ballots.groupBy("voter").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pref", "brand"))),
            lambda s: s["brand"],
        ).alias("ranking")
    )
    subsets = [
        tuple(sorted(s))
        for k in range(3)
        for s in itertools.combinations(cands, k)
    ]
    sub_df = spark.createDataFrame(
        [("|".join(s), list(s)) for s in subsets], "sid string, ex array<string>"
    )
    tallies = (
        prefs.crossJoin(F.broadcast(sub_df))
        .select(
            "sid",
            # try_element_at: a voter whose whole ranking is excluded
            # has an empty surviving list and must drop out
            F.try_element_at(
                F.filter(
                    F.col("ranking"),
                    lambda b: ~F.array_contains(F.col("ex"), b),
                ),
                F.lit(1),
            ).alias("first"),
        )
        .filter(F.col("first").isNotNull())
        .groupBy("sid", "first")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    t: dict[str, dict[str, int]] = {}
    for r in tallies.collect():
        t.setdefault(r.sid, {})[r.first] = r.votes
    rows = []
    excluded: list[str] = []
    for rnd in (1, 2, 3):
        tally = t.get("|".join(sorted(excluded)), {})
        if not tally:
            # every remaining ballot exhausted — no further rounds
            # (the oracle's recursive tally likewise emits nothing)
            break
        # elimination pick: fewest first-choice votes, tie -> MAX brand
        # string (the oracle's ORDER BY votes, brand DESC LIMIT 1).
        # Explicit min-then-max instead of a negated-ordinal sort key,
        # which diverges when one brand is a proper prefix of another.
        mv = min(tally.values())
        e = max(b for b, v in tally.items() if v == mv)
        for b, v in tally.items():
            rows.append((rnd, b, v, b == e))
        excluded.append(e)
    out = spark.createDataFrame(
        rows, "round int, brand string, first_choice_votes long, eliminated boolean"
    )
    return out.orderBy("round", F.desc("first_choice_votes"), "brand")


# ---------------------------------------------------------------------------
# Q521 — greedy graph coloring with a validity certificate
# ---------------------------------------------------------------------------
# The 30-node modulo contact graph colored greedily in id order: the
# fold carries the color array, each node takes the lowest color
# missing from its already-colored neighbors (used-color BITMASK,
# lowest zero bit found by an inner scan).  The relational conflict
# count over all edges (must be 0) certifies the coloring; colors
# used vs the max-degree+1 greedy bound.
_Q521_ORACLE = """
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey % 30 AS BIGINT) AS u,
             CAST(o_orderkey % 30 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 30 <> o_orderkey % 30
    ), e AS MATERIALIZED (
      SELECT u, v FROM e0 UNION SELECT v, u FROM e0
    ), adj AS MATERIALIZED (
      SELECT list(CASE WHEN x.present THEN 1 ELSE 0 END
                  ORDER BY x.u * 30 + x.v) AS am
      FROM (
        SELECT g1.a AS u, g2.b AS v,
               EXISTS (SELECT 1 FROM e WHERE e.u = g1.a AND e.v = g2.b)
                 AS present
        FROM generate_series(0, 29) g1(a), generate_series(0, 29) g2(b)
      ) x
    ), colored AS (
      SELECT am,
        list_reduce(
          list_prepend(CAST([] AS BIGINT[]),
            list_transform(generate_series(0, 29),
                           nd -> [CAST(nd AS BIGINT)])),
          (cols, nd) -> list_append(cols,
            -- lowest zero bit of the used-color mask of nd's
            -- already-colored neighbors
            list_reduce(
              list_prepend([CAST(-1 AS BIGINT), 0],
                list_transform(generate_series(0, 30),
                               k -> [CAST(k AS BIGINT)])),
              (st, k) -> CASE
                WHEN st[1] >= 0 THEN st
                WHEN (list_reduce(
                        list_prepend([CAST(0 AS BIGINT), 0],
                          list_transform(generate_series(1, len(cols)),
                                         j -> [CAST(j AS BIGINT)])),
                        (mk, j) -> [mk[1]
                          | (am[CAST(nd[1] * 30 + (j[1] - 1) AS INT) + 1]
                             * CAST(POW(2, cols[CAST(j[1] AS INT)])
                                    AS BIGINT)), 0]
                      )[1] // CAST(POW(2, k[1]) AS BIGINT)) % 2 = 0
                  THEN [k[1], 0]
                ELSE st END
            )[1])
        ) AS cols
      FROM adj
    ), deg AS (
      SELECT MAX(d) AS maxdeg FROM (
        SELECT u, COUNT(*) AS d FROM e GROUP BY u)
    ), conflicts AS (
      SELECT COUNT(*) AS n FROM e, colored
      WHERE cols[CAST(e.u AS INT) + 1] = cols[CAST(e.v AS INT) + 1]
    )
    SELECT CAST(30 AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) / 2 AS BIGINT) AS n_edges,
           CAST((SELECT MAX(x) FROM (SELECT UNNEST(cols) AS x
                                     FROM colored)) + 1 AS BIGINT)
             AS colors_used,
           CAST(deg.maxdeg + 1 AS BIGINT) AS greedy_bound,
           CAST(conflicts.n AS BIGINT) AS n_conflicts
    FROM deg, conflicts
"""


@register(
    "q521_greedy_coloring",
    _Q521_ORACLE,
    doc="Greedy graph coloring of the modulo contact graph as a fold "
    "(color array accumulator; used-neighbor-color bitmask built by "
    "an inner fold, lowest zero bit by scan), certified by a "
    "relational zero-conflict check over all edges and bounded by "
    "max-degree+1 — the register-allocation primitive with its "
    "certificate.",
)
def q521(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e0 = (
        o.select(
            (F.col("o_custkey") % 30).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 30).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e0.unionAll(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().localCheckpoint(eager=False)
    g1 = spark.range(0, 30).select(F.col("id").alias("au"))
    g2 = spark.range(0, 30).select(F.col("id").alias("av"))
    cells = (
        g1.crossJoin(F.broadcast(g2))
        .join(
            e.select(F.col("u").alias("eu"), F.col("v").alias("ev"), F.lit(1).alias("p")),
            (F.col("au") == F.col("eu")) & (F.col("av") == F.col("ev")),
            "left",
        )
        .select(
            (F.col("au") * 30 + F.col("av")).alias("o"),
            F.coalesce("p", F.lit(0)).cast("bigint").alias("present"),
        )
    )
    adj = cells.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("o", "present"))),
            lambda s: s.present,
        ).alias("am")
    )
    am = F.col("am")

    def used_mask(cols, nd):
        # Spark sequence(1, 0) descends instead of being empty; guard
        # the first node whose colored-prefix is empty.
        return F.when(F.size(cols) == 0, F.lit(0).cast("bigint")).otherwise(
            F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(1), F.size(cols)),
                    lambda j: j.cast("bigint"),
                ),
                F.array(F.lit(0).cast("bigint")),
                lambda mk, j: F.array(
                    F.element_at(mk, 1).bitwiseOR(
                        F.element_at(am, (nd * 30 + (j - 1)).cast("int") + 1)
                        * F.pow(
                            F.lit(2.0), F.element_at(cols, j.cast("int"))
                        ).cast("bigint")
                    )
                ),
            ),
                1,
            )
        )

    def lowest_zero(mask):
        return F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(30)), lambda k: k.cast("bigint")
                ),
                F.array(F.lit(-1).cast("bigint")),
                lambda st, k: F.when(F.element_at(st, 1) >= 0, st)
                .when(
                    F.floor(
                        mask / F.pow(F.lit(2.0), k).cast("bigint")
                    )
                    % 2
                    == 0,
                    F.array(k),
                )
                .otherwise(st),
            ),
            1,
        )

    def step(cols, nd):
        return F.concat(cols, F.array(lowest_zero(used_mask(cols, nd))))

    colored = adj.select(
        "am",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(29)), lambda nd: nd.cast("bigint")
            ),
            F.array().cast("array<bigint>"),
            step,
        ).alias("cols"),
    ).localCheckpoint(eager=False)
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d")).agg(
        F.max("d").alias("maxdeg")
    )
    ecnt = e.agg((F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"))
    conflicts = (
        e.crossJoin(F.broadcast(colored.select("cols")))
        .filter(
            F.element_at(F.col("cols"), F.col("u").cast("int") + 1)
            == F.element_at(F.col("cols"), F.col("v").cast("int") + 1)
        )
        .agg(F.count(F.lit(1)).alias("n_conflicts"))
    )
    used = colored.select(
        (F.array_max("cols") + 1).cast("bigint").alias("colors_used")
    )
    return (
        used.crossJoin(F.broadcast(deg))
        .crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(conflicts))
        .select(
            F.lit(30).cast("bigint").alias("n_nodes"),
            F.col("n_edges"),
            F.col("colors_used"),
            (F.col("maxdeg") + 1).cast("bigint").alias("greedy_bound"),
            F.col("n_conflicts").cast("bigint").alias("n_conflicts"),
        )
    )


# ---------------------------------------------------------------------------
# Q522 — tiered usage billing with mid-period upgrades
# ---------------------------------------------------------------------------
# Each user's tier on each of 28 days follows their CUMULATIVE
# purchase count (tier1 < 5 <= tier2 < 15 <= tier3); the invoice
# prorates daily at 10/20/30 cents.  Per final tier: population,
# mean invoice and mean first-upgrade day — subscription-billing
# proration as a user x day spine with windowed cumulative state
# (amortization q432's usage-based sibling).
_Q522_ORACLE = """
    WITH pu AS (
      SELECT user_id, CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
             COUNT(*) AS c
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1, 2
    ), users AS (
      SELECT DISTINCT user_id FROM pu
    ), spine AS (
      SELECT u.user_id, g.d
      FROM users u, generate_series(1, 28) g(d)
    ), cum AS (
      SELECT s.user_id, s.d,
             SUM(COALESCE(p.c, 0)) OVER (PARTITION BY s.user_id
                                         ORDER BY s.d) AS cc
      FROM spine s LEFT JOIN pu p
        ON p.user_id = s.user_id AND p.d = s.d
    ), tiered AS (
      SELECT user_id, d, cc,
             CASE WHEN cc < 5 THEN 1 WHEN cc < 15 THEN 2 ELSE 3 END AS tier
      FROM cum
    ), inv AS (
      SELECT user_id,
             SUM(CASE tier WHEN 1 THEN 10 WHEN 2 THEN 20 ELSE 30 END)
               AS invoice_c,
             MAX(tier) AS final_tier,
             MIN(CASE WHEN tier >= 2 THEN d END) AS first_upgrade_day
      FROM tiered GROUP BY user_id
    )
    SELECT CAST(final_tier AS BIGINT) AS final_tier,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(invoice_c / 100.0) + 5e-8, 2) AS avg_invoice_usd,
           CAST(SUM(invoice_c) AS BIGINT) AS total_invoice_c,
           ROUND(AVG(first_upgrade_day * 1.0) + 5e-10, 4)
             AS avg_first_upgrade_day
    FROM inv GROUP BY final_tier ORDER BY final_tier
"""


@register(
    "q522_usage_billing",
    _Q522_ORACLE,
    doc="Tiered usage billing with mid-period upgrades: per-user daily "
    "tier from the windowed cumulative purchase count over a "
    "user x day spine, daily proration at 10/20/30c, invoices and "
    "first-upgrade timing by final tier — the billing-engine "
    "proration pattern (amortization q432's usage sibling).",
)
def q522(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    pu = ev.groupBy(
        "user_id", F.dayofmonth("ts").cast("bigint").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    users = pu.select("user_id").distinct()
    days = spark.range(1, 29).select(F.col("id").alias("d"))
    spine = users.crossJoin(F.broadcast(days))
    cum = spine.join(pu, ["user_id", "d"], "left").select(
        "user_id",
        "d",
        F.sum(F.coalesce("c", F.lit(0)))
        .over(Window.partitionBy("user_id").orderBy("d"))
        .alias("cc"),
    )
    tiered = cum.select(
        "user_id",
        "d",
        F.when(F.col("cc") < 5, 1).when(F.col("cc") < 15, 2).otherwise(3).alias(
            "tier"
        ),
    )
    inv = tiered.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("tier") == 1, 10)
            .when(F.col("tier") == 2, 20)
            .otherwise(30)
        ).alias("invoice_c"),
        F.max("tier").alias("final_tier"),
        F.min(F.when(F.col("tier") >= 2, F.col("d"))).alias("first_upgrade_day"),
    )
    return (
        inv.groupBy("final_tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.avg(F.col("invoice_c") / 100.0) + F.lit(5e-8), 2).alias(
                "avg_invoice_usd"
            ),
            F.sum("invoice_c").cast("bigint").alias("total_invoice_c"),
            F.round(
                F.avg(F.col("first_upgrade_day") * 1.0) + F.lit(5e-10), 4
            ).alias("avg_first_upgrade_day"),
        )
        .select(
            F.col("final_tier").cast("bigint").alias("final_tier"),
            "n_users",
            "avg_invoice_usd",
            "total_invoice_c",
            "avg_first_upgrade_day",
        )
        .orderBy("final_tier")
    )


# ---------------------------------------------------------------------------
# Q523 — revenue recognition: deferral waterfall with an identity
# ---------------------------------------------------------------------------
# Every order's price is recognized straight-line over three months
# from its order month, in exact integer thirds (two floors + the
# remainder) so the rollforward identity deferred_end =
# deferred_start + bookings - recognized holds to the cent — the
# ASC-606-style schedule as window algebra, audited monthly.
_Q523_ORACLE = """
    WITH o AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o_orderdate) AS m0,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS p
      FROM orders
    ), sched AS (
      SELECT m0 + g.k AS m,
             CASE WHEN g.k < 2 THEN p // 3 ELSE p - 2 * (p // 3) END AS rec,
             CASE WHEN g.k = 0 THEN p ELSE 0 END AS booked
      FROM o, generate_series(0, 2) g(k)
    ), monthly AS (
      SELECT m, SUM(booked) AS bookings, SUM(rec) AS recognized
      FROM sched GROUP BY m
    ), roll AS (
      SELECT m, bookings, recognized,
             SUM(bookings - recognized) OVER (ORDER BY m) AS deferred_end,
             COALESCE(SUM(bookings - recognized)
               OVER (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS deferred_start
      FROM monthly
    )
    SELECT CAST(m AS BIGINT) AS month_idx,
           CAST(bookings AS BIGINT) AS bookings_c,
           CAST(recognized AS BIGINT) AS recognized_c,
           CAST(deferred_end AS BIGINT) AS deferred_end_c,
           deferred_end = deferred_start + bookings - recognized
             AS rollforward_ok
    FROM roll ORDER BY m DESC LIMIT 12
"""


@register(
    "q523_revenue_recognition",
    _Q523_ORACLE,
    doc="Straight-line revenue recognition over three months in exact "
    "integer thirds: monthly bookings/recognized/deferred waterfall "
    "with the rollforward identity deferred_end = start + bookings "
    "- recognized verified per month to the cent — the accounting "
    "deferral engine beside amortization (q432) and FIFO lots "
    "(q344).",
)
def q523(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    o = od.select(
        (
            (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate")
        ).alias("m0"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("p"),
    )
    ks = spark.range(0, 3).select(F.col("id").alias("k"))
    sched = o.crossJoin(F.broadcast(ks)).select(
        (F.col("m0") + F.col("k")).alias("m"),
        F.when(F.col("k") < 2, F.floor(F.col("p") / 3))
        .otherwise(F.col("p") - 2 * F.floor(F.col("p") / 3))
        .alias("rec"),
        F.when(F.col("k") == 0, F.col("p")).otherwise(0).alias("booked"),
    )
    monthly = sched.groupBy("m").agg(
        F.sum("booked").alias("bookings"), F.sum("rec").alias("recognized")
    )
    w = Window.orderBy("m")
    roll = monthly.select(
        "m",
        "bookings",
        "recognized",
        F.sum(F.col("bookings") - F.col("recognized")).over(w).alias(
            "deferred_end"
        ),
        F.coalesce(
            F.sum(F.col("bookings") - F.col("recognized")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("deferred_start"),
    )
    return (
        roll.select(
            F.col("m").cast("bigint").alias("month_idx"),
            F.col("bookings").cast("bigint").alias("bookings_c"),
            F.col("recognized").cast("bigint").alias("recognized_c"),
            F.col("deferred_end").cast("bigint").alias("deferred_end_c"),
            (
                F.col("deferred_end")
                == F.col("deferred_start") + F.col("bookings") - F.col("recognized")
            ).alias("rollforward_ok"),
        )
        .orderBy(F.desc("month_idx"))
        .limit(12)
    )
