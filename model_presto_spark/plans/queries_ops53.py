"""Conformance queries batch #53 (q459+) — Fagin threshold-algorithm
depth, intervention-based outlier explanation, t-closeness privacy,
incremental view maintenance with retractions, and the Weiszfeld
geometric median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q459 — Fagin's threshold algorithm: how deep must a rank-join scan?
# ---------------------------------------------------------------------------
# Two sorted access lists over orders (normalized price desc,
# normalized recency desc), combined score = their mean.  TA can
# stop at the first depth d where the running threshold
# tau(d) = s1(d)+s2(d) drops to the true k-th best total — provided
# the top-k have surfaced in some list by then.  Both quantities are
# window expressions, so the stopping depth and the scanned fraction
# (the whole point of instance-optimal rank joins) come out exactly.
_Q459_ORACLE = """
    WITH base AS (
      SELECT o_orderkey AS k,
             (o_totalprice - MIN(o_totalprice) OVER ())
               / (MAX(o_totalprice) OVER () - MIN(o_totalprice) OVER ()) AS s1,
             (epoch_us(o_orderdate) - MIN(epoch_us(o_orderdate)) OVER ())
               * 1.0
               / (MAX(epoch_us(o_orderdate)) OVER ()
                  - MIN(epoch_us(o_orderdate)) OVER ()) AS s2
      FROM orders
    ), scored AS (
      SELECT k, s1, s2, (s1 + s2) / 2 AS s,
             ROW_NUMBER() OVER (ORDER BY s1 DESC, k) AS r1,
             ROW_NUMBER() OVER (ORDER BY s2 DESC, k) AS r2
      FROM base
    ), kth AS (
      SELECT MIN(s) AS tk FROM (
        SELECT s FROM scored ORDER BY s DESC, k LIMIT 10
      )
    ), seen_depth AS (
      SELECT MAX(LEAST(r1, r2)) AS d_seen FROM (
        SELECT k, s, LEAST(r1, r2) AS r1r2, r1, r2 FROM scored
        ORDER BY s DESC, k LIMIT 10
      )
    ), tau AS (
      SELECT d, (p1 + p2) / 2 AS tau FROM (
        SELECT r1 AS d, s1 AS p1,
               (SELECT s2 FROM scored x WHERE x.r2 = scored.r1) AS p2
        FROM scored
      )
    ), tstop AS (
      SELECT MIN(d) AS d_tau FROM tau, kth WHERE tau.tau <= kth.tk
    )
    SELECT CAST((SELECT COUNT(*) FROM scored) AS BIGINT) AS n_objects,
           ROUND(kth.tk + 5e-12, 6) AS kth_best_score,
           CAST(sd.d_seen AS BIGINT) AS depth_topk_seen,
           CAST(ts.d_tau AS BIGINT) AS depth_threshold,
           CAST(GREATEST(sd.d_seen, ts.d_tau) AS BIGINT) AS ta_stop_depth,
           ROUND(GREATEST(sd.d_seen, ts.d_tau) * 1.0
                 / (SELECT COUNT(*) FROM scored) + 5e-12, 6) AS scan_frac
    FROM kth, seen_depth sd, tstop ts
"""


@register(
    "q459_fagin_ta",
    _Q459_ORACLE,
    doc="Fagin threshold-algorithm stopping depth for a top-10 rank "
    "join over two sorted access lists (price, recency): true k-th "
    "best score, depth where the running threshold tau(d) crosses "
    "it, depth where the top-k have surfaced, and the scanned "
    "fraction — the instance-optimality measurement behind rank "
    "joins (top-k q22/q364's middleware sibling).",
)
def q459(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    allw = Window.partitionBy()
    p = F.col("o_totalprice")
    dt = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    base = o.select(
        F.col("o_orderkey").alias("k"),
        ((p - F.min(p).over(allw)) / (F.max(p).over(allw) - F.min(p).over(allw))).alias("s1"),
        (
            (dt - F.min(dt).over(allw))
            * 1.0
            / (F.max(dt).over(allw) - F.min(dt).over(allw))
        ).alias("s2"),
    )
    scored = base.select(
        "k",
        "s1",
        "s2",
        ((F.col("s1") + F.col("s2")) / 2).alias("s"),
        F.row_number().over(Window.orderBy(F.desc("s1"), "k")).alias("r1"),
        F.row_number().over(Window.orderBy(F.desc("s2"), "k")).alias("r2"),
    ).localCheckpoint(eager=False)
    topk = scored.orderBy(F.desc("s"), "k").limit(10)
    kth = topk.agg(F.min("s").alias("tk"))
    seen = topk.agg(F.max(F.least("r1", "r2")).alias("d_seen"))
    l1 = scored.select(F.col("r1").alias("d"), F.col("s1").alias("p1"))
    l2 = scored.select(F.col("r2").alias("d"), F.col("s2").alias("p2"))
    tau = l1.join(l2, "d").select("d", ((F.col("p1") + F.col("p2")) / 2).alias("tau"))
    tstop = tau.crossJoin(F.broadcast(kth)).filter(
        F.col("tau") <= F.col("tk")
    ).agg(F.min("d").alias("d_tau"))
    n = scored.agg(F.count(F.lit(1)).alias("n_objects"))
    return (
        kth.crossJoin(F.broadcast(seen))
        .crossJoin(F.broadcast(tstop))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n_objects").cast("bigint").alias("n_objects"),
            r6(F.col("tk")).alias("kth_best_score"),
            F.col("d_seen").cast("bigint").alias("depth_topk_seen"),
            F.col("d_tau").cast("bigint").alias("depth_threshold"),
            F.greatest("d_seen", "d_tau").cast("bigint").alias("ta_stop_depth"),
            r6(
                F.greatest("d_seen", "d_tau") * 1.0 / F.col("n_objects")
            ).alias("scan_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Q460 — intervention-based outlier explanation (Scorpion-style)
# ---------------------------------------------------------------------------
# "Why is the average order price what it is?"  For every candidate
# predicate (each priority, each status, each order month), price
# its removal: how far does the global average move, at what support
# cost?  influence = |avg_without - avg| / support is the Scorpion
# ranking — group sums make every counterfactual free.
_Q460_ORACLE = """
    WITH tot AS (
      SELECT COUNT(*) AS n, SUM(ROUND(o_totalprice * 100)) AS s
      FROM orders
    ), cand AS (
      SELECT 'priority=' || o_orderpriority AS pred,
             COUNT(*) AS n_g, SUM(ROUND(o_totalprice * 100)) AS s_g
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT 'status=' || o_orderstatus, COUNT(*),
             SUM(ROUND(o_totalprice * 100))
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'month=' || CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR),
             COUNT(*), SUM(ROUND(o_totalprice * 100))
      FROM orders GROUP BY EXTRACT(month FROM o_orderdate)
    )
    SELECT c.pred,
           CAST(c.n_g AS BIGINT) AS support,
           ROUND((t.s - c.s_g) * 1.0 / (t.n - c.n_g) / 100.0
                 - t.s * 1.0 / t.n / 100.0 + 5e-10, 4) AS delta_avg_usd,
           ROUND(ABS((t.s - c.s_g) * 1.0 / (t.n - c.n_g)
                     - t.s * 1.0 / t.n)
                 / (c.n_g * 1.0 / t.n) / 100.0 + 5e-10, 4)
             AS influence_usd
    FROM cand c, tot t
    ORDER BY influence_usd DESC, c.pred LIMIT 8
"""


@register(
    "q460_scorpion_explanation",
    _Q460_ORACLE,
    doc="Scorpion-style aggregate explanation: every candidate "
    "predicate's counterfactual removal priced from group sums "
    "(avg-without minus avg, influence normalized by support), "
    "top-8 by influence — why-is-this-aggregate-high analysis as "
    "one union of group-bys.",
)
def q460(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100)
    tot = o.agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s"))

    def cand(keyexpr, prefix):
        return o.groupBy(keyexpr.alias("kx")).agg(
            F.count(F.lit(1)).alias("n_g"), F.sum(cents).alias("s_g")
        ).select(
            F.concat(F.lit(prefix), F.col("kx").cast("string")).alias("pred"),
            "n_g",
            "s_g",
        )

    c = (
        cand(F.col("o_orderpriority"), "priority=")
        .unionAll(cand(F.col("o_orderstatus"), "status="))
        .unionAll(cand(F.month("o_orderdate"), "month="))
    )
    avg_all = F.col("s") * 1.0 / F.col("n")
    avg_wo = (F.col("s") - F.col("s_g")) * 1.0 / (F.col("n") - F.col("n_g"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "pred",
            F.col("n_g").cast("bigint").alias("support"),
            F.round((avg_wo - avg_all) / 100.0 + F.lit(5e-10), 4).alias(
                "delta_avg_usd"
            ),
            F.round(
                F.abs(avg_wo - avg_all)
                / (F.col("n_g") * 1.0 / F.col("n"))
                / 100.0
                + F.lit(5e-10),
                4,
            ).alias("influence_usd"),
        )
        .orderBy(F.desc("influence_usd"), "pred")
        .limit(8)
    )


# ---------------------------------------------------------------------------
# Q461 — t-closeness (ordered EMD between group and global)
# ---------------------------------------------------------------------------
# Quasi-identifier groups = (nation, segment); sensitive attribute =
# global account-balance decile.  t-closeness measures each group's
# earth-mover distance to the global decile distribution (1-D
# ordered EMD = mean |cumulative difference|): the third privacy
# bar after k-anonymity (q89) and l-diversity (q288).
_Q461_ORACLE = """
    WITH fences AS (
      SELECT quantile_cont(c_acctbal,
               list_transform(generate_series(1, 9), i -> i / 10.0)) AS f
      FROM customer
    ), dec AS (
      SELECT c_nationkey AS nat, c_mktsegment AS seg,
             1 + CAST((SELECT COUNT(*) FROM unnest(f.f) u(v)
                       WHERE c.c_acctbal > u.v) AS INT) AS d
      FROM customer c, fences f
    ), gq AS (
      SELECT nat, seg, d, COUNT(*) AS c FROM dec GROUP BY nat, seg, d
    ), gt AS (
      SELECT nat, seg, SUM(c) AS n FROM gq GROUP BY nat, seg
    ), gdist AS (
      SELECT d, COUNT(*) AS c FROM dec GROUP BY d
    ), gn AS (SELECT SUM(c) AS n FROM gdist
    ), grid AS (
      SELECT t.nat, t.seg, g.d,
             COALESCE(q.c, 0) * 1.0 / t.n AS p,
             g.c * 1.0 / gn.n AS q
      FROM gt t CROSS JOIN gdist g CROSS JOIN gn
      LEFT JOIN gq q ON q.nat = t.nat AND q.seg = t.seg AND q.d = g.d
    ), cumdiff AS (
      SELECT nat, seg,
             SUM(ABS(cum_p - cum_q)) / 9.0 AS emd
      FROM (
        SELECT nat, seg, d,
               SUM(p) OVER (PARTITION BY nat, seg ORDER BY d) AS cum_p,
               SUM(q) OVER (PARTITION BY nat, seg ORDER BY d) AS cum_q
        FROM grid
      ) WHERE d < 10
      GROUP BY nat, seg
    )
    SELECT c.nat AS nation, c.seg AS segment,
           CAST(t.n AS BIGINT) AS group_size,
           ROUND(c.emd + 5e-12, 6) AS emd_t
    FROM cumdiff c JOIN gt t ON t.nat = c.nat AND t.seg = c.seg
    ORDER BY emd_t DESC, nation, segment LIMIT 10
"""


@register(
    "q461_t_closeness",
    _Q461_ORACLE,
    doc="t-closeness audit: per (nation, segment) quasi-identifier "
    "group, ordered earth-mover distance between the group's "
    "balance-decile distribution and the global one (1-D EMD = "
    "mean |cumulative gap|), worst 10 groups — completing the "
    "privacy trio with k-anonymity (q89) and l-diversity (q288).",
)
def q461(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    fences = c.agg(
        F.percentile(
            "c_acctbal", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
        ).alias("f")
    )
    dec = c.crossJoin(F.broadcast(fences)).select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        (
            1
            + F.size(
                F.filter(F.col("f"), lambda v: F.col("c_acctbal") > v)
            )
        ).alias("d"),
        # lineage cut: dec feeds the per-group and global decile
        # histograms (plan audit: 20 scans un-materialized)
    ).localCheckpoint(eager=False)
    gq = dec.groupBy("nat", "seg", "d").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    gt = gq.groupBy("nat", "seg").agg(F.sum("c").alias("n"))
    glob = dec.groupBy("d").agg(F.count(F.lit(1)).alias("gc"))
    gn = glob.agg(F.sum("gc").alias("gn"))
    grid = (
        gt.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(gn))
        .join(gq, ["nat", "seg", "d"], "left")
        .select(
            "nat",
            "seg",
            "d",
            (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("n")).alias("p"),
            (F.col("gc") * 1.0 / F.col("gn")).alias("q"),
        )
    )
    w = Window.partitionBy("nat", "seg").orderBy("d")
    cum = grid.select(
        "nat",
        "seg",
        "d",
        F.sum("p").over(w).alias("cum_p"),
        F.sum("q").over(w).alias("cum_q"),
    ).filter(F.col("d") < 10)
    emd = cum.groupBy("nat", "seg").agg(
        (F.sum(F.abs(F.col("cum_p") - F.col("cum_q"))) / 9.0).alias("emd")
    )
    return (
        emd.join(gt, ["nat", "seg"])
        .select(
            F.col("nat").alias("nation"),
            F.col("seg").alias("segment"),
            F.col("n").cast("bigint").alias("group_size"),
            r6(F.col("emd")).alias("emd_t"),
        )
        .orderBy(F.desc("emd_t"), "nation", "segment")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q462 — incremental view maintenance with retractions
# ---------------------------------------------------------------------------
# The IVM contract, with the subtle part: base aggregates (days
# 1-28) patched by an insert delta (days 29+) AND a retraction
# delta (multiplicity -1 for event_id = 0 mod 97) must equal the
# direct recompute on the corrected multiset — INCLUDING deleting
# groups whose count reaches zero.  The audit counts groups, zeroed
# groups, and value agreement.
_Q462_ORACLE = """
    WITH base AS (
      SELECT user_id, COUNT(*) AS c,
             CAST(SUM(ROUND(COALESCE(value, 0) * 100)) AS BIGINT) AS s
      FROM events WHERE EXTRACT(day FROM ts) <= 28 GROUP BY user_id
    ), ins AS (
      SELECT user_id, COUNT(*) AS c,
             CAST(SUM(ROUND(COALESCE(value, 0) * 100)) AS BIGINT) AS s
      FROM events WHERE EXTRACT(day FROM ts) > 28 GROUP BY user_id
    ), ret AS (
      SELECT user_id, COUNT(*) AS c,
             CAST(SUM(ROUND(COALESCE(value, 0) * 100)) AS BIGINT) AS s
      FROM events WHERE EXTRACT(day FROM ts) <= 28 AND event_id % 97 = 0
      GROUP BY user_id
    ), inc AS (
      SELECT COALESCE(b.user_id, i.user_id) AS user_id,
             COALESCE(b.c, 0) + COALESCE(i.c, 0) - COALESCE(r.c, 0) AS c,
             COALESCE(b.s, 0) + COALESCE(i.s, 0) - COALESCE(r.s, 0) AS s
      FROM base b
      FULL JOIN ins i ON i.user_id = b.user_id
      LEFT JOIN ret r ON r.user_id = COALESCE(b.user_id, i.user_id)
    ), direct AS (
      SELECT user_id, COUNT(*) AS c,
             CAST(SUM(ROUND(COALESCE(value, 0) * 100)) AS BIGINT) AS s
      FROM events
      WHERE NOT (EXTRACT(day FROM ts) <= 28 AND event_id % 97 = 0)
      GROUP BY user_id
    ), cmp AS (
      SELECT COUNT(*) AS n_direct,
             (SELECT COUNT(*) FROM inc WHERE c > 0) AS n_inc_live,
             (SELECT COUNT(*) FROM inc WHERE c = 0) AS n_zeroed,
             (SELECT COUNT(*) FROM inc i JOIN direct d
               ON d.user_id = i.user_id AND d.c = i.c AND d.s = i.s)
               AS n_match
      FROM direct
    )
    SELECT CAST(n_direct AS BIGINT) AS n_groups_direct,
           CAST(n_inc_live AS BIGINT) AS n_groups_incremental,
           CAST(n_zeroed AS BIGINT) AS n_groups_zeroed,
           CAST(n_match AS BIGINT) AS n_value_matches,
           n_direct = n_inc_live AND n_match = n_direct AS ivm_consistent
    FROM cmp
"""


@register(
    "q462_ivm_retraction",
    _Q462_ORACLE,
    doc="Incremental view maintenance with retractions: base + insert "
    "delta - retraction delta per group vs direct recompute on the "
    "corrected multiset, including the zeroed-group deletion rule — "
    "the delta-processing contract (merge-associativity q411's "
    "applied form, CDC q197's aggregate layer).",
)
def q462(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("c"), F.sum(cents).cast("bigint").alias("s")
        )

    base = agg(ev.filter(F.dayofmonth("ts") <= 28))
    ins = agg(ev.filter(F.dayofmonth("ts") > 28))
    ret = agg(
        ev.filter((F.dayofmonth("ts") <= 28) & (F.col("event_id") % 97 == 0))
    )
    b = base.select(
        F.col("user_id").alias("ub"), F.col("c").alias("cb"), F.col("s").alias("sb")
    )
    i = ins.select(
        F.col("user_id").alias("ui"), F.col("c").alias("ci"), F.col("s").alias("si")
    )
    r = ret.select(
        F.col("user_id").alias("ur"), F.col("c").alias("cr"), F.col("s").alias("sr")
    )
    inc = (
        b.join(i, F.col("ub") == F.col("ui"), "full")
        .select(
            F.coalesce("ub", "ui").alias("user_id"),
            (F.coalesce("cb", F.lit(0)) + F.coalesce("ci", F.lit(0))).alias("c0"),
            (F.coalesce("sb", F.lit(0)) + F.coalesce("si", F.lit(0))).alias("s0"),
        )
        .join(r, F.col("user_id") == F.col("ur"), "left")
        .select(
            "user_id",
            (F.col("c0") - F.coalesce("cr", F.lit(0))).alias("c"),
            (F.col("s0") - F.coalesce("sr", F.lit(0))).alias("s"),
        )
        # lineage cut: the incremental view feeds live/zeroed/match
        # branches (plan audit: 22 scans un-materialized)
        .localCheckpoint(eager=False)
    )
    direct = agg(
        ev.filter(~((F.dayofmonth("ts") <= 28) & (F.col("event_id") % 97 == 0)))
    )
    direct = direct.localCheckpoint(eager=False)
    n_direct = direct.agg(F.count(F.lit(1)).alias("n_direct"))
    n_live = inc.filter(F.col("c") > 0).agg(F.count(F.lit(1)).alias("n_inc_live"))
    n_zero = inc.filter(F.col("c") == 0).agg(F.count(F.lit(1)).alias("n_zeroed"))
    n_match = (
        inc.join(direct, ["user_id", "c", "s"])
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return (
        n_direct.crossJoin(F.broadcast(n_live))
        .crossJoin(F.broadcast(n_zero))
        .crossJoin(F.broadcast(n_match))
        .select(
            F.col("n_direct").cast("bigint").alias("n_groups_direct"),
            F.col("n_inc_live").cast("bigint").alias("n_groups_incremental"),
            F.col("n_zeroed").cast("bigint").alias("n_groups_zeroed"),
            F.col("n_match").cast("bigint").alias("n_value_matches"),
            (
                (F.col("n_direct") == F.col("n_inc_live"))
                & (F.col("n_match") == F.col("n_direct"))
            ).alias("ivm_consistent"),
        )
    )


# ---------------------------------------------------------------------------
# Q463 — Weiszfeld geometric median (robust 2-D location)
# ---------------------------------------------------------------------------
# The L1-optimal point of (balance, lifetime-spend) customer cloud
# by five unrolled Weiszfeld rounds: m <- sum(p/d) / sum(1/d) with
# d = dist(p, m) + epsilon, starting from the centroid.  Each round
# is one aggregate over the points joined to the current scalar —
# the multivariate robust center beside the coordinatewise median
# (q14) and weighted median (q133).
_Q463_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT ROUND(c.c_acctbal * 100) AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) / 1000.0 AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), m0 AS (
      SELECT AVG(x) AS mx, AVG(y) AS my FROM pts
    ), m1 AS MATERIALIZED (
      SELECT SUM(x / d) / SUM(1 / d) AS mx, SUM(y / d) / SUM(1 / d) AS my
      FROM (SELECT x, y, SQRT((x - m0.mx) * (x - m0.mx)
                              + (y - m0.my) * (y - m0.my)) + 1e-9 AS d
            FROM pts, m0)
    ), m2 AS MATERIALIZED (
      SELECT SUM(x / d) / SUM(1 / d) AS mx, SUM(y / d) / SUM(1 / d) AS my
      FROM (SELECT x, y, SQRT((x - m1.mx) * (x - m1.mx)
                              + (y - m1.my) * (y - m1.my)) + 1e-9 AS d
            FROM pts, m1)
    ), m3 AS MATERIALIZED (
      SELECT SUM(x / d) / SUM(1 / d) AS mx, SUM(y / d) / SUM(1 / d) AS my
      FROM (SELECT x, y, SQRT((x - m2.mx) * (x - m2.mx)
                              + (y - m2.my) * (y - m2.my)) + 1e-9 AS d
            FROM pts, m2)
    ), m4 AS MATERIALIZED (
      SELECT SUM(x / d) / SUM(1 / d) AS mx, SUM(y / d) / SUM(1 / d) AS my
      FROM (SELECT x, y, SQRT((x - m3.mx) * (x - m3.mx)
                              + (y - m3.my) * (y - m3.my)) + 1e-9 AS d
            FROM pts, m3)
    ), m5 AS MATERIALIZED (
      SELECT SUM(x / d) / SUM(1 / d) AS mx, SUM(y / d) / SUM(1 / d) AS my
      FROM (SELECT x, y, SQRT((x - m4.mx) * (x - m4.mx)
                              + (y - m4.my) * (y - m4.my)) + 1e-9 AS d
            FROM pts, m4)
    )
    SELECT ROUND(m5.mx / 100.0 + 5e-8, 2) AS gmedian_balance_usd,
           ROUND(m5.my / 10.0 + 5e-8, 2) AS gmedian_spend_kusd,
           ROUND(m0.mx / 100.0 + 5e-8, 2) AS centroid_balance_usd,
           ROUND(m0.my / 10.0 + 5e-8, 2) AS centroid_spend_kusd
    FROM m5, m0
"""


@register(
    "q463_geometric_median",
    _Q463_ORACLE,
    doc="Weiszfeld geometric median of the (balance, lifetime spend) "
    "cloud: five unrolled rounds of sum(p/d)/sum(1/d) from the "
    "centroid, each one aggregate against the current scalar — the "
    "L1-optimal robust center beside coordinatewise (q14) and "
    "weighted (q133) medians; centroid shown for the outlier pull.",
)
def q463(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .select(F.round(F.col("c_acctbal") * 100).alias("x"), "y")
        .localCheckpoint(eager=False)
    )
    m = pts.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    m0 = m
    for _ in range(5):
        d = (
            F.sqrt(
                (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))
                + (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
            )
            + 1e-9
        )
        m = (
            pts.crossJoin(F.broadcast(m))
            .select("x", "y", d.alias("d"))
            .agg(
                (F.sum(F.col("x") / F.col("d")) / F.sum(1 / F.col("d"))).alias("mx"),
                (F.sum(F.col("y") / F.col("d")) / F.sum(1 / F.col("d"))).alias("my"),
            )
        )
    r2 = lambda col: F.round(col + F.lit(5e-8), 2)  # noqa: E731
    return m.crossJoin(
        F.broadcast(m0.select(F.col("mx").alias("cx"), F.col("my").alias("cy")))
    ).select(
        r2(F.col("mx") / 100.0).alias("gmedian_balance_usd"),
        r2(F.col("my") / 10.0).alias("gmedian_spend_kusd"),
        r2(F.col("cx") / 100.0).alias("centroid_balance_usd"),
        r2(F.col("cy") / 10.0).alias("centroid_spend_kusd"),
    )
