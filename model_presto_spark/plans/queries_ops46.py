"""Conformance queries batch #46 (q424+) — LRU stack-distance
profile, secretary-rule replay, Banzhaf voting power, RBF-kernel
MMD two-sample test, and successive-halving search replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q424 — LRU stack-distance profile (Bennett-Kruskal counting)
# ---------------------------------------------------------------------------
# Reuse distance of an access = number of DISTINCT keys touched
# between consecutive accesses of the same key; LRU of capacity C
# hits iff distance < C.  The distinct-count collapses to a plain
# count with the Bennett-Kruskal trick: key k's access at position j
# is the last one inside the window (p, i) iff its NEXT access is
# >= i — so every (window, contributing access) pair is a row of a
# range join, no COUNT DISTINCT needed.  The Spark side chunks the
# range join on fixed-width position blocks (explode the block span,
# equi-join on block, exact-filter) — the 100 TB shape; the oracle
# uses DuckDB's native inequality join.
_Q424_ORACLE = """
    WITH a AS (
      SELECT user_id,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS i
      FROM events WHERE EXTRACT(day FROM ts) <= 7
    ), nx AS (
      SELECT user_id, i,
             LAG(i)  OVER (PARTITION BY user_id ORDER BY i) AS pi,
             LEAD(i) OVER (PARTITION BY user_id ORDER BY i) AS ni
      FROM a
    ), win AS (
      SELECT i, pi FROM nx WHERE pi IS NOT NULL
    ), sd AS (
      SELECT w.i, COUNT(c.i) AS d
      FROM win w LEFT JOIN nx c
        ON c.i > w.pi AND c.i < w.i AND (c.ni IS NULL OR c.ni >= w.i)
      GROUP BY w.i
    ), tot AS (
      SELECT (SELECT COUNT(*) FROM a) AS n_acc,
             (SELECT COUNT(*) FROM nx WHERE pi IS NULL) AS n_cold
    )
    SELECT CAST(tot.n_acc AS BIGINT) AS n_accesses,
           CAST(tot.n_cold AS BIGINT) AS n_cold,
           ROUND(SUM(CASE WHEN d < 8 THEN 1 ELSE 0 END) * 1.0 / tot.n_acc
                 + 5e-12, 6) AS hit_rate_8,
           ROUND(SUM(CASE WHEN d < 32 THEN 1 ELSE 0 END) * 1.0 / tot.n_acc
                 + 5e-12, 6) AS hit_rate_32,
           ROUND(SUM(CASE WHEN d < 128 THEN 1 ELSE 0 END) * 1.0 / tot.n_acc
                 + 5e-12, 6) AS hit_rate_128,
           ROUND(AVG(d * 1.0) + 5e-12, 6) AS mean_reuse_dist
    FROM sd, tot GROUP BY tot.n_acc, tot.n_cold
"""

_Q424_BLOCK = 64


@register(
    "q424_stack_distance",
    _Q424_ORACLE,
    doc="Mattson LRU stack-distance profile with hit rates at "
    "capacities 8/32/128: Bennett-Kruskal last-access trick turns "
    "the distinct-count into a range-join count, chunked on fixed "
    "position blocks so the non-equi join is an equi-join on block "
    "id — cache-planning analysis as relational ops.",
)
def q424(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.layout import ordered_positions

    ev = _t(spark, sf_dir, "events").filter(F.dayofmonth("ts") <= 7)
    # global trace positions WITHOUT the single-task global window:
    # bucketed by calendar day (monotone in the ts leading key) —
    # layout.ordered_positions; a raw event stream is exactly the
    # relation that must never funnel through one sorter
    a = (
        ordered_positions(
            ev.select("user_id", "ts", "event_id"),
            ["ts", "event_id"],
            F.to_date("ts"),
            pos_col="i",
        )
        .select("user_id", "i")
        # lineage cut: the positioned trace feeds the per-user window,
        # the window list, and the totals — without it the bucketed
        # position machinery reruns per branch
        .localCheckpoint(eager=False)
    )
    uw = Window.partitionBy("user_id").orderBy("i")
    nx = a.select(
        "i",
        F.lag("i").over(uw).alias("pi"),
        F.lead("i").over(uw).alias("ni"),
    )
    win = nx.filter(F.col("pi").isNotNull()).select("i", "pi")
    blk = F.lit(_Q424_BLOCK)
    # windows exploded over their covered block span
    wb = win.select(
        "i",
        "pi",
        F.explode_outer(
            F.sequence(F.floor(F.col("pi") / blk), F.floor(F.col("i") / blk))
        ).alias("b"),
    )
    # contributing accesses (last-in-window representatives) by block
    cb = nx.select(
        F.col("i").alias("j"),
        F.col("ni").alias("nj"),
        F.floor(F.col("i") / blk).alias("b"),
    )
    pairs = wb.join(cb, "b").filter(
        (F.col("j") > F.col("pi"))
        & (F.col("j") < F.col("i"))
        & (F.col("nj").isNull() | (F.col("nj") >= F.col("i")))
    )
    sd = win.join(
        pairs.groupBy("i").agg(F.count(F.lit(1)).alias("d")), "i", "left"
    ).select("i", F.coalesce("d", F.lit(0)).alias("d"))
    tot = a.agg(F.count(F.lit(1)).alias("n_acc")).crossJoin(
        nx.filter(F.col("pi").isNull()).agg(F.count(F.lit(1)).alias("n_cold"))
    )
    return sd.crossJoin(F.broadcast(tot)).groupBy("n_acc", "n_cold").agg(
        r6(
            F.sum(F.when(F.col("d") < 8, 1).otherwise(0)) * 1.0 / F.first("n_acc")
        ).alias("hit_rate_8"),
        r6(
            F.sum(F.when(F.col("d") < 32, 1).otherwise(0)) * 1.0 / F.first("n_acc")
        ).alias("hit_rate_32"),
        r6(
            F.sum(F.when(F.col("d") < 128, 1).otherwise(0)) * 1.0 / F.first("n_acc")
        ).alias("hit_rate_128"),
        r6(F.avg(F.col("d") * 1.0)).alias("mean_reuse_dist"),
    ).select(
        F.col("n_acc").cast("bigint").alias("n_accesses"),
        F.col("n_cold").cast("bigint").alias("n_cold"),
        "hit_rate_8",
        "hit_rate_32",
        "hit_rate_128",
        "mean_reuse_dist",
    )


# ---------------------------------------------------------------------------
# Q425 — secretary-rule (1/e optimal stopping) replay
# ---------------------------------------------------------------------------
# Replay the 37% rule over each customer's date-ordered orders:
# observe the first floor(n/e) prices, then take the first later
# order beating that threshold (forced to the last order if none
# does).  Success = the chosen order carries the customer's maximum
# price.  Everything is per-partition window arithmetic; success
# should land near the theoretical 1/e ~ 0.37 for mid-size n.
_Q425_ORACLE = """
    WITH o AS (
      SELECT o_custkey AS c, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS pos,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n,
             MAX(ROUND(o_totalprice * 100)) OVER (PARTITION BY o_custkey)
               AS best
      FROM orders
    ), oo AS (
      SELECT *, GREATEST(1, CAST(FLOOR(n * 0.367879441) AS BIGINT)) AS r
      FROM o WHERE n >= 5
    ), thr AS (
      SELECT c, MAX(CASE WHEN pos <= r THEN v END) AS t,
             MAX(n) AS n, MAX(r) AS r, MAX(best) AS best
      FROM oo GROUP BY c
    ), pick AS (
      SELECT oo.c,
             MIN(CASE WHEN oo.pos > thr.t_r AND oo.v > thr.t THEN oo.pos END)
               AS first_beat
      FROM (SELECT c, t, r AS t_r FROM thr) thr
      JOIN oo ON oo.c = thr.c
      GROUP BY oo.c
    ), chosen AS (
      SELECT t.c, t.n, t.best,
             COALESCE(p.first_beat, t.n) AS cpos,
             p.first_beat IS NULL AS forced
      FROM thr t JOIN pick p ON p.c = t.c
    ), res AS (
      SELECT ch.c, ch.forced,
             CASE WHEN oo.v = ch.best THEN 1 ELSE 0 END AS success
      FROM chosen ch JOIN oo
        ON oo.c = ch.c AND oo.pos = ch.cpos
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(success * 1.0) + 5e-12, 6) AS success_rate,
           ROUND(AVG(CASE WHEN forced THEN 1.0 ELSE 0.0 END) + 5e-12, 6)
             AS forced_rate
    FROM res
"""


@register(
    "q425_secretary_replay",
    _Q425_ORACLE,
    doc="Optimal-stopping (37% rule) replay over date-ordered customer "
    "orders: per-partition observe/threshold/first-beat windows, "
    "forced fallback to the last candidate, value-success against "
    "the partition max — sequential decision policy as window "
    "algebra (policy replay q379's stopping-rule sibling).",
)
def q425(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    pw = Window.partitionBy("c")
    o = od.select(
        F.col("o_custkey").alias("c"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n"),
        F.max(F.round(F.col("o_totalprice") * 100))
        .over(Window.partitionBy("o_custkey"))
        .alias("best"),
    )
    oo = o.filter(F.col("n") >= 5).withColumn(
        "r", F.greatest(F.lit(1), F.floor(F.col("n") * 0.367879441)).cast("bigint")
    )
    thr = oo.groupBy("c").agg(
        F.max(F.when(F.col("pos") <= F.col("r"), F.col("v"))).alias("t"),
        F.max("n").alias("n"),
        F.max("r").alias("r"),
        F.max("best").alias("best"),
    )
    pick = (
        oo.join(thr.select("c", F.col("t").alias("tt"), F.col("r").alias("rr")), "c")
        .groupBy("c")
        .agg(
            F.min(
                F.when(
                    (F.col("pos") > F.col("rr")) & (F.col("v") > F.col("tt")),
                    F.col("pos"),
                )
            ).alias("first_beat")
        )
    )
    chosen = thr.join(pick, "c").select(
        "c",
        "best",
        F.coalesce("first_beat", "n").alias("cpos"),
        F.col("first_beat").isNull().alias("forced"),
    )
    res = chosen.join(
        oo.select("c", "pos", "v"),
        (chosen.c == oo.c) & (chosen.cpos == oo.pos),
    ).select(
        "forced", F.when(F.col("v") == F.col("best"), 1).otherwise(0).alias("success")
    )
    return res.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        r6(F.avg(F.col("success") * 1.0)).alias("success_rate"),
        r6(F.avg(F.when(F.col("forced"), 1.0).otherwise(0.0))).alias("forced_rate"),
    )


# ---------------------------------------------------------------------------
# Q426 — Banzhaf voting power (coalition enumeration)
# ---------------------------------------------------------------------------
# Nations 0-11 as weighted voters (weight = customer count), quota =
# strict majority.  The Banzhaf index counts, for each player, the
# coalitions where joining flips loss to win: enumerate all 4096
# bitmask coalitions relationally (range x bit test), aggregate
# coalition weight, and count swings — cooperative game power as a
# fan-out + two joins (the enumeration sibling of Shapley q310).
_Q426_ORACLE = """
    WITH w AS (
      SELECT c_nationkey AS p, CAST(COUNT(*) AS BIGINT) AS wt
      FROM customer WHERE c_nationkey < 12 GROUP BY c_nationkey
    ), q AS (
      SELECT CAST(FLOOR(SUM(wt) / 2) + 1 AS BIGINT) AS quota FROM w
    ), masks AS (
      SELECT g.m FROM generate_series(0, 4095) g(m)
    ), cw AS (
      SELECT m.m, COALESCE(SUM(w.wt), 0) AS cwt
      FROM masks m LEFT JOIN w ON ((m.m >> w.p) & 1) = 1
      GROUP BY m.m
    ), swing AS (
      SELECT w.p, w.wt, COUNT(*) AS swings
      FROM w JOIN cw ON ((cw.m >> w.p) & 1) = 0
      JOIN q ON cw.cwt < q.quota AND cw.cwt + w.wt >= q.quota
      GROUP BY w.p, w.wt
    )
    SELECT s.p AS player, s.wt AS weight,
           CAST(s.swings AS BIGINT) AS swings,
           ROUND(s.swings * 1.0 / (SELECT SUM(swings) FROM swing) + 5e-12, 6)
             AS banzhaf_index,
           ROUND(s.wt * 1.0 / (SELECT SUM(wt) FROM w) + 5e-12, 6)
             AS weight_share
    FROM swing s ORDER BY s.p
"""


@register(
    "q426_banzhaf_power",
    _Q426_ORACLE,
    doc="Normalized Banzhaf power index for 12 weighted voters: 4096 "
    "coalition bitmasks generated relationally, coalition weights by "
    "bit-test join, swing counting against the majority quota — "
    "shows voting power diverging from weight share.",
)
def q426(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    w = c.groupBy(F.col("c_nationkey").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("wt")
    )
    q = w.agg((F.floor(F.sum("wt") / 2) + 1).cast("bigint").alias("quota"))
    masks = spark.range(0, 4096).select(F.col("id").alias("m"))
    cw = (
        masks.join(
            F.broadcast(w),
            F.expr("(shiftright(m, CAST(p AS INT)) & 1) = 1"),
            "left",
        )
        .groupBy("m")
        .agg(F.coalesce(F.sum("wt"), F.lit(0)).alias("cwt"))
    )
    swing = (
        w.crossJoin(F.broadcast(q))
        .join(
            cw,
            F.expr("(shiftright(m, CAST(p AS INT)) & 1) = 0")
            & (F.col("cwt") < F.col("quota"))
            & (F.col("cwt") + F.col("wt") >= F.col("quota")),
        )
        .groupBy("p", "wt")
        .agg(F.count(F.lit(1)).alias("swings"))
    )
    tot = swing.agg(F.sum("swings").alias("tsw")).crossJoin(
        w.agg(F.sum("wt").alias("twt"))
    )
    return (
        swing.crossJoin(F.broadcast(tot))
        .select(
            F.col("p").alias("player"),
            F.col("wt").alias("weight"),
            F.col("swings").cast("bigint").alias("swings"),
            r6(F.col("swings") * 1.0 / F.col("tsw")).alias("banzhaf_index"),
            r6(F.col("wt") * 1.0 / F.col("twt")).alias("weight_share"),
        )
        .orderBy("player")
    )


# ---------------------------------------------------------------------------
# Q427 — RBF-kernel MMD two-sample test on embeddings
# ---------------------------------------------------------------------------
# Biased MMD^2 between label-0 and label-1 embedding samples with a
# fixed-bandwidth Gaussian kernel (gamma = 1/d): the embedding-space
# distribution-shift statistic next to the 1-D tests (KS q147,
# AD q393, Wasserstein q247).  Kernel values come from the norm
# identity ||x-y||^2 = ||x||^2 + ||y||^2 - 2<x,y>; dots are left
# folds over double-cast components so both engines accumulate in
# the same order.
_Q427_ORACLE = """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE label IN (0, 1)
    ), n AS (
      SELECT vec_id, label, v,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(v, x -> x * x)), (a, b) -> a + b) AS nn
      FROM e
    ), k AS (
      SELECT a.label AS la, b.label AS lb,
             EXP(-(a.nn + b.nn
                   - 2 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(generate_series(1, 64),
                                      i -> a.v[i] * b.v[i])),
                       (x, y) -> x + y))
                 / 64.0) AS kv
      FROM n a JOIN n b ON a.vec_id <> b.vec_id OR a.label <> b.label
    ), mk AS (
      SELECT SUM(CASE WHEN la = 0 AND lb = 0 THEN kv END)
               / NULLIF(SUM(CASE WHEN la = 0 AND lb = 0 THEN 1 END), 0) AS k00,
             SUM(CASE WHEN la = 1 AND lb = 1 THEN kv END)
               / NULLIF(SUM(CASE WHEN la = 1 AND lb = 1 THEN 1 END), 0) AS k11,
             SUM(CASE WHEN la <> lb THEN kv END)
               / NULLIF(SUM(CASE WHEN la <> lb THEN 1 END), 0) AS k01
      FROM k
    ), cnt AS (
      SELECT SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1
      FROM e
    )
    SELECT CAST(cnt.n0 AS BIGINT) AS n0, CAST(cnt.n1 AS BIGINT) AS n1,
           ROUND(mk.k00 + 5e-12, 6) AS mean_k00,
           ROUND(mk.k11 + 5e-12, 6) AS mean_k11,
           ROUND(mk.k01 + 5e-12, 6) AS mean_k01,
           ROUND(mk.k00 + mk.k11 - 2 * mk.k01 + 5e-12, 6) AS mmd2
    FROM mk, cnt
"""


@register(
    "q427_mmd_two_sample",
    _Q427_ORACLE,
    doc="Biased RBF-kernel MMD^2 between label-0/label-1 embedding "
    "samples (gamma = 1/64, off-diagonal pairs): the multivariate "
    "two-sample shift statistic for embedding-space corpus "
    "monitoring — norm-identity kernel, order-mirrored dot folds.",
)
def q427(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("label").isin(0, 1))
        .select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    n = e.select(
        "vec_id",
        "label",
        "v",
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        ).alias("nn"),
    )
    a = n.select(
        F.col("vec_id").alias("ida"),
        F.col("label").alias("la"),
        F.col("v").alias("va"),
        F.col("nn").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("idb"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        F.col("nn").alias("nb"),
    )
    k = a.join(
        F.broadcast(b),
        (F.col("ida") != F.col("idb")) | (F.col("la") != F.col("lb")),
    ).select(
        "la",
        "lb",
        F.exp(
            -(
                F.col("na")
                + F.col("nb")
                - 2
                * F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda x, y: x + y,
                )
            )
            / F.lit(64.0)
        ).alias("kv"),
    )
    mk = k.agg(
        (
            F.sum(F.when((F.col("la") == 0) & (F.col("lb") == 0), F.col("kv")))
            / F.sum(F.when((F.col("la") == 0) & (F.col("lb") == 0), 1))
        ).alias("k00"),
        (
            F.sum(F.when((F.col("la") == 1) & (F.col("lb") == 1), F.col("kv")))
            / F.sum(F.when((F.col("la") == 1) & (F.col("lb") == 1), 1))
        ).alias("k11"),
        (
            F.sum(F.when(F.col("la") != F.col("lb"), F.col("kv")))
            / F.sum(F.when(F.col("la") != F.col("lb"), 1))
        ).alias("k01"),
    )
    cnt = e.agg(
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("n1"),
    )
    return mk.crossJoin(F.broadcast(cnt)).select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        r6(F.col("k00")).alias("mean_k00"),
        r6(F.col("k11")).alias("mean_k11"),
        r6(F.col("k01")).alias("mean_k01"),
        r6(F.col("k00") + F.col("k11") - 2 * F.col("k01")).alias("mmd2"),
    )


# ---------------------------------------------------------------------------
# Q428 — successive-halving search replay
# ---------------------------------------------------------------------------
# Arms = (nation, segment) customer cells; the score at rung r is
# the mean balance of the cell's first 8*2^r customers by key (more
# budget = larger evaluation sample).  Rungs 0-3 each keep the top
# half of survivors by (score, arm) — four unrolled rank/filter
# stages over one prefix-aggregated relation, with the per-rung
# budget accounting that makes the bandit-style search auditable.
_Q428_ORACLE = """
    WITH cell AS (
      SELECT c_nationkey * 10 + (CASE c_mktsegment
               WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
               WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
               ELSE 4 END) AS arm,
             ROUND(c_acctbal * 100) AS v,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
                                ORDER BY c_custkey) AS rn
      FROM customer
    ), sc AS (
      SELECT arm,
             SUM(CASE WHEN rn <= 8  THEN v END)
               / NULLIF(SUM(CASE WHEN rn <= 8  THEN 1 END), 0) AS s0,
             SUM(CASE WHEN rn <= 16 THEN v END)
               / NULLIF(SUM(CASE WHEN rn <= 16 THEN 1 END), 0) AS s1,
             SUM(CASE WHEN rn <= 32 THEN v END)
               / NULLIF(SUM(CASE WHEN rn <= 32 THEN 1 END), 0) AS s2,
             SUM(CASE WHEN rn <= 64 THEN v END)
               / NULLIF(SUM(CASE WHEN rn <= 64 THEN 1 END), 0) AS s3,
             SUM(CASE WHEN rn <= 8  THEN 1 ELSE 0 END) AS b0,
             SUM(CASE WHEN rn <= 16 THEN 1 ELSE 0 END) AS b1,
             SUM(CASE WHEN rn <= 32 THEN 1 ELSE 0 END) AS b2,
             SUM(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS b3
      FROM cell GROUP BY arm
    ), r0 AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY s0 DESC, arm) AS rk,
             COUNT(*) OVER () AS nn
      FROM sc
    ), r1 AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY s1 DESC, arm) AS rk1,
             COUNT(*) OVER () AS nn1
      FROM r0 WHERE rk <= CAST(CEIL(nn / 2.0) AS BIGINT)
    ), r2 AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY s2 DESC, arm) AS rk2,
             COUNT(*) OVER () AS nn2
      FROM r1 WHERE rk1 <= CAST(CEIL(nn1 / 2.0) AS BIGINT)
    ), r3 AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY s3 DESC, arm) AS rk3
      FROM r2 WHERE rk2 <= CAST(CEIL(nn2 / 2.0) AS BIGINT)
    ), summary AS (
      SELECT 0 AS rung, COUNT(*) AS n_arms, SUM(b0) AS budget,
             MIN(CASE WHEN rk = 1 THEN arm END) AS best_arm,
             MAX(s0) AS best_score FROM r0
      UNION ALL
      SELECT 1, COUNT(*), SUM(b1),
             MIN(CASE WHEN rk1 = 1 THEN arm END), MAX(s1) FROM r1
      UNION ALL
      SELECT 2, COUNT(*), SUM(b2),
             MIN(CASE WHEN rk2 = 1 THEN arm END), MAX(s2) FROM r2
      UNION ALL
      SELECT 3, COUNT(*), SUM(b3),
             MIN(CASE WHEN rk3 = 1 THEN arm END), MAX(s3) FROM r3
    )
    SELECT rung, CAST(n_arms AS BIGINT) AS n_arms,
           CAST(budget AS BIGINT) AS budget,
           CAST(best_arm AS BIGINT) AS best_arm,
           ROUND(best_score / 100.0 + 5e-10, 4) AS best_score_usd
    FROM summary ORDER BY rung
"""


@register(
    "q428_successive_halving",
    _Q428_ORACLE,
    doc="Successive-halving replay over (nation, segment) arms: "
    "prefix-sample mean scores at doubling budgets 8/16/32/64, "
    "top-half survival by (score, arm) per rung, per-rung budget "
    "accounting — the hyperparameter-search schedule as four "
    "unrolled rank/filter stages (learning curve q391's allocator).",
)
def q428(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 0)
        .when(F.col("c_mktsegment") == "BUILDING", 1)
        .when(F.col("c_mktsegment") == "FURNITURE", 2)
        .when(F.col("c_mktsegment") == "HOUSEHOLD", 3)
        .otherwise(4)
    )
    cell = c.select(
        (F.col("c_nationkey") * 10 + seg).alias("arm"),
        F.round(F.col("c_acctbal") * 100).alias("v"),
        F.row_number()
        .over(
            Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("c_custkey")
        )
        .alias("rn"),
    )

    def pref(cap: int, tag: str):
        return [
            (
                F.sum(F.when(F.col("rn") <= cap, F.col("v")))
                / F.sum(F.when(F.col("rn") <= cap, 1))
            ).alias(f"s{tag}"),
            F.sum(F.when(F.col("rn") <= cap, 1).otherwise(0)).alias(f"b{tag}"),
        ]

    sc = cell.groupBy("arm").agg(
        *(pref(8, "0") + pref(16, "1") + pref(32, "2") + pref(64, "3"))
    )
    r0 = sc.select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("s0"), "arm")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    )
    r1 = r0.filter(F.col("rk") <= F.ceil(F.col("nn") / 2.0)).select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("s1"), "arm")).alias("rk1"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn1"),
    )
    r2 = r1.filter(F.col("rk1") <= F.ceil(F.col("nn1") / 2.0)).select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("s2"), "arm")).alias("rk2"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn2"),
    )
    r3 = r2.filter(F.col("rk2") <= F.ceil(F.col("nn2") / 2.0)).select(
        "*",
        F.row_number().over(Window.orderBy(F.desc("s3"), "arm")).alias("rk3"),
    )

    def rung(df, idx: int, rk: str, s: str, b: str):
        return df.agg(
            F.lit(idx).alias("rung"),
            F.count(F.lit(1)).cast("bigint").alias("n_arms"),
            F.sum(b).cast("bigint").alias("budget"),
            F.min(F.when(F.col(rk) == 1, F.col("arm"))).cast("bigint").alias(
                "best_arm"
            ),
            F.round(F.max(s) / 100.0 + 5e-10, 4).alias("best_score_usd"),
        )

    out = (
        rung(r0, 0, "rk", "s0", "b0")
        .unionAll(rung(r1, 1, "rk1", "s1", "b1"))
        .unionAll(rung(r2, 2, "rk2", "s2", "b2"))
        .unionAll(rung(r3, 3, "rk3", "s3", "b3"))
    )
    return out.orderBy("rung")
