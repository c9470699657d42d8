"""Conformance queries batch #62 (q504+) — Gale-Shapley stable
matching, mRMR feature selection, MNL assortment optimization,
halfspace (Tukey) depth, and E-value sensitivity analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q504 — Gale-Shapley stable matching as a proposal fold
# ---------------------------------------------------------------------------
# Eight supplier groups court eight market groups; proposer
# preferences rank markets by order count, market preferences rank
# suppliers by revenue — two genuinely different orderings.  The
# deferred-acceptance algorithm runs as one fold over 64 proposal
# slots carrying [next-choice pointers (8) | current matches (8)];
# each step the first unmatched proposer advances.  The output joins
# back the rank each side got, and the BLOCKING-PAIR COUNT (must be
# 0) is the stability certificate computed relationally.
def _q504_oracle() -> str:
    # The proposal step needs the chosen proposer THREE times; DuckDB
    # lambdas have no let-binding, so the step is generated with the
    # first-unmatched-proposer search expression inlined wherever
    # needed (engines run identical integer arithmetic).
    find_m = (
        "list_reduce(list_prepend([CAST(-1 AS BIGINT)],"
        " list_transform(generate_series(0, 7), mm -> [CAST(mm AS BIGINT)])),"
        " (b, mm) -> CASE WHEN b[1] >= 0 THEN b"
        " WHEN st[CAST(mm[1] AS INT) + 1] < 8"
        "  AND NOT list_contains(st[9:16], mm[1]) THEN [mm[1]]"
        " ELSE b END)[1]"
    )
    mstar = f"({find_m})"
    wstar = f"mpref[CAST({mstar} * 8 + st[CAST({mstar} AS INT) + 1] AS INT) + 1]"
    cur = f"st[CAST({wstar} AS INT) + 9]"
    accept = (
        f"({cur} = -1 OR wrank[CAST({wstar} * 8 + {mstar} AS INT) + 1]"
        f" < wrank[CAST({wstar} * 8 + {cur} AS INT) + 1])"
    )
    step = (
        f"CASE WHEN {mstar} = -1 THEN st ELSE "
        "list_transform(st, (v, idx) -> CASE "
        f"WHEN idx - 1 = {mstar} THEN v + 1 "
        f"WHEN idx - 9 = {wstar} AND {accept} THEN {mstar} "
        "ELSE v END) END"
    )
    return f"""
    WITH cell AS (
      SELECT CAST(o_custkey % 8 AS BIGINT) AS m,
             CAST(o_orderkey % 8 AS BIGINT) AS w,
             COUNT(*) AS cnt,
             CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ), mp AS MATERIALIZED (
      SELECT m, w, ROW_NUMBER() OVER (PARTITION BY m
                     ORDER BY cnt DESC, w) - 1 AS k
      FROM cell
    ), wr AS MATERIALIZED (
      SELECT w, m, ROW_NUMBER() OVER (PARTITION BY w
                     ORDER BY rev DESC, m) - 1 AS rk
      FROM cell
    ), arrs AS MATERIALIZED (
      SELECT (SELECT list(w ORDER BY m * 8 + k) FROM mp) AS mpref,
             (SELECT list(rk ORDER BY w * 8 + m) FROM wr) AS wrank
    ), gs0 AS (SELECT mpref, wrank FROM arrs
    ), gs AS MATERIALIZED (
      SELECT mpref, wrank,
        list_reduce(
          list_prepend(
            [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0, 0,
             -1, -1, -1, -1, -1, -1, -1, -1],
            list_transform(generate_series(1, 64), z -> [CAST(z AS BIGINT)])),
          (st, z) -> {step}
        ) AS fin
      FROM gs0
    ), matched AS (
      SELECT g.i AS w, gs.fin[g.i + 9] AS m
      FROM gs, generate_series(0, 7) g(i)
    ), blocking AS (
      SELECT COUNT(*) AS n_blocking
      FROM mp pm
      JOIN wr pw ON pw.w = pm.w AND pw.m = pm.m
      JOIN matched wm ON wm.w = pm.w
      JOIN matched mm2 ON mm2.m = pm.m
      JOIN mp cm ON cm.m = pm.m AND cm.w = mm2.w
      JOIN wr cw ON cw.w = pm.w AND cw.m = wm.m
      WHERE pm.k < cm.k AND pw.rk < cw.rk
    )
    SELECT CAST(mt.w AS BIGINT) AS market,
           CAST(mt.m AS BIGINT) AS supplier,
           CAST(pm.k AS BIGINT) AS supplier_choice_rank,
           CAST(pw.rk AS BIGINT) AS market_choice_rank,
           CAST(blocking.n_blocking AS BIGINT) AS blocking_pairs
    FROM matched mt
    JOIN mp pm ON pm.m = mt.m AND pm.w = mt.w
    JOIN wr pw ON pw.w = mt.w AND pw.m = mt.m
    CROSS JOIN blocking
    ORDER BY market
"""


@register(
    "q504_stable_matching",
    _q504_oracle(),
    doc="Gale-Shapley deferred acceptance executed as one fold over "
    "64 proposal slots ([next-choice pointers | matches] "
    "accumulator, first-unmatched-proposer search as an inner "
    "fold); preferences disagree by construction (counts vs "
    "revenue) and the relational blocking-pair count (0) is the "
    "stability certificate — the matching-market algorithm beside "
    "auctions (q416/q496).",
)
def q504(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cell = o.groupBy(
        (F.col("o_custkey") % 8).cast("bigint").alias("m"),
        (F.col("o_orderkey") % 8).cast("bigint").alias("w"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("rev"),
    ).localCheckpoint(eager=False)
    mp = cell.select(
        "m",
        "w",
        (
            F.row_number().over(
                Window.partitionBy("m").orderBy(F.desc("cnt"), "w")
            )
            - 1
        ).alias("k"),
    ).localCheckpoint(eager=False)
    wr = cell.select(
        "w",
        "m",
        (
            F.row_number().over(
                Window.partitionBy("w").orderBy(F.desc("rev"), "m")
            )
            - 1
        ).alias("rk"),
    ).localCheckpoint(eager=False)
    mpref = mp.agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((F.col("m") * 8 + F.col("k")).alias("o"), "w"))
            ),
            lambda s: s.w,
        ).alias("mpref")
    )
    wrank = wr.agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct((F.col("w") * 8 + F.col("m")).alias("o"), "rk")
                )
            ),
            lambda s: s.rk,
        ).alias("wrank")
    )
    arrs = mpref.crossJoin(F.broadcast(wrank))
    neg1 = F.lit(-1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    init = F.array(*([zero] * 8 + [neg1] * 8))

    def find_m(st):
        return F.element_at(
            F.aggregate(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)), lambda mm: mm.cast("bigint")
                ),
                F.array(neg1),
                lambda b, mm: F.when(F.element_at(b, 1) >= 0, b)
                .when(
                    (F.element_at(st, mm.cast("int") + 1) < 8)
                    & ~F.array_contains(F.slice(st, 9, 8), mm),
                    F.array(mm),
                )
                .otherwise(b),
            ),
            1,
        )

    def step(st, z):
        ms = find_m(st)
        ws = F.element_at(
            F.col("mpref"),
            (ms * 8 + F.element_at(st, ms.cast("int") + 1)).cast("int") + 1,
        )
        cur = F.element_at(st, ws.cast("int") + 9)
        accept = (cur == -1) | (
            F.element_at(F.col("wrank"), (ws * 8 + ms).cast("int") + 1)
            < F.element_at(F.col("wrank"), (ws * 8 + cur).cast("int") + 1)
        )
        return F.when(ms == -1, st).otherwise(
            F.transform(
                st,
                lambda v, idx: F.when(idx.cast("bigint") == ms, v + 1)
                .when((idx.cast("bigint") - 8 == ws) & accept, ms)
                .otherwise(v),
            )
        )

    gs = arrs.select(
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(64)), lambda z: F.array(z.cast("bigint"))
            ),
            init,
            step,
        ).alias("fin")
    )
    g = spark.range(0, 8).select(F.col("id").cast("int").alias("wi"))
    matched = gs.crossJoin(F.broadcast(g)).select(
        F.col("wi").cast("bigint").alias("w"),
        F.element_at("fin", F.col("wi") + 9).alias("m"),
    ).localCheckpoint(eager=False)
    # blocking pair (m, w): m strictly prefers w to his match AND w
    # strictly prefers m to hers
    mm2 = matched.select(
        F.col("m").alias("bm"), F.col("w").alias("w_of_m")
    )
    wm = matched.select(F.col("w").alias("bw"), F.col("m").alias("m_of_w"))
    cm = mp.select(
        F.col("m").alias("cmm"), F.col("w").alias("wc"), F.col("k").alias("kc")
    )
    cw = wr.select(
        F.col("w").alias("cww"), F.col("m").alias("mc"), F.col("rk").alias("rc")
    )
    blocking = (
        mp.join(wr, ["m", "w"])
        .join(F.broadcast(mm2), F.col("m") == F.col("bm"))
        .join(F.broadcast(wm), F.col("w") == F.col("bw"))
        .join(
            cm,
            (F.col("m") == F.col("cmm")) & (F.col("w_of_m") == F.col("wc")),
        )
        .join(
            cw,
            (F.col("w") == F.col("cww")) & (F.col("m_of_w") == F.col("mc")),
        )
        .filter((F.col("k") < F.col("kc")) & (F.col("rk") < F.col("rc")))
        .agg(F.count(F.lit(1)).alias("n_blocking"))
    )
    return (
        matched.join(mp, ["m", "w"])
        .join(wr, ["m", "w"])
        .crossJoin(F.broadcast(blocking))
        .select(
            F.col("w").alias("market"),
            F.col("m").alias("supplier"),
            F.col("k").cast("bigint").alias("supplier_choice_rank"),
            F.col("rk").cast("bigint").alias("market_choice_rank"),
            F.col("n_blocking").cast("bigint").alias("blocking_pairs"),
        )
        .orderBy("market")
    )


# ---------------------------------------------------------------------------
# Q505 — mRMR feature selection
# ---------------------------------------------------------------------------
# Four discrete features of orders vs the high-value target: mutual
# informations from joint counts, then three greedy max-relevance
# min-redundancy picks (relevance MI(f, y) minus mean MI to already
# selected) — the feature-selection algorithm on top of the single
# MI statistic (q151).
_Q505_ORACLE = """
    WITH base AS MATERIALIZED (
      SELECT o_orderpriority AS f1, o_orderstatus AS f2,
             CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR) AS f3,
             CAST(NTILE(4) OVER (ORDER BY o_orderkey % 97, o_orderkey)
                  AS VARCHAR) AS f4,
             CASE WHEN o_totalprice > 250000 THEN 'hi' ELSE 'lo' END AS y
      FROM orders
    ), pairs AS MATERIALIZED (
      SELECT a, b, va, vb, cnt FROM (
        SELECT 'f1' AS a, 'y' AS b, f1 AS va, y AS vb, COUNT(*) AS cnt
        FROM base GROUP BY f1, y
        UNION ALL SELECT 'f2', 'y', f2, y, COUNT(*) FROM base GROUP BY f2, y
        UNION ALL SELECT 'f3', 'y', f3, y, COUNT(*) FROM base GROUP BY f3, y
        UNION ALL SELECT 'f4', 'y', f4, y, COUNT(*) FROM base GROUP BY f4, y
        UNION ALL SELECT 'f1', 'f2', f1, f2, COUNT(*) FROM base GROUP BY f1, f2
        UNION ALL SELECT 'f1', 'f3', f1, f3, COUNT(*) FROM base GROUP BY f1, f3
        UNION ALL SELECT 'f1', 'f4', f1, f4, COUNT(*) FROM base GROUP BY f1, f4
        UNION ALL SELECT 'f2', 'f3', f2, f3, COUNT(*) FROM base GROUP BY f2, f3
        UNION ALL SELECT 'f2', 'f4', f2, f4, COUNT(*) FROM base GROUP BY f2, f4
        UNION ALL SELECT 'f3', 'f4', f3, f4, COUNT(*) FROM base GROUP BY f3, f4
      )
    ), tot AS (SELECT SUM(cnt) / 10 AS n FROM pairs
    ), mi AS MATERIALIZED (
      SELECT p.a, p.b,
             SUM((p.cnt / t.n)
                 * LN((p.cnt / t.n)
                      / ((ma.s / t.n) * (mb.s / t.n)))) AS mi
      FROM pairs p, tot t
      JOIN (SELECT a, b, va, SUM(cnt) AS s FROM pairs GROUP BY a, b, va) ma
        ON ma.a = p.a AND ma.b = p.b AND ma.va = p.va
      JOIN (SELECT a, b, vb, SUM(cnt) AS s FROM pairs GROUP BY a, b, vb) mb
        ON mb.a = p.a AND mb.b = p.b AND mb.vb = p.vb
      GROUP BY p.a, p.b
    ), rel AS (SELECT a AS f, mi FROM mi WHERE b = 'y'
    ), red AS (
      SELECT a AS f1, b AS f2, mi FROM mi WHERE b <> 'y'
    ), s1 AS (
      SELECT f, mi AS score FROM rel ORDER BY mi DESC, f LIMIT 1
    ), s2 AS (
      SELECT r.f,
             r.mi - (SELECT mi FROM red
                     WHERE (f1 = r.f AND f2 = (SELECT f FROM s1))
                        OR (f2 = r.f AND f1 = (SELECT f FROM s1))) AS score
      FROM rel r WHERE r.f <> (SELECT f FROM s1)
      ORDER BY score DESC, r.f LIMIT 1
    ), s3 AS (
      SELECT r.f,
             r.mi - (
               (SELECT mi FROM red
                WHERE (f1 = r.f AND f2 = (SELECT f FROM s1))
                   OR (f2 = r.f AND f1 = (SELECT f FROM s1)))
               + (SELECT mi FROM red
                  WHERE (f1 = r.f AND f2 = (SELECT f FROM s2))
                     OR (f2 = r.f AND f1 = (SELECT f FROM s2)))) / 2.0
               AS score
      FROM rel r
      WHERE r.f NOT IN ((SELECT f FROM s1), (SELECT f FROM s2))
      ORDER BY score DESC, r.f LIMIT 1
    )
    SELECT step, f AS feature, ROUND(score + 5e-12, 6) AS mrmr_score
    FROM (
      SELECT 1 AS step, f, score FROM s1
      UNION ALL SELECT 2, f, score FROM s2
      UNION ALL SELECT 3, f, score FROM s3
    ) ORDER BY step
"""


@register(
    "q505_mrmr_features",
    _Q505_ORACLE,
    doc="mRMR feature selection over four discrete order features vs "
    "the high-value target: all MIs from joint counts, then three "
    "greedy picks maximizing relevance minus mean redundancy to the "
    "selected set — the feature-selection loop built on the MI "
    "statistic (q151), fully deterministic.",
)
def q505(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("f1"),
        F.col("o_orderstatus").alias("f2"),
        F.month("o_orderdate").cast("string").alias("f3"),
        F.ntile(4)
        .over(Window.orderBy(F.col("o_orderkey") % 97, F.col("o_orderkey")))
        .cast("string")
        .alias("f4"),
        F.when(F.col("o_totalprice") > 250000, "hi").otherwise("lo").alias("y"),
        # lineage-truncating materialization: ten bucket aggregations +
        # the MI join tree all reference this relation; persist() keeps
        # the full logical plan and the greedy steps re-nest it per
        # reference (plan audit: 441 scans)
    ).localCheckpoint(eager=False)
    feats = ["f1", "f2", "f3", "f4"]
    pairs = None
    for a, b in [(f, "y") for f in feats] + [
        (feats[i], feats[j]) for i in range(4) for j in range(i + 1, 4)
    ]:
        p = base.groupBy(
            F.lit(a).alias("a"),
            F.lit(b).alias("b"),
            F.col(a).alias("va"),
            F.col(b if b != "y" else "y").alias("vb"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        pairs = p if pairs is None else pairs.unionAll(p)
    pairs = pairs.localCheckpoint(eager=False)
    tot = pairs.agg((F.sum("cnt") / 10).alias("n"))
    ma = pairs.groupBy("a", "b", "va").agg(F.sum("cnt").alias("sa"))
    mb = pairs.groupBy("a", "b", "vb").agg(F.sum("cnt").alias("sb"))
    mi = (
        pairs.join(ma, ["a", "b", "va"])
        .join(mb, ["a", "b", "vb"])
        .crossJoin(F.broadcast(tot))
        .groupBy("a", "b")
        .agg(
            F.sum(
                (F.col("cnt") / F.col("n"))
                * F.log(
                    (F.col("cnt") / F.col("n"))
                    / ((F.col("sa") / F.col("n")) * (F.col("sb") / F.col("n")))
                )
            ).alias("mi")
        )
        .localCheckpoint(eager=False)
    )
    rel = mi.filter(F.col("b") == "y").select(F.col("a").alias("f"), "mi")
    red = mi.filter(F.col("b") != "y").select(
        F.col("a").alias("fa"), F.col("b").alias("fb"), F.col("mi").alias("rmi")
    )
    s1 = rel.orderBy(F.desc("mi"), "f").limit(1).select(
        F.lit(1).alias("step"), "f", F.col("mi").alias("score")
    ).localCheckpoint(eager=True)
    s1f = s1.select(F.col("f").alias("sel1"))
    r2_ = (
        rel.crossJoin(F.broadcast(s1f))
        .filter(F.col("f") != F.col("sel1"))
        .join(
            red,
            ((F.col("fa") == F.col("f")) & (F.col("fb") == F.col("sel1")))
            | ((F.col("fb") == F.col("f")) & (F.col("fa") == F.col("sel1"))),
        )
        .select("f", (F.col("mi") - F.col("rmi")).alias("score"))
    )
    s2 = r2_.orderBy(F.desc("score"), "f").limit(1).select(
        F.lit(2).alias("step"), "f", "score"
    ).localCheckpoint(eager=True)
    s2f = s2.select(F.col("f").alias("sel2"))
    r3_ = (
        rel.crossJoin(F.broadcast(s1f))
        .crossJoin(F.broadcast(s2f))
        .filter((F.col("f") != F.col("sel1")) & (F.col("f") != F.col("sel2")))
        .join(
            red.alias("ra"),
            ((F.col("ra.fa") == F.col("f")) & (F.col("ra.fb") == F.col("sel1")))
            | ((F.col("ra.fb") == F.col("f")) & (F.col("ra.fa") == F.col("sel1"))),
        )
        .join(
            red.alias("rb"),
            ((F.col("rb.fa") == F.col("f")) & (F.col("rb.fb") == F.col("sel2")))
            | ((F.col("rb.fb") == F.col("f")) & (F.col("rb.fa") == F.col("sel2"))),
        )
        .select(
            "f",
            (
                F.col("mi") - (F.col("ra.rmi") + F.col("rb.rmi")) / 2.0
            ).alias("score"),
        )
    )
    s3 = r3_.orderBy(F.desc("score"), "f").limit(1).select(
        F.lit(3).alias("step"), "f", "score"
    )
    out = s1.unionAll(s2).unionAll(s3)
    return out.select(
        "step", F.col("f").alias("feature"), r6(F.col("score")).alias("mrmr_score")
    ).orderBy("step")


# ---------------------------------------------------------------------------
# Q506 — assortment optimization under multinomial logit
# ---------------------------------------------------------------------------
# Five top brands with MNL attraction weights from observed purchase
# shares; every nonempty assortment subset (31 bitmasks) is priced
# at expected revenue sum_i p_i w_i / (1 + sum_j w_j) — the discrete-
# choice revenue-management table, showing that bigger assortments
# aren't always better when cheap items cannibalize.
_Q506_ORACLE = """
    WITH b AS MATERIALIZED (
      SELECT p.p_brand AS brand, COUNT(*) AS cnt,
             AVG(l.l_extendedprice) AS price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand ORDER BY cnt DESC, brand LIMIT 5
    ), idx AS MATERIALIZED (
      SELECT brand, cnt, price,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, brand) - 1 AS i
      FROM b
    ), w AS MATERIALIZED (
      SELECT i, brand, price,
             cnt * 1.0 / ((SELECT SUM(cnt) FROM idx) * 0.5) AS wt
      FROM idx
    ), masks AS (
      SELECT g.m FROM generate_series(1, 31) g(m)
    ), rev AS MATERIALIZED (
      SELECT m.m,
             SUM(w.price * w.wt) / (1 + SUM(w.wt)) AS r,
             COUNT(*) AS sz
      FROM masks m JOIN w ON ((m.m >> CAST(w.i AS INT)) & 1) = 1
      GROUP BY m.m
    )
    SELECT CAST(m AS BIGINT) AS subset_mask,
           CAST(sz AS BIGINT) AS n_brands,
           ROUND(r + 5e-8, 2) AS expected_revenue,
           r = (SELECT MAX(r) FROM rev) AS is_optimal
    FROM rev ORDER BY expected_revenue DESC, subset_mask LIMIT 8
"""


@register(
    "q506_assortment_mnl",
    _Q506_ORACLE,
    doc="MNL assortment optimization: attraction weights from "
    "observed brand shares, every nonempty 5-brand subset priced at "
    "sum p_i w_i / (1 + sum w_j) via bitmask fan-out (q426's "
    "machinery), top-8 with the optimum flagged — discrete-choice "
    "revenue management beside reserve pricing (q496).",
)
def q506(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.avg("l_extendedprice").alias("price"),
        )
        .orderBy(F.desc("cnt"), "brand")
        .limit(5)
        # lineage cut: the top-5 frame feeds the index/total/weight
        # chain (plan audit: 16 scans un-materialized)
        .localCheckpoint(eager=True)
    )
    idx = b.select(
        "brand",
        "cnt",
        "price",
        (F.row_number().over(Window.orderBy(F.desc("cnt"), "brand")) - 1).alias(
            "i"
        ),
    )
    totc = idx.agg(F.sum("cnt").alias("tc"))
    w = idx.crossJoin(F.broadcast(totc)).select(
        "i", "price", (F.col("cnt") * 1.0 / (F.col("tc") * 0.5)).alias("wt")
    )
    masks = spark.range(1, 32).select(F.col("id").alias("m"))
    rev = (
        masks.join(
            F.broadcast(w), F.expr("(shiftright(m, CAST(i AS INT)) & 1) = 1")
        )
        .groupBy("m")
        .agg(
            (
                F.sum(F.col("price") * F.col("wt")) / (1 + F.sum("wt"))
            ).alias("r"),
            F.count(F.lit(1)).alias("sz"),
        )
        .localCheckpoint(eager=False)
    )
    best = rev.agg(F.max("r").alias("br"))
    return (
        rev.crossJoin(F.broadcast(best))
        .select(
            F.col("m").cast("bigint").alias("subset_mask"),
            F.col("sz").cast("bigint").alias("n_brands"),
            F.round(F.col("r") + F.lit(5e-8), 2).alias("expected_revenue"),
            (F.col("r") == F.col("br")).alias("is_optimal"),
        )
        .orderBy(F.desc("expected_revenue"), "subset_mask")
        .limit(8)
    )


# ---------------------------------------------------------------------------
# Q507 — halfspace (Tukey) depth by integer directions
# ---------------------------------------------------------------------------
# Depth of each (balance, spend) point = min over 16 INTEGER
# direction vectors of the smaller tail fraction of its projection:
# integer projections keep every rank exact cross-engine (no cos/sin
# ulp risk).  The 10 shallowest points are the depth-based outliers
# — the robust-geometry companion to density LOF (q468) and
# Mahalanobis (q270).
_Q507_DIRS = [
    (1, 0), (0, 1), (1, 1), (1, -1), (2, 1), (1, 2), (2, -1), (1, -2),
    (3, 1), (1, 3), (3, -1), (1, -3), (3, 2), (2, 3), (3, -2), (2, -3),
]

_Q507_ORACLE = f"""
    WITH pts AS MATERIALIZED (
      SELECT c.c_custkey AS id,
             CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x,
             CAST(COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS BIGINT)
               AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal
    ), dirs AS (
      SELECT * FROM (VALUES
        {', '.join(f'({a}, {b}, {i})' for i, (a, b) in enumerate(_Q507_DIRS))}
      ) d(a, b, t)
    ), proj AS MATERIALIZED (
      SELECT p.id, d.t, d.a * p.x + d.b * p.y AS pr
      FROM pts p, dirs d
    ), rk AS MATERIALIZED (
      SELECT id, t,
             (RANK() OVER (PARTITION BY t ORDER BY pr) - 1) * 1.0
               / (COUNT(*) OVER (PARTITION BY t) - 1) AS frac
      FROM proj
    ), depth AS (
      SELECT id, MIN(LEAST(frac, 1 - frac)) AS d FROM rk GROUP BY id
    )
    SELECT CAST(id AS BIGINT) AS custkey,
           ROUND(d + 5e-12, 6) AS depth,
           CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points
    FROM depth ORDER BY ROUND(d + 5e-12, 6), id LIMIT 10
"""


@register(
    "q507_halfspace_depth",
    _Q507_ORACLE,
    doc="Approximate Tukey halfspace depth over 16 integer direction "
    "vectors (exact integer projections — no trig ulp risk): depth "
    "= min tail fraction across directions, 10 shallowest points "
    "as depth-based outliers — the robust-geometry lens beside LOF "
    "(q468) and Mahalanobis (q270).",
)
def q507(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0))
            .cast("bigint")
            .alias("y")
        )
        .select(
            F.col("c_custkey").alias("id"),
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
            "y",
        )
    )
    dirs = spark.createDataFrame(
        [(a, b, i) for i, (a, b) in enumerate(_Q507_DIRS)], "a long, b long, t int"
    )
    proj = pts.crossJoin(F.broadcast(dirs)).select(
        "id", "t", (F.col("a") * F.col("x") + F.col("b") * F.col("y")).alias("pr")
    )
    tw = Window.partitionBy("t")
    rk = proj.select(
        "id",
        "t",
        (
            (F.rank().over(Window.partitionBy("t").orderBy("pr")) - 1)
            * 1.0
            / (F.count(F.lit(1)).over(tw) - 1)
        ).alias("frac"),
    )
    depth = rk.groupBy("id").agg(
        F.min(F.least(F.col("frac"), 1 - F.col("frac"))).alias("d")
    )
    np_ = pts.agg(F.count(F.lit(1)).alias("n_points"))
    return (
        depth.crossJoin(F.broadcast(np_))
        .select(
            F.col("id").cast("bigint").alias("custkey"),
            r6(F.col("d")).alias("depth"),
            F.col("n_points").cast("bigint").alias("n_points"),
        )
        .orderBy("depth", "custkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q508 — E-value sensitivity analysis for unmeasured confounding
# ---------------------------------------------------------------------------
# For three exposure definitions, the risk ratio on the top-quartile
# spend outcome and VanderWeele's E-value RR + sqrt(RR(RR-1)) — how
# strong an unmeasured confounder would have to be (on both arms)
# to explain the association away.  The robustness check that should
# accompany every q481-style adjusted estimate.
_Q508_ORACLE = """
    WITH u AS MATERIALIZED (
      SELECT c.c_custkey,
             CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END AS e1,
             CASE WHEN c.c_nationkey < 10 THEN 1 ELSE 0 END AS e2,
             CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS e3,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS spend
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal, c.c_nationkey, c.c_mktsegment
    ), thr AS (
      SELECT quantile_cont(spend, 0.75) AS q75 FROM u
    ), y AS MATERIALIZED (
      SELECT u.*, CASE WHEN u.spend > t.q75 THEN 1 ELSE 0 END AS y
      FROM u, thr t
    ), rr AS (
      SELECT exposure, p1 / NULLIF(p0, 0) AS rr FROM (
        SELECT 'high_balance' AS exposure,
               AVG(CASE WHEN e1 = 1 THEN y * 1.0 END) AS p1,
               AVG(CASE WHEN e1 = 0 THEN y * 1.0 END) AS p0 FROM y
        UNION ALL
        SELECT 'low_nation', AVG(CASE WHEN e2 = 1 THEN y * 1.0 END),
               AVG(CASE WHEN e2 = 0 THEN y * 1.0 END) FROM y
        UNION ALL
        SELECT 'automobile', AVG(CASE WHEN e3 = 1 THEN y * 1.0 END),
               AVG(CASE WHEN e3 = 0 THEN y * 1.0 END) FROM y
      )
    ), ev AS (
      SELECT exposure, rr,
             CASE WHEN rr >= 1 THEN rr ELSE 1 / rr END AS rr_star
      FROM rr
    )
    SELECT exposure,
           ROUND(rr + 5e-12, 6) AS risk_ratio,
           ROUND(rr_star + SQRT(rr_star * (rr_star - 1)) + 5e-12, 6)
             AS e_value
    FROM ev ORDER BY exposure
"""


@register(
    "q508_evalue_sensitivity",
    _Q508_ORACLE,
    doc="VanderWeele E-values for three exposure definitions on the "
    "top-quartile spend outcome: risk ratios plus "
    "RR* + sqrt(RR*(RR*-1)) — the unmeasured-confounding strength "
    "needed to nullify each association, the robustness companion "
    "to the backdoor adjustment (q481) and IPW (q360).",
)
def q508(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal", "c_nationkey", "c_mktsegment")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "spend"
            )
        )
        .select(
            F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("e1"),
            F.when(F.col("c_nationkey") < 10, 1).otherwise(0).alias("e2"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias(
                "e3"
            ),
            "spend",
        )
        .localCheckpoint(eager=False)
    )
    thr = u.agg(F.percentile("spend", F.lit(0.75)).alias("q75"))
    y = u.crossJoin(F.broadcast(thr)).select(
        "e1",
        "e2",
        "e3",
        F.when(F.col("spend") > F.col("q75"), 1).otherwise(0).alias("y"),
    )

    def arm(e, name):
        return y.agg(
            F.lit(name).alias("exposure"),
            F.avg(F.when(F.col(e) == 1, F.col("y") * 1.0)).alias("p1"),
            F.avg(F.when(F.col(e) == 0, F.col("y") * 1.0)).alias("p0"),
        )

    rr = (
        arm("e1", "high_balance")
        .unionAll(arm("e2", "low_nation"))
        .unionAll(arm("e3", "automobile"))
        .select(
            "exposure",
            (F.col("p1") / F.nullif(F.col("p0"), F.lit(0.0))).alias("rr"),
        )
    )
    rrs = F.when(F.col("rr") >= 1, F.col("rr")).otherwise(1 / F.col("rr"))
    return rr.select(
        "exposure",
        r6(F.col("rr")).alias("risk_ratio"),
        r6(rrs + F.sqrt(rrs * (rrs - 1))).alias("e_value"),
    ).orderBy("exposure")
