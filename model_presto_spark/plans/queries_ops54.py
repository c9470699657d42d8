"""Conformance queries batch #54 (q464+) — bit-parallel subset-sum,
hash-function quality audit, directed triangle motifs, Gorilla
delta-of-delta compression model, and local outlier factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q464 — partition problem by bit-parallel subset-sum
# ---------------------------------------------------------------------------
# Can an order's (mod-8) quantities split into two equal halves?
# The classic DP runs bit-parallel: the reachable-sums SET is one
# BIGINT bitmask, and each item folds in as mask |= mask << q
# (shift done by exact power-of-two multiplication so both engines
# stay in integer arithmetic).  One fold per order, grouped tallies
# out — pseudo-polynomial DP at a bit per state.
_Q464_ORACLE = """
    WITH items AS (
      SELECT l_orderkey AS k,
             list(CAST(l_quantity AS BIGINT) % 8 ORDER BY l_linenumber)
               AS qs
      FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 2 AND 7
    ), dp AS (
      SELECT k, qs,
             list_reduce(
               list_prepend(CAST(1 AS BIGINT), qs),
               (acc, q) -> acc
                 | (acc * ([1, 2, 4, 8, 16, 32, 64, 128])[CAST(q AS INT) + 1])
             ) AS mask,
             list_reduce(list_prepend(CAST(0 AS BIGINT), qs),
                         (a, b) -> a + b) AS t
      FROM items
    ), flag AS (
      SELECT k, len(qs) AS n_items,
             CASE WHEN t % 2 = 0
                   AND (mask // CAST(POW(2, t // 2) AS BIGINT)) % 2 = 1
                  THEN 1 ELSE 0 END AS ok
      FROM dp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(ok) AS BIGINT) AS n_partitionable,
           ROUND(AVG(ok * 1.0) + 5e-12, 6) AS partitionable_frac,
           ROUND(AVG(n_items * 1.0) + 5e-12, 6) AS avg_items
    FROM flag
"""


@register(
    "q464_subset_sum_bitset",
    _Q464_ORACLE,
    doc="Partition-problem feasibility by bit-parallel subset-sum: "
    "per order the reachable-sum set lives in one BIGINT bitmask "
    "folded as mask |= mask << q (shift = exact power-of-two "
    "multiply), even-total + middle-bit test decides — "
    "pseudo-polynomial DP at one bit per state (the bitset trick "
    "beside the DP-as-fold family q439/q444).",
)
def q464(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "l_linenumber",
                            (F.col("l_quantity").cast("bigint") % 8).alias("q"),
                        )
                    )
                ),
                lambda s: s.q,
            ).alias("qs")
        )
        .filter((F.size("qs") >= 2) & (F.size("qs") <= 7))
    )
    pows = F.array(*[F.lit(1 << i).cast("bigint") for i in range(8)])
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    dp = items.select(
        F.size("qs").alias("n_items"),
        F.aggregate(
            F.col("qs"),
            one,
            lambda acc, q: acc.bitwiseOR(
                acc * F.element_at(pows, q.cast("int") + 1)
            ),
        ).alias("mask"),
        F.aggregate(F.col("qs"), zero, lambda a, b: a + b).alias("t"),
    )
    ok = F.when(
        (F.col("t") % 2 == 0)
        & (
            F.floor(
                F.col("mask") / F.pow(F.lit(2.0), F.floor(F.col("t") / 2))
            )
            % 2
            == 1
        ),
        1,
    ).otherwise(0)
    return dp.select("n_items", ok.alias("ok")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("ok").cast("bigint").alias("n_partitionable"),
        r6(F.avg(F.col("ok") * 1.0)).alias("partitionable_frac"),
        r6(F.avg(F.col("n_items") * 1.0)).alias("avg_items"),
    )


# ---------------------------------------------------------------------------
# Q465 — hash-function quality for shuffle bucketing
# ---------------------------------------------------------------------------
# Three hash schemes (raw modulo, multiplicative top-bits, xor-fold)
# over two key populations (dense sequential user ids, and the same
# ids strided by 64 — the pointer-like pattern that breaks modulo):
# per (scheme, keyset), the 64-bucket chi-square imbalance, max
# load factor, and empty-bucket count.  Modulo is perfect on dense
# keys and catastrophic on strided ones; the multiplicative hash is
# the one you shuffle with (skew planner q438's upstream cause).
_Q465_ORACLE = """
    WITH ks AS (
      SELECT DISTINCT user_id AS k, 'dense' AS keyset FROM events
      UNION ALL
      SELECT DISTINCT user_id * 64, 'strided' FROM events
    ), hashed AS (
      SELECT keyset, 'mod64' AS scheme, k % 64 AS b FROM ks
      UNION ALL
      SELECT keyset, 'multiplicative',
             ((k * 2654435761) % 4294967296) // 67108864 FROM ks
      UNION ALL
      SELECT keyset, 'xor_fold',
             xor(xor(k, k // 128), xor(k, k // 128) // 8192) % 64 FROM ks
    ), loads AS (
      SELECT keyset, scheme, b, COUNT(*) AS c
      FROM hashed GROUP BY keyset, scheme, b
    ), agg AS (
      SELECT keyset, scheme, SUM(c) AS n, COUNT(*) AS nonempty,
             MAX(c) AS max_load, SUM(c * c) AS ssq
      FROM loads GROUP BY keyset, scheme
    )
    SELECT keyset, scheme,
           CAST(n AS BIGINT) AS n_keys,
           CAST(64 - nonempty AS BIGINT) AS empty_buckets,
           CAST(max_load AS BIGINT) AS max_load,
           ROUND((ssq - 2 * (n / 64.0) * n + 64 * (n / 64.0) * (n / 64.0))
                 / (n / 64.0) + 5e-10, 4) AS chi2_imbalance
    FROM agg ORDER BY keyset, scheme
"""


@register(
    "q465_hash_quality",
    _Q465_ORACLE,
    doc="Shuffle-hash quality audit: modulo vs multiplicative-top-bits "
    "vs xor-fold over dense and strided-by-64 key populations — "
    "64-bucket chi-square imbalance, max load, empty buckets.  "
    "Modulo is perfect on dense ids and collapses 64x on strided "
    "ones; the root cause the skew planner (q438) sizes around.",
)
def q465(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dense = ev.select(F.col("user_id").alias("k")).distinct().select(
        "k", F.lit("dense").alias("keyset")
    )
    strided = ev.select((F.col("user_id") * 64).alias("k")).distinct().select(
        "k", F.lit("strided").alias("keyset")
    )
    ks = dense.unionAll(strided)
    x1 = F.col("k").bitwiseXOR(F.floor(F.col("k") / 128).cast("bigint"))
    hashed = (
        ks.select("keyset", F.lit("mod64").alias("scheme"), (F.col("k") % 64).alias("b"))
        .unionAll(
            ks.select(
                "keyset",
                F.lit("multiplicative"),
                F.floor(((F.col("k") * 2654435761) % 4294967296) / 67108864),
            )
        )
        .unionAll(
            ks.select(
                "keyset",
                F.lit("xor_fold"),
                (x1.bitwiseXOR(F.floor(x1 / 8192).cast("bigint")) % 64),
            )
        )
    )
    loads = hashed.groupBy("keyset", "scheme", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = loads.groupBy("keyset", "scheme").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nonempty"),
        F.max("c").alias("max_load"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    # chi2 = sum over all 64 buckets (including empties) of (c-e)^2/e
    #      = (ssq - 2 e n + nonempty e^2 + (64-nonempty) e^2) / e
    e = F.col("n") / 64.0
    chi2 = (F.col("ssq") - 2 * e * F.col("n") + 64 * e * e) / e
    return agg.select(
        "keyset",
        "scheme",
        F.col("n").cast("bigint").alias("n_keys"),
        (64 - F.col("nonempty")).cast("bigint").alias("empty_buckets"),
        F.col("max_load").cast("bigint").alias("max_load"),
        F.round(chi2 + F.lit(5e-10), 4).alias("chi2_imbalance"),
    ).orderBy("keyset", "scheme")


# ---------------------------------------------------------------------------
# Q466 — directed triangle motifs: feed-forward vs cycle
# ---------------------------------------------------------------------------
# On the deterministic modulo digraph (custkey%40 -> orderkey%40),
# the two directed triangle species measure very different things:
# feed-forward loops (u->v->w plus shortcut u->w) signal hierarchy,
# 3-cycles signal feedback.  Dyad reciprocity rides along.  Path
# join + closing-edge semijoin, cycles de-duplicated by rotation.
_Q466_ORACLE = """
    WITH e AS (
      SELECT DISTINCT CAST(o_custkey % 40 AS BIGINT) AS u,
             CAST(o_orderkey % 40 AS BIGINT) AS v
      FROM orders WHERE o_custkey % 40 <> o_orderkey % 40
    ), recip AS (
      SELECT COUNT(*) AS r FROM e a
      JOIN e b ON b.u = a.v AND b.v = a.u
    ), paths AS (
      SELECT a.u, a.v, b.v AS w FROM e a
      JOIN e b ON b.u = a.v AND b.v <> a.u
    ), ffl AS (
      SELECT COUNT(*) AS n FROM paths p
      JOIN e c ON c.u = p.u AND c.v = p.w
    ), cyc AS (
      SELECT COUNT(*) AS n FROM paths p
      JOIN e c ON c.u = p.w AND c.v = p.u
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           ROUND(recip.r * 1.0 / (SELECT COUNT(*) FROM e) + 5e-12, 6)
             AS reciprocity,
           CAST(ffl.n AS BIGINT) AS n_ffl,
           CAST(cyc.n / 3 AS BIGINT) AS n_cycles,
           ROUND(ffl.n * 1.0 / NULLIF(cyc.n / 3, 0) + 5e-12, 6)
             AS ffl_per_cycle
    FROM recip, ffl, cyc
"""


@register(
    "q466_directed_motifs",
    _Q466_ORACLE,
    doc="Directed triangle census on the modulo digraph: feed-forward "
    "loops vs 3-cycles (cycles rotation-deduplicated by /3) and "
    "edge reciprocity — hierarchy-vs-feedback structure the "
    "undirected triangle count (q98) can't see.",
)
def q466(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    e = (
        o.select(
            (F.col("o_custkey") % 40).cast("bigint").alias("u"),
            (F.col("o_orderkey") % 40).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    e2 = e.select(F.col("u").alias("bu"), F.col("v").alias("bv"))
    recip = e.join(
        e2, (F.col("bu") == F.col("v")) & (F.col("bv") == F.col("u"))
    ).agg(F.count(F.lit(1)).alias("r"))
    paths = e.join(
        e2, (F.col("bu") == F.col("v")) & (F.col("bv") != F.col("u"))
    ).select("u", "v", F.col("bv").alias("w"))
    e3 = e.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    ffl = paths.join(
        e3, (F.col("cu") == F.col("u")) & (F.col("cv") == F.col("w"))
    ).agg(F.count(F.lit(1)).alias("nf"))
    cyc = paths.join(
        e3, (F.col("cu") == F.col("w")) & (F.col("cv") == F.col("u"))
    ).agg(F.count(F.lit(1)).alias("nc"))
    return (
        ne.crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(ffl))
        .crossJoin(F.broadcast(cyc))
        .select(
            F.col("n_edges").cast("bigint").alias("n_edges"),
            r6(F.col("r") * 1.0 / F.col("n_edges")).alias("reciprocity"),
            F.col("nf").cast("bigint").alias("n_ffl"),
            F.floor(F.col("nc") / 3).cast("bigint").alias("n_cycles"),
            r6(
                F.col("nf") * 1.0 / F.nullif(F.floor(F.col("nc") / 3), F.lit(0))
            ).alias("ffl_per_cycle"),
        )
    )


# ---------------------------------------------------------------------------
# Q467 — Gorilla delta-of-delta timestamp compression model
# ---------------------------------------------------------------------------
# Per-user event timestreams priced under the Gorilla TSDB encoding:
# first point 64 bits, second 27 (first delta), then delta-of-delta
# buckets (0 -> 1 bit, +-63 -> 9, +-255 -> 12, +-2047 -> 16, else
# 36).  Total bits vs raw 64/point gives the compression ratio that
# justifies columnar time encodings — exact integer second deltas.
_Q467_ORACLE = """
    WITH s AS (
      SELECT user_id, epoch_us(ts) // 1000000 AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), d AS (
      SELECT user_id, rn,
             t - LAG(t) OVER (PARTITION BY user_id ORDER BY rn) AS delta
      FROM s
    ), dd AS (
      SELECT user_id, rn, delta,
             delta - LAG(delta) OVER (PARTITION BY user_id ORDER BY rn)
               AS dod
      FROM d
    ), bits AS (
      SELECT CASE
               WHEN rn = 1 THEN 64
               WHEN rn = 2 THEN 27
               WHEN dod = 0 THEN 1
               WHEN dod BETWEEN -63 AND 64 THEN 9
               WHEN dod BETWEEN -255 AND 256 THEN 12
               WHEN dod BETWEEN -2047 AND 2048 THEN 16
               ELSE 36 END AS b,
             CASE WHEN rn > 2 AND dod = 0 THEN 1 ELSE 0 END AS z,
             CASE WHEN rn > 2 THEN 1 ELSE 0 END AS inner_pt
      FROM dd
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) * 64 AS BIGINT) AS raw_bits,
           CAST(SUM(b) AS BIGINT) AS gorilla_bits,
           ROUND(COUNT(*) * 64.0 / SUM(b) + 5e-12, 6) AS compression,
           ROUND(SUM(z) * 1.0 / NULLIF(SUM(inner_pt), 0) + 5e-12, 6)
             AS zero_dod_frac
    FROM bits
"""


@register(
    "q467_gorilla_compression",
    _Q467_ORACLE,
    doc="Gorilla delta-of-delta timestamp encoding priced on per-user "
    "event streams: bucketed dod bit costs (1/9/12/16/36) plus "
    "header bits vs raw 64/point — the TSDB compression model "
    "(varint postings q443's time-series sibling), exact integer "
    "second deltas.",
)
def q467(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).alias("t"),
        F.row_number().over(uw).alias("rn"),
    )
    uw2 = Window.partitionBy("user_id").orderBy("rn")
    d = s.select(
        "user_id", "rn", (F.col("t") - F.lag("t").over(uw2)).alias("delta")
    )
    dd = d.select(
        "rn", (F.col("delta") - F.lag("delta").over(uw2)).alias("dod")
    )
    b = (
        F.when(F.col("rn") == 1, 64)
        .when(F.col("rn") == 2, 27)
        .when(F.col("dod") == 0, 1)
        .when(F.col("dod").between(-63, 64), 9)
        .when(F.col("dod").between(-255, 256), 12)
        .when(F.col("dod").between(-2047, 2048), 16)
        .otherwise(36)
    )
    z = F.when((F.col("rn") > 2) & (F.col("dod") == 0), 1).otherwise(0)
    inner = F.when(F.col("rn") > 2, 1).otherwise(0)
    return dd.select(b.alias("b"), z.alias("z"), inner.alias("inner_pt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        (F.count(F.lit(1)) * 64).cast("bigint").alias("raw_bits"),
        F.sum("b").cast("bigint").alias("gorilla_bits"),
        r6(F.count(F.lit(1)) * 64.0 / F.sum("b")).alias("compression"),
        r6(F.sum("z") * 1.0 / F.nullif(F.sum("inner_pt"), F.lit(0))).alias(
            "zero_dod_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Q468 — local outlier factor on embeddings (density-based)
# ---------------------------------------------------------------------------
# LOF with k = 5 over a deterministic embedding sample: exact kNN by
# squared euclid (norm identity, order-mirrored dot folds), k-dist
# from the rank-5 neighbor, reachability distances, local
# reachability density, and LOF = mean(lrd_neighbor)/lrd_self.
# Ordering ties are cut on vec_id and the final ranking sorts on the
# ROUNDED score so near-ties stay deterministic cross-engine.
_Q468_ORACLE = """
    WITH e AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> CAST(x AS DOUBLE)
                                              * CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS nn
      FROM embeddings WHERE vec_id % 4 = 0
    ), pd AS MATERIALIZED (
      SELECT a.vec_id AS i, b.vec_id AS j,
             a.nn + b.nn
               - 2 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, 64),
                                  g -> a.v[g] * b.v[g])), (x, y) -> x + y)
               AS d2
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
    ), knn AS MATERIALIZED (
      SELECT i, j, d2,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY d2, j) AS rk
      FROM pd
    ), kdist AS MATERIALIZED (
      SELECT i, d2 AS kd FROM knn WHERE rk = 5
    ), lrd AS MATERIALIZED (
      SELECT n.i,
             5.0 / SUM(SQRT(GREATEST(kb.kd, n.d2))) AS lrd
      FROM knn n JOIN kdist kb ON kb.i = n.j
      WHERE n.rk <= 5 GROUP BY n.i
    ), lof AS (
      SELECT n.i, AVG(lb.lrd) / la.lrd AS lof
      FROM knn n
      JOIN lrd la ON la.i = n.i
      JOIN lrd lb ON lb.i = n.j
      WHERE n.rk <= 5 GROUP BY n.i, la.lrd
    )
    SELECT l.i AS vec_id,
           ROUND(l.lof + 5e-12, 6) AS lof,
           ROUND(SQRT(k.kd) + 5e-12, 6) AS k_distance
    FROM lof l JOIN kdist k ON k.i = l.i
    ORDER BY ROUND(l.lof + 5e-12, 6) DESC, l.i LIMIT 10
"""


@register(
    "q468_lof",
    _Q468_ORACLE,
    doc="Local outlier factor (k = 5) over a deterministic embedding "
    "sample: exact kNN via the norm identity, reachability "
    "distances max(kdist(j), d(i,j)), lrd and LOF ratios; top-10 "
    "ordered on the ROUNDED score for cross-engine tie stability — "
    "the density-based outlier family beside Mahalanobis (q270) "
    "and MAD (q96).",
)
def q468(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .select(
            "vec_id",
            "v",
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            ).alias("nn"),
        )
    )
    a = emb.select(
        F.col("vec_id").alias("i"), F.col("v").alias("va"), F.col("nn").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("j"), F.col("v").alias("vb"), F.col("nn").alias("nb")
    )
    pd = (
        a.join(F.broadcast(b), F.col("i") != F.col("j"))
        .select(
            "i",
            "j",
            (
                F.col("na")
                + F.col("nb")
                - 2
                * F.aggregate(
                    F.zip_with("va", "vb", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda x, y: x + y,
                )
            ).alias("d2"),
        )
    )
    knn = pd.select(
        "i",
        "j",
        "d2",
        F.row_number().over(Window.partitionBy("i").orderBy("d2", "j")).alias("rk"),
    ).localCheckpoint(eager=False)
    kdist = knn.filter(F.col("rk") == 5).select("i", F.col("d2").alias("kd"))
    kb = kdist.select(F.col("i").alias("j"), F.col("kd").alias("kd_j"))
    lrd = (
        knn.filter(F.col("rk") <= 5)
        .join(F.broadcast(kb), "j")
        .groupBy("i")
        .agg((5.0 / F.sum(F.sqrt(F.greatest(F.col("kd_j"), F.col("d2"))))).alias("lrd"))
    )
    la = lrd.select(F.col("i"), F.col("lrd").alias("lrd_i"))
    lb = lrd.select(F.col("i").alias("j"), F.col("lrd").alias("lrd_j"))
    lof = (
        knn.filter(F.col("rk") <= 5)
        .join(F.broadcast(la), "i")
        .join(F.broadcast(lb), "j")
        .groupBy("i", "lrd_i")
        .agg((F.avg("lrd_j") / F.first("lrd_i")).alias("lof"))
    )
    return (
        lof.join(kdist, "i")
        .select(
            F.col("i").alias("vec_id"),
            r6(F.col("lof")).alias("lof"),
            r6(F.sqrt(F.col("kd"))).alias("k_distance"),
        )
        .orderBy(F.desc("lof"), "vec_id")
        .limit(10)
    )
