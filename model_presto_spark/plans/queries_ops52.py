"""Conformance queries batch #52 (q454+) — hand-built HyperLogLog,
Merkle-tree diff localization, Z-order layout locality, Erlang-C
capacity planning, and the Wilcoxon signed-rank test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q454 — HyperLogLog built relationally, error vs register count
# ---------------------------------------------------------------------------
# The sketch rebuilt from first principles on o_custkey: one
# multiplicative 32-bit hash, registers = hash mod m, rank of the
# remaining bits via the binary-string length trick (27 - len(bin w)
# — no float log2 edge cases), harmonic-mean estimate with the
# small-range linear-counting correction, for m in {16, 64, 256}.
# 2^-rho sums are exact in binary floating point, so both engines
# agree bit-for-bit; the error-vs-m table is the 1.04/sqrt(m) law.
_Q454_ORACLE = """
    WITH h AS (
      SELECT DISTINCT (o_custkey * 2654435761) % 4294967296 AS hv
      FROM orders
    ), ex AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_n FROM orders
    ), reg AS (
      SELECT m.m, hv % m.m AS r,
             MAX(CASE WHEN hv // m.m = 0 THEN 27
                 ELSE 27 - length(bin(hv // m.m)) END) AS rho
      FROM h, (VALUES (16), (64), (256)) m(m)
      GROUP BY m.m, hv % m.m
    ), est AS (
      SELECT m, COUNT(*) AS v_nonzero, SUM(POW(2.0, -rho)) AS s,
             SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS dummy
      FROM reg GROUP BY m
    ), raw AS (
      SELECT m, v_nonzero,
             (CASE m WHEN 16 THEN 0.673 WHEN 64 THEN 0.709
                     ELSE 0.7213 / (1 + 1.079 / m) END)
               * m * m / (s + (m - v_nonzero) * 1.0) AS e_raw
      FROM est
    ), corr AS (
      SELECT m, CASE WHEN e_raw <= 2.5 * m AND v_nonzero < m
                     THEN m * LN(m * 1.0 / (m - v_nonzero))
                     ELSE e_raw END AS e
      FROM raw
    )
    SELECT c.m AS registers,
           CAST(ROUND(c.e) AS BIGINT) AS hll_estimate,
           CAST(ex.exact_n AS BIGINT) AS exact_distinct,
           ROUND(ABS(c.e - ex.exact_n) / ex.exact_n + 5e-12, 6) AS rel_error,
           ROUND(1.04 / SQRT(c.m) + 5e-12, 6) AS theory_rse
    FROM corr c, ex ORDER BY registers
"""


@register(
    "q454_hll_relational",
    _Q454_ORACLE,
    doc="HyperLogLog rebuilt as plain relational ops (multiplicative "
    "hash, mod-m registers, rank via binary-string length, harmonic "
    "mean + linear-counting correction) at m = 16/64/256, audited "
    "against exact COUNT DISTINCT and the 1.04/sqrt(m) law — the "
    "internals of approx sketches (q72) made checkable.",
)
def q454(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        ((F.col("o_custkey") * 2654435761) % 4294967296).alias("hv")
    ).distinct()
    ex = o.agg(F.count_distinct("o_custkey").alias("exact_n"))
    ms = spark.createDataFrame([(16,), (64,), (256,)], "m int")
    w = F.floor(F.col("hv") / F.col("m")).cast("bigint")
    reg = (
        h.crossJoin(F.broadcast(ms))
        .groupBy("m", (F.col("hv") % F.col("m")).alias("r"))
        .agg(
            F.max(
                F.when(w == 0, 27).otherwise(27 - F.length(F.bin(w)))
            ).alias("rho")
        )
    )
    est = reg.groupBy("m").agg(
        F.count(F.lit(1)).alias("v_nonzero"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    )
    alpha = (
        F.when(F.col("m") == 16, 0.673)
        .when(F.col("m") == 64, 0.709)
        .otherwise(0.7213 / (1 + 1.079 / F.col("m")))
    )
    raw = est.select(
        "m",
        "v_nonzero",
        (
            alpha
            * F.col("m")
            * F.col("m")
            / (F.col("s") + (F.col("m") - F.col("v_nonzero")) * 1.0)
        ).alias("e_raw"),
    )
    corr = raw.select(
        "m",
        F.when(
            (F.col("e_raw") <= 2.5 * F.col("m"))
            & (F.col("v_nonzero") < F.col("m")),
            F.col("m") * F.log(F.col("m") * 1.0 / (F.col("m") - F.col("v_nonzero"))),
        )
        .otherwise(F.col("e_raw"))
        .alias("e"),
    )
    return (
        corr.crossJoin(F.broadcast(ex))
        .select(
            F.col("m").alias("registers"),
            F.round("e").cast("bigint").alias("hll_estimate"),
            F.col("exact_n").cast("bigint").alias("exact_distinct"),
            r6(F.abs(F.col("e") - F.col("exact_n")) / F.col("exact_n")).alias(
                "rel_error"
            ),
            r6(1.04 / F.sqrt(F.col("m"))).alias("theory_rse"),
        )
        .orderBy("registers")
    )


# ---------------------------------------------------------------------------
# Q455 — Merkle-tree replica diff localization
# ---------------------------------------------------------------------------
# Replica B of orders carries a deterministic 1-cent corruption on
# keys = 17 mod 5000.  Order-independent leaf checksums (sum of
# bounded row hashes mod 2^31 per 4096-key block) roll up to a root;
# comparing the leaf vectors localizes the damage — rescan only the
# differing leaves instead of the whole table.  The replication-
# integrity pattern behind anti-entropy repair.
_Q455_ORACLE = """
    WITH a AS (
      SELECT o_orderkey // 4096 AS leaf,
             SUM((o_orderkey * 2654435761
                  + CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 % 2147483648) % 2147483648 AS h,
             COUNT(*) AS nrows
      FROM orders GROUP BY 1
    ), b AS (
      SELECT o_orderkey // 4096 AS leaf,
             SUM((o_orderkey * 2654435761
                  + CAST(ROUND(o_totalprice * 100) AS BIGINT)
                  + CASE WHEN o_orderkey % 5000 = 17 THEN 1 ELSE 0 END)
                 % 2147483648) % 2147483648 AS h
      FROM orders GROUP BY 1
    ), cmp AS (
      SELECT a.leaf, a.nrows, a.h AS ha, b.h AS hb
      FROM a JOIN b ON b.leaf = a.leaf
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_leaves,
           CAST(SUM(CASE WHEN ha <> hb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_diff_leaves,
           SUM(ha) % 2147483648 = SUM(hb) % 2147483648 AS root_match,
           CAST(SUM(CASE WHEN ha <> hb THEN nrows ELSE 0 END) AS BIGINT)
             AS rows_rescanned,
           ROUND(SUM(CASE WHEN ha <> hb THEN nrows ELSE 0 END) * 1.0
                 / SUM(nrows) + 5e-12, 6) AS rescan_frac
    FROM cmp
"""


@register(
    "q455_merkle_diff",
    _Q455_ORACLE,
    doc="Merkle-style replica comparison: order-independent leaf "
    "checksums (bounded row hashes summed mod 2^31 per 4096-key "
    "block) against a replica with a deterministic 1-cent "
    "corruption — root mismatch detects, leaf diff localizes, and "
    "the rescan fraction prices the anti-entropy repair "
    "(table-checksum q208's hierarchical sibling).",
)
def q455(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    base = F.col("o_orderkey") * 2654435761 + F.round(
        F.col("o_totalprice") * 100
    ).cast("bigint")
    leaf = F.floor(F.col("o_orderkey") / 4096).alias("leaf")
    a = o.groupBy(leaf).agg(
        (F.sum(base % 2147483648) % 2147483648).alias("ha"),
        F.count(F.lit(1)).alias("nrows"),
    )
    corrupt = base + F.when(F.col("o_orderkey") % 5000 == 17, 1).otherwise(0)
    b = o.groupBy(leaf).agg(
        (F.sum(corrupt % 2147483648) % 2147483648).alias("hb")
    )
    cmp = a.join(b, "leaf")
    diff = F.when(F.col("ha") != F.col("hb"), 1).otherwise(0)
    return cmp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaves"),
        F.sum(diff).cast("bigint").alias("n_diff_leaves"),
        (F.sum("ha") % 2147483648 == F.sum("hb") % 2147483648).alias(
            "root_match"
        ),
        F.sum(diff * F.col("nrows")).cast("bigint").alias("rows_rescanned"),
        r6(F.sum(diff * F.col("nrows")) * 1.0 / F.sum("nrows")).alias(
            "rescan_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Q456 — Z-order vs single-key sort: 2-D range-query locality
# ---------------------------------------------------------------------------
# Orders quantized to an 8-bit (customer, day-of-year) grid; a 2-D
# rectangle query touches far fewer 256-row blocks when rows are
# laid out by interleaved-bit Z-order than when sorted by either
# single key.  Bit interleaving is unrolled shift/mask arithmetic,
# block ids come from layout-order row_numbers — the multi-
# dimensional clustering argument (zone maps q429 quantified the
# 1-D case).
_Q456_ORACLE = """
    WITH g AS (
      SELECT o_orderkey AS k,
             CAST(o_custkey % 256 AS BIGINT) AS x,
             CAST(EXTRACT(doy FROM o_orderdate) % 256 AS BIGINT) AS y
      FROM orders
    ), z AS (
      SELECT k, x, y,
             ( ((x >> 0) & 1) * 1 + ((y >> 0) & 1) * 2
             + ((x >> 1) & 1) * 4 + ((y >> 1) & 1) * 8
             + ((x >> 2) & 1) * 16 + ((y >> 2) & 1) * 32
             + ((x >> 3) & 1) * 64 + ((y >> 3) & 1) * 128
             + ((x >> 4) & 1) * 256 + ((y >> 4) & 1) * 512
             + ((x >> 5) & 1) * 1024 + ((y >> 5) & 1) * 2048
             + ((x >> 6) & 1) * 4096 + ((y >> 6) & 1) * 8192
             + ((x >> 7) & 1) * 16384 + ((y >> 7) & 1) * 32768) AS zc
      FROM g
    ), lay AS (
      SELECT k, x, y,
             (ROW_NUMBER() OVER (ORDER BY y, x, k) - 1) // 256 AS blk_y,
             (ROW_NUMBER() OVER (ORDER BY x, y, k) - 1) // 256 AS blk_x,
             (ROW_NUMBER() OVER (ORDER BY zc, k) - 1) // 256 AS blk_z
      FROM z
    ), q AS (
      SELECT * FROM lay
      WHERE x >= 64 AND x < 96 AND y >= 32 AND y < 64
    ), res AS (
      SELECT 'sort_by_date' AS layout,
             COUNT(DISTINCT blk_y) AS blocks FROM q
      UNION ALL
      SELECT 'sort_by_customer', COUNT(DISTINCT blk_x) FROM q
      UNION ALL
      SELECT 'z_order', COUNT(DISTINCT blk_z) FROM q
    )
    SELECT r.layout, CAST(r.blocks AS BIGINT) AS blocks_touched,
           CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS matching_rows,
           CAST(CEIL((SELECT COUNT(*) FROM q) / 256.0) AS BIGINT)
             AS ideal_blocks,
           ROUND(r.blocks * 1.0
                 / CEIL((SELECT COUNT(*) FROM q) / 256.0) + 5e-12, 6)
             AS locality_ratio
    FROM res r ORDER BY r.layout
"""


@register(
    "q456_zorder_locality",
    _Q456_ORACLE,
    doc="Z-order clustering benefit measured: 8-bit (customer, day) "
    "grid, interleaved-bit codes via unrolled shift/mask, 256-row "
    "blocks per layout, distinct blocks touched by a 2-D rectangle "
    "vs the ceil(rows/256) ideal — why multi-dimensional layouts "
    "beat single-key sorts for selective 2-D queries.",
)
def q456(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    g = o.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 256).cast("bigint").alias("x"),
        (F.dayofyear("o_orderdate") % 256).cast("bigint").alias("y"),
    )
    zc = sum(
        (
            F.shiftright(F.col("x"), i).bitwiseAND(1) * (4**i)
            + F.shiftright(F.col("y"), i).bitwiseAND(1) * (2 * 4**i)
        )
        for i in range(8)
    )
    z = g.select("k", "x", "y", zc.alias("zc"))
    lay = z.select(
        "k",
        "x",
        "y",
        F.floor((F.row_number().over(Window.orderBy("y", "x", "k")) - 1) / 256)
        .alias("blk_y"),
        F.floor((F.row_number().over(Window.orderBy("x", "y", "k")) - 1) / 256)
        .alias("blk_x"),
        F.floor((F.row_number().over(Window.orderBy("zc", "k")) - 1) / 256)
        .alias("blk_z"),
    )
    q = lay.filter(
        (F.col("x") >= 64) & (F.col("x") < 96) & (F.col("y") >= 32) & (F.col("y") < 64)
    )
    res = (
        q.agg(
            F.lit("sort_by_date").alias("layout"),
            F.count_distinct("blk_y").alias("blocks"),
        )
        .unionAll(
            q.agg(F.lit("sort_by_customer"), F.count_distinct("blk_x"))
        )
        .unionAll(q.agg(F.lit("z_order"), F.count_distinct("blk_z")))
    )
    stats = q.agg(F.count(F.lit(1)).alias("mrows"))
    return (
        res.crossJoin(F.broadcast(stats))
        .select(
            "layout",
            F.col("blocks").cast("bigint").alias("blocks_touched"),
            F.col("mrows").cast("bigint").alias("matching_rows"),
            F.ceil(F.col("mrows") / 256.0).cast("bigint").alias("ideal_blocks"),
            r6(F.col("blocks") * 1.0 / F.ceil(F.col("mrows") / 256.0)).alias(
                "locality_ratio"
            ),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# Q457 — Erlang-C staffing table from measured rates
# ---------------------------------------------------------------------------
# lambda = purchase arrivals/hour over the month, mean service time
# modeled as the mean order of business value in seconds: the M/M/c
# wait probability for c = 1..8 servers via the Erlang-C closed form
# (factorials are literal, the k-sum is a generate_series fan-out).
# Rows where the queue is unstable (A >= c) carry NULL waits — the
# staffing table reads directly.
_Q457_ORACLE = """
    WITH rates AS (
      SELECT COUNT(*) * 3600.0
               / (epoch_us(MAX(ts)) / 1e6 - epoch_us(MIN(ts)) / 1e6)
               AS lam_hr,
             AVG(value) AS svc_sec
      FROM events WHERE event_type = 'purchase'
    ), a AS (
      SELECT lam_hr, svc_sec, lam_hr * svc_sec / 3600.0 AS erlangs FROM rates
    ), fact AS (
      SELECT * FROM (VALUES (0, 1.0), (1, 1.0), (2, 2.0), (3, 6.0),
                            (4, 24.0), (5, 120.0), (6, 720.0),
                            (7, 5040.0), (8, 40320.0)) f(k, kf)
    ), terms AS (
      SELECT c.c, SUM(POW(a.erlangs, f.k) / f.kf) AS s
      FROM generate_series(1, 8) c(c)
      JOIN fact f ON f.k < c.c
      CROSS JOIN a
      GROUP BY c.c
    ), ec AS (
      SELECT t.c, a.erlangs,
             a.erlangs / t.c AS util,
             (POW(a.erlangs, t.c) / fc.kf)
               / ((1 - a.erlangs / t.c) * t.s
                  + POW(a.erlangs, t.c) / fc.kf) AS p_wait
      FROM terms t JOIN fact fc ON fc.k = t.c CROSS JOIN a
      WHERE t.c > a.erlangs
    )
    SELECT c.c AS servers,
           ROUND(a.erlangs + 5e-12, 6) AS offered_erlangs,
           ROUND(a.erlangs / c.c + 5e-12, 6) AS utilization,
           ROUND(e.p_wait + 5e-12, 6) AS p_wait,
           ROUND(e.p_wait * a.svc_sec / (c.c - a.erlangs) + 5e-10, 4)
             AS avg_wait_sec
    FROM generate_series(1, 8) c(c)
    CROSS JOIN a
    LEFT JOIN ec e ON e.c = c.c
    ORDER BY servers
"""


@register(
    "q457_erlang_c",
    _Q457_ORACLE,
    doc="Erlang-C staffing table from measured rates (purchase "
    "arrivals/hour, value-as-service-seconds): wait probability and "
    "mean wait for c = 1..8 servers, literal factorials + "
    "generate_series k-sum, unstable rows NULL — queueing capacity "
    "planning beside the Little's-law audit (q419).",
)
def q457(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ts = F.col("ts").cast("timestamp")
    rates = ev.agg(
        (
            F.count(F.lit(1))
            * 3600.0
            / (F.unix_micros(F.max(ts)) / 1e6 - F.unix_micros(F.min(ts)) / 1e6)
        ).alias("lam_hr"),
        F.avg("value").alias("svc_sec"),
    )
    a = rates.select(
        "lam_hr", "svc_sec", (F.col("lam_hr") * F.col("svc_sec") / 3600.0).alias("erlangs")
    )
    fact = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 2.0), (3, 6.0), (4, 24.0), (5, 120.0),
         (6, 720.0), (7, 5040.0), (8, 40320.0)],
        "k int, kf double",
    )
    cs = spark.range(1, 9).select(F.col("id").cast("int").alias("c"))
    terms = (
        cs.join(F.broadcast(fact), F.col("k") < F.col("c"))
        .crossJoin(F.broadcast(a))
        .groupBy("c")
        .agg(F.sum(F.pow(F.col("erlangs"), F.col("k")) / F.col("kf")).alias("s"))
    )
    ec = (
        terms.join(
            F.broadcast(fact.select(F.col("k").alias("c"), F.col("kf").alias("cf"))),
            "c",
        )
        .crossJoin(F.broadcast(a))
        .filter(F.col("c") > F.col("erlangs"))
        .select(
            "c",
            (
                (F.pow(F.col("erlangs"), F.col("c")) / F.col("cf"))
                / (
                    (1 - F.col("erlangs") / F.col("c")) * F.col("s")
                    + F.pow(F.col("erlangs"), F.col("c")) / F.col("cf")
                )
            ).alias("p_wait"),
        )
    )
    return (
        cs.crossJoin(F.broadcast(a))
        .join(ec, "c", "left")
        .select(
            F.col("c").alias("servers"),
            r6(F.col("erlangs")).alias("offered_erlangs"),
            r6(F.col("erlangs") / F.col("c")).alias("utilization"),
            r6(F.col("p_wait")).alias("p_wait"),
            F.round(
                F.col("p_wait") * F.col("svc_sec") / (F.col("c") - F.col("erlangs"))
                + F.lit(5e-10),
                4,
            ).alias("avg_wait_sec"),
        )
        .orderBy("servers")
    )


# ---------------------------------------------------------------------------
# Q458 — Wilcoxon signed-rank test (paired fortnights)
# ---------------------------------------------------------------------------
# Per-user purchase spend, first vs second fortnight: signed ranks
# of the nonzero cent differences with exact midranks (counts of
# smaller / equal |d| — rational values on the 0.5 grid, no float
# rank risk), tie-corrected normal approximation.  The paired
# complement of Mann-Whitney (q164).
_Q458_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 14
                           THEN ROUND(value * 100) ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN EXTRACT(day FROM ts) > 14
                            AND EXTRACT(day FROM ts) <= 28
                           THEN ROUND(value * 100) ELSE 0 END) AS BIGINT) AS s2
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), d AS (
      SELECT user_id, s2 - s1 AS d, ABS(s2 - s1) AS ad
      FROM u WHERE s2 - s1 <> 0
    ), rk AS (
      SELECT a.user_id, a.d,
             (SELECT COUNT(*) FROM d b WHERE b.ad < a.ad)
               + ((SELECT COUNT(*) FROM d b WHERE b.ad = a.ad) + 1) / 2.0
               AS r
      FROM d a
    ), ties AS (
      SELECT SUM(t * t * t - t) AS tcorr
      FROM (SELECT COUNT(*) AS t FROM d GROUP BY ad)
    ), agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN d > 0 THEN r ELSE 0 END) AS w_plus,
             SUM(CASE WHEN d < 0 THEN r ELSE 0 END) AS w_minus
      FROM rk
    )
    SELECT CAST(agg.n AS BIGINT) AS n_pairs,
           ROUND(agg.w_plus + 5e-10, 4) AS w_plus,
           ROUND(agg.w_minus + 5e-10, 4) AS w_minus,
           ROUND((agg.w_plus - agg.n * (agg.n + 1) / 4.0)
                 / SQRT(agg.n * (agg.n + 1) * (2 * agg.n + 1) / 24.0
                        - ties.tcorr / 48.0) + 5e-12, 6) AS z_stat
    FROM agg, ties
"""


@register(
    "q458_wilcoxon_signed_rank",
    _Q458_ORACLE,
    doc="Wilcoxon signed-rank on paired fortnight spends: exact "
    "midranks from smaller/equal-|d| counts (0.5-grid rationals), "
    "tie-corrected normal approximation — the paired complement of "
    "Mann-Whitney (q164) and Hodges-Lehmann (q375).",
)
def q458(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 14, F.round(F.col("value") * 100))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s1"),
        F.sum(
            F.when(
                (F.dayofmonth("ts") > 14) & (F.dayofmonth("ts") <= 28),
                F.round(F.col("value") * 100),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("s2"),
    )
    d = u.select(
        (F.col("s2") - F.col("s1")).alias("d"),
        F.abs(F.col("s2") - F.col("s1")).alias("ad"),
    ).filter(F.col("d") != 0)
    cnt = d.groupBy("ad").agg(F.count(F.lit(1)).alias("t"))
    wo = Window.orderBy("ad")
    ranks = cnt.select(
        "ad",
        "t",
        (F.coalesce(F.sum("t").over(wo), F.lit(0)) - F.col("t")).alias("less"),
    ).select(
        "ad",
        "t",
        (F.col("less") + (F.col("t") + 1) / 2.0).alias("r"),
    )
    rk = d.join(F.broadcast(ranks.select("ad", "r")), "ad")
    ties = cnt.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tcorr")
    )
    agg = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r")).otherwise(0.0)).alias("w_plus"),
        F.sum(F.when(F.col("d") < 0, F.col("r")).otherwise(0.0)).alias("w_minus"),
    )
    n = F.col("n")
    return agg.crossJoin(F.broadcast(ties)).select(
        n.cast("bigint").alias("n_pairs"),
        F.round(F.col("w_plus") + F.lit(5e-10), 4).alias("w_plus"),
        F.round(F.col("w_minus") + F.lit(5e-10), 4).alias("w_minus"),
        r6(
            (F.col("w_plus") - n * (n + 1) / 4.0)
            / F.sqrt(
                n * (n + 1) * (2 * n + 1) / 24.0 - F.col("tcorr") / 48.0
            )
        ).alias("z_stat"),
    )
