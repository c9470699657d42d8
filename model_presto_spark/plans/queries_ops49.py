"""Conformance queries batch #49 (q439+) — DTW as a nested fold,
Haar wavelet energy, Bayesian A/B posterior, robust shape
statistics, and inverted-index size planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q439 — dynamic time warping as a nested higher-order fold
# ---------------------------------------------------------------------------
# DTW between the first and second fortnight of daily revenue: the
# DP table never materializes — the outer fold walks series A
# carrying the previous DP row as the accumulator, the inner fold
# walks series B extending the current row (which references its own
# last element).  All arithmetic stays on BIGINT cents with a large
# sentinel for the boundary, so the distance is integer-exact in
# both engines.  Euclidean (lock-step) distance rides along for the
# elasticity comparison.
_Q439_SENT = 400000000000000000  # boundary sentinel, never accumulates twice

_Q439_ORACLE = f"""
    WITH daily AS (
      SELECT EXTRACT(day FROM ts) AS d,
             CAST(SUM(ROUND(value * 100)) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 28
      GROUP BY 1
    ), ser AS (
      SELECT list(CASE WHEN d <= 14 THEN v END ORDER BY d)
               FILTER (WHERE d <= 14) AS sa,
             list(CASE WHEN d > 14 THEN v END ORDER BY d)
               FILTER (WHERE d > 14) AS sb
      FROM daily
    ), dp AS (
      SELECT sa, sb,
             list_reduce(
               list_prepend(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(sb, x -> CAST({_Q439_SENT} AS BIGINT))),
                 list_transform(sa, x -> [x])),
               (prev, ai) -> list_reduce(
                 list_prepend([CAST({_Q439_SENT} AS BIGINT)],
                              list_transform(sb, x -> [x])),
                 (row, bj) -> list_append(row,
                   ABS(ai[1] - bj[1]) + LEAST(prev[len(row)],
                                              prev[len(row) + 1],
                                              row[len(row)]))
               )
             ) AS final_row
      FROM ser
    )
    SELECT CAST(len(sa) AS BIGINT) AS n_a, CAST(len(sb) AS BIGINT) AS n_b,
           CAST(final_row[len(sb) + 1] AS BIGINT) AS dtw_cents,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1, 14),
                                 i -> ABS(sa[i] - sb[i]))),
                (a, b) -> a + b) AS BIGINT) AS lockstep_l1_cents
    FROM dp
"""


@register(
    "q439_dtw_fold",
    _Q439_ORACLE,
    doc="Dynamic time warping between revenue fortnights computed as "
    "a nested higher-order fold (outer fold = DP rows over series "
    "A, inner fold extends the row over series B referencing its "
    "own tail) — O(nm) DP with zero iteration framework, "
    "integer-exact on cents; lock-step L1 rides along to show the "
    "warping gain.",
)
def q439(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 28)
    )
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("bigint").alias("v")
    )
    ser = daily.agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("d") <= 14, F.struct(F.col("d"), F.col("v")))
                )
            ),
            lambda s: s.v,
        ).alias("sa"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("d") > 14, F.struct(F.col("d"), F.col("v")))
                )
            ),
            lambda s: s.v,
        ).alias("sb"),
    )
    sent = F.lit(_Q439_SENT).cast("bigint")

    def inner(prev, ai):
        # extend the DP row left-to-right; row[0] is the j=0 boundary
        return F.aggregate(
            F.col("sb"),
            F.concat(F.array(sent), F.array().cast("array<bigint>")),
            lambda row, bj: F.concat(
                row,
                F.array(
                    F.abs(ai - bj)
                    + F.least(
                        F.element_at(prev, F.size(row)),
                        F.element_at(prev, F.size(row) + 1),
                        F.element_at(row, F.size(row)),
                    )
                ),
            ),
        )

    dp = ser.select(
        "sa",
        "sb",
        F.aggregate(
            F.col("sa"),
            F.concat(
                F.array(F.lit(0).cast("bigint")),
                F.transform(F.col("sb"), lambda x: sent),
            ),
            inner,
        ).alias("final_row"),
    )
    return dp.select(
        F.size("sa").cast("bigint").alias("n_a"),
        F.size("sb").cast("bigint").alias("n_b"),
        F.element_at("final_row", F.size("sb") + 1).cast("bigint").alias(
            "dtw_cents"
        ),
        F.aggregate(
            F.zip_with("sa", "sb", lambda a, b: F.abs(a - b)),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b,
        )
        .cast("bigint")
        .alias("lockstep_l1_cents"),
    )


# ---------------------------------------------------------------------------
# Q440 — Haar wavelet multiresolution energy
# ---------------------------------------------------------------------------
# Unnormalized Haar transform of the 16-day revenue series by four
# unrolled pair-sum/pair-difference levels (pure groupBys on
# halved day indices): the detail energy per level is the scale
# spectrum — where the series' variation lives — complementing the
# frequency-domain periodogram (q265).
_Q440_ORACLE = """
    WITH d0 AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS i,
             CAST(SUM(ROUND(value * 100)) AS DOUBLE) AS v
      FROM events WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 16
      GROUP BY 1
    ), l1 AS (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN v ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN v ELSE 0 END) AS d
      FROM d0 GROUP BY 1
    ), l2 AS (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS d
      FROM l1 GROUP BY 1
    ), l3 AS (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS d
      FROM l2 GROUP BY 1
    ), l4 AS (
      SELECT CAST(CEIL(i / 2.0) AS BIGINT) AS i,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               + SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS a,
             SUM(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)
               - SUM(CASE WHEN i % 2 = 0 THEN a ELSE 0 END) AS d
      FROM l3 GROUP BY 1
    ), en AS (
      SELECT 1 AS level, SUM(d * d) / POW(2.0, 1) AS energy FROM l1
      UNION ALL SELECT 2, SUM(d * d) / POW(2.0, 2) FROM l2
      UNION ALL SELECT 3, SUM(d * d) / POW(2.0, 3) FROM l3
      UNION ALL SELECT 4, SUM(d * d) / POW(2.0, 4) FROM l4
    )
    SELECT level, ROUND(energy / 1e8 + 5e-10, 4) AS energy_usd2,
           ROUND(energy / (SELECT SUM(energy) FROM en) + 5e-12, 6)
             AS energy_share
    FROM en ORDER BY level
"""


@register(
    "q440_haar_wavelet",
    _Q440_ORACLE,
    doc="Haar multiresolution energy of the 16-day revenue series: "
    "four unrolled pair-sum/difference levels on halved day "
    "indices (groupBy per level, normalization 2^-level folded "
    "into the energy), detail-energy share per scale — the "
    "scale-domain twin of the periodogram (q265).",
)
def q440(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 16)
    )
    lvl = ev.groupBy(F.dayofmonth("ts").cast("bigint").alias("i")).agg(
        F.sum(F.round(F.col("value") * 100)).cast("double").alias("a")
    )
    energies = []
    for k in range(1, 5):
        odd = F.sum(F.when(F.col("i") % 2 == 1, F.col("a")).otherwise(0.0))
        even = F.sum(F.when(F.col("i") % 2 == 0, F.col("a")).otherwise(0.0))
        lvl = lvl.groupBy(
            F.ceil(F.col("i") / 2.0).cast("bigint").alias("i")
        ).agg((odd + even).alias("a"), (odd - even).alias("d"))
        # per-level lineage cut: each Haar level and its energy branch
        # re-reference the previous level (plan audit: 16 scans)
        lvl = lvl.localCheckpoint(eager=False)
        energies.append(
            lvl.agg(
                F.lit(k).alias("level"),
                (F.sum(F.col("d") * F.col("d")) / F.pow(F.lit(2.0), k)).alias(
                    "energy"
                ),
            )
        )
        lvl = lvl.select("i", "a")
    en = energies[0]
    for e in energies[1:]:
        en = en.unionAll(e)
    tot = en.agg(F.sum("energy").alias("te"))
    return (
        en.crossJoin(F.broadcast(tot))
        .select(
            "level",
            F.round(F.col("energy") / 1e8 + F.lit(5e-10), 4).alias("energy_usd2"),
            r6(F.col("energy") / F.col("te")).alias("energy_share"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# Q441 — Bayesian A/B: P(B > A) by double-grid integration
# ---------------------------------------------------------------------------
# Hash-split users, conversion = 7+ purchases in the fortnight;
# Beta(1,1) posteriors on each arm.  With integer counts the log
# Beta function is a prefix sum of ln k (relational log-factorials,
# no lgamma needed), and P(B > A) is a 256x256 midpoint-grid double
# integral — the exceedance probability the frequentist tests
# (q94/q323) can't give, fully deterministic.
_Q441_ORACLE = """
    WITH u AS (
      SELECT user_id,
             CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                  THEN 0 ELSE 1 END AS grp,
             CASE WHEN COUNT(*) >= 7 THEN 1 ELSE 0 END AS conv
      FROM events
      WHERE event_type = 'purchase' AND EXTRACT(day FROM ts) <= 14
      GROUP BY user_id
    ), cnt AS (
      SELECT SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS c_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS c_b
      FROM u
    ), lf AS (
      SELECT g.k, SUM(LN(g2.k)) AS lfact
      FROM generate_series(1, 4000) g(k)
      JOIN generate_series(1, 4000) g2(k) ON g2.k <= g.k
      GROUP BY g.k
    ), par AS (
      SELECT c_a + 1 AS aa, n_a - c_a + 1 AS ab,
             c_b + 1 AS ba, n_b - c_b + 1 AS bb,
             n_a, c_a, n_b, c_b
      FROM cnt
    ), lnb AS (
      SELECT p.*,
             la.lfact + lb.lfact - lab.lfact AS lnb_a,
             lc.lfact + ld.lfact - lcd.lfact AS lnb_b
      FROM par p
      JOIN lf la ON la.k = p.aa - 1 JOIN lf lb ON lb.k = p.ab - 1
      JOIN lf lab ON lab.k = p.aa + p.ab - 1
      JOIN lf lc ON lc.k = p.ba - 1 JOIN lf ld ON ld.k = p.bb - 1
      JOIN lf lcd ON lcd.k = p.ba + p.bb - 1
    ), grid AS (
      SELECT (g.i - 0.5) / 256.0 AS x FROM generate_series(1, 256) g(i)
    ), fa AS (
      SELECT x, EXP((aa - 1) * LN(x) + (ab - 1) * LN(1 - x) - lnb_a) / 256.0
               AS p
      FROM grid, lnb
    ), fb AS (
      SELECT x, EXP((ba - 1) * LN(x) + (bb - 1) * LN(1 - x) - lnb_b) / 256.0
               AS p
      FROM grid, lnb
    ), integ AS (
      SELECT SUM(fa.p * fb.p) FILTER (WHERE fb.x > fa.x) AS p_b_gt_a,
             SUM(fa.p * fb.p) AS mass
      FROM fa, fb
    )
    SELECT CAST(l.n_a AS BIGINT) AS n_a, CAST(l.c_a AS BIGINT) AS conv_a,
           CAST(l.n_b AS BIGINT) AS n_b, CAST(l.c_b AS BIGINT) AS conv_b,
           ROUND(i.p_b_gt_a / i.mass + 5e-12, 6) AS prob_b_beats_a,
           ROUND(i.mass + 5e-12, 6) AS joint_mass
    FROM lnb l, integ i
"""


@register(
    "q441_bayes_ab",
    _Q441_ORACLE,
    doc="Bayesian A/B exceedance P(B > A): Beta(1,1) posteriors on "
    "hash-split conversion counts, log-Beta from relational "
    "log-factorial prefix sums (integer parameters, no lgamma), "
    "256x256 midpoint-grid double integral with the joint mass as "
    "the quadrature audit — the decision posterior beside the "
    "frequentist q94/q323.",
)
def q441(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.dayofmonth("ts") <= 14)
    )
    u = ev.groupBy("user_id").agg(
        F.when(F.count(F.lit(1)) >= 7, 1).otherwise(0).alias("conv")
    ).select(
        F.when(
            (F.col("user_id") * 2654435761) % 4294967296 < 2147483648, 0
        )
        .otherwise(1)
        .alias("grp"),
        "conv",
    )
    cnt = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0)).alias("c_b"),
    )
    lf = (
        spark.range(1, 4001)
        .select(F.col("id").alias("k"), F.log(F.col("id").cast("double")).alias("l"))
        .select(
            "k",
            F.sum("l").over(Window.orderBy("k")).alias("lfact"),
        )
    )
    par = cnt.select(
        (F.col("c_a") + 1).alias("aa"),
        (F.col("n_a") - F.col("c_a") + 1).alias("ab"),
        (F.col("c_b") + 1).alias("ba"),
        (F.col("n_b") - F.col("c_b") + 1).alias("bb"),
        "n_a",
        "c_a",
        "n_b",
        "c_b",
    )

    def lj(df, key_expr, alias):
        return df.join(
            F.broadcast(lf.select(F.col("k").alias(alias + "_k"), F.col("lfact").alias(alias))),
            key_expr == F.col(alias + "_k"),
        ).drop(alias + "_k")

    lnb = par
    lnb = lj(lnb, F.col("aa") - 1, "la")
    lnb = lj(lnb, F.col("ab") - 1, "lb")
    lnb = lj(lnb, F.col("aa") + F.col("ab") - 1, "lab")
    lnb = lj(lnb, F.col("ba") - 1, "lc")
    lnb = lj(lnb, F.col("bb") - 1, "ld")
    lnb = lj(lnb, F.col("ba") + F.col("bb") - 1, "lcd")
    lnb = lnb.select(
        "*",
        (F.col("la") + F.col("lb") - F.col("lab")).alias("lnb_a"),
        (F.col("lc") + F.col("ld") - F.col("lcd")).alias("lnb_b"),
    )
    grid = spark.range(1, 257).select(((F.col("id") - 0.5) / 256.0).alias("x"))
    fa = grid.crossJoin(F.broadcast(lnb)).select(
        F.col("x").alias("xa"),
        (
            F.exp(
                (F.col("aa") - 1) * F.log("x")
                + (F.col("ab") - 1) * F.log(1 - F.col("x"))
                - F.col("lnb_a")
            )
            / 256.0
        ).alias("pa"),
    )
    fb = grid.crossJoin(F.broadcast(lnb)).select(
        F.col("x").alias("xb"),
        (
            F.exp(
                (F.col("ba") - 1) * F.log("x")
                + (F.col("bb") - 1) * F.log(1 - F.col("x"))
                - F.col("lnb_b")
            )
            / 256.0
        ).alias("pb"),
    )
    integ = fa.crossJoin(F.broadcast(fb)).agg(
        F.sum(
            F.when(F.col("xb") > F.col("xa"), F.col("pa") * F.col("pb"))
        ).alias("p_b_gt_a"),
        F.sum(F.col("pa") * F.col("pb")).alias("mass"),
    )
    return lnb.crossJoin(F.broadcast(integ)).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        r6(F.col("p_b_gt_a") / F.col("mass")).alias("prob_b_beats_a"),
        r6(F.col("mass")).alias("joint_mass"),
    )


# ---------------------------------------------------------------------------
# Q442 — robust (quantile-based) shape statistics
# ---------------------------------------------------------------------------
# Bowley skewness from quartiles and Moors kurtosis from octiles
# beside the classical moment skewness/kurtosis of order prices:
# the outlier-immune shape diagnostics (robust siblings of the
# moment suite q146).
_Q442_ORACLE = """
    WITH q AS (
      SELECT quantile_cont(o_totalprice,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS e
      FROM orders
    ), m AS (
      SELECT COUNT(*) AS n, AVG(o_totalprice) AS mu,
             SUM(o_totalprice * o_totalprice) AS s2,
             SUM(o_totalprice * o_totalprice * o_totalprice) AS s3,
             SUM(o_totalprice * o_totalprice * o_totalprice * o_totalprice)
               AS s4,
             SUM(o_totalprice) AS s1
      FROM orders
    ), c AS (
      SELECT n, mu,
             s2 / n - mu * mu AS m2,
             s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
             s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n)
               - 3 * mu * mu * mu * mu AS m4
      FROM m
    )
    SELECT ROUND((q.e[6] + q.e[2] - 2 * q.e[4]) / (q.e[6] - q.e[2])
                 + 5e-12, 6) AS bowley_skew,
           ROUND(((q.e[7] - q.e[5]) + (q.e[3] - q.e[1]))
                 / (q.e[6] - q.e[2]) + 5e-12, 6) AS moors_kurtosis,
           ROUND(c.m3 / POW(c.m2, 1.5) + 5e-12, 6) AS moment_skew,
           ROUND(c.m4 / (c.m2 * c.m2) + 5e-12, 6) AS moment_kurtosis,
           ROUND((q.e[6] - q.e[2]) / (q.e[6] + q.e[2]) + 5e-12, 6)
             AS quartile_cv
    FROM q, c
"""


@register(
    "q442_robust_shape",
    _Q442_ORACLE,
    doc="Quantile-based shape diagnostics — Bowley skewness "
    "(quartiles), Moors kurtosis (octiles), quartile coefficient "
    "of variation — against the classical moment skewness/kurtosis "
    "from raw power sums: the outlier-immune shape suite (q146's "
    "robust twin).",
)
def q442(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    pcts = F.array(*[F.lit(p) for p in (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875)])
    q = o.agg(F.percentile("o_totalprice", pcts).alias("e"))
    x = F.col("o_totalprice")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("mu"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n, mu = F.col("n"), F.col("mu")
    c = m.select(
        (F.col("s2") / n - mu * mu).alias("m2"),
        (F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu).alias(
            "m3"
        ),
        (
            F.col("s4") / n
            - 4 * mu * (F.col("s3") / n)
            + 6 * mu * mu * (F.col("s2") / n)
            - 3 * mu * mu * mu * mu
        ).alias("m4"),
    )
    e = lambda i: F.element_at(F.col("e"), i)  # noqa: E731
    return q.crossJoin(F.broadcast(c)).select(
        r6((e(6) + e(2) - 2 * e(4)) / (e(6) - e(2))).alias("bowley_skew"),
        r6(((e(7) - e(5)) + (e(3) - e(1))) / (e(6) - e(2))).alias(
            "moors_kurtosis"
        ),
        r6(F.col("m3") / F.pow(F.col("m2"), 1.5)).alias("moment_skew"),
        r6(F.col("m4") / (F.col("m2") * F.col("m2"))).alias("moment_kurtosis"),
        r6((e(6) - e(2)) / (e(6) + e(2))).alias("quartile_cv"),
    )


# ---------------------------------------------------------------------------
# Q443 — inverted-index size planning (varint posting lists)
# ---------------------------------------------------------------------------
# Tokenize documents, build per-term posting lists, delta-encode the
# doc-id gaps and price them under a varint byte model (1 byte
# < 2^7, 2 < 2^14, 3 < 2^21, else 4) vs fixed 8-byte ids: the
# compression planning table for a text index, with document
# frequency extremes — one explode + two aggregations.
_Q443_ORACLE = """
    WITH tok AS (
      SELECT DISTINCT d.doc_id, lower(u.t) AS term
      FROM documents d,
           unnest(string_split(d.text, ' ')) u(t)
      WHERE length(u.t) > 0
    ), gaps AS (
      SELECT term, doc_id,
             doc_id - LAG(doc_id) OVER (PARTITION BY term ORDER BY doc_id)
               AS gap
      FROM tok
    ), priced AS (
      SELECT term,
             COUNT(*) AS df,
             SUM(CASE WHEN COALESCE(gap, doc_id + 1) < 128 THEN 1
                      WHEN COALESCE(gap, doc_id + 1) < 16384 THEN 2
                      WHEN COALESCE(gap, doc_id + 1) < 2097152 THEN 3
                      ELSE 4 END) AS vbytes
      FROM gaps GROUP BY term
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(df) AS BIGINT) AS n_postings,
           CAST(SUM(vbytes) AS BIGINT) AS varint_bytes,
           CAST(SUM(df) * 8 AS BIGINT) AS fixed_bytes,
           ROUND(SUM(df) * 8.0 / SUM(vbytes) + 5e-12, 6) AS compression,
           CAST(MAX(df) AS BIGINT) AS max_df
    FROM priced
"""


@register(
    "q443_index_size_planner",
    _Q443_ORACLE,
    doc="Inverted-index sizing: per-term posting lists, delta-encoded "
    "doc-id gaps priced under the varint byte model vs fixed 8-byte "
    "ids — the compression-ratio planning table for a text index "
    "(BM25 q91 / TF-IDF q73's storage sibling).",
)
def q443(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id", F.explode_outer(F.split("text", " ")).alias("t")
        )
        .filter(F.length("t") > 0)
        .select("doc_id", F.lower("t").alias("term"))
        .distinct()
    )
    gaps = tok.select(
        "term",
        "doc_id",
        (
            F.col("doc_id")
            - F.lag("doc_id").over(Window.partitionBy("term").orderBy("doc_id"))
        ).alias("gap"),
    )
    g = F.coalesce(F.col("gap"), F.col("doc_id") + 1)
    priced = gaps.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(
            F.when(g < 128, 1).when(g < 16384, 2).when(g < 2097152, 3).otherwise(4)
        ).alias("vbytes"),
    )
    return priced.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("df").cast("bigint").alias("n_postings"),
        F.sum("vbytes").cast("bigint").alias("varint_bytes"),
        (F.sum("df") * 8).cast("bigint").alias("fixed_bytes"),
        r6(F.sum("df") * 8.0 / F.sum("vbytes")).alias("compression"),
        F.max("df").cast("bigint").alias("max_df"),
    )
