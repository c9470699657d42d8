"""Conformance queries: round-7 operator batch #4 (q230+) —
embedding-diversity via the centroid identity, per-dimension energy,
Cronbach's alpha, Wilson intervals, SPRT early stopping,
difference-in-differences, rich-club coefficient.

Parity: integer-moment or cents-exact inputs wherever a recurrence
or comparison depends on them; embedding statistics divide by
n(n-1) (or n) before the 6dp round, which shrinks float-sum order
noise (~1e-9 absolute) far below the round grid."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q230 — Embedding diversity per label (centroid identity)
# ---------------------------------------------------------------------------
# Mean pairwise cosine similarity WITHOUT the O(n^2) pair join:
# for unit vectors, sum_{i != j} <v_i, v_j> = ||S||^2 - n where S is
# the vector sum.  One explode to (label, dim, comp), one shuffle —
# the identity that makes corpus-diversity monitoring feasible at
# 100 TB (the naive pair join is what q54 caps).
_Q230_ORACLE = """
    WITH comp AS (
      SELECT label, vec_id, g.d AS dim,
             CAST(embedding[g.d] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(d)
    ), norms AS (
      SELECT label, vec_id,
             SQRT(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(generate_series(1, 64), d ->
                      CAST(embedding[d] AS DOUBLE)
                      * CAST(embedding[d] AS DOUBLE))),
                  (acc, x) -> acc + x)) AS nrm
      FROM embeddings
    ), unit AS (
      SELECT c.label, c.dim, c.x / n.nrm AS ux
      FROM comp c JOIN norms n
        ON n.label = c.label AND n.vec_id = c.vec_id
    ), dimsum AS (
      SELECT label, dim, SUM(ux) AS s
      FROM unit GROUP BY label, dim
    ), lbl AS (
      SELECT label, SUM(s * s) AS s2
      FROM dimsum GROUP BY label
    ), cnt AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    )
    SELECT c.label, c.n,
           ROUND((l.s2 - c.n) / (CAST(c.n AS DOUBLE) * (c.n - 1))
                 + 5e-12, 6) AS mean_pairwise_cos,
           ROUND(SQRT(l.s2) / c.n + 5e-12, 6) AS centroid_norm
    FROM cnt c JOIN lbl l ON l.label = c.label
    ORDER BY c.label
"""


@register(
    "q230_embedding_diversity",
    _Q230_ORACLE,
    doc="Mean pairwise cosine per label via the centroid identity "
    "sum_ij<vi,vj> = ||S||^2 - n on unit vectors — O(n d) with one "
    "shuffle instead of the O(n^2) pair join.  Low mean-cos = "
    "diverse cluster; centroid_norm is the same signal scaled.  "
    "Vectors cast float32->double before any fold.",
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "label",
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    unit = emb.select(
        "label",
        "vec_id",
        F.posexplode("v").alias("dim0", "x"),
        F.sqrt(
            F.aggregate(
                "v", F.lit(0.0), lambda acc, e: acc + e * e
            )
        ).alias("nrm"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        (F.col("x") / F.col("nrm")).alias("ux"),
    )
    dimsum = unit.groupBy("label", "dim").agg(F.sum("ux").alias("s"))
    lbl = dimsum.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("s2")
    )
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    return (
        cnt.join(lbl, "label")
        .select(
            "label",
            "n",
            F.round(
                (F.col("s2") - F.col("n")) / (nd * (F.col("n") - 1))
                + 5e-12,
                6,
            ).alias("mean_pairwise_cos"),
            F.round(F.sqrt(F.col("s2")) / F.col("n") + 5e-12, 6).alias(
                "centroid_norm"
            ),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Q231 — Per-dimension energy (variance spectrum) of embeddings
# ---------------------------------------------------------------------------
# Population variance per embedding dimension, ranked, with the
# cumulative energy share — the "how many dims carry the signal"
# check that sizes Matryoshka truncation.  One explode + one
# shuffle on dim (64 keys); the spectrum is tiny.
_Q231_TOP = 16

_Q231_ORACLE = f"""
    WITH comp AS (
      SELECT g.d AS dim, CAST(embedding[g.d] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(d)
    ), v AS (
      SELECT dim,
             SUM(x * x) / COUNT(*)
               - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)) AS var_d
      FROM comp GROUP BY dim
    ), ranked AS (
      SELECT dim, var_d,
             ROW_NUMBER() OVER (ORDER BY var_d DESC, dim) AS rk,
             SUM(var_d) OVER () AS tot,
             SUM(var_d) OVER (ORDER BY var_d DESC, dim
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM v
    )
    SELECT rk, CAST(dim AS BIGINT) AS dim,
           ROUND(var_d + 5e-12, 6) AS var_d,
           ROUND(cum / tot + 5e-12, 6) AS energy_share
    FROM ranked WHERE rk <= {_Q231_TOP}
    ORDER BY rk
"""


@register(
    "q231_dim_energy",
    _Q231_ORACLE,
    doc="Embedding variance spectrum: per-dimension population "
    "variance, ranked, with cumulative energy share for the top "
    "16 dims.  One explode + a 64-key aggregation; the windows run "
    "on the 64-row spectrum.  Sizes PCA/Matryoshka truncation "
    "without a covariance matrix.",
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    comp = emb.select(F.posexplode("v").alias("dim0", "x")).select(
        (F.col("dim0") + 1).alias("dim"), "x"
    )
    v = comp.groupBy("dim").agg(
        (
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("var_d")
    )
    wrank = Window.orderBy(F.col("var_d").desc(), "dim")
    ranked = v.select(
        "dim",
        "var_d",
        F.row_number().over(wrank).alias("rk"),
        F.sum("var_d").over(Window.partitionBy()).alias("tot"),
        F.sum("var_d")
        .over(wrank.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    return (
        ranked.where(F.col("rk") <= _Q231_TOP)
        .select(
            "rk",
            F.col("dim").cast("bigint").alias("dim"),
            F.round(F.col("var_d") + 5e-12, 6).alias("var_d"),
            F.round(F.col("cum") / F.col("tot") + 5e-12, 6).alias(
                "energy_share"
            ),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Q232 — Cronbach's alpha over event-type daily counts
# ---------------------------------------------------------------------------
# Treat the five event types as test items and days as cases:
# alpha = k/(k-1) * (1 - sum var_i / var_total).  Every variance is
# derived from EXACT integer moments (n*Sxx - Sx^2), so both
# engines divide identical integers.
_Q232_ORACLE = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY day, event_type
    ), wide AS (
      SELECT day, SUM(y) AS tot FROM daily GROUP BY day
    ), item_var AS (
      SELECT SUM(CAST(nd AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS num_items,
             MAX(nd) AS nd,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS nd,
               SUM(y) AS sx, SUM(y * y) AS sxx
        FROM daily GROUP BY event_type
      )
    ), tot_var AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd2,
             SUM(tot) AS sx, SUM(tot * tot) AS sxx
      FROM wide
    )
    SELECT i.k,
           ROUND((CAST(i.k AS DOUBLE) / (i.k - 1)) *
                 (1.0 - i.num_items /
                        (CAST(t.nd2 AS DOUBLE) * t.sxx
                         - CAST(t.sx AS DOUBLE) * t.sx))
                 + 5e-12, 6) AS cronbach_alpha
    FROM item_var i CROSS JOIN tot_var t
"""


@register(
    "q232_cronbach_alpha",
    _Q232_ORACLE,
    doc="Cronbach's alpha with event types as items and days as "
    "cases: alpha = k/(k-1)(1 - sum var_i/var_total), every "
    "variance from exact integer moments n*Sxx - Sx^2 (the "
    "normalizers cancel in the ratio).  One daily aggregation, "
    "then scalar algebra.",
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("y"))
    daily = daily.localCheckpoint(eager=False)  # items + totals reuse
    wide = daily.groupBy("day").agg(F.sum("y").alias("tot"))
    items = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("y").alias("sx"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
    )
    item_var = items.agg(
        F.sum(
            F.col("nd").cast("double") * F.col("sxx")
            - F.col("sx").cast("double") * F.col("sx")
        ).alias("num_items"),
        F.max("nd").alias("nd"),
        F.count(F.lit(1)).alias("k"),
    )
    tot_var = wide.agg(
        F.count(F.lit(1)).alias("nd2"),
        F.sum("tot").alias("sx"),
        F.sum(F.col("tot") * F.col("tot")).alias("sxx"),
    )
    kd = F.col("k").cast("double")
    den = F.col("nd2").cast("double") * F.col("sxx") - F.col(
        "sx"
    ).cast("double") * F.col("sx")
    return item_var.crossJoin(tot_var).select(
        "k",
        F.round(
            (kd / (F.col("k") - 1)) * (1.0 - F.col("num_items") / den)
            + 5e-12,
            6,
        ).alias("cronbach_alpha"),
    )


# ---------------------------------------------------------------------------
# Q233 — Wilson score intervals for per-source rates
# ---------------------------------------------------------------------------
# 95% Wilson bounds for each source's long-document rate — the
# interval that behaves at small n and p near 0/1 where the normal
# approximation fails.  Closed-form from integer (k, n).
_Q233_Z = 1.959963984540054  # Phi^{-1}(0.975)
_Q233_CHARS = 600

_Q233_CENTER = (
    f"(p + {_Q233_Z} * {_Q233_Z} / (2.0 * n)) "
    f"/ (1.0 + {_Q233_Z} * {_Q233_Z} / n)"
)
_Q233_HALF = (
    f"({_Q233_Z} * SQRT(p * (1.0 - p) / n "
    f"+ {_Q233_Z} * {_Q233_Z} / (4.0 * n * n))) "
    f"/ (1.0 + {_Q233_Z} * {_Q233_Z} / n)"
)

_Q233_ORACLE = f"""
    WITH s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(COUNT(CASE WHEN n_chars > {_Q233_CHARS} THEN 1 END)
                  AS BIGINT) AS k_i
      FROM documents GROUP BY source
    ), p AS (
      SELECT source, n_i, k_i,
             CAST(k_i AS DOUBLE) / n_i AS p,
             CAST(n_i AS DOUBLE) AS n
      FROM s
    )
    SELECT source, n_i, k_i,
           {_R6.format(x='p')} AS rate,
           {_R6.format(x=f'({_Q233_CENTER}) - ({_Q233_HALF})')} AS wilson_lo,
           {_R6.format(x=f'({_Q233_CENTER}) + ({_Q233_HALF})')} AS wilson_hi
    FROM p ORDER BY source
"""


@register(
    "q233_wilson_ci",
    _Q233_ORACLE,
    doc="95% Wilson score intervals for per-source long-document "
    "rates: closed-form center/half-width from integer (k, n) — "
    "the small-n-safe interval for rate dashboards.  One "
    "aggregation; the algebra is per-group scalar.",
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.count(F.when(F.col("n_chars") > _Q233_CHARS, 1)).alias("k_i"),
    )
    z = _Q233_Z
    p = F.col("k_i").cast("double") / F.col("n_i")
    n = F.col("n_i").cast("double")
    center = (p + z * z / (2.0 * n)) / (1.0 + z * z / n)
    half = (
        z * F.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    ) / (1.0 + z * z / n)
    return s.select(
        "source",
        "n_i",
        "k_i",
        r6(p).alias("rate"),
        r6(center - half).alias("wilson_lo"),
        r6(center + half).alias("wilson_hi"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Q234 — SPRT early-stopping audit (Bernoulli conversion)
# ---------------------------------------------------------------------------
# Wald's sequential probability ratio test replayed over the event
# stream per variant (user_id parity): LLR_n = k ln(p1/p0) +
# (n-k) ln((1-p1)/(1-p0)); report the first crossing of the
# ln(19) ~ (alpha=beta=0.05) boundaries.  Cumulative k and n are
# exact integers from windows; the LLR multiplies them by two
# shared double constants — identical in both engines.
_Q234_P0 = 0.18
_Q234_P1 = 0.22
_Q234_A = 2.9444389791664403  # ln(19)

_Q234_ORACLE = f"""
    WITH obs AS (
      SELECT user_id % 2 AS variant, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), cum AS (
      SELECT variant,
             ROW_NUMBER() OVER w AS n,
             SUM(y) OVER (PARTITION BY variant ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS k
      FROM obs
      WINDOW w AS (PARTITION BY variant ORDER BY ts, event_id)
    ), llr AS (
      SELECT variant, n, k,
             k * ln({_Q234_P1} / {_Q234_P0})
             + (n - k) * ln((1.0 - {_Q234_P1}) / (1.0 - {_Q234_P0}))
               AS llr
      FROM cum
    ), crossed AS (
      SELECT variant, n, k, llr,
             CASE WHEN llr >= {_Q234_A} THEN 'accept_h1'
                  WHEN llr <= -{_Q234_A} THEN 'accept_h0' END AS decision,
             ROW_NUMBER() OVER (PARTITION BY variant ORDER BY n) AS rk
      FROM llr
      WHERE llr >= {_Q234_A} OR llr <= -{_Q234_A}
    )
    SELECT CAST(variant AS BIGINT) AS variant,
           CAST(n AS BIGINT) AS n_at_decision,
           CAST(k AS BIGINT) AS k_at_decision,
           {_R6.format(x='llr')} AS llr,
           decision
    FROM crossed WHERE rk = 1
    ORDER BY variant
"""


@register(
    "q234_sprt",
    _Q234_ORACLE,
    doc="Wald SPRT replay per variant: cumulative (n, k) windows "
    "over the event stream, LLR = k c1 + (n-k) c2 with shared "
    "double constants, first boundary crossing at ±ln(19).  The "
    "always-valid early-stopping audit; integer cumulative counts "
    "make the crossing row engine-exact.",
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        (F.col("user_id") % 2).alias("variant"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    w = Window.partitionBy("variant").orderBy("ts", "event_id")
    cum = obs.select(
        "variant",
        F.row_number().over(w).alias("n"),
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "k"
        ),
    )
    c1 = math.log(_Q234_P1 / _Q234_P0)
    c2 = math.log((1.0 - _Q234_P1) / (1.0 - _Q234_P0))
    llr = cum.withColumn(
        "llr", F.col("k") * c1 + (F.col("n") - F.col("k")) * c2
    )
    crossed = (
        llr.where(
            (F.col("llr") >= _Q234_A) | (F.col("llr") <= -_Q234_A)
        )
        .withColumn(
            "decision",
            F.when(F.col("llr") >= _Q234_A, "accept_h1").otherwise(
                "accept_h0"
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("variant").orderBy("n")
            ),
        )
    )
    return (
        crossed.where(F.col("rk") == 1)
        .select(
            F.col("variant").cast("bigint").alias("variant"),
            F.col("n").cast("bigint").alias("n_at_decision"),
            F.col("k").cast("bigint").alias("k_at_decision"),
            r6(F.col("llr")).alias("llr"),
            "decision",
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Q235 — Difference-in-differences (cents-exact cell means)
# ---------------------------------------------------------------------------
# Classic 2x2 DiD on event value: treatment = user parity, post =
# second half of the month.  Cell sums are reduced to exact cents
# before the means, so the interaction estimate is bit-identical.
_Q235_CUT = "2024-01-16"

_Q235_ORACLE = f"""
    WITH cells AS (
      SELECT user_id % 2 AS treat,
             CASE WHEN ts >= TIMESTAMP '{_Q235_CUT}' THEN 1 ELSE 0 END
               AS post,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY treat, post
    ), m AS (
      SELECT MAX(CASE WHEN treat = 1 AND post = 1
                      THEN cents / 100.0 / n END) AS t_post,
             MAX(CASE WHEN treat = 1 AND post = 0
                      THEN cents / 100.0 / n END) AS t_pre,
             MAX(CASE WHEN treat = 0 AND post = 1
                      THEN cents / 100.0 / n END) AS c_post,
             MAX(CASE WHEN treat = 0 AND post = 0
                      THEN cents / 100.0 / n END) AS c_pre
      FROM cells
    )
    SELECT {_R6.format(x='t_pre')} AS t_pre,
           {_R6.format(x='t_post')} AS t_post,
           {_R6.format(x='c_pre')} AS c_pre,
           {_R6.format(x='c_post')} AS c_post,
           {_R6.format(x='(t_post - t_pre) - (c_post - c_pre)')} AS did
    FROM m
"""


@register(
    "q235_did",
    _Q235_ORACLE,
    doc="Difference-in-differences on event value: 2x2 "
    "treat x post cell means from cents-exact sums, interaction "
    "estimate (t_post - t_pre) - (c_post - c_pre).  One "
    "aggregation to four cells; the causal-inference staple.",
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2).alias("treat"),
        F.when(F.col("ts") >= _Q235_CUT, 1).otherwise(0).alias("post"),
    ).agg(
        F.round(F.sum("value") * 100, 0).cast("bigint").alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )

    def cell(t: int, p: int):
        return F.max(
            F.when(
                (F.col("treat") == t) & (F.col("post") == p),
                F.col("cents") / 100.0 / F.col("n"),
            )
        )

    m = cells.agg(
        cell(1, 1).alias("t_post"),
        cell(1, 0).alias("t_pre"),
        cell(0, 1).alias("c_post"),
        cell(0, 0).alias("c_pre"),
    )
    return m.select(
        r6(F.col("t_pre")).alias("t_pre"),
        r6(F.col("t_post")).alias("t_post"),
        r6(F.col("c_pre")).alias("c_pre"),
        r6(F.col("c_post")).alias("c_post"),
        r6(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Q236 — Rich-club coefficient phi(k)
# ---------------------------------------------------------------------------
# phi(k) = 2 E_k / (N_k (N_k - 1)) over the derived graph for
# k = 1..8: do high-degree nodes preferentially interconnect?
# Degrees once, endpoint degrees joined onto edges once, then the
# k-grid is conditional aggregation over the already-reduced edge
# relation (8x fan-out of edges-with-degrees, not of the raw data).
_Q236_MOD = 200
_Q236_KMAX = 8

_Q236_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT
             CAST(least(o_custkey % {_Q236_MOD},
                        o_orderkey % {_Q236_MOD}) AS BIGINT) AS a,
             CAST(greatest(o_custkey % {_Q236_MOD},
                           o_orderkey % {_Q236_MOD}) AS BIGINT) AS b
      FROM orders
      WHERE o_custkey % {_Q236_MOD} <> o_orderkey % {_Q236_MOD}
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e
      ) GROUP BY node
    ), ed AS (
      SELECT da.d AS du, db.d AS dv
      FROM e JOIN deg da ON da.node = e.a
             JOIN deg db ON db.node = e.b
    ), ks AS (SELECT UNNEST(range(1, {_Q236_KMAX + 1})) AS k),
    ek AS (
      SELECT k.k,
             CAST(SUM(CASE WHEN least(ed.du, ed.dv) > k.k
                           THEN 1 ELSE 0 END) AS BIGINT) AS e_k
      FROM ed CROSS JOIN ks k GROUP BY k.k
    ), nk AS (
      SELECT k.k,
             CAST(SUM(CASE WHEN deg.d > k.k THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_k
      FROM deg CROSS JOIN ks k GROUP BY k.k
    )
    SELECT e.k, n.n_k, e.e_k,
           {_R6.format(
               x='2.0 * e.e_k / (CAST(n.n_k AS DOUBLE) * (n.n_k - 1))'
           )} AS phi
    FROM ek e JOIN nk n ON n.k = e.k
    ORDER BY e.k
"""


@register(
    "q236_rich_club",
    _Q236_ORACLE,
    doc="Rich-club coefficient phi(k) = 2 E_k / (N_k (N_k-1)) for "
    "k=1..8 on the derived graph.  Degrees computed once, joined "
    "to edge endpoints once; the k-grid fans out only the reduced "
    "(du, dv) edge relation and the degree table.  Exact integer "
    "counts into a closed-form ratio.",
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = (F.col("o_custkey") % _Q236_MOD).cast("bigint")
    b = (F.col("o_orderkey") % _Q236_MOD).cast("bigint")
    e = (
        orders.select(
            F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e = e.localCheckpoint(eager=False)  # degrees + endpoint joins
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    deg = deg.localCheckpoint(eager=False)  # two joins + nk
    da = deg.select(F.col("node").alias("ka"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("kb"), F.col("d").alias("dv"))
    ed = (
        e.join(F.broadcast(da), e.a == da.ka)
        .join(F.broadcast(db), e.b == db.kb)
        .select("du", "dv")
    )
    ks = F.explode(F.sequence(F.lit(1), F.lit(_Q236_KMAX))).alias("k")
    ek = (
        ed.select("du", "dv", ks)
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.least("du", "dv") > F.col("k"), 1).otherwise(0)
            ).alias("e_k")
        )
    )
    nk = (
        deg.select("d", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0)).alias(
                "n_k"
            )
        )
    )
    return (
        ek.join(nk, "k")
        .select(
            "k",
            "n_k",
            "e_k",
            r6(
                2.0
                * F.col("e_k")
                / (F.col("n_k").cast("double") * (F.col("n_k") - 1))
            ).alias("phi"),
        )
        .orderBy("k")
    )
