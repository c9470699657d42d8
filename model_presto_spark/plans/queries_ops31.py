"""Conformance queries: round-7 operator batch #25 (q332+) —
split-half reliability, two-NN intrinsic dimension, effective rank.

Parity: split-half moments are exact integer cents; the two-NN
ratio uses the sequential-fold distance idiom (q35); effective
rank reuses the q231 variance spectrum with identical-double
entropy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL


# ---------------------------------------------------------------------------
# Q332 — Split-half reliability of the user leaderboard
# ---------------------------------------------------------------------------
# Is per-user revenue ranking signal or noise?  Split each user's
# spend into odd and even days, Pearson r between the halves from
# exact integer cents, Spearman-Brown correction 2r/(1+r).  Low
# reliability = the leaderboard reshuffles by luck.
_Q332_ORACLE = """
    WITH halves AS (
      SELECT user_id,
             CAST(ROUND(SUM(CASE WHEN EXTRACT(day FROM ts) % 2 = 1
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS odd_c,
             CAST(ROUND(SUM(CASE WHEN EXTRACT(day FROM ts) % 2 = 0
                                 THEN value ELSE 0 END) * 100, 0)
                  AS BIGINT) AS even_c
      FROM events GROUP BY user_id
    ), mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(odd_c) AS DOUBLE) AS sx,
             CAST(SUM(even_c) AS DOUBLE) AS sy,
             CAST(SUM(odd_c * odd_c) AS DOUBLE) AS sxx,
             CAST(SUM(even_c * even_c) AS DOUBLE) AS syy,
             CAST(SUM(odd_c * even_c) AS DOUBLE) AS sxy
      FROM halves
    ), r AS (
      SELECT n,
             (n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
               AS rr
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           {R} AS split_half_r,
           {SB} AS spearman_brown
    FROM r
""".replace(
    "{R}", R6_SQL.format(x="rr")
).replace(
    "{SB}", R6_SQL.format(x="2.0 * rr / (1.0 + rr)")
)


@register(
    "q332_split_half",
    _Q332_ORACLE,
    doc="Split-half reliability of per-user revenue: odd-day vs "
    "even-day cent totals, Pearson r from exact integer moments, "
    "Spearman-Brown full-length correction 2r/(1+r).  The "
    "is-the-leaderboard-real psychometric check.",
)
def q332(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    odd = F.dayofmonth("ts") % 2 == 1
    halves = ev.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(odd, F.col("value")).otherwise(0.0)) * 100, 0
        )
        .cast("bigint")
        .alias("odd_c"),
        F.round(
            F.sum(F.when(~odd, F.col("value")).otherwise(0.0)) * 100, 0
        )
        .cast("bigint")
        .alias("even_c"),
    )
    mom = halves.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("odd_c").cast("double").alias("sx"),
        F.sum("even_c").cast("double").alias("sy"),
        F.sum(F.col("odd_c") * F.col("odd_c")).cast("double").alias("sxx"),
        F.sum(F.col("even_c") * F.col("even_c"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("odd_c") * F.col("even_c"))
        .cast("double")
        .alias("sxy"),
    )
    c = F.col
    rr = (c("n") * c("sxy") - c("sx") * c("sy")) / (
        F.sqrt(c("n") * c("sxx") - c("sx") * c("sx"))
        * F.sqrt(c("n") * c("syy") - c("sy") * c("sy"))
    )
    r_df = mom.select(c("n"), rr.alias("rr"))
    return r_df.select(
        F.col("n").cast("bigint").alias("n_users"),
        r6(F.col("rr")).alias("split_half_r"),
        r6(2.0 * F.col("rr") / (1.0 + F.col("rr"))).alias(
            "spearman_brown"
        ),
    )


# ---------------------------------------------------------------------------
# Q333 — Two-NN intrinsic dimension of the embeddings
# ---------------------------------------------------------------------------
# Facco et al.'s estimator: for each vector the ratio mu = r2/r1
# of its two nearest-neighbor distances; ID = n / sum ln(mu).
# Exact top-2 over a capped slice (brute-force oracle pattern;
# LSH/IVF are the scale paths).  Tells whether 64 ambient dims
# hide a low-dimensional manifold.
_Q333_CAP = 400

_SQD = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, 64), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
    "(acc, x) -> acc + x)"
)

_Q333_ORACLE = f"""
    WITH v AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id < {_Q333_CAP}
    ), scored AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             {_SQD.format(a='a.embedding', b='b.embedding')} AS d2
      FROM v a JOIN v b ON b.vec_id <> a.vec_id
    ), ranked AS (
      SELECT i, d2,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY d2, j) AS rk
      FROM scored
    ), mu AS (
      SELECT i,
             SQRT(MAX(CASE WHEN rk = 2 THEN d2 END)
                  / MAX(CASE WHEN rk = 1 THEN d2 END)) AS mu
      FROM ranked WHERE rk <= 2 GROUP BY i
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           {_R6.format(x='COUNT(*) / SUM(ln(mu))')} AS intrinsic_dim,
           {_R6.format(x='AVG(ln(mu))')} AS mean_log_ratio
    FROM mu
"""


@register(
    "q333_intrinsic_dim",
    _Q333_ORACLE,
    doc="Two-NN intrinsic dimension (Facco) of the embedding "
    "cloud: per-point nearest/second-nearest distance ratio over "
    "a capped slice (sequential folds, q35 idiom), "
    "ID = n / sum ln(r2/r1).  Near 64 = truly high-dimensional; "
    "low = a manifold worth exploiting in the ANN index.",
)
def q333(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _Q333_CAP)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    a = emb.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = a.join(
        F.broadcast(b), F.col("j") != F.col("i")
    ).select("i", "j", d2.alias("d2"))
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("i").orderBy("d2", "j")),
    ).where(F.col("rk") <= 2)
    mu = ranked.groupBy("i").agg(
        F.sqrt(
            F.max(F.when(F.col("rk") == 2, F.col("d2")))
            / F.max(F.when(F.col("rk") == 1, F.col("d2")))
        ).alias("mu")
    )
    return mu.agg(
        F.count(F.lit(1)).alias("n_points"),
        r6(
            F.count(F.lit(1)) / F.sum(F.log("mu"))
        ).alias("intrinsic_dim"),
        r6(F.avg(F.log("mu"))).alias("mean_log_ratio"),
    )


# ---------------------------------------------------------------------------
# Q334 — Effective rank of the embedding variance spectrum
# ---------------------------------------------------------------------------
# erank = exp(-sum p_d ln p_d) over the normalized per-dimension
# variance shares (q231's spectrum) plus the participation ratio
# (sum v)^2 / sum v^2 — two one-number summaries of how many
# dimensions actually carry variance.
_Q334_ORACLE = """
    WITH comp AS (
      SELECT g.d AS dim, CAST(embedding[g.d] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(d)
    ), v AS (
      SELECT dim,
             SUM(x * x) / COUNT(*)
               - (SUM(x) / COUNT(*)) * (SUM(x) / COUNT(*)) AS var_d
      FROM comp GROUP BY dim
    ), shares AS (
      SELECT var_d, var_d / SUM(var_d) OVER () AS p
      FROM v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           {ER} AS effective_rank,
           {PR} AS participation_ratio
    FROM shares
""".replace(
    "{ER}", R6_SQL.format(x="exp(-SUM(p * ln(p)))")
).replace(
    "{PR}",
    R6_SQL.format(
        x="SUM(var_d) * SUM(var_d) / SUM(var_d * var_d)"
    ),
)


@register(
    "q334_effective_rank",
    _Q334_ORACLE,
    doc="Effective rank exp(entropy of variance shares) and "
    "participation ratio (sum v)^2/sum v^2 of the embedding "
    "spectrum — q231's one-number summaries; both near 64 means "
    "variance is spread across every dimension (no free "
    "truncation).",
)
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    comp = emb.select(F.posexplode("v").alias("dim0", "x"))
    v = comp.groupBy("dim0").agg(
        (
            F.sum(F.col("x") * F.col("x")) / F.count(F.lit(1))
            - (F.sum("x") / F.count(F.lit(1)))
            * (F.sum("x") / F.count(F.lit(1)))
        ).alias("var_d")
    )
    shares = v.select(
        "var_d",
        (
            F.col("var_d")
            / F.sum("var_d").over(Window.partitionBy())
        ).alias("p"),
    )
    return shares.agg(
        F.count(F.lit(1)).alias("n_dims"),
        r6(F.exp(-F.sum(F.col("p") * F.log("p")))).alias(
            "effective_rank"
        ),
        r6(
            F.sum("var_d")
            * F.sum("var_d")
            / F.sum(F.col("var_d") * F.col("var_d"))
        ).alias("participation_ratio"),
    )
