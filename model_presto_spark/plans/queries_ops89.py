"""Conformance queries batch #89 (q639+) — input-output economics,
actuarial life tables, sequence alignment, ordered-alternative rank
tests, and Pareto-front quality indicators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q639 — Leontief input-output multipliers via Neumann series
# ---------------------------------------------------------------------------
# Trade flows between five seller and buyer nation-blocs define the
# technical-coefficient matrix A (intermediate-input share 0.5 of
# each buyer's column, so ||A|| = 0.5 and the series converges); the
# total-requirements matrix L = I + A + A^2 + ... is computed by the
# 25-state fold X <- I + A X, giving each bloc's output multiplier.
def _leontief_fold(el) -> str:
    exprs = []
    for p in range(1, 26):
        i = (p - 1) // 5 + 1
        j = (p - 1) % 5 + 1
        terms = [str(1.0 if i == j else 0.0)]
        for k in range(1, 6):
            terms.append(f"a_{i}_{k} * {el(5 * (k - 1) + j)}")
        exprs.append(" + ".join(terms))
    return ", ".join(exprs)


_LEONTIEF_INIT = ", ".join(
    "CAST(1 AS DOUBLE)" if p == 1 else ("1" if (p - 1) % 6 == 0 else "0")
    for p in range(1, 26)
)

_Q639_ORACLE = f"""
    WITH flows AS MATERIALIZED (
      SELECT s.s_nationkey % 5 AS i, c.c_nationkey % 5 AS j,
             SUM(ROUND(l.l_extendedprice * 100)) AS f
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY s.s_nationkey % 5, c.c_nationkey % 5
    ), coef AS (
      SELECT i, j, 0.5 * f / SUM(f) OVER (PARTITION BY j) AS a
      FROM flows
    ), amat AS (
      SELECT {", ".join(
        f"SUM(CASE WHEN i = {i - 1} AND j = {j - 1} THEN a ELSE 0 END)"
        f" AS a_{i}_{j}"
        for i in range(1, 6) for j in range(1, 6))}
      FROM coef
    ), folded AS (
      SELECT list_reduce(
               list_prepend([{_LEONTIEF_INIT}],
                            list_transform(range(1, 31),
                                           t -> [CAST(t AS DOUBLE)])),
               (acc, x) -> [{_leontief_fold(lambda k: f'acc[{k}]')}]
             ) AS l
      FROM amat
    )
    SELECT j AS bloc,
           ROUND(l[j] + l[5 + j] + l[10 + j] + l[15 + j] + l[20 + j]
                 + 5e-12, 6) AS output_multiplier,
           ROUND(l[5 * (j - 1) + j] + 5e-12, 6) AS own_requirement
    FROM folded CROSS JOIN (SELECT UNNEST(range(1, 6)) AS j)
    ORDER BY j
"""

_LEONTIEF_SPARK_FOLD = (
    "aggregate(sequence(1, 30), array(" + _LEONTIEF_INIT + "), "
    "(acc, x) -> array("
    + _leontief_fold(lambda k: f"element_at(acc, {k})")
    + "))"
)


@register(
    "q639_leontief_io",
    _Q639_ORACLE,
    doc="Leontief input-output model: bloc-to-bloc trade flows give "
    "the column-normalized technical coefficients (scaled to input "
    "share 0.5), the total-requirements matrix comes from the "
    "Neumann-series fold X <- I + A X, and each bloc's column sum "
    "is its output multiplier — matrix economics as a 25-state "
    "fold, next to Sinkhorn (q487) and Markov chains (q240).",
)
def q639(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    flows = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            (F.col("s_nationkey") % 5).alias("i"),
            (F.col("c_nationkey") % 5).alias("j"),
        )
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100)).alias("f"))
    )
    coef = flows.select(
        "i",
        "j",
        (
            0.5 * F.col("f") / F.sum("f").over(Window.partitionBy("j"))
        ).alias("a"),
    )
    amat = coef.agg(
        *[
            F.sum(
                F.when((F.col("i") == i - 1) & (F.col("j") == j - 1), F.col("a"))
                .otherwise(0.0)
            ).alias(f"a_{i}_{j}")
            for i in range(1, 6)
            for j in range(1, 6)
        ]
    )
    folded = amat.select(F.expr(_LEONTIEF_SPARK_FOLD).alias("l"))
    blocs = spark.range(1, 6).select(F.col("id").cast("int").alias("j"))
    le = lambda k: F.element_at("l", k)  # noqa: E731
    return (
        folded.crossJoin(F.broadcast(blocs))
        .select(
            F.col("j").alias("bloc"),
            r6(
                le(F.col("j"))
                + le(F.col("j") + 5)
                + le(F.col("j") + 10)
                + le(F.col("j") + 15)
                + le(F.col("j") + 20)
            ).alias("output_multiplier"),
            r6(le(5 * (F.col("j") - 1) + F.col("j"))).alias("own_requirement"),
        )
        .orderBy("bloc")
    )


# ---------------------------------------------------------------------------
# Q640 — actuarial life table with curtate life expectancy
# ---------------------------------------------------------------------------
# User "lifespans" (days between first and last event) build the
# discrete life table: survivors l_t, deaths d_t, hazard q_t, and
# the curtate expectation e_t = sum_{s>t} l_s / l_t computed in
# closed form as sum(count * max(span - t, 0)) / l_t — the actuary's
# survival summary on top of the KM/RMST stack.
_Q640_ORACLE = """
    WITH spans AS MATERIALIZED (
      SELECT CAST(MAX(EXTRACT(day FROM ts)) - MIN(EXTRACT(day FROM ts))
                  AS BIGINT) AS sp,
             COUNT(*) AS ne
      FROM events GROUP BY user_id
    ), sc AS MATERIALIZED (
      SELECT sp, COUNT(*) AS cnt FROM spans GROUP BY sp
    ), ages AS (
      SELECT UNNEST(range(0, 11)) AS t
    ), lt AS (
      SELECT a.t,
             SUM(CASE WHEN s.sp >= a.t THEN s.cnt ELSE 0 END) AS lx,
             SUM(CASE WHEN s.sp = a.t THEN s.cnt ELSE 0 END) AS dx,
             SUM(s.cnt * GREATEST(s.sp - a.t, 0)) AS future
      FROM ages a CROSS JOIN sc s
      GROUP BY a.t
    )
    SELECT CAST(t AS BIGINT) AS age_days,
           CAST(lx AS BIGINT) AS survivors,
           CAST(dx AS BIGINT) AS deaths,
           ROUND(dx * 1.0 / lx + 5e-12, 6) AS hazard_q,
           ROUND(future * 1.0 / lx + 5e-12, 6) AS curtate_expectancy
    FROM lt WHERE lx > 0
    ORDER BY t
"""


@register(
    "q640_life_table",
    _Q640_ORACLE,
    doc="Actuarial life table on user activity lifespans: survivors, "
    "deaths, discrete hazard q_t and curtate life expectancy via "
    "the closed form sum(cnt * max(span - t, 0)) / l_t for ages "
    "0-10 days — the life-table view complementing KM survival "
    "(q108) and RMST (q380).",
)
def q640(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        (F.max(F.dayofmonth("ts")) - F.min(F.dayofmonth("ts")))
        .cast("bigint")
        .alias("sp")
    )
    sc = spans.groupBy("sp").agg(F.count(F.lit(1)).alias("cnt"))
    ages = spark.range(0, 11).select(F.col("id").alias("t"))
    lt = (
        ages.crossJoin(sc)
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("sp") >= F.col("t"), F.col("cnt")).otherwise(0)
            ).alias("lx"),
            F.sum(
                F.when(F.col("sp") == F.col("t"), F.col("cnt")).otherwise(0)
            ).alias("dx"),
            F.sum(
                F.col("cnt") * F.greatest(F.col("sp") - F.col("t"), F.lit(0))
            ).alias("future"),
        )
    )
    return (
        lt.filter(F.col("lx") > 0)
        .select(
            F.col("t").cast("bigint").alias("age_days"),
            F.col("lx").cast("bigint").alias("survivors"),
            F.col("dx").cast("bigint").alias("deaths"),
            r6(F.col("dx") * 1.0 / F.col("lx")).alias("hazard_q"),
            r6(F.col("future") * 1.0 / F.col("lx")).alias(
                "curtate_expectancy"
            ),
        )
        .orderBy("age_days")
    )


# ---------------------------------------------------------------------------
# Q641 — Needleman-Wunsch global sequence alignment
# ---------------------------------------------------------------------------
# Global alignment (match +2, mismatch -1, gap -2) between adjacent
# part names as a nested fold: the outer fold walks characters of s
# keeping the DP row, the inner fold builds the next row left to
# right — the alignment-score primitive behind fuzzy matching,
# sharper than plain edit distance because it scores matches.
def _nw_fold(dialect: str) -> str:
    if dialect == "duck":
        return (
            "list_reduce("
            "  list_prepend("
            "    list_transform(range(0, CAST(length(t) AS BIGINT) + 1),"
            "                   j -> CAST(-2 * j AS DOUBLE)),"
            "    list_transform(range(1, CAST(length(s) AS BIGINT) + 1),"
            "                   i -> list_transform(range(0, 1),"
            "                                       z -> CAST(i AS DOUBLE)))),"
            "  (prev, xi) -> list_reduce("
            "    list_prepend([-2 * xi[1]],"
            "      list_transform(range(1, CAST(length(t) AS BIGINT) + 1),"
            "                     j -> [CAST(j AS DOUBLE)])),"
            "    (row, xj) -> list_append(row, GREATEST("
            "      prev[CAST(xj[1] AS BIGINT)]"
            "        + (CASE WHEN substr(s, CAST(xi[1] AS BIGINT), 1)"
            "                   = substr(t, CAST(xj[1] AS BIGINT), 1)"
            "                THEN 2 ELSE -1 END),"
            "      prev[CAST(xj[1] AS BIGINT) + 1] - 2,"
            "      row[CAST(xj[1] AS BIGINT)] - 2))))"
        )
    return (
        "aggregate("
        "  sequence(1, length(s)),"
        "  transform(sequence(0, length(t)), j -> CAST(-2 * j AS DOUBLE)),"
        "  (prev, xi) -> aggregate("
        "    sequence(1, length(t)),"
        "    array(CAST(-2 * xi AS DOUBLE)),"
        "    (row, xj) -> concat(row, array(greatest("
        "      element_at(prev, xj)"
        "        + (CASE WHEN substr(s, xi, 1) = substr(t, xj, 1)"
        "                THEN 2 ELSE -1 END),"
        "      element_at(prev, xj + 1) - 2,"
        "      element_at(row, xj) - 2)))))"
    )


_Q641_ORACLE = f"""
    WITH parts AS MATERIALIZED (
      SELECT p_partkey, p_name,
             ROW_NUMBER() OVER (ORDER BY p_partkey) AS rn
      FROM part
    ), pairs AS MATERIALIZED (
      SELECT a.p_partkey AS k1, b.p_partkey AS k2,
             a.p_name AS s, b.p_name AS t
      FROM parts a JOIN parts b ON b.rn = a.rn + 1
      WHERE a.rn <= 6
    ), scored AS (
      SELECT k1, k2, s, t,
             ({_nw_fold('duck')})[CAST(length(t) AS BIGINT) + 1] AS score
      FROM pairs
    )
    SELECT k1, k2,
           CAST(score AS BIGINT) AS nw_score,
           ROUND(score / (2.0 * LEAST(length(s), length(t))) + 5e-12, 6)
             AS normalized_similarity
    FROM scored
    ORDER BY k1
"""

_NW_SPARK = _nw_fold("spark")


@register(
    "q641_needleman_wunsch",
    _Q641_ORACLE,
    doc="Needleman-Wunsch global alignment (match +2 / mismatch -1 / "
    "gap -2) between adjacent part names as a nested DP-row fold — "
    "the biology-grade alignment score behind fuzzy record "
    "matching, complementing DTW (q439) and token-sort matching "
    "(q410).",
)
def q641(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    parts = p.select(
        "p_partkey",
        "p_name",
        F.row_number().over(Window.orderBy("p_partkey")).alias("rn"),
    )
    a = parts.select(
        F.col("p_partkey").alias("k1"), F.col("p_name").alias("s"), "rn"
    ).filter(F.col("rn") <= 6)
    b = parts.select(
        F.col("p_partkey").alias("k2"),
        F.col("p_name").alias("t"),
        (F.col("rn") - 1).alias("rn"),
    )
    pairs = a.join(b, "rn")
    scored = pairs.select(
        "k1",
        "k2",
        "s",
        "t",
        F.element_at(F.expr(_NW_SPARK), F.length("t") + 1).alias("score"),
    )
    return scored.select(
        "k1",
        "k2",
        F.col("score").cast("bigint").alias("nw_score"),
        r6(
            F.col("score") / (2.0 * F.least(F.length("s"), F.length("t")))
        ).alias("normalized_similarity"),
    ).orderBy("k1")


# ---------------------------------------------------------------------------
# Q642 — Page's trend test for ordered alternatives
# ---------------------------------------------------------------------------
# Within each nation-block, the five order priorities are ranked by
# average order value; Page's L = sum(j * R_j) against the predicted
# priority ordering, with its normal approximation z-score — the
# ordered-alternative sharpening of the Friedman test (q320).
_Q642_ORACLE = """
    WITH cells AS MATERIALIZED (
      SELECT c.c_nationkey AS blk,
             CAST(SUBSTR(o.o_orderpriority, 1, 1) AS BIGINT) AS trt,
             AVG(ROUND(o.o_totalprice * 100)) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey, SUBSTR(o.o_orderpriority, 1, 1)
    ), full_blocks AS (
      SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
    ), ranked AS (
      SELECT c.blk, c.trt,
             RANK() OVER (PARTITION BY c.blk ORDER BY c.v, c.trt) AS r
      FROM cells c JOIN full_blocks f ON f.blk = c.blk
    ), sums AS (
      SELECT trt, SUM(r) AS rj, COUNT(*) AS b
      FROM ranked GROUP BY trt
    ), stat AS (
      SELECT SUM(trt * rj) AS l, MAX(b) AS b, COUNT(*) AS k
      FROM sums
    )
    SELECT CAST(b AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS n_treatments,
           CAST(l AS BIGINT) AS page_l,
           ROUND((l - b * k * (k + 1) * (k + 1) / 4.0)
                 / SQRT(b * k * k * (k + 1) * (k * k - 1) / 144.0)
                 + 5e-12, 6) AS z_score,
           (l - b * k * (k + 1) * (k + 1) / 4.0)
             / SQRT(b * k * k * (k + 1) * (k * k - 1) / 144.0) > 1.645
             AS increasing_trend
    FROM stat
"""


@register(
    "q642_page_trend",
    _Q642_ORACLE,
    doc="Page's trend test: per-nation ranks of the five order "
    "priorities by average order value, L = sum(j * R_j) against "
    "the predicted priority ordering with its normal-approximation "
    "z — the ordered-alternative version of Friedman's test "
    "(q320), one-sided where Friedman is omnibus.",
)
def q642(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("blk"),
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("trt"),
        )
        .agg(F.avg(F.round(F.col("o_totalprice") * 100)).alias("v"))
        .localCheckpoint(eager=False)
    )
    full_blocks = (
        cells.groupBy("blk").agg(F.count(F.lit(1)).alias("nc"))
        .filter(F.col("nc") == 5)
        .select("blk")
    )
    ranked = cells.join(full_blocks, "blk").select(
        "blk",
        "trt",
        F.rank().over(Window.partitionBy("blk").orderBy("v", "trt")).alias("r"),
    )
    sums = ranked.groupBy("trt").agg(
        F.sum("r").alias("rj"), F.count(F.lit(1)).alias("b")
    )
    stat = sums.agg(
        F.sum(F.col("trt") * F.col("rj")).alias("l"),
        F.max("b").alias("b"),
        F.count(F.lit(1)).alias("k"),
    )
    b, k, lsum = F.col("b"), F.col("k"), F.col("l")
    z = (lsum - b * k * (k + 1) * (k + 1) / 4.0) / F.sqrt(
        b * k * k * (k + 1) * (k * k - 1) / 144.0
    )
    return stat.select(
        b.cast("bigint").alias("n_blocks"),
        k.cast("bigint").alias("n_treatments"),
        lsum.cast("bigint").alias("page_l"),
        r6(z).alias("z_score"),
        (z > 1.645).alias("increasing_trend"),
    )


# ---------------------------------------------------------------------------
# Q643 — 2D hypervolume of the nation Pareto front
# ---------------------------------------------------------------------------
# Nations scored on (total revenue, customer count), both maximized
# and normalized by their maxima: the non-dominated front's
# hypervolume w.r.t. the origin is the sum of strips (x_i - x_{i-1})
# * y_i over the x-ascending front — the standard multi-objective
# quality indicator on top of the skyline operator.
_Q643_ORACLE = """
    WITH pts AS MATERIALIZED (
      SELECT c.c_nationkey AS nk,
             SUM(ROUND(o.o_totalprice * 100)) AS rev,
             COUNT(DISTINCT c.c_custkey) AS ncust
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ), norm AS MATERIALIZED (
      SELECT nk, rev * 1.0 / MAX(rev) OVER () AS x,
             ncust * 1.0 / MAX(ncust) OVER () AS y
      FROM pts
    ), front AS MATERIALIZED (
      SELECT n.nk, n.x, n.y FROM norm n
      WHERE NOT EXISTS (
        SELECT 1 FROM norm d
        WHERE d.x >= n.x AND d.y >= n.y AND (d.x > n.x OR d.y > n.y)
      )
    ), strips AS (
      SELECT x, y,
             x - COALESCE(LAG(x) OVER (ORDER BY x, y), 0) AS w
      FROM front
    )
    SELECT CAST((SELECT COUNT(*) FROM front) AS BIGINT) AS front_size,
           CAST((SELECT COUNT(*) FROM norm) AS BIGINT) AS n_points,
           ROUND(SUM(w * y) + 5e-12, 6) AS hypervolume,
           ROUND(MAX(y) + 5e-12, 6) AS best_y_on_front,
           ROUND(MIN(y) + 5e-12, 6) AS y_at_best_x
    FROM strips
"""


@register(
    "q643_hypervolume_2d",
    _Q643_ORACLE,
    doc="2D hypervolume indicator: nations scored on normalized "
    "(revenue, customer count), the non-dominated front's dominated "
    "area w.r.t. the origin summed as x-ascending strips — the "
    "multi-objective quality metric layered on the skyline operator "
    "(q203/q550).",
)
def q643(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pts = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100)).alias("rev"),
            F.countDistinct("c_custkey").alias("ncust"),
        )
    )
    wall = Window.partitionBy()
    norm = pts.select(
        "nk",
        (F.col("rev") * 1.0 / F.max("rev").over(wall)).alias("x"),
        (F.col("ncust") * 1.0 / F.max("ncust").over(wall)).alias("y"),
    ).localCheckpoint(eager=False)
    dom = norm.select(
        F.col("x").alias("dx"), F.col("y").alias("dy")
    )
    front = norm.join(
        dom,
        (F.col("dx") >= F.col("x"))
        & (F.col("dy") >= F.col("y"))
        & ((F.col("dx") > F.col("x")) | (F.col("dy") > F.col("y"))),
        "left_anti",
    ).localCheckpoint(eager=False)
    strips = front.select(
        "x",
        "y",
        (
            F.col("x")
            - F.coalesce(
                F.lag("x").over(Window.orderBy("x", "y")), F.lit(0.0)
            )
        ).alias("w"),
    )
    counts = front.agg(F.count(F.lit(1)).alias("fs")).crossJoin(
        norm.agg(F.count(F.lit(1)).alias("np"))
    )
    return strips.agg(
        r6(F.sum(F.col("w") * F.col("y"))).alias("hypervolume"),
        r6(F.max("y")).alias("best_y_on_front"),
        r6(F.min("y")).alias("y_at_best_x"),
    ).crossJoin(F.broadcast(counts)).select(
        F.col("fs").cast("bigint").alias("front_size"),
        F.col("np").cast("bigint").alias("n_points"),
        "hypervolume",
        "best_y_on_front",
        "y_at_best_x",
    )
