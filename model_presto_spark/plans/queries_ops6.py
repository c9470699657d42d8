"""Conformance queries: scale-pattern operators #6 (q200+).

Holt linear-trend smoothing (sequential recurrence as a bounded
per-series HOF fold), mutual-nearest-neighbor pairing, and PII
redaction over the corpus. Oracle conventions as everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register

_R6 = R6_SQL

# ---------------------------------------------------------------------------
# Q200 — Holt linear-trend (double exponential smoothing) per priority
# ---------------------------------------------------------------------------
# The recurrence l_t = a*y_t + (1-a)*(l+b); b_t = g*(l_t-l) + (1-g)*b
# is inherently sequential IN t — but t is the bounded month axis
# (<= ~90 values), so the scale shape is: one distributed monthly
# aggregation (the 100 TB part), then a per-series fold over the
# bounded month array via F.aggregate — never a cross-row recursion
# on the fact table. Monthly sums are rounded to cents BEFORE the
# recurrence so both engines fold bit-identical doubles (double
# summation order differs across engines; the true cent-grid value
# does not). The oracle replays the identical recurrence with
# WITH RECURSIVE.
_Q200_A = 0.5   # level smoothing
_Q200_G = 0.3   # trend smoothing

_Q200_ORACLE = f"""
    WITH RECURSIVE series AS (
      SELECT o_orderpriority AS priority,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-01') AS m,
             ROUND(SUM(o_totalprice), 2) AS y
      FROM orders GROUP BY 1, 2
    ), pts AS (
      SELECT priority, y,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY m) AS t,
             COUNT(*) OVER (PARTITION BY priority) AS tmax
      FROM series
    ), state AS (
      SELECT p1.priority, 1 AS t, p1.tmax,
             p1.y AS l, p2.y - p1.y AS b, CAST(0.0 AS DOUBLE) AS sse
      FROM pts p1 JOIN pts p2
        ON p2.priority = p1.priority AND p2.t = 2
      WHERE p1.t = 1
      UNION ALL
      SELECT s.priority, s.t + 1, s.tmax,
             {_Q200_A} * p.y + (1 - {_Q200_A}) * (s.l + s.b) AS l,
             {_Q200_G} * (({_Q200_A} * p.y + (1 - {_Q200_A}) * (s.l + s.b))
                          - s.l) + (1 - {_Q200_G}) * s.b AS b,
             s.sse + (p.y - (s.l + s.b)) * (p.y - (s.l + s.b)) AS sse
      FROM state s JOIN pts p
        ON p.priority = s.priority AND p.t = s.t + 1
      WHERE s.t < s.tmax
    )
    SELECT priority, CAST(tmax AS BIGINT) AS n_months,
           {_R6.format(x='l')} AS level,
           {_R6.format(x='b')} AS trend,
           {_R6.format(x='l + b')} AS forecast_next,
           {_R6.format(x='sqrt(sse / (tmax - 1))')} AS rmse
    FROM state WHERE t = tmax
    ORDER BY priority
"""


@register(
    "q200_holt_trend",
    _Q200_ORACLE,
    doc="Holt double-exponential smoothing of monthly order revenue "
    "per priority: distributed monthly aggregation, then the "
    "sequential level/trend recurrence as an F.aggregate fold over "
    "the bounded month array (cent-rounded inputs keep the fold "
    "bit-identical across engines). Final level/trend, one-step "
    "forecast, and in-sample RMSE; oracle = WITH RECURSIVE replay.",
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-01")
            .alias("m"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )
    pts = series.groupBy("priority").agg(
        F.array_sort(F.collect_list(F.struct("m", "y"))).alias("pts")
    )
    ys = F.transform(F.col("pts"), lambda p: p["y"])
    a, g = F.lit(_Q200_A), F.lit(_Q200_G)
    init = F.struct(
        F.element_at(ys, 1).alias("l"),
        (F.element_at(ys, 2) - F.element_at(ys, 1)).alias("b"),
        F.lit(0.0).alias("sse"),
    )
    folded = F.aggregate(
        F.slice(ys, 2, F.size(ys) - 1),
        init,
        lambda acc, y: F.struct(
            (a * y + (F.lit(1.0) - a) * (acc["l"] + acc["b"])).alias("l"),
            (
                g
                * (
                    (a * y + (F.lit(1.0) - a) * (acc["l"] + acc["b"]))
                    - acc["l"]
                )
                + (F.lit(1.0) - g) * acc["b"]
            ).alias("b"),
            (
                acc["sse"]
                + (y - (acc["l"] + acc["b"])) * (y - (acc["l"] + acc["b"]))
            ).alias("sse"),
        ),
    )
    return (
        pts.select(
            "priority",
            F.size("pts").cast("bigint").alias("n_months"),
            folded.alias("st"),
        )
        .select(
            "priority",
            "n_months",
            r6(F.col("st.l")).alias("level"),
            r6(F.col("st.b")).alias("trend"),
            r6(F.col("st.l") + F.col("st.b")).alias("forecast_next"),
            r6(
                F.sqrt(F.col("st.sse") / (F.col("n_months") - 1).cast("double"))
            ).alias("rmse"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Q201 — mutual nearest neighbors (embedding alignment pairs)
# ---------------------------------------------------------------------------
# MNN = pairs where each vector is the other's cosine top-1 — the
# standard high-precision pairing rule (batch-effect alignment,
# bilingual lexicon induction). Built entirely from the existing
# knn_join operator run in both directions on the bounded subset;
# the mutual check is one self-join on the (a, b) edge.
_DD_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(generate_series(1, 64), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
_DD_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)

_Q201_ORACLE = f"""
    WITH sub AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 250
    ), scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             1.0 - {_DD_DOT.format(a='a.embedding', b='b.embedding')}
                   / ({_DD_NORM.format(a='a.embedding')}
                      * {_DD_NORM.format(a='b.embedding')}) AS dist
      FROM sub a CROSS JOIN sub b
      WHERE a.vec_id <> b.vec_id
    ), nn AS (
      SELECT src, dst, dist,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY dist ASC, dst ASC) AS rk
      FROM scored
    )
    SELECT x.src AS a_id, x.dst AS b_id,
           {_R6.format(x='x.dist')} AS dist
    FROM nn x JOIN nn y
      ON y.src = x.dst AND y.dst = x.src AND y.rk = 1
    WHERE x.rk = 1 AND x.src < x.dst
    ORDER BY a_id
"""


@register(
    "q201_mutual_nn",
    _Q201_ORACLE,
    doc="Mutual-nearest-neighbor pairs (cosine top-1 in BOTH "
    "directions) over a bounded embedding subset: two knn_join "
    "passes + one edge self-join. The high-precision pairing rule "
    "for embedding alignment; at corpus scale the same composition "
    "runs on the LSH/IVF knn operators instead of brute force.",
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.knn import knn_join

    sub = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 250)
        # double-cast BEFORE the fold: float32 products differ from
        # the oracle's CAST-to-DOUBLE products by ~1e-8 — enough to
        # straddle a 6dp rounding boundary at 250 probes (hit at
        # sf0.1); double products are bit-identical
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    nn = knn_join(
        sub.withColumnRenamed("vec_id", "src"),
        sub.withColumnRenamed("vec_id", "dst"),
        probe_id="src",
        cand_id="dst",
        probe_vec="embedding",
        cand_vec="embedding",
        k=1,
        metric="cosine",
        exclude_self=True,
    ).select("src", "dst", "dist")
    rev = nn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        nn.join(rev, ["src", "dst"], "left_semi")
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("a_id"),
            F.col("dst").alias("b_id"),
            r6(F.col("dist")).alias("dist"),
        )
        .orderBy("a_id")
    )


# ---------------------------------------------------------------------------
# Q202 — PII redaction audit (C4/Gopher-style scrubbing)
# ---------------------------------------------------------------------------
# Deterministic synthetic PII is planted in-plan (doc_id-keyed email
# / phone suffixes both engines construct identically), then the
# scrub pass counts and strips it — pure regexp expressions, single
# pass, no UDFs. Patterns stay in the RE2-and-Java-common subset.
_PAT_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PAT_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

_Q202_ORACLE = (
    """
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com now'
                  WHEN doc_id % 7 = 3
                  THEN text || ' call 555-'
                       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS t
      FROM documents
    ), scrubbed AS (
      SELECT doc_id, source, t,
             len(regexp_extract_all(t, '"""
    + _PAT_EMAIL
    + """')) AS n_email,
             len(regexp_extract_all(t, '"""
    + _PAT_PHONE
    + """')) AS n_phone,
             regexp_replace(regexp_replace(t, '"""
    + _PAT_EMAIL
    + """', '<EMAIL>', 'g'), '"""
    + _PAT_PHONE
    + """', '<PHONE>', 'g') AS red
      FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN n_email + n_phone > 0 THEN 1 END) AS BIGINT)
             AS n_docs_with_pii,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(len(t) - len(red)) AS BIGINT) AS chars_removed
    FROM scrubbed GROUP BY source ORDER BY source
"""
)


@register(
    "q202_pii_redaction",
    _Q202_ORACLE,
    doc="PII scrub pass (C4/Gopher-style): email + phone patterns "
    "counted and replaced with placeholder tags in one "
    "regexp-expression pass — no UDFs, stateless, mergeable per "
    "shard. Synthetic PII planted deterministically in-plan so the "
    "audit is non-vacuous and both engines replay it exactly.",
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).when(
        F.col("doc_id") % 7 == 3,
        F.concat(
            F.col("text"),
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    t = docs.select("doc_id", "source", aug.alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(F.col("t"), _PAT_EMAIL, "<EMAIL>"),
        _PAT_PHONE,
        "<PHONE>",
    )
    scrubbed = t.select(
        "source",
        F.regexp_count(F.col("t"), F.lit(_PAT_EMAIL)).alias("n_email"),
        F.regexp_count(F.col("t"), F.lit(_PAT_PHONE)).alias("n_phone"),
        (F.length("t") - F.length(red)).alias("delta"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(
                F.when(F.col("n_email") + F.col("n_phone") > 0, 1)
            ).alias("n_docs_with_pii"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("delta").cast("bigint").alias("chars_removed"),
        )
        .orderBy("source")
    )
