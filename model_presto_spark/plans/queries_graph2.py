"""Conformance queries: graph/ML-diagnostics family #2 (q137+) —
HITS hubs & authorities (integer-exact unrolled iterations) and
kNN-disagreement label-noise detection. Oracle conventions as
everywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import R6_SQL, _t, r6, register
from model_presto_spark.plans.queries_ml import _SQDIST

_R6 = R6_SQL
_r6 = r6


# ---------------------------------------------------------------------------
# Q137 — HITS hubs/authorities, 2 unrolled iterations, integer-exact
# ---------------------------------------------------------------------------
# Keeping scores un-normalized keeps every intermediate an integer
# (a1 = indegree; h2 = sum of neighbor indegrees; a2 = sum of
# neighbor h2) so both engines agree bit-for-bit regardless of
# summation order; the single normalizing division happens once at
# the end, under ROUND.
_Q137_ORACLE = f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_suppkey AS v
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ), a1 AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS a FROM edges GROUP BY v
    ), h2 AS (
      SELECT e.u, CAST(SUM(a1.a) AS BIGINT) AS h
      FROM edges e JOIN a1 ON a1.v = e.v GROUP BY e.u
    ), a2 AS (
      SELECT e.v, CAST(SUM(h2.h) AS BIGINT) AS a
      FROM edges e JOIN h2 ON h2.u = e.u GROUP BY e.v
    ), tot AS (SELECT SUM(a) AS s FROM a2)
    SELECT v AS supplier, a AS authority_raw,
           {_R6.format(x='CAST(a AS DOUBLE) / CAST((SELECT s FROM tot) AS DOUBLE)')}
             AS authority
    FROM a2
    ORDER BY a DESC, v ASC LIMIT 20
"""


@register(
    "q137_hits",
    _Q137_ORACLE,
    doc="HITS hubs/authorities over the customer->supplier purchase "
    "graph, 2 unrolled iterations (operators/graph.py hits). "
    "Un-normalized integer scores until the single final division "
    "keep cross-engine sums exact; each iteration is one edge "
    "equi-join + one groupBy — the same shuffle shape PageRank uses.",
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.graph import hits

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    auth = hits(edges, "src", "dst", iterations=2)
    return (
        auth.select(
            F.col("dst").alias("supplier"),
            F.col("authority_raw"),
            _r6(F.col("authority")).alias("authority"),
        )
        .orderBy(F.col("authority_raw").desc(), F.col("supplier").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q138 — label-noise candidates via kNN disagreement
# ---------------------------------------------------------------------------
_Q138_K = 5
_Q138_NPROBE = 40

_Q138_ORACLE = f"""
    WITH p AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id < {_Q138_NPROBE}
    ), scored AS (
      SELECT p.vec_id AS probe_id, p.label AS own_label,
             c.vec_id AS cid, c.label AS nbr_label,
             {_SQDIST.format(a='p.embedding', b='c.embedding')} AS dist
      FROM p CROSS JOIN embeddings c
      WHERE p.vec_id <> c.vec_id
    ), topk AS (
      SELECT probe_id, own_label, nbr_label FROM (
        SELECT probe_id, own_label, nbr_label,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY dist ASC, cid ASC) AS rn
        FROM scored) WHERE rn <= {_Q138_K}
    )
    SELECT probe_id, own_label,
           CAST(SUM(CASE WHEN nbr_label <> own_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           CAST(SUM(CASE WHEN nbr_label <> own_label THEN 1 ELSE 0 END)
                >= 3 AS BOOLEAN) AS noisy
    FROM topk
    GROUP BY probe_id, own_label
"""


@register(
    "q138_label_noise",
    _Q138_ORACLE,
    doc="Label-noise detection by kNN disagreement (confident-"
    "learning style): each probe's 5 nearest neighbors vote; >=3 "
    "disagreements flag the label. Reuses the broadcast-probe "
    "knn_join (operators/knn.py) — candidates stream, probes "
    "broadcast, no shuffle of the big side.",
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.knn import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _Q138_NPROBE)
    nn = knn_join(
        probes.withColumnRenamed("vec_id", "probe_id"),
        emb.withColumnRenamed("vec_id", "cid"),
        probe_id="probe_id",
        cand_id="cid",
        probe_vec="embedding",
        cand_vec="embedding",
        k=_Q138_K,
        metric="sqeuclidean",
        exclude_self=True,
    )
    own = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("own_label")
    )
    nbr = emb.select(F.col("vec_id").alias("cid"), F.col("label").alias("nbr_label"))
    joined = nn.join(F.broadcast(own), "probe_id").join(F.broadcast(nbr), "cid")
    dis = F.sum(
        F.when(F.col("nbr_label") != F.col("own_label"), 1).otherwise(0)
    )
    return joined.groupBy("probe_id", "own_label").agg(
        dis.cast("bigint").alias("n_disagree"),
        (dis >= 3).alias("noisy"),
    )
