"""Top-k nearest-neighbor join over vector columns.

Reference semantics: minkowski p=2 kNN over 128-d embeddings with
k ∈ {5, 20, 100} (reference: presto-tolbi/presto/eval/knn.py:4-73).

Spark-first design:
- Exact baseline: broadcast the (small) probe side, crossJoin against
  the candidate set, compute the distance with JVM-side array
  expressions (``zip_with`` + ``aggregate`` — no Python UDF), then
  ``row_number`` per probe. The candidate scan stays fully
  distributed; per-probe work is a map-side broadcast join, so this
  scales to arbitrarily large candidate tables as long as the probe
  set fits in a broadcast (the reference's eval sets always do).
- Scale path for large probe sets: LSH bucketing (see
  ``model_presto_spark.operators.dedup`` for the MinHash machinery;
  random-hyperplane LSH for cosine) to turn the cross product into a
  bucket-equi-join. Exposed via ``ann_lsh_join``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_METRICS = ("sqeuclidean", "cosine", "dot")


def _qt(name: str) -> str:
    """Backtick-quote an identifier for SQL-string expressions."""
    return f"`{name}`"


def _distance_sql(qv: str, cv: str, metric: str) -> str:
    """SQL-string twin of ``_distance`` (guide §7.3): one ``F.expr``
    parse instead of ~170 py4j round-trips of Column-API fold
    construction per distance tree. The strings spell the IDENTICAL
    expression trees — per-element double casts inside the lambdas,
    same operand order, ``0.0D`` for the double zero literal (a bare
    SQL ``0.0`` parses as DECIMAL) — so fold arithmetic stays
    bit-identical to the Column version and to the DuckDB oracle
    (tests/test_knn_sql.py pins equality on all three metrics)."""
    if metric == "sqeuclidean":
        return (
            f"aggregate(zip_with({qv}, {cv}, (a, b) -> "
            f"(CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) * "
            f"(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), "
            f"0.0D, (acc, x) -> acc + x)"
        )
    dot = (
        f"aggregate(zip_with({qv}, {cv}, (a, b) -> "
        f"CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), "
        f"0.0D, (a, x) -> a + x)"
    )
    if metric == "dot":
        return f"-({dot})"  # larger dot = nearer
    if metric == "cosine":
        nq = (
            f"SQRT(aggregate({qv}, 0.0D, "
            f"(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        nc = (
            f"SQRT(aggregate({cv}, 0.0D, "
            f"(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        return f"1.0D - {dot} / ({nq} * {nc})"
    raise ValueError(f"metric must be one of {_METRICS}")


def _distance(qv, cv, metric: str):
    # Per-ELEMENT double casts inside the lambdas: callers pass raw
    # float arrays (an upfront array<double> cast would be inlined by
    # CollapseProject into the fold and re-cast the whole vector per
    # element), and the per-element cast keeps products/norms in
    # double precision so near-tie top-k rank boundaries agree with
    # a double-precision oracle.
    if metric == "sqeuclidean":
        return F.aggregate(
            F.zip_with(
                qv,
                cv,
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    dot = F.aggregate(
        F.zip_with(qv, cv, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    if metric == "dot":
        return -dot  # larger dot = nearer
    if metric == "cosine":
        nq = F.sqrt(
            F.aggregate(
                qv, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
            )
        )
        nc = F.sqrt(
            F.aggregate(
                cv, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
            )
        )
        return 1.0 - dot / (nq * nc)
    raise ValueError(f"metric must be one of {_METRICS}")


def knn_join(
    probes: DataFrame,
    candidates: DataFrame,
    probe_id: str,
    cand_id: str,
    probe_vec: str = "vec",
    cand_vec: str = "vec",
    k: int = 5,
    metric: str = "sqeuclidean",
    exclude_self: bool = False,
) -> DataFrame:
    """Return (probe_id, cand_id, dist, rank) for each probe's top-k.

    Deterministic: ties broken by ascending candidate id. ``dist`` is
    squared L2 / cosine distance / negative dot per ``metric``.
    """
    from model_presto_spark.io import spread

    # String-expression build throughout (guide §7.3): the Column-API
    # construction of this plan cost ~770-1270 py4j round-trips per
    # query build (q35/q45, measured with tools/py4j_count.py); the
    # SQL strings parse JVM-side to the same Catalyst trees.
    p = probes.selectExpr(
        f"{_qt(probe_id)} AS __pid", f"{_qt(probe_vec)} AS __pvec"
    )
    # spread the candidate side: the per-pair distance folds run in
    # the candidate scan's stage (the probe side is broadcast), and a
    # single-file scan would serialize all O(n_cand * n_probe * dim)
    # fold work onto one core (io.spread docstring; same class as the
    # dedup hashing passes). Honors spark.model_presto.spread.mode.
    c = spread(
        candidates.selectExpr(
            f"{_qt(cand_id)} AS __cid", f"{_qt(cand_vec)} AS __cvec"
        )
    )
    pairs = c.crossJoin(F.broadcast(p))
    if exclude_self:
        pairs = pairs.where("__pid != __cid")
    scored = pairs.selectExpr(
        "__pid",
        "__cid",
        f"{_distance_sql('__pvec', '__cvec', metric)} AS __dist",
    )
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY __pid "
            "ORDER BY __dist ASC, __cid ASC) AS rank",
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(
            f"__pid AS {_qt(probe_id)}",
            f"__cid AS {_qt(cand_id)}",
            "__dist AS dist",
            "rank",
        )
    )


def ivf_knn_join(
    probes: DataFrame,
    candidates: DataFrame,
    probe_id: str,
    cand_id: str,
    probe_vec: str = "vec",
    cand_vec: str = "vec",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    metric: str = "sqeuclidean",
    exclude_self: bool = False,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN: a KMeans coarse quantizer
    partitions candidates into ``n_lists`` cells; each probe scores
    only the ``n_probe`` nearest cells' members.

    The scale path when the probe side is too large to broadcast and
    hyperplane-LSH recall is insufficient: candidate lists are a
    *partitioned* layout (shuffle once on cell id, reusable across
    queries), and per-probe work drops from O(N) to O(N·n_probe/
    n_lists). Training samples the candidate set; assignment and the
    cell-restricted scoring are plain joins + window — the pattern of
    every IVF system, expressed relationally.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cvec = F.col(cand_vec).cast("array<double>")
    cands = candidates.select(
        F.col(cand_id).alias("__cid"), cvec.alias("__cvec"),
        array_to_vector(cvec).alias("__feat"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(cands.select("__feat"))
    indexed = model.transform(cands).select("__cid", "__cvec", "__cell")

    # probe -> its n_probe nearest centroids (centroids are tiny:
    # embed as a literal table, crossJoin + rank)
    cents = [
        (int(i), [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = probes.sparkSession
    cent_df = spark.createDataFrame(
        cents, "__cell int, __centroid array<double>"
    )
    pvec = F.col(probe_vec).cast("array<double>")
    p = probes.select(F.col(probe_id).alias("__pid"), pvec.alias("__pvec"))
    pc = p.crossJoin(F.broadcast(cent_df))
    cdist = _distance(F.col("__pvec"), F.col("__centroid"), "sqeuclidean")
    wcell = Window.partitionBy("__pid").orderBy(cdist.asc(), F.col("__cell").asc())
    probe_cells = (
        pc.withColumn("__crank", F.row_number().over(wcell))
        .filter(F.col("__crank") <= n_probe)
        .select("__pid", "__pvec", "__cell")
    )

    # score only same-cell pairs (equi-join on cell id)
    pairs = probe_cells.join(indexed, "__cell")
    if exclude_self:
        pairs = pairs.filter(F.col("__pid") != F.col("__cid"))
    dist = _distance(F.col("__pvec"), F.col("__cvec"), metric)
    scored = pairs.select("__pid", "__cid", dist.alias("__dist")).dropDuplicates(
        ["__pid", "__cid"]
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__dist").asc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__pid").alias(probe_id),
            F.col("__cid").alias(cand_id),
            F.col("__dist").alias("dist"),
            "rank",
        )
    )


def knn_classify(
    probes: DataFrame,
    candidates: DataFrame,
    probe_id: str,
    cand_id: str,
    label_col: str,
    probe_vec: str = "vec",
    cand_vec: str = "vec",
    k: int = 5,
    metric: str = "sqeuclidean",
    exclude_self: bool = False,
) -> DataFrame:
    """kNN majority-vote classification (reference:
    presto-tolbi/presto/eval/knn.py:4-73 — predict by vote of the k
    nearest embeddings; used at eval.py:201-203 with k in {5,20,100}).

    Returns (probe_id, predicted, votes). Deterministic tie-break:
    highest vote count, then smallest label.
    """
    nn = knn_join(
        probes,
        candidates,
        probe_id=probe_id,
        cand_id=cand_id,
        probe_vec=probe_vec,
        cand_vec=cand_vec,
        k=k,
        metric=metric,
        exclude_self=exclude_self,
    )
    labeled = nn.join(
        candidates.selectExpr(_qt(cand_id), f"{_qt(label_col)} AS __lbl"),
        cand_id,
    )
    votes = labeled.groupBy(probe_id, "__lbl").agg(F.expr("count(1) AS votes"))
    return (
        votes.selectExpr(
            "*",
            f"row_number() OVER (PARTITION BY {_qt(probe_id)} "
            f"ORDER BY votes DESC, __lbl ASC) AS __rn",
        )
        .where("__rn = 1")
        .selectExpr(_qt(probe_id), "__lbl AS predicted", "votes")
    )


def hyperplane_weights(dim: int, planes: int, prefix: str = "hp") -> list[list[float]]:
    """Deterministic md5-derived hyperplane weights, computed once on
    the driver — w[j][d-1] = (h60('hp{j}_{d}') % 2001 - 1000) / 1000.

    Hashing happens here in Python, never per row: the weights embed
    into the plan as literals (and into the DuckDB oracle SQL as the
    same literals), so any engine reproduces identical buckets with
    zero per-row hash cost.
    """
    import hashlib

    def w(j: int, d: int) -> float:
        h = int(hashlib.md5(f"{prefix}{j}_{d}".encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    return [[w(j, d) for d in range(1, dim + 1)] for j in range(planes)]


def _weights_sql(weights: list[list[float]]) -> str:
    """SQL literal: array of per-plane weight arrays (valid in Spark
    SQL with array(...) and in DuckDB with [...] — use former)."""
    planes = ", ".join(
        "array(" + ", ".join(repr(x) for x in row) + ")" for row in weights
    )
    return f"array({planes})"


def _hyperplane_bucket_sql(vec_sql: str, dim: int, planes: int, prefix: str = "hp") -> str:
    """Spark SQL for a random-hyperplane LSH bucket id.

    Sequential d = 1..dim fold and literal weights => bit-identical
    dot products (hence buckets) across engines.
    """
    ws = _weights_sql(hyperplane_weights(dim, planes, prefix))
    return f"""aggregate(
        transform(sequence(0, {planes - 1}), j ->
          CASE WHEN aggregate(sequence(1, {dim}), cast(0.0 as double),
                 (acc, d) -> acc + cast(element_at({vec_sql}, d) as double)
                             * element_at(element_at({ws}, j + 1), d)) > 0
          THEN shiftleft(1, j) ELSE 0 END),
        0, (acc, x) -> acc + x)"""


def ann_lsh_join(
    probes: DataFrame,
    candidates: DataFrame,
    probe_id: str,
    cand_id: str,
    probe_vec: str = "vec",
    cand_vec: str = "vec",
    k: int = 5,
    dim: int = 64,
    planes: int = 8,
) -> DataFrame:
    """Approximate NN: random-hyperplane LSH bucket equi-join + exact
    cosine rerank within the bucket.

    The scale path for large probe sets: both sides compute an
    integer bucket id (2^planes buckets), the crossJoin becomes a
    bucket equi-join (shuffle on bucket id), and only same-bucket
    pairs are scored. Recall < 1 by construction; raise ``planes``
    fan-out (multi-probe) or run multiple tables for higher recall.
    """
    from model_presto_spark.functions.vectors import cosine_similarity_sql
    from model_presto_spark.io import spread

    # String-expression build (guide §7.3) — same Catalyst trees as
    # the former Column construction, a fraction of the py4j
    # round-trips (the bucket folds were already SQL strings).
    p = probes.selectExpr(
        f"{_qt(probe_id)} AS __pid",
        f"{_qt(probe_vec)} AS __pvec",
        f"{_hyperplane_bucket_sql(probe_vec, dim, planes)} AS __bucket",
    )
    # spread BEFORE the bucket projection: the planes*dim hyperplane
    # fold is the heavy per-row work and must not inherit a
    # single-file scan's one-task partitioning (io.spread docstring).
    c = spread(
        candidates.selectExpr(
            f"{_qt(cand_id)} AS __cid", f"{_qt(cand_vec)} AS __cvec"
        )
    ).selectExpr(
        "__cid",
        "__cvec",
        f"{_hyperplane_bucket_sql('__cvec', dim, planes)} AS __bucket",
    )
    pairs = c.join(p, "__bucket").where("__pid != __cid")
    scored = pairs.selectExpr(
        "__pid",
        "__cid",
        f"{cosine_similarity_sql('__pvec', '__cvec')} AS __sim",
    )
    return (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY __pid "
            "ORDER BY __sim DESC, __cid ASC) AS rank",
        )
        .where(f"rank <= {int(k)}")
        .selectExpr(
            f"__pid AS {_qt(probe_id)}",
            f"__cid AS {_qt(cand_id)}",
            "__sim AS cosine_sim",
            "rank",
        )
    )


def build_ivf_index(
    candidates: DataFrame,
    cand_id: str,
    path: str,
    cand_vec: str = "vec",
    n_lists: int = 16,
    seed: int = 42,
) -> None:
    """Persist an IVF index: KMeans centroids + a CELL-PARTITIONED
    candidate layout (``path/centroids`` + ``path/cells/cell=N/``).

    Build once, probe many: the expensive parts (quantizer fit, the
    one shuffle that co-locates each cell) happen here; every later
    ``ivf_index_search`` reads only its probes' n_probe cells —
    dynamic partition pruning turns cell selection into skipped I/O,
    so a search touches ~n_probe/n_lists of the index bytes. This is
    the on-disk shape every IVF system uses, expressed as a hive
    layout.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cvec = F.col(cand_vec).cast("array<double>")
    cands = candidates.select(
        F.col(cand_id).alias("cid"), cvec.alias("cvec"),
        array_to_vector(cvec).alias("__feat"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="__feat", predictionCol="cell")
    model = km.fit(cands.select("__feat"))
    indexed = model.transform(cands).select("cid", "cvec", "cell")
    indexed.write.partitionBy("cell").mode("overwrite").parquet(f"{path}/cells")

    spark = candidates.sparkSession
    cents = [
        (int(i), [float(x) for x in c])
        for i, c in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(cents, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_search(
    spark,
    path: str,
    probes: DataFrame,
    probe_id: str,
    probe_vec: str = "vec",
    k: int = 5,
    n_probe: int = 2,
    metric: str = "sqeuclidean",
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k search against a persisted IVF index (see
    ``build_ivf_index``). Returns (probe_id, cid, dist, rank).

    The probe->cell assignment broadcasts (centroids are tiny), and
    the cells scan is joined on the PARTITION column — Spark's
    dynamic partition pruning drops every unprobed cell directory
    from the scan at runtime (tests assert the dynamicpruning
    expression is in the plan).
    """
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cent_df = spark.createDataFrame(
        [(int(r.cell), [float(x) for x in r.centroid]) for r in cent_rows],
        "cell int, centroid array<double>",
    )
    pvec = F.col(probe_vec).cast("array<double>")
    p = probes.select(F.col(probe_id).alias("__pid"), pvec.alias("__pvec"))
    cdist = _distance(F.col("__pvec"), F.col("centroid"), "sqeuclidean")
    wcell = Window.partitionBy("__pid").orderBy(cdist.asc(), F.col("cell").asc())
    probe_cells = (
        p.crossJoin(F.broadcast(cent_df))
        .withColumn("__crank", F.row_number().over(wcell))
        .filter(F.col("__crank") <= n_probe)
        .select("__pid", "__pvec", "cell")
    )

    cells = spark.read.parquet(f"{path}/cells")
    pairs = cells.join(F.broadcast(probe_cells), "cell")
    if exclude_self:
        pairs = pairs.filter(F.col("__pid") != F.col("cid"))
    dist = _distance(F.col("__pvec"), F.col("cvec"), metric)
    scored = pairs.select("__pid", "cid", dist.alias("__dist")).dropDuplicates(
        ["__pid", "cid"]
    )
    w = Window.partitionBy("__pid").orderBy(
        F.col("__dist").asc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__pid").alias(probe_id),
            "cid",
            F.col("__dist").alias("dist"),
            "rank",
        )
    )


def _max_abs(df: DataFrame, vec_col: str) -> float:
    """Scalar global max-|element| of a vector column (one agg job)."""
    vec = F.col(vec_col).cast("array<double>")
    m = df.select(
        F.max(
            F.aggregate(vec, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
        ).alias("m")
    ).collect()[0]["m"]
    return float(m or 0.0)


def quantize_vectors(
    df: DataFrame, vec_col: str, out_col: str = "qvec"
) -> tuple[DataFrame, float]:
    """Symmetric int8 scalar quantization of an embedding column.

    One pass computes the global max-|x| (a scalar), then every
    vector encodes as ``round(x / scale)`` int8 — 1/8th the shuffle
    and storage bytes of float64 arrays, which is what a 100 TB ANN
    index actually ships around. Returns (df + out_col, scale);
    ``scale² * sq_euclidean_int(qa, qb)`` approximates the float
    distance, preserving neighbor ranking to quantization error.
    """
    scale = (_max_abs(df, vec_col) or 1.0) / 127.0
    vec = F.col(vec_col).cast("array<double>")
    q = df.withColumn(
        out_col,
        F.transform(vec, lambda x: F.round(x / F.lit(scale)).cast("tinyint")),
    )
    return q, scale


def quantized_knn_join(
    probes: DataFrame,
    candidates: DataFrame,
    probe_id: str,
    cand_id: str,
    probe_vec: str = "vec",
    cand_vec: str = "vec",
    k: int = 5,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact-shape kNN over int8-quantized vectors: same broadcast
    top-k plan as ``knn_join`` but the per-pair arithmetic and every
    shuffled row use 1-byte elements. Approximate by quantization
    only — recall vs float is bounded by the quantization step
    (tested >0.9); re-rank the top-k with float vectors when exact
    order matters."""
    from model_presto_spark.functions.vectors import sq_euclidean_int

    # shared scale keeps the metric consistent across both sides:
    # two scalar max-|x| jobs, then one quantization pass per side
    scale = max(
        _max_abs(probes, probe_vec), _max_abs(candidates, cand_vec)
    ) / 127.0 or 1.0 / 127.0

    def _q(df, id_c, vec_c, out):
        return df.select(
            F.col(id_c).alias(out[0]),
            F.transform(
                F.col(vec_c).cast("array<double>"),
                lambda x: F.round(x / F.lit(scale)).cast("tinyint"),
            ).alias(out[1]),
        )

    requant_p = _q(probes, probe_id, probe_vec, ("__pid", "__qp"))
    requant_c = _q(candidates, cand_id, cand_vec, ("__cid", "__qc"))

    pairs = requant_c.crossJoin(F.broadcast(requant_p))
    if exclude_self:
        pairs = pairs.filter(F.col("__pid") != F.col("__cid"))
    dist = sq_euclidean_int(F.col("__qp"), F.col("__qc")) * F.lit(scale * scale)
    w = Window.partitionBy("__pid").orderBy(
        F.col("__dist").asc(), F.col("__cid").asc()
    )
    return (
        pairs.select("__pid", "__cid", dist.alias("__dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__pid").alias(probe_id),
            F.col("__cid").alias(cand_id),
            F.col("__dist").alias("dist"),
            "rank",
        )
    )


def ivf_index_append(
    spark,
    path: str,
    candidates: DataFrame,
    cand_id: str,
    cand_vec: str = "vec",
) -> None:
    """Incrementally add vectors to a persisted IVF index WITHOUT
    rebuilding: new vectors assign to the EXISTING centroids
    (broadcast argmin — no KMeans refit) and append into their cell
    partitions. The maintenance path a continuously-ingesting corpus
    needs; quantizer drift is bounded by how stationary the
    embedding distribution is — rebuild with build_ivf_index when
    drift (e.g. psi_drift on distances) says so. Searches see the
    appended vectors immediately (same layout, same pruning)."""
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cent_df = spark.createDataFrame(
        [(int(r["cell"]), [float(x) for x in r["centroid"]]) for r in cent_rows],
        "cell int, centroid array<double>",
    )
    cvec = F.col(cand_vec).cast("array<double>")
    c = candidates.select(F.col(cand_id).alias("cid"), cvec.alias("cvec"))
    d = _distance(F.col("cvec"), F.col("centroid"), "sqeuclidean")
    w = Window.partitionBy("cid").orderBy(d.asc(), F.col("cell").asc())
    assigned = (
        c.crossJoin(F.broadcast(cent_df))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("cid", "cvec", "cell")
    )
    assigned.write.partitionBy("cell").mode("append").parquet(f"{path}/cells")
