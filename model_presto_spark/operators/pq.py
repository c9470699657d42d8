"""Product quantization (PQ) for embedding columns — the
memory-bound end of the ANN spectrum.

Scalar int8 quantization (knn.quantize_vectors) compresses 8x; PQ
compresses ``dim * 8 bytes`` down to ``m`` bytes per vector (64-d
float64 -> 8 bytes at m=8): each vector splits into ``m`` subspaces
and every subvector is replaced by the id of its nearest entry in a
per-subspace codebook of ``n_codes`` centroids. Distances are then
computed *asymmetrically* (ADC): a probe builds one ``m x n_codes``
lookup table of exact subspace distances, and every candidate's
distance is ``m`` table lookups + adds — no float arithmetic per
pair. This is the layout a 100 TB vector corpus actually ships
through a shuffle: the codes relation is ~1% of the float relation.

Spark mapping:
- codebooks train with seeded Lloyd's iterations on a driver-side
  sample (bounded, standard practice — production PQ systems train
  on 10^4-10^5 samples regardless of corpus size) and ride to
  executors inside the task closure (a few KB);
- ``pq_encode`` is one vectorized mapInPandas pass (argmin over
  n_codes per subspace, numpy-batched);
- ``pq_knn_join`` broadcasts the probe set (same bounded-probe
  contract as knn.knn_join), scores candidates partition-locally
  with the LUTs, keeps each partition's top-k, and resolves the
  global top-k with one tiny window over ~k x #partitions rows per
  probe — candidates are never globally sorted.
- optional exact re-rank of a ``rerank``-sized shortlist restores
  near-exact recall while touching float vectors for only the
  shortlist.

Reference anchor: embedding similarity surface of SURVEY §2
(brute-force Q35, LSH Q40, IVF t:test_graph_ivf); PQ is the public
Jegou et al. 2011 design re-expressed on DataFrames.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    n_codes: int = 16,
    sample_limit: int = 20000,
    iters: int = 20,
    seed: int = 42,
) -> np.ndarray:
    """Fit per-subspace codebooks -> ndarray (m, n_codes, dim/m).

    Trains on up to ``sample_limit`` vectors pulled to the driver
    (pre-sample with splits.hash_rank_sample for a uniform subset of
    a huge corpus). Seeded k-means++ init + Lloyd's iterations;
    empty clusters reseed to the farthest point, so all n_codes
    entries stay live."""
    rows = df.select(vec_col).limit(sample_limit).collect()
    X = np.asarray([r[0] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        # k-means++ seeding
        cents = [Xs[rng.integers(n)]]
        for _ in range(n_codes - 1):
            d2 = np.min(
                ((Xs[:, None, :] - np.asarray(cents)[None]) ** 2).sum(-1), axis=1
            )
            probs = d2 / max(d2.sum(), 1e-12)
            cents.append(Xs[rng.choice(n, p=probs)])
        C = np.asarray(cents)
        for _ in range(iters):
            assign = ((Xs[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    C[c] = Xs[mask].mean(0)
                else:  # reseed empty cluster to the farthest point
                    far = ((Xs - C[assign]) ** 2).sum(-1).argmax()
                    C[c] = Xs[far]
        books[s] = C
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    out_col: str = "codes",
) -> DataFrame:
    """vector -> m-byte PQ code (array<tinyint>), vectorized batch
    argmin per subspace."""
    m, n_codes, dsub = codebooks.shape
    books = codebooks.copy()

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int8)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d = ((Xs[:, None, :] - books[s][None]) ** 2).sum(-1)
                codes[:, s] = d.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, out_col: list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        go, f"{id_col} bigint, {out_col} array<tinyint>"
    )


def pq_knn_join(
    probes: DataFrame,
    encoded: DataFrame,
    probe_id: str,
    cand_id: str,
    codebooks: np.ndarray,
    probe_vec: str = "vec",
    codes_col: str = "codes",
    k: int = 5,
    candidates: DataFrame | None = None,
    cand_vec: str = "vec",
    rerank: int = 0,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k by asymmetric PQ distance: (probe_id, cand_id, dist,
    rank). Probes are broadcast (bounded-probe contract, as
    knn_join); candidates stream partition-locally, each partition
    emits its top-shortlist, one small window resolves the global
    order. With ``rerank > 0`` (requires ``candidates`` carrying the
    float vectors), the PQ shortlist of that size is re-scored with
    exact distances before the final top-k — the standard
    two-stage ADC + re-rank pipeline."""
    m, n_codes, dsub = codebooks.shape
    books = codebooks.copy()
    probe_rows = probes.select(probe_id, probe_vec).collect()
    P = np.asarray([r[1] for r in probe_rows], dtype=np.float64)
    pids = np.asarray([r[0] for r in probe_rows], dtype=np.int64)
    # one LUT per probe: exact subspace distances to every codeword
    luts = np.empty((len(P), m, n_codes))
    for s in range(m):
        Ps = P[:, s * dsub : (s + 1) * dsub]
        luts[:, s, :] = ((Ps[:, None, :] - books[s][None]) ** 2).sum(-1)
    shortlist = max(k, rerank)

    def go(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.asarray(list(pdf[codes_col]), dtype=np.int64)
            cids = pdf[cand_id].values
            out_p, out_c, out_d = [], [], []
            sub = np.arange(m)
            for i in range(len(P)):
                dists = luts[i][sub[:, None], codes.T].sum(0)
                if exclude_self:
                    dists = np.where(cids == pids[i], np.inf, dists)
                top = min(shortlist, len(dists))
                idx = np.argpartition(dists, top - 1)[:top]
                idx = idx[np.isfinite(dists[idx])]
                top = len(idx)
                out_p.extend([pids[i]] * top)
                out_c.extend(cids[idx])
                out_d.extend(dists[idx])
            yield pd.DataFrame(
                {"__pid": out_p, "__cid": out_c, "__dist": out_d}
            )

    scored = encoded.select(cand_id, codes_col).mapInPandas(
        go, "__pid bigint, __cid bigint, __dist double"
    )
    w = Window.partitionBy("__pid").orderBy(
        F.col("__dist").asc(), F.col("__cid").asc()
    )
    if rerank and candidates is not None:
        short = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= rerank)
            .drop("r", "__dist")
        )
        from model_presto_spark.functions.vectors import sq_euclidean

        cands = candidates.select(
            F.col(cand_id).alias("__cid"),
            F.col(cand_vec).cast("array<double>").alias("__cvec"),
        )
        pdf_ = probes.sparkSession.createDataFrame(
            [(int(p), [float(x) for x in v]) for p, v in zip(pids, P)],
            "__pid bigint, __pvec array<double>",
        )
        scored = short.join(cands, "__cid").join(
            F.broadcast(pdf_), "__pid"
        ).select(
            "__pid",
            "__cid",
            sq_euclidean(F.col("__pvec"), F.col("__cvec")).alias("__dist"),
        )
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
