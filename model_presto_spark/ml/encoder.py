"""Distributed encoder inference over pixel time-series.

Reference semantics (M1): a lightweight transformer encoder maps one
pixel's ``[12 timesteps x n_bands]`` series (+ month index) to a
fixed-width embedding; eval drivers batch 4096 rows through it
(reference: presto-tolbi/presto/presto.py:218-422 — Encoder with
mean-pool over tokens at :415-421; batch driver
presto-tolbi/presto/eval/eval.py:171-185, batch size at :31).

Spark-first design:
- The model is **driver-initialized numpy weights broadcast once**
  to executors (J11); inference is an **Arrow-batched pandas UDF**
  (iterator form, so per-executor setup — weight unpacking — runs
  once per partition, not once per batch).
- Batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (X6), mirroring
  the reference's 4096.
- No torch dependency: the container has numpy only, and a depth-1
  attention encoder is a few matmuls. The point is the *engine
  plumbing* — broadcast + Arrow + columnar batching — which is
  identical for any real checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

NUM_TIMESTEPS = 12  # reference: s1_s2_era5_srtm.py:89
DEFAULT_BANDS = 18
DEFAULT_DIM = 64
EMBED_DIM = 128  # reference: presto.py:221


def make_weights(
    seed: int = 42,
    n_bands: int = DEFAULT_BANDS,
    d: int = DEFAULT_DIM,
    out: int = EMBED_DIM,
) -> dict[str, np.ndarray]:
    """Deterministic small-encoder weights (stand-in checkpoint)."""
    rng = np.random.default_rng(seed)

    def w(*shape: int) -> np.ndarray:
        return (rng.standard_normal(shape) / np.sqrt(shape[0])).astype(np.float32)

    return {
        "w_in": w(n_bands, d),
        "b_in": np.zeros(d, dtype=np.float32),
        "w_q": w(d, d),
        "w_k": w(d, d),
        "w_v": w(d, d),
        "w_o": w(d, d),
        "w_ff": w(d, out),
        "b_ff": np.zeros(out, dtype=np.float32),
        "pos": _month_encoding(d),
        # decoder head (M2): token representation -> per-band
        # reconstruction (reference Decoder, presto.py:424-560)
        "w_dec": w(out, n_bands),
        "b_dec": np.zeros(n_bands, dtype=np.float32),
    }


def _month_encoding(d: int) -> np.ndarray:
    """Sinusoidal month encoding table (12, d) (reference month
    encodings, presto.py:161-194)."""
    pos = np.arange(12, dtype=np.float32)[:, None]
    i = np.arange(d, dtype=np.float32)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / d)
    enc = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return enc.astype(np.float32)


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def encode_batch(
    x: np.ndarray, start_month: np.ndarray, wt: dict[str, np.ndarray],
    mask: np.ndarray | None = None,
    return_tokens: bool = False,
) -> np.ndarray:
    """Forward pass: (B, T, bands) + (B,) start months -> (B, out).

    Depth-1 self-attention block + feed-forward + masked mean-pool
    (the reference mean-pools encoder tokens over *unmasked*
    positions, presto.py:415-421). ``mask`` is (B, T) bool, True =
    token masked out of attention and pooling.
    ``return_tokens=True`` skips pooling and returns the (B, T, out)
    token representations (the decoder input for M2).
    """
    b, t, _ = x.shape
    h = x.astype(np.float32) @ wt["w_in"] + wt["b_in"]  # (B,T,d)
    months = (start_month[:, None] + np.arange(t)[None, :]) % 12  # cyclic W10
    h = h + wt["pos"][months]  # (B,T,d)
    q, k, v = h @ wt["w_q"], h @ wt["w_k"], h @ wt["w_v"]
    scores = q @ k.transpose(0, 2, 1) / np.sqrt(h.shape[-1])  # (B,T,T)
    if mask is not None:
        scores = np.where(mask[:, None, :], -1e9, scores)
    h = h + _softmax(scores) @ v @ wt["w_o"]
    h = np.maximum(h @ wt["w_ff"] + wt["b_ff"], 0.0)  # (B,T,out)
    if return_tokens:
        return h.astype(np.float32)
    if mask is not None:
        keep = (~mask)[:, :, None].astype(np.float32)
        denom = np.maximum(keep.sum(axis=1), 1.0)
        return ((h * keep).sum(axis=1) / denom).astype(np.float32)
    return h.mean(axis=1).astype(np.float32)


def reconstruct_batch(
    x: np.ndarray,
    start_month: np.ndarray,
    wt: dict[str, np.ndarray],
    mask: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """MAE reconstruction (M2): encode with masked tokens hidden from
    attention, decode every token back to band space, and score the
    reconstruction ONLY on masked positions (the masked-autoencoder
    objective; reference Decoder presto.py:424-560, loss on masked
    tokens in train.py).

    Returns ``(recon, mse)``: the (B, T, bands) reconstruction and
    the per-row mean squared error over masked (timestep, band)
    cells (0.0 for rows with nothing masked).
    """
    tokens = encode_batch(x, start_month, wt, mask=mask, return_tokens=True)
    recon = tokens @ wt["w_dec"] + wt["b_dec"]  # (B,T,bands)
    m = mask[:, :, None].astype(np.float32)  # score masked cells only
    sq = (recon - x.astype(np.float32)) ** 2 * m
    mse = sq.sum(axis=(1, 2)) / np.maximum(
        mask.sum(axis=1).astype(np.float32) * x.shape[2], 1.0
    )
    return recon.astype(np.float32), mse.astype(np.float32)


def add_embeddings(
    df: DataFrame,
    ts_col: str,
    month_col: str,
    weights: dict[str, np.ndarray] | None = None,
    out_col: str = "embedding",
) -> DataFrame:
    """Append an ``array<float>`` embedding column computed by the
    broadcast-weights pandas UDF.

    ``ts_col`` is an ``array<array<float>>`` column shaped [T][bands];
    ``month_col`` the integer start month (0-11).
    """
    spark = df.sparkSession
    wt = weights if weights is not None else make_weights()
    bc = spark.sparkContext.broadcast(wt)

    @F.pandas_udf(ArrayType(FloatType()))
    def _encode(
        it: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        w = bc.value  # unpacked once per partition (iterator form)
        for ts, months in it:
            # Arrow hands nested lists as object arrays; stack level by
            # level so ragged inputs fail loudly instead of silently.
            x = np.stack(
                [
                    np.stack([np.asarray(b, dtype=np.float32) for b in row])
                    for row in ts
                ]
            )
            m = months.to_numpy(dtype=np.int64)
            out = encode_batch(x, m, w)
            yield pd.Series(list(out))

    return df.withColumn(out_col, _encode(F.col(ts_col), F.col(month_col)))


def add_reconstruction_error(
    df: DataFrame,
    ts_col: str,
    month_col: str,
    mask_col: str,
    weights: dict[str, np.ndarray] | None = None,
    out_col: str = "recon_mse",
) -> DataFrame:
    """Append the masked-autoencoder reconstruction error (M2): mask
    -> encode (masked tokens hidden) -> decode -> MSE on masked cells
    only, as a broadcast-weights Arrow-batched pandas UDF — the same
    engine plumbing as ``add_embeddings`` (J11/X6), decoder included.

    ``mask_col`` is an ``array<boolean>`` timestep mask (True =
    masked), e.g. from ml/masking.py strategies.
    """
    from pyspark.sql.types import FloatType as _FloatType

    spark = df.sparkSession
    wt = weights if weights is not None else make_weights()
    bc = spark.sparkContext.broadcast(wt)

    @F.pandas_udf(_FloatType())
    def _recon(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        w = bc.value
        for ts, months, masks in it:
            x = np.stack(
                [
                    np.stack([np.asarray(b, dtype=np.float32) for b in row])
                    for row in ts
                ]
            )
            m = months.to_numpy(dtype=np.int64)
            mk = np.stack([np.asarray(r, dtype=bool) for r in masks])
            _, mse = reconstruct_batch(x, m, w, mk)
            yield pd.Series(mse)

    return df.withColumn(
        out_col, _recon(F.col(ts_col), F.col(month_col), F.col(mask_col))
    )
