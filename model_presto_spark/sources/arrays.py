"""NPY array scan/sink (S6/S12) and sharded-parquet sink (S15).

Reference semantics: training chips are .npy blobs on object
storage, packed 144 records to a tar shard and consumed shuffled
(reference: src/data_module.py:22-23 npy load;
presto-tolbi/presto/eval/cropharvest_extensions.py:489-499 npy/h5;
presto-tolbi/presto/dataops/dataset.py:31,70-117 144-record shards,
sorted tar packing).

Spark-first: npy decode is a real (numpy ships in every executor)
``binaryFile`` + ``mapInPandas`` decode; the shard sink is
``repartitionByRange`` + ``maxRecordsPerFile`` — Spark's native
answer to webdataset tar packing, keeping shard size bounded and
sorted within files (O4 ``sortWithinPartitions``).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

N_RECORDS_IN_SHARD = 144  # reference: dataset.py:31


def read_npy(spark: SparkSession, path: str) -> DataFrame:
    """Scan .npy files into (path, shape, values) rows — one row per
    file, values flattened float64. Shape travels with the data so
    consumers can reassemble tensors."""

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, r in pdf.iterrows():
                arr = np.load(io.BytesIO(bytes(r["content"])), allow_pickle=False)
                out.append(
                    {
                        "path": r["path"].rsplit("/", 1)[-1],
                        "shape": [int(s) for s in arr.shape],
                        "values": arr.astype("float64").ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=["path", "shape", "values"])

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(decode, "path string, shape array<int>, values array<double>")
    )


def write_npy(df: DataFrame, values_col: str, name_col: str, out_dir: str) -> None:
    """NPY sink: one .npy per row, written from executors via
    foreachPartition (no driver materialization). Paths must be on a
    shared filesystem (or object store via hadoop) — same contract as
    the reference's chip writer (src/process_data.py:76-82)."""
    import os

    def write_part(rows):
        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            arr = np.asarray(r[values_col], dtype="float64")
            np.save(os.path.join(out_dir, f"{r[name_col]}.npy"), arr)

    df.select(name_col, values_col).foreachPartition(write_part)


def write_sharded_parquet(
    df: DataFrame,
    out_dir: str,
    shard_key: str,
    records_per_shard: int = N_RECORDS_IN_SHARD,
    num_shards: int | None = None,
) -> None:
    """Shard-packed sink (S15): range-partition by the shard key,
    sort within partitions, cap records per file — the parquet
    equivalent of 144-record sorted tar shards uploaded to GCS
    (dataset.py:70-117). ``maxRecordsPerFile`` bounds file size
    without a second shuffle."""
    part = df.repartitionByRange(
        num_shards or df.sparkSession.sparkContext.defaultParallelism,
        shard_key,
    ).sortWithinPartitions(shard_key)
    (
        part.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .parquet(out_dir)
    )
