"""Cross-batch stateful streaming: token-budget sampler
(applyInPandasWithState) — state must survive across micro-batches
AND across query restarts via the checkpoint."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _land(spark, path, rows):
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "n_tokens"])
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, landing, checkpoint, out_dir, budget):
    from model_presto_spark.streaming.stateful import token_budget_sample

    stream = spark.readStream.schema(
        "source string, doc_id bigint, n_tokens bigint"
    ).parquet(landing)
    q = (
        token_budget_sample(stream, "source", "n_tokens", "doc_id", budget)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.source, r.doc_id): r.cum_tokens
        for r in spark.read.parquet(out_dir).collect()
    }


def test_token_budget_across_restarts(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # batch 1: srcA uses 60 of 100; srcB overflows immediately
    _land(
        spark,
        landing,
        [("srcA", 1, 40), ("srcA", 2, 20), ("srcB", 1, 150)],
    )
    out1 = _run(spark, landing, ckpt, out_dir, budget=100)
    assert out1 == {("srcA", 1): 40, ("srcA", 2): 60}

    # batch 2 (new files, RESTARTED query, same checkpoint): srcA's
    # remaining budget is 40 — doc 3 (30) fits, doc 4 (30) would
    # exceed; srcB still has full-budget-blocked state? No: srcB kept
    # nothing, so its used=0 and doc 2 (50) fits.
    _land(
        spark,
        landing,
        [("srcA", 3, 30), ("srcA", 4, 30), ("srcB", 2, 50)],
    )
    out2 = _run(spark, landing, ckpt, out_dir, budget=100)
    assert out2 == {
        ("srcA", 1): 40,
        ("srcA", 2): 60,
        ("srcA", 3): 90,
        ("srcB", 2): 50,
    }


def test_streaming_budget_equals_batch_analog(spark, tmp_path):
    """The stateful streaming sampler and the q62 window-cumsum batch
    analog implement the SAME prefix-truncation semantics: identical
    kept rows on identical input."""
    from model_presto_spark.functions.text import token_count
    from model_presto_spark.plans.queries_llm2 import q62

    sf = "/root/testdata/sf0.001"
    batch = {
        (r.source, r.doc_id): r.cum_tokens for r in q62(spark, sf).collect()
    }

    from model_presto_spark.io import load_table

    docs = load_table(spark, sf, "documents").select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    landing = str(tmp_path / "landing")
    docs.coalesce(1).write.parquet(landing)
    out = _run(
        spark,
        landing,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        budget=2000,
    )
    assert out == batch and len(out) > 0
