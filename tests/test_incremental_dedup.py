"""Incremental cross-batch dedup: ledger semantics, wave-over-wave
dedup, and replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F


def _wave(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_core_in_batch_and_store_dedup(spark):
    from model_presto_spark.streaming.incremental_dedup import (
        dedup_batch_against_store,
    )
    from model_presto_spark.functions.text import fingerprint60

    batch = _wave(
        spark,
        [
            (1, "alpha beta"),
            (2, "alpha beta"),      # in-batch dup of 1
            (3, "gamma delta"),
            (4, "seen before"),     # already in store
        ],
    )
    store = _wave(spark, [(99, "seen before")]).select(
        fingerprint60(F.col("text")).alias("fingerprint")
    )
    out = dedup_batch_against_store(batch, store, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    # no store at all (first batch): only in-batch dedup applies
    out0 = dedup_batch_against_store(batch, None, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out0.collect()) == [1, 3, 4]


def test_incremental_ingest_across_waves(spark, tmp_path):
    from model_presto_spark.streaming.incremental_dedup import (
        incremental_dedup_ingest,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def run():
        q = incremental_dedup_ingest(
            spark, landing, corpus, ledger, ckpt, schema
        )
        q.awaitTermination(120)

    # wave 1
    _wave(spark, [(1, "doc one"), (2, "doc two"), (3, "doc one")]).coalesce(
        1
    ).write.mode("append").parquet(landing)
    run()
    got1 = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in got1.collect()) == [1, 2]

    # wave 2: one genuinely new doc, one cross-wave duplicate
    _wave(spark, [(10, "doc three"), (11, "doc one")]).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run()
    got2 = spark.read.parquet(corpus)
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 2, 10]

    # ledger holds exactly the surviving fingerprints
    led = spark.read.parquet(ledger)
    assert led.count() == 3
    assert led.select("fingerprint").distinct().count() == 3

    # wave 3: all duplicates -> nothing appended anywhere
    _wave(spark, [(20, "doc one"), (21, "doc three")]).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run()
    assert spark.read.parquet(corpus).count() == 3
    assert spark.read.parquet(ledger).count() == 3


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a committed batch (fresh checkpoint over the same
    landing data and sinks) must not duplicate corpus rows: the
    per-batch dynamic partition overwrite rewrites the same
    ingest_batch partition."""
    from model_presto_spark.streaming.incremental_dedup import (
        incremental_dedup_ingest,
    )

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    schema = "doc_id long, text string"

    _wave(spark, [(1, "only doc")]).coalesce(1).write.mode("append").parquet(
        landing
    )
    q1 = incremental_dedup_ingest(
        spark, landing, corpus, ledger, str(tmp_path / "ck_a"), schema
    )
    q1.awaitTermination(120)
    # simulate the worst-case replay: a brand-new checkpoint reruns
    # batch 0 over the same landing files with the sinks already
    # written (this is strictly harsher than a checkpoint recovery,
    # which would skip the committed batch entirely)
    q2 = incremental_dedup_ingest(
        spark, landing, corpus, ledger, str(tmp_path / "ck_b"), schema
    )
    q2.awaitTermination(120)

    assert spark.read.parquet(corpus).count() == 1
    assert spark.read.parquet(ledger).count() == 1
