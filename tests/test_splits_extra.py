"""Tests: interleave (U5), sample_with_memory (R7), paginate (T5),
HTTP text list (S9), scientific-format gating, early stopping (M8)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_interleave(spark):
    from model_presto_spark.operators.splits import interleave

    a = spark.createDataFrame([Row(x=1), Row(x=2)])
    b = spark.createDataFrame([Row(x=10), Row(x=20)])
    out = [r.x for r in interleave(a, b).collect()]
    assert out == [1, 10, 2, 20]


def test_sample_with_memory_no_replacement(spark):
    from model_presto_spark.operators.splits import sample_with_memory

    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).alias("y")
    )
    first, off1 = sample_with_memory(df, "y", "id", 3)
    second, off2 = sample_with_memory(df, "y", "id", 3, off1)
    ids1 = {r.id for r in first.collect()}
    ids2 = {r.id for r in second.collect()}
    assert len(ids1) == 6 and len(ids2) == 6
    assert not ids1 & ids2  # memory prevents re-draws
    assert off2 == {0: 6, 1: 6}
    # deterministic resume: first 3 even ids then next 3
    assert sorted(r.id for r in first.filter(F.col("y") == 0).collect()) == [0, 2, 4]
    assert sorted(r.id for r in second.filter(F.col("y") == 0).collect()) == [6, 8, 10]


def test_paginate(spark):
    from model_presto_spark.operators.splits import paginate

    df = spark.range(25).select(F.col("id"))
    out = paginate(df, ["id"], 10)
    sizes = {r.page: r.n for r in out.groupBy("page").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 10, 1: 10, 2: 5}


def test_read_http_text_list_file_url(spark, tmp_path):
    from model_presto_spark.sources.scientific import read_http_text_list

    p = tmp_path / "split.txt"
    p.write_text("img_001\nimg_002\n\nimg_003\n")
    out = [r.value for r in read_http_text_list(spark, p.as_uri()).collect()]
    assert out == ["img_001", "img_002", "img_003"]


def test_scientific_scans_native(spark, tmp_path):
    # NetCDF classic and HDF5 (default subset) decode natively
    # (sources/netcdf3.py, sources/hdf5lite.py) — no import gate left
    # on the happy path.
    import numpy as np

    from model_presto_spark.sources import scientific as sci
    from model_presto_spark.sources.hdf5lite import encode_hdf5

    (tmp_path / "a.h5").write_bytes(encode_hdf5({"d": np.array([1.0, 2.0])}))
    rows = sci.read_hdf5(spark, str(tmp_path), "d").collect()
    assert sorted(r.value for r in rows) == [1.0, 2.0]


def test_early_stopping():
    from model_presto_spark.ml.heads import EarlyStopping

    es = EarlyStopping(patience=2)
    seq = [1.0, 0.8, 0.9, 0.85]  # improves, then 2 bad epochs
    stops = [es.should_stop(v) for v in seq]
    assert stops == [False, False, False, True]
    es2 = EarlyStopping(patience=2)
    assert not any(es2.should_stop(v) for v in [3.0, 2.0, 1.0, 0.5])


def test_weighted_hash_sample_properties(spark):
    from model_presto_spark.operators.splits import weighted_hash_sample

    rows = [(i, "s", 1.0) for i in range(100)] + [(100, "s", 1e9)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, w double")
    got = weighted_hash_sample(df, "doc_id", "w", 10, strata_cols=["src"])
    out = got.collect()
    assert len(out) == 10
    # the ~1e9x-weight row wins the exponential race
    ranks = {r.doc_id: r.sample_rank for r in out}
    assert ranks[100] == 1
    # deterministic across invocations
    again = {r.doc_id: r.sample_rank for r in
             weighted_hash_sample(df, "doc_id", "w", 10,
                                  strata_cols=["src"]).collect()}
    assert again == ranks
    # per-stratum cap respected with two strata
    two = df.withColumn("src", (F.col("doc_id") % 2).cast("string"))
    per = (weighted_hash_sample(two, "doc_id", "w", 7, strata_cols=["src"])
           .groupBy("src").count().collect())
    assert {r["count"] for r in per} == {7}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from model_presto_spark.io import read_orc, write_orc

    path = str(tmp_path / "orc_tbl")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        F.sha1(F.col("id").cast("string")).alias("s"),
    )
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.count() == 1000
    filtered = back.where(F.col("k") == 3).select("id")
    assert filtered.count() == df.where("id % 7 = 3").count()
    # predicate reaches the ORC scan
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "k" in plan.split("PushedFilters")[1][:80]


def test_kfold_stratified_exact_and_deterministic(spark):
    from model_presto_spark.operators.splits import kfold

    rows = [(i, "pos" if i % 3 == 0 else "neg") for i in range(101)]
    df = spark.createDataFrame(rows, "id bigint, label string")
    out = kfold(df, "id", k=5, strata_cols=["label"])
    got = {(r.id): (r.label, r.fold) for r in out.collect()}
    assert len(got) == 101
    # exact stratification: each fold has floor/ceil(n_s/5) per class
    from collections import Counter

    per = Counter((lab, f) for lab, f in got.values())
    for lab, n_s in (("pos", 34), ("neg", 67)):
        sizes = [per[(lab, f)] for f in range(5)]
        assert sum(sizes) == n_s
        assert max(sizes) - min(sizes) <= 1
    # deterministic: re-run identical
    again = {r.id: r.fold for r in kfold(df, "id", 5, ["label"]).collect()}
    assert all(again[i] == f for i, (_, f) in got.items())
    # folds partition the data: train+test per fold covers everything
    f0_test = {i for i, (_, f) in got.items() if f == 0}
    f0_train = {i for i, (_, f) in got.items() if f != 0}
    assert f0_test | f0_train == set(got) and not (f0_test & f0_train)


def test_kfold_plain_hash_mode(spark):
    import pytest

    from model_presto_spark.operators.splits import kfold

    df = spark.range(1000).withColumnRenamed("id", "key")
    out = kfold(df, "key", k=4)
    sizes = {
        r.fold: r.c
        for r in out.groupBy("fold").agg(F.count("*").alias("c")).collect()
    }
    assert set(sizes) == {0, 1, 2, 3}
    assert all(150 < c < 350 for c in sizes.values())  # roughly uniform
    with pytest.raises(ValueError, match=">= 2"):
        kfold(df, "key", k=1)
