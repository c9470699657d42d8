"""MERGE-style parquet upsert: insert/update/delete semantics,
dynamic-partition scope, replay idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _rows(spark, path):
    return {
        r.k: (r.v, r.day)
        for r in spark.read.parquet(path).collect()
    }


def test_merge_upsert_full_semantics(spark, tmp_path):
    from model_presto_spark.io import merge_upsert

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
        "k bigint, v string, day string",
    )
    merge_upsert(spark, path, base, ["k"])
    assert _rows(spark, path) == {1: ("a", "d1"), 2: ("b", "d1"), 3: ("c", "d2")}

    batch = spark.createDataFrame(
        [
            (2, "B", "d1", False),   # update
            (4, "d", "d2", False),   # insert
            (3, None, "d2", True),   # delete
        ],
        "k bigint, v string, day string, is_delete boolean",
    )
    merge_upsert(spark, path, batch, ["k"], delete_col="is_delete")
    assert _rows(spark, path) == {1: ("a", "d1"), 2: ("B", "d1"), 4: ("d", "d2")}

    # replaying the same batch is a no-op (idempotent maintenance)
    merge_upsert(spark, path, batch, ["k"], delete_col="is_delete")
    assert _rows(spark, path) == {1: ("a", "d1"), 2: ("B", "d1"), 4: ("d", "d2")}


def test_merge_upsert_dynamic_partition_scope(spark, tmp_path):
    """Only partitions named by the batch are rewritten."""
    from model_presto_spark.io import merge_upsert

    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3")],
        "k bigint, v string, day string",
    )
    merge_upsert(spark, path, base, ["k"], partition_cols=("day",))
    d3_files = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }

    batch = spark.createDataFrame(
        [(2, "B", "d2", False), (9, "z", "d1", False), (1, None, "d1", True)],
        "k bigint, v string, day string, is_delete boolean",
    )
    merge_upsert(
        spark, path, batch, ["k"], partition_cols=("day",), delete_col="is_delete"
    )
    assert _rows(spark, path) == {2: ("B", "d2"), 3: ("c", "d3"), 9: ("z", "d1")}
    # the untouched d3 partition files were not rewritten
    after = {
        f: os.path.getmtime(os.path.join(path, "day=d3", f))
        for f in os.listdir(os.path.join(path, "day=d3"))
        if f.endswith(".parquet")
    }
    assert after == d3_files


def test_merge_upsert_delete_empties_partition(spark, tmp_path):
    """A delete-only batch that empties a whole partition must remove
    its rows (dynamic overwrite alone would leave the old files)."""
    from model_presto_spark.io import merge_upsert

    path = str(tmp_path / "etbl")
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d2")], "k bigint, v string, day string"
    )
    merge_upsert(spark, path, base, ["k"], partition_cols=("day",))
    batch = spark.createDataFrame(
        [(1, None, "d1", True)], "k bigint, v string, day string, is_delete boolean"
    )
    merge_upsert(
        spark, path, batch, ["k"], partition_cols=("day",), delete_col="is_delete"
    )
    assert _rows(spark, path) == {2: ("b", "d2")}
    assert not os.path.exists(os.path.join(path, "day=d1"))


def test_merge_upsert_random_batches_match_dict_model(spark, tmp_path):
    """Model-based check: a sequence of random upsert/delete batches
    applied through merge_upsert equals a plain dict replay."""
    import random

    from model_presto_spark.io import merge_upsert

    rng = random.Random(29)
    path = str(tmp_path / "mtbl")
    model = {}
    days = ["d1", "d2", "d3"]

    for step in range(4):
        batch = []
        for _ in range(rng.randint(2, 6)):
            k = rng.randint(0, 9)
            day = model.get(k, (None, rng.choice(days)))[1]  # partition-stable
            if k in model and rng.random() < 0.3:
                batch.append((k, None, day, True))
                model.pop(k, None)
            else:
                v = f"v{step}_{rng.randint(0, 99)}"
                batch.append((k, v, day, False))
                model[k] = (v, day)
        # last write for a key within one batch wins in the model;
        # make batches key-unique to keep semantics unambiguous
        seen = {}
        for row in batch:
            seen[row[0]] = row
        batch = list(seen.values())
        for k, v, day, is_del in batch:
            if is_del:
                model.pop(k, None)
            else:
                model[k] = (v, day)
        bdf = spark.createDataFrame(
            batch, "k bigint, v string, day string, is_delete boolean"
        )
        if step == 0:
            merge_upsert(
                spark, path,
                bdf.where(~bdf.is_delete).drop("is_delete"),
                ["k"], partition_cols=("day",),
            )
            model = {
                k: (v, day) for k, v, day, d in batch if not d
            }
        else:
            merge_upsert(
                spark, path, bdf, ["k"],
                partition_cols=("day",), delete_col="is_delete",
            )
        got = _rows(spark, path)
        assert got == model, f"step {step}: {got} != {model}"
