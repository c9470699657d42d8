"""CDC apply, feature hashing, and negative-pair operator tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_apply_changes_merge_semantics(spark):
    from model_presto_spark.operators.cdc import apply_changes

    snap = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, seq=1, op="U", v="a1"),
            Row(k=1, seq=2, op="U", v="a2"),  # latest wins
            Row(k=2, seq=5, op="D", v=None),  # delete
            Row(k=3, seq=1, op="D", v=None),
            Row(k=3, seq=2, op="U", v="c2"),  # update after delete -> kept
            Row(k=4, seq=1, op="U", v="d"),   # insert of unseen key
            Row(k=5, seq=1, op="D", v=None),  # delete of absent key: no-op
        ]
    )
    got = {
        r.k: r.v
        for r in apply_changes(
            snap, changes, key_cols=["k"], value_cols=["v"]
        ).collect()
    }
    assert got == {1: "a2", 3: "c2", 4: "d"}


def test_hashed_features_deterministic_and_sparse(spark):
    from model_presto_spark.functions.features import hashed_features

    df = spark.createDataFrame(
        [Row(id=1, text="the cat sat on the mat"), Row(id=2, text="the cat")]
    )
    a = sorted(map(tuple, hashed_features(df, "id", "text", dim=32).collect()))
    b = sorted(map(tuple, hashed_features(df, "id", "text", dim=32).collect()))
    assert a == b  # stateless determinism
    # same token always lands in the same signed bucket: doc2's
    # ("the","cat") entries must appear within doc1's buckets
    d1 = {(r[1]): r[2] for r in a if r[0] == 1}
    d2 = {(r[1]): r[2] for r in a if r[0] == 2}
    for bucket in d2:
        assert bucket in d1 or d1 == {}  # bucket seen in doc1 too ("the" x2)
    # weights bounded by token counts
    assert all(abs(w) <= 6 for w in d1.values())


def test_negative_pairs_exact_k_no_self(spark):
    from model_presto_spark.operators.pairs import negative_pairs

    df = spark.createDataFrame([Row(doc_id=i) for i in range(40)])
    got = negative_pairs(df, "doc_id", k=3).collect()
    # every anchor gets exactly k negatives, never itself
    per_anchor: dict[int, list[int]] = {}
    for r in got:
        per_anchor.setdefault(r.anchor_id, []).append(r.neg_id)
        assert r.neg_id != r.anchor_id
    assert len(per_anchor) == 40
    assert all(len(v) == 3 for v in per_anchor.values())
    # deterministic across invocations
    again = negative_pairs(df, "doc_id", k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
