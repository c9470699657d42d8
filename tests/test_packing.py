"""Distributed prefix sum == global window; sequence packing
invariants (bin fill, offsets, split accounting)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture()
def lens_df(spark):
    rows = [(i, (i * 37) % 97 + 1) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tok int")


def test_prefix_sum_matches_global_window(spark, lens_df):
    from model_presto_spark.operators.packing import prefix_sum

    got = prefix_sum(lens_df, ["doc_id"], "n_tok", "c", partitions=7)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = lens_df.withColumn("c", F.sum("n_tok").over(w))
    g = {(r.doc_id, r.c) for r in got.collect()}
    assert g == {(r.doc_id, r.c) for r in want.collect()}
    # partition-count invariance
    g3 = {
        (r.doc_id, r.c)
        for r in prefix_sum(
            lens_df, ["doc_id"], "n_tok", "c", partitions=3
        ).collect()
    }
    assert g3 == g


def test_pack_sequences_invariants(spark, lens_df):
    from model_presto_spark.operators.packing import pack_sequences

    L = 128
    packed = pack_sequences(lens_df, "n_tok", L).collect()
    total = sum(r.n_tokens_in_bin for r in packed)
    assert total == sum((i * 37) % 97 + 1 for i in range(200))
    by_bin = {}
    for r in packed:
        by_bin.setdefault(r.bin_id, []).append(r)
        assert 0 <= r.offset_in_bin < L
        assert 1 <= r.n_tokens_in_bin <= L
    last = max(by_bin)
    for b, rows in by_bin.items():
        fill = sum(r.n_tokens_in_bin for r in rows)
        # every bin is exactly full except possibly the last
        assert fill == L or (b == last and fill <= L)
        # exactly one carried doc per bin (the one split across the
        # boundary), except bin 0 which starts fresh
        n_carried = sum(1 for r in rows if r.carried)
        if b == 0:
            assert n_carried == 0
        else:
            prev_fill = sum(r.n_tokens_in_bin for r in by_bin[b - 1])
            assert n_carried <= 1 and prev_fill == L
    # per-doc reassembly: each doc's slices tile it contiguously
    by_doc = {}
    for r in packed:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.n_tokens_in_bin
    assert by_doc[0] == 1 and by_doc[1] == 38


def test_pack_drops_zero_length(spark):
    from model_presto_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 0), (2, 5)], "doc_id bigint, n_tok int"
    )
    got = pack_sequences(df, "n_tok", 16).collect()
    assert {r.doc_id for r in got} == {2}


def test_pack_long_doc_spans_many_bins(spark):
    from model_presto_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, 1000), (2, 10)], "doc_id bigint, n_tok int"
    )
    rows = sorted(
        pack_sequences(df, "n_tok", 64).collect(),
        key=lambda r: (r.doc_id, r.bin_id),
    )
    one = [r for r in rows if r.doc_id == 1]
    # 1000 tokens somewhere in a 1010-token stream -> 16 or 17 bins
    assert len(one) in (16, 17)
    assert sum(r.n_tokens_in_bin for r in one) == 1000
    # all interior slices fill their bin end-to-end
    for r in one[1:-1]:
        assert r.offset_in_bin == 0 and r.n_tokens_in_bin == 64 and r.carried
    assert not one[0].carried
