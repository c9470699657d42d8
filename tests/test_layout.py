"""Z-order layout: key locality and file-level pruning effect."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _grid_df(spark, n=64):
    rows = [
        (float(x), float(y), x * n + y)
        for x, y in itertools.product(range(n), range(n))
    ]
    return spark.createDataFrame(rows, "x double, y double, v long")


def test_zorder_key_is_morton(spark):
    from model_presto_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)], "x double, y double"
    )
    out = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), (0.0, 1.0), (0.0, 1.0), bits=1).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # bit 1 <- x, bit 0 <- y
    assert got == {(0.0, 0.0): 0, (0.0, 1.0): 1, (1.0, 0.0): 2, (1.0, 1.0): 3}


def test_zorder_layout_prunes_bbox_reads(spark, tmp_path):
    """A small bbox query over the Z-ordered layout must touch a
    fraction of the files; the same query over a round-robin layout
    touches all of them."""
    from model_presto_spark.operators.layout import write_zordered

    n, n_files = 64, 16
    df = _grid_df(spark, n)
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "roundrobin")
    write_zordered(df, zpath, "x", "y", (0.0, 64.0), (0.0, 64.0), n_files)
    df.repartition(n_files).write.mode("overwrite").parquet(rpath)

    bbox = (F.col("x") >= 8) & (F.col("x") < 16) & (F.col("y") >= 8) & (F.col("y") < 16)

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .filter(bbox)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files = files_touched(zpath)
    r_files = files_touched(rpath)
    # same answer either way
    zc = spark.read.parquet(zpath).filter(bbox).count()
    rc = spark.read.parquet(rpath).filter(bbox).count()
    assert zc == rc == 8 * 8
    # locality: the 1/64-area box lives in a handful of z-runs
    assert r_files == n_files
    assert z_files <= n_files // 4


def test_ordered_run_counts_matches_global_window(spark):
    """Bucketed run counting == the single-task global-window count,
    including runs that span bucket boundaries and single-row
    buckets."""
    import random

    from pyspark.sql import Window

    from model_presto_spark.operators.layout import ordered_run_counts

    rng = random.Random(7)
    # key k is the total order; bucket floor(k/10) is monotone in it.
    # values change with varying stride so runs regularly straddle
    # the k=10,20,... boundaries; k=95 leaves a final 1-row bucket.
    rows = [
        (k, rng.choice("ab"), rng.randrange(3))
        for k in list(range(95)) + [95]
    ]
    df = spark.createDataFrame(rows, "k int, s string, m int")

    w = Window.orderBy("k")
    brute = (
        df.select(
            (F.col("s") != F.lag("s").over(w)).cast("int").alias("ds"),
            (F.col("m") != F.lag("m").over(w)).cast("int").alias("dm"),
        )
        .agg(
            (1 + F.sum("ds")).alias("s_runs"),
            (1 + F.sum("dm")).alias("m_runs"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    got = ordered_run_counts(
        df, ["k"], ["s", "m"], F.floor(F.col("k") / 10)
    ).collect()[0]
    assert got.n == brute.n == 96
    assert got.s_runs == brute.s_runs
    assert got.m_runs == brute.m_runs


def test_ordered_run_counts_constant_and_alternating(spark):
    """Closed-form edges: a constant column is 1 run; a column that
    changes every row is n runs — regardless of bucketing."""
    from model_presto_spark.operators.layout import ordered_run_counts

    df = spark.createDataFrame(
        [(i, 1, i % 2) for i in range(40)], "k int, c int, alt int"
    )
    got = ordered_run_counts(
        df, ["k"], ["c", "alt"], F.floor(F.col("k") / 7)
    ).collect()[0]
    assert got.n == 40
    assert got.c_runs == 1
    assert got.alt_runs == 40


def test_ordered_run_counts_guards(spark):
    """Round-6 hardening: empty input -> n=0/runs=0; __orc_ column
    collision rejected; check_monotone fails the job on a
    non-monotone bucket and passes on a monotone one."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from model_presto_spark.operators.layout import ordered_run_counts

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "k int, v int"
    )
    empty = df.filter(F.col("k") < 0)
    row = ordered_run_counts(
        empty, ["k"], ["v"], F.floor(F.col("k") / 5)
    ).collect()[0]
    assert row.n == 0 and row.v_runs == 0

    with pytest.raises(ValueError, match="__orc_"):
        ordered_run_counts(
            df.withColumn("__orc_rb", F.lit(1)),
            ["k"],
            ["v"],
            F.floor(F.col("k") / 5),
        )

    # monotone bucket: assertion passes, counts unchanged
    ok = ordered_run_counts(
        df, ["k"], ["v"], F.floor(F.col("k") / 5), check_monotone=True
    ).collect()[0]
    base = ordered_run_counts(
        df, ["k"], ["v"], F.floor(F.col("k") / 5)
    ).collect()[0]
    assert (ok.n, ok.v_runs) == (base.n, base.v_runs)

    # non-monotone bucket (k % 4 interleaves the order): job fails
    with pytest.raises(SparkRuntimeException, match="not monotone"):
        ordered_run_counts(
            df, ["k"], ["v"], F.col("k") % 4, check_monotone=True
        ).collect()


def test_ordered_positions_matches_global_window(spark):
    """Bucketed global positions == the single-task global window's
    row_number, including single-row and empty-leading buckets."""
    import random

    from pyspark.sql import Window

    from model_presto_spark.operators.layout import ordered_positions

    rng = random.Random(13)
    rows = [(k, rng.randrange(100)) for k in rng.sample(range(1000), 200)]
    df = spark.createDataFrame(rows, "k int, v int")
    brute = {
        r.k: r.pos
        for r in df.select(
            "k", F.row_number().over(Window.orderBy("k")).alias("pos")
        ).collect()
    }
    got = {
        r.k: r.pos
        for r in ordered_positions(
            df, ["k"], F.floor(F.col("k") / 37)
        ).collect()
    }
    assert got == brute
    with __import__("pytest").raises(ValueError, match="__opos_"):
        ordered_positions(
            df.withColumn("__opos_b", F.lit(1)), ["k"], F.floor(F.col("k") / 37)
        )
