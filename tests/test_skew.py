"""Skew-mitigation operator tests."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_salted_count_matches_plain(spark):
    from model_presto_spark.operators.skew import salted_count

    # one pathologically hot key
    df = spark.range(5000).select(
        F.when(F.col("id") < 4500, "hot").otherwise(F.col("id").cast("string")).alias("k")
    )
    got = {r.k: r.n for r in salted_count(df, "k", buckets=8).collect()}
    assert got["hot"] == 4500
    assert sum(got.values()) == 5000


def test_salted_join_matches_plain(spark):
    from model_presto_spark.operators.skew import salted_join

    big = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([Row(k="a", tag=1), Row(k="b", tag=2)])
    out = salted_join(big, small, "k", buckets=4)
    assert out.count() == 2000
    plain = big.join(small, "k")
    assert (
        out.groupBy("k").agg(F.sum("v").alias("s")).orderBy("k").collect()
        == plain.groupBy("k").agg(F.sum("v").alias("s")).orderBy("k").collect()
    )


def test_skew_stats(spark):
    from model_presto_spark.operators.skew import skew_stats

    from pyspark.sql import functions as F

    # 1000 rows: key 'hot' holds 40%, the rest spread over 60 keys
    df = spark.range(1000).select(
        F.when(F.col("id") < 400, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 60).cast("string")))
        .alias("key")
    )
    s = skew_stats(df, "key", top=3).collect()[0]
    assert s.n_rows == 1000 and s.n_keys == 61
    assert abs(s.max_share - 0.4) < 1e-9
    assert s.top_keys[0].k == "hot" and s.top_keys[0].n == 400
    assert len(s.top_keys) == 3


def test_cap_key_multiplicity_sample_bounds_pairs(spark):
    """Zipfian key histogram: the hot key's d^2 pair expansion is
    bounded at cap^2 after the guard; cool keys are untouched."""
    from model_presto_spark.operators.skew import cap_key_multiplicity

    # Zipf-ish: key z0 has 1000 rows, z1 has 500, ..., tail keys 1-5
    df = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit("z0"))
        .when(F.col("id") < 1500, F.lit("z1"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    capped = cap_key_multiplicity(df, "k", cap=50, mode="sample")
    per_key = {r.k: r.n for r in
               capped.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key["z0"] == 50 and per_key["z1"] == 50
    # tail keys (5 rows each) untouched
    assert all(n == 5 for k, n in per_key.items() if k.startswith("t"))
    # pair expansion after the cap is bounded: sum d_k^2 <= n_keys*cap^2
    a = capped.select("k", F.col("v").alias("v1"))
    b = capped.select("k", F.col("v").alias("v2"))
    n_pairs = a.join(b, "k").where(F.col("v1") < F.col("v2")).count()
    assert n_pairs <= 2 * (50 * 49 // 2) + 100 * (5 * 4 // 2)
    # determinism: same input -> same sampled subset
    again = cap_key_multiplicity(df, "k", cap=50, mode="sample")
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, again.collect()))


def test_cap_key_multiplicity_drop(spark):
    from model_presto_spark.operators.skew import cap_key_multiplicity

    df = spark.range(120).select(
        F.when(F.col("id") < 100, F.lit("hot")).otherwise(
            F.concat(F.lit("c"), F.col("id").cast("string"))
        ).alias("k")
    )
    out = cap_key_multiplicity(df, "k", cap=10, mode="drop", log_label="t")
    keys = {r.k for r in out.select("k").distinct().collect()}
    assert "hot" not in keys and len(keys) == 20


def test_cap_noop_below_cap_exact_parity(spark):
    """Cap above the true max multiplicity -> bit-identical output
    (the oracle-parity guarantee q152 relies on)."""
    from model_presto_spark.operators.skew import cap_key_multiplicity

    df = spark.range(300).select(
        (F.col("id") % 30).alias("k"), F.col("id").alias("v")
    )
    out = cap_key_multiplicity(df, "k", cap=100, mode="sample")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_adamic_adar_hub_cap_zipfian(spark):
    """Scale-free star + clique: capping hub neighbors bounds wedge
    count; uncapped and over-capped runs agree exactly."""
    from model_presto_spark.operators.graph import adamic_adar

    rows = []
    # hub 0 connected to 1..200 (star) -> 200*199/2 wedges through hub
    rows += [(0, i) for i in range(1, 201)]
    # small clique 300..305
    rows += [(i, j) for i in range(300, 306) for j in range(i + 1, 306)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    exact = adamic_adar(edges)
    over = adamic_adar(edges, max_neighbor_deg=10_000)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, over.collect()))
    capped = adamic_adar(edges, max_neighbor_deg=50)
    # hub (deg 200) wedges gone; clique wedges (neighbors deg<=5) remain
    assert capped.count() < exact.count()
    assert capped.where(F.col("u") >= 300).count() == exact.where(F.col("u") >= 300).count()


def test_triangle_stats_out_deg_cap(spark):
    """Cap above the degree-ordered max out-degree keeps the exact
    triangle count (degree ordering already bounds it at O(sqrt m))."""
    from model_presto_spark.operators.graph import triangle_stats

    rows = [(i, j) for i in range(12) for j in range(i + 1, 12)]  # K12
    edges = spark.createDataFrame(rows, "src bigint, dst bigint")
    exact = triangle_stats(edges).collect()[0]
    assert exact.n_triangles == 12 * 11 * 10 // 6
    capped = triangle_stats(edges, max_out_deg=11).collect()[0]
    assert capped.n_triangles == exact.n_triangles
    # a firing cap bounds (and undercounts) rather than exploding
    small = triangle_stats(edges, max_out_deg=3).collect()[0]
    assert 0 < small.n_triangles <= exact.n_triangles
