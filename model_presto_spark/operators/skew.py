"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases at runtime
(session.py turns it on); these explicit tools cover the two places
AQE can't help: (a) a single hot *aggregation* key whose partial
aggregate is itself huge, (b) a broadcast-ineligible join against a
dimension where one key dominates (the classic web-corpus "empty
string / null URL" key). Salting = deterministic key spreading, so
it composes with retries and speculative execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(key: Column, buckets: int, *cols: Column) -> Column:
    """Deterministic salt in [0, buckets) derived from row content
    (xxhash64 of extra columns), appended to the key."""
    h = F.xxhash64(*cols) if cols else F.monotonically_increasing_id()
    return F.struct(key.alias("k"), F.pmod(h, F.lit(buckets)).alias("salt"))


def salted_count(
    df: DataFrame, key: str, buckets: int = 32, salt_cols: list[str] | None = None
) -> DataFrame:
    """Two-stage count for hot keys: count per (key, salt), then sum
    per key. The first shuffle spreads the hot key over ``buckets``
    reducers; the second is tiny (buckets rows per key)."""
    scols = [F.col(c) for c in (salt_cols or df.columns)]
    stage1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(*scols), F.lit(buckets)))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return stage1.groupBy(key).agg(F.sum("__c").alias("n"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a content-derived
    salt; the small side is replicated ``buckets`` times (explode of
    a literal range) so every (key, salt) pair finds its match.
    Total small-side inflation = buckets x |small| — use only when
    the small side is modest and the key histogram is pathological.
    """
    b = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets)),
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def skew_stats(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Key-distribution diagnosis that decides whether a join/agg
    needs salting: one groupBy pass -> (n_keys, n_rows, max_share,
    top_keys). ``max_share`` is the hottest key's fraction of all
    rows — the number AQE's skew threshold reasons about; > a few
    percent at 100 TB means the hot key's partition dominates the
    stage and the salted paths above are worth their extra shuffle.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("__max_n"),
    )
    # top-k keys via TakeOrdered (never a full collect of the key set)
    topk = (
        counts.orderBy(F.desc("n"), F.col(key_col).cast("string"))
        .limit(top)
        .agg(
            F.collect_list(
                F.struct(F.col("n"), F.col(key_col).cast("string").alias("k"))
            ).alias("top_keys")
        )
    )
    return totals.crossJoin(F.broadcast(topk)).select(
        "n_keys",
        "n_rows",
        (F.col("__max_n") / F.col("n_rows")).alias("max_share"),
        "top_keys",
    )
