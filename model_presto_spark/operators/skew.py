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


def cap_key_multiplicity(
    df: DataFrame,
    key_col: str,
    cap: int,
    mode: str = "sample",
    log_label: str | None = None,
) -> DataFrame:
    """Hot-key guard for pair-generation operators.

    Any operator that self-joins within per-key groups (bipartite
    projection, wedge/triangle expansion, inverted-index dedup) pays
    O(d_k^2) on the hottest key k; one pathological key (the empty
    URL, the test-card frame, a hub node) can dominate the whole
    stage at 100 TB. This guard bounds d_k at ``cap`` BEFORE the
    expansion:

    - ``mode="sample"``: keep a deterministic pseudo-random ``cap``-
      subset per hot key (row_number over xxhash64 of the full row —
      stable across retries/speculation), so hot keys still
      contribute bounded evidence. Recall impact: pairs inside a hot
      key are sampled at roughly (cap/d_k)^2; cross-key pairs are
      unaffected.
    - ``mode="drop"``: remove hot keys entirely (the
      multimodal ``video_dup_pairs``/``max_frame_freq`` semantics —
      right when the hot key is noise, e.g. black frames).

    When ``log_label`` is set, the number of affected keys and
    dropped rows is computed (one small aggregate over the key
    histogram) and logged at INFO — the telemetry that tells an
    operator owner the cap actually fired. Leave it None in
    latency-critical paths to avoid the extra job.

    Only keys above the cap are touched: with ``cap`` chosen above
    the corpus's honest maximum multiplicity the output is
    bit-identical to the unguarded plan, so oracle-parity queries
    keep exactness while staying protected against skew regressions.
    """
    if mode not in ("sample", "drop"):
        raise ValueError("mode must be 'sample' or 'drop'")
    if log_label is not None:
        import logging

        counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
        hot = counts.where(F.col("__n") > cap).agg(
            F.count(F.lit(1)).alias("keys"),
            F.coalesce(
                F.sum(
                    F.col("__n") - (F.lit(cap) if mode == "sample" else F.lit(0))
                ),
                F.lit(0),
            ).alias("rows_dropped"),
        ).collect()[0]
        if hot["keys"]:
            logging.getLogger(__name__).info(
                "cap_key_multiplicity[%s]: %d hot key(s) over cap=%d, "
                "%d row(s) %s",
                log_label,
                hot["keys"],
                cap,
                hot["rows_dropped"],
                "sampled away" if mode == "sample" else "dropped",
            )
    if mode == "drop":
        # anti-join against the HOT key set — small by definition
        # (few keys exceed the cap), so it broadcasts; never
        # broadcast the keep-set, whose size is the whole key space.
        counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
        hot_keys = counts.where(F.col("__n") > cap).select(key_col)
        return df.join(F.broadcast(hot_keys), key_col, "left_anti")
    from pyspark.sql import Window

    # One sort of d_k rows per key (linear) buys freedom from the
    # d_k^2 pair expansion downstream — the trade this guard exists
    # to make. The hottest key's rows do land in one window task;
    # that task is O(d_k log d_k), not O(d_k^2).
    w = Window.partitionBy(key_col).orderBy(
        F.xxhash64(*[F.col(c) for c in df.columns])
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
