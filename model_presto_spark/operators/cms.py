"""Count-min sketch: mergeable approximate frequencies at corpus scale.

Exact per-key counts over a 100 TB event/token stream need a shuffle
keyed by every distinct key. When the downstream question is "how
often does THIS key appear" (heavy-hitter audits, stop-gram
thresholds, per-domain rate caps), a count-min sketch answers it
from a constant-size summary: ``depth`` hash rows of ``width``
counters. Each partition folds its rows into <= depth*width cells
via map-side partial aggregation, so the only shuffle moves
O(depth*width) cells per partition regardless of data size — and two
sketches merge by cell-wise addition, which is exactly a groupBy-sum
over the cell key, so per-shard / per-day sketches compose.

Guarantees (Cormode & Muthukrishnan 2005, public): estimates never
undercount, and overcount by more than ``e/width * N`` with
probability at most ``e^-depth`` per query.

The sketch is kept as a (row, bucket, cnt) DataFrame — its natural
mergeable form — and probing is a broadcast join against it (the
sketch is <= depth*width rows by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_entries(key_col: str, depth: int, width: int, seed_base: int):
    key = F.col(key_col).cast("string")
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(F.xxhash64(key, F.lit(seed_base + j)), F.lit(width))
                .cast("int")
                .alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed_base: int = 7000,
) -> DataFrame:
    """Build the sketch: one bounded aggregation, <= depth*width rows.

    ``explode_outer`` (array is non-empty by construction) avoids the
    inferred size()>0 pre-filter re-evaluating the hash array."""
    return (
        df.select(
            F.explode_outer(
                _hash_entries(key_col, depth, width, seed_base)
            ).alias("h")
        )
        .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, seed_base):
    cell-wise sum — the property that makes the sketch shardable."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    seed_base: int = 7000,
) -> DataFrame:
    """Estimate counts for ``probes[key_col]``: min over the sketch's
    depth cells. The sketch side is broadcast (bounded size); the
    probe side keeps all its columns."""
    exploded = probes.select(
        *probes.columns,
        F.explode_outer(_hash_entries(key_col, depth, width, seed_base)).alias(
            "__h"
        ),
    ).select(
        *probes.columns,
        F.col("__h.j").alias("__j"),
        F.col("__h.bucket").alias("__bucket"),
    )
    joined = exploded.join(
        F.broadcast(sketch),
        (F.col("__j") == F.col("j")) & (F.col("__bucket") == F.col("bucket")),
        "left",
    )
    return (
        joined.groupBy(*[F.col(c) for c in probes.columns])
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
