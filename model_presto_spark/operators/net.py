"""IP / CIDR network operators: longest-prefix-match as an equi-join.

Routing a 100 TB clickstream to CIDR blocks (geo/ASN enrichment,
abuse-block filtering, per-network rate caps) is naively a range
join — ``ip BETWEEN block_lo AND block_hi`` — which Spark executes
as a broadcast-nested-loop over every (row, block) pair. The scale
rewrite is prefix expansion: the block table only contains a handful
of DISTINCT prefix lengths, so each probe row expands into one
(length, ip >> (32-length)) key per distinct length — a bounded
fan-out (<= 32, typically <= 6) — and matching becomes a plain
equi-join on (length, prefix). Longest-prefix wins via one max_by
per probe row. Same trick as the geohash/band joins elsewhere in
this engine: replicate bounded, join hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lpm_join(
    probe: DataFrame,
    blocks: DataFrame,
    ip_col: str,
    id_cols: list[str],
    prefix_col: str = "prefix",
    len_col: str = "plen",
    label_cols: list[str] | None = None,
) -> DataFrame:
    """Longest-prefix-match join of ``probe[ip_col]`` (uint32 as long)
    against a CIDR table with columns (prefix, plen, labels...).

    Returns probe id columns + the matched block's label columns
    (null when unrouted). ``blocks`` must be small (it is broadcast);
    the probe side is the big one and only ever expands by the number
    of DISTINCT prefix lengths present in ``blocks``."""
    label_cols = label_cols or [
        c for c in blocks.columns if c not in (prefix_col, len_col)
    ]
    lens = sorted(
        r[0] for r in blocks.select(len_col).distinct().collect()
    )  # bounded by 32 — sketch-sized driver fetch, never data-sized
    expanded = probe.select(
        *id_cols,
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(ln).alias("__plen"),
                        F.shiftright(F.col(ip_col), 32 - ln).alias("__prefix"),
                    )
                    for ln in lens
                ]
            )
        ).alias("__e"),
    ).select(*id_cols, "__e.__plen", "__e.__prefix")
    hit = expanded.join(
        F.broadcast(blocks),
        (F.col("__plen") == F.col(len_col))
        & (F.col("__prefix") == F.col(prefix_col)),
        "inner",
    )
    best = hit.groupBy(*[F.col(c) for c in id_cols]).agg(
        F.max(
            F.struct(F.col(len_col).alias("plen"), *[F.col(c) for c in label_cols])
        ).alias("__best")
    )
    routed = best.select(
        *id_cols,
        F.col("__best.plen").alias("matched_plen"),
        *[F.col(f"__best.{c}").alias(c) for c in label_cols],
    )
    return probe.select(*id_cols).join(routed, id_cols, "left")
