"""Conformance queries: scale-pattern operators #5 (q194+).

Three join/summary patterns a 100 TB deployment leans on daily:
Bloom-prefiltered joins (shuffle only the matching fraction),
count-min frequency sketches (constant-size mergeable counts), and
CIDR longest-prefix-match routing as a bounded-fan-out equi-join.
Oracle conventions as everywhere: identical column aliases, floats
rounded, deterministic orderings on unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q194 — Bloom-prefiltered join (lossless): urgent-order revenue by month
# ---------------------------------------------------------------------------
# The Spark side routes lineitem through operators/bloom.py: the
# bitset is built from the filtered orders side (one bounded
# aggregation), embedded as a plan literal, and applied as a pure
# whole-stage-codegen predicate BEFORE lineitem's shuffle — at scale
# that prefilter is the difference between shuffling every lineitem
# row and shuffling the ~20% that can match. The result is provably
# identical to the plain join (no false negatives; false positives
# die in the real join), which is exactly what the oracle states.
_Q194_ORACLE = """
    SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m-01')
             AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) + 5e-12, 4)
             AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    ORDER BY 1
"""


@register(
    "q194_bloom_join",
    _Q194_ORACLE,
    doc="Bloom-prefiltered equi-join (operators/bloom.py): revenue of "
    "lineitems belonging to 1-URGENT orders, by order month. The "
    "2^16-bit / 3-hash bitset built from the filtered orders keys "
    "drops non-matching lineitems inside codegen before any shuffle; "
    "the subsequent real join guarantees the result equals the plain "
    "join the oracle states. Lossless by construction.",
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.bloom import bloom_prefilter_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    joined = bloom_prefilter_join(
        li, urgent, on="o_orderkey", num_bits=1 << 16, num_hashes=3
    )
    return (
        joined.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-01")
            .alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + F.lit(5e-12),
                4,
            ).alias("revenue"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Q195 — count-min sketch error contract: heavy-hitter users (events)
# ---------------------------------------------------------------------------
# Sketch estimates are engine-specific, so (like q72's HLL/KLL
# contracts) the oracle adjudicates the documented guarantee instead:
# never undercounts, and overcounts by at most 4*N/width for every
# probed heavy hitter (Markov bound per row, min over depth=4 rows;
# asserted empirically at sf0.01 AND sf0.1). Exact counts keep the
# query a real correctness check.
_Q195_ORACLE = """
    WITH exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
    ), top AS (
      SELECT user_id, exact_cnt,
             ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, user_id) AS rk
      FROM exact
    )
    SELECT user_id, exact_cnt, TRUE AS lower_ok, TRUE AS upper_ok
    FROM top WHERE rk <= 20
    ORDER BY user_id
"""

_Q195_DEPTH = 4
_Q195_WIDTH = 2048


@register(
    "q195_cms_heavy_hitters",
    _Q195_ORACLE,
    doc="Count-min sketch (operators/cms.py, depth 4 x width 2048) "
    "over the event stream, probed at the exact top-20 users. The "
    "sketch is one bounded map-side-combined aggregation (<= 8192 "
    "cells shuffled regardless of data size) and merges by cell-wise "
    "sum across shards. Contract columns assert the CMS guarantee: "
    "est >= exact always, est <= exact + 4N/width for the probes.",
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.cms import cms_build, cms_estimate

    ev = _t(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(
        ev, "user_id", depth=_Q195_DEPTH, width=_Q195_WIDTH
    ).localCheckpoint(eager=False)

    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    from pyspark.sql import Window

    top = (
        exact.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("exact_cnt").desc(), F.col("user_id"))
            ),
        )
        .where(F.col("rk") <= 20)
        .drop("rk")
    )
    est = cms_estimate(
        top, sketch, "user_id", depth=_Q195_DEPTH, width=_Q195_WIDTH
    )
    # total stream size from the sketch itself (row j=0 sums to N)
    total = sketch.where(F.col("j") == 0).agg(
        F.sum("cnt").alias("__n")
    )
    margin = 4.0 / _Q195_WIDTH
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("lower_ok"),
            (
                F.col("cms_est")
                <= F.col("exact_cnt") + F.col("__n") * F.lit(margin)
            ).alias("upper_ok"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Q196 — CIDR longest-prefix-match routing (operators/net.py)
# ---------------------------------------------------------------------------
# Each user gets a deterministic synthetic IPv4 (md5-derived, the
# h60 convention both engines replay bit-for-bit). The block table
# mixes prefix lengths 2..20 with nested blocks so longest-prefix
# actually decides; the Spark plan expands each probe into one key
# per DISTINCT prefix length (x5, bounded) and equi-joins — never a
# range/cross join. The oracle states the naive range semantics.
_Q196_BLOCKS = [
    # (label, plen, prefix)  — prefix = ip >> (32 - plen)
    ("wide-a", 2, 0),
    ("wide-b", 2, 2),
    ("mid-a", 4, 1),
    ("mid-b", 5, 21),
    ("narrow-a", 8, 37),
    ("narrow-b", 12, 1234),
    ("tiny", 20, 777777),
]

_Q196_VALUES = ", ".join(
    f"('{lb}', {pl}, {pf})" for (lb, pl, pf) in _Q196_BLOCKS
)

_Q196_ORACLE = f"""
    WITH ips AS (
      SELECT event_id, user_id,
             CAST(('0x' || substr(md5('ip#' || CAST(user_id AS VARCHAR)),
                   1, 15)) AS BIGINT) % 4294967296 AS ip
      FROM events
    ), blocks AS (
      SELECT * FROM (VALUES {_Q196_VALUES}) AS t(label, plen, prefix)
    ), hits AS (
      SELECT i.event_id, i.user_id, b.label, b.plen,
             ROW_NUMBER() OVER (PARTITION BY i.event_id
                                ORDER BY b.plen DESC) AS rk
      FROM ips i JOIN blocks b ON (i.ip >> (32 - b.plen)) = b.prefix
    )
    SELECT COALESCE(h.label, 'unrouted') AS label,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT i.user_id) AS BIGINT) AS n_users
    FROM ips i LEFT JOIN hits h
      ON h.event_id = i.event_id AND h.rk = 1
    GROUP BY 1
    ORDER BY 1
"""


@register(
    "q196_cidr_routing",
    _Q196_ORACLE,
    doc="CIDR longest-prefix-match enrichment: events routed to a "
    "7-block table (nested prefixes, lengths 2-20) via "
    "operators/net.lpm_join — bounded x5 prefix expansion + "
    "broadcast equi-join + one max_by, replacing the O(n*m) "
    "range-join plan the oracle states. Per-block event and "
    "distinct-user counts, unrouted kept.",
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.functions.text import h60
    from model_presto_spark.operators.net import lpm_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.pmod(
            h60(F.concat(F.lit("ip#"), F.col("user_id").cast("string"))),
            F.lit(4294967296),
        ).alias("ip"),
    )
    blocks = spark.createDataFrame(
        _Q196_BLOCKS, schema="label string, plen int, prefix long"
    )
    routed = lpm_join(
        ev,
        blocks,
        ip_col="ip",
        id_cols=["event_id", "user_id"],
        label_cols=["label"],
    )
    return (
        routed.groupBy(
            F.coalesce(F.col("label"), F.lit("unrouted")).alias("label")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
        .orderBy("label")
    )
