"""Conformance queries: sketch-based approximate analytics (round 3).

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are the
expensive aggregations — both force all values of a group onto one
reducer (or a full sort). The scale path is sketches: HyperLogLog++
(`approx_count_distinct`) and the Greenwald-Khanna/KLL-style
quantile summary (`percentile_approx`) are mergeable, constant-size
per partition, and compose with map-side partial aggregation, so a
1000-executor cluster aggregates them with one tiny shuffle.

Sketch outputs are engine-specific, so they cannot be hash-compared
against DuckDB directly. q72 therefore adjudicates the *error
contract* instead: it computes both the exact and the sketched
statistic per group in one aggregation and returns booleans
asserting the sketch landed within its documented tolerance
(HLL rsd 2% -> assert within 5%; percentile_approx accuracy 10000 ->
assert rank-window containment between the exact p±2% percentiles,
since the sketch's guarantee is a rank bound, not a value bound).
The oracle states the exact
values and `TRUE` for every contract column — a sketch outside
tolerance hash-mismatches the gate. The exact columns keep the
query a real correctness check, not just a self-assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# Q72 — HLL distinct + approx percentile error contracts (events)
# ---------------------------------------------------------------------------
_Q72_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           TRUE AS hll_ok,
           ROUND(quantile_cont(value, 0.5) + 5e-10, 4) AS p50_value,
           ROUND(quantile_cont(value, 0.95) + 5e-10, 4) AS p95_value,
           TRUE AS p50_ok,
           TRUE AS p95_ok
    FROM events
    GROUP BY event_type
"""


@register(
    "q72_sketches",
    _Q72_ORACLE,
    doc="Sketch error contracts per event_type: HyperLogLog++ distinct "
    "(rsd 2%, asserted within 5% of exact) and percentile_approx "
    "(accuracy 10000, asserted to land inside the exact p±2% "
    "rank window - the sketch guarantee is a rank bound) "
    "computed alongside the exact statistics "
    "in one aggregation pass. The sketches are the 100 TB path; the "
    "exact columns keep the oracle hash-comparable.",
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two narrow aggregations joined on the tiny group key, NOT one
    # combined agg: mixing count_distinct with sketch/percentile
    # aggregates forces a two-phase ObjectHashAggregate keyed by
    # (event_type, user_id) in which the ~410-long HLL buffer and the
    # exact-percentile value buffers ride a 400+-column shuffle row —
    # plan-audited at 4.6s vs ~0.6s for this split at sf0.1.
    # The percentile_approx guarantee is a RANK bound (error <=
    # n/accuracy ranks), not a relative-value bound — at small group
    # sizes the value gap between adjacent order statistics in the
    # tail easily exceeds 1% of the value. The sound contract is
    # rank-window containment: the sketch's p must land between the
    # exact (p - 2%) and (p + 2%) percentiles. One shared exact-
    # percentile buffer serves all six rank probes.
    ev = _t(spark, sf_dir, "events")
    apx_u = F.expr("approx_count_distinct(user_id, 0.02)")
    sketches = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            apx_u.alias("__apx_u"),
            F.expr(
                "percentile(value, array(0.48D, 0.5D, 0.52D, "
                "0.93D, 0.95D, 0.97D))"
            ).alias("__ex"),
            F.expr("percentile_approx(value, 0.5, 10000)").alias("__a50"),
            F.expr("percentile_approx(value, 0.95, 10000)").alias("__a95"),
        )
        .select(
            "event_type",
            "n_events",
            "__apx_u",
            F.round(F.element_at("__ex", 2) + 5e-10, 4).alias("p50_value"),
            F.round(F.element_at("__ex", 5) + 5e-10, 4).alias("p95_value"),
            (
                (F.col("__a50") >= F.element_at("__ex", 1))
                & (F.col("__a50") <= F.element_at("__ex", 3))
            ).alias("p50_ok"),
            (
                (F.col("__a95") >= F.element_at("__ex", 4))
                & (F.col("__a95") <= F.element_at("__ex", 6))
            ).alias("p95_ok"),
        )
    )
    exact_users = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users")
    )
    return sketches.join(exact_users, "event_type").select(
        "event_type",
        "n_events",
        "n_users",
        (F.abs(F.col("__apx_u") - F.col("n_users")) <= F.col("n_users") * 0.05).alias(
            "hll_ok"
        ),
        "p50_value",
        "p95_value",
        "p50_ok",
        "p95_ok",
    )


# ---------------------------------------------------------------------------
# Q80 — single-pass column profile (operators/profile.profile_columns)
# ---------------------------------------------------------------------------
_Q80_COLS = ("o_orderkey", "o_custkey", "o_totalprice")

_Q80_ORACLE = (
    "WITH p AS ("
    + "\n UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, 'n' AS metric,
               CAST(COUNT(*) AS DOUBLE) AS value FROM orders
        UNION ALL SELECT '{c}', 'n_null',
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               FROM orders
        UNION ALL SELECT '{c}', 'min', CAST(MIN({c}) AS DOUBLE) FROM orders
        UNION ALL SELECT '{c}', 'max', CAST(MAX({c}) AS DOUBLE) FROM orders
        UNION ALL SELECT '{c}', 'mean', AVG({c}) FROM orders
        UNION ALL SELECT '{c}', 'stddev', STDDEV_SAMP({c}) FROM orders
        """
        for c in _Q80_COLS
    )
    + ") SELECT col_name, metric, ROUND(value + 5e-10, 4) AS value FROM p"
)


@register(
    "q80_profile",
    _Q80_ORACLE,
    doc="Deequ-style numeric profile of three orders columns in ONE "
    "aggregation pass (count/nulls/min/max/mean/stddev) unpivoted to "
    "long form with stack - metric count does not change the scan or "
    "shuffle cost. The operator also offers an HLL distinct estimate "
    "(kept out of this oracle query: sketch values are "
    "engine-specific).",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.profile import profile_columns

    o = _t(spark, sf_dir, "orders")
    prof = profile_columns(o, list(_Q80_COLS), approx_distinct=False)
    return prof.select(
        "col_name", "metric", F.round(F.col("value") + 5e-10, 4).alias("value")
    )


# ---------------------------------------------------------------------------
# Q81 — declarative quality constraints (operators/profile.check_constraints)
# ---------------------------------------------------------------------------
_Q81_ORACLE = """
    SELECT 'not_null' AS rule, 'o_custkey' AS col_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS violations,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'min', 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                    THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_orderstatus IS NULL
                    OR o_orderstatus NOT IN ('O', 'F', 'P')
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'max', 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice > 50000
                    THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice > 50000
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           CAST(COALESCE(SUM(n), 0) AS BIGINT),
           COALESCE(SUM(n), 0) = 0
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)
"""


@register(
    "q81_constraints",
    _Q81_ORACLE,
    doc="Declarative data-quality gate over orders: not_null / min "
    "bound / accepted_values / max bound share ONE conditional-"
    "aggregation pass, unique(o_orderkey) adds one groupBy job. "
    "Violations come back as data (rule, col_name, count, passed), "
    "composable with any alerting sink.",
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.profile import check_constraints

    o = _t(spark, sf_dir, "orders")
    return check_constraints(
        o,
        [
            {"type": "not_null", "column": "o_custkey"},
            {"type": "min", "column": "o_totalprice", "value": 0},
            {"type": "accepted_values", "column": "o_orderstatus",
             "values": ["O", "F", "P"]},
            {"type": "max", "column": "o_totalprice", "value": 50000},
            {"type": "unique", "column": "o_orderkey"},
        ],
    )
