"""Exact grouped quantiles at scale: sketch-bracket + refine.

``percentile(col, p)`` (and SQL ``MEDIAN``) buffers every value of a
group inside one aggregation buffer — at 100 TB with a handful of
groups that is billions of doubles in a single reducer, the classic
exact-quantile scale-killer.  This module computes the *same exact
interpolated quantile* with two bounded passes:

1. **Bracket** (mergeable, map-side partial): per group, ``COUNT`` and
   one ``approx_percentile`` KLL/GK-style sketch per value column,
   queried at ``p ± margin``.  The sketch's rank-error contract
   (±n/accuracy) guarantees the true order statistics for ``p`` lie
   inside the bracket values.
2. **Refine** (exact, tiny state): broadcast the per-group brackets
   back onto the rows, count values strictly below the lower bracket,
   and ``collect_list`` ONLY the in-bracket slice — by the rank bound
   at most ~``4·margin·n`` values per group (0.16 % of the group at
   the default accuracy), then pick / interpolate the exact order
   statistics with array expressions.

Both passes are whole-stage-codegen aggregations with map-side
combine; per-group reducer state is O(n/accuracy) instead of O(n).

Caveats (documented, not silent):
- Heavy *ties at the quantile itself* widen the slice to the tie
  count (all equal values fall inside the bracket).  Exact ties at
  the median of a billion-row group degenerate like any exact method;
  route those to ``approx_percentile`` directly.
- The bracket relation has one row per group and is broadcast — use
  for low-cardinality groups (where buffering percentile explodes).
  High-cardinality/small groups are already fine with plain
  ``percentile``.

Interpolation matches ANSI ``percentile_cont`` / Spark
``percentile``: h = (n-1)·p, g = h-⌊h⌋,
v = (1-g)·v_{⌊h⌋} + g·v_{⌊h⌋+1} (0-indexed sorted order) — the same
algebraic form Spark's Percentile evaluates, so the result is
bit-identical to ``percentile()`` (tests assert ==, no tolerance).
Engines that evaluate the lerp form v_lo + g·(v_hi-v_lo) (e.g.
DuckDB ``quantile_cont``) can differ in the last ULP.

Reference anchor: the median composite is the reference engine's
most-used aggregate (presto-tolbi/presto/src/optimization.py:90,137).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[tuple[str, float, str]],
    accuracy: int = 10_000,
    extra_aggs: Sequence = (),
) -> DataFrame:
    """Exact interpolated quantiles per group, without O(group) buffers.

    Parameters
    ----------
    df : input rows.
    group_cols : grouping key columns.
    quantiles : list of ``(value_col, prob, out_name)``; ``prob`` in
        [0, 1].  Several probs per column share one sketch in pass 1.
    accuracy : ``approx_percentile`` accuracy — rank error ±n/accuracy,
        refine-slice size ~8·n/accuracy per group per column.
    extra_aggs : additional aliased aggregate Columns (e.g. rounded
        avg/stddev) computed IN the refine pass and appended to the
        output.  The refine pass already aggregates every row of every
        group (the bracket join is an inner broadcast join on the
        group key, total over groups), so moments ride the same
        map-side-combined aggregation instead of costing the caller a
        third full scan plus a join — the per-partition row sets (and
        hence the partial-aggregate merge tree) are the ones a direct
        ``df.groupBy(...).agg(...)`` would see.

    Returns one row per group: ``group_cols + [out_name...]`` (double,
    NULL for empty/all-null groups), bit-identical to
    ``percentile(value_col, prob)``.
    """
    margin = 4.0 / accuracy  # 4x the sketch's rank-error bound
    vcols = list(dict.fromkeys(c for c, _, _ in quantiles))

    # ---- Pass 1: per-group count + bracket values (one sketch/column).
    probs_by_col = {c: sorted({p for vc, p, _ in quantiles if vc == c}) for c in vcols}
    bracket_points = {
        c: [x for p in probs_by_col[c] for x in (max(0.0, p - margin), min(1.0, p + margin))]
        for c in vcols
    }
    aggs = []
    for c in vcols:
        pts = ", ".join(repr(x) for x in bracket_points[c])
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
        aggs.append(
            F.expr(f"approx_percentile({c}, array({pts}), {accuracy})").alias(f"__br_{c}")
        )
    brackets = df.groupBy(*group_cols).agg(*aggs)

    # ---- Pass 2: count-below + in-bracket slice, then order-statistic math.
    # Groups with n <= accuracy skip the bracket and collect whole (the
    # sketch's rank slack 4·margin·n dips below 1 rank there, and exact
    # selection over <= `accuracy` values is cheap anyway); for
    # n > accuracy the slack is > 4 ranks — strictly more than the
    # sketch error (n/accuracy) plus the +1 interpolation neighbour.
    # No row prefilter here on purpose: the refine agg has map-side
    # partial aggregation, so out-of-bracket rows already die before
    # the shuffle; a bracket-based filter just re-evaluates the array
    # lookups per row and measured net-slower.
    # NULL-SAFE key join: groupBy treats NULL as a real group, so the
    # bracket join must too (a plain equi-join would silently drop
    # NULL-key groups that percentile() reports).
    br = brackets
    for g in group_cols:
        br = br.withColumnRenamed(g, f"__g_{g}")
    cond = None
    for g in group_cols:
        c = df[g].eqNullSafe(br[f"__g_{g}"])
        cond = c if cond is None else (cond & c)
    joined = df.join(F.broadcast(br), cond, "inner").drop(
        *[f"__g_{g}" for g in group_cols]
    )
    # Aggregate/output expressions are generated as SQL strings and
    # parsed JVM-side in ONE py4j round-trip each: building the same
    # trees through the Column API costs ~45 py4j round-trips (~0.4 ms
    # apiece) per (column, prob) — measured 1,874 round-trips ≈ 0.6 s
    # of driver time per q17 build.  The parsed trees are semantically
    # identical (same functions, same operand order, `D`-suffixed
    # double literals so nothing parses as DECIMAL);
    # tests/test_quantiles.py pins bit-equality vs percentile().
    refine_aggs = []
    for c in vcols:
        small = f"(`__n_{c}` <= {accuracy})"
        for i, p in enumerate(probs_by_col[c]):
            lo = f"`__br_{c}`[{2 * i}]"
            hi = f"`__br_{c}`[{2 * i + 1}]"
            tag = f"{c}_{i}"
            refine_aggs.append(
                F.expr(
                    f"CAST(SUM(CASE WHEN (NOT {small}) AND `{c}` IS NOT NULL "
                    f"AND `{c}` < {lo} THEN 1 ELSE 0 END) AS BIGINT)"
                ).alias(f"__lt_{tag}")
            )
            refine_aggs.append(
                # double like percentile() (an int column would
                # otherwise surface int order statistics at g=0)
                F.expr(
                    f"sort_array(collect_list(CAST(CASE WHEN {small} OR "
                    f"(`{c}` >= {lo} AND `{c}` <= {hi}) THEN `{c}` END "
                    f"AS DOUBLE)))"
                ).alias(f"__sl_{tag}")
            )
        refine_aggs.append(F.first(f"__n_{c}").alias(f"__n_{c}"))
    refine_aggs.extend(extra_aggs)
    refined = joined.groupBy(*group_cols).agg(*refine_aggs)

    out_cols = [F.col(g) for g in group_cols]
    for c, p, out_name in quantiles:
        i = probs_by_col[c].index(p)
        tag = f"{c}_{i}"
        n = f"`__n_{c}`"
        lt = f"`__lt_{tag}`"
        sl = f"`__sl_{tag}`"
        h = f"(CAST(({n} - 1) AS DOUBLE) * {float(p)!r}D)"
        # j = FLOOR(h): 0-indexed lower order statistic (already LONG)
        g = f"({h} - CAST(FLOOR({h}) AS DOUBLE))"
        idx = f"CAST(((FLOOR({h}) + 1) - {lt}) AS INT)"  # 1-indexed in slice
        # idx < 1 means the approx_percentile rank contract was
        # violated (the true order statistic fell below the bracket).
        # element_at with a NEGATIVE index silently reads from the END
        # of the slice — a plausible-but-wrong value; guard so a
        # contract violation surfaces as NULL instead. (idx beyond the
        # slice already yields NULL from element_at.)
        v_lo = f"(CASE WHEN {idx} >= 1 THEN element_at({sl}, {idx}) END)"
        v_hi = f"element_at({sl}, {idx} + 1)"
        # (1-g)*lo + g*hi — the same algebraic form Spark's Percentile
        # uses, so the rounding of the interpolation matches
        # percentile() in the last ULP (lo + g*(hi-lo) can differ).
        val = (
            f"(CASE WHEN {g} > 0 THEN (1.0D - {g}) * {v_lo} + {g} * {v_hi} "
            f"ELSE {v_lo} END)"
        )
        out_cols.append(
            F.expr(f"CASE WHEN {n} > 0 THEN {val} END").alias(out_name)
        )
    # extra_aggs outputs: every refined column that is neither
    # internal (__-prefixed: brackets/counts/slices) nor a group key.
    base = set(group_cols)
    out_cols.extend(
        F.col(c)
        for c in refined.columns
        if not c.startswith("__") and c not in base
    )
    # Empty groups never reach pass 2 (inner join keeps them, but a
    # group whose rows are all-NULL in c still appears with n=0) —
    # n=0 yields NULL like percentile().
    return refined.select(*out_cols)
