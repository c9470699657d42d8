"""Behavioral / product-analytics operators over event streams.

The temporal module covers sessionization, retention, transitions,
streaks; this module adds the remaining product-analytics staples —
ordered funnels, RFM segmentation, multi-touch attribution, and the
Benford first-digit audit. All are window-over-entity + small-agg
shapes: one shuffle on the entity key, reference relations broadcast,
no self-joins over the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_funnel(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
    max_span: str | None = None,
) -> DataFrame:
    """Strict-order funnel: how many entities reach step k having
    hit steps 1..k-1 IN ORDER (each step strictly after the
    previous; the classic product funnel, not mere set membership).

    Per entity, the earliest valid timestamp of step k is the
    MIN ts of step-k events after the entity's earliest valid step
    k-1 — computed with one conditional aggregation per step over
    the entity's events (k tiny). ``max_span`` (an INTERVAL string,
    e.g. ``'7 days'``) additionally requires the whole chain to fit
    inside the window starting at step 1.

    Anchor semantics: the chain anchors at each entity's EARLIEST
    step-1 event (single-anchor funnel — deterministic and
    oracle-replicable; multi-anchor retry funnels re-run with a
    filtered stream). Chain times are strictly increasing, so with
    ``max_span`` a step that falls outside the window implies all
    later steps do too.

    Shape: one entity-keyed aggregation plus one entity-keyed join
    per step (k tiny); never a self-join of the raw stream. Output:
    (step, step_index, n_entities) — monotonically non-increasing.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    # Materialize the step-filtered stream ONCE: the anchor
    # aggregation plus every per-step conditional join reference it,
    # and an un-materialized plan re-expands the source scan per
    # branch (plan audit on q118: 42 scans / 66 exchanges -> the
    # checkpointed form scans the base a single time; same fix as
    # q152's bipartite edge list).
    events = (
        events.where(F.col(step_col).isin(steps))
        .select(entity_col, ts_col, step_col)
        .localCheckpoint(eager=False)
    )
    per = events.groupBy(entity_col).agg(
        *[
            F.min(
                F.when(F.col(step_col) == s, F.col(ts_col))
            ).alias(f"__t0_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # chain the steps: t_k = min ts of step k AFTER t_{k-1}. The
    # per-step MIN above is the min over ALL of the entity's step-k
    # events; the chained value needs the min after t_{k-1}, so the
    # aggregation below recomputes with the order constraint by
    # re-aggregating conditionally per step. Two-pass formulation:
    # first pass (above) anchors step 1; each later step re-joins a
    # conditional min against the running anchor.
    chained = per.select(entity_col, F.col("__t0_0").alias("__c0"))
    for i in range(1, len(steps)):
        step_events = events.where(F.col(step_col) == steps[i]).select(
            entity_col, F.col(ts_col).alias("__ts")
        )
        nxt = (
            chained.join(step_events, entity_col, "left")
            .where(
                F.col(f"__c{i - 1}").isNotNull()
                & (F.col("__ts") > F.col(f"__c{i - 1}"))
            )
            .groupBy(entity_col, *[f"__c{j}" for j in range(i)])
            .agg(F.min("__ts").alias(f"__c{i}"))
        )
        chained = chained.join(
            nxt.select(entity_col, f"__c{i}"), entity_col, "left"
        )
    if max_span is not None:
        span_ok = [F.lit(True)]
        for i in range(1, len(steps)):
            span_ok.append(
                F.col(f"__c{i}")
                <= F.col("__c0") + F.expr(f"INTERVAL {max_span}")
            )
        chained = chained.select(
            entity_col,
            "__c0",
            *[
                F.when(span_ok[i], F.col(f"__c{i}")).alias(f"__c{i}")
                for i in range(1, len(steps))
            ],
        )
    # The final per-step union selects from `counts` k times; truncate
    # the chained lineage so those k branches share one materialized
    # subtree instead of re-running every per-step join.
    chained = chained.localCheckpoint(eager=False)
    counts = chained.agg(
        *[
            F.count(F.col(f"__c{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = None
    for i, s in enumerate(steps):
        r = counts.select(
            F.lit(s).alias("step"),
            F.lit(i + 1).alias("step_index"),
            F.col(f"n{i}").cast("bigint").alias("n_entities"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def rfm_scores(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation: per entity recency (days since last event,
    vs the corpus horizon), frequency (event count), monetary (value
    sum), each scored into ``n_tiles`` quantile tiles (1 = best:
    most recent / most frequent / highest value), plus the
    concatenated segment code.

    One groupBy(entity) + three ntile windows over the (tiny,
    entity-level) aggregate relation. Ties break deterministically
    on the entity id via the window order; monetary is ROUNDED (6dp,
    nudged) before it enters the ordering so near-tied float sums
    rank identically in any engine.
    """
    horizon = events.agg(F.max(ts_col).alias("__h"))
    per = (
        events.groupBy(entity_col)
        .agg(
            F.max(ts_col).alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(value_col) + F.lit(5e-12), 6).alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            entity_col,
            F.datediff(F.to_date("__h"), F.to_date("__last")).alias(
                "recency_days"
            ),
            F.col("frequency").cast("bigint").alias("frequency"),
            "monetary",
        )
    )
    wr = Window.orderBy(F.col("recency_days"), F.col(entity_col))
    wf = Window.orderBy(F.desc("frequency"), F.col(entity_col))
    wm = Window.orderBy(F.desc("monetary"), F.col(entity_col))
    return per.select(
        entity_col,
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(wr).alias("r_score"),
        F.ntile(n_tiles).over(wf).alias("f_score"),
        F.ntile(n_tiles).over(wm).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


def attribution(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    touch_types: list[str],
    conversion_type: str,
    id_col: str,
    model: str = "last_touch",
) -> DataFrame:
    """Multi-touch attribution: credit each conversion to the
    preceding touch events of the same entity.

    - ``last_touch``: the latest touch strictly before the
      conversion gets credit 1.0 (ties on ts broken by the caller's
      ``id_col`` — a REAL column, so the ordering replays
      identically in any engine).
    - ``linear``: every touch strictly before the conversion splits
      the credit equally.

    Shape: touches and conversions partition from one scan; the
    credit assignment is a window over the entity's merged stream
    (running touch count + last-touch id carried forward), never a
    touches x conversions join. Output: (touch type, credit summed
    over conversions, n_conversions contributing).
    """
    if model not in ("last_touch", "linear"):
        raise ValueError("model must be last_touch or linear")
    ordered = Window.partitionBy(entity_col).orderBy(ts_col, "__eid")
    stream = events.where(
        F.col(type_col).isin([*touch_types, conversion_type])
    ).select(
        entity_col,
        ts_col,
        F.col(type_col).alias("__t"),
        F.col(id_col).alias("__eid"),
    )
    is_touch = F.col("__t") != conversion_type
    w_prev = ordered.rowsBetween(Window.unboundedPreceding, -1)
    marked = stream.select(
        entity_col,
        "__t",
        F.sum(is_touch.cast("int")).over(w_prev).alias("__n_prior"),
        F.last(F.when(is_touch, F.col("__t")), ignorenulls=True)
        .over(w_prev)
        .alias("__last_touch"),
    )
    conv = marked.where(
        (F.col("__t") == conversion_type) & (F.col("__n_prior") > 0)
    )
    if model == "last_touch":
        credit = conv.groupBy(
            F.col("__last_touch").alias("touch_type")
        ).agg(
            F.sum(F.lit(1.0)).alias("credit"),
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        )
        return credit
    # linear: each conversion contributes 1/n_prior to every prior
    # touch type — requires per-type prior counts, same window shape
    per_type = [
        F.sum((F.col("__t") == t).cast("int"))
        .over(w_prev)
        .alias(f"__cnt_{i}")
        for i, t in enumerate(touch_types)
    ]
    marked2 = stream.select(
        entity_col, "__t",
        F.sum(is_touch.cast("int")).over(w_prev).alias("__n_prior"),
        *per_type,
    )
    conv2 = marked2.where(
        (F.col("__t") == conversion_type) & (F.col("__n_prior") > 0)
    )
    rows = None
    for i, t in enumerate(touch_types):
        r = conv2.agg(
            F.sum(
                F.col(f"__cnt_{i}").cast("double") / F.col("__n_prior")
            ).alias("credit"),
            F.count(
                F.when(F.col(f"__cnt_{i}") > 0, 1)
            ).cast("bigint").alias("n_conversions"),
        ).select(F.lit(t).alias("touch_type"), "credit", "n_conversions")
        rows = r if rows is None else rows.unionByName(r)
    return rows


def benford_digits(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Benford first-digit audit: observed first-significant-digit
    distribution vs the Benford expectation log10(1 + 1/d), with the
    chi-square statistic per group — the classic anomaly/fraud test
    for naturally-occurring magnitudes.

    First digit extraction is pure arithmetic (no string round
    trip): d = floor(x / 10^floor(log10(x))) for x > 0. One groupBy
    (group, digit) + one per-group normalization join. Output one
    row per (group, digit) with observed/expected shares and the
    group's chi2 on every row.
    """
    import math

    x = F.col(value_col).cast("double")
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    grp = F.col(group_col) if group_col else F.lit("all")
    base = df.where(x > 0).select(
        grp.alias("grp"), digit.alias("digit")
    )
    counts = base.groupBy("grp", "digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("grp").agg(F.sum("n").alias("total"))
    exp_lit = F.array(
        *[F.lit(math.log10(1 + 1 / d)) for d in range(1, 10)]
    )
    # full 9-digit spine per group: digits a group never produced
    # still contribute expected mass to chi2 (and appear with n=0)
    spine = totals.select(
        "grp", "total", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    )
    scored = (
        spine.join(counts, ["grp", "digit"], "left")
        .select(
            "grp",
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.col("total")
            ).alias("observed"),
            F.element_at(exp_lit, F.col("digit")).alias("expected"),
            F.col("total"),
        )
    )
    chi = scored.groupBy("grp").agg(
        F.sum(
            F.pow(F.col("observed") - F.col("expected"), 2)
            / F.col("expected")
            * F.col("total")
        ).alias("chi2")
    )
    out = scored.join(chi, "grp")
    if group_col:
        out = out.withColumnRenamed("grp", group_col)
    else:
        out = out.drop("grp")
    return out.drop("total")
