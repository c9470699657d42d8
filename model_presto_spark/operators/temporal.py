"""Temporal operators: gap-based sessionization and banded interval
joins.

Reference parity: the reference system windows sensor streams by
calendar month and matches observations by time proximity
(as-of/nearest, see operators/asof.py, citing
presto-tolbi/presto/dataops/pipelines/dynamicworld.py:58-139 and
src/crop_mapping_processing_data_collection_monthly.py:234-297).
Sessionization and interval containment are the two remaining
time-proximity shapes a training-data event pipeline needs
(user-activity segmentation; event-window correlation) that neither
the tumbling window (W1) nor the as-of join (J5/J6) covers.

Scale notes:
- ``sessionize`` is one shuffle (partition by entity) + two window
  passes over the sorted run — the same cost envelope as any
  per-entity ordered scan. Entity skew (one user with billions of
  events) is the only hazard; the partition key is the entity, so
  AQE skew handling does not apply to windows — split hot entities
  upstream (operators/skew.py) if profiles show one.
- ``interval_join`` replaces the O(n·m) broadcast-nested-loop plan
  Spark picks for range predicates with a banded equi-join: points
  hash-shuffle on their time band, intervals replicate only to the
  bands they overlap (ceil(len/band)+1 copies, ~2 for
  band ~ interval length). This is the standard "bucketize the
  range predicate" rewrite; at 100 TB it is the difference between
  a shuffle join and a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(col: str) -> F.Column:
    """Microseconds since epoch; the TIMESTAMP_NTZ -> TIMESTAMP cast
    is an identity under the engine's pinned UTC session timezone
    (session.py), matching DuckDB's epoch_us on naive timestamps."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session indexes per entity.

    A new session starts whenever the time since the previous event of
    the same entity exceeds ``gap_seconds`` (or at the entity's first
    event). Adds ``session_idx`` (1-based, ordered by time within the
    entity). ``order_tiebreak`` optionally names a unique column used
    to break exact-timestamp ties deterministically.

    Equivalent to the classic lag + cumulative-sum window rewrite of
    ``session_window`` — used instead of the built-in so the session
    *index* is exposed (the built-in emits only the window struct) and
    so batch results are reproducible row-for-row in ANSI SQL.
    """
    order = [F.col(ts_col)]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(entity_col).orderBy(*order)
    us = _epoch_us(ts_col)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(new_sess).over(run))


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
    aggs: list[F.Column] | None = None,
) -> DataFrame:
    """Per-session rollup: (entity, session_idx, n_events, first/last
    ts) plus caller aggregates."""
    sess = sessionize(df, entity_col, ts_col, gap_seconds, order_tiebreak)
    base = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    ]
    return sess.groupBy(entity_col, "session_idx").agg(*base, *(aggs or []))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    band_seconds: int,
) -> DataFrame:
    """Join point rows into [start, end] interval rows (inclusive
    bounds) with a banded equi-join instead of a range cross-join.

    Each point belongs to exactly one ``band_seconds``-wide time band;
    each interval is replicated to every band it overlaps. The
    equi-join on the band key therefore produces each qualifying
    (point, interval) pair exactly once (no post-join dedup), and the
    range predicate is applied as a cheap residual filter. Pick
    ``band_seconds`` on the order of the typical interval length:
    replication factor is len/band + 1.

    Inner semantics: intervals with no points don't appear — callers
    wanting zero-counts aggregate the output and left-join it back
    onto the interval table (one extra broadcast-sized join, see
    q64).
    """
    us_pt = _epoch_us(point_ts)
    us_lo = _epoch_us(start_ts)
    us_hi = _epoch_us(end_ts)
    band = F.lit(band_seconds * 1_000_000)

    pts = points.withColumn("__band", F.floor(us_pt / band))
    ivs = intervals.withColumn(
        "__band", F.explode(F.sequence(F.floor(us_lo / band), F.floor(us_hi / band)))
    )
    return (
        ivs.join(pts, "__band", "inner")
        .filter(F.col(point_ts).between(F.col(start_ts), F.col(end_ts)))
        .drop("__band")
    )


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    granularity: str = "day",
) -> DataFrame:
    """Cohort retention matrix: entities grouped by their FIRST
    activity period, counted in every later period they return.

    Two aggregations and one co-partitioned join, all keyed on the
    entity: (entity, period) is deduplicated first so activity
    volume never inflates the counts, then each entity's first
    period joins back and the matrix is one groupBy over
    (cohort, offset). Output: (cohort, offset, n_active).

    ``granularity``: 'day' | 'week' (7-day buckets anchored at the
    entity-agnostic epoch) | 'month' (calendar months).
    """
    d = F.to_date(F.col(ts_col))
    if granularity == "day":
        period = F.datediff(d, F.lit("1970-01-01"))
    elif granularity == "week":
        period = F.floor(F.datediff(d, F.lit("1970-01-01")) / 7)
    elif granularity == "month":
        period = F.year(d) * 12 + F.month(d)
    else:
        raise ValueError(f"unknown granularity {granularity!r}")
    act = (
        df.select(entity_col, period.cast("bigint").alias("period"))
        .distinct()
    )
    first = act.groupBy(entity_col).agg(F.min("period").alias("cohort"))
    return (
        act.join(first, entity_col)
        .groupBy("cohort", (F.col("period") - F.col("cohort")).alias("offset"))
        .agg(F.count("*").alias("n_active"))
    )


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition estimates over per-entity event
    sequences: P(next state | state), with counts.

    One window (lag/lead over the entity key — a single shuffle)
    builds the bigram stream; one groupBy counts transitions; the
    per-source normalizer is a second tiny aggregation joined back
    (broadcast, #states rows). Output:
    (from_state, to_state, n, p).
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    bi = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
    )
    counts = bi.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n").cast("double") / F.col("tot").cast("double")).alias(
                "p"
            ),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring.

    Input: one row per subject with ``duration_col`` (time observed,
    integer or double) and ``event_col`` (1 = the event happened at
    that time, 0 = censored there). Output: one row per distinct
    EVENT time t, with the risk set, event/censor counts, and the
    product-limit estimate

        S(t) = prod over t_i <= t of (1 - d_i / n_i)

    Distributed shape: the subject table collapses to one row per
    distinct duration in a single groupBy (d_i, c_i) — after which
    the relation is #distinct-times sized (tiny relative to the
    corpus), so the cumulative risk-set and survival products run in
    one unpartitioned window over that collapsed relation. The heavy
    input is touched exactly once; this is the same two-level shape
    as the distributed prefix sum in operators/packing.py, with the
    second level small enough to window directly.

    Survival is computed as exp(sum(ln(1 - d/n))) so both engines
    evaluate the identical float expression; when some 1 - d/n == 0
    (everyone at risk dies at t) survival is exactly 0.0 from there
    on, handled outside the log.

    Returns (t, n_risk, n_events, n_censored, survival) ordered by t.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(
            F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0)
        ).alias("d"),
        F.sum(
            F.when(F.col(event_col).cast("int") == 1, 0).otherwise(1)
        ).alias("c"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    staged = per_t.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(total)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0))
        ).alias("n_risk"),
    )
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    staged = staged.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.sum(F.when(frac < 1.0, F.log(1.0 - frac)).otherwise(0.0))
        .over(wc)
        .alias("log_surv"),
        F.sum((frac >= 1.0).cast("int")).over(wc).alias("dead_end"),
    )
    return (
        staged.where(F.col("d") > 0)
        .select(
            "t",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("n_events"),
            F.col("c").cast("bigint").alias("n_censored"),
            F.when(F.col("dead_end") > 0, F.lit(0.0))
            .otherwise(F.exp(F.col("log_surv")))
            .alias("survival"),
        )
        .orderBy("t")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """Collapse an ordered per-key state stream into SCD Type-2
    validity intervals: consecutive equal states merge into one
    version row (key, state, valid_from, valid_to, version).

    The gaps-and-islands build: one window pass marks state changes
    (lag), a running sum of change flags numbers the islands, and a
    groupBy collapses each island to its interval. Two windows + one
    aggregation, all partitioned by the key — one shuffle of the
    stream, no self-joins. ``valid_to`` is the island's last observed
    order value (closed interval; open-ended current versions are
    the caller's null-handling choice). Complements io.merge_upsert
    (Type 1 overwrite) with the history-preserving dimension build.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    marked = df.select(
        key_col,
        order_col,
        state_col,
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            1,
        )
        .otherwise(0)
        .alias("__chg"),
    )
    islands = marked.select(
        key_col,
        order_col,
        state_col,
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__island"),
    )
    return (
        islands.groupBy(key_col, "__island")
        .agg(
            F.first(state_col).alias(state_col),
            F.min(order_col).alias("valid_from"),
            F.max(order_col).alias("valid_to"),
            F.count(F.lit(1)).cast("bigint").alias("n_observations"),
        )
        .select(
            key_col,
            state_col,
            "valid_from",
            "valid_to",
            "n_observations",
            F.col("__island").cast("bigint").alias("version"),
        )
    )


def day_streaks(
    df: DataFrame,
    key_col: str,
    day_col: str,
) -> DataFrame:
    """Consecutive-day activity streaks per key (gaps-and-islands on
    the calendar): input is (key, day) observations (duplicates
    collapse), output one row per key with the longest streak, the
    streak count, and the active-day count.

    The classic trick: distinct days ranked per key; ``day -
    rank`` is constant within a consecutive run, so grouping on it
    isolates the islands without any self-join. One shuffle on the
    key; the per-key relation is days-sized.
    """
    days = df.select(key_col, F.col(day_col).alias("__d")).distinct()
    w = Window.partitionBy(key_col).orderBy("__d")
    anchored = days.select(
        key_col,
        "__d",
        F.date_sub(F.col("__d"), F.row_number().over(w)).alias("__anchor"),
    )
    islands = anchored.groupBy(key_col, "__anchor").agg(
        F.count(F.lit(1)).alias("__len")
    )
    return islands.groupBy(key_col).agg(
        F.max("__len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("__len").cast("bigint").alias("active_days"),
    )


def sequence_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Ordered n-step state sequences per entity and their corpus
    frequencies (the length-n sequential-pattern miner; n=2 is
    transition_matrix's numerator). One lead-window pass per extra
    step over the entity-partitioned stream — a single shuffle on
    the key — then one groupBy on the sequence tuple.

    Output: (step1..stepN, n_occurrences) with every step non-null
    (sequences run inside one entity's stream only).
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cols = [F.col(state_col).alias("step1")]
    for i in range(1, n):
        cols.append(F.lead(state_col, i).over(w).alias(f"step{i + 1}"))
    seq = df.select(key_col, *cols)
    cond = None
    for i in range(1, n):
        c = F.col(f"step{i + 1}").isNotNull()
        cond = c if cond is None else (cond & c)
    return (
        seq.where(cond)
        .groupBy(*[f"step{i + 1}" for i in range(n)])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )


def max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Peak number of simultaneously-open intervals (sweep line):
    explode each [start, end) interval into a +1/-1 event stream,
    running-sum it in time order, take the max.

    End events sort before start events at equal timestamps (the end
    is exclusive), and ``tie_cols`` pins a total order so the running
    sum is deterministic. With ``group_cols`` the sweep runs
    independently per group — one shuffle on the group key; without,
    it is a single global ordered window (documented single-reducer
    bottleneck: use a group column, e.g. the calendar day, at scale).

    Returns one row per group: (group..., peak_concurrency).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    tcols = list(tie_cols or [])
    base = [F.col(c) for c in gcols]
    starts = df.select(
        *base,
        F.col(start_col).alias("_t"),
        F.lit(1).alias("_delta"),
        *[F.col(c).alias(f"_tie_{c}") for c in tcols],
    )
    ends = df.select(
        *base,
        F.col(end_col).alias("_t"),
        F.lit(-1).alias("_delta"),
        *[F.col(c).alias(f"_tie_{c}") for c in tcols],
    )
    ev = starts.unionByName(ends)
    order = [F.col("_t").asc(), F.col("_delta").asc()] + [
        F.col(f"_tie_{c}").asc() for c in tcols
    ]
    w = (
        Window.partitionBy(*gcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = ev.withColumn("_open", F.sum("_delta").over(w))
    agg = swept.groupBy(*gcols).agg(F.max("_open").alias("peak_concurrency"))
    return agg
