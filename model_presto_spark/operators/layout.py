"""Physical layout operators: Z-order (Morton) clustering for
spatial locality.

The reference's rasters arrive tiled by acquisition, which scatters
any lat/lon-bounded query across the whole corpus
(/root/reference/src/process_data.py:64-82 iterates chips;
ee_pipeline.py exports per-region tifs). At 100 TB the fix is
physical: cluster pixel/feature rows by an interleaved-bit Morton
key before writing, so a bounding-box predicate touches O(perimeter)
files instead of O(corpus). Parquet min/max column stats on the
quantized coordinate columns then prune row groups inside each file
as well.

Everything here is pure Catalyst expressions (bit arithmetic built
at plan-construction time) + a range repartition — no UDFs, no
driver-side work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(
    col: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Clamp-and-quantize a coordinate into [0, 2^bits)."""
    cells = (1 << bits) - 1
    scaled = (col - F.lit(lo)) / F.lit(hi - lo) * F.lit(cells)
    return F.least(
        F.lit(cells), F.greatest(F.lit(0), F.floor(scaled).cast("long"))
    )


def zorder_key(
    x: Column,
    y: Column,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton key: bit-interleave the quantized coordinates.

    Built as a 2*bits-term OR chain at plan time — Catalyst folds it
    into one codegen'd expression; rows near each other in (x, y) get
    near keys, which is what makes range-partitioning by the key a
    spatial clustering.
    """
    qx = quantize(x, *x_range, bits)
    qy = quantize(y, *y_range, bits)
    one = F.lit(1).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        # bitwiseOR/AND, not the Python operators (those resolve to
        # boolean algebra on Columns)
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(qx, i).bitwiseAND(one), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(qy, i).bitwiseAND(one), 2 * i))
    return key


def ordered_run_counts(
    df: DataFrame,
    order_cols: list[str],
    value_cols: list[str],
    bucket: Column,
    check_monotone: bool = False,
) -> DataFrame:
    """RLE run counts of each value column under a global sort order,
    WITHOUT a single-task global window.

    A ``Window.orderBy(...)`` with no partition key funnels the whole
    relation through one task — the classic layout-advisory query
    (how many runs would each candidate sort order produce?) written
    that way serializes on exactly the data it is supposed to be
    sizing. Instead: ``bucket`` must be a MONOTONE NON-DECREASING
    function of the leading sort key(s) (every row of bucket b sorts
    before every row of bucket b+1 — e.g. ``year*12+month`` of a date
    leading key, ``floor(id / k)`` of an integer one). Then

    - within-bucket adjacent changes come from a window PARTITIONED
      by bucket (parallel across buckets, one hash shuffle);
    - cross-bucket boundary changes come from each bucket's first and
      last row, recovered exactly as ``min``/``max`` of a struct whose
      leading fields are the order columns (a total order, so the
      extremal structs ARE the boundary rows) — a per-bucket
      aggregate, then one window over the tiny bucket-summary frame;
    - ``runs = 1 + within_changes + boundary_changes``.

    Requirements: ``order_cols`` form a total order (unique key) and
    ``value_cols`` are non-null (NULL-vs-NULL adjacency would need
    eqNullSafe semantics the simple ``!=`` diff does not count).
    ``check_monotone=True`` adds a runtime assertion (one extra
    boundary comparison per bucket, same plan) that fails the job if
    any bucket's first row sorts before the previous bucket's last
    row — i.e. the bucket is NOT a monotone function of the order.

    Returns a 1-row DataFrame: ``n`` plus ``<v>_runs`` per value col.
    An EMPTY input relation yields ``n = 0`` and ``<v>_runs = 0``
    (zero rows have zero runs, not one).
    """
    from pyspark.sql import Window

    # internal names are __orc_-prefixed; refuse inputs that collide
    # rather than silently shadowing them
    clash = [c for c in df.columns if c.startswith("__orc_")]
    if clash:
        raise ValueError(
            f"ordered_run_counts: input columns collide with internal "
            f"__orc_ namespace: {clash}"
        )

    w = Window.partitionBy("__orc_rb").orderBy(*order_cols)
    rowstruct = F.struct(
        *[F.col(c) for c in order_cols],
        *[F.col(v).alias(f"v_{v}") for v in value_cols],
    )
    diffed = df.withColumn("__orc_rb", bucket).select(
        "__orc_rb",
        rowstruct.alias("__orc_rs"),
        *[
            (F.col(v) != F.lag(v).over(w)).cast("int").alias(f"__orc_d_{v}")
            for v in value_cols
        ],
    )
    summary = diffed.groupBy("__orc_rb").agg(
        F.count(F.lit(1)).alias("__orc_n"),
        # bucket-first rows lag NULL -> comparison NULL -> sum skips,
        # so this is exactly the within-bucket adjacent-change count;
        # coalesce because a single-row bucket has NO non-null diffs
        # (sum = NULL, caught by the hypothesis property test)
        *[
            F.coalesce(F.sum(f"__orc_d_{v}"), F.lit(0)).alias(f"__orc_w_{v}")
            for v in value_cols
        ],
        F.min("__orc_rs").alias("__orc_first"),
        F.max("__orc_rs").alias("__orc_last"),
    )
    ws = Window.orderBy("__orc_rb")
    order_struct = lambda c: F.struct(  # noqa: E731
        *[F.col(c)[oc].alias(oc) for oc in order_cols]
    )
    bdiff = summary.select(
        "__orc_n",
        *[F.col(f"__orc_w_{v}") for v in value_cols],
        *[
            (
                F.col("__orc_first")[f"v_{v}"]
                != F.lag(F.col("__orc_last")[f"v_{v}"]).over(ws)
            )
            .cast("int")
            .alias(f"__orc_b_{v}")
            for v in value_cols
        ],
        # monotone-bucket violation: this bucket's first row sorts
        # BEFORE the previous bucket's last row (struct comparison is
        # lexicographic over the order columns)
        (
            order_struct("__orc_first")
            < F.lag(order_struct("__orc_last")).over(ws)
        )
        .cast("int")
        .alias("__orc_viol"),
    )
    n_raw = F.coalesce(F.sum("__orc_n"), F.lit(0).cast("long"))
    if check_monotone:
        # assert_true is NULL on success (coalesce -> 0), errors the
        # job otherwise — no extra action needed
        n_expr = n_raw + F.coalesce(
            F.assert_true(
                F.coalesce(F.sum("__orc_viol"), F.lit(0)) == 0,
                F.lit(
                    "ordered_run_counts: bucket is not monotone "
                    "non-decreasing along order_cols"
                ),
            ).cast("long"),
            F.lit(0).cast("long"),
        )
    else:
        n_expr = n_raw
    return bdiff.agg(
        n_expr.alias("n"),
        *[
            F.when(n_raw == 0, F.lit(0).cast("long"))
            .otherwise(
                1
                + F.sum(f"__orc_w_{v}")
                + F.coalesce(F.sum(f"__orc_b_{v}"), F.lit(0))
            )
            .alias(f"{v}_runs")
            for v in value_cols
        ],
    )


def ordered_positions(
    df: DataFrame,
    order_cols: list[str],
    bucket: Column,
    pos_col: str = "pos",
) -> DataFrame:
    """Global 1-based positions under a total sort order WITHOUT a
    single-task global window.

    ``Window.orderBy(...)`` with no partition key funnels the whole
    relation through one task — fine on a pre-aggregated summary,
    a scale-killer on a raw stream (assigning trace positions to a
    100 TB event log through one sorter). Same contract as
    ``ordered_run_counts``: ``bucket`` must be MONOTONE NON-DECREASING
    in the leading sort key(s) (e.g. ``to_date(ts)`` for a ts-ordered
    stream, ``floor(id/k)`` for an id-ordered one). Then

    - local ranks come from a window PARTITIONED by bucket (one hash
      shuffle, parallel across buckets);
    - bucket offsets are an exclusive running sum over the per-bucket
      counts — a window over the TINY bucket-summary relation;
    - ``pos = offset + local_rank``.

    ``order_cols`` must form a total order (unique key) or positions
    among ties are arbitrary. Output: the input columns + ``pos_col``.
    """
    from pyspark.sql import Window

    clash = [c for c in df.columns if c.startswith("__opos_")]
    if clash:
        raise ValueError(
            f"ordered_positions: input columns collide with internal "
            f"__opos_ namespace: {clash}"
        )
    d = df.withColumn("__opos_b", bucket)
    w_in = Window.partitionBy("__opos_b").orderBy(*order_cols)
    ranked = d.withColumn("__opos_rn", F.row_number().over(w_in))
    # counts come from the PRE-rank input: deriving them from
    # ``ranked`` would evaluate the window subtree twice (Spark has
    # no cross-branch CSE), doubling the pass over the raw stream
    counts = d.groupBy("__opos_b").agg(
        F.count(F.lit(1)).alias("__opos_n")
    )
    w_b = Window.orderBy("__opos_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__opos_b",
        F.coalesce(F.sum("__opos_n").over(w_b), F.lit(0)).alias(
            "__opos_off"
        ),
    )
    return (
        ranked.join(F.broadcast(offsets), "__opos_b")
        .withColumn(
            pos_col, (F.col("__opos_off") + F.col("__opos_rn"))
        )
        .drop("__opos_b", "__opos_rn", "__opos_off")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by Morton key into ``n_files`` range
    partitions. The key column is persisted (``__z``) so readers can
    ALSO range-prune on it directly; the quantized source columns'
    parquet min/max stats stay tight per file, which is what turns a
    bbox filter into file- and row-group-level pruning."""
    keyed = df.withColumn(
        "__z", zorder_key(F.col(x_col), F.col(y_col), x_range, y_range, bits)
    )
    keyed.repartitionByRange(n_files, "__z").write.mode("overwrite").parquet(path)
