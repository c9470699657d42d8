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
