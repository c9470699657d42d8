"""Presto-input assembly (M4): wide monthly band rows -> canonical
fixed-shape model input + presence mask.

Reference semantics: ``construct_single_presto_input`` maps
heterogeneous source bands onto a canonical slot layout, zero-fills
missing bands, and records which band-groups are real vs filled
(reference: presto-tolbi/presto/dataops/utils.py:18-93; canonical
band list and group index map
presto-tolbi/presto/dataops/pipelines/s1_s2_era5_srtm.py:28-108;
fixed 12 timesteps at :89).

Spark-first: one ``collect_list(struct(month, bands...))`` per pixel
(single shuffle), then pure array expressions sort the months, build
the [T][B] tensor column, and emit the mask — no UDF until the
encoder itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_TIMESTEPS = 12

# Canonical band slots (FIXTURES.md §1; s1_s2_era5_srtm.py:28-108
# layout after B1/B10 removal). Order IS the contract.
CANONICAL_BANDS: tuple[str, ...] = (
    "VV", "VH",
    "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B11", "B12",
    "temperature_2m", "total_precipitation",
    "elevation", "slope",
    "ndvi",
)

# Band-group boundaries for group-wise masking / presence
# (s1_s2_era5_srtm.py:96-108 BANDS_GROUPS_IDX shape).
BAND_GROUPS: dict[str, tuple[int, ...]] = {
    "S1": (0, 1),
    "S2_RGB": (2, 3, 4),
    "S2_RE": (5, 6, 7, 9),
    "S2_NIR": (8,),
    "S2_SWIR": (10, 11, 12),
    "ERA5": (13, 14),
    "SRTM": (15, 16),
    "NDVI": (17,),
}


def assemble_pixel_input(
    df: DataFrame,
    pixel_cols: list[str],
    month_col: str = "month",
    band_cols: dict[str, str] | None = None,
    fill: float = 0.0,
) -> DataFrame:
    """Wide per-(pixel, month) rows -> one row per pixel with
    ``series`` [12][18] float array and ``band_present`` mask.

    ``band_cols`` maps canonical band name -> source column (absent
    entries are zero-filled and masked out, the reference's
    fill+mask contract, dataops/utils.py:40-70). Months missing from
    the input become fill-rows (callers typically run the month-spine
    composite first so this is rare).
    """
    mapping = band_cols or {b: b for b in CANONICAL_BANDS if b in df.columns}
    present = [b in mapping for b in CANONICAL_BANDS]

    slot_exprs = [
        (
            F.coalesce(F.col(mapping[b]).cast("double"), F.lit(float(fill)))
            if b in mapping
            else F.lit(float(fill))
        ).alias(f"__s{i}")
        for i, b in enumerate(CANONICAL_BANDS)
    ]
    staged = df.select(
        *pixel_cols,
        F.col(month_col).alias("__m"),
        F.array(*slot_exprs).alias("__bands"),
    )
    gathered = staged.groupBy(*pixel_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__m"), F.col("__bands")))
        ).alias("__tl")
    )
    # Per-timestep lookup: month t's band vector, else a fill row.
    fill_row = F.array(*[F.lit(float(fill))] * len(CANONICAL_BANDS))
    series = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_TIMESTEPS - 1)),
        lambda t: F.coalesce(
            F.element_at(
                F.map_from_entries(F.col("__tl")), t
            ),
            fill_row,
        ),
    )
    mask = F.array(*[F.lit(bool(p)) for p in present])
    return gathered.select(
        *pixel_cols,
        series.alias("series"),
        mask.alias("band_present"),
    )


def group_presence(band_present: Column) -> Column:
    """Per-group presence flags (a group is present iff all its bands
    are) in BAND_GROUPS order — feeds group-wise masking (M3)."""
    flags = []
    for name, idxs in BAND_GROUPS.items():
        f = F.lit(True)
        for i in idxs:
            f = f & F.element_at(band_present, i + 1)
        flags.append(f.alias(name))
    return F.struct(*flags)
