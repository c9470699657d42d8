"""Spectral-index and band-normalization expressions.

The reference derives 17 spectral indices as per-pixel arithmetic
over band columns (reference: src/common_ci.py:89-180; NDVI with the
zero-division guard also at
presto-tolbi/presto/dataops/pipelines/s1_s2_era5_srtm.py:125-162),
normalizes bands affinely (s1_s2_era5_srtm.py:28-87,164-179
``ADD_BY``/``DIVIDE_BY``) and applies sensor scale factors
(src/preprocessing.py:46-61 Landsat ``*0.0000275-0.2``; S2
``/10000``). All of it is pure column arithmetic — whole-stage
codegen territory, no UDFs. Guards follow the reference's
``np.where(denominator != 0, ratio, 0)`` convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _guarded_ratio(num: Column, den: Column) -> Column:
    """num/den where den != 0, else 0.0 (reference NDVI guard,
    s1_s2_era5_srtm.py:152-162)."""
    return F.when(den != 0, num / den).otherwise(F.lit(0.0))


def normalized_difference(a: Column, b: Column) -> Column:
    """(a - b) / (a + b), 0 where the denominator is 0 — the shape
    behind NDVI/GNDVI/NDRE/NDMI/MNDWI/NDWI/NDBI (common_ci.py:89-180)."""
    return _guarded_ratio(a - b, a + b)


def ndvi(nir: Column, red: Column) -> Column:
    return normalized_difference(nir, red)


def gndvi(nir: Column, green: Column) -> Column:
    return normalized_difference(nir, green)


def ndre(nir: Column, red_edge: Column) -> Column:
    return normalized_difference(nir, red_edge)


def ndmi(nir: Column, swir1: Column) -> Column:
    return normalized_difference(nir, swir1)


def mndwi(green: Column, swir1: Column) -> Column:
    return normalized_difference(green, swir1)


def ndwi(green: Column, nir: Column) -> Column:
    return normalized_difference(green, nir)


def ndbi(swir1: Column, nir: Column) -> Column:
    return normalized_difference(swir1, nir)


def evi(nir: Column, red: Column, blue: Column) -> Column:
    """Enhanced vegetation index (common_ci.py EVI coefficients)."""
    den = nir + 6.0 * red - 7.5 * blue + 1.0
    return _guarded_ratio(2.5 * (nir - red), den)


def evi2(nir: Column, red: Column) -> Column:
    den = nir + 2.4 * red + 1.0
    return _guarded_ratio(2.5 * (nir - red), den)


def arvi(nir: Column, red: Column, blue: Column) -> Column:
    rb = 2.0 * red - blue
    return _guarded_ratio(nir - rb, nir + rb)


def msavi(nir: Column, red: Column) -> Column:
    """Modified soil-adjusted vegetation index (common_ci.py:118-124
    — the sqrt-discriminant form)."""
    t = 2.0 * nir + 1.0
    return (t - F.sqrt(t * t - 8.0 * (nir - red))) / 2.0


def sr(nir: Column, red: Column) -> Column:
    """Simple ratio, 0-guarded."""
    return _guarded_ratio(nir, red)


def bsi(swir1: Column, red: Column, nir: Column, blue: Column) -> Column:
    """Bare-soil index."""
    return normalized_difference(swir1 + red, nir + blue)


def nbwi(blue: Column, nir: Column, swir1: Column) -> Column:
    """Normalized blue water index variant used by the reference."""
    return _guarded_ratio(blue - swir1, blue + nir)


# Tasseled-cap coefficients for Sentinel-2 bands
# (B2, B3, B4, B8, B11, B12) — the 6-band subset the reference's
# brightness/greenness/wetness expressions combine (common_ci.py).
_TC_BRIGHTNESS = (0.3037, 0.2793, 0.4743, 0.5585, 0.5082, 0.1863)
_TC_GREENNESS = (-0.2848, -0.2435, -0.5436, 0.7243, 0.0840, -0.1800)
_TC_WETNESS = (0.1509, 0.1973, 0.3279, 0.3406, -0.7112, -0.4572)


def _tc(coeffs: tuple[float, ...], bands: tuple[Column, ...]) -> Column:
    if len(coeffs) != len(bands):
        raise ValueError(f"expected {len(coeffs)} bands, got {len(bands)}")
    out: Column = F.lit(0.0)
    for c, b in zip(coeffs, bands):
        out = out + F.lit(c) * b
    return out


def tc_brightness(*bands: Column) -> Column:
    return _tc(_TC_BRIGHTNESS, bands)


def tc_greenness(*bands: Column) -> Column:
    return _tc(_TC_GREENNESS, bands)


def tc_wetness(*bands: Column) -> Column:
    return _tc(_TC_WETNESS, bands)


def affine_normalize(col: Column, shift: float, div: float) -> Column:
    """(x + shift) / div — the reference's per-band normalization
    (s1_s2_era5_srtm.py:164-179)."""
    return (col + F.lit(float(shift))) / F.lit(float(div))


def scale_landsat_sr(col: Column) -> Column:
    """Landsat Collection-2 surface-reflectance scale
    (preprocessing.py:46-61)."""
    return col * F.lit(0.0000275) - F.lit(0.2)


def scale_s2_sr(col: Column) -> Column:
    """Sentinel-2 L2A reflectance scale (optimization.py:118)."""
    return col / F.lit(10000.0)


def normalize_band_array(
    arr: Column, add_by: tuple[float, ...], divide_by: tuple[float, ...]
) -> Column:
    """Vectorized affine normalization over a per-row band array:
    out[i] = (arr[i] + add_by[i]) / divide_by[i]
    (s1_s2_era5_srtm.py:62-87 constant vectors applied at :164-179).
    The constants embed as plan literals — constant-folded, no
    per-row lookup cost.
    """
    if len(add_by) != len(divide_by):
        raise ValueError("add_by and divide_by must have equal length")
    adds = F.array(*[F.lit(float(x)) for x in add_by])
    divs = F.array(*[F.lit(float(x)) for x in divide_by])
    return F.zip_with(
        F.zip_with(arr, adds, lambda x, a: x + a),
        divs,
        lambda x, d: x / d,
    )
