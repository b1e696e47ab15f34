"""Scalar function library — Column expressions only (JVM-side, codegen).

Ports of the reference's formula set (`geoEpic/utils/formule.py`,
`geoEpic/weather/daymet.py`, `geoEpic/soil/sda.py:166-192`): physics,
unit conversions, date helpers, id builders, categorical maps. Nothing here
touches Python at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rh_vappr(vp: Column, tmax: Column, tmin: Column) -> Column:
    """Relative humidity from vapour pressure (`utils/formule.py:3-18`):
    rh = vp / svp(tavg), svp via Tetens in Pa."""
    tavg = (tmax + tmin) / 2
    svp = F.lit(611.0) * F.exp(F.lit(17.27) * tavg / (tavg + F.lit(237.3)))
    return vp / svp


def rh_dewpt(tdew: Column, tmax: Column, tmin: Column) -> Column:
    """Relative humidity from dew point (`utils/formule.py:21-28`)."""
    tavg = (tmax + tmin) / 2
    e_t = F.exp(F.lit(17.27) * tavg / (tavg + F.lit(237.3)))
    e_d = F.exp(F.lit(17.27) * tdew / (tdew + F.lit(237.3)))
    return e_d / e_t


def windspd(u: Column, v: Column) -> Column:
    """sqrt(u^2 + v^2) (`utils/formule.py:31-34`)."""
    return F.sqrt(u * u + v * v)


def srad_mj(srad_wm2: Column, dayl_s: Column) -> Column:
    """W/m^2 * daylight seconds -> MJ/m^2/day (`weather/daymet.py:49`)."""
    return srad_wm2 * dayl_s / F.lit(1e6)


def heat_unit(tmax: Column, tmin: Column, tbs: Column) -> Column:
    """clip(0.5*(tmax+tmin) - TBS, 0) (`io/opc.py:248`)."""
    return F.greatest(F.lit(0.0), (tmax + tmin) * F.lit(0.5) - tbs)


def is_leap(year: Column) -> Column:
    """Gregorian leap rule (`weather/daymet.py:32-35` semantics)."""
    return ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)


def doy(date: Column) -> Column:
    return F.dayofyear(date)


def month_day_key(date: Column) -> Column:
    """'%m-%d' grouping key (`utils/profile.py:129`)."""
    return F.date_format(date, "MM-dd")


def grid_cell_name(lat: Column, lon: Column) -> Column:
    """Reference climate-grid id string f'{int(lat*100)}a{int(lon*100)}'
    (`weather/nldas_ws_gee.py:152-155`)."""
    return F.concat(
        (lat * 100).cast("int").cast("string"),
        F.lit("a"),
        (lon * 100).cast("int").cast("string"),
    )


def site_id_from_csbid(csbid: Column) -> Column:
    """Strip the 6-char prefix, cast the rest (`utils/run_model_util.py:26-31`)."""
    return F.substring(csbid, 7, 32).cast("long")


def hydgrp_code(hydgrp: Column) -> Column:
    """{A:1, B:2, C:3, D:4}, ''/unknown -> C=3 (`soil/sda.py:166-167`)."""
    m = F.create_map(
        F.lit("A"), F.lit(1), F.lit("B"), F.lit(2), F.lit("C"), F.lit(3), F.lit("D"), F.lit(4)
    )
    return F.coalesce(m[hydgrp], F.lit(3))


# canonical soil-layer projection: (source column, scale factor) per
# `soil/sda.py:171-192` / `soil/ssurgo_gdb.py:75-93`
SOIL_UNIT_SCALES: dict[str, tuple[str, float]] = {
    "depth_m": ("hzdepb_r", 0.01),
    "om_pct": ("om_r", 0.58),
    "ksat_mm_hr": ("ksat_r", 3.6),
    "albedo_wet": ("albedodry_r", 0.625),
}


def bbox_from_center(
    lon: Column, lat: Column, half_km: Column
) -> tuple[Column, Column, Column, Column]:
    """km -> degrees bbox around a center, cos-lat corrected
    (`utils/crop_csb.py:23-31`)."""
    dlat = half_km / F.lit(110.574)
    dlon = half_km / (F.lit(111.320) * F.cos(F.radians(lat)))
    return lon - dlon, lat - dlat, lon + dlon, lat + dlat
