"""Coordinate reprojection without PROJ (SURVEY.md §7.2.2): ST_TRANSFORM
(east_asia.py:204-206, 244-246) for the CRS family the reference's
corpus actually uses — UTM zones (EPSG 326xx/327xx), Web Mercator
(3857), and geographic WGS84 (4326).

Formulas are the published ellipsoidal Transverse Mercator series from
Snyder, "Map Projections — A Working Manual" (USGS PP 1395, 1987),
eqs. 8-9..8-25 (forward) and the standard spherical Web Mercator pair.
Accuracy within a UTM zone is sub-millimeter against PROJ for the
truncation order used here; roundtrip error is property-tested to
< 1e-9 degrees.

Everything is vectorized numpy over (n, 2) coordinate arrays and rides
geom.wkb.transform_coords inside an Arrow-batched pandas UDF. The
reference's known perf bug — its engine used only 2 cores for
ST_TRANSFORM scans (east_asia.py:196-198) — is structurally fixed
here: the UDF parallelizes per partition.

Unknown EPSG → ValueError (the reference shells out to ogr2ogr for
CRS-less inputs, east_asia.py:118-137; v1 rejects instead — documented
deviation, SURVEY.md §7.2.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from gis_etl_spark.geom import wkb as K

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996
_FE = 500_000.0
_FN_SOUTH = 10_000_000.0

# meridian-arc series coefficients (Snyder 3-21)
_M0C = 1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256
_M1C = 3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024
_M2C = 15 * _E2**2 / 256 + 45 * _E2**3 / 1024
_M3C = 35 * _E2**3 / 3072
_E1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))


def _merid_arc(phi: np.ndarray) -> np.ndarray:
    return _A * (
        _M0C * phi
        - _M1C * np.sin(2 * phi)
        + _M2C * np.sin(4 * phi)
        - _M3C * np.sin(6 * phi)
    )


def utm_forward(lon: np.ndarray, lat: np.ndarray, zone: int, south: bool):
    """(lon°, lat°) → (easting, northing) m. Snyder eq. 8-9..8-13."""
    phi = np.radians(lat)
    lam = np.radians(lon)
    lam0 = np.radians(zone * 6 - 183)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sin_p**2)
    t = tan_p**2
    c = _EP2 * cos_p**2
    a = (lam - lam0) * cos_p
    m = _merid_arc(phi)
    east = (
        _K0 * n * (
            a
            + (1 - t + c) * a**3 / 6
            + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a**5 / 120
        )
        + _FE
    )
    north = _K0 * (
        m
        + n * tan_p * (
            a**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a**6 / 720
        )
    )
    if south:
        north = north + _FN_SOUTH
    return east, north


def utm_inverse(east: np.ndarray, north: np.ndarray, zone: int, south: bool):
    """(easting, northing) m → (lon°, lat°). Snyder eq. 8-19..8-25."""
    lam0 = np.radians(zone * 6 - 183)
    y = north - (_FN_SOUTH if south else 0.0)
    m = y / _K0
    mu = m / (_A * _M0C)
    phi1 = (
        mu
        + (3 * _E1 / 2 - 27 * _E1**3 / 32) * np.sin(2 * mu)
        + (21 * _E1**2 / 16 - 55 * _E1**4 / 32) * np.sin(4 * mu)
        + (151 * _E1**3 / 96) * np.sin(6 * mu)
        + (1097 * _E1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = (east - _FE) / (n1 * _K0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2)
        * d**6 / 720
    )
    lam = lam0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2)
        * d**5 / 120
    ) / cos1
    return np.degrees(lam), np.degrees(phi)


def utm_inverse_select_sql(
    src_sql: str,
    east: str = "east",
    north: str = "north",
    zone: int = 50,
    south: bool = False,
    keep: str = "building_id",
) -> str:
    """ANSI twin of utm_inverse() — the Snyder 8-19..8-25 series
    unrolled into chained derived tables, following the
    geo_hilbert_keys precedent (the oracle IS the published
    algorithm, computed over independently-written golden inputs,
    never the engine's decode).

    Every scalar coefficient is precomputed here with the exact same
    float64 expressions the numpy path uses and embedded via repr()
    (shortest round-trip — bit-identical on parse); the per-vertex
    arithmetic mirrors utm_inverse's operation ORDER (left-assoc
    chains, x*x for **2, pow() for higher exponents) so +,-,*,/ are
    IEEE-identical and only libm calls can differ. Measured on 50k
    random zone-50 points: lon bit-exact, lat max |Δ| 7.1e-15 °
    (~0.8 nm — numpy's vectorized sin vs DuckDB's libm sin), which
    round(…, 6) absorbs with ~1e-8 headroom.

    Returns a parenthesized SELECT producing {keep} + lon + lat from
    src_sql (which must expose {keep}, {east}, {north})."""
    lam0 = float(np.radians(zone * 6 - 183))
    p = _A * _M0C
    c2 = 3 * _E1 / 2 - 27 * _E1**3 / 32
    c4 = 21 * _E1**2 / 16 - 55 * _E1**4 / 32
    c6 = 151 * _E1**3 / 96
    c8 = 1097 * _E1**4 / 512
    an = _A * (1 - _E2)
    rad2deg = float(np.degrees(1.0))
    fn = _FN_SOUTH if south else 0.0

    def r(v: float) -> str:
        return repr(float(v))

    return f"""(
  SELECT {keep},
         ({r(lam0)} + (
            d
            - (1 + 2*t1 + c1) * pow(d, 3) / 6
            + (5 - 2*c1 + 28*t1 - 3*(c1*c1) + {r(8 * _EP2)}
               + 24*(t1*t1)) * pow(d, 5) / 120
          ) / cos1) * {r(rad2deg)} AS lon,
         (phi1 - (n1 * tan1 / r1) * (
            (d*d) / 2
            - (5 + 3*t1 + 10*c1 - 4*(c1*c1) - {r(9 * _EP2)})
              * pow(d, 4) / 24
            + (61 + 90*t1 + 298*c1 + 45*(t1*t1) - {r(252 * _EP2)}
               - 3*(c1*c1)) * pow(d, 6) / 720
          )) * {r(rad2deg)} AS lat
  FROM (
    SELECT {keep}, phi1, cos1, tan1, c1, t1, n1, r1,
           (utm_e - {r(_FE)}) / (n1 * {r(_K0)}) AS d
    FROM (
      SELECT {keep}, utm_e, phi1, cos1, tan1, c1, t1,
             {r(_A)} / sqrt(den) AS n1,
             {r(an)} / pow(den, 1.5) AS r1
      FROM (
        SELECT {keep}, utm_e, phi1, sin1, cos1, tan1,
               {r(_EP2)} * (cos1*cos1) AS c1,
               tan1*tan1 AS t1,
               1 - {r(_E2)} * (sin1*sin1) AS den
        FROM (
          SELECT {keep}, utm_e, phi1,
                 sin(phi1) AS sin1, cos(phi1) AS cos1,
                 tan(phi1) AS tan1
          FROM (
            SELECT {keep}, utm_e,
                   mu + {r(c2)}*sin(2*mu) + {r(c4)}*sin(4*mu)
                      + {r(c6)}*sin(6*mu) + {r(c8)}*sin(8*mu) AS phi1
            FROM (
              SELECT {keep}, ({east}) AS utm_e,
                     ((({north}) - {r(fn)}) / {r(_K0)}) / {r(p)} AS mu
              FROM {src_sql}
            ) tm1
          ) tm2
        ) tm3
      ) tm4
    ) tm5
  ) tm6
)"""


def webmercator_forward(lon: np.ndarray, lat: np.ndarray):
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_inverse(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(x / _A)
    lat = np.degrees(2 * np.arctan(np.exp(y / _A)) - np.pi / 2)
    return lon, lat


def _parse_epsg(code: int):
    """→ ('geographic'|'utm'|'webmerc', zone, south)"""
    if code == 4326:
        return "geographic", 0, False
    if code == 3857:
        return "webmerc", 0, False
    if 32601 <= code <= 32660:
        return "utm", code - 32600, False
    if 32701 <= code <= 32760:
        return "utm", code - 32700, True
    raise ValueError(
        f"EPSG:{code} unsupported — engine implements 4326, 3857, and UTM "
        f"(32601-32660, 32701-32760); see geom/transform.py"
    )


def transform_xy(
    xy: np.ndarray, src_epsg: int, dst_epsg: int
) -> np.ndarray:
    """(n, 2) coordinate array, src → WGS84 → dst."""
    if src_epsg == dst_epsg:
        return xy
    x, y = xy[:, 0], xy[:, 1]
    kind, zone, south = _parse_epsg(src_epsg)
    if kind == "utm":
        lon, lat = utm_inverse(x, y, zone, south)
    elif kind == "webmerc":
        lon, lat = webmercator_inverse(x, y)
    else:
        lon, lat = x, y
    kind, zone, south = _parse_epsg(dst_epsg)
    if kind == "utm":
        ox, oy = utm_forward(lon, lat, zone, south)
    elif kind == "webmerc":
        ox, oy = webmercator_forward(lon, lat)
    else:
        ox, oy = lon, lat
    return np.column_stack([ox, oy])


def epsg_supported(code: Column) -> Column:
    """Native predicate twin of _parse_epsg: TRUE iff the engine can
    reproject this code (4326, 3857, UTM 32601-60/32701-60). Keep in
    sync with _parse_epsg — tests/test_transform.py sweeps a code range
    asserting the two agree. NULL → FALSE (missing .prj sidecar)."""
    return code.isNotNull() & (
        (code == 4326)
        | (code == 3857)
        | code.between(32601, 32660)
        | code.between(32701, 32760)
    )


def st_transform_xy(
    x: Column, y: Column, src_epsg: Column, dst_epsg: int = 4326
) -> Column:
    """Point-coordinate transform → struct(x, y), vectorized per EPSG
    group inside the batch (the flip-probe path: transforming just the
    centroid point instead of every vertex makes the probe pass
    near-free)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_type = StructType(
        [StructField("x", DoubleType()), StructField("y", DoubleType())]
    )

    @F.pandas_udf(out_type)
    def _udf(xs: pd.Series, ys: pd.Series, codes: pd.Series) -> pd.DataFrame:
        ox = xs.to_numpy(dtype="f8", na_value=np.nan).copy()
        oy = ys.to_numpy(dtype="f8", na_value=np.nan).copy()
        cvals = codes.to_numpy(dtype="f8", na_value=np.nan)
        for code in np.unique(cvals[~np.isnan(cvals)]):
            sel = cvals == code
            res = transform_xy(
                np.column_stack([ox[sel], oy[sel]]), int(code), dst_epsg
            )
            ox[sel] = res[:, 0]
            oy[sel] = res[:, 1]
        return pd.DataFrame({"x": ox, "y": oy})

    return _udf(x, y, src_epsg)


def st_transform(geom: Column, src_epsg: Column, dst_epsg: int) -> Column:
    """ST_TRANSFORM over WKB: per-row source CRS (the corpus declares
    CRS per FILE — constant within partitions, so the per-row branch
    costs nothing in practice), fixed destination."""

    @F.pandas_udf(BinaryType())
    def _udf(g: pd.Series, s: pd.Series) -> pd.Series:
        out = []
        for buf, code in zip(g, s):
            if buf is None or code is None:
                out.append(None)
                continue
            out.append(
                K.transform_coords(
                    bytes(buf),
                    lambda xy, c=int(code): transform_xy(xy, c, dst_epsg),
                )
            )
        return pd.Series(out)

    return _udf(geom, src_epsg)
