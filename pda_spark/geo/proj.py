"""EPSG:3035 (ETRS89-extended / LAEA Europe) forward + inverse, pure numpy.

The reference delegates reprojection to PostGIS ``ST_Transform(geom, 3035)``
(/root/reference/database/db.py:82-84,152,157,245). PostGIS delegates to
PROJ, whose Lambert azimuthal equal-area implementation follows Snyder,
"Map Projections — A Working Manual" (USGS PP 1395), eq. 3-12/3-16/24-x,
with the inverse authalic-latitude step done as a 3-term series
(PROJ ``pj_authlat``). We implement exactly those public formulas so that
centroid / area values match PostGIS to float64 precision (verified against
the reference's golden values in tests/test_geo_kernels.py).

Everything here is vectorized over numpy arrays — these functions are the
inner kernels of the pandas UDFs in pda_spark.functions.geo_udfs.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (EPSG:3035 datum ETRS89)
A = 6378137.0
F = 1.0 / 298.257222101
E2 = 2.0 * F - F * F
E = float(np.sqrt(E2))

LAT0 = np.radians(52.0)
LON0 = np.radians(10.0)
FE = 4321000.0  # false easting
FN = 3210000.0  # false northing


def _q_auth(phi: np.ndarray) -> np.ndarray:
    """Authalic q (Snyder 3-12)."""
    s = np.sin(phi)
    return (1.0 - E2) * (
        s / (1.0 - E2 * s * s) - (1.0 / (2.0 * E)) * np.log((1.0 - E * s) / (1.0 + E * s))
    )


QP = float(_q_auth(np.asarray(np.pi / 2.0)))
BETA1 = float(np.arcsin(_q_auth(np.asarray(LAT0)) / QP))
RQ = A * np.sqrt(QP / 2.0)
M1 = float(np.cos(LAT0) / np.sqrt(1.0 - E2 * np.sin(LAT0) ** 2))
D = A * M1 / (RQ * np.cos(BETA1))

_SB1 = np.sin(BETA1)
_CB1 = np.cos(BETA1)

# PROJ pj_authlat series coefficients (inverse authalic latitude)
_APA0 = E2 / 3.0 + 31.0 * E2**2 / 180.0 + 517.0 * E2**3 / 5040.0
_APA1 = 23.0 * E2**2 / 360.0 + 251.0 * E2**3 / 3780.0
_APA2 = 761.0 * E2**3 / 45360.0


def fwd(lon_deg: np.ndarray, lat_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees (EPSG:4326) -> x/y metres (EPSG:3035). Vectorized."""
    lam = np.radians(lon_deg) - LON0
    phi = np.radians(lat_deg)
    beta = np.arcsin(np.clip(_q_auth(phi) / QP, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    B = RQ * np.sqrt(2.0 / (1.0 + _SB1 * sb + _CB1 * cb * np.cos(lam)))
    x = B * D * cb * np.sin(lam) + FE
    y = (B / D) * (_CB1 * sb - _SB1 * cb * np.cos(lam)) + FN
    return x, y


def inv(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """x/y metres (EPSG:3035) -> lon/lat degrees (EPSG:4326). Vectorized."""
    xp = (np.asarray(x, dtype=np.float64) - FE) / D
    yp = (np.asarray(y, dtype=np.float64) - FN) * D
    rho = np.sqrt(xp * xp + yp * yp)
    safe_rho = np.where(rho == 0.0, 1.0, rho)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * RQ), -1.0, 1.0))
    sin_beta = np.cos(ce) * _SB1 + yp * np.sin(ce) * _CB1 / safe_rho
    sin_beta = np.where(rho == 0.0, _SB1, sin_beta)
    lam = np.arctan2(xp * np.sin(ce), rho * _CB1 * np.cos(ce) - yp * _SB1 * np.sin(ce))
    beta = np.arcsin(np.clip(sin_beta, -1.0, 1.0))
    phi = beta + _APA0 * np.sin(2 * beta) + _APA1 * np.sin(4 * beta) + _APA2 * np.sin(6 * beta)
    return np.degrees(LON0 + lam), np.degrees(phi)
