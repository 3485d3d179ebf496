"""Geodesy: WGS84 spheroid distances (Vincenty inverse) and a small CRS
registry with transform support (st_transform / st_distanceSpheroid /
st_lengthSpheroid — reference GeometricDistanceFunctions.scala:22-65 uses
GeoTools GeodeticCalculator orthodromic distance).

Supported CRS: EPSG:4326, EPSG:3857 (web mercator), EPSG:27700 (OSGB / Airy
1830 with 7-param Helmert), EPSG:326xx/327xx (UTM on WGS84). Pure numpy,
derived from published formulas (Vincenty 1975; OSGB "A guide to coordinate
systems in Great Britain"; Karney-free series TM)."""

from __future__ import annotations

import math

import numpy as np

# WGS84
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1 - WGS84_F)

# Airy 1830 (OSGB36)
AIRY_A = 6377563.396
AIRY_B = 6356256.909


def vincenty_inverse(lon1, lat1, lon2, lat2, a=WGS84_A, f=WGS84_F) -> float:
    """Vincenty inverse geodesic distance (meters) on the WGS84 ellipsoid."""
    b = a * (1 - f)
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    U2 = math.atan((1 - f) * math.tan(math.radians(lat2)))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(200):
        sinLam, cosLam = math.sin(lam), math.cos(lam)
        sinSigma = math.sqrt(
            (cosU2 * sinLam) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosLam) ** 2
        )
        if sinSigma == 0:
            return 0.0
        cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
        sigma = math.atan2(sinSigma, cosSigma)
        sinAlpha = cosU1 * cosU2 * sinLam / sinSigma
        cos2Alpha = 1 - sinAlpha**2
        cos2SigmaM = (
            cosSigma - 2 * sinU1 * sinU2 / cos2Alpha if cos2Alpha != 0 else 0.0
        )
        C = f / 16 * cos2Alpha * (4 + f * (4 - 3 * cos2Alpha))
        lamPrev = lam
        lam = L + (1 - C) * f * sinAlpha * (
            sigma
            + C
            * sinSigma
            * (cos2SigmaM + C * cosSigma * (-1 + 2 * cos2SigmaM**2))
        )
        if abs(lam - lamPrev) < 1e-12:
            break
    u2 = cos2Alpha * (a**2 - b**2) / b**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    deltaSigma = (
        B
        * sinSigma
        * (
            cos2SigmaM
            + B
            / 4
            * (
                cosSigma * (-1 + 2 * cos2SigmaM**2)
                - B
                / 6
                * cos2SigmaM
                * (-3 + 4 * sinSigma**2)
                * (-3 + 4 * cos2SigmaM**2)
            )
        )
    )
    return b * A * (sigma - deltaSigma)


def spheroid_distance(lon1, lat1, lon2, lat2) -> float:
    return vincenty_inverse(lon1, lat1, lon2, lat2)


# ------------------------------------------------------------- CRS transforms


def _geodetic_to_ecef(lon, lat, h, a, b):
    e2 = 1 - (b * b) / (a * a)
    lon, lat = np.radians(lon), np.radians(lat)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    x = (N + h) * np.cos(lat) * np.cos(lon)
    y = (N + h) * np.cos(lat) * np.sin(lon)
    z = (N * (1 - e2) + h) * np.sin(lat)
    return x, y, z


def _ecef_to_geodetic(x, y, z, a, b):
    e2 = 1 - (b * b) / (a * a)
    p = np.sqrt(x * x + y * y)
    lon = np.arctan2(y, x)
    lat = np.arctan2(z, p * (1 - e2))
    for _ in range(8):
        N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
        h = p / np.cos(lat) - N
        lat = np.arctan2(z, p * (1 - e2 * N / (N + h)))
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    h = p / np.cos(lat) - N
    return np.degrees(lon), np.degrees(lat), h


# WGS84 -> OSGB36 7-param Helmert (OS standard small-angle version)
_OSGB_HELMERT = dict(
    tx=-446.448, ty=125.157, tz=-542.060,  # meters
    rx=-0.1502, ry=-0.2470, rz=-0.8421,  # arc-seconds
    s=20.4894e-6,  # scale ppm
)


def _helmert(x, y, z, p, inverse=False):
    sgn = -1.0 if inverse else 1.0
    tx, ty, tz = sgn * p["tx"], sgn * p["ty"], sgn * p["tz"]
    rx = sgn * math.radians(p["rx"] / 3600)
    ry = sgn * math.radians(p["ry"] / 3600)
    rz = sgn * math.radians(p["rz"] / 3600)
    s = sgn * p["s"]
    x2 = tx + (1 + s) * x - rz * y + ry * z
    y2 = ty + rz * x + (1 + s) * y - rx * z
    z2 = tz - ry * x + rx * y + (1 + s) * z
    return x2, y2, z2


def _tm_forward(lon, lat, a, b, f0, lat0, lon0, e0, n0):
    """Transverse Mercator forward (OSGB/UTM formulation, numpy)."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat0 = math.radians(lat0)
    lon0 = math.radians(lon0)
    e2 = 1 - (b * b) / (a * a)
    n = (a - b) / (a + b)
    sinl, cosl, tanl = np.sin(lat), np.cos(lat), np.tan(lat)
    nu = a * f0 / np.sqrt(1 - e2 * sinl**2)
    rho = a * f0 * (1 - e2) / (1 - e2 * sinl**2) ** 1.5
    eta2 = nu / rho - 1
    M = (
        b
        * f0
        * (
            (1 + n + 5 / 4 * n**2 + 5 / 4 * n**3) * (lat - lat0)
            - (3 * n + 3 * n**2 + 21 / 8 * n**3)
            * np.sin(lat - lat0)
            * np.cos(lat + lat0)
            + (15 / 8 * n**2 + 15 / 8 * n**3)
            * np.sin(2 * (lat - lat0))
            * np.cos(2 * (lat + lat0))
            - 35 / 24 * n**3 * np.sin(3 * (lat - lat0)) * np.cos(3 * (lat + lat0))
        )
    )
    I = M + n0
    II = nu / 2 * sinl * cosl
    III = nu / 24 * sinl * cosl**3 * (5 - tanl**2 + 9 * eta2)
    IIIA = nu / 720 * sinl * cosl**5 * (61 - 58 * tanl**2 + tanl**4)
    IV = nu * cosl
    V = nu / 6 * cosl**3 * (nu / rho - tanl**2)
    VI = (
        nu
        / 120
        * cosl**5
        * (5 - 18 * tanl**2 + tanl**4 + 14 * eta2 - 58 * tanl**2 * eta2)
    )
    dl = lon - lon0
    north = I + II * dl**2 + III * dl**4 + IIIA * dl**6
    east = e0 + IV * dl + V * dl**3 + VI * dl**5
    return east, north


def _tm_inverse(east, north, a, b, f0, lat0, lon0, e0, n0):
    east = np.asarray(east, dtype=np.float64)
    north = np.asarray(north, dtype=np.float64)
    lat0r = math.radians(lat0)
    lon0r = math.radians(lon0)
    e2 = 1 - (b * b) / (a * a)
    n = (a - b) / (a + b)
    lat = (north - n0) / (a * f0) + lat0r
    for _ in range(20):
        M = (
            b
            * f0
            * (
                (1 + n + 5 / 4 * n**2 + 5 / 4 * n**3) * (lat - lat0r)
                - (3 * n + 3 * n**2 + 21 / 8 * n**3)
                * np.sin(lat - lat0r)
                * np.cos(lat + lat0r)
                + (15 / 8 * n**2 + 15 / 8 * n**3)
                * np.sin(2 * (lat - lat0r))
                * np.cos(2 * (lat + lat0r))
                - 35 / 24 * n**3 * np.sin(3 * (lat - lat0r)) * np.cos(3 * (lat + lat0r))
            )
        )
        lat = lat + (north - n0 - M) / (a * f0)
        if np.all(np.abs(north - n0 - M) < 1e-5):
            break
    sinl, cosl, tanl = np.sin(lat), np.cos(lat), np.tan(lat)
    nu = a * f0 / np.sqrt(1 - e2 * sinl**2)
    rho = a * f0 * (1 - e2) / (1 - e2 * sinl**2) ** 1.5
    eta2 = nu / rho - 1
    VII = tanl / (2 * rho * nu)
    VIII = tanl / (24 * rho * nu**3) * (5 + 3 * tanl**2 + eta2 - 9 * tanl**2 * eta2)
    IX = tanl / (720 * rho * nu**5) * (61 + 90 * tanl**2 + 45 * tanl**4)
    X = 1 / (cosl * nu)
    XI = 1 / (cosl * 6 * nu**3) * (nu / rho + 2 * tanl**2)
    XII = 1 / (cosl * 120 * nu**5) * (5 + 28 * tanl**2 + 24 * tanl**4)
    XIIA = (
        1
        / (cosl * 5040 * nu**7)
        * (61 + 662 * tanl**2 + 1320 * tanl**4 + 720 * tanl**6)
    )
    de = east - e0
    lat_out = lat - VII * de**2 + VIII * de**4 - IX * de**6
    lon_out = lon0r + X * de - XI * de**3 + XII * de**5 - XIIA * de**7
    return np.degrees(lon_out), np.degrees(lat_out)


def _web_mercator_fwd(lon, lat):
    R = 6378137.0
    x = np.radians(np.asarray(lon, dtype=np.float64)) * R
    y = R * np.log(np.tan(math.pi / 4 + np.radians(np.asarray(lat, dtype=np.float64)) / 2))
    return x, y


def _web_mercator_inv(x, y):
    R = 6378137.0
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - math.pi / 2)
    return lon, lat


def _osgb_fwd(lon, lat):
    # WGS84 geodetic -> OSGB36 geodetic (Helmert) -> TM grid
    x, y, z = _geodetic_to_ecef(lon, lat, 0.0, WGS84_A, WGS84_B)
    x, y, z = _helmert(x, y, z, _OSGB_HELMERT)
    lon2, lat2, _ = _ecef_to_geodetic(x, y, z, AIRY_A, AIRY_B)
    return _tm_forward(
        lon2, lat2, AIRY_A, AIRY_B, 0.9996012717, 49.0, -2.0, 400000.0, -100000.0
    )


def _osgb_inv(e, n):
    lon2, lat2 = _tm_inverse(
        e, n, AIRY_A, AIRY_B, 0.9996012717, 49.0, -2.0, 400000.0, -100000.0
    )
    x, y, z = _geodetic_to_ecef(lon2, lat2, 0.0, AIRY_A, AIRY_B)
    x, y, z = _helmert(x, y, z, _OSGB_HELMERT, inverse=True)
    lon, lat, _ = _ecef_to_geodetic(x, y, z, WGS84_A, WGS84_B)
    return lon, lat


def _utm(zone: int, south: bool):
    lon0 = -183.0 + 6 * zone
    n0 = 10000000.0 if south else 0.0

    def fwd(lon, lat):
        return _tm_forward(lon, lat, WGS84_A, WGS84_B, 0.9996, 0.0, lon0, 500000.0, n0)

    def inv(e, n):
        return _tm_inverse(e, n, WGS84_A, WGS84_B, 0.9996, 0.0, lon0, 500000.0, n0)

    return fwd, inv


def transform_points(lons, lats, from_crs: str, to_crs: str):
    """Transform coordinate arrays between supported CRS codes."""
    from_crs = from_crs.upper()
    to_crs = to_crs.upper()
    if from_crs == to_crs:
        return np.asarray(lons, dtype=np.float64), np.asarray(lats, dtype=np.float64)
    # normalize to EPSG:4326 lon/lat first
    if from_crs == "EPSG:4326":
        lon, lat = np.asarray(lons, dtype=np.float64), np.asarray(lats, dtype=np.float64)
    elif from_crs == "EPSG:3857":
        lon, lat = _web_mercator_inv(lons, lats)
    elif from_crs == "EPSG:27700":
        lon, lat = _osgb_inv(lons, lats)
    elif from_crs.startswith("EPSG:326") or from_crs.startswith("EPSG:327"):
        zone = int(from_crs[8:])
        lon, lat = _utm(zone, from_crs.startswith("EPSG:327"))[1](lons, lats)
    else:
        raise ValueError(f"unsupported CRS {from_crs}")
    if to_crs == "EPSG:4326":
        return lon, lat
    if to_crs == "EPSG:3857":
        return _web_mercator_fwd(lon, lat)
    if to_crs == "EPSG:27700":
        return _osgb_fwd(lon, lat)
    if to_crs.startswith("EPSG:326") or to_crs.startswith("EPSG:327"):
        zone = int(to_crs[8:])
        return _utm(zone, to_crs.startswith("EPSG:327"))[0](lon, lat)
    raise ValueError(f"unsupported CRS {to_crs}")
