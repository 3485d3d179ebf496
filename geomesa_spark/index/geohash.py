"""Base-32 geohash encode/decode (reference: geomesa-spark-jts
GeoHashUtils.scala:25-133 — interleaved lon/lat bisection bits -> base32).

Vectorized via the same Morton bit-spreading used for Z2: a geohash of
`prec` bits is the top `prec` bits of interleave(lon_bits, lat_bits) with
lon occupying the even (first) positions."""

from __future__ import annotations

import numpy as np

from .zorder import interleave2, normalize

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}


def geohash_encode(lons, lats, prec_bits: int) -> np.ndarray:
    """Geohash strings at `prec_bits` total bits (must be multiple of 5)."""
    if prec_bits % 5 != 0 or prec_bits <= 0 or prec_bits > 60:
        raise ValueError("geohash precision must be a positive multiple of 5 <= 60")
    nlon = (prec_bits + 1) // 2
    nlat = prec_bits // 2
    ix = normalize(lons, -180.0, 180.0, nlon)
    iy = normalize(lats, -90.0, 90.0, nlat)
    z = _interleave_unequal(ix, iy, nlon, nlat)
    chars = np.empty(len(np.atleast_1d(z)), dtype=object)
    zv = np.atleast_1d(z).astype(np.int64)
    n_chars = prec_bits // 5
    for i in range(len(zv)):
        v = int(zv[i])
        s = []
        for c in range(n_chars):
            shift = prec_bits - 5 * (c + 1)
            s.append(_BASE32[(v >> shift) & 31])
        chars[i] = "".join(s)
    return chars


def _interleave_unequal(ix, iy, nlon: int, nlat: int) -> np.ndarray:
    """MSB-first interleave starting with lon, lon has nlon bits, lat nlat."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    total = nlon + nlat
    z = np.zeros_like(ix)
    for b in range(total):
        if b % 2 == 0:  # lon bit
            k = b // 2
            bit = (ix >> (nlon - 1 - k)) & 1
        else:
            k = b // 2
            bit = (iy >> (nlat - 1 - k)) & 1
        z = (z << 1) | bit
    return z


def geohash_decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) of a geohash cell."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    even = True
    for ch in gh:
        v = _BASE32_INV[ch]
        for shift in range(4, -1, -1):
            bit = (v >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lon_lo, lat_lo, lon_hi, lat_hi


def geohash_decode_point(gh: str) -> tuple[float, float]:
    minx, miny, maxx, maxy = geohash_decode_bbox(gh)
    return (minx + maxx) / 2, (miny + maxy) / 2
