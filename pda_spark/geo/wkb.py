"""WKB (well-known binary) codec, pure numpy/struct — no shapely.

The reference stores geometry as PostGIS/GeoAlchemy2 ``Geometry`` columns,
i.e. (E)WKB on the wire (/root/reference/database/db.py:164,
/root/reference/api_importer/clients/data.py:252-253). Our engine keeps
geometry at rest as WKB in Spark ``BinaryType`` columns and decodes it only
inside pandas UDF kernels.

Decoded representation (dataclass ``Geom``):
- ``gtype``: 1 Point, 2 LineString, 3 Polygon, 4 MultiPoint,
  5 MultiLineString, 6 MultiPolygon
- ``parts``: for Point/LineString -> [ndarray (N,2)];
  for Polygon -> [outer_ring, hole1, ...] each (N,2), closed;
  for Multi* -> list of sub-geometry part-lists.

EWKB SRID flags (PostGIS extension) are accepted on decode and never
emitted on encode; both endiannesses are accepted, little-endian emitted.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

_EWKB_SRID = 0x20000000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000


@dataclass
class Geom:
    gtype: int
    parts: list  # see module docstring

    def polygons(self) -> list[list[np.ndarray]]:
        """Normalize to a list of polygons (each a list of rings)."""
        if self.gtype == POLYGON:
            return [self.parts]
        if self.gtype == MULTIPOLYGON:
            return self.parts
        raise ValueError(f"not polygonal: gtype={self.gtype}")

    def lines(self) -> list[np.ndarray]:
        """Normalize to a list of polylines (each (N,2)). The reference's
        land-cover table mixes urban polygons with river/lake centerline
        LineStrings (/root/reference/api_importer/clients/geojson_xyz.py:59-70,
        model database/db.py:248-253), so intersects kernels must accept
        lineal operands."""
        if self.gtype == LINESTRING:
            return [self.parts[0]]
        if self.gtype == MULTILINESTRING:
            return [p[0] for p in self.parts]
        raise ValueError(f"not lineal: gtype={self.gtype}")

    def points(self) -> np.ndarray:
        """All coordinates as a flat (N,2) array."""
        out = []

        def walk(parts):
            for p in parts:
                if isinstance(p, np.ndarray):
                    out.append(p)
                else:
                    walk(p)

        walk(self.parts)
        return np.concatenate(out) if out else np.empty((0, 2))


def _read_coords(buf: memoryview, off: int, n: int, lt: bool, dims: int) -> tuple[np.ndarray, int]:
    dt = "<f8" if lt else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=n * dims, offset=off).reshape(n, dims)
    return np.ascontiguousarray(arr[:, :2], dtype=np.float64), off + 8 * n * dims


def _decode_at(buf: memoryview, off: int) -> tuple[Geom, int]:
    lt = buf[off] == 1
    fmt = "<I" if lt else ">I"
    (raw_type,) = struct.unpack_from(fmt, buf, off + 1)
    off += 5
    if raw_type & _EWKB_SRID:
        off += 4  # skip srid
    dims = 2 + bool(raw_type & _EWKB_Z) + bool(raw_type & _EWKB_M)
    gtype = raw_type & 0xFF
    if gtype == POINT:
        coords, off = _read_coords(buf, off, 1, lt, dims)
        return Geom(POINT, [coords]), off
    if gtype == LINESTRING:
        (n,) = struct.unpack_from(fmt, buf, off)
        coords, off = _read_coords(buf, off + 4, n, lt, dims)
        return Geom(LINESTRING, [coords]), off
    if gtype == POLYGON:
        (nrings,) = struct.unpack_from(fmt, buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(fmt, buf, off)
            ring, off = _read_coords(buf, off + 4, n, lt, dims)
            rings.append(ring)
        return Geom(POLYGON, rings), off
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (ngeo,) = struct.unpack_from(fmt, buf, off)
        off += 4
        subs = []
        for _ in range(ngeo):
            sub, off = _decode_at(buf, off)
            subs.append(sub.parts)
        return Geom(gtype, subs), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def decode(buf: bytes | bytearray | memoryview) -> Geom:
    geom, _ = _decode_at(memoryview(bytes(buf)), 0)
    return geom


# ---------------------------------------------------------------- encoders


def point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, lon, lat)


def points_vec(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    """Vectorized encode of many points: one frombuffer-style pack."""
    n = len(lon)
    out = np.zeros(n, dtype=np.dtype([("e", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")]))
    out["e"] = 1
    out["t"] = POINT
    out["x"] = np.asarray(lon, dtype=np.float64)
    out["y"] = np.asarray(lat, dtype=np.float64)
    raw = out.tobytes()
    return [raw[i * 21 : (i + 1) * 21] for i in range(n)]


def decode_points_vec(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a column of little-endian point WKBs."""
    raw = b"".join(bufs)
    n = len(raw) // 21
    arr = np.frombuffer(raw, dtype=np.dtype([("e", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")]), count=n)
    if not (arr["e"] == 1).all() or not (arr["t"] == POINT).all():
        xs = np.empty(len(bufs)), np.empty(len(bufs))
        for i, b in enumerate(bufs):  # mixed/ewkb fallback
            g = decode(b)
            xs[0][i], xs[1][i] = g.parts[0][0]
        return xs
    return arr["x"].copy(), arr["y"].copy()


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    return struct.pack("<I", len(ring)) + ring.astype("<f8").tobytes()


def linestring(coords: np.ndarray) -> bytes:
    return struct.pack("<BI", 1, LINESTRING) + _ring_bytes(coords)


def polygon(rings: list[np.ndarray]) -> bytes:
    rings = [close_ring(r) for r in rings]
    return struct.pack("<BII", 1, POLYGON, len(rings)) + b"".join(_ring_bytes(r) for r in rings)


def multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    body = b"".join(polygon(rings) for rings in polys)
    return struct.pack("<BII", 1, MULTIPOLYGON, len(polys)) + body


def multilinestring(lines: list[np.ndarray]) -> bytes:
    body = b"".join(linestring(ln) for ln in lines)
    return struct.pack("<BII", 1, MULTILINESTRING, len(lines)) + body


def encode(g: Geom) -> bytes:
    """Geom -> little-endian WKB (inverse of decode for supported kinds)."""
    if g.gtype == POINT:
        return points_vec(g.parts[0][:, 0][:1], g.parts[0][:, 1][:1])[0]
    if g.gtype == LINESTRING:
        return linestring(g.parts[0])
    if g.gtype == MULTILINESTRING:
        return multilinestring([p[0] for p in g.parts])
    if g.gtype == POLYGON:
        return polygon(g.parts)
    if g.gtype == MULTIPOLYGON:
        return multipolygon(g.parts)
    raise ValueError(f"encode: unsupported gtype {g.gtype}")


def close_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0 or (ring[0] == ring[-1]).all():
        return ring
    return np.vstack([ring, ring[:1]])


def box(minx: float, miny: float, maxx: float, maxy: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW)."""
    return polygon([np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]])])
