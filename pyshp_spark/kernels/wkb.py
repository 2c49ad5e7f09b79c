"""Minimal OGC WKB codec (little-endian) on numpy arrays.

The engine's geometry column is standard WKB so any downstream tool can
read it.  Supported geometry types map the reference's shapefile shape
types (reference src/shapefile.py:65-96): POINT->Point, MULTIPOINT->
MultiPoint, POLYLINE->LineString/MultiLineString (by part count),
POLYGON->Polygon/MultiPolygon (after ring organization).  Z/M variants
are projected to 2-D in WKB; z/m arrays travel in separate columns
(reference stores them on the Shape object, sf.py:1972-2080).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def _coords_bytes(a: np.ndarray) -> bytes:
    if (
        a.dtype == np.dtype("<f8")
        and a.ndim == 2
        and a.shape[1] == 2
        and a.flags.c_contiguous
    ):
        return a.tobytes()
    return np.ascontiguousarray(a[:, :2], dtype="<f8").tobytes()


def wkb_point(x: float, y: float) -> bytes:
    return _HDR.pack(1, WKB_POINT) + struct.pack("<dd", x, y)


def wkb_multipoint(coords) -> bytes:
    a = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    out = [_HDR.pack(1, WKB_MULTIPOINT), _U32.pack(len(a))]
    for x, y in a:
        out.append(wkb_point(float(x), float(y)))
    return b"".join(out)


def wkb_linestring(coords) -> bytes:
    a = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    return _HDR.pack(1, WKB_LINESTRING) + _U32.pack(len(a)) + _coords_bytes(a)


def wkb_multilinestring(lines) -> bytes:
    out = [_HDR.pack(1, WKB_MULTILINESTRING), _U32.pack(len(lines))]
    for line in lines:
        out.append(wkb_linestring(line))
    return b"".join(out)


def _polygon_body(rings) -> bytes:
    out = [_U32.pack(len(rings))]
    for r in rings:
        a = np.asarray(r, dtype=np.float64).reshape(-1, 2)
        out.append(_U32.pack(len(a)))
        out.append(_coords_bytes(a))
    return b"".join(out)


def wkb_polygon(rings) -> bytes:
    """rings: [exterior, hole, ...] each (n,2); caller controls winding."""
    return _HDR.pack(1, WKB_POLYGON) + _polygon_body(rings)


def wkb_multipolygon(polys) -> bytes:
    """polys: [[exterior, hole, ...], ...]."""
    out = [_HDR.pack(1, WKB_MULTIPOLYGON), _U32.pack(len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


def parse_wkb(buf: bytes):
    """Parse WKB -> (geom_type, payload).

    payload by type: Point -> (1,2) array; MultiPoint -> (n,2) array;
    LineString -> (n,2) array; MultiLineString -> [arrays];
    Polygon -> [ring arrays]; MultiPolygon -> [[ring arrays], ...].
    """
    geom_type, obj, _ = _parse_at(buf, 0)
    return geom_type, obj


def _parse_at(buf: bytes, off: int):
    endian, gtype = _HDR.unpack_from(buf, off)
    if endian != 1:
        raise ValueError("only little-endian WKB supported")
    off += _HDR.size
    if gtype == WKB_POINT:
        a = np.frombuffer(buf, dtype="<f8", count=2, offset=off).reshape(1, 2)
        return gtype, a, off + 16
    if gtype == WKB_LINESTRING:
        (n,) = _U32.unpack_from(buf, off)
        off += 4
        a = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        return gtype, a, off + 16 * n
    if gtype == WKB_POLYGON:
        (nr,) = _U32.unpack_from(buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = _U32.unpack_from(buf, off)
            off += 4
            rings.append(
                np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
            )
            off += 16 * n
        return gtype, rings, off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (n,) = _U32.unpack_from(buf, off)
        off += 4
        parts = []
        for _ in range(n):
            _, obj, off = _parse_at(buf, off)
            parts.append(obj)
        if gtype == WKB_MULTIPOINT:
            parts = (
                np.vstack(parts) if parts else np.empty((0, 2), dtype=np.float64)
            )
        return gtype, parts, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_rings(buf: bytes) -> list[np.ndarray]:
    """All rings of a (Multi)Polygon WKB, flattened — the refine-kernel
    view (even-odd containment needs no polygon/hole structure)."""
    gtype, obj = parse_wkb(buf)
    if gtype == WKB_POLYGON:
        return obj
    if gtype == WKB_MULTIPOLYGON:
        return [r for rings in obj for r in rings]
    raise ValueError(f"not a polygon WKB: type {gtype}")
