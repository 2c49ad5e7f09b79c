"""Single-node ESRI shapefile writer (.shp/.shx/.dbf bytes).

Covers the reference's writer surface (reference src/shapefile.py
W1-W6: ShpWriter sf.py:4727-4787, ShxWriter sf.py:4801-4813, dbf
writer sf.py:4300-4546) at test/export scale.  This is NOT the engine's
distributed sink (that is Parquet/Iceberg, see plans/lineage.py) — it
exists to round-trip geometry out of DataFrames for interop and to
build deterministic fixtures the reference reader can open as the
oracle.

Value encodings follow the dbf rules the reference enforces: numbers
right-justified space-padded (sf.py:4407-4428), dates YYYYMMDD
zero-filled (sf.py:4429-4447), logical T/F/space (sf.py:4448-4457),
strings left-justified, UTF-8.
"""

from __future__ import annotations

import datetime as _dt
import struct
import warnings

import numpy as np

from pyshp_spark.sources.shapefile import (
    MULTIPATCH,
    MULTIPOINT,
    MULTIPOINTM,
    MULTIPOINTZ,
    NULL,
    POINT,
    POINTM,
    POINTZ,
    POLYGON,
    POLYGONM,
    POLYGONZ,
    POLYLINE,
    POLYLINEM,
    POLYLINEZ,
)

class PossibleDataLoss(Warning):
    """Non-strict dbf writes warn with this category when a value had
    to be truncated/capped to fit its field (reference sf.py:234-235)."""


class DbfStringDataLoss(ValueError):
    """Strict dbf writes raise this when a value cannot be encoded into
    its field without loss (reference sf.py:238-239)."""


_HEADER_LEN = 100
NODATA = -1e39  # m=None encoding (reference sf.py:796-798)
_Z_TYPES = {POINTZ, POLYLINEZ, POLYGONZ, MULTIPOINTZ}
_M_TYPES = {POINTM, POINTZ, POLYLINEM, POLYLINEZ, POLYGONM, POLYGONZ,
            MULTIPOINTM, MULTIPOINTZ}
_BASE_OF = {
    POINTZ: POINT, POINTM: POINT,
    POLYLINEZ: POLYLINE, POLYLINEM: POLYLINE,
    POLYGONZ: POLYGON, POLYGONM: POLYGON,
    MULTIPOINTZ: MULTIPOINT, MULTIPOINTM: MULTIPOINT,
}


def _ms_bytes(m, n: int) -> bytes:
    vals = [NODATA if v is None else float(v) for v in (m or [None] * n)]
    data = [v for v in vals if v >= -1e38]
    mmin = min(data) if data else NODATA
    mmax = max(data) if data else NODATA
    return struct.pack("<2d", mmin, mmax) + struct.pack(f"<{n}d", *vals)


def _zs_bytes(z, n: int) -> bytes:
    vals = [0.0 if v is None else float(v) for v in (z or [0.0] * n)]
    return struct.pack("<2d", min(vals), max(vals)) + struct.pack(f"<{n}d", *vals)


def _shp_header(shape_type: int, bbox, total_words: int) -> bytes:
    h = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    h += struct.pack(">i", total_words)
    h += struct.pack("<2i", 1000, shape_type)
    h += struct.pack("<4d", *bbox)
    h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    return h


def _record_body(shape_type: int, shape, z=None, m=None, part_types=None) -> bytes:
    """shape: None (null) | (x, y) point | list-of-parts, each (n,2).
    z/m: optional per-point sequences for the Z/M shape types (m may
    contain None -> NODATA, reference sf.py:1985-1986).  part_types:
    per-part surface-patch types for MULTIPATCH (reference
    sf.py:5093-5198; TRIANGLE_STRIP(0)..RING(5))."""
    if shape_type == MULTIPATCH:
        # type + bbox + nParts + nPoints + parts + partTypes + points
        # + zbox/z + mbox/m (always both blocks; reader tolerates the
        # m block being absent, the reference writer emits it)
        parts = [np.asarray(p, dtype=np.float64).reshape(-1, 2) for p in shape]
        allpts = np.vstack(parts)
        if part_types is None or len(part_types) != len(parts):
            raise ValueError("MULTIPATCH needs one part_type per part")
        body = struct.pack(
            "<i4d",
            MULTIPATCH,
            allpts[:, 0].min(),
            allpts[:, 1].min(),
            allpts[:, 0].max(),
            allpts[:, 1].max(),
        )
        body += struct.pack("<2i", len(parts), len(allpts))
        offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
        body += offs.tobytes()
        body += np.asarray(part_types, dtype="<i4").tobytes()
        body += np.ascontiguousarray(allpts, dtype="<f8").tobytes()
        body += _zs_bytes(z, len(allpts))
        body += _ms_bytes(m, len(allpts))
        return body
    if shape_type in _BASE_OF:
        base = _BASE_OF[shape_type]
        body = _record_body(base, shape)
        # swap declared type, then append Z / M blocks
        body = struct.pack("<i", shape_type) + body[4:]
        if base == POINT:
            out = body
            if shape_type in _Z_TYPES:
                out += struct.pack("<d", float((z or [0.0])[0]))
            if shape_type in _M_TYPES:
                mv = (m or [None])[0]
                out += struct.pack("<d", NODATA if mv is None else float(mv))
            return out
        n = (len(shape) if base == MULTIPOINT
             else sum(len(np.asarray(p).reshape(-1, 2)) for p in shape))
        out = body
        if shape_type in _Z_TYPES:
            out += _zs_bytes(z, n)
        if shape_type in _M_TYPES:
            out += _ms_bytes(m, n)
        return out
    if shape_type == NULL or shape is None:
        return struct.pack("<i", NULL)
    if shape_type == POINT:
        x, y = shape
        return struct.pack("<i2d", POINT, float(x), float(y))
    if shape_type == MULTIPOINT:
        pts = np.asarray(shape, dtype=np.float64).reshape(-1, 2)
        body = struct.pack(
            "<i4d",
            MULTIPOINT,
            pts[:, 0].min(),
            pts[:, 1].min(),
            pts[:, 0].max(),
            pts[:, 1].max(),
        )
        body += struct.pack("<i", len(pts))
        body += np.ascontiguousarray(pts, dtype="<f8").tobytes()
        return body
    # polygon / polyline: parts
    parts = [np.asarray(p, dtype=np.float64).reshape(-1, 2) for p in shape]
    allpts = np.vstack(parts)
    body = struct.pack(
        "<i4d",
        shape_type,
        allpts[:, 0].min(),
        allpts[:, 1].min(),
        allpts[:, 0].max(),
        allpts[:, 1].max(),
    )
    body += struct.pack("<2i", len(parts), len(allpts))
    offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
    body += offs.tobytes()
    body += np.ascontiguousarray(allpts, dtype="<f8").tobytes()
    return body


def write_shp(shapes: list[tuple]) -> tuple[bytes, bytes]:
    """shapes: [(shape_type, payload[, z[, m[, part_types]]])]
    -> (.shp, .shx bytes)."""
    shapes = [tuple(s) + (None,) * (5 - len(s)) for s in shapes]
    bodies = [_record_body(t, s, z, m, pt) for t, s, z, m, pt in shapes]
    xmins, ymins, xmaxs, ymaxs = [], [], [], []
    for (t, s, _z, _m, _pt), b in zip(shapes, bodies):
        if t == NULL or s is None:
            continue
        if t in (POINT, POINTZ, POINTM):
            xmins.append(s[0]); xmaxs.append(s[0])
            ymins.append(s[1]); ymaxs.append(s[1])
        else:
            bx = struct.unpack_from("<4d", b, 4)
            xmins.append(bx[0]); ymins.append(bx[1])
            xmaxs.append(bx[2]); ymaxs.append(bx[3])
    bbox = (
        (min(xmins), min(ymins), max(xmaxs), max(ymaxs))
        if xmins
        else (0.0, 0.0, 0.0, 0.0)
    )
    shape_type = next((t for t, _s, _z, _m, _pt in shapes if t != NULL), NULL)

    recs = []
    shx_items = []
    pos = _HEADER_LEN
    for i, body in enumerate(bodies):
        shx_items.append((pos // 2, len(body) // 2))
        recs.append(struct.pack(">2i", i + 1, len(body) // 2) + body)
        pos += 8 + len(body)

    shp = _shp_header(shape_type, bbox, pos // 2) + b"".join(recs)
    shx_body = b"".join(struct.pack(">2i", o, n) for o, n in shx_items)
    shx = _shp_header(shape_type, bbox, (_HEADER_LEN + len(shx_body)) // 2) + shx_body
    return shp, shx


def write_dbf(fields: list[tuple[str, str, int, int]], records: list[list],
              strict: bool = False) -> bytes:
    """fields: [(name, type C/N/F/D/L, size, decimal)]; records: rows of
    python values (None allowed).

    Data-loss modes follow the reference writer (sf.py:340-453):
    ``strict=True`` raises DbfStringDataLoss when a C/M string must be
    truncated to fit its field; the default warns (PossibleDataLoss)
    and truncates on a UTF-8 code-point boundary.  Numbers whose
    formatted form exceeds the field width are capped to the leading
    ``size`` characters like the reference (sf.py:4421-4428) — with a
    PossibleDataLoss warning (the reference caps silently; a silently
    corrupted number is strictly worse than a warned one), or a
    DbfStringDataLoss in strict mode."""
    record_len = 1 + sum(size for _, _, size, _ in fields)
    header_len = 32 + 32 * len(fields) + 1
    today = _dt.date(2026, 1, 1)  # deterministic
    hdr = struct.pack(
        "<4BIHH20x",
        3,
        today.year - 1900,
        today.month,
        today.day,
        len(records),
        header_len,
        record_len,
    )
    fdescs = []
    for name, ftype, size, decimal in fields:
        fdescs.append(
            struct.pack(
                "<11sc4xBB14x",
                name.encode("ascii")[:10],
                ftype.encode("ascii"),
                size,
                decimal,
            )
        )
    out = [hdr, b"".join(fdescs), b"\x0d"]
    for rec in records:
        out.append(b" ")
        for (name, ftype, size, decimal), v in zip(fields, rec):
            out.append(_encode_dbf_value(v, ftype, size, decimal, strict))
    out.append(b"\x1a")
    return b"".join(out)


def _encode_dbf_value(v, ftype: str, size: int, decimal: int,
                      strict: bool = False) -> bytes:
    if ftype in ("N", "F"):
        if v is None:
            return b" " * size
        s = f"{float(v):.{decimal}f}" if decimal else str(int(v))
        b = s.encode("ascii")
        if len(b) > size:
            msg = f"numeric value {s} exceeds field width {size}"
            if strict:
                raise DbfStringDataLoss(msg)
            warnings.warn(f"{msg}; capped to {s[:size]!r}",
                          category=PossibleDataLoss)
            b = b[:size]  # reference cap semantics (sf.py:4421-4428)
        return b.rjust(size, b" ")
    if ftype == "D":
        if v is None:
            return b" " * size
        return f"{v.year:04d}{v.month:02d}{v.day:02d}".encode("ascii")
    if ftype == "L":
        if v is None:
            return b" "
        return b"T" if v else b"F"
    s = "" if v is None else str(v)
    b = s.encode("utf-8")
    if len(b) > size:
        msg = (
            f"string value of {len(b)} encoded bytes truncated to fit "
            f"{size}-byte dbf field"
        )
        if strict:
            raise DbfStringDataLoss(msg)
        warnings.warn(msg, category=PossibleDataLoss)
        if len(b) == len(s):
            # one byte per code point (ASCII): a plain cut is safe
            b = b[:size]
        else:
            # never split a multi-byte code point: cut at the last UTF-8
            # start byte below `size` (reference parity, sf.py:254-283 —
            # including its conservative drop when b[size] is a start byte)
            for i in reversed(range(size)):
                if (b[i] & 0xC0) != 0x80:
                    b = b[:i]
                    break
            else:
                raise ValueError(
                    f"cannot truncate UTF-8 value {b!r} to {size} bytes"
                )
    return b.ljust(size, b" ")
