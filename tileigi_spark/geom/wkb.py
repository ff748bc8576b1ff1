"""Minimal WKB (ISO well-known binary) codec for 2-D geometries.

Supports the same geometry set the reference consumes from PostGIS
`ST_AsBinary` (lib.rs:568-580): Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon. Decode failures raise ValueError; callers
drop the row silently, matching the reference (lib.rs:572-579).
"""

from __future__ import annotations

import struct

_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
}
_CODES = {v: k for k, v in _TYPES.items()}


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self):
        buf, pos = self.buf, self.pos
        if pos + 5 > len(buf):
            raise ValueError("wkb: truncated header")
        big = buf[pos] == 0
        if buf[pos] not in (0, 1):
            raise ValueError("wkb: bad byte order")
        e = ">" if big else "<"
        (code,) = struct.unpack_from(e + "I", buf, pos + 1)
        self.pos = pos + 5
        # strip Z/M/SRID flags (EWKB): keep low 3 decimal digits
        srid = bool(code & 0x20000000)
        base = code & 0xFF
        if code & 0x80000000 or code & 0x40000000 or (base > 6 and base % 1000 > 6):
            raise ValueError("wkb: unsupported dimensionality")
        if srid:
            self.pos += 4
            code &= ~0x20000000
        base = code % 1000
        if base not in _TYPES:
            raise ValueError(f"wkb: unsupported type {code}")
        typ = _TYPES[base]
        if typ == "Point":
            return (typ, self._coords(e, 1)[0])
        if typ == "LineString":
            return (typ, self._linestring(e))
        if typ == "Polygon":
            return (typ, self._polygon(e))
        n = self._u32(e)
        # ISO WKB: Multi* members are exactly the corresponding leaf
        # type. Enforcing it keeps the contract (malformed -> ValueError,
        # row dropped) AND bounds recursion: a crafted
        # MultiPolygon-of-MultiPolygon chain would otherwise recurse to
        # RecursionError, which escapes the callers' ValueError guards
        # and fails the task.
        want = {"MultiPoint": "Point", "MultiLineString": "LineString",
                "MultiPolygon": "Polygon"}[typ]
        members = []
        for _ in range(n):
            # peek the member's type BEFORE descending: read() recurses
            # on Multi* headers, so a crafted Multi*-of-Multi* chain
            # must be rejected here, not after the recursive call
            buf, pos = self.buf, self.pos
            if pos + 5 > len(buf):
                raise ValueError("wkb: truncated member header")
            e2 = ">" if buf[pos] == 0 else "<"
            (code2,) = struct.unpack_from(e2 + "I", buf, pos + 1)
            if (code2 & ~0x20000000) % 1000 != _CODES[want]:
                raise ValueError(
                    f"wkb: {typ} member type {code2} != {want}")
            t2, d2 = self.read()
            members.append(d2)
        return (typ, members)

    def _u32(self, e):
        if self.pos + 4 > len(self.buf):
            # struct.error is NOT a ValueError; an unguarded unpack_from
            # on a truncated count would escape the silent-drop contract
            raise ValueError("wkb: truncated count")
        (n,) = struct.unpack_from(e + "I", self.buf, self.pos)
        self.pos += 4
        return n

    def _coords(self, e, n):
        need = 16 * n
        if self.pos + need > len(self.buf):
            raise ValueError("wkb: truncated coords")
        vals = struct.unpack_from(e + f"{2 * n}d", self.buf, self.pos)
        self.pos += need
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(n)]

    def _linestring(self, e):
        return self._coords(e, self._u32(e))

    def _polygon(self, e):
        return [self._linestring(e) for _ in range(self._u32(e))]


def wkb_to_geom(buf: bytes):
    """bytes -> geometry tuple. Raises ValueError on malformed input."""
    r = _Reader(bytes(buf))
    g = r.read()
    return g


def _w_coords(out, pts):
    out.append(struct.pack("<I", len(pts)))
    for x, y in pts:
        out.append(struct.pack("<dd", float(x), float(y)))


def geom_to_wkb(geom) -> bytes:
    typ, data = geom
    out = [b"\x01", struct.pack("<I", _CODES[typ])]
    if typ == "Point":
        out.append(struct.pack("<dd", float(data[0]), float(data[1])))
    elif typ == "LineString":
        _w_coords(out, data)
    elif typ == "Polygon":
        out.append(struct.pack("<I", len(data)))
        for ring in data:
            _w_coords(out, ring)
    elif typ == "MultiPoint":
        out.append(struct.pack("<I", len(data)))
        for p in data:
            out.append(geom_to_wkb(("Point", p)))
    elif typ == "MultiLineString":
        out.append(struct.pack("<I", len(data)))
        for ls in data:
            out.append(geom_to_wkb(("LineString", ls)))
    elif typ == "MultiPolygon":
        out.append(struct.pack("<I", len(data)))
        for rings in data:
            out.append(geom_to_wkb(("Polygon", rings)))
    else:
        raise ValueError(f"unsupported geometry type {typ}")
    return b"".join(out)
