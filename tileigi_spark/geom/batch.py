"""Ragged segment-batched twin of the scalar geometry stage.

The scalar branch of engine.geometry_stage runs every non-point,
non-axis-rect feature through per-row Python kernels (remap -> dedup/
despike -> exact-int RDP -> buffered clip -> quadtree slice -> make_valid
-> winding -> shift; lib.rs:559-728). This module vectorizes that chain
across a whole Arrow batch with numpy on flat ("ragged") coordinate
arrays + ring offsets, dropping to the authoritative scalar kernels ONLY
for the features a stage would actually change:

* remap + consecutive-duplicate collapse + ring/line rules — fully
  vectorized, exact (dedup by immediate-predecessor mask is provably
  identical to the sequential collapse in remap._remap_linestring: in a
  run of equal values both keep exactly the first).
* despike (G4) — vectorized DETECTOR: a ring where no consecutive
  triple has zero area and no ring-endpoint case fires is returned
  unchanged by simplify.remove_spikes_linestring (no removal in pass 1
  => the last_kept chain never diverges from the plain triple scan =>
  the loop breaks), so screen-clean features skip it; flagged features
  fall back to the scalar chain from remove_unneeded_points.
* exact-int RDP (G6, simplify.rs:38-155) — per-ring, but the O(n)
  max-distance scan is one numpy expression (int64-safe because the
  lane guards |coord| < 2^26; larger coords route the whole feature to
  the scalar lane's Python bigints). The tie-break (LAST max index, the
  tuple-compare in simplify._rdp) and the overflow-guard ladder are
  preserved; this_e//max_num and max_num**2 run on Python ints.
* clip to the buffered bbox (G7-G10) — vectorized early-exits on the
  per-feature bbox: all-inside => identity, all-outside-one-border =>
  dropped (both exact); a bbox that straddles a border falls back to
  the scalar border walk ("most features pass clip untouched",
  clip/mod.rs:186-210).
* quadtree slice (G11/J3) — per-feature tile-window fan from the bbox
  ([t*4096-buf, (t+1)*4096+buf] per tile t, the closed-interval
  collapse the points fast path already uses): fan 1x1 => the recursive
  slice provably emits exactly one uncut piece (at every bisection the
  geometry is wholly inside one branch's keep half-space and wholly
  outside the other's), so the piece IS the geometry; fan > 1 falls
  back to the recursive _slice_box.
* make_valid / is_valid / orientation (G13-G16) — vectorized
  CERTIFICATE: the post-RDP despike/dup screen again (make_valid
  re-runs remove_unneeded_points), an exact all-pairs segment test per
  ring (the sd/td classification of validity.intersection without the
  crossing-point math; parallel bbox-overlapping collinear pairs are
  conservatively flagged), and the wrapped-i32 shoelace winding check
  (strict CW exterior / CCW interior). Certificate-clean polygons are
  provably returned unchanged by make_valid (its is_valid early
  return) and by ensure_polygon_orientation; anything else falls back
  to the scalar make_valid machinery on that single piece.

Type-collapse bookkeeping matches the scalar chain's observable rules:
Multi* that drop to one member at remap/despike collapse to the single
variant; RDP does NOT collapse; clip collapses MultiLineString-of-1 but
not MultiPolygon-of-1. Hence a line feature's final type depends only on
its final member count (lines never die at RDP), while a polygon feature
is MultiPolygon iff it still had >= 2 polygons after despike.

tests/test_geom_batch.py pins the batch lane against the scalar lane on
randomized geometry (parity is the correctness contract).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..mercator import MERC_MAX
from .ringbulk import _cumsum0
from .wkb import wkb_to_geom, geom_to_wkb
from .remap import remap_geometry, shift_geom as _shift
from .simplify import remove_unneeded_points, simplify, \
    remove_duplicate_points
from .clip import clip_to_bbox, clip_geometry_to_tiles, \
    _clip_ring_to_border, _clip_linestring_to_border, \
    XMIN, XMAX, YMIN, YMAX
from .validity import make_valid, is_valid, ensure_polygon_orientation

WORLD = 2.0 * MERC_MAX

# beyond this magnitude the int64 products in the despike/validity
# screens could overflow; such features (world-spanning geometry deep in
# the pyramid) take the scalar lane's exact Python bigints
_COORD_LIMIT = 1 << 26

_LINE, _POLY = 1, 2  # role codes per feature type
_ROLE = {2: _LINE, 3: _POLY, 5: _LINE, 6: _POLY}


# --------------------------------------------------------------- parsing

def _parse_rows(ways):
    """Parse little-endian 2-D WKB rows into ragged arrays.

    Returns (state dict or None, scalar_rows) where scalar_rows lists
    row indices that must take the full scalar loop (big-endian, EWKB
    flags, Point/MultiPoint, malformed, zero-point members)."""
    ring_feat, ring_int, ring_n, ring_src = [], [], [], []
    role = {}
    scalar_rows = []
    bufparts = []
    base = 0

    for i, w in enumerate(ways):
        try:
            b = bytes(w)
        except TypeError:
            scalar_rows.append(i)
            continue
        n = len(b)
        if n < 9 or b[0] != 1 or b[2] != 0 or b[3] != 0 or b[4] != 0:
            scalar_rows.append(i)
            continue
        t = b[1]
        ok = True
        rings_here = []
        if t == 2:
            (cnt,) = struct.unpack_from("<I", b, 5)
            ok = 9 + 16 * cnt == n and cnt > 0
            if ok:
                rings_here.append((False, cnt, 9))
        elif t == 3:
            (nr,) = struct.unpack_from("<I", b, 5)
            pos = 9
            ok = nr > 0
            for r in range(nr if ok else 0):
                if pos + 4 > n:
                    ok = False
                    break
                (cnt,) = struct.unpack_from("<I", b, pos)
                pos += 4
                if cnt == 0 or pos + 16 * cnt > n:
                    ok = False
                    break
                rings_here.append((r > 0, cnt, pos))
                pos += 16 * cnt
            ok = ok and pos == n
        elif t in (5, 6):
            (nm,) = struct.unpack_from("<I", b, 5)
            pos = 9
            ok = nm > 0
            for _m in range(nm if ok else 0):
                if pos + 9 > n or b[pos] != 1 \
                        or b[pos + 1] != (2 if t == 5 else 3) \
                        or b[pos + 2] or b[pos + 3] or b[pos + 4]:
                    ok = False
                    break
                if t == 5:
                    (cnt,) = struct.unpack_from("<I", b, pos + 5)
                    pos += 9
                    if cnt == 0 or pos + 16 * cnt > n:
                        ok = False
                        break
                    rings_here.append((False, cnt, pos))
                    pos += 16 * cnt
                else:
                    (nr,) = struct.unpack_from("<I", b, pos + 5)
                    pos += 9
                    if nr == 0:
                        ok = False
                        break
                    for r in range(nr):
                        if pos + 4 > n:
                            ok = False
                            break
                        (cnt,) = struct.unpack_from("<I", b, pos)
                        pos += 4
                        if cnt == 0 or pos + 16 * cnt > n:
                            ok = False
                            break
                        rings_here.append((r > 0, cnt, pos))
                        pos += 16 * cnt
                    if not ok:
                        break
            ok = ok and pos == n
        else:
            ok = False

        if not ok:
            scalar_rows.append(i)
            continue
        role[i] = _ROLE[t]
        for is_int, cnt, cpos in rings_here:
            ring_feat.append(i)
            ring_int.append(is_int)
            ring_n.append(cnt)
            ring_src.append(base + cpos)
        bufparts.append(b)
        base += n

    if not ring_feat:
        return None, scalar_rows

    big = np.frombuffer(b"".join(bufparts), dtype=np.uint8)
    ring_n = np.asarray(ring_n, dtype=np.int64)
    ring_src = np.asarray(ring_src, dtype=np.int64)
    npts = int(ring_n.sum())
    off = _cumsum0(ring_n)
    within = np.arange(npts, dtype=np.int64) - np.repeat(off[:-1], ring_n)
    pt_byte = np.repeat(ring_src, ring_n) + within * 16
    raw = big[pt_byte[:, None] + np.arange(16)]
    xy = raw.view("<f8").reshape(-1, 2)

    st = {
        "px": np.ascontiguousarray(xy[:, 0]),
        "py": np.ascontiguousarray(xy[:, 1]),
        "off": off,
        "ring_feat": np.asarray(ring_feat, dtype=np.int64),
        "ring_int": np.asarray(ring_int, dtype=bool),
        "role": role,
    }
    return st, scalar_rows


# ------------------------------------------------------------ ring utils

def _sizes(off):
    return off[1:] - off[:-1]


def _drop(st, ring_alive, pt_keep=None):
    """Drop dead rings (and optionally individual points), rebuilding
    offsets. Returns a new state dict (feature-level entries shared)."""
    off = st["off"]
    sizes = _sizes(off)
    keep_pts = np.repeat(ring_alive, sizes)
    if pt_keep is not None:
        keep_pts = keep_pts & pt_keep
    if len(sizes):
        new_sizes_all = np.add.reduceat(keep_pts.astype(np.int64),
                                        np.minimum(off[:-1],
                                                   max(len(keep_pts) - 1,
                                                       0)))
        new_sizes_all[sizes == 0] = 0
    else:
        new_sizes_all = np.zeros(0, np.int64)
    new_sizes = new_sizes_all[ring_alive]
    new_off = _cumsum0(new_sizes)
    out = dict(st)
    out["u"] = st["u"][keep_pts]
    out["v"] = st["v"][keep_pts]
    out["off"] = new_off
    out["ring_feat"] = st["ring_feat"][ring_alive]
    out["ring_int"] = st["ring_int"][ring_alive]
    return out


def _ring_tuples(u, v, s, e):
    return list(zip(u[s:e].tolist(), v[s:e].tolist()))


def _feat_ring_range(ring_feat, f):
    """[r0, r1) ring span of feature f (ring_feat is sorted — features'
    rings stay adjacent through every compaction). O(log R), replacing
    an O(R) scan that went quadratic on fallback-heavy batches."""
    r0 = int(np.searchsorted(ring_feat, f, side="left"))
    r1 = int(np.searchsorted(ring_feat, f, side="right"))
    return range(r0, r1)


def _materialize(st, f, multi):
    """Rebuild feature f's geometry tuple from ragged state with the
    type the scalar chain would carry at this stage."""
    sel = _feat_ring_range(st["ring_feat"], f)
    u, v, off = st["u"], st["v"], st["off"]
    if st["role"][f] == _LINE:
        lines = [_ring_tuples(u, v, int(off[r]), int(off[r + 1]))
                 for r in sel]
        if len(lines) == 1 and not multi:
            return ("LineString", lines[0])
        return ("MultiLineString", lines)
    polys = []
    for r in sel:
        ring = _ring_tuples(u, v, int(off[r]), int(off[r + 1]))
        if not st["ring_int"][r]:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if len(polys) == 1 and not multi:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


# ----------------------------------------------------------- scalar lane

def _scalar_chain(geom, stage, size_mt, x0t, y0t, extent_i, buffer_units,
                  do_simplify, epsilon, txy=None):
    """Run the remainder of the scalar pipeline from `stage` on a
    remapped geometry. Returns [(tx, ty, shifted_piece_geom)] with tx/ty
    absolute tile coords."""
    if stage == "unneeded":
        geom = remove_unneeded_points(geom)
        if geom is None:
            return []
        stage = "simplify"
    if stage == "simplify":
        if do_simplify:
            geom = simplify(geom, epsilon)
            if geom is None:
                return []
        stage = "clip"
    if stage == "clip":
        geom = clip_to_bbox(geom, -buffer_units, -buffer_units,
                            extent_i + buffer_units,
                            extent_i + buffer_units)
        if geom is None:
            return []
        stage = "slice"
    if stage == "slice":
        pieces = clip_geometry_to_tiles(geom, size_mt, x0t, y0t,
                                        buffer_units)
    else:  # "valid": geom is one already-sliced piece at absolute txy
        pieces = [(txy, geom)]
    out = []
    for (tx, ty), piece in pieces:
        piece = make_valid(piece)
        if piece is None:
            continue
        if not is_valid(piece):  # lib.rs:697-703
            continue
        piece = ensure_polygon_orientation(piece)
        out.append((tx, ty, _shift(piece, (tx - x0t) * 4096,
                                   (ty - y0t) * 4096)))
    return out


# -------------------------------------------------------- despike screen

def _despike_flags(u, v, off):
    """Per-ring: True iff simplify.remove_spikes_linestring would make
    ANY change (exact detector for the no-op case, see module
    docstring). Also covers make_valid's internal re-run."""
    nring = len(off) - 1
    flags = np.zeros(nring, dtype=bool)
    n = len(u)
    if n >= 3:
        x1, y1 = u[:-2], v[:-2]
        x2, y2 = u[1:-1], v[1:-1]
        x3, y3 = u[2:], v[2:]
        zero = (x1 - x3) * (y2 - y1) == (x1 - x2) * (y3 - y1)
        cs = np.concatenate(([0], np.cumsum(zero.astype(np.int64))))
        # windows fully inside ring r are indices [off[r], off[r+1]-2)
        lo = np.minimum(off[:-1], n - 2)
        hi = np.minimum(np.maximum(off[1:] - 2, off[:-1]), n - 2)
        hi = np.maximum(hi, lo)
        flags |= (cs[hi] - cs[lo]) > 0
    sizes = _sizes(off)
    big = sizes >= 4
    if big.any():
        s = off[:-1][big]
        e = off[1:][big] - 1
        closed_b = (u[s] == u[e]) & (v[s] == v[e])
        cb = np.flatnonzero(big)[closed_b]
        if len(cb):
            s = off[:-1][cb]
            e = off[1:][cb] - 1
            # pts[1] == pts[l-2]: point 0 is the spike tip
            tip = (u[s + 1] == u[e - 1]) & (v[s + 1] == v[e - 1])
            # endpoint triple (pts[l-2], pts[0], pts[1]) zero area
            x1, y1 = u[e - 1], v[e - 1]
            x2, y2 = u[s], v[s]
            x3, y3 = u[s + 1], v[s + 1]
            endz = (x1 - x3) * (y2 - y1) == (x1 - x2) * (y3 - y1)
            flags[cb] |= tip | endz
    return flags


# ------------------------------------------------------------------- RDP

def _rdp_keep(xs, ys, e):
    """Exact twin of simplify._rdp on int64 arrays: returns keep mask.
    Caller guarantees |coord| < 2^26 and despiked input (no span is
    fully collinear, so max_num > 0)."""
    n = len(xs)
    keep = np.ones(n, dtype=bool)
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        s, t = stack.pop()
        if t - s <= 1:
            continue
        x1 = int(xs[s]); y1 = int(ys[s])
        x2 = int(xs[t]); y2 = int(ys[t])
        seg_x = xs[s + 1:t]
        seg_y = ys[s + 1:t]
        if x1 == x2 and y1 == y2:
            num = (seg_x - x1) ** 2 + (seg_y - y2) ** 2
            rel = len(num) - 1 - int(np.argmax(num[::-1]))
            max_num = int(num[rel])
            wipe = max_num < e
        else:
            dx = x2 - x1
            dy = y2 - y1
            exsy = x2 * y1
            eysx = y2 * x1
            num = np.abs((dy * seg_x + exsy) - (dx * seg_y + eysx))
            rel = len(num) - 1 - int(np.argmax(num[::-1]))
            max_num = int(num[rel])
            this_e = e * (dx * dx + dy * dy)
            # truncating division matches Rust i64 `/` (operands >= 0)
            wipe = (max_num < this_e
                    and max_num < (this_e // max_num + 1)
                    and max_num * max_num < this_e)
        index = rel + s + 1
        if wipe:
            keep[s + 1:t] = False
        else:
            stack.append((s, index))
            stack.append((index, t))
    return keep


def _rdp_keep_py(xs, ys, e):
    """Pure-Python twin of _rdp_keep for SMALL rings, where per-call
    numpy overhead exceeds the scan cost. xs/ys are Python int lists;
    arithmetic is exact (bigints). Returns a keep list."""
    n = len(xs)
    keep = [True] * n
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        s, t = stack.pop()
        if t - s <= 1:
            continue
        x1, y1 = xs[s], ys[s]
        x2, y2 = xs[t], ys[t]
        best_num = -1
        best_i = s
        if x1 == x2 and y1 == y2:
            for i in range(s + 1, t):
                num = (xs[i] - x1) ** 2 + (ys[i] - y2) ** 2
                if num >= best_num:
                    best_num = num
                    best_i = i
            wipe = best_num < e
        else:
            dx = x2 - x1
            dy = y2 - y1
            exsy = x2 * y1
            eysx = y2 * x1
            for i in range(s + 1, t):
                num = (dy * xs[i] + exsy) - (dx * ys[i] + eysx)
                if num < 0:
                    num = -num
                if num >= best_num:
                    best_num = num
                    best_i = i
            this_e = e * (dx * dx + dy * dy)
            wipe = (best_num < this_e
                    and best_num < (this_e // best_num + 1)
                    and best_num * best_num < this_e)
        if wipe:
            for i in range(s + 1, t):
                keep[i] = False
        else:
            stack.append((s, best_i))
            stack.append((best_i, t))
    return keep


# ------------------------------------------------------- validity screen

_PAIR_CACHE: dict = {}
_PAIR_CACHE_ELEMS = 0

# all-pairs materialization cap: a ring with more segments than this
# takes the O(m) -memory row-blocked walk instead (the all-pairs arrays
# are O(m^2) and a single 20k-vertex coastline ring would otherwise
# allocate ~2e8-element temporaries and OOM the Python worker)
_VEC_SEG_CAP = 1024
# concatenated-pair evaluation budget across a chunk's rings: bounds
# the I/J/R arrays and the eight coordinate gathers regardless of how
# many sub-cap rings a chunk holds (512 rings x ~1000 segments would
# otherwise sum to ~2.5e8 pairs in one evaluation)
_PAIR_BUDGET = 2_000_000
# total elements the triu-index cache may retain per worker (~64 MB of
# int64 at this bound); entries past the budget are built uncached
_PAIR_CACHE_BUDGET = 4_000_000


def _pair_idx(m):
    """Upper-triangle (i < j) index pairs for m segments, cached up to
    a total element budget (m <= _VEC_SEG_CAP, so one entry is at most
    ~0.5M pairs)."""
    global _PAIR_CACHE_ELEMS
    got = _PAIR_CACHE.get(m)
    if got is None:
        pi, pj = np.triu_indices(m, k=1)
        got = (pi.astype(np.int64), pj.astype(np.int64))
        if _PAIR_CACHE_ELEMS + len(pi) <= _PAIR_CACHE_BUDGET:
            _PAIR_CACHE[m] = got
            _PAIR_CACHE_ELEMS += len(pi)
    return got


def _seg_pairs_bad(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Per-pair 'the scalar classifier might see an intersection' mask
    via the exact sd/td classification of validity.intersection (no
    crossing point needed): genuine TOUCHING/CROSSING, and any parallel
    bbox-overlapping collinear pair (possible OVERLAPPING); NONE and
    END_TO_END pairs stay False."""
    overlap = ~((np.maximum(ax1, ax2) < np.minimum(bx1, bx2))
                | (np.minimum(ax1, ax2) > np.maximum(bx1, bx2))
                | (np.maximum(ay1, ay2) < np.minimum(by1, by2))
                | (np.minimum(ay1, ay2) > np.maximum(by1, by2)))

    a = ax2 - ax1
    b = bx1 - bx2
    c = ay2 - ay1
    d = by1 - by2
    det = a * d - b * c
    bad = np.zeros(np.shape(det), dtype=bool)
    par = (det == 0) & overlap
    if par.any():
        col = ((bx2 - bx1) * (ay1 - by1) == (by2 - by1) * (ax1 - bx1))
        bad |= par & col

    nz = (det != 0) & overlap
    if nz.any():
        e_ = bx1 - ax1
        f_ = by1 - ay1
        sgn = np.where(det > 0, 1, -1)
        adet = np.abs(det)
        sd = sgn * (a * f_ - c * e_)
        td = sgn * (d * e_ - b * f_)
        outside = (sd < 0) | (sd > adet) | (td < 0) | (td > adet)
        end2end = ((td == 0) | (td == adet)) & ((sd == 0) | (sd == adet))
        bad |= nz & ~outside & ~end2end
    return bad


def _ring_self_intersects_blocked(u, v, base, m):
    """One huge ring (m > _VEC_SEG_CAP segments): row-blocked pair walk
    — O(m) temporaries per row instead of the O(m^2) all-pairs arrays,
    same classification as _seg_pairs_bad."""
    for i in range(m - 1):
        s = base + i + 1
        if _seg_pairs_bad(u[base + i], v[base + i],
                          u[base + i + 1], v[base + i + 1],
                          u[s:base + m], v[s:base + m],
                          u[s + 1:base + m + 1],
                          v[s + 1:base + m + 1]).any():
            return True
    return False


def _self_intersection_flags(u, v, off, check):
    """Per-ring conservative 'scalar might see an intersection' flags.
    A ring where every segment pair classifies NONE or END_TO_END
    provably passes has_self_intersections; genuine TOUCHING/CROSSING
    and possible-OVERLAPPING pairs flag the ring. `check` selects
    rings. Rings above _VEC_SEG_CAP segments take the blocked walk."""
    nring = len(off) - 1
    flags = np.zeros(nring, dtype=bool)
    rings = np.flatnonzero(check)
    if not len(rings):
        return flags
    sizes = _sizes(off)
    ii, jj, rr = [], [], []
    acc = 0

    def flush():
        nonlocal acc
        if not ii:
            return
        I = np.concatenate(ii)
        J = np.concatenate(jj)
        R = np.concatenate(rr)
        ii.clear()
        jj.clear()
        rr.clear()
        acc = 0
        bad = _seg_pairs_bad(u[I], v[I], u[I + 1], v[I + 1],
                             u[J], v[J], u[J + 1], v[J + 1])
        if bad.any():
            flags[np.bincount(R[bad], minlength=nring) > 0] = True

    for r in rings:
        m = int(sizes[r]) - 1
        if m < 2:
            continue
        base = int(off[r])
        if m > _VEC_SEG_CAP:
            flags[r] = _ring_self_intersects_blocked(u, v, base, m)
            continue
        pi, pj = _pair_idx(m)
        ii.append(pi + base)
        jj.append(pj + base)
        rr.append(np.full(len(pi), r, dtype=np.int64))
        acc += len(pi)
        if acc >= _PAIR_BUDGET:  # bound the concatenated evaluation
            flush()
    flush()
    return flags


def _wrapped_area_sign(u, v, off):
    """(sign, safe): sign of the wrap_i32'd twice-area per ring
    (validity.rs:1158-1164); safe=False where the int64 shoelace could
    overflow (caller falls back for those rings)."""
    n = len(u)
    nring = len(off) - 1
    if n < 2:
        return np.zeros(nring, np.int64), np.ones(nring, bool)
    terms = u[:-1] * v[1:] - u[1:] * v[:-1]
    cs = np.concatenate(([0], np.cumsum(terms)))
    lo = off[:-1]
    hi = np.maximum(off[1:] - 1, lo)
    tot = cs[hi] - cs[lo]
    wrapped = ((tot + (1 << 31)) & ((1 << 32) - 1)) - (1 << 31)
    sizes = _sizes(off)
    maxc = np.maximum(np.abs(u), np.abs(v))
    mring = np.maximum.reduceat(maxc, np.minimum(off[:-1], n - 1)) \
        if nring else np.zeros(0, np.int64)
    safe = (sizes * (2 * mring * mring + 1)) < (1 << 62)
    return np.sign(wrapped), safe


# ---------------------------------------------------------------- encode

_PACKI = {n: struct.pack("<I", n) for n in range(64)}


def _packi(n):
    got = _PACKI.get(n)
    return got if got is not None else struct.pack("<I", n)


_H_LS = b"\x01\x02\x00\x00\x00"
_H_P = b"\x01\x03\x00\x00\x00"
_H_MLS = b"\x01\x05\x00\x00\x00"
_H_MP = b"\x01\x06\x00\x00\x00"


def _encode_feature_wkb(is_line, multi, ring_slices, ring_int):
    """Assemble the output WKB from per-ring coord byte slices (16 B per
    point, already float64 LE — identical bytes to geom_to_wkb)."""
    if is_line:
        if not multi and len(ring_slices) == 1:
            s = ring_slices[0]
            return _H_LS + _packi(len(s) // 16) + s
        parts = [_H_MLS, _packi(len(ring_slices))]
        for s in ring_slices:
            parts.append(_H_LS + _packi(len(s) // 16) + s)
        return b"".join(parts)
    polys = []
    for s, it in zip(ring_slices, ring_int):
        if not it:
            polys.append([s])
        else:
            polys[-1].append(s)
    if not multi and len(polys) == 1:
        parts = [_H_P, _packi(len(polys[0]))]
        for s in polys[0]:
            parts.append(_packi(len(s) // 16) + s)
        return b"".join(parts)
    parts = [_H_MP, _packi(len(polys))]
    for rings in polys:
        parts.append(_H_P + _packi(len(rings)))
        for s in rings:
            parts.append(_packi(len(s) // 16) + s)
    return b"".join(parts)


# -------------------------------------------------- bbox-shortcut slice
#
# The scalar quadtree (_slice_box) re-walks every coordinate of the
# geometry at every recursion node even when a cut leaves it untouched.
# These helpers carry a bbox per ring so all-inside / all-outside
# half-space decisions are O(1); the exact scalar ring/linestring clip
# runs ONLY when a border actually straddles a ring's bbox (a half-space
# is convex, so the bbox tests are exact, not heuristic). Member
# collapse typing is reproduced: lines re-collapse by count at every
# materialization (clip collapses MultiLineString-of-1 at each border),
# polygons carry the incoming Multi-ness (clip never collapses
# MultiPolygon-of-1).

def _bbox_of(pts):
    xs, ys = zip(*pts)  # C-level transpose; 2x the two list comps
    return (min(xs), min(ys), max(xs), max(ys))


def _bbox_vs_border(bbox, border):
    """-1 fully outside, 1 fully inside, 0 straddles (exact)."""
    kind, val = border
    mnx, mny, mxx, mxy = bbox
    if kind == XMAX:
        return 1 if mxx <= val else (-1 if mnx > val else 0)
    if kind == XMIN:
        return 1 if mnx >= val else (-1 if mxx < val else 0)
    if kind == YMAX:
        return 1 if mxy <= val else (-1 if mny > val else 0)
    return 1 if mny >= val else (-1 if mxy < val else 0)


def _clip_boxed(is_line, members, border):
    """members: lines -> [(pts, bbox)]; polys -> [[(ring, bbox), ...]].
    Returns the clipped members list ([] == geometry gone)."""
    out = []
    if is_line:
        for pts, bb in members:
            s = _bbox_vs_border(bb, border)
            if s == 1:
                out.append((pts, bb))
            elif s == 0:
                r = _clip_linestring_to_border(pts, border)
                if r is None:
                    continue
                if r[0] == "LineString":
                    out.append((r[1], _bbox_of(r[1])))
                else:
                    for l in r[1]:
                        out.append((l, _bbox_of(l)))
        return out
    for rings in members:
        ext, ebb = rings[0]
        s = _bbox_vs_border(ebb, border)
        if s == -1:
            continue
        if s == 0:
            ext = _clip_ring_to_border(ext, border)
            if ext is None:
                continue
            ebb = _bbox_of(ext)
        newp = [(ext, ebb)]
        for ring, rbb in rings[1:]:
            si = _bbox_vs_border(rbb, border)
            if si == 1:
                newp.append((ring, rbb))
            elif si == 0:
                r = _clip_ring_to_border(ring, border)
                if r is not None:
                    newp.append((r, _bbox_of(r)))
        out.append(newp)
    return out


def _slice_boxed(is_line, members, metatile_scale, tile_x0, tile_y0,
                 x0, y0, size, buffer):
    """Exact twin of clip._slice_box over boxed members."""
    if metatile_scale == 1:
        return [((tile_x0, tile_y0), members)]
    results = []
    half = size // 2
    tile_half = metatile_scale // 2

    left = _clip_boxed(is_line, members, (XMAX, x0 + half + buffer))
    if left:
        topleft = _clip_boxed(is_line, left, (YMAX, y0 + half + buffer))
        if topleft:
            results.extend(_slice_boxed(is_line, topleft, tile_half,
                                        tile_x0, tile_y0, x0, y0, half,
                                        buffer))
        botleft = _clip_boxed(is_line, left, (YMIN, y0 + half - buffer))
        if botleft:
            results.extend(_slice_boxed(is_line, botleft, tile_half,
                                        tile_x0, tile_y0 + tile_half,
                                        x0, y0 + half, half, buffer))
    right = _clip_boxed(is_line, members, (XMIN, x0 + half - buffer))
    if right:
        topright = _clip_boxed(is_line, right,
                               (YMAX, y0 + half + buffer))
        if topright:
            results.extend(_slice_boxed(is_line, topright, tile_half,
                                        tile_x0 + tile_half, tile_y0,
                                        x0 + half, y0, half, buffer))
        botright = _clip_boxed(is_line, right,
                               (YMIN, y0 + half - buffer))
        if botright:
            results.extend(_slice_boxed(is_line, botright, tile_half,
                                        tile_x0 + tile_half,
                                        tile_y0 + tile_half,
                                        x0 + half, y0 + half, half,
                                        buffer))
    return results


def _boxed_to_geom(is_line, is_mp, members):
    """Boxed members -> plain geometry tuple with the type the scalar
    recursion would carry (lines collapse by count; polys keep is_mp)."""
    if is_line:
        if len(members) == 1:
            return ("LineString", members[0][0])
        return ("MultiLineString", [m[0] for m in members])
    polys = [[ring for ring, _bb in rings] for rings in members]
    if len(polys) == 1 and not is_mp:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _materialize_boxed(st, f, ring_bbs):
    """Feature f from ragged state as boxed members + is_line flag."""
    sel = _feat_ring_range(st["ring_feat"], f)
    u, v, off = st["u"], st["v"], st["off"]
    is_line = st["role"][f] == _LINE
    if is_line:
        return is_line, [( _ring_tuples(u, v, int(off[r]),
                                        int(off[r + 1])), ring_bbs[r])
                         for r in sel]
    members = []
    for r in sel:
        entry = (_ring_tuples(u, v, int(off[r]), int(off[r + 1])),
                 ring_bbs[r])
        if not st["ring_int"][r]:
            members.append([entry])
        else:
            members[-1].append(entry)
    return is_line, members


# ------------------------------------------------------------- main lane

_CHUNK_FEATURES = 4096


def process_general(pdf, prop_names, buffer_units, metatile_scale,
                    global_maxzoom, epsilon):
    """Batch twin of the scalar branch of engine.geometry_stage.

    pdf: pandas frame with zoom/mtx/mty/feature_id/way + props (already
    excludes simple points and axis rects). Returns a pieces DataFrame
    (zoom, x, y, feature_id, geom, props...) or None. Output row order
    is arbitrary (the encode shuffle sorts by feature_id).

    Large Arrow batches are processed in ~4k-feature chunks: the
    ragged lane's temporaries scale with the chunk's total vertex
    count, and keeping them cache-resident measures 1.5x faster than
    one pass over a 40k-feature concave batch (identical output; the
    per-(feature,tile) piece is unique, so chunk order is immaterial
    under the encode exchange's canonical sort)."""
    import pandas as pd

    if len(pdf) > _CHUNK_FEATURES:
        parts = []
        for s in range(0, len(pdf), _CHUNK_FEATURES):
            out = process_general(pdf.iloc[s:s + _CHUNK_FEATURES],
                                  prop_names, buffer_units,
                                  metatile_scale, global_maxzoom,
                                  epsilon)
            if out is not None:
                parts.append(out)
        if not parts:
            return None
        return pd.concat(parts, ignore_index=True)

    cols = ["zoom", "x", "y", "feature_id", "geom"] + prop_names
    rows = {k: [] for k in cols}

    a_zoom = pdf["zoom"].to_numpy(np.int64)
    a_mtx = pdf["mtx"].to_numpy(np.int64)
    a_mty = pdf["mty"].to_numpy(np.int64)
    a_fid = pdf["feature_id"].to_numpy(np.int64)
    a_way = pdf["way"].values
    a_props = [(p, pdf[p].values) for p in prop_names]

    size_mt = np.minimum(metatile_scale, 1 << a_zoom)
    x0t = a_mtx * size_mt
    y0t = a_mty * size_mt
    nz = (1 << a_zoom).astype(np.float64)
    minx = x0t / nz * WORLD - MERC_MAX
    maxx = (x0t + size_mt) / nz * WORLD - MERC_MAX
    maxy = MERC_MAX - y0t / nz * WORLD
    miny = MERC_MAX - (y0t + size_mt) / nz * WORLD
    extent_f = 4096.0 * size_mt
    extent_i = (4096 * size_mt).astype(np.int64)
    do_simp = a_zoom < global_maxzoom

    def emit(i, pieces):
        for tx, ty, piece in pieces:
            rows["zoom"].append(int(a_zoom[i]))
            rows["x"].append(int(tx))
            rows["y"].append(int(ty))
            rows["feature_id"].append(int(a_fid[i]))
            rows["geom"].append(piece if isinstance(piece, bytes)
                                else geom_to_wkb(piece))
            for p, vals in a_props:
                rows[p].append(vals[i])

    def emit_many(fidx, txs, tys, wkbs):
        """Columnar emit for the clean-piece stream: fidx/txs/tys are
        int64 arrays, wkbs a list of bytes (one per piece)."""
        rows["zoom"].extend(a_zoom[fidx].tolist())
        rows["x"].extend(txs.tolist())
        rows["y"].extend(tys.tolist())
        rows["feature_id"].extend(a_fid[fidx].tolist())
        rows["geom"].extend(wkbs)
        for p, vals in a_props:
            rows[p].extend(vals[fidx].tolist()
                           if hasattr(vals[fidx], "tolist")
                           else list(vals[fidx]))

    def emit_scalar_row(i):
        """Full scalar pipeline for row i (the historic loop body)."""
        try:
            geom = wkb_to_geom(bytes(a_way[i]))
        except (ValueError, TypeError):
            # None/undecodable never reaches here from the engine
            # (with_bbox drops those rows); dropped for robustness
            return
        geom = remap_geometry(geom, float(minx[i]), float(maxx[i]),
                              float(miny[i]), float(maxy[i]),
                              float(extent_f[i]))
        if geom is None:
            return
        emit(i, _scalar_chain(
            geom, "unneeded", int(size_mt[i]), int(x0t[i]), int(y0t[i]),
            int(extent_i[i]), buffer_units, bool(do_simp[i]), epsilon))

    if os.environ.get("SPARK_GRAFT_FORCE_SCALAR_GEOM") == "1":
        # measurement/debug switch: route every feature through the
        # historic per-row chain (used to report the scalar/batched
        # ratio in BENCH/BASELINE.md)
        for i in range(len(a_way)):
            emit_scalar_row(i)
        if not rows["zoom"]:
            return None
        return pd.DataFrame(rows, columns=cols)

    st, scalar_rows = _parse_rows(a_way)
    for i in scalar_rows:
        emit_scalar_row(i)

    if st is not None:
        _vector_lane(st, len(a_zoom), size_mt, x0t, y0t, minx, maxx,
                     miny, maxy, extent_f, extent_i, do_simp,
                     buffer_units, epsilon, emit, emit_scalar_row,
                     emit_many)

    if not rows["zoom"]:
        return None
    return pd.DataFrame(rows, columns=cols)


def _vector_lane(st, F, size_mt, x0t, y0t, minx, maxx, miny, maxy,
                 extent_f, extent_i, do_simp, buffer_units, epsilon,
                 emit, emit_scalar_row, emit_many):
    role_arr = np.zeros(F, dtype=np.int8)
    for f, r in st["role"].items():
        role_arr[f] = r

    off = st["off"]
    ring_feat = st["ring_feat"]
    sizes = _sizes(off)

    # ---- remap (vectorized, exact twin of remap_geometry coords) ----
    fpt = np.repeat(ring_feat, sizes)
    denx = maxx - minx
    deny = maxy - miny
    vx = ((st["px"] - minx[fpt]) / denx[fpt]) * extent_f[fpt]
    vy = ((maxy[fpt] - st["py"]) / deny[fpt]) * extent_f[fpt]

    finite = (np.isfinite(vx) & np.isfinite(vy)
              & (np.abs(vx) < _COORD_LIMIT) & (np.abs(vy) < _COORD_LIMIT))
    bad_feats = set(fpt[~finite].tolist()) if not finite.all() else set()
    vx = np.where(finite, vx, 0.0)
    vy = np.where(finite, vy, 0.0)
    u = np.where(vx >= 0, np.floor(vx + 0.5),
                 np.ceil(vx - 0.5)).astype(np.int64)
    v = np.where(vy >= 0, np.floor(vy + 0.5),
                 np.ceil(vy - 0.5)).astype(np.int64)
    st["u"], st["v"] = u, v

    # consecutive-duplicate collapse (== remap's sequential collapse)
    keeppt = np.zeros(len(u), dtype=bool)
    keeppt[off[:-1]] = True
    if len(u) > 1:
        diff = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        keeppt[1:] |= diff
        keeppt[off[:-1]] = True

    kept = np.add.reduceat(keeppt.astype(np.int64), off[:-1]) \
        if len(sizes) else np.zeros(0, np.int64)
    s_i = off[:-1]
    e_i = np.maximum(off[1:] - 1, s_i)
    closed = (u[s_i] == u[e_i]) & (v[s_i] == v[e_i]) if len(u) else \
        np.zeros(0, bool)
    is_line_r = role_arr[ring_feat] == _LINE
    ring_ok = np.where(is_line_r, kept >= 2, (kept >= 4) & closed)
    if bad_feats:
        guard = np.isin(ring_feat, np.fromiter(bad_feats, np.int64))
        ring_ok = ring_ok & ~guard

    poly_gid = np.cumsum(~st["ring_int"]) - 1
    ext_alive = ring_ok[~st["ring_int"]] if (~st["ring_int"]).any() \
        else np.zeros(0, bool)
    poly_ok = ext_alive[poly_gid] if len(ext_alive) else \
        np.zeros(len(ring_feat), bool)
    ring_alive = ring_ok & np.where(st["ring_int"], poly_ok, True)

    st = _drop(st, ring_alive, keeppt)
    for f in sorted(bad_feats):
        emit_scalar_row(int(f))

    ring_feat = st["ring_feat"]
    if len(ring_feat) == 0:
        return

    # ---- member counts -> alive + multi flags (post-remap == post-
    # despike for screen-clean features) ----
    is_line_r = role_arr[ring_feat] == _LINE
    n_memb = np.bincount(
        ring_feat[is_line_r | ~st["ring_int"]], minlength=F)
    alive_f = n_memb > 0
    if bad_feats:
        alive_f[np.fromiter(bad_feats, np.int64)] = False
    multi_f = n_memb >= 2

    # ---- despike screen ----
    spike = _despike_flags(st["u"], st["v"], st["off"])
    spike_feats = np.unique(ring_feat[spike])
    for f in spike_feats.tolist():
        if alive_f[f]:
            geom = _materialize(st, f, bool(multi_f[f]))
            emit(f, _scalar_chain(
                geom, "unneeded", int(size_mt[f]), int(x0t[f]),
                int(y0t[f]), int(extent_i[f]), buffer_units,
                bool(do_simp[f]), epsilon))
            alive_f[f] = False
    if len(spike_feats):
        st = _drop(st, alive_f[ring_feat])
        ring_feat = st["ring_feat"]
        if len(ring_feat) == 0:
            return

    # ---- RDP (per ring, exact; lines never die here, rings can) ----
    off = st["off"]
    sizes = _sizes(off)
    is_line_r = role_arr[ring_feat] == _LINE
    need = do_simp[ring_feat]
    if need.any():
        e2 = epsilon * epsilon
        u, v = st["u"], st["v"]
        keeppt = np.ones(len(u), dtype=bool)
        ring_ok = np.ones(len(sizes), dtype=bool)
        for r in np.flatnonzero(need):
            s, e = int(off[r]), int(off[r + 1])
            if e - s <= 2:
                continue
            if e - s < 64:
                # small rings: numpy per-call overhead loses to a plain
                # int loop (exact either way); boxed only per-slice —
                # a whole-chunk tolist would allocate millions of ints
                # even when every eligible ring takes the numpy path
                km = _rdp_keep_py(u[s:e].tolist(), v[s:e].tolist(), e2)
                cnt = sum(km)
            else:
                km = _rdp_keep(u[s:e], v[s:e], e2)
                cnt = int(km.sum())
            keeppt[s:e] = km
            # endpoints always kept => closure preserved for rings
            ring_ok[r] = cnt >= 2 if is_line_r[r] else cnt >= 4
        poly_gid = np.cumsum(~st["ring_int"]) - 1
        ext_alive = ring_ok[~st["ring_int"]] if (~st["ring_int"]).any() \
            else np.zeros(0, bool)
        poly_ok = ext_alive[poly_gid] if len(ext_alive) else \
            np.zeros(len(ring_feat), bool)
        ring_alive = ring_ok & np.where(st["ring_int"], poly_ok, True)
        st = _drop(st, ring_alive, keeppt)
        ring_feat = st["ring_feat"]
        # refresh feature aliveness (NO multi re-collapse at RDP)
        is_line_r = role_arr[ring_feat] == _LINE
        n_memb2 = np.bincount(
            ring_feat[is_line_r | ~st["ring_int"]], minlength=F)
        alive_f = alive_f & (n_memb2 > 0)
        if len(ring_feat) == 0:
            return

    # ---- clip + slice screens on the per-feature bbox ----
    off = st["off"]
    u, v = st["u"], st["v"]
    feat_ids, first_ring = np.unique(ring_feat, return_index=True)
    f_lo = off[first_ring]
    starts = np.minimum(f_lo, len(u) - 1)
    umin = np.minimum.reduceat(u, starts)
    umax = np.maximum.reduceat(u, starts)
    vmin = np.minimum.reduceat(v, starts)
    vmax = np.maximum.reduceat(v, starts)

    buf = buffer_units
    single = {}
    fb_clip, fb_slice = [], []
    for k in range(len(feat_ids)):
        f = int(feat_ids[k])
        if not alive_f[f]:
            continue
        lo = -buf
        hi = int(extent_i[f]) + buf
        if umax[k] < lo or umin[k] > hi or vmax[k] < lo or vmin[k] > hi:
            alive_f[f] = False  # fully clipped away (exact)
            continue
        if not (umin[k] >= lo and umax[k] <= hi
                and vmin[k] >= lo and vmax[k] <= hi):
            fb_clip.append(f)
            continue
        sm = int(size_mt[f])
        txl = max(-(-(int(umin[k]) - buf) // 4096) - 1, 0)
        txh = min((int(umax[k]) + buf) // 4096, sm - 1)
        tyl = max(-(-(int(vmin[k]) - buf) // 4096) - 1, 0)
        tyh = min((int(vmax[k]) + buf) // 4096, sm - 1)
        if txl == txh and tyl == tyh:
            single[f] = (txl, tyl)
        else:
            fb_slice.append(f)

    # fallback clip/slice: boxed twins of the scalar machinery (bbox
    # shortcuts, O(1) per untouched ring per cut); per-piece validity
    # work rejoins the batched certificate below (the per-pair Python
    # intersection kernel was the dominant cost of the old fallback)
    pieces_extra = []  # (feat, tx_abs, ty_abs, geom_tuple)
    if fb_clip or fb_slice:
        # per-ring bboxes from the arrays (cheap reduceat)
        rstarts = np.minimum(off[:-1], len(u) - 1)
        rbb = list(zip(np.minimum.reduceat(u, rstarts).tolist(),
                       np.minimum.reduceat(v, rstarts).tolist(),
                       np.maximum.reduceat(u, rstarts).tolist(),
                       np.maximum.reduceat(v, rstarts).tolist()))

        def slice_feature(f, is_line, members):
            is_mp = bool(multi_f[f]) and not is_line
            sm = int(size_mt[f])
            for (tx, ty), mm in _slice_boxed(
                    is_line, members, sm, int(x0t[f]), int(y0t[f]),
                    0, 0, sm * 4096, buf):
                pg = remove_duplicate_points(
                    _boxed_to_geom(is_line, is_mp, mm))
                pieces_extra.append((f, tx, ty, pg))

        for f in fb_clip:
            is_line, members = _materialize_boxed(st, f, rbb)
            alive_f[f] = False
            hi = int(extent_i[f]) + buf
            for border in ((XMIN, -buf), (XMAX, hi),
                           (YMIN, -buf), (YMAX, hi)):
                members = _clip_boxed(is_line, members, border)
                if not members:
                    break
            if members:
                slice_feature(f, is_line, members)
        for f in fb_slice:
            is_line, members = _materialize_boxed(st, f, rbb)
            alive_f[f] = False
            slice_feature(f, is_line, members)

    if single:
        st = _drop(st, alive_f[ring_feat])
        ring_feat = st["ring_feat"]
        if len(ring_feat):
            feat_ids2 = np.unique(ring_feat)
            ps = {
                "u": st["u"], "v": st["v"], "off": st["off"],
                "ring_int": st["ring_int"],
                "ring_piece": np.searchsorted(feat_ids2, ring_feat),
                "p_feat": feat_ids2,
                "p_txa": np.array([x0t[f] + single[int(f)][0]
                                   for f in feat_ids2], dtype=np.int64),
                "p_tya": np.array([y0t[f] + single[int(f)][1]
                                   for f in feat_ids2], dtype=np.int64),
                "p_line": role_arr[feat_ids2] == _LINE,
                "p_multi": multi_f[feat_ids2],
            }
            _validate_emit(ps, x0t, y0t, size_mt, extent_i,
                           buffer_units, epsilon, emit, emit_many)
    if pieces_extra:
        ps = _ingest_pieces(pieces_extra)
        _validate_emit(ps, x0t, y0t, size_mt, extent_i,
                       buffer_units, epsilon, emit, emit_many)


def _ingest_pieces(pieces):
    """Tuple pieces from the scalar clip/slice -> a piece-state dict for
    the batched validity certificate."""
    u_parts, v_parts = [], []
    off = [0]
    ring_int, ring_piece = [], []
    p_feat, p_txa, p_tya, p_line, p_multi = [], [], [], [], []
    tot = 0
    for pi, (f, tx, ty, geom) in enumerate(pieces):
        typ, data = geom
        p_feat.append(f)
        p_txa.append(tx)
        p_tya.append(ty)
        is_line = typ in ("LineString", "MultiLineString")
        p_line.append(is_line)
        p_multi.append(typ.startswith("Multi"))
        if typ == "LineString":
            members = [data]
        elif typ == "MultiLineString":
            members = data
        elif typ == "Polygon":
            members = [data]
        else:  # MultiPolygon
            members = data
        for m in members:
            rings = [m] if is_line else m
            for ri, ring in enumerate(rings):
                arr = np.array(ring, dtype=np.int64)
                u_parts.append(arr[:, 0])
                v_parts.append(arr[:, 1])
                tot += len(arr)
                off.append(tot)
                ring_int.append((not is_line) and ri > 0)
                ring_piece.append(pi)
    return {
        "u": np.concatenate(u_parts),
        "v": np.concatenate(v_parts),
        "off": np.asarray(off, dtype=np.int64),
        "ring_int": np.asarray(ring_int, dtype=bool),
        "ring_piece": np.asarray(ring_piece, dtype=np.int64),
        "p_feat": np.asarray(p_feat, dtype=np.int64),
        "p_txa": np.asarray(p_txa, dtype=np.int64),
        "p_tya": np.asarray(p_tya, dtype=np.int64),
        "p_line": np.asarray(p_line, dtype=bool),
        "p_multi": np.asarray(p_multi, dtype=bool),
    }


def _materialize_piece(ps, pi):
    """Rebuild piece pi's geometry tuple with its carry type (the type
    the scalar chain would hand to make_valid)."""
    sel = _feat_ring_range(ps["ring_piece"], pi)
    u, v, off = ps["u"], ps["v"], ps["off"]
    if ps["p_line"][pi]:
        lines = [_ring_tuples(u, v, int(off[r]), int(off[r + 1]))
                 for r in sel]
        if len(lines) == 1 and not ps["p_multi"][pi]:
            return ("LineString", lines[0])
        return ("MultiLineString", lines)
    polys = []
    for r in sel:
        ring = _ring_tuples(u, v, int(off[r]), int(off[r + 1]))
        if not ps["ring_int"][r]:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if len(polys) == 1 and not ps["p_multi"][pi]:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _validate_emit(ps, x0t, y0t, size_mt, extent_i, buffer_units,
                   epsilon, emit, emit_many):
    """Batched make_valid/is_valid/orientation certificate over a piece
    state; certificate-clean pieces are emitted directly (make_valid is
    provably the identity up to the Multi-of-1 collapse), flagged pieces
    take the scalar make_valid machinery."""
    u, v, off = ps["u"], ps["v"], ps["off"]
    ring_int = ps["ring_int"]
    ring_piece = ps["ring_piece"]
    P = len(ps["p_feat"])
    sizes = _sizes(off)
    line_r = ps["p_line"][ring_piece]
    poly_r = ~line_r

    spike = _despike_flags(u, v, off)  # make_valid re-runs the despike

    # structure (make_valid's skip_expensive gate + line validity)
    s_i = off[:-1]
    e_i = np.maximum(off[1:] - 1, s_i)
    closed = (u[s_i] == u[e_i]) & (v[s_i] == v[e_i]) if len(u) else \
        np.zeros(0, bool)
    if len(u) > 1:
        diff = ((u[1:] != u[:-1]) | (v[1:] != v[:-1])).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(diff)))
        distinct = 1 + cs[e_i] - cs[s_i]
    else:
        distinct = np.ones(len(sizes), dtype=np.int64)
    struct_bad = np.where(
        line_r,
        (sizes < 2) | ((sizes == 2) & (distinct < 2)),
        ~closed | (distinct < 4))

    xbad = _self_intersection_flags(u, v, off, poly_r & (sizes >= 5))
    sign, safe = _wrapped_area_sign(u, v, off)
    wind_bad = poly_r & (~safe | np.where(ring_int, sign != 1,
                                          sign != -1))
    ring_bad = spike | struct_bad | xbad | wind_bad

    # wind-only repair: for a single-ring piece whose ONLY defect is a
    # strictly-CCW exterior, make_valid's dissolve provably emits the
    # same-start REVERSED ring wrapped as MultiPolygon (property-pinned
    # vs the scalar repair in tests/test_geom_batch.py) — do that
    # in-place instead of the scalar machinery
    p_force_multi = np.zeros(P, dtype=bool)
    only_wind = (wind_bad & ~(spike | struct_bad | xbad) & safe
                 & (sign == 1) & ~ring_int)
    if only_wind.any():
        # A repeated NON-consecutive vertex (a pinch) is invisible to
        # the pair screen — both segment pairs at the pinch share an
        # endpoint and classify END_TO_END — but make_valid's dissolve
        # SPLITS a pinched ring into multiple polygons, which the
        # reverse-in-place shortcut below cannot reproduce. Route
        # pinched rings to the scalar machinery instead.
        for r in np.flatnonzero(only_wind).tolist():
            s, e = int(off[r]), int(off[r + 1])
            pts = u[s:e - 1] + 1j * v[s:e - 1]  # closing vertex excluded
            if len(np.unique(pts)) != e - 1 - s:
                only_wind[r] = False
    if only_wind.any():
        nring_of = np.bincount(ring_piece, minlength=P)
        fixable = only_wind & (nring_of[ring_piece] == 1)
        if fixable.any():
            for r in np.flatnonzero(fixable).tolist():
                s, e = int(off[r]), int(off[r + 1])
                u[s + 1:e - 1] = u[s + 1:e - 1][::-1].copy()
                v[s + 1:e - 1] = v[s + 1:e - 1][::-1].copy()
            ring_bad = ring_bad & ~fixable
            p_force_multi = np.bincount(ring_piece[fixable],
                                        minlength=P) > 0

    piece_bad = np.zeros(P, dtype=bool)
    if ring_bad.any():
        piece_bad = np.bincount(ring_piece[ring_bad], minlength=P) > 0

    for pi in np.flatnonzero(piece_bad).tolist():
        f = int(ps["p_feat"][pi])
        geom = _materialize_piece(ps, pi)
        emit(f, _scalar_chain(
            geom, "valid", int(size_mt[f]), int(x0t[f]), int(y0t[f]),
            int(extent_i[f]), buffer_units, False, epsilon,
            txy=(int(ps["p_txa"][pi]), int(ps["p_tya"][pi]))))

    good = ~piece_bad
    if not good.any():
        return
    # shift + encode the clean pieces (vectorized coords)
    fpt_piece = np.repeat(ring_piece, sizes)
    f_of_piece = ps["p_feat"]
    xsh = (ps["p_txa"] - x0t[f_of_piece]) * 4096
    ysh = (ps["p_tya"] - y0t[f_of_piece]) * 4096
    uvf = np.empty((len(u), 2), dtype="<f8")
    uvf[:, 0] = u - xsh[fpt_piece]
    uvf[:, 1] = v - ysh[fpt_piece]
    raw = uvf.tobytes()

    # final output type: make_valid's internal remove_unneeded_points
    # collapses ANY single-member Multi*, so the emitted type depends
    # only on the CURRENT member count (p_multi is the pre-make_valid
    # carry type, used only for flagged-piece materialization)
    n_memb = np.bincount(ring_piece[line_r | ~ring_int], minlength=P)
    pids, first = np.unique(ring_piece, return_index=True)
    last = np.concatenate((first[1:], [len(sizes)]))
    goodk = np.flatnonzero(~piece_bad[pids])
    # byte offsets once (avoids int() casts in the hot loop)
    boff = (off * 16).tolist()
    ring_int_l = ring_int.tolist()
    is_line_l = ps["p_line"].tolist()
    multi_l = ((n_memb >= 2) | p_force_multi).tolist()
    first_l = first.tolist()
    last_l = last.tolist()
    wkbs = []
    for k in goodk.tolist():
        pi = pids[k]
        r0, r1 = first_l[k], last_l[k]
        wkbs.append(_encode_feature_wkb(
            is_line_l[pi], multi_l[pi],
            [raw[boff[r]:boff[r + 1]] for r in range(r0, r1)],
            ring_int_l[r0:r1]))
    sel = pids[goodk]
    emit_many(ps["p_feat"][sel], ps["p_txa"][sel], ps["p_tya"][sel],
              wkbs)
