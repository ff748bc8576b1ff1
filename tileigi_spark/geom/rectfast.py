"""Vectorized geometry pipeline for axis-aligned rectangle polygons.

The scalar per-feature pipeline (remap → remove_unneeded_points →
simplify → clip_to_bbox → quadtree slice → make_valid → is_valid →
orient → shift → WKB) is exact-integer Rust-ported code
(lib.rs:559-728) that runs at Python interpreter speed. For the
rectangle case — clipped boxes, bboxes, the dominant shape of
box-layer workloads — every stage has a closed form:

* a Sutherland-Hodgman border clip of an axis rect is the clamped rect
  whose ring is a rotation/reflection of the corner cycle; which
  rotation is a pure function of (border kind, current start corner,
  winding) for strictly-interior cuts, so the 4x8 transform tables are
  GENERATED from the scalar `_clip_ring_to_border` at import (no
  hand-derived constants to drift);
* integer RDP on a closed rect ring either keeps it verbatim or
  deletes it: both half-ring corners sit at distance w*h/sqrt(w^2+h^2)
  from the split diagonal, so identity <=> (w*h)^2 >= eps^2*(w^2+h^2)
  with the kernel's exact integer comparison (see _rdp's wipe ladder:
  the overflow guards are implied at these magnitudes);
* the quadtree slice applies nested cuts whose accumulated bounds per
  tile equal the buffered tile interval, so the piece bounds are one
  interval clamp and the ring state is the fold of at most
  2*log2(metatile) table lookups along the tile's bit path;
* make_valid on the resulting ring returns it unchanged when the
  exterior is CW (tile space, y down) and the same-start reversed ring
  wrapped as MultiPolygon when CCW (validity.py's axis-rect fast path,
  itself property-pinned against the dissolve repair).

Everything runs as numpy array ops over (feature, tile) pairs; the
output WKB is assembled as byte matrices. Byte parity with the scalar
path is pinned by tests/test_rect_fast_path.py over randomized
rects/zooms/buffers and by the golden-tile fixtures.
"""

from __future__ import annotations

import numpy as np

from .clip import XMAX, XMIN, YMAX, YMIN, _clip_ring_to_border

# canonical corner cycle of a rect (x0,y0,x1,y1), tile space (y down):
#   C0=(x0,y0) C1=(x1,y0) C2=(x1,y1) C3=(x0,y1)
# ring state s in 0..7: corner = s >> 1, direction = +1 if s & 1 else -1
# (direction +1 walks C0->C1->C2->C3, the shoelace-CCW order in y-down
# space — the order make_valid must repair; -1 walks CW, already valid)


def _cycle(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def _ring_of_state(x0, y0, x1, y1, s):
    c = _cycle(x0, y0, x1, y1)
    start, d = s >> 1, (1 if s & 1 else -1)
    pts = [c[(start + d * k) % 4] for k in range(4)]
    return pts + [pts[0]]


def _state_of_ring(ring, x0, y0, x1, y1):
    c = _cycle(x0, y0, x1, y1)
    start = c.index(ring[0])
    d = 1 if ring[1] == c[(start + 1) % 4] else -1
    return (start << 1) | (1 if d == 1 else 0)


def _gen_clip_tables():
    """Probe the scalar Sutherland-Hodgman kernel once per
    (border kind, state) on a canonical rect with a strictly interior
    cut; decode the output ring back to a state. Exactness follows from
    the emission order depending only on the inside-flag pattern, which
    is determined by (kind, state) for strict cuts."""
    tables = {}
    x0, y0, x1, y1 = 0, 0, 10, 10
    for kind, val, nb in ((XMIN, 4, (4, 0, 10, 10)),
                          (XMAX, 4, (0, 0, 4, 10)),
                          (YMIN, 4, (0, 4, 10, 10)),
                          (YMAX, 4, (0, 0, 10, 4))):
        t = np.empty(8, dtype=np.int64)
        for s in range(8):
            ring = _ring_of_state(x0, y0, x1, y1, s)
            out = _clip_ring_to_border(ring, (kind, val))
            assert out is not None and len(out) == 5 and out[0] == out[-1]
            t[s] = _state_of_ring(out, *nb)
        tables[kind] = t
    return tables


_CLIP_T = _gen_clip_tables()
# order matters: clip_to_bbox applies XMIN, XMAX, YMIN, YMAX
T_XMIN, T_XMAX = _CLIP_T[XMIN], _CLIP_T[XMAX]
T_YMIN, T_YMAX = _CLIP_T[YMIN], _CLIP_T[YMAX]


def _apply_cut(state, lo, hi, val, t_lowcut, is_low):
    """Vectorized border cut on one axis: is_low=True keeps >= val
    (XMIN/YMIN), False keeps <= val (XMAX/YMAX). Returns updated
    (state, lo, hi, alive). Strict-interior cuts transform the state;
    touch/outside cuts that zero the interval kill the piece (the
    scalar path emits a degenerate ring that is always dropped by
    make_valid's ring-length check)."""
    if is_low:
        binds = (lo < val) & (val < hi)
        lo = np.maximum(lo, val)
    else:
        binds = (lo < val) & (val < hi)
        hi = np.minimum(hi, val)
    state = np.where(binds, t_lowcut[state], state)
    alive = lo < hi
    return state, lo, hi, alive


def rect_pieces(x0, y0, x1, y1, state, zooms, size_mt, x0t, y0t,
                buffer_units, global_maxzoom):
    """Full post-remap pipeline for axis rects, vectorized over features.

    Inputs are per-feature int64 arrays: tile-space rect bounds
    (x0<x1, y0<y1), ring state, zoom, metatile size in tiles, top-left
    tile coords. Returns per-PIECE arrays:
    (feature_index, tile_x, tile_y, px0, py0, px1, py1, out_state,
     as_multipolygon) — bounds in tile-local coords (shifted), ring
    state per the canonical cycle, as_multipolygon True when make_valid
    wrapped the repaired ring.
    """
    n = len(x0)
    # epsilon 8, squared — O5 skips simplify at maxzoom. The overflow
    # tiering below is derived for this value; callers with a different
    # epsilon must take the scalar branch (engine.geometry_stage gates
    # the fast path on epsilon == 8)
    eps2 = 64

    # simplify: identity or dropped (see module docstring). The exact
    # predicate (w*h)^2 < eps2*(w^2+h^2) overflows int64 for features
    # much larger than the metatile (world-spanning rects remap to
    # coords ~4096*2^zoom), so tier it: small rows vectorized in int64
    # (A < 2^31 -> A^2 < 2^62 exact; A in [2^31, 2^52) -> A^2 > E_max
    # = 2^59 -> never wiped), rare huge rows through Python bigints.
    w = x1 - x0
    h = y1 - y0
    keep = np.ones(n, dtype=bool)
    simp = zooms < global_maxzoom
    if simp.any():
        wipe = np.zeros(n, dtype=bool)
        big = (w >= (1 << 26)) | (h >= (1 << 26))
        sm = np.flatnonzero(~big)
        if len(sm):
            ws, hs = w[sm], h[sm]
            A = ws * hs
            E = eps2 * (ws * ws + hs * hs)
            wipe[sm] = np.where(A < (1 << 31), A * A < E, False)
        for i in np.flatnonzero(big):
            wipe[i] = ((int(w[i]) * int(h[i])) ** 2
                       < eps2 * (int(w[i]) ** 2 + int(h[i]) ** 2))
        keep &= ~(simp & wipe)

    # clip_to_bbox to [-buf, extent+buf]: XMIN, XMAX, YMIN, YMAX
    extent = 4096 * size_mt
    s = state.copy()
    lx, hx = x0.copy(), x1.copy()
    ly, hy = y0.copy(), y1.copy()
    for val, table, is_low, axis in (
            (-buffer_units + np.zeros(n, np.int64), T_XMIN, True, "x"),
            (extent + buffer_units, T_XMAX, False, "x"),
            (-buffer_units + np.zeros(n, np.int64), T_YMIN, True, "y"),
            (extent + buffer_units, T_YMAX, False, "y")):
        if axis == "x":
            s, lx, hx, alive = _apply_cut(s, lx, hx, val, table, is_low)
        else:
            s, ly, hy, alive = _apply_cut(s, ly, hy, val, table, is_low)
        keep &= alive

    idx = np.flatnonzero(keep)
    if not len(idx):
        return (np.zeros(0, np.int64),) * 9
    s, lx, hx, ly, hy = s[idx], lx[idx], hx[idx], ly[idx], hy[idx]
    size_mt, x0t, y0t = size_mt[idx], x0t[idx], y0t[idx]
    zooms = zooms[idx]

    # tile fan-out: tile t STRICTLY overlaps iff t*4096 - buf < hi and
    # (t+1)*4096 + buf > lo (zero-width touches produce degenerate
    # pieces the scalar path always drops), so
    #   t_min = ceil((lo - buf + 1)/4096) - 1, t_max = floor((hi+buf-1)/4096)
    tx_lo = np.maximum(_div_ceil(lx - buffer_units + 1, 4096) - 1, 0)
    tx_hi = np.minimum(_div_floor(hx + buffer_units - 1, 4096),
                       size_mt - 1)
    ty_lo = np.maximum(_div_ceil(ly - buffer_units + 1, 4096) - 1, 0)
    ty_hi = np.minimum(_div_floor(hy + buffer_units - 1, 4096),
                       size_mt - 1)

    fanx = np.maximum(tx_hi - tx_lo + 1, 0)
    fany = np.maximum(ty_hi - ty_lo + 1, 0)
    fan = fanx * fany
    ok = fan > 0
    if not ok.all():
        keep_idx = np.flatnonzero(ok)
        idx = idx[keep_idx]
        s, lx, hx, ly, hy = (s[keep_idx], lx[keep_idx], hx[keep_idx],
                             ly[keep_idx], hy[keep_idx])
        size_mt, x0t, y0t = (size_mt[keep_idx], x0t[keep_idx],
                             y0t[keep_idx])
        zooms = zooms[keep_idx]
        tx_lo, tx_hi = tx_lo[keep_idx], tx_hi[keep_idx]
        ty_lo, ty_hi = ty_lo[keep_idx], ty_hi[keep_idx]
        fanx, fany = fanx[keep_idx], fany[keep_idx]
        fan = fan[keep_idx]

    # expand to (feature, tile) pairs
    rep = np.repeat(np.arange(len(idx)), fan)
    # per-pair local tile offsets
    off = np.arange(len(rep)) - np.repeat(
        np.concatenate(([0], np.cumsum(fan)[:-1])), fan)
    ptx = tx_lo[rep] + off // fany[rep]
    pty = ty_lo[rep] + off % fany[rep]

    ps = s[rep]
    plx, phx = lx[rep], hx[rep]
    ply, phy = ly[rep], hy[rep]
    psize = size_mt[rep]

    # walk the quadtree cut path: levels from metatile root down; at
    # each level an x-cut then a y-cut, values at the child boundary
    # +/- buffer (left/top child keeps <= mid+buf; right/bottom keeps
    # >= mid-buf)
    max_levels = int(np.log2(int(psize.max()))) if len(psize) else 0
    span0 = psize * 4096
    node_x = np.zeros(len(rep), dtype=np.int64)
    node_y = np.zeros(len(rep), dtype=np.int64)
    span = span0.copy()
    tiles_per_node = psize.copy()
    for _ in range(max_levels):
        active = tiles_per_node > 1
        half = span // 2
        t_half = tiles_per_node // 2
        # x cut
        local_tx = ptx - (node_x // 4096)
        go_right = active & (local_tx >= t_half)
        cutv = node_x + half
        # left: XMAX at cut+buf ; right: XMIN at cut-buf
        vmax = cutv + buffer_units
        vmin = cutv - buffer_units
        bind_l = active & ~go_right & (plx < vmax) & (vmax < phx)
        bind_r = active & go_right & (plx < vmin) & (vmin < phx)
        ps = np.where(bind_l, T_XMAX[ps], ps)
        ps = np.where(bind_r, T_XMIN[ps], ps)
        phx = np.where(active & ~go_right, np.minimum(phx, vmax), phx)
        plx = np.where(active & go_right, np.maximum(plx, vmin), plx)
        node_x = np.where(go_right, node_x + half, node_x)
        # y cut
        local_ty = pty - (node_y // 4096)
        go_down = active & (local_ty >= t_half)
        cutv = node_y + half
        vmax = cutv + buffer_units
        vmin = cutv - buffer_units
        bind_u = active & ~go_down & (ply < vmax) & (vmax < phy)
        bind_d = active & go_down & (ply < vmin) & (vmin < phy)
        ps = np.where(bind_u, T_YMAX[ps], ps)
        ps = np.where(bind_d, T_YMIN[ps], ps)
        phy = np.where(active & ~go_down, np.minimum(phy, vmax), phy)
        ply = np.where(active & go_down, np.maximum(ply, vmin), ply)
        node_y = np.where(go_down, node_y + half, node_y)
        span = np.where(active, half, span)
        tiles_per_node = np.where(active, t_half, tiles_per_node)

    alive = (plx < phx) & (ply < phy)
    a = np.flatnonzero(alive)
    rep, ptx, pty = rep[a], ptx[a], pty[a]
    ps = ps[a]
    plx, phx, ply, phy = plx[a], phx[a], ply[a], phy[a]

    # make_valid semantics: direction +1 (shoelace-CCW in y-down) is
    # repaired to the same-start reversed ring wrapped as MultiPolygon;
    # direction -1 is already valid and stays Polygon
    as_multi = (ps & 1) == 1
    out_state = np.where(as_multi, ps ^ 1, ps)

    # shift to tile-local coords
    shift_x = ptx * 4096
    shift_y = pty * 4096
    return (idx[rep], ptx, pty,
            plx - shift_x, ply - shift_y, phx - shift_x, phy - shift_y,
            out_state, as_multi)


def _div_floor(a, b):
    return np.floor_divide(a, b)


def _div_ceil(a, b):
    return -np.floor_divide(-a, b)


def rings_wkb(px0, py0, px1, py1, state, as_multi):
    """Assemble WKB bytes per piece: 93-byte Polygon or 102-byte
    MultiPolygon-of-one, ring per the canonical cycle state, closed.
    Returns a list of bytes objects."""
    n = len(px0)
    corner_x = np.stack([px0, px1, px1, px0], axis=1)  # C0..C3
    corner_y = np.stack([py0, py0, py1, py1], axis=1)
    start = (state >> 1).astype(np.int64)
    d = np.where((state & 1) == 1, 1, -1)
    k = np.arange(4)
    order = (start[:, None] + d[:, None] * k[None, :]) % 4
    rx = np.take_along_axis(corner_x, order, axis=1)
    ry = np.take_along_axis(corner_y, order, axis=1)

    pts = np.empty((n, 5, 2), dtype="<f8")
    pts[:, :4, 0] = rx
    pts[:, :4, 1] = ry
    pts[:, 4, 0] = rx[:, 0]
    pts[:, 4, 1] = ry[:, 0]
    ring_bytes = pts.reshape(n, 10).view(np.uint8)        # (n, 80)

    poly = np.empty((n, 93), dtype=np.uint8)
    poly[:, 0] = 1
    poly[:, 1:5] = np.array([3, 0, 0, 0], dtype=np.uint8)
    poly[:, 5:9] = np.array([1, 0, 0, 0], dtype=np.uint8)
    poly[:, 9:13] = np.array([5, 0, 0, 0], dtype=np.uint8)
    poly[:, 13:93] = ring_bytes

    out = [None] * n
    multi_head = np.array([1, 6, 0, 0, 0, 1, 0, 0, 0], dtype=np.uint8)
    mp = np.flatnonzero(as_multi)
    sp = np.flatnonzero(~as_multi)
    if len(sp):
        raw = poly[sp].tobytes()
        for j, i in enumerate(sp):
            out[i] = raw[j * 93:(j + 1) * 93]
    if len(mp):
        buf = np.empty((len(mp), 102), dtype=np.uint8)
        buf[:, :9] = multi_head
        buf[:, 9:] = poly[mp]
        raw = buf.tobytes()
        for j, i in enumerate(mp):
            out[i] = raw[j * 102:(j + 1) * 102]
    return out
