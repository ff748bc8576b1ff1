"""Duplicate-point removal, spike removal and exact-integer RDP.

Behavioral spec: reference src/simplify.rs. All arithmetic on Python ints
(exact, matching the reference's i64 widening), with the RDP wipe
condition's overflow-guard clause ladder preserved verbatim
(simplify.rs:130) because it is part of the observable semantics.
"""

from __future__ import annotations


# ---------------------------------------------------------------- dup points

def _dedup_linestring(pts):
    """simplify.rs:250-289 — drop consecutive duplicates, then trailing
    duplicates of the 2nd-last point while len > 2."""
    if len(pts) < 2:
        return pts
    out = [pts[0]]
    for p in pts[1:]:
        if p != out[-1]:
            out.append(p)
    while len(out) > 2 and out[-1] == out[-2]:
        out.pop()
    return out


def remove_duplicate_points(geom):
    """simplify.rs:224-248 — in the reference this mutates; we return new."""
    typ, data = geom
    if typ == "LineString":
        return (typ, _dedup_linestring(data))
    if typ == "MultiLineString":
        return (typ, [_dedup_linestring(ls) for ls in data])
    if typ == "Polygon":
        return (typ, [_dedup_linestring(r) for r in data])
    if typ == "MultiPolygon":
        return (typ, [[_dedup_linestring(r) for r in rings] for rings in data])
    return geom


# ------------------------------------------------------------------- spikes

def remove_spikes_linestring(pts):
    """simplify.rs:291-405. Iteratively removes zero-area spikes/collinear
    runs; handles the spike-at-ring-endpoint case by rotating the closing
    point (simplify.rs:343-388). Returns None for zero-area leftovers."""
    pts = list(pts)
    if len(pts) < 2:
        return pts

    while True:
        n = len(pts)
        keep = [True] * n
        removed = False

        last_kept = pts[0]
        # windows over pts[1:]: middle point pts[i+1], next pts[i+2]
        for i in range(n - 2):
            p1 = last_kept
            p2 = pts[i + 1]
            p3 = pts[i + 2]
            x1, y1 = p1
            x2, y2 = p2
            x3, y3 = p3
            zero_area = (x1 - x3) * (y2 - y1) == (x1 - x2) * (y3 - y1)
            if zero_area:
                keep[i + 1] = False
                removed = True
            else:
                last_kept = p2

        l = len(pts)
        keep_ends = keep[0] and keep[1] and keep[l - 1] and keep[l - 2]
        is_closed = pts[0] == pts[l - 1]

        if l >= 4 and is_closed and keep_ends:
            if pts[1] == pts[l - 2]:
                # point 0 is the spike tip; chop first & last
                keep[0] = False
                keep[l - 1] = False
                removed = True
            else:
                x1, y1 = pts[l - 2]
                x2, y2 = pts[0]
                x3, y3 = pts[1]
                zero_area = (x1 - x3) * (y2 - y1) == (x1 - x2) * (y3 - y1)
                if zero_area:
                    dist_front = (x3 - x2) ** 2 + (y3 - y2) ** 2
                    dist_end = (x1 - x2) ** 2 + (y1 - y2) ** 2
                    if dist_front < dist_end:
                        keep[0] = False
                        pts[l - 1] = pts[1]
                        keep[l - 1] = True
                    else:
                        keep[l - 1] = False
                        pts[0] = pts[l - 2]
                        keep[0] = True
                    removed = True

        if removed:
            pts = [p for p, k in zip(pts, keep) if k]
            continue
        break

    if len(pts) == 2 and pts[0] == pts[1]:
        return None
    return pts


def remove_spikes(geom):
    """simplify.rs:407-451. Multi* with 0 members -> None, 1 -> collapse."""
    typ, data = geom
    if typ == "LineString":
        r = remove_spikes_linestring(data)
        return None if r is None else ("LineString", r)
    if typ == "MultiLineString":
        new = [r for r in (remove_spikes_linestring(ls) for ls in data) if r is not None]
        if not new:
            return None
        if len(new) == 1:
            return ("LineString", new[0])
        return ("MultiLineString", new)
    if typ == "Polygon":
        rings = _remove_spikes_rings(data)
        return None if rings is None else ("Polygon", rings)
    if typ == "MultiPolygon":
        new = [r for r in (_remove_spikes_rings(rings) for rings in data) if r is not None]
        if not new:
            return None
        if len(new) == 1:
            return ("Polygon", new[0])
        return ("MultiPolygon", new)
    return geom


def _remove_spikes_rings(rings):
    ext = remove_spikes_linestring(rings[0])
    if ext is None:
        return None
    out = [ext]
    for interior in rings[1:]:
        r = remove_spikes_linestring(interior)
        if r is not None:
            out.append(r)
    return out


def remove_unneeded_points(geom):
    """simplify.rs:217-222 — dedup then despike."""
    return remove_spikes(remove_duplicate_points(geom))


# ----------------------------------------------------------------------- RDP

def _rdp(points, epsilon):
    """simplify.rs:38-155 — stack-based integer RDP.

    Keeps the reference's exact wipe condition including the
    overflow-guard ladder (simplify.rs:130):
        max_num < this_e && max_num < (this_e/max_num + 1) && max_num² < this_e
    with truncating integer division.
    """
    n = len(points)
    if n <= 2:
        return points

    keep = [True] * n
    stack = [(0, n - 1)]
    e = epsilon * epsilon

    while stack:
        start, end = stack.pop()
        if start + 1 == end or start == end:
            continue

        p1 = points[start]
        p2 = points[end]

        if p1 == p2:
            best = None
            for i in range(start + 1, end):
                if keep[i]:
                    px, py = points[i]
                    num = (px - p1[0]) ** 2 + (py - p2[1]) ** 2
                    cand = (num, i - start - 1)
                    if best is None or cand > best:
                        best = cand
            max_num, rel = best
            index = rel + start + 1
            wipe = max_num < e
        else:
            dx = p2[0] - p1[0]
            dy = p2[1] - p1[1]
            exsy = p2[0] * p1[1]
            eysx = p2[1] * p1[0]
            dist_sqr = dx * dx + dy * dy
            best = None
            for i in range(start + 1, end):
                if keep[i]:
                    px, py = points[i]
                    num = abs((dy * px + exsy) - (dx * py + eysx))
                    cand = (num, i - start - 1)
                    if best is None or cand > best:
                        best = cand
            max_num, rel = best
            index = rel + start + 1
            this_e = e * dist_sqr
            # truncating division matches Rust i64 `/` (both operands >= 0)
            wipe = (max_num < this_e
                    and max_num < (this_e // max_num + 1)
                    and max_num * max_num < this_e)

        if wipe:
            if start == 0 and end == n - 1:
                return [p1, p2]
            for i in range(start + 1, end):
                keep[i] = False
        else:
            stack.append((start, index))
            stack.append((index, end))

    return [p for p, k in zip(points, keep) if k]


def _simplify_linestring(pts, epsilon, should_be_ring):
    new = _rdp(list(pts), epsilon)
    if should_be_ring:
        if len(new) >= 4 and new[0] == new[-1]:
            return new
        return None
    return new if len(new) >= 2 else None


def simplify(geom, epsilon):
    """simplify.rs:157-215. Points pass through; Multi* members that
    simplify away are dropped (polygons: whole polygon if exterior dies;
    MultiPolygon empty -> None; MultiLineString never returns None)."""
    typ, data = geom
    if typ in ("Point", "MultiPoint"):
        return geom
    if typ == "LineString":
        r = _simplify_linestring(data, epsilon, False)
        return None if r is None else ("LineString", r)
    if typ == "MultiLineString":
        return ("MultiLineString",
                [r for r in (_simplify_linestring(ls, epsilon, False) for ls in data)
                 if r is not None])
    if typ == "Polygon":
        rings = _simplify_rings(data, epsilon)
        return None if rings is None else ("Polygon", rings)
    if typ == "MultiPolygon":
        new = [r for r in (_simplify_rings(rings, epsilon) for rings in data)
               if r is not None]
        return ("MultiPolygon", new) if new else None
    raise ValueError(f"unsupported geometry type {typ}")


def _simplify_rings(rings, epsilon):
    ext = _simplify_linestring(rings[0], epsilon, True)
    if ext is None:
        return None
    out = [ext]
    for interior in rings[1:]:
        r = _simplify_linestring(interior, epsilon, True)
        if r is not None:
            out.append(r)
    return out
