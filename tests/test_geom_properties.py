"""Property-based tests (hypothesis) for the exact-integer geometry core:
make_valid always yields valid geometry; clipping never leaks outside the
border; the intersection kernel is symmetric under segment swap for the
None/Crossing classification."""

from hypothesis import given, settings, strategies as st

from tileigi_spark.geom.validity import (
    make_valid, is_valid, intersection, NONE, CROSSING,
)
from tileigi_spark.geom.clip import clip_to_bbox

coord = st.integers(min_value=-200, max_value=200)
point = st.tuples(coord, coord)


def _ring(pts):
    return list(pts) + [pts[0]]


rings = st.lists(point, min_size=3, max_size=8, unique=True).map(_ring)


@settings(max_examples=150, deadline=None)
@given(rings)
def test_make_valid_always_valid(ring):
    out = make_valid(("Polygon", [ring]))
    if out is not None:
        assert is_valid(out), f"make_valid produced invalid: {out}"


@settings(max_examples=150, deadline=None)
@given(st.lists(point, min_size=2, max_size=10, unique=True))
def test_clip_stays_inside(pts):
    out = clip_to_bbox(("LineString", pts), -50, -50, 50, 50)
    if out is None:
        return

    def all_pts(g):
        typ, data = g
        if typ == "Point":
            return [data]
        if typ in ("MultiPoint", "LineString"):
            return list(data)
        if typ in ("MultiLineString", "Polygon"):
            return [p for part in data for p in part]
        return [p for rings_ in data for r in rings_ for p in r]

    for (x, y) in all_pts(out):
        assert -50 <= x <= 50 and -50 <= y <= 50


@settings(max_examples=200, deadline=None)
@given(point, point, point, point)
def test_intersection_swap_symmetry(p1, p2, p3, p4):
    if p1 == p2 or p3 == p4:
        return
    a = intersection(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1], p4[0], p4[1])
    b = intersection(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1], p2[0], p2[1])
    # None-ness agrees under operand swap (payloads may differ by rounding
    # direction, which the reference exhibits too — intersect12 test)
    assert (a[0] == NONE) == (b[0] == NONE)


@settings(max_examples=150, deadline=None)
@given(rings)
def test_make_valid_idempotent_on_valid(ring):
    out = make_valid(("Polygon", [ring]))
    if out is None:
        return
    again = make_valid(out)
    assert again is not None
    assert is_valid(again)
