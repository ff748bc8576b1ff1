"""Ports of reference simplify.rs unit tests (simplify.rs:453-561)."""

from tileigi_spark.geom.simplify import (
    remove_spikes_linestring,
    remove_duplicate_points,
    remove_unneeded_points,
    simplify,
)


def ls(*pts):
    return [tuple(p) for p in pts]


class TestRemoveSpikes:
    def test_simple_cases(self):  # simplify.rs:470-474
        assert remove_spikes_linestring([]) == []
        assert remove_spikes_linestring([(0, 0)]) == [(0, 0)]

    def test_no_spikes(self):  # :477-483
        assert remove_spikes_linestring([(0, 0), (1, 0)]) == [(0, 0), (1, 0)]
        assert remove_spikes_linestring([(0, 0), (1, 0), (1, 1)]) == [(0, 0), (1, 0), (1, 1)]
        sq = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
        assert remove_spikes_linestring(sq) == sq

    def test_collinear(self):  # :486-492
        assert remove_spikes_linestring([(0, 0), (1, 0), (2, 0)]) == [(0, 0), (2, 0)]
        assert remove_spikes_linestring([(0, 0), (1, 0), (2, 0), (5, 0)]) == [(0, 0), (5, 0)]
        assert remove_spikes_linestring([(0, 0), (1, 0), (2, 0), (3, 0), (5, 0)]) == [(0, 0), (5, 0)]

    def test_spikes(self):  # :495-501
        assert remove_spikes_linestring(
            [(0, 0), (1, 0), (1, 1), (10, 10), (1, 1), (0, 1), (0, 0)]
        ) == [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
        assert remove_spikes_linestring(
            [(0, 0), (1, 0), (1, 1), (10, 10), (20, 10), (10, 10), (1, 1), (0, 1), (0, 0)]
        ) == [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]

    def test_turns(self):  # :505-509
        assert remove_spikes_linestring([(0, 0), (0, 100), (0, 50)]) == [(0, 0), (0, 50)]
        assert remove_spikes_linestring([(0, 0), (0, 100), (0, 50), (50, 50)]) == \
            [(0, 0), (0, 50), (50, 50)]

    def test_zero_area_to_none(self):  # :512-517
        assert remove_spikes_linestring([(0, 0), (0, 100), (0, 0)]) is None
        assert remove_spikes_linestring([(0, 0), (0, 10), (0, 50), (0, 0)]) is None
        assert remove_spikes_linestring(
            [(0, 0), (0, 10), (0, 50), (50, 50), (0, 50), (0, 0)]) is None

    def test_endpoint_spike_simple(self):  # :520-525
        assert remove_spikes_linestring(
            [(-1, 1), (1, 1), (0, 0), (0, -5), (0, 0), (-1, 1)]
        ) == [(-1, 1), (1, 1), (0, 0), (-1, 1)]
        assert remove_spikes_linestring(
            [(0, -5), (0, 0), (1, 1), (-1, 1), (0, 0), (0, -5)]
        ) == [(0, 0), (1, 1), (-1, 1), (0, 0)]

    def test_endpoint_spike(self):  # :528-533
        assert remove_spikes_linestring(
            [(0, -10), (0, 0), (1, 0), (1, 1), (0, 1), (0, 0), (0, -10)]
        ) == [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
        assert remove_spikes_linestring(
            [(0, -10), (0, 0), (1, 0), (1, 1), (0, 1), (0, -10)]
        ) == [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]

    def test_complex(self):  # :535-552
        c = (6, 0); d = (10, 0); e = (12, 0)
        g = (5, 1)
        h = (6, 2); i = (12, 2)
        # NOTE: the reference's inline test (simplify.rs:544) expects the
        # rotation [e,d,g,c,h,i,e], but executing the reference CODE
        # (verified with a standalone Rust harness) yields [d,g,c,h,i,e,d]
        # — the same ring rotated. We pin actual code behavior.
        assert remove_spikes_linestring([c, d, g, c, h, i, e, d, c]) == \
            [d, g, c, h, i, e, d]
        assert remove_spikes_linestring([c, g, d, e, d, c]) == [c, g, d, c]
        assert remove_spikes_linestring([c, g, d, e, c]) == [c, g, d, c]
        assert remove_spikes_linestring([g, c, d, c, h, i, e, d, g]) == \
            [g, c, h, i, e, d, g]

    def test_real_world(self):  # :555-558
        pts = [(57275, 57767), (1735, 57767), (1735, -19385), (57275, -19385),
               (57275, 57767)]
        assert remove_spikes_linestring(pts) is not None


class TestDedup:
    def test_basic(self):
        g = remove_duplicate_points(("LineString", [(0, 0), (0, 0), (1, 1), (1, 1), (2, 2)]))
        assert g == ("LineString", [(0, 0), (1, 1), (2, 2)])

    def test_trailing(self):
        g = remove_duplicate_points(("LineString", [(0, 0), (1, 1), (1, 1)]))
        assert g == ("LineString", [(0, 0), (1, 1)])


class TestRdpSimplify:
    def test_two_points_passthrough(self):
        g = simplify(("LineString", [(0, 0), (100, 0)]), 8)
        assert g == ("LineString", [(0, 0), (100, 0)])

    def test_collinear_wiped(self):
        g = simplify(("LineString", [(0, 0), (50, 1), (100, 0)]), 8)
        assert g == ("LineString", [(0, 0), (100, 0)])

    def test_detour_kept(self):
        g = simplify(("LineString", [(0, 0), (50, 100), (100, 0)]), 8)
        assert g == ("LineString", [(0, 0), (50, 100), (100, 0)])

    def test_ring_dropped_when_degenerate(self):
        # ring that collapses below 4 points -> polygon dropped
        g = simplify(("Polygon", [[(0, 0), (2, 1), (4, 2), (0, 0)]]), 8)
        assert g is None

    def test_points_passthrough(self):
        assert simplify(("Point", (3, 4)), 8) == ("Point", (3, 4))
