"""raster <-> vector operators (tileigi_spark/raster.py).

North-rule surface beyond the reference (tileigi is vector-only):
pinned here by brute-force twins + a raster->vector->MVT integration,
and by the `rasterize` / `raster_vectorize` DuckDB oracles in
__spark_entry__.py.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tileigi_spark.mercator import MERC_MAX
from tileigi_spark.raster import (
    WORLD,
    downsample_raster,
    raster_band,
    rasterize_points,
    rect_merc_bounds,
    rects_to_wkb,
    vectorize_raster,
)


def _points(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    mx = (rng.random(n) - 0.5) * WORLD
    my = (rng.random(n) - 0.5) * WORLD * 0.9
    return spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(mx, my))],
        "pid long, mx double, my double")


def _brute_raster(rows, zoom, res):
    npx = (1 << zoom) * res
    grid = {}
    for _, mx, my in rows:
        gx = min(max(int(np.floor((mx + MERC_MAX) / WORLD * npx)), 0), npx - 1)
        gy = min(max(int(np.floor((MERC_MAX - my) / WORLD * npx)), 0), npx - 1)
        key = (gx // res, gy // res, gx % res, gy % res)
        grid[key] = grid.get(key, 0) + 1
    return grid


class TestRasterize:
    def test_matches_brute_force(self, spark):
        pts = _points(spark)
        rows = [(r.pid, r.mx, r.my) for r in pts.collect()]
        got = {(r.x, r.y, r.px, r.py): r.cnt
               for r in rasterize_points(pts, zoom=2, res=8).collect()}
        assert got == _brute_raster(rows, 2, 8)

    def test_total_count_preserved(self, spark):
        pts = _points(spark, n=300, seed=11)
        ras = rasterize_points(pts, zoom=3, res=16)
        assert ras.agg(F.sum("cnt")).collect()[0][0] == 300

    def test_value_band_sums(self, spark):
        pts = _points(spark, n=120, seed=3).withColumn(
            "w", (F.col("pid") % 5).cast("long"))
        ras = rasterize_points(pts, zoom=1, res=4, value="w")
        tot = ras.agg(F.sum("val")).collect()[0][0]
        assert tot == sum(i % 5 for i in range(120))

    def test_edge_clamp(self, spark):
        # points exactly on / beyond the world edge land in the last pixel
        pts = spark.createDataFrame(
            [(0, MERC_MAX, MERC_MAX), (1, -MERC_MAX - 1.0, -MERC_MAX)],
            "pid long, mx double, my double")
        got = {(r.x, r.y, r.px, r.py)
               for r in rasterize_points(pts, zoom=1, res=4).collect()}
        assert got == {(1, 0, 3, 0), (0, 1, 0, 3)}


def _brute_rects(cells):
    """Independent rectangle decomposition: row runs, then greedy
    vertical merge of equal-extent runs on consecutive rows."""
    runs = []
    by_row = {}
    for (x, y, px, py) in cells:
        by_row.setdefault((x, y, py), []).append(px)
    for (x, y, py), xs in by_row.items():
        xs.sort()
        start = prev = xs[0]
        for v in xs[1:]:
            if v == prev + 1:
                prev = v
            else:
                runs.append((x, y, py, start, prev))
                start = prev = v
        runs.append((x, y, py, start, prev))
    rects = []
    by_extent = {}
    for (x, y, py, a, b) in runs:
        by_extent.setdefault((x, y, a, b), []).append(py)
    for (x, y, a, b), ys in by_extent.items():
        ys.sort()
        start = prev = ys[0]
        for v in ys[1:]:
            if v == prev + 1:
                prev = v
            else:
                rects.append((x, y, a, start, b, prev))
                start = prev = v
        rects.append((x, y, a, start, b, prev))
    return set(rects)


class TestVectorize:
    def test_matches_brute_force(self, spark):
        pts = _points(spark, n=500, seed=23)
        ras = rasterize_points(pts, zoom=1, res=8)
        cells = [(r.x, r.y, r.px, r.py) for r in ras.collect()]
        got = {(r.x, r.y, r.px0, r.py0, r.px1, r.py1)
               for r in vectorize_raster(ras).collect()}
        assert got == _brute_rects(cells)

    def test_rects_cover_exactly_the_lit_cells(self, spark):
        pts = _points(spark, n=500, seed=5)
        ras = rasterize_points(pts, zoom=2, res=8)
        lit = {(r.x, r.y, r.px, r.py)
               for r in ras.filter(F.col("cnt") >= 2).collect()}
        covered = set()
        for r in vectorize_raster(ras, threshold=2).collect():
            for px in range(r.px0, r.px1 + 1):
                for py in range(r.py0, r.py1 + 1):
                    cell = (r.x, r.y, px, py)
                    assert cell not in covered, "overlapping rectangles"
                    covered.add(cell)
        assert covered == lit

    def test_cells_column(self, spark):
        ras = spark.createDataFrame(
            [(0, 0, px, py, 1) for px in range(3) for py in range(2)],
            "x long, y long, px long, py long, cnt long")
        out = vectorize_raster(ras).collect()
        assert len(out) == 1 and out[0].cells == 6

    def test_l_shape_splits(self, spark):
        # L shape: full row 0 (px 0-2) + single cell (0, py1)
        cells = [(0, 0, 0, 0), (0, 0, 1, 0), (0, 0, 2, 0), (0, 0, 0, 1)]
        ras = spark.createDataFrame(
            [c + (1,) for c in cells],
            "x long, y long, px long, py long, cnt long")
        got = {(r.px0, r.py0, r.px1, r.py1)
               for r in vectorize_raster(ras).collect()}
        assert got == {(0, 0, 2, 0), (0, 1, 0, 1)}


class TestDownsample:
    def test_matches_direct_rasterize_at_parent_zoom(self, spark):
        """One overview step of the zoom-z raster equals rasterizing the
        original points at zoom z-1 (when res is even and the grids
        nest, which they do: global pixel index exactly halves)."""
        pts = _points(spark, n=500, seed=17)
        child = rasterize_points(pts, zoom=3, res=8)
        got = {(r.x, r.y, r.px, r.py): r.cnt
               for r in downsample_raster(child, res=8).collect()}
        want = {(r.x, r.y, r.px, r.py): r.cnt
                for r in rasterize_points(pts, zoom=2, res=8).collect()}
        assert got == want

    def test_total_preserved_across_levels(self, spark):
        pts = _points(spark, n=300, seed=19)
        ras = rasterize_points(pts, zoom=4, res=4)
        for _ in range(3):
            ras = downsample_raster(ras, res=4)
            assert ras.agg(F.sum("cnt")).collect()[0][0] == 300

    def test_value_band_sums_through(self, spark):
        pts = _points(spark, n=200, seed=21).withColumn(
            "w", (F.col("pid") % 7).cast("long"))
        ras = rasterize_points(pts, zoom=2, res=8, value="w")
        down = downsample_raster(ras, res=8, value="val")
        assert down.agg(F.sum("val")).collect()[0][0] == sum(
            i % 7 for i in range(200))


class TestBandAndBounds:
    def test_dense_band_roundtrip(self, spark):
        pts = _points(spark, n=200, seed=9)
        res = 8
        ras = rasterize_points(pts, zoom=1, res=res)
        sparse = {(r.x, r.y): {} for r in ras.collect()}
        for r in ras.collect():
            sparse[(r.x, r.y)][r.py * res + r.px] = r.cnt
        for row in raster_band(ras, res=res).collect():
            want = sparse[(row.x, row.y)]
            assert len(row.band) == res * res
            for i, v in enumerate(row.band):
                assert v == want.get(i, 0)

    def test_merc_bounds_invert_rasterize(self, spark):
        zoom, res = 2, 8
        ras = spark.createDataFrame(
            [(1, 2, 3, 4, 1)], "x long, y long, px long, py long, cnt long")
        rect = rect_merc_bounds(vectorize_raster(ras), zoom, res).collect()[0]
        # the rect center must rasterize back to the same cell
        cx, cy = (rect.mx0 + rect.mx1) / 2, (rect.my0 + rect.my1) / 2
        pts = spark.createDataFrame([(0, cx, cy)],
                                    "pid long, mx double, my double")
        back = rasterize_points(pts, zoom, res).collect()[0]
        assert (back.x, back.y, back.px, back.py) == (1, 2, 3, 4)


class TestRasterToMvt:
    def test_wkb_rects_flow_through_engine(self, spark):
        """raster -> vector -> axis-rect WKB -> cover -> geometry_stage:
        the rect features take the engine's closed-form fast path and
        land on the tiles their mercator bounds cover."""
        from tileigi_spark.engine import (cover_metatiles, geometry_stage,
                                          with_bbox)
        from tileigi_spark.geom.wkb import wkb_to_geom

        zoom, res = 2, 8
        pts = _points(spark, n=400, seed=31)
        ras = rasterize_points(pts, zoom=zoom, res=res)
        rects = vectorize_raster(ras, threshold=2)
        feats = rects_to_wkb(rects, zoom=zoom, res=res)
        n_rects = rects.count()
        assert feats.count() == n_rects
        # WKB decodes to the exact mercator bounds
        bounds = {(round(r.mx0, 6), round(r.my0, 6),
                   round(r.mx1, 6), round(r.my1, 6))
                  for r in rect_merc_bounds(rects, zoom, res).collect()}
        for row in feats.collect():
            geom = wkb_to_geom(bytearray(row.way))
            ring = geom[1][0]
            xs = [p[0] for p in ring]
            ys = [p[1] for p in ring]
            key = (round(min(xs), 6), round(min(ys), 6),
                   round(max(xs), 6), round(max(ys), 6))
            assert key in bounds
        pieces = geometry_stage(
            cover_metatiles(with_bbox(feats), [zoom], buffer_px=0),
            "ras", buffer_px=0, global_maxzoom=14)
        assert pieces.count() >= n_rects

    @pytest.mark.parametrize("threshold", [1, 3])
    def test_threshold_monotone(self, spark, threshold):
        pts = _points(spark, n=500, seed=41)
        ras = rasterize_points(pts, zoom=1, res=8)
        n_cells = ras.filter(F.col("cnt") >= threshold).count()
        rects = vectorize_raster(ras, threshold=threshold)
        assert rects.agg(F.sum("cells")).collect()[0][0] == (
            n_cells if n_cells else None)
