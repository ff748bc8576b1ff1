"""Spatial join tests: point-in-polygon (J4) and kNN (J5) against
brute-force oracles computed in pandas."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tileigi_spark.fixtures import admin_polygons_df, make_admin_polygons
from tileigi_spark.spatial import point_in_polygon_join, knn_join, \
    point_in_polygon
from tileigi_spark.geom.wkb import wkb_to_geom
from tileigi_spark.mercator import MERC_MAX


def _point_grid(spark, n):
    """Deterministic points across the world in mercator coords."""
    rows = []
    for i in range(n):
        mx = -MERC_MAX * 0.9 + (i * 7919 % 1000) / 1000.0 * 1.8 * MERC_MAX
        my = -MERC_MAX * 0.7 + (i * 104729 % 1000) / 1000.0 * 1.4 * MERC_MAX
        rows.append((i, mx, my))
    return spark.createDataFrame(rows, "pid long, mx double, my double"), rows


class TestPip:
    def test_matches_bruteforce(self, spark):
        points, prows = _point_grid(spark, 300)
        polys = admin_polygons_df(spark)
        got = point_in_polygon_join(points, polys, index_zoom=5)
        got_pairs = {(r["pid"], r["admin_id"]) for r in got.collect()}

        admin = make_admin_polygons()
        geoms = [(r.admin_id, wkb_to_geom(bytes(r.way)))
                 for r in admin.itertuples(index=False)]
        expected = set()
        for pid, mx, my in prows:
            for aid, g in geoms:
                if point_in_polygon(mx, my, g):
                    expected.add((pid, aid))
        assert got_pairs == expected
        assert len(expected) > 50  # fixture sanity

    def test_hole_excluded(self, spark):
        admin = make_admin_polygons()
        # admin_id 4 has a centered hole
        row = admin[admin.admin_id == 4].iloc[0]
        g = wkb_to_geom(bytes(row.way))
        rings = g[1]
        ext = rings[0]
        cx = (ext[0][0] + ext[2][0]) / 2
        cy = (ext[0][1] + ext[2][1]) / 2
        assert len(rings) == 2
        assert not point_in_polygon(cx, cy, g)  # inside hole -> out
        assert point_in_polygon(ext[0][0] + 10.0, ext[0][1] + 10.0, g)


class TestKnn:
    def test_matches_bruteforce(self, spark):
        queries, qrows = _point_grid(spark, 20)
        queries = queries.select(F.col("pid").alias("query_id"),
                                 F.col("mx").alias("qx"),
                                 F.col("my").alias("qy"))
        cands, crows = _point_grid(spark, 400)
        # shift candidate ids so streams differ
        cands = cands.select((F.col("pid") + 1000).alias("cand_id"),
                             F.col("mx").alias("cx"),
                             F.col("my").alias("cy"))
        k = 3
        got = knn_join(queries, cands, k=k, index_zoom=4)
        got_pairs = {(r["query_id"], r["cand_id"], r["knn_rank"])
                     for r in got.collect()}

        expected = set()
        for qid, qxv, qyv in qrows:
            scored = sorted(
                ((qxv - mx) ** 2 + (qyv - my) ** 2, pid + 1000)
                for pid, mx, my in crows)
            for rank, (_, cid) in enumerate(scored[:k], start=1):
                expected.add((qid, cid, rank))
        assert got_pairs == expected
