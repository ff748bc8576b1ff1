"""Pure-numpy S2 cell ids (tileigi_spark/s2.py).

No S2 library exists in this container, so correctness is pinned by the
structural invariants that uniquely characterize the cell model —
Hilbert adjacency, parent-prefix containment, pos<->ij inversion, curve
endpoints, face-center ids, lat/lng roundtrip — plus bit-for-bit parity
between the numpy kernel and the generated DuckDB SQL ladder
(s2_pos_sql), which the driver's `s2_cells` oracle re-checks per round.
"""

import numpy as np
import pytest

from tileigi_spark.s2 import (
    KIJ_TO_POS,
    KPOS_TO_IJ,
    cell_center_latlng,
    cell_id,
    cell_id_level,
    cell_id_parent,
    cell_id_to_face_pos,
    cell_range,
    face_ij_to_pos,
    face_uv_to_xyz,
    latlng_to_cell,
    latlng_to_xyz,
    pos_to_ij,
    s2_pos_sql,
    st_to_ij,
    st_to_uv,
    uv_to_st,
    xyz_to_face_uv,
)


class TestTables:
    def test_pos_ij_tables_are_inverses(self):
        for o in range(4):
            for pos in range(4):
                assert KIJ_TO_POS[o][KPOS_TO_IJ[o][pos]] == pos

    def test_each_row_is_a_permutation(self):
        for o in range(4):
            assert sorted(KPOS_TO_IJ[o]) == [0, 1, 2, 3]


class TestHilbert:
    @pytest.mark.parametrize("level", [1, 2, 3, 5, 6])
    def test_adjacency_every_face(self, level):
        """THE Hilbert property: consecutive positions are edge-adjacent
        cells. Any wrong table entry or orientation update breaks it."""
        for f in range(6):
            pos = np.arange(4 ** level)
            i, j = pos_to_ij(np.full_like(pos, f), pos, level)
            d = np.abs(np.diff(i)) + np.abs(np.diff(j))
            assert np.all(d == 1), f"face {f} level {level}"

    @pytest.mark.parametrize("level", [2, 4])
    def test_pos_is_a_bijection(self, level):
        n = 1 << level
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        for f in (0, 1):
            pos = face_ij_to_pos(np.full(ii.size, f),
                                 ii.ravel(), jj.ravel(), level)
            assert len(np.unique(pos)) == n * n

    def test_pos_ij_roundtrip(self):
        rng = np.random.default_rng(0)
        f = rng.integers(0, 6, 2000)
        i = rng.integers(0, 1 << 14, 2000)
        j = rng.integers(0, 1 << 14, 2000)
        pos = face_ij_to_pos(f, i, j, 14)
        i2, j2 = pos_to_ij(f, pos, 14)
        assert np.array_equal(i, i2) and np.array_equal(j, j2)

    def test_parent_prefix_containment(self):
        """Dropping the last two pos bits gives the parent's pos — the
        property that makes cell-id ranges hierarchical."""
        rng = np.random.default_rng(1)
        f = rng.integers(0, 6, 2000)
        i = rng.integers(0, 1 << 12, 2000)
        j = rng.integers(0, 1 << 12, 2000)
        assert np.array_equal(face_ij_to_pos(f, i, j, 12) >> 2,
                              face_ij_to_pos(f, i >> 1, j >> 1, 11))

    @pytest.mark.parametrize("level", [1, 3, 5])
    def test_curve_endpoints(self, level):
        """Canonical orientation starts at (0,0), ends at (2^L-1, 0);
        swapped orientation (odd faces) ends at (0, 2^L-1)."""
        n = 1 << level
        for f, end in ((0, (n - 1, 0)), (1, (0, n - 1))):
            i0, j0 = pos_to_ij(np.array([f]), np.array([0]), level)
            i1, j1 = pos_to_ij(np.array([f]), np.array([4 ** level - 1]),
                               level)
            assert (i0[0], j0[0]) == (0, 0)
            assert (i1[0], j1[0]) == end


class TestProjection:
    def test_uv_st_roundtrip(self):
        u = np.linspace(-1, 1, 4001)
        assert np.allclose(st_to_uv(uv_to_st(u)), u, atol=1e-15)

    def test_st_range(self):
        u = np.linspace(-1, 1, 101)
        s = uv_to_st(u)
        assert s.min() == 0.0 and s.max() == 1.0
        assert np.all(np.diff(s) > 0)  # monotone

    def test_face_uv_xyz_roundtrip(self):
        rng = np.random.default_rng(2)
        v = rng.normal(size=(3, 3000))
        v /= np.linalg.norm(v, axis=0)
        face, u, w = xyz_to_face_uv(*v)
        assert np.all((face >= 0) & (face < 6))
        assert np.all(np.abs(u) <= 1 + 1e-12)
        x, y, z = face_uv_to_xyz(face, u, w)
        n = np.sqrt(x * x + y * y + z * z)
        assert np.allclose(np.stack([x, y, z]) / n, v, atol=1e-12)


class TestCellId:
    def test_face_center_level0_ids(self):
        lats = np.array([0.0, 0, 90, 0, 0, -90])
        lngs = np.array([0.0, 90, 0, 180, -90, 0])
        ids = latlng_to_cell(lats, lngs, 0)
        want = np.array([(2 * f + 1) << 60 for f in range(6)],
                        dtype=np.uint64).view(np.int64)
        assert np.array_equal(ids, want)

    def test_level_decode_and_face_pos_roundtrip(self):
        rng = np.random.default_rng(3)
        lat = (rng.random(500) - 0.5) * 170
        lng = (rng.random(500) - 0.5) * 360
        for level in (0, 7, 16, 30):
            ids = latlng_to_cell(lat, lng, level)
            assert np.all(cell_id_level(ids) == level)
            f, p = cell_id_to_face_pos(ids, level)
            assert np.array_equal(cell_id(f, p, level), ids)

    def test_center_roundtrip(self):
        rng = np.random.default_rng(4)
        lat = (rng.random(3000) - 0.5) * 170
        lng = (rng.random(3000) - 0.5) * 360
        level = 16
        ids = latlng_to_cell(lat, lng, level)
        clat, clng = cell_center_latlng(ids, level)
        # one level-16 cell is <= ~0.006 deg across
        assert np.abs(clat - lat).max() < 0.005
        dlng = np.abs((clng - lng + 180) % 360 - 180)
        assert (dlng * np.cos(np.radians(lat))).max() < 0.005

    def test_same_leaf_same_id(self):
        lat = np.array([10.000000001, 10.000000002])
        lng = np.array([20.000000001, 20.000000002])
        ids = latlng_to_cell(lat, lng, 12)
        assert ids[0] == ids[1]

    def test_poles_and_antimeridian(self):
        ids = latlng_to_cell(np.array([90.0, -90.0, 0.0, 0.0]),
                             np.array([13.0, 77.0, 180.0, -180.0]), 10)
        f, _ = cell_id_to_face_pos(ids, 10)
        assert f[0] == 2 and f[1] == 5
        # +/-180 is the same meridian: sin(+/-pi) differs by ~1e-16 so the
        # two points may straddle the cell boundary — centers must agree
        # to within one level-10 cell (~0.1 deg)
        clat, clng = cell_center_latlng(ids[2:], 10)
        assert f[2] == 3 and f[3] == 3
        assert abs(clat[0] - clat[1]) < 0.2
        assert abs((clng[0] - clng[1] + 180) % 360 - 180) < 0.2


class TestHierarchy:
    def test_parent_equals_direct_computation(self):
        rng = np.random.default_rng(7)
        lat = (rng.random(1500) - 0.5) * 170
        lng = (rng.random(1500) - 0.5) * 360
        ids12 = latlng_to_cell(lat, lng, 12)
        for pl in (0, 4, 6, 11, 12):
            assert np.array_equal(cell_id_parent(ids12, 12, pl),
                                  latlng_to_cell(lat, lng, pl))

    def test_parent_level_decodes(self):
        ids = latlng_to_cell(np.array([10.0, -40.0]), np.array([5.0, 99.0]),
                             20)
        p = cell_id_parent(ids, 20, 8)
        assert np.all(cell_id_level(p) == 8)

    def test_parent_above_level_raises(self):
        ids = latlng_to_cell(np.array([1.0]), np.array([1.0]), 5)
        with pytest.raises(ValueError):
            cell_id_parent(ids, 5, 6)

    def test_range_contains_exactly_the_descendants(self):
        rng = np.random.default_rng(8)
        lat = (rng.random(2000) - 0.5) * 170
        lng = (rng.random(2000) - 0.5) * 360
        child = latlng_to_cell(lat, lng, 14)
        parent = cell_id_parent(child, 14, 6)
        for k in range(0, 2000, 400):
            lo, hi = cell_range(parent[k:k + 1])
            inside = (child >= lo[0]) & (child <= hi[0])
            same = parent == parent[k]
            assert np.array_equal(inside, same), (
                "signed BETWEEN must select exactly the descendants")

    def test_range_width_matches_level(self):
        ids = latlng_to_cell(np.array([33.0]), np.array([-120.0]), 10)
        lo, hi = cell_range(ids)
        # a level-10 cell contains 4^20 leaves, each 2 id-units apart
        assert int(hi[0]) - int(lo[0]) == 2 * (4 ** 20) - 2

    def test_face4_range_stays_signed_consistent(self):
        # face 4 ids are negative in the signed view; the range must not
        # wrap across the sign boundary
        ids = latlng_to_cell(np.array([0.0]), np.array([-90.0]), 3)
        f, _ = cell_id_to_face_pos(ids, 3)
        assert f[0] == 4
        lo, hi = cell_range(ids)
        assert lo[0] < hi[0] < 0


class TestSqlParity:
    def test_duckdb_ladder_matches_numpy_bit_for_bit(self):
        import duckdb

        base = """
        SELECT doc_id AS key, doc_id % 6 AS face,
          CAST((doc_id * 7919) % 100000 AS DOUBLE) / 100000.0 * 2.0 - 1.0 AS u,
          CAST((doc_id * 104729) % 100000 AS DOUBLE) / 100000.0 * 2.0 - 1.0 AS v
        FROM range(0, 4000) t(doc_id)
        """
        rows = duckdb.sql(s2_pos_sql(12, base) + " ORDER BY key").fetchnumpy()
        doc = np.arange(4000, dtype=np.int64)
        face = doc % 6
        u = (doc * 7919 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
        v = (doc * 104729 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
        i = st_to_ij(uv_to_st(u), 12)
        j = st_to_ij(uv_to_st(v), 12)
        pos = face_ij_to_pos(face, i, j, 12)
        assert np.array_equal(rows["i"], i)
        assert np.array_equal(rows["j"], j)
        assert np.array_equal(rows["pos"], pos)
        assert np.array_equal(rows["cell_id"].astype(np.int64),
                              cell_id(face, pos, 12))


class TestSparkColumns:
    def test_s2_cell_col_matches_kernel(self, spark):
        rng = np.random.default_rng(5)
        lat = (rng.random(300) - 0.5) * 170
        lng = (rng.random(300) - 0.5) * 360
        df = spark.createDataFrame(
            [(int(k), float(a), float(o))
             for k, (a, o) in enumerate(zip(lat, lng))],
            "k long, lat double, lng double")
        from tileigi_spark.s2 import s2_cell_col
        got = {r.k: r.cell for r in df.select(
            "k", s2_cell_col(df.lat, df.lng, 12).alias("cell")).collect()}
        want = latlng_to_cell(lat, lng, 12)
        assert all(got[k] == int(want[k]) for k in range(300))

    def test_s2_join_groups_are_spatially_tight(self, spark):
        """Drop-in join-key check: points sharing a level-8 cell are
        within the cell diagonal of its center."""
        from pyspark.sql import functions as F

        from tileigi_spark.s2 import s2_cell_col

        rng = np.random.default_rng(6)
        lat = (rng.random(2000) - 0.5) * 120
        lng = (rng.random(2000) - 0.5) * 300
        df = spark.createDataFrame(
            [(float(a), float(o)) for a, o in zip(lat, lng)],
            "lat double, lng double")
        level = 8
        cells = (df.withColumn("cell", s2_cell_col(df.lat, df.lng, level))
                 .groupBy("cell")
                 .agg(F.min("lat").alias("lat0"), F.max("lat").alias("lat1"),
                      F.count("*").alias("n"))
                 .collect())
        assert sum(r.n for r in cells) == 2000
        # a level-8 cell spans <~ 0.8 deg of latitude
        for r in cells:
            assert r.lat1 - r.lat0 < 1.2
