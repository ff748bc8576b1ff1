"""bbox parsing, tile-range math, restricted tile_driver enumeration,
and the empty-zoom build_tiles guard."""

import pytest

from tileigi_spark.mercator import (MERC_MAX, bbox_lonlat_to_merc,
                                    bbox_metatile_range, bbox_tile_range,
                                    parse_bbox)


def test_parse_bbox():
    assert parse_bbox("-10,-20,30.5,40") == (-10.0, -20.0, 30.5, 40.0)
    for bad in ("", "1,2,3", "a,b,c,d", "10,0,-10,20", "0,50,10,40",
                "-190,0,0,10", "0,0,0,10", "0,-95,10,95"):
        with pytest.raises(ValueError):
            parse_bbox(bad)


def test_bbox_tile_range_world():
    merc = (-MERC_MAX, -MERC_MAX, MERC_MAX, MERC_MAX)
    assert bbox_tile_range(merc, 0) == (0, 0, 0, 0)
    # max edge clamps into the last tile
    assert bbox_tile_range(merc, 3) == (0, 0, 7, 7)


def test_bbox_tile_range_quadrant():
    # west half / north half only
    merc = (-MERC_MAX, 1.0, -1.0, MERC_MAX)
    x0, y0, x1, y1 = bbox_tile_range(merc, 3)
    assert (x0, y0) == (0, 0)
    assert x1 == 3  # -1.0 merc is just west of the x midline
    assert y1 == 3


def test_bbox_metatile_range():
    merc = bbox_lonlat_to_merc((-10.0, -10.0, 10.0, 10.0))
    # z <= 3: whole world is one metatile
    assert bbox_metatile_range(merc, 2) == (0, 0, 0, 0)
    mx0, my0, mx1, my1 = bbox_metatile_range(merc, 6)
    tx0, ty0, tx1, ty1 = bbox_tile_range(merc, 6)
    assert (mx0, my0, mx1, my1) == (tx0 // 8, ty0 // 8, tx1 // 8, ty1 // 8)


def test_tile_driver_range(spark):
    from tileigi_spark.engine import tile_driver

    keys = {(r["x"], r["y"]) for r in
            tile_driver(spark, 4, (2, 5, 4, 7)).collect()}
    assert keys == {(x, y) for x in range(2, 5) for y in range(5, 8)}
    assert tile_driver(spark, 2).count() == 16


def test_build_tiles_empty_zoom(spark):
    """No layer covering the zoom -> empty tiles DataFrame, not a crash."""
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles
    from tileigi_spark.fixtures import features_df

    layers = Layers(layers=[Layer(id="base", source="feats", minzoom=5,
                                  maxzoom=10)])
    tiles = build_tiles(spark, {"feats": features_df(spark, 10)},
                        layers, 0, 0)
    assert tiles.count() == 0
    assert [f.name for f in tiles.schema.fields] == \
        ["zoom", "x", "y", "tile", "tile_md5"]


def _two_far_points(spark):
    from tileigi_spark.geom.wkb import geom_to_wkb
    from tileigi_spark.mercator import lonlat_to_merc

    rows = []
    for i, (lon, lat) in enumerate([(20.0, 20.0), (-150.0, -40.0)]):
        mx, my = lonlat_to_merc(lon, lat)
        rows.append((i, bytearray(geom_to_wkb(("Point", (mx, my)))),
                     f"p{i}"))
    return spark.createDataFrame(rows,
                                 "feature_id long, way binary, name string")


def test_bbox_lowzoom_tile_has_world_content(spark):
    """An in-range tile renders its FULL extent: the reference iterates
    the bbox's metatiles and each renders its own padded query bbox
    (lib.rs:186-220 + 543-544), so a z0 tile selected by a city bbox
    still contains the whole world's features. Regression: the feature
    prefilter used to pad the raw bbox instead of the metatile-aligned
    extent, silently dropping far features from low-zoom tiles."""
    import gzip

    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles
    from tileigi_spark.geom.mvt import decode_tile

    df = _two_far_points(spark)
    layers = Layers(layers=[Layer(id="l", source="s", minzoom=0,
                                  maxzoom=14, buffer=2)],
                    global_maxzoom=14)

    def tile_features(bbox):
        rows = build_tiles(spark, {"s": df}, layers, 0, 0,
                           bbox=bbox).collect()
        assert len(rows) == 1
        layers_dec = decode_tile(bytes(rows[0]["tile"]))
        return sum(len(l["features"]) for l in layers_dec)

    assert tile_features(None) == 2
    # bbox around only the first point: the z0 tile must be identical
    assert tile_features((10.0, 10.0, 30.0, 30.0)) == 2


def test_bbox_deep_minzoom_still_prunes(spark):
    """With minzoom deep enough that the aligned extent is small, the
    prefilter stays a real scan pruner: a z8-only bbox render around one
    point excludes the antipodal one."""
    import gzip

    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles
    from tileigi_spark.geom.mvt import decode_tile

    df = _two_far_points(spark)
    layers = Layers(layers=[Layer(id="l", source="s", minzoom=0,
                                  maxzoom=14, buffer=2)],
                    global_maxzoom=14)
    rows = build_tiles(spark, {"s": df}, layers, 8, 8,
                       bbox=(19.0, 19.0, 21.0, 21.0)).collect()
    feats = sum(len(l["features"]) for r in rows
                for l in decode_tile(bytes(r["tile"])))
    assert feats == 1
