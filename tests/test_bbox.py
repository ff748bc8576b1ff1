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
