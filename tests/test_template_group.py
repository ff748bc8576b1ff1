"""The SQL-template zoom-grouping rewrite (engine._covered_for) must be
invisible in the tiles: grouping zooms whose resolved source plans are
identical may change the union's branch structure but never a byte of
any tile (canonical encode order is partitioning- and branch-order-
independent)."""

import os

from tileigi_spark.config import Layer, Layers
from tileigi_spark.engine import build_tiles
from tileigi_spark.fixtures import features_df


def _tiles_md5(spark, n_feats=40):
    feats = features_df(spark, n_feats)
    feats.createOrReplaceTempView("tgrp_feats")
    layers = Layers(layers=[
        Layer(id="base", source="tgrp_feats", minzoom=0, maxzoom=14,
              buffer=2,
              sql=("SELECT * FROM tgrp_feats "
                   "WHERE !zoom! >= 2 OR feature_id % 2 = 0")),
    ], global_maxzoom=14)
    tiles = build_tiles(spark, {"tgrp_feats": feats}, layers, 0, 3)
    return sorted((r["zoom"], r["x"], r["y"], r["tile_md5"])
                  for r in tiles.collect())


def test_template_zoom_grouping_byte_invariant(spark):
    grouped = _tiles_md5(spark)
    os.environ["TILEIGI_SQL_ZOOM_GROUP"] = "0"
    try:
        ungrouped = _tiles_md5(spark)
    finally:
        os.environ.pop("TILEIGI_SQL_ZOOM_GROUP", None)
    assert grouped == ungrouped
    assert len(grouped) > 0
