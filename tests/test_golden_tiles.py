"""Golden tile bytes (FIXTURES.md §5): md5s of a fixed set of tiles over
the deterministic fixture, pinned to a committed golden file. Catches any
unintended semantic change in the geometry core or encoder; determinism
across parallelism is asserted separately (test_engine_e2e)."""

import json
import os

import pytest

from tileigi_spark.config import Layer, Layers
from tileigi_spark.engine import build_tiles
from tileigi_spark.fixtures import features_df

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "tiles_z0_4.json")

LAYERS = Layers(layers=[
    Layer(id="base", source="features", minzoom=0, maxzoom=14, buffer=2),
    Layer(id="low", source="features", minzoom=0, maxzoom=3, buffer=0),
], global_minzoom=0, global_maxzoom=14)


def _build_md5s(spark):
    feats = features_df(spark, 120)
    tiles = build_tiles(spark, {"features": feats}, LAYERS, 0, 4)
    return {f"{r['zoom']}/{r['x']}/{r['y']}": r["tile_md5"]
            for r in tiles.collect()}


def test_golden_tiles(spark):
    got = _build_md5s(spark)
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=0, sort_keys=True)
        pytest.skip("golden file generated; rerun to verify")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert got == golden, (
        "tile bytes changed vs committed golden — if intentional, delete "
        f"{GOLDEN_PATH} and rerun to regenerate")
