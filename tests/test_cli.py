"""CLI end-to-end: config file -> sources -> TileStore -> resume ->
MBTiles/TileJSON export (entry point 1, bin/tileigi.rs:21-135)."""

import json
import sqlite3

from tileigi_spark.cli import main as cli_main
from tileigi_spark.fixtures import features_df


def test_cli_end_to_end(spark, tmp_path):
    src = str(tmp_path / "features")
    features_df(spark, 60).write.parquet(src)

    cfg = tmp_path / "layers.yml"
    cfg.write_text("""
minzoom: 0
maxzoom: 14
name: cli-test
Layer:
  - id: base
    properties: {minzoom: 0, maxzoom: 14, buffer-size: 2}
    Datasource: {table: feats}
""")
    dest = str(tmp_path / "store")
    mb = str(tmp_path / "out.mbtiles")
    tj = str(tmp_path / "metadata.json")

    cli_main(["--config", str(cfg), "--source", f"feats={src}",
              "--dest", dest, "--minzoom", "0", "--maxzoom", "2",
              "--mbtiles", mb, "--tilejson", tj])

    from tileigi_spark.io import TileStore
    store = TileStore(dest)
    tiles = store.read_tiles(spark)
    n1 = tiles.count()
    assert n1 > 0
    done = store.done_keys(spark)
    assert done.count() == n1

    con = sqlite3.connect(mb)
    assert con.execute("select count(*) from map").fetchone()[0] == n1
    meta = dict(con.execute("select name, value from metadata").fetchall())
    assert meta["format"] == "pbf"

    doc = json.loads((tmp_path / "metadata.json").read_text())
    assert doc["vector_layers"][0]["id"] == "base"

    # resume: rerun with --if-not-exists adds nothing
    cli_main(["--config", str(cfg), "--source", f"feats={src}",
              "--dest", dest, "--minzoom", "0", "--maxzoom", "2",
              "--if-not-exists"])
    assert store.read_tiles(spark).count() == n1
    assert store.done_keys(spark).count() == n1
