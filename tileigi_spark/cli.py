"""spark-submit entry point (reference bin/tileigi.rs:21-135).

Usage:
  spark-submit --py-files tileigi_spark.zip -m tileigi_spark.cli \\
    --config layers.yml --source pages=/path/pages.parquet \\
    --dest /path/tiles_store --minzoom 0 --maxzoom 14 \\
    [--bbox minlon,minlat,maxlon,maxlat] [--no-compress] \\
    [--metatile-scale 8] [--if-not-exists] [--mbtiles out.mbtiles]

Mirrors the reference CLI surface: zoom range, bbox, destination type,
metatile scale, resume (--if-not-exists -> checkpoint anti-join),
compression toggle.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="tileigi-spark")
    p.add_argument("--config", required=True,
                   help="layer config (tm2source YAML or Tegola TOML)")
    p.add_argument("--source", action="append", default=[],
                   metavar="NAME=PATH",
                   help="feature source table: name=parquet_path")
    p.add_argument("--dest", required=True, help="TileStore base path")
    p.add_argument("--minzoom", type=int, default=0)
    p.add_argument("--maxzoom", type=int, default=14)
    p.add_argument("--bbox", default=None,
                   help="minlon,minlat,maxlon,maxlat filter")
    p.add_argument("--metatile-scale", type=int, default=8)
    p.add_argument("--no-compress", action="store_true")
    p.add_argument("--if-not-exists", action="store_true",
                   help="resume: skip tiles already in the checkpoint")
    p.add_argument("--include-empty", action="store_true")
    p.add_argument("--mbtiles", default=None,
                   help="also export an MBTiles file (driver-side)")
    p.add_argument("--tilejson", default=None)
    p.add_argument("--salt-zoom-max", type=int, default=4)
    p.add_argument("--n-salts", type=int, default=16)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from .config import layers_from_file
    from .engine import build_tiles
    from .io import (TileStore, export_mbtiles, run_pyramid_with_checkpoint,
                     write_tilejson)

    owns_session = SparkSession.getActiveSession() is None
    spark = (SparkSession.builder.appName("tileigi-spark")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    layers = layers_from_file(args.config)
    sources = {}
    for s in args.source:
        if "=" not in s:
            p.error(f"--source must be NAME=PATH, got {s!r}")
        name, path = s.split("=", 1)
        sources[name] = spark.read.parquet(path)

    store = TileStore(args.dest)
    zooms = list(range(args.minzoom, args.maxzoom + 1))

    def build_zoom(zoom, done):
        return build_tiles(
            spark, sources, layers, zoom, zoom,
            metatile_scale=args.metatile_scale,
            salt_zoom_max=args.salt_zoom_max, n_salts=args.n_salts,
            compress=not args.no_compress,
            include_empty=args.include_empty,
            done_keys=done if args.if_not_exists else None)

    run_pyramid_with_checkpoint(spark, store, build_zoom, zooms)

    if args.mbtiles:
        tiles = store.read_tiles(spark)
        export_mbtiles(tiles.toLocalIterator(), args.mbtiles,
                       metadata={"name": layers.name or "tileigi-spark",
                                 "format": "pbf",
                                 "minzoom": args.minzoom,
                                 "maxzoom": args.maxzoom})
    if args.tilejson:
        write_tilejson(layers, args.tilejson)

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
