"""Sinks + checkpoint/resume (reference fileio.rs, lib.rs:265-281 S11).

Primary sink is a table written through `TileStore`, which abstracts the
catalog: in production this is an Iceberg table (`spark.table`/`writeTo`),
in the sandbox (no Iceberg jars baked in) a parquet path with identical
semantics. The checkpoint protocol is storage-agnostic: finished tile keys
are appended after each zoom-batch commit and anti-joined on restart — a
distributed version of the reference's does_metatile_exist file probe
(fileio.rs:62-66).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class TileStore:
    """Content-addressed tile storage: `map` (zoom,x,y,tile_id) +
    `images` (tile_id, tile_data) — the MBTiles schema's normalization
    (mbtiles-schema.sql:5-83) expressed as two tables, so identical
    (e.g. ocean) tiles are stored once (O12)."""

    def __init__(self, base_path: str, use_iceberg: bool = False):
        self.base = base_path
        self.use_iceberg = use_iceberg

    def _write(self, df: DataFrame, name: str, mode: str = "append",
               partition_cols=()):
        if self.use_iceberg:
            w = df.writeTo(f"{self.base}.{name}")
            (w.createOrReplace() if mode == "overwrite" else w.append())
        else:
            w = df.write.mode(mode)
            if partition_cols:
                w = w.partitionBy(*partition_cols)
            w.parquet(os.path.join(self.base, name))

    def _read(self, spark: SparkSession, name: str) -> DataFrame | None:
        if self.use_iceberg:
            return spark.table(f"{self.base}.{name}")
        path = os.path.join(self.base, name)
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def write_tiles(self, tiles: DataFrame, dedup: bool = True):
        """tiles: (zoom,x,y,tile,tile_md5)."""
        mapping = tiles.select("zoom", "x", "y",
                               F.col("tile_md5").alias("tile_id"))
        self._write(mapping, "map", partition_cols=("zoom",))
        images = tiles.select(F.col("tile_md5").alias("tile_id"),
                              F.col("tile").alias("tile_data"))
        if dedup:
            images = images.dropDuplicates(["tile_id"])
        self._write(images, "images")

    def read_tiles(self, spark: SparkSession) -> DataFrame | None:
        """Duplicate (zoom,x,y) map rows and duplicate tile_id image rows
        can exist after a crash between a tile write and its checkpoint
        mark; tiles are content-addressed and deterministic, so keeping
        any one copy is correct."""
        m = self._read(spark, "map")
        i = self._read(spark, "images")
        if m is None or i is None:
            return None
        return (m.dropDuplicates(["zoom", "x", "y"])
                .join(i.dropDuplicates(["tile_id"]), on="tile_id")
                .select("zoom", "x", "y",
                        F.col("tile_data").alias("tile"),
                        F.col("tile_id").alias("tile_md5")))

    # --------------------------------------------------------- staging

    def write_staging(self, tiles: DataFrame, zoom: int):
        """Materialize one zoom batch exactly once (single pass over the
        expensive build plan). Replaces the old tiles.cache(): gigabytes
        of gzipped tile bytes do not belong in executor storage memory at
        scale — they belong on disk, where the two derive scans (map keys
        + deduped images) read them back columnar."""
        self._write(tiles, f"staging_z{zoom}", mode="overwrite")

    def read_staging(self, spark: SparkSession, zoom: int) -> DataFrame | None:
        return self._read(spark, f"staging_z{zoom}")

    def drop_staging(self, zoom: int, spark: SparkSession | None = None):
        """Reclaim the zoom batch's staging data after commit. On the
        iceberg path the table is DROPped (PURGE reclaims data files);
        without this, staging_z{zoom} tables accumulate one batch of
        gigabytes per zoom per run indefinitely."""
        if self.use_iceberg:
            spark = spark or SparkSession.getActiveSession()
            if spark is not None:
                spark.sql(
                    f"DROP TABLE IF EXISTS {self.base}.staging_z{zoom} PURGE")
        else:
            import shutil
            shutil.rmtree(os.path.join(self.base, f"staging_z{zoom}"),
                          ignore_errors=True)

    # ------------------------------------------------------ checkpointing

    def done_keys(self, spark: SparkSession) -> DataFrame | None:
        """Finished (zoom,x,y) keys for the resume anti-join (S11)."""
        df = self._read(spark, "checkpoint")
        if df is None:
            return None
        return df.select("zoom", "x", "y")

    def mark_done(self, keys: DataFrame):
        self._write(keys.select("zoom", "x", "y"), "checkpoint")

    def append_metrics(self, spark: SparkSession, rows: list[dict]):
        """Per-stage lineage/metrics rows (A3): run_id, stage, zoom batch,
        row counts, wall seconds."""
        if not rows:
            return
        df = spark.createDataFrame(
            [(r.get("run_id", ""), r.get("stage", ""), int(r.get("zoom", -1)),
              int(r.get("rows", 0)), float(r.get("secs", 0.0)),
              json.dumps(r.get("extra", {})))
             for r in rows],
            "run_id string, stage string, zoom int, rows long, secs double, "
            "extra string")
        self._write(df, "metrics")


def run_pyramid_with_checkpoint(spark: SparkSession, store: TileStore,
                                build_fn, zooms: list[int],
                                run_id: str = "run") -> None:
    """Resumable driver loop: per zoom-batch, anti-join finished keys,
    build, stage the batch to storage in ONE pass, then derive the map/
    images writes and the checkpoint keys FROM the staged table (never
    from a re-execution or an executor-memory cache of tile bytes). The
    checkpoint append is last, so a crash anywhere re-renders at most one
    batch; duplicate rows from the crash window are collapsed by
    read_tiles (content-addressed tiles make any copy correct)."""
    import time

    done = store.done_keys(spark)
    for zoom in zooms:
        t0 = time.time()
        tiles = build_fn(zoom, done)
        if tiles is None:
            continue
        store.write_staging(tiles, zoom)
        staged = store.read_staging(spark, zoom)
        n = 0 if staged is None else staged.count()
        if n:
            store.write_tiles(staged)
            store.mark_done(staged.select("zoom", "x", "y"))
        store.append_metrics(spark, [{
            "run_id": run_id, "stage": "pyramid", "zoom": zoom,
            "rows": n, "secs": time.time() - t0,
        }])
        store.drop_staging(zoom, spark)
        done = store.done_keys(spark)


# ------------------------------------------------------------- exporters

def export_mbtiles(tiles_rows, path: str, metadata: dict | None = None):
    """Driver-side MBTiles writer following the reference DDL
    (mbtiles-schema.sql:5-83; fileio.rs:96-197): `map` + `images` joined by
    the `tiles` view, TMS y-flip (fileio.rs:138), md5-keyed blob dedup,
    one transaction."""
    import hashlib
    import sqlite3

    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.executescript("""
        CREATE TABLE IF NOT EXISTS map (
           zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER,
           tile_id TEXT, grid_id TEXT );
        CREATE TABLE IF NOT EXISTS grid_key (grid_id TEXT, key_name TEXT);
        CREATE TABLE IF NOT EXISTS keymap (key_name TEXT, key_json TEXT);
        CREATE TABLE IF NOT EXISTS grid_utfgrid (grid_id TEXT, grid_utfgrid BLOB);
        CREATE TABLE IF NOT EXISTS images (tile_data blob, tile_id text);
        CREATE TABLE IF NOT EXISTS metadata (name text, value text);
        CREATE UNIQUE INDEX IF NOT EXISTS map_index ON map
            (zoom_level, tile_column, tile_row);
        CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id);
        CREATE UNIQUE INDEX IF NOT EXISTS name ON metadata (name);
        CREATE VIEW IF NOT EXISTS tiles AS
            SELECT map.zoom_level AS zoom_level,
                   map.tile_column AS tile_column,
                   map.tile_row AS tile_row,
                   images.tile_data AS tile_data
            FROM map JOIN images ON images.tile_id = map.tile_id;
    """)
    seen = set()
    for row in tiles_rows:
        z, x, y, tile = row["zoom"], row["x"], row["y"], bytes(row["tile"])
        try:
            tile_id = row["tile_md5"]
        except (KeyError, ValueError, IndexError):
            tile_id = None
        tile_id = tile_id or hashlib.md5(tile).hexdigest()
        tms_y = (1 << z) - y - 1  # fileio.rs:138
        if tile_id not in seen:
            seen.add(tile_id)
            cur.execute(
                "INSERT OR IGNORE INTO images (tile_id, tile_data) VALUES (?, ?)",
                (tile_id, tile))
        cur.execute(
            "INSERT OR REPLACE INTO map (zoom_level, tile_column, tile_row,"
            " tile_id, grid_id) VALUES (?, ?, ?, ?, NULL)",
            (z, x, tms_y, tile_id))
    for k, v in (metadata or {}).items():
        cur.execute("INSERT OR REPLACE INTO metadata (name, value)"
                    " VALUES (?, ?)", (k, str(v)))
    con.commit()
    con.close()


def _xyz_to_mt_path(z: int, x: int, y: int, ext: str = "meta") -> str:
    """ModTile path hashing (fileio.rs:297-325): nibble-interleaved
    5-level directory layout z/a/b/c/d/e.meta."""
    parts = []
    for _ in range(5):
        parts.append(((x & 0x0F) << 4) | (y & 0x0F))
        x >>= 4
        y >>= 4
    e, d, c, b, a = parts
    return f"{z}/{a}/{b}/{c}/{d}/{e}.{ext}"


def export_modtile(tiles_rows, base_dir: str, metatile_scale: int = 8):
    """ModTile 8x8 binary metatile files (fileio.rs:199-294): 'META' magic
    + count + x,y,z + little-endian offset/size table + blobs. Tiles are
    grouped into metatiles driver-side (index i = (x-x0)*size + (y-y0),
    fileio.rs:245); missing tiles get zero-length slots."""
    import struct
    from collections import defaultdict

    groups = defaultdict(dict)
    for row in tiles_rows:
        z, x, y = row["zoom"], row["x"], row["y"]
        size = min(metatile_scale, 1 << z)
        mx, my = (x // size) * size, (y // size) * size
        groups[(z, mx, my, size)][(x, y)] = bytes(row["tile"])

    for (z, mx, my, size), tiles in groups.items():
        n = size * size
        blobs = [b""] * n
        for (x, y), data in tiles.items():
            blobs[(x - mx) * size + (y - my)] = data
        header = b"META" + struct.pack("<IIII", n, mx, my, z)
        offsets = []
        cur = 4 + 4 + 12 + 8 * n
        for blob in blobs:
            offsets.append((cur, len(blob)))
            cur += len(blob)
        path = os.path.join(base_dir, _xyz_to_mt_path(z, mx, my))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(header)
            for off, sz in offsets:
                f.write(struct.pack("<II", off, sz))
            for blob in blobs:
                f.write(blob)


def export_tilestash(tiles_rows, base_dir: str, ext: str = "pbf"):
    """TileStash directory layout z/x/y.pbf (fileio.rs:73-94)."""
    for row in tiles_rows:
        z, x, y = row["zoom"], row["x"], row["y"]
        d = os.path.join(base_dir, str(z), str(x))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{y}.{ext}"), "wb") as f:
            f.write(bytes(row["tile"]))


def write_tilejson(layers, path: str, prop_types: dict[str, dict] | None = None):
    """TileJSON 2.2.0 metadata with per-layer field dicts (lib.rs:371-458)."""
    vector_layers = []
    for layer in layers.layers:
        fields = {}
        for name, typ in (prop_types or {}).get(layer.id, {}).items():
            fields[name] = typ
        vector_layers.append({
            "id": layer.id,
            "minzoom": layer.minzoom,
            "maxzoom": min(layer.maxzoom, layers.global_maxzoom),
            "fields": fields,
        })
    doc = {
        "tilejson": "2.2.0",
        "scheme": "xyz",
        "format": "pbf",
        "minzoom": layers.global_minzoom,
        "maxzoom": layers.global_maxzoom,
        "vector_layers": vector_layers,
    }
    if layers.name:
        doc["name"] = layers.name
    if layers.bounds:
        doc["bounds"] = list(layers.bounds)
    if layers.center:
        doc["center"] = list(layers.center)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)


def tiles_to_geojson(tiles_rows, base_dir: str):
    """Debug GeoJSON dump (reference lib.rs:889-971 geom_as_geojson /
    write_geojson): one z/x/y.geojson FeatureCollection per tile. Tile
    bytes are decoded back to features, properties restored from the
    layer key/value tables, and tile-local integer coords mapped to
    lon/lat with the ported x_to_lon/y_to_lat helpers (lib.rs:870-887)
    applied at global extent 4096*2^z. Driver-side like the reference's
    stdout dumps — a debugging surface, not a sink."""
    from .geom.mvt import decode_tile, decode_geometry
    from .mercator import x_to_lon, y_to_lat

    for row in tiles_rows:
        z, x, y = row["zoom"], row["x"], row["y"]
        world = 4096.0 * (1 << z)
        ox, oy = x * 4096, y * 4096

        def ll(pt):
            return [x_to_lon(ox + pt[0], world), y_to_lat(oy + pt[1], world)]

        def conv(geom):
            typ, data = geom
            if typ == "Point":
                return {"type": typ, "coordinates": ll(data)}
            if typ in ("MultiPoint", "LineString"):
                return {"type": typ, "coordinates": [ll(p) for p in data]}
            if typ in ("MultiLineString", "Polygon"):
                return {"type": typ,
                        "coordinates": [[ll(p) for p in part]
                                        for part in data]}
            return {"type": typ,
                    "coordinates": [[[ll(p) for p in r] for r in rings]
                                    for rings in data]}

        features = []
        for layer in decode_tile(bytes(row["tile"])):
            for ftype, tags, geom_payload, fid in layer["features"]:
                props = {"$layer": layer["name"]}
                for i in range(0, len(tags), 2):
                    v = layer["values"][tags[i + 1]]
                    if isinstance(v, tuple):  # ("f32", value)
                        v = v[1]
                    props[layer["keys"][tags[i]]] = v
                features.append({
                    "type": "Feature", "properties": props,
                    "geometry": conv(decode_geometry(ftype, geom_payload)),
                })
        d = os.path.join(base_dir, str(z), str(x))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{y}.geojson"), "w") as f:
            json.dump({"type": "FeatureCollection", "features": features},
                      f)
