"""Engine scaling across INDEPENDENT executor JVMs (the north rule's
own regime).

The primary scaling table (BENCH/BASELINE.md) measures local[2] vs
local[8] — N threads inside ONE shared JVM, a sandbox stand-in for "N
vs 4N executors". tools/pipeline_ceiling.py showed the Python kernels
scale 0.80-1.0 as independent processes, leaving a ~0.24 gap owned by
the shared single-JVM layer. This tool closes the loop at the ENGINE
level: it runs the whole flagship pyramid — Spark, shuffles, Arrow,
everything — as N completely independent single-core Spark JVMs, each
rendering one longitude strip of the SAME staged input (a real
cluster's executor fleet with a spatial partitioner), at N and 4N
processes, barrier-synchronized, and reports tiles/sec at both widths
plus the scaling efficiency.

Input is staged strip-partitioned per width (README "Scale design":
partition pruning works when the feature table is partitioned/bucketed
by coarse cell — real 100 TB inputs arrive this way), with rows within
the engine's own clip-buffer slack of a strip boundary duplicated into
the neighbor shard so strip tiles stay byte-faithful; each executor
reads ONLY its shard. Sharding is exact on output for every zoom where
a tile is no wider than a strip (z >= log2(N)): each process COUNTS
only tiles it owns under `(x * N) div 2^zoom = i`, a partition of
every zoom's x-axis, so no boundary tile is double-counted and the
summed count equals the single-run pyramid's count. At SHALLOWER zooms
(z < log2(N)) a tile spans multiple whole strips, and its owner emits
it only if the owner's own strip holds at least one of the tile's
(zoom-thinned) features — the measured effect of this at N=8 is one
z2 tile in 650,725 (0.0002%; both close-out reps, deterministic). The
cells mode avoids the issue structurally by running the pyramid from
cell_zoom down (shallower tiles span columns); a production fleet
renders z < log2(N) in a single coordinator pass — at those zooms the
whole planet is fewer tiles than executors.

Usage:
  python tools/bench_executors.py [--procs 2,8] [--replicas 9600]
      [--reps 2] [--maxzoom 10] [--sf /root/testdata/sf0.1]
      [--geo DIR]   # reuse an already-staged (unsharded) geo parquet
      [--cells CZ]  # use the partition.py cell layout instead of strips:
                    # ONE width-independent staged table, each worker
                    # reads its column block via read_cell_partitioned
                    # (exactly-once + render-complete), pyramid runs
                    # z(CZ)..maxzoom (shallower tiles span columns)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUFFER_PX = 2


def _flagship_layers(pyramid_maxzoom: int):
    """The bench flagship layer verbatim (bench.py main): low-zoom
    thinning keyed to the PYRAMID depth (z = maxzoom keeps every
    feature), layer/global maxzoom 14."""
    from tileigi_spark.config import Layer, Layers
    thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({pyramid_maxzoom}"
            f" - zoom))) = 0")
    return Layers(layers=[Layer(id="pages", source="pages", minzoom=0,
                                maxzoom=14, buffer=2, zoom_filter=thin)],
                  global_maxzoom=14)


def _slack() -> float:
    # cover_metatiles' widest feature-prefilter slack (min zoom 0)
    from tileigi_spark.mercator import cover_slack
    return cover_slack(0, BUFFER_PX)


def worker(args):
    """One executor JVM: local[1], one input shard (a longitude strip,
    or a column of cells of the partition.py layout), barrier start."""
    from pyspark.sql import SparkSession, functions as F

    i, w = args.worker, args.nprocs
    spark = (SparkSession.builder.master("local[1]")
             .appName(f"tileigi-exec-{i}of{w}")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from tileigi_spark.engine import build_tiles

    layers = _flagship_layers(args.maxzoom)
    owned = F.expr(f"(x * {w}) div shiftleft(1L, zoom) = {i}")
    if args.cells:
        # cells mode: the worker's territory is a contiguous column
        # block of the cell grid; read_cell_partitioned over that rect
        # is exactly-once AND render-complete for the rect's own tiles
        # at zoom >= cell_zoom (tests/test_partition.py parity suites)
        from tileigi_spark.mercator import MERC_MAX, merc_to_lonlat
        from tileigi_spark.partition import read_cell_partitioned

        cz = args.cells
        ncols = 1 << cz
        span = 2.0 * MERC_MAX / ncols
        c0, c1 = i * ncols // w, (i + 1) * ncols // w - 1
        eps = span * 1e-6  # stay off cell seams: a closed bbox exactly
        # on a boundary would pull the neighbor column's cells/tiles
        rect = (-MERC_MAX + c0 * span + eps, -MERC_MAX + eps,
                -MERC_MAX + (c1 + 1) * span - eps, MERC_MAX - eps)
        feats = read_cell_partitioned(spark, args.geo, bbox_merc=rect,
                                      minzoom=cz)
        lons, lats = merc_to_lonlat([rect[0], rect[2]], [rect[1], rect[3]])
        bbox = (float(lons[0]), float(lats[0]),
                float(lons[1]), float(lats[1]))
        minzoom = cz
    else:
        geo = spark.read.parquet(os.path.join(args.geo, f"strip={i}"))
        feats = bench.pages_to_features(geo)
        lon0 = -180.0 + i * 360.0 / w
        lon1 = -180.0 + (i + 1) * 360.0 / w
        bbox = (lon0, -90.0, lon1, 90.0)
        minzoom = 0

    # warm: JVM JIT + python workers + plan machinery, outside the
    # timed window (the shallow zooms on the shard are a few hundred
    # thinned rows)
    build_tiles(spark, {"pages": feats}, layers, minzoom,
                max(minzoom, 3), shuffle_parts=8, bbox=bbox) \
        .filter(owned).count()

    sync = args.sync
    open(os.path.join(sync, f"ready_{i}"), "w").close()
    go = os.path.join(sync, "go")
    while not os.path.exists(go):
        time.sleep(0.05)

    t0 = time.time()
    tiles = build_tiles(spark, {"pages": feats}, layers, minzoom,
                        args.maxzoom, shuffle_parts=8, bbox=bbox)
    per_zoom = {int(r["zoom"]): int(r["n"]) for r in
                (tiles.filter(owned).groupBy("zoom")
                 .agg(F.count("*").alias("n")).collect())}
    t1 = time.time()
    with open(os.path.join(sync, f"done_{i}"), "w") as f:
        json.dump({"i": i, "n_tiles": sum(per_zoom.values()),
                   "per_zoom": per_zoom, "t0": t0, "t1": t1}, f)
    spark.stop()


def shard_input(geo: str, w: int) -> str:
    """Strip-partition the staged geo for a width-w fleet; rows within
    the clip-buffer slack of a boundary are duplicated into the
    neighbor shard (strip tiles stay byte-faithful to a full run)."""
    import bench
    from pyspark.sql import functions as F
    from tileigi_spark.engine import WORLD
    from tileigi_spark.mercator import MERC_MAX

    out = tempfile.mkdtemp(prefix=f"tileigi_exec_shard_{w}_") + "/geo"
    spark = bench.make_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    geo_df = spark.read.parquet(geo)
    width = WORLD / w
    slack = _slack()
    base = F.floor((F.col("mx") + F.lit(MERC_MAX)) / F.lit(width))
    cand = F.explode(F.array(base - 1, base, base + 1)).alias("strip")
    left = F.lit(-MERC_MAX) + F.col("strip") * F.lit(width)
    t0 = time.time()
    (geo_df.select("*", cand)
     .filter((F.col("strip") >= 0) & (F.col("strip") < w)
             & (F.col("mx") >= left - F.lit(slack))
             & (F.col("mx") <= left + F.lit(width) + F.lit(slack)))
     .write.mode("overwrite").partitionBy("strip").parquet(out))
    n = spark.read.parquet(out).count()
    print(f"sharded w={w} in {time.time() - t0:.1f}s -> {out} "
          f"(rows {n}, overlap dup included)", flush=True)
    spark.stop()
    return out


def run_width(w: int, shard: str, maxzoom: int,
              cells: int | None = None) -> dict:
    if cells is not None and (1 << cells) % w:
        # worker i renders cell columns [i*ncols//w, (i+1)*ncols//w) but
        # counts tiles it OWNS by x-block; with a non-dividing width the
        # owned blocks extend past the rendered columns and the tile
        # count is silently low (main() enforces this for its own
        # widths; direct callers like bench_fleet_ab need it here)
        raise SystemExit(f"cells grid of {1 << cells} columns is not "
                         f"divisible by width {w}")
    sync = tempfile.mkdtemp(prefix=f"tileigi_exec_sync_{w}_")
    procs = []
    for i in range(w):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--nprocs", str(w), "--geo", shard, "--maxzoom", str(maxzoom),
             "--sync", sync]
            + (["--cells", str(cells)] if cells else []),
            cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    deadline = time.time() + 600
    while (sum(os.path.exists(os.path.join(sync, f"ready_{i}"))
               for i in range(w)) < w):
        if time.time() > deadline or any(p.poll() not in (None, 0)
                                         for p in procs):
            for p in procs:
                p.kill()
            raise RuntimeError(f"width {w}: worker died before barrier")
        time.sleep(0.1)
    t_go = time.time()
    open(os.path.join(sync, "go"), "w").close()
    for p in procs:
        p.wait(timeout=3600)
    results = []
    for i in range(w):
        with open(os.path.join(sync, f"done_{i}")) as f:
            results.append(json.load(f))
    wall = max(r["t1"] for r in results) - t_go
    n_total = sum(r["n_tiles"] for r in results)
    per_zoom: dict[int, int] = {}
    for r in results:
        for z, n in r["per_zoom"].items():
            per_zoom[int(z)] = per_zoom.get(int(z), 0) + n
    return {"nprocs": w, "wall_s": round(wall, 2), "n_tiles": n_total,
            "tiles_per_sec": round(n_total / wall, 2),
            "per_zoom": dict(sorted(per_zoom.items())),
            "per_worker_secs": [round(r["t1"] - r["t0"], 2)
                                for r in results]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="2,8")
    ap.add_argument("--replicas", type=int, default=9600)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--maxzoom", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--geo", default=None,
                    help="reuse an already-staged (unsharded) geo dir")
    ap.add_argument("--cells", type=int, default=None,
                    help="use the partition.py cell layout at this cell "
                         "zoom instead of per-width strip shards: ONE "
                         "staged table serves every width (each worker "
                         "reads its column block via "
                         "read_cell_partitioned); pyramid runs "
                         "z(cell_zoom)..maxzoom")
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--sync", default=None)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args)
        return

    widths = [int(x) for x in args.procs.split(",")]
    if args.cells:
        ncols = 1 << args.cells
        bad = [w for w in widths if ncols % w]
        if bad:
            raise SystemExit(f"--cells {args.cells}: widths {bad} do not "
                             f"divide the {ncols}-column grid")
    geo = args.geo
    if geo is None:
        # stage the geotagged page set once at full width
        import bench
        from tileigi_spark.extract import geotag_pages
        spark = bench.make_spark(32)
        spark.sparkContext.setLogLevel("ERROR")
        geo = tempfile.mkdtemp(prefix="tileigi_exec_geo_") + "/geo"
        t0 = time.time()
        pages = bench.synth_pages(spark, args.sf, args.replicas)
        geotag_pages(pages).write.mode("overwrite").parquet(geo)
        print(f"staged geo ({args.replicas} replicas) in "
              f"{time.time() - t0:.1f}s -> {geo}", flush=True)
        spark.stop()

    if args.cells:
        # ONE width-independent cell-partitioned table (the shape a real
        # 100-TB table arrives in) — contrast with strips, which must be
        # re-staged per fleet width
        import bench
        from tileigi_spark.partition import write_cell_partitioned

        spark = bench.make_spark(32)
        spark.sparkContext.setLogLevel("ERROR")
        table = tempfile.mkdtemp(prefix="tileigi_exec_cells_") + "/t"
        t0 = time.time()
        feats = bench.pages_to_features(spark.read.parquet(geo))
        write_cell_partitioned(feats, table, cell_zoom=args.cells,
                               buffer_px=BUFFER_PX, cluster_files=64)
        n = spark.read.parquet(table).count()
        print(f"staged cell table (cz={args.cells}) in "
              f"{time.time() - t0:.1f}s -> {table} (rows {n}, boundary "
              f"dup included)", flush=True)
        spark.stop()
        shards = {w: table for w in widths}
    else:
        shards = {w: shard_input(geo, w) for w in widths}

    legs = []
    for rep in range(args.reps):
        for w in widths:
            leg = run_width(w, shards[w], args.maxzoom, args.cells)
            leg["rep"] = rep
            legs.append(leg)
            print(json.dumps(leg), flush=True)

    best = {w: max(r["tiles_per_sec"] for r in legs if r["nprocs"] == w)
            for w in widths}
    mode = (f"cell-partitioned table cz={args.cells}, pyramid "
            f"z{args.cells}-z{args.maxzoom}" if args.cells
            else "strip-partitioned shards")
    summary = {"metric": "executor-process scaling (independent local[1] "
                         f"JVMs, {mode})",
               "replicas": args.replicas, "maxzoom": args.maxzoom,
               "best_tiles_per_sec": best}
    for a, b in zip(widths, widths[1:]):
        summary[f"eff_{a}to{b}"] = round(best[b] / best[a] / (b / a), 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
