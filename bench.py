"""Benchmark harness: runs the headline north-star pipeline plus every
operator query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline (the BASELINE.json metric): geotag Common-Crawl-style pages
(regex extraction in Arrow batches) -> WKB point features -> z0-z10 MVT
pyramid (tiles/sec), plus PIP + kNN spatial joins (joined-rows/sec). The
page set is derived deterministically from the documents table (doc_id x
replica arithmetic — no external data) so the workload scales with sf and
with the replica factor, keeping the bench compute-bound rather than
overhead-bound.

Scaling-efficiency evidence (north rule, N vs 4N):
  SPARK_GRAFT_CPUS=8 python bench.py ; SPARK_GRAFT_CPUS=32 python bench.py
(automated by tools/bench_scaling.py, reported in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _p(msg):
    print(msg, file=sys.stderr, flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "400"))
MAXZOOM = int(os.environ.get("SPARK_GRAFT_BENCH_MAXZOOM", "10"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("tileigi-spark-bench")
            .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
            # finer scan splits: the geometry stage is Python-bound, so
            # scan-stage wave packing matters as much as the exchanges;
            # 16m keeps ~4 tasks/core on the staged geo parquet (sf
            # tables are single tiny files — unaffected)
            .config("spark.sql.files.maxPartitionBytes", "16m")
            .config("spark.driver.memory", "48g")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def synth_pages(spark, sf_dir: str, replicas: int):
    """documents x replicas -> deterministic coordinate-bearing pages."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang")
    # the sf tables are single tiny parquet files -> 1 scan partition;
    # spread rows so the narrow extract+geometry pipeline parallelizes
    # (real 100TB inputs arrive already partitioned)
    par = spark.sparkContext.defaultParallelism * 2
    pages = docs.repartition(par).withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
    pid = F.col("doc_id") * replicas + F.col("rep")
    lat0 = (pid * 2654435761) % 140000 - 70000
    lon0 = (pid * 40503) % 360000 - 180000

    def mil(v):
        a = F.abs(v)
        return F.concat(F.when(v < 0, F.lit("-")).otherwise(F.lit("")),
                        F.format_string("%d.%03d", (a / 1000).cast("long"),
                                        a % 1000))

    text = F.concat(F.lit("crawl page reporting from "),
                    mil(lat0), F.lit(", "), mil(lon0),
                    F.lit(" with some trailing prose about the town"))
    return pages.select(
        pid.alias("page_id"),
        F.format_string("https://bench-%09d.test/", pid).alias("url"),
        text.alias("text"),
        "lang")


def synth_boxes(spark, n: int):
    """Deterministic axis-aligned box polygons from id arithmetic (no
    external data): jittered centers across the mercator plane, half-sizes
    from ~2 km to ~600 km, one third reversed winding so the make_valid
    repair path is exercised. WKB (93 bytes per 5-point single-ring
    polygon) and the bbox columns are assembled as one numpy byte matrix
    per Arrow batch — no per-row Python in the synth path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from tileigi_spark.mercator import MERC_MAX

    par = spark.sparkContext.defaultParallelism * 2
    ids = spark.range(n).repartition(par)
    out_schema = ("feature_id long, way binary, kind string, "
                  "xmin double, ymin double, xmax double, ymax double")

    def gen(iterator):
        for pdf in iterator:
            i = pdf["id"].to_numpy(np.int64)
            m = len(i)
            if m == 0:
                continue
            span = 0.95 * MERC_MAX
            cx = ((i * 2654435761) % 2_000_000) / 1e6 * span - span
            cy = ((i * 40503) % 2_000_000) / 1e6 * span - span
            hw = 2000.0 * (1.0 + (i % 289)).astype(np.float64)
            hh = 2000.0 * (1.0 + ((i * 7) % 289)).astype(np.float64)
            x0, x1 = cx - hw, cx + hw
            y0, y1 = cy - hh, cy + hh
            rev = (i % 3) == 0
            # ring corners (x0,y0)(x1,y0)(x1,y1)(x0,y1) closed; reversed
            # winding swaps corners 1 and 3
            px = np.stack([x0, np.where(rev, x0, x1), x1,
                           np.where(rev, x1, x0), x0], axis=1)
            py = np.stack([y0, np.where(rev, y1, y0), y1,
                           np.where(rev, y0, y1), y0], axis=1)
            buf = np.empty((m, 93), dtype=np.uint8)
            buf[:, 0] = 1
            buf[:, 1:5] = np.array([3, 0, 0, 0], dtype=np.uint8)   # type
            buf[:, 5:9] = np.array([1, 0, 0, 0], dtype=np.uint8)   # rings
            buf[:, 9:13] = np.array([5, 0, 0, 0], dtype=np.uint8)  # points
            pts = np.empty((m, 5, 2), dtype="<f8")
            pts[:, :, 0] = px
            pts[:, :, 1] = py
            buf[:, 13:93] = pts.reshape(m, 10).view(np.uint8)
            raw = buf.tobytes()
            yield pd.DataFrame({
                "feature_id": i,
                "way": [raw[j * 93:(j + 1) * 93] for j in range(m)],
                "kind": np.char.add("kind-", (i % 7).astype("U1")),
                "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
            })

    return ids.mapInPandas(gen, out_schema)


def synth_lines(spark, n: int):
    """Deterministic 4-point zigzag polylines (73-byte WKB), same
    vectorized assembly as synth_boxes."""
    import numpy as np
    import pandas as pd
    from tileigi_spark.mercator import MERC_MAX

    par = spark.sparkContext.defaultParallelism * 2
    ids = spark.range(n).repartition(par)
    out_schema = ("feature_id long, way binary, kind string, "
                  "xmin double, ymin double, xmax double, ymax double")

    def gen(iterator):
        for pdf in iterator:
            i = pdf["id"].to_numpy(np.int64)
            m = len(i)
            if m == 0:
                continue
            span = 0.95 * MERC_MAX
            cx = ((i * 1812433253 + 11) % 2_000_000) / 1e6 * span - span
            cy = ((i * 69069 + 5) % 2_000_000) / 1e6 * span - span
            s = 3000.0 * (1.0 + (i % 211)).astype(np.float64)
            px = np.stack([cx - 2 * s, cx, cx + 2 * s, cx + 3 * s], axis=1)
            py = np.stack([cy, cy + s, cy - s, cy], axis=1)
            buf = np.empty((m, 73), dtype=np.uint8)
            buf[:, 0] = 1
            buf[:, 1:5] = np.array([2, 0, 0, 0], dtype=np.uint8)   # type
            buf[:, 5:9] = np.array([4, 0, 0, 0], dtype=np.uint8)   # points
            pts = np.empty((m, 4, 2), dtype="<f8")
            pts[:, :, 0] = px
            pts[:, :, 1] = py
            buf[:, 9:73] = pts.reshape(m, 8).view(np.uint8)
            raw = buf.tobytes()
            yield pd.DataFrame({
                "feature_id": i,
                "way": [raw[j * 73:(j + 1) * 73] for j in range(m)],
                "kind": np.char.add("way-", (i % 5).astype("U1")),
                "xmin": px.min(axis=1), "ymin": py.min(axis=1),
                "xmax": px.max(axis=1), "ymax": py.max(axis=1),
            })

    return ids.mapInPandas(gen, out_schema)


def concave_vertex_arrays(i):
    """The deterministic concave-16-gon vertex generator shared by the
    synth_concave bench leg and tools/pipeline_ceiling.py's kernel
    probe (ONE definition, so the kernel-ceiling prediction provably
    measures the same diet the bench leg renders). i: int64 id array;
    returns (px, py) of shape (len(i), 17) — closed rings, one third
    reversed winding."""
    import numpy as np
    from tileigi_spark.mercator import MERC_MAX

    NP = 16
    span = 0.95 * MERC_MAX
    cx = ((i * 2654435761) % 2_000_000) / 1e6 * span - span
    cy = ((i * 69069) % 2_000_000) / 1e6 * span - span
    base = 2000.0 * (1.0 + (i % 307)).astype(np.float64)
    k = np.arange(NP)
    ang = 2.0 * np.pi * k / NP
    # deterministic per-vertex wobble in [0.35, 1.0]
    wob = 0.35 + 0.65 * (((i[:, None] * 31 + k * 17) % 97) / 97.0)
    r = base[:, None] * wob
    m = len(i)
    px = np.empty((m, NP + 1))
    py = np.empty((m, NP + 1))
    px[:, :NP] = cx[:, None] + r * np.cos(ang)
    py[:, :NP] = cy[:, None] + r * np.sin(ang)
    rev = (i % 3) == 0
    px[rev, :NP] = px[rev, :NP][:, ::-1]
    py[rev, :NP] = py[rev, :NP][:, ::-1]
    px[:, NP] = px[:, 0]
    py[:, NP] = py[:, 0]
    return px, py


def synth_concave(spark, n: int):
    """Deterministic CONCAVE 16-gon polygons (irregular radii, no axis
    alignment — nothing here hits the rect fast path), exercising the
    ragged batch lane's despike/RDP/slice/make_valid chain on the shapes
    real admin/landuse layers have. Fixed 17-point rings let the WKB
    assemble as one numpy byte matrix; one third are reversed winding so
    the repair path runs."""
    import numpy as np
    import pandas as pd
    from tileigi_spark.mercator import MERC_MAX

    par = spark.sparkContext.defaultParallelism * 2
    ids = spark.range(n).repartition(par)
    out_schema = ("feature_id long, way binary, kind string, "
                  "xmin double, ymin double, xmax double, ymax double")
    NP = 16
    wkb_len = 9 + 4 + (NP + 1) * 16

    def gen(iterator):
        for pdf in iterator:
            i = pdf["id"].to_numpy(np.int64)
            m = len(i)
            if m == 0:
                continue
            px, py = concave_vertex_arrays(i)
            buf = np.empty((m, wkb_len), dtype=np.uint8)
            buf[:, 0] = 1
            buf[:, 1:5] = np.array([3, 0, 0, 0], dtype=np.uint8)
            buf[:, 5:9] = np.array([1, 0, 0, 0], dtype=np.uint8)
            buf[:, 9:13] = np.array([NP + 1, 0, 0, 0], dtype=np.uint8)
            pts = np.empty((m, NP + 1, 2), dtype="<f8")
            pts[:, :, 0] = px
            pts[:, :, 1] = py
            buf[:, 13:] = pts.reshape(m, (NP + 1) * 2).view(np.uint8)
            raw = buf.tobytes()
            yield pd.DataFrame({
                "feature_id": i,
                "way": [raw[j * wkb_len:(j + 1) * wkb_len]
                        for j in range(m)],
                "kind": np.char.add("area-", (i % 6).astype("U1")),
                "xmin": px.min(axis=1), "ymin": py.min(axis=1),
                "xmax": px.max(axis=1), "ymax": py.max(axis=1),
            })

    return ids.mapInPandas(gen, out_schema)


def pages_to_features(geo):
    """Geotagged pages -> engine features with precomputed bbox columns
    (pure JVM mercator from lat/lon; keeps the pre-shuffle pipeline free
    of extra Python evals)."""
    from pyspark.sql import functions as F
    return geo.select(
        F.xxhash64("url").alias("feature_id"), "way", "lang",
        F.col("mx").alias("xmin"), F.col("my").alias("ymin"),
        F.col("mx").alias("xmax"), F.col("my").alias("ymax"))


def _cpu_ticks():
    """(user+nice+system, steal, total) jiffies from /proc/stat, or None.

    Sampled at bench start/end so the output line carries the host
    weather it ran under: this sandbox's host is time-shared, and the
    same commit has measured 2-4x apart minutes apart (see
    BENCH/BASELINE.md "host weather control"). steal_pct is hypervisor
    time taken from this VM; with it near zero a slow run means a cause
    inside the measured code, with it high the numbers are weather."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        busy = v[0] + v[1] + v[2]
        steal = v[7] if len(v) > 7 else 0
        return busy, steal, sum(v)
    except Exception:
        return None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    ticks0 = _cpu_ticks()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles
    from tileigi_spark.extract import geotag_pages
    from tileigi_spark.spatial import point_in_polygon_join, knn_join

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---- headline: geotag -> extract -> pyramid
    # NOTE: stage outputs go through parquet, not .cache(): the local-mode
    # BlockManager serializes concurrent persist() writes (measured 4-6x
    # anti-scaling at 32 cores); per-task parquet files have no shared lock
    # and match the production shape (stage boundaries on storage).
    import tempfile
    workdir = tempfile.mkdtemp(prefix="tileigi_bench_")
    t0 = time.time()
    pages = synth_pages(spark, sf_dir, REPLICAS)
    geotag_pages(pages).write.mode("overwrite").parquet(f"{workdir}/geo")
    geo = spark.read.parquet(f"{workdir}/geo")
    n_points = geo.count()
    extract_secs = time.time() - t0
    timings["geotag_extract"] = round(extract_secs, 3)
    _p(f"phase geotag_extract {extract_secs:.1f}s n={n_points}")
    extra["pages_per_sec"] = round(n_points / extract_secs, 1)
    extra["n_pages"] = n_points
    feats = pages_to_features(geo)

    t0 = time.time()
    # low-zoom thinning via the !scale_denominator! idiom: zoom z keeps
    # ~4^(z-MAXZOOM) of the features (planet configs always thin low zooms
    # — the z0 tile must not receive the full feature set)
    thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({MAXZOOM} - zoom)))"
            f" = 0")
    layers = Layers(layers=[Layer(id="pages", source="pages", minzoom=0,
                                  maxzoom=14, buffer=2, zoom_filter=thin)],
                    global_maxzoom=14)
    # cores*8 exchange partitions: the encode walk is Python-bound, so
    # wave packing decides wall time (see encode_layers docstring);
    # AQE's parallelismFirst would coalesce back to ~cores and idle the
    # tail of every wave
    tiles = build_tiles(spark, {"pages": feats}, layers, 0, MAXZOOM,
                        shuffle_parts=cpus * 8)
    n_tiles = tiles.count()
    pyramid_secs = time.time() - t0
    timings[f"mvt_pyramid_z0_{MAXZOOM}"] = round(pyramid_secs, 3)
    _p(f"phase pyramid {pyramid_secs:.1f}s tiles={n_tiles}")
    extra["tiles_per_sec"] = round(n_tiles / pyramid_secs, 2)
    extra["n_tiles"] = n_tiles

    # ---- headline joins on the full point set
    pts = geo.select(F.xxhash64("url").alias("pid"), "mx", "my")

    t0 = time.time()
    polys = entrymod._nation_boxes(spark, sf_dir)
    pip = point_in_polygon_join(pts, polys, index_zoom=6, px_col="mx",
                                py_col="my")
    n_pip = pip.count()
    pip_secs = time.time() - t0
    timings["pip_join"] = round(pip_secs, 3)
    _p(f"phase pip {pip_secs:.1f}s rows={n_pip}")

    t0 = time.time()
    queries = (pts.filter(F.pmod(F.col("pid"), F.lit(997)) < 20)
               .select(F.col("pid").alias("query_id"),
                       F.col("mx").alias("qx"), F.col("my").alias("qy")))
    cands = pts.select(F.col("pid").alias("cand_id"),
                       F.col("mx").alias("cx"), F.col("my").alias("cy"))
    knn = knn_join(queries, cands, k=5)  # density-adaptive zoom
    n_knn = knn.count()
    knn_secs = time.time() - t0
    timings["knn_join"] = round(knn_secs, 3)
    _p(f"phase knn {knn_secs:.1f}s rows={n_knn}")
    extra["joined_rows_per_sec"] = round((n_pip + n_knn) /
                                         (pip_secs + knn_secs), 1)
    extra["n_joined_rows"] = n_pip + n_knn

    # ---- polygon-dense pyramid (reference workloads are polygon-heavy,
    # lib.rs:559-728 — the point flagship alone never exercises the
    # S-H clip / quadtree slice / make_valid chain at scale)
    t0 = time.time()
    # capped so the scaling harness's high-replica low-core legs stay
    # within their per-run budget; 32-core bench (replicas=400) is
    # unaffected at 100k
    n_polys = int(os.environ.get("SPARK_GRAFT_BENCH_POLYS",
                                 min(REPLICAS * 250, 300_000)))
    boxes = synth_boxes(spark, n_polys)
    boxes.write.mode("overwrite").parquet(f"{workdir}/boxes")
    boxes = spark.read.parquet(f"{workdir}/boxes")
    poly_mz = int(os.environ.get("SPARK_GRAFT_BENCH_POLY_MAXZOOM", "8"))
    poly_thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({poly_mz} - "
                 f"zoom))) = 0")
    poly_layers = Layers(layers=[Layer(id="boxes", source="boxes",
                                       minzoom=0, maxzoom=14, buffer=2,
                                       zoom_filter=poly_thin)],
                         global_maxzoom=14)
    ptiles = build_tiles(spark, {"boxes": boxes}, poly_layers, 0, poly_mz,
                         shuffle_parts=cpus * 8)
    n_ptiles = ptiles.count()
    poly_secs = time.time() - t0
    timings[f"poly_pyramid_z0_{poly_mz}"] = round(poly_secs, 3)
    _p(f"phase poly_pyramid {poly_secs:.1f}s tiles={n_ptiles} "
       f"polys={n_polys}")
    extra["poly_tiles_per_sec"] = round(n_ptiles / poly_secs, 2)
    extra["n_poly_tiles"] = n_ptiles
    extra["n_polys"] = n_polys

    # ---- multi-layer pyramid: points + lines + polygons with distinct
    # zoom ranges, one layer via the SQL-template path (!zoom! token) —
    # exercises the per-tile layer zip/merge (A2, lib.rs:472-487) at scale
    t0 = time.time()
    n_lines = int(os.environ.get("SPARK_GRAFT_BENCH_LINES",
                                 min(REPLICAS * 100, 120_000)))
    synth_lines(spark, n_lines).write.mode("overwrite") \
        .parquet(f"{workdir}/lines")
    lines = spark.read.parquet(f"{workdir}/lines")
    pts_feats = feats.filter(F.pmod(F.abs(F.col("feature_id")),
                                    F.lit(64)) == 0)
    ml_layers = Layers(layers=[
        Layer(id="pages", source="pages", minzoom=4, maxzoom=14, buffer=2),
        Layer(id="roads", source="bench_lines", minzoom=2, maxzoom=14,
              buffer=4,
              sql=("SELECT * FROM bench_lines "
                   "WHERE !zoom! >= 5 OR kind = 'way-0'")),
        Layer(id="landuse", source="boxes", minzoom=0, maxzoom=6,
              buffer=2,
              zoom_filter=("pmod(abs(feature_id), "
                           "shiftleft(1, 2 * (6 - zoom))) = 0")),
    ], global_maxzoom=14)
    mtiles = build_tiles(spark, {"pages": pts_feats, "boxes": boxes,
                                 "bench_lines": lines},
                         ml_layers, 0, 7, shuffle_parts=cpus * 8)
    n_mtiles = mtiles.count()
    ml_secs = time.time() - t0
    timings["multilayer_pyramid_z0_7"] = round(ml_secs, 3)
    _p(f"phase multilayer {ml_secs:.1f}s tiles={n_mtiles}")
    extra["multilayer_tiles_per_sec"] = round(n_mtiles / ml_secs, 2)
    extra["n_multilayer_tiles"] = n_mtiles

    # ---- concave-polygon pyramid: irregular 16-gons (the batch lane's
    # despike/RDP/slice/make_valid chain on real-world polygon shapes;
    # no axis-rect fast path applies)
    t0 = time.time()
    n_concave = int(os.environ.get("SPARK_GRAFT_BENCH_CONCAVE",
                                   min(REPLICAS * 150, 150_000)))
    synth_concave(spark, n_concave).write.mode("overwrite") \
        .parquet(f"{workdir}/concave")
    concave = spark.read.parquet(f"{workdir}/concave")
    cc_mz = int(os.environ.get("SPARK_GRAFT_BENCH_CONCAVE_MAXZOOM", "8"))
    cc_thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({cc_mz} - "
               f"zoom))) = 0")
    cc_layers = Layers(layers=[Layer(id="areas", source="concave",
                                     minzoom=0, maxzoom=14, buffer=2,
                                     zoom_filter=cc_thin)],
                       global_maxzoom=14)
    ctiles = build_tiles(spark, {"concave": concave}, cc_layers, 0, cc_mz,
                         shuffle_parts=cpus * 8)
    n_ctiles = ctiles.count()
    cc_secs = time.time() - t0
    timings[f"concave_pyramid_z0_{cc_mz}"] = round(cc_secs, 3)
    _p(f"phase concave_pyramid {cc_secs:.1f}s tiles={n_ctiles} "
       f"polys={n_concave}")
    extra["concave_tiles_per_sec"] = round(n_ctiles / cc_secs, 2)
    extra["n_concave_tiles"] = n_ctiles
    extra["n_concave"] = n_concave

    # ---- z0-z14 city-bbox pyramid: the reference's default depth
    # (bin/tileigi.rs:59-60) restricted to a 20x20-degree bbox — the
    # high-zoom regime where tile groups are tiny and per-group
    # constants dominate (bulk framers + single-partial assembly)
    t0 = time.time()
    hz_thin = ("pmod(abs(feature_id), shiftleft(1, 2 * (14 - zoom)))"
               " = 0")
    hz_layers = Layers(layers=[Layer(id="pages", source="pages",
                                     minzoom=0, maxzoom=14, buffer=2,
                                     zoom_filter=hz_thin)],
                       global_maxzoom=14)
    hz_tiles = build_tiles(spark, {"pages": feats}, hz_layers, 0, 14,
                           shuffle_parts=cpus * 8,
                           bbox=(10.0, 10.0, 30.0, 30.0))
    n_hz = hz_tiles.count()
    hz_secs = time.time() - t0
    timings["highzoom_pyramid_z0_14_bbox"] = round(hz_secs, 3)
    _p(f"phase highzoom_pyramid {hz_secs:.1f}s tiles={n_hz}")
    extra["highzoom_tiles_per_sec"] = round(n_hz / hz_secs, 2)
    extra["n_highzoom_tiles"] = n_hz

    # ---- deep-zoom re-render from the cell-partitioned layout (S12):
    # z8-z14 over the same bbox, input staged partitionBy(cell_x,
    # cell_y) at cell zoom 4 — the "re-render a dirty city" workflow
    # where parquet partition pruning pays (the z0-z14 leg above cannot
    # prune: its z0 tile semantically needs the world). Staging is
    # untimed input prep (a real 100-TB table ARRIVES in this layout);
    # the full-table render of the same tiles is the in-run control.
    from tileigi_spark.mercator import bbox_lonlat_to_merc
    from tileigi_spark.partition import (read_cell_partitioned,
                                         write_cell_partitioned)

    rr_bbox = (10.0, 10.0, 30.0, 30.0)
    cellsdir = f"{workdir}/geo_cells"
    # cap the (untimed) staging at ~4M rows so the scaling harness's
    # 9600-replica low-core legs don't spend minutes on input prep;
    # both the pruned read and the in-run control use the same capped
    # set, so the comparison stays apples-to-apples
    rr_cap = int(os.environ.get("SPARK_GRAFT_BENCH_RERENDER_CAP",
                                "4000000"))
    rr_k = max(1, -(-n_points // rr_cap))  # ceil div
    rr_feats = (feats if rr_k == 1 else
                feats.filter(F.pmod(F.abs(F.col("feature_id")),
                                    F.lit(rr_k)) == 0))
    write_cell_partitioned(rr_feats, cellsdir, cell_zoom=4, buffer_px=2,
                           cluster_files=cpus * 2)

    t0 = time.time()
    part = read_cell_partitioned(spark, cellsdir,
                                 bbox_merc=bbox_lonlat_to_merc(rr_bbox),
                                 minzoom=8)
    rr_tiles = build_tiles(spark, {"pages": part}, hz_layers, 8, 14,
                           shuffle_parts=cpus * 8, bbox=rr_bbox)
    n_rr = rr_tiles.count()
    rr_secs = time.time() - t0
    timings["rerender_z8_14_bbox_cells"] = round(rr_secs, 3)

    t0 = time.time()
    rr_full = build_tiles(spark, {"pages": rr_feats}, hz_layers, 8, 14,
                          shuffle_parts=cpus * 8, bbox=rr_bbox)
    n_rr_full = rr_full.count()
    rr_full_secs = time.time() - t0
    timings["rerender_z8_14_bbox_full"] = round(rr_full_secs, 3)
    assert n_rr == n_rr_full, (n_rr, n_rr_full)  # render-completeness
    _p(f"phase rerender cells={rr_secs:.1f}s full={rr_full_secs:.1f}s "
       f"tiles={n_rr} speedup={rr_full_secs / rr_secs:.2f}x")
    extra["rerender_tiles_per_sec"] = round(n_rr / rr_secs, 2)
    extra["n_rerender_tiles"] = n_rr
    extra["rerender_prune_speedup"] = round(rr_full_secs / rr_secs, 3)
    # directory-level pruning ratio (the 100-TB lever: at bench scale
    # the control's bbox prefilter already row-group-skips the same
    # rows, so wall-clock parity here is expected — what scales is
    # never LISTING the other cells' files at all)
    from tileigi_spark.partition import layout_meta, read_rect
    meta = layout_meta(spark, cellsdir)
    rx0, ry0, rx1, ry1 = read_rect(bbox_lonlat_to_merc(rr_bbox),
                                   meta["cell_zoom"], 8,
                                   meta["buffer_px"])
    extra["rerender_cells_read"] = (rx1 - rx0 + 1) * (ry1 - ry0 + 1)
    extra["rerender_cells_total"] = (1 << meta["cell_zoom"]) ** 2

    import shutil
    shutil.rmtree(workdir, ignore_errors=True)

    # drain the headline phases' JVM garbage before per-query timing:
    # without this, the heap debt from the 2M-page phases lands as a
    # 10-35s collection pause on whichever small query runs when the
    # threshold trips (measured: poly_pieces_z2 at 37.7s in-bench vs
    # 1.4s isolated; with the explicit gc it returns to ~1.5-4s) — the
    # pause would be misattributed to that query's operator
    spark.sparkContext._jvm.System.gc()

    # warm the reused Python workers before timing the per-query set:
    # a first call otherwise pays tileigi_spark/numpy import in every
    # worker (measured 5-15s attributed to whichever query runs first —
    # import cost is not the operator's cost)
    def _warm(iterator):
        import tileigi_spark.dedup          # noqa: F401
        import tileigi_spark.engine         # noqa: F401
        import tileigi_spark.extract        # noqa: F401
        import tileigi_spark.geom.rectfast  # noqa: F401
        import tileigi_spark.similarity     # noqa: F401
        import tileigi_spark.spatial        # noqa: F401
        import tileigi_spark.textops        # noqa: F401
        for pdf in iterator:
            yield pdf

    spark.range(spark.sparkContext.defaultParallelism * 4) \
        .repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(_warm, "id long").count()
    # second drain after the warmup: the first gc (above) runs while
    # the heavy legs' shuffle/broadcast cleanup is still queued; one
    # pass was measured to leave a 10-14s collection landing inside a
    # later small query (poly_pieces_z2 14s in-bench vs 1.3s isolated)
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    spark.sparkContext._jvm.System.gc()

    # ---- operator queries (correctness-gated set)
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
            _p(f"query {name} {timings[name]}s")
        except Exception as e:  # keep the bench line intact
            timings[name] = -1.0
            extra[f"error_{name}"] = str(e)[:120]

    total = round(sum(v for v in timings.values() if v > 0), 3)
    ticks1 = _cpu_ticks()
    if ticks0 and ticks1 and ticks1[2] > ticks0[2]:
        dt = ticks1[2] - ticks0[2]
        extra["host_steal_pct"] = round(
            100.0 * (ticks1[1] - ticks0[1]) / dt, 2)
        extra["host_busy_pct"] = round(
            100.0 * (ticks1[0] - ticks0[0]) / dt, 2)
    result = {
        "metric": "tiles/sec + joined-rows/sec (geotag->extract->z0-%d MVT "
                  "pyramid; PIP + kNN joins)" % MAXZOOM,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "replicas": REPLICAS,
        "throughput": extra,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
