"""Profile the headline mvt-pyramid phase per Spark stage.

Runs synth_pages -> geotag -> build_tiles().count() at
$SPARK_GRAFT_CPUS with the UI enabled, then scrapes the REST API for
per-stage wall/task metrics so the non-scaling (serial) component of
the pyramid phase can be attributed instead of guessed.

Usage: SPARK_GRAFT_CPUS=2 SPARK_GRAFT_BENCH_REPLICAS=1600 \
           python tools/profile_pyramid.py
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    replicas = bench.REPLICAS

    shuffle_parts = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS",
                                       str(max(cpus * 2, 16))))
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{cpus}]")
             .appName("tileigi-profile")
             .config("spark.sql.shuffle.partitions", str(shuffle_parts))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                     os.environ.get("SPARK_GRAFT_PAR_FIRST", "true"))
             .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                     os.environ.get("SPARK_GRAFT_ADVISORY", "64m"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
             .config("spark.sql.files.maxPartitionBytes",
                     os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "128m"))
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "true")
             .config("spark.ui.port", "4049")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles
    from tileigi_spark.extract import geotag_pages

    import tempfile
    workdir = tempfile.mkdtemp(prefix="tileigi_prof_")

    t0 = time.time()
    pages = bench.synth_pages(spark, sf_dir, replicas)
    geotag_pages(pages).write.mode("overwrite").parquet(f"{workdir}/geo")
    geo = spark.read.parquet(f"{workdir}/geo")
    n_points = geo.count()
    print(f"geotag {time.time()-t0:.1f}s n={n_points}", file=sys.stderr)
    feats = bench.pages_to_features(geo)

    maxzoom = bench.MAXZOOM
    thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({maxzoom} - zoom)))"
            f" = 0")
    layers = Layers(layers=[Layer(id="pages", source="pages", minzoom=0,
                                  maxzoom=14, buffer=2, zoom_filter=thin)],
                    global_maxzoom=14)
    t0 = time.time()
    tiles = build_tiles(spark, {"pages": feats}, layers, 0, maxzoom,
                        shuffle_parts=cpus * 8)
    n_tiles = tiles.count()
    wall = time.time() - t0
    print(f"pyramid {wall:.1f}s tiles={n_tiles}", file=sys.stderr)

    app_id = spark.sparkContext.applicationId
    base = f"http://127.0.0.1:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    for s in stages:
        sub = s.get("submissionTime", "")
        comp = s.get("completionTime", "")
        rows.append({
            "stage": s["stageId"], "attempt": s["attemptId"],
            "name": s["name"].split("\n")[0][:60],
            "tasks": s["numCompleteTasks"],
            "run_s": round(s["executorRunTime"] / 1000, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "sub": sub[11:23], "done": comp[11:23],
            "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
            "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
        })
    rows.sort(key=lambda r: r["stage"])
    for r in rows:
        print(json.dumps(r))
    print(json.dumps({"cpus": cpus, "replicas": replicas,
                      "pyramid_wall_s": round(wall, 1),
                      "n_tiles": n_tiles}))
    spark.stop()


if __name__ == "__main__":
    main()
