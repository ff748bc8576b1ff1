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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "40"))
MAXZOOM = int(os.environ.get("SPARK_GRAFT_BENCH_MAXZOOM", "10"))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("tileigi-spark-bench")
            .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
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


def pages_to_features(geo):
    from pyspark.sql import functions as F
    return geo.select(
        F.xxhash64("url").alias("feature_id"), "way", "lang")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

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
    t0 = time.time()
    pages = synth_pages(spark, sf_dir, REPLICAS)
    geo = geotag_pages(pages)
    feats = pages_to_features(geo).cache()
    n_points = feats.count()
    extract_secs = time.time() - t0
    timings["geotag_extract"] = round(extract_secs, 3)
    extra["pages_per_sec"] = round(n_points / extract_secs, 1)
    extra["n_pages"] = n_points

    t0 = time.time()
    layers = Layers(layers=[Layer(id="pages", source="pages", minzoom=0,
                                  maxzoom=14, buffer=2)], global_maxzoom=14)
    tiles = build_tiles(spark, {"pages": feats}, layers, 0, MAXZOOM)
    n_tiles = tiles.count()
    pyramid_secs = time.time() - t0
    timings[f"mvt_pyramid_z0_{MAXZOOM}"] = round(pyramid_secs, 3)
    extra["tiles_per_sec"] = round(n_tiles / pyramid_secs, 2)
    extra["n_tiles"] = n_tiles

    # ---- headline joins on the full point set
    from tileigi_spark.mercator import MERC_MAX
    pts = geo.select(
        F.xxhash64("url").alias("pid"),
        (F.col("lon") * (MERC_MAX / 180.0)).alias("mx"),
        F.radians(F.col("lat")).alias("_latr")) \
        .withColumn("my", F.lit(MERC_MAX / 3.141592653589793) *
                    F.log(F.tan(F.lit(3.141592653589793 / 4) +
                                F.col("_latr") / 2))) \
        .drop("_latr").cache()
    n_pts = pts.count()

    t0 = time.time()
    polys = entrymod._nation_boxes(spark, sf_dir)
    pip = point_in_polygon_join(pts, polys, index_zoom=6, px_col="mx",
                                py_col="my")
    n_pip = pip.count()
    pip_secs = time.time() - t0
    timings["pip_join"] = round(pip_secs, 3)

    t0 = time.time()
    queries = (pts.filter(F.pmod(F.col("pid"), F.lit(997)) < 3)
               .select(F.col("pid").alias("query_id"),
                       F.col("mx").alias("qx"), F.col("my").alias("qy")))
    cands = pts.select(F.col("pid").alias("cand_id"),
                       F.col("mx").alias("cx"), F.col("my").alias("cy"))
    knn = knn_join(queries, cands, k=5, index_zoom=6)
    n_knn = knn.count()
    knn_secs = time.time() - t0
    timings["knn_join"] = round(knn_secs, 3)
    extra["joined_rows_per_sec"] = round((n_pip + n_knn) /
                                         (pip_secs + knn_secs), 1)
    extra["n_joined_rows"] = n_pip + n_knn

    feats.unpersist()
    pts.unpersist()

    # ---- operator queries (correctness-gated set)
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # keep the bench line intact
            timings[name] = -1.0
            extra[f"error_{name}"] = str(e)[:120]

    total = round(sum(v for v in timings.values() if v > 0), 3)
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
