"""Join-focused scaling bench: PIP + kNN at work-dominated size.

Synthesizes N mercator points with pure JVM arithmetic (no regex/Python
so the joins dominate the wall), runs the two spatial joins, and prints
one JSON line. Run at two parallelism levels for the N vs 4N scaling
evidence:

  SPARK_GRAFT_CPUS=2 python tools/bench_joins.py
  SPARK_GRAFT_CPUS=8 python tools/bench_joins.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(os.environ.get("SPARK_GRAFT_JOIN_POINTS", "8000000"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_JOIN_QUERIES", "160000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as entrymod
    from tileigi_spark.spatial import knn_join, point_in_polygon_join

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("tileigi-join-bench")
             .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    MERC = 20037508.342789244
    WORLD = 2.0 * MERC
    par = spark.sparkContext.defaultParallelism * 2
    pts = (spark.range(N_POINTS).repartition(par)
           .select(F.col("id").alias("pid"),
                   (((F.col("id") * 7919) % 1000000).cast("double")
                    / 1000000.0 - 0.5).alias("fx"),
                   (((F.col("id") * 104729) % 1000000).cast("double")
                    / 1000000.0 - 0.5).alias("fy"))
           .select("pid", (F.col("fx") * WORLD).alias("mx"),
                   (F.col("fy") * WORLD * 0.9).alias("my")))
    import tempfile
    work = tempfile.mkdtemp(prefix="tileigi_joinbench_")
    pts.write.mode("overwrite").parquet(f"{work}/pts")
    pts = spark.read.parquet(f"{work}/pts")

    t0 = time.time()
    polys = entrymod._nation_boxes(spark, SF_DIR)
    pip = point_in_polygon_join(pts, polys, index_zoom=6, px_col="mx",
                                py_col="my")
    n_pip = pip.count()
    pip_secs = time.time() - t0

    t0 = time.time()
    q = (pts.filter(F.pmod(F.col("pid"), F.lit(N_POINTS // N_QUERIES)) == 0)
         .select(F.col("pid").alias("query_id"),
                 F.col("mx").alias("qx"), F.col("my").alias("qy")))
    c = pts.select(F.col("pid").alias("cand_id"),
                   F.col("mx").alias("cx"), F.col("my").alias("cy"))
    knn = knn_join(q, c, k=5)
    n_knn = knn.count()
    knn_secs = time.time() - t0

    import shutil
    shutil.rmtree(work, ignore_errors=True)

    joined = n_pip + n_knn
    print(json.dumps({
        "metric": "joined-rows/sec (PIP + kNN, work-dominated)",
        "value": round(joined / (pip_secs + knn_secs), 1),
        "unit": "rows/sec",
        "cpus": cpus,
        "n_points": N_POINTS,
        "pip_secs": round(pip_secs, 2), "pip_rows": n_pip,
        "knn_secs": round(knn_secs, 2), "knn_rows": n_knn,
        "pip_rows_per_sec": round(n_pip / pip_secs, 1),
        "knn_rows_per_sec": round(n_knn / knn_secs, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
