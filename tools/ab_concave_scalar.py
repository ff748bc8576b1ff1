"""Scalar-vs-batched ratio for the concave-polygon leg (round-4 verdict
item #1's done-criterion).

Runs the concave 16-gon pyramid (the ragged batch lane's target diet —
no axis-rect fast path applies) twice in SEPARATE processes at the same
parallelism: once on the default batch lane, once with
SPARK_GRAFT_FORCE_SCALAR_GEOM=1 routing every feature through the
historic per-row chain (geom/batch.py:850). Separate processes because
env flags do not propagate into already-forked reused Python workers.
Interleaved reps, best-of per mode (same host-noise policy as
tools/bench_scaling.py); prints the ratio.

Usage: python tools/ab_concave_scalar.py [cpus] [n_polys] [maxzoom] [reps]
       python tools/ab_concave_scalar.py --child <cpus> <n> <mz>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, n: int, mz: int) -> None:
    import bench
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles

    spark = bench.make_spark(cpus)
    work = tempfile.mkdtemp(prefix="tileigi_ab_")
    bench.synth_concave(spark, n).write.mode("overwrite") \
        .parquet(f"{work}/concave")
    concave = spark.read.parquet(f"{work}/concave")
    thin = (f"pmod(abs(feature_id), shiftleft(1, 2 * ({mz} - zoom))) = 0")
    layers = Layers(layers=[Layer(id="areas", source="concave",
                                  minzoom=0, maxzoom=14, buffer=2,
                                  zoom_filter=thin)],
                    global_maxzoom=14)
    # warm the python workers (import cost is not the operator's cost)
    build_tiles(spark, {"concave": concave.limit(256)}, layers, 0, 2,
                shuffle_parts=cpus * 8).count()
    t0 = time.time()
    tiles = build_tiles(spark, {"concave": concave}, layers, 0, mz,
                        shuffle_parts=cpus * 8)
    n_tiles = tiles.count()
    secs = time.time() - t0
    print(json.dumps({"secs": round(secs, 2), "tiles": n_tiles,
                      "scalar": os.environ.get(
                          "SPARK_GRAFT_FORCE_SCALAR_GEOM") == "1"}))
    import shutil
    shutil.rmtree(work, ignore_errors=True)


def run_leg(scalar: bool, cpus: int, n: int, mz: int) -> dict:
    env = dict(os.environ)
    if scalar:
        env["SPARK_GRAFT_FORCE_SCALAR_GEOM"] = "1"
    else:
        env.pop("SPARK_GRAFT_FORCE_SCALAR_GEOM", None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(cpus), str(n), str(mz)],
        env=env, capture_output=True, text=True, timeout=3400)
    lines = out.stdout.strip().splitlines()
    if not lines:
        sys.stderr.write(out.stderr[-2000:] + "\n")
        raise RuntimeError("child produced no stdout")
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    mz = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    batched, scalar = [], []
    for _ in range(reps):
        batched.append(run_leg(False, cpus, n, mz))
        scalar.append(run_leg(True, cpus, n, mz))
    for r in batched + scalar:
        print(json.dumps(r))
    b = min(r["secs"] for r in batched)
    s = min(r["secs"] for r in scalar)
    assert len({r["tiles"] for r in batched + scalar}) == 1, \
        "scalar and batched tile counts diverge"
    print(json.dumps({"cpus": cpus, "n_polys": n, "maxzoom": mz,
                      "batched_best_secs": b, "scalar_best_secs": s,
                      "scalar_over_batched": round(s / b, 2),
                      "tiles": batched[0]["tiles"]}))


if __name__ == "__main__":
    main()
