"""Does the axis-rect lane need the ragged lane's cache-resident
chunking? (round-5 follow-up to the concave A/B)

The ragged lane's 4096-feature chunking halved the concave leg at
local[4] because its flat-array temporaries (~9 arrays x total
VERTICES) spill out of cache at Arrow-batch sizes. The rect lane's
temporaries scale with FEATURES (5 points each, ~7x smaller working
set at the same batch size), so the win is uncertain — this probe
measures it instead of guessing:

1. single process: _rects_fast_path whole-batch vs a 4096-row chunked
   loop at several batch sizes (the bench pipeline's Arrow cap is
   20000);
2. independent processes (the real-cluster regime, as in
   tools/pipeline_ceiling.py): 2 vs 8 workers, whole vs chunked,
   best-of reps.

Input mirrors bench.synth_boxes (same id-arithmetic rects, one third
reversed winding) with zoom 0-8 metatile candidates by center — the
poly_pyramid leg's diet.

Usage: python tools/ab_rect_chunk.py [--sizes 4096,20000,40000]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = 48
CHUNK = 4096


def rect_batch(n, seed=0):
    import numpy as np
    import pandas as pd
    from tileigi_spark.mercator import MERC_MAX

    i = np.arange(seed, seed + n, dtype=np.int64)
    span = 0.95 * MERC_MAX
    cx = ((i * 2654435761) % 2_000_000) / 1e6 * span - span
    cy = ((i * 40503) % 2_000_000) / 1e6 * span - span
    hw = 2000.0 * (1.0 + (i % 289)).astype(np.float64)
    hh = 2000.0 * (1.0 + ((i * 7) % 289)).astype(np.float64)
    x0, x1 = cx - hw, cx + hw
    y0, y1 = cy - hh, cy + hh
    rev = (i % 3) == 0
    px = np.stack([x0, np.where(rev, x0, x1), x1,
                   np.where(rev, x1, x0), x0], axis=1)
    py = np.stack([y0, np.where(rev, y1, y0), y1,
                   np.where(rev, y0, y1), y0], axis=1)
    buf = np.empty((n, 93), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.array([3, 0, 0, 0], dtype=np.uint8)
    buf[:, 5:9] = np.array([1, 0, 0, 0], dtype=np.uint8)
    buf[:, 9:13] = np.array([5, 0, 0, 0], dtype=np.uint8)
    pts = np.empty((n, 5, 2), dtype="<f8")
    pts[:, :, 0] = px
    pts[:, :, 1] = py
    buf[:, 13:93] = pts.reshape(n, 10).view(np.uint8)
    raw = buf.tobytes()
    zoom = (i % 9).astype(np.int64)  # the z0-z8 leg's zoom mix
    size = np.minimum(8, 1 << zoom)
    naxis = np.maximum((1 << zoom) // size, 1)
    mtx = np.clip(((cx + MERC_MAX) / (2 * MERC_MAX) * naxis)
                  .astype(np.int64), 0, naxis - 1)
    mty = np.clip(((MERC_MAX - cy) / (2 * MERC_MAX) * naxis)
                  .astype(np.int64), 0, naxis - 1)
    return pd.DataFrame({
        "zoom": zoom, "mtx": mtx, "mty": mty, "feature_id": i,
        "way": [raw[j * 93:(j + 1) * 93] for j in range(n)],
        "kind": "k"})


def run_whole(pdf):
    # disable the engine's internal chunking so this arm measures a
    # genuine whole-batch pass
    import tileigi_spark.engine as E
    old = E._RECT_CHUNK
    E._RECT_CHUNK = 10 ** 9
    try:
        f, leftover = E._rects_fast_path(pdf, ["kind"], 32, 8, 14)
    finally:
        E._RECT_CHUNK = old
    return (0 if f is None else len(f)) + len(leftover)


def run_chunked(pdf):
    # the engine's shipped behavior (internal _RECT_CHUNK slicing)
    import tileigi_spark.engine as E
    assert E._RECT_CHUNK == CHUNK
    f, leftover = E._rects_fast_path(pdf, ["kind"], 32, 8, 14)
    return (0 if f is None else len(f)) + len(leftover)


_STATE = {}


def _init(n):
    _STATE["pdf"] = rect_batch(n)


def _task_whole(_):
    t = 0
    for _rep in range(6):
        t += run_whole(_STATE["pdf"])
    return t


def _task_chunked(_):
    t = 0
    for _rep in range(6):
        t += run_chunked(_STATE["pdf"])
    return t


def probe(task, procs, n, reps=2):
    best = None
    for _ in range(reps):
        with mp.Pool(procs, initializer=_init, initargs=(n,)) as p:
            p.map(task, range(procs), chunksize=1)  # warm outside timing
            t0 = time.time()
            p.map(task, range(TASKS))
            dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,20000,40000")
    ap.add_argument("--procs", default="2,8")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    pa, pb = (int(x) for x in args.procs.split(","))

    print("== single process, whole vs 4096-chunked ==")
    for n in sizes:
        pdf = rect_batch(n)
        rw = run_whole(pdf)
        rc = run_chunked(pdf)
        assert rw == rc, f"piece-count mismatch at n={n}: {rw} vs {rc}"
        for name, fn in (("whole", run_whole), ("chunk", run_chunked)):
            best = None
            for _ in range(5):
                t0 = time.time()
                fn(pdf)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            rate = n / best / 1e6
            print(f"  n={n:6d} {name}: {best * 1e3:8.2f} ms "
                  f"({rate:.2f} M feats/s)")

    n = 20000
    print(f"== independent processes at n={n} (x6 reps/task, "
          f"{TASKS} tasks) ==")
    out = {}
    for name, task in (("whole", _task_whole), ("chunk", _task_chunked)):
        ta = probe(task, pa, n)
        tb = probe(task, pb, n)
        eff = (ta / tb) / (pb / pa)
        out[name] = (ta, tb, eff)
        print(f"  {name}: {pa} procs {ta:6.2f}s  {pb} procs {tb:6.2f}s"
              f"  eff {pa}->{pb}: {eff:.3f}")
    wa, wb, _ = out["whole"]
    ca, cb, _ = out["chunk"]
    print(f"  chunked/whole speedup: {wa / ca:.3f}x at {pa} procs, "
          f"{wb / cb:.3f}x at {pb} procs")


if __name__ == "__main__":
    main()
