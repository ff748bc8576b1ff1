"""Measure this machine's raw parallel-scaling ceiling with independent
Python processes (single-threaded BLAS) — the upper bound any framework
can reach here, cited as context in BENCH/BASELINE.md.

A real multi-executor cluster runs separate executor processes per node
(this probe's regime); Spark local[N] shares one JVM, which adds its own
contention on top.
"""

import multiprocessing as mp
import os
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")


def burn(_):
    import numpy as np
    x = np.random.RandomState(0).rand(400, 400)
    for _ in range(60):
        x = x @ x
        x /= np.abs(x).max()
    return float(x.sum())


def burn_bandwidth(_):
    """Streaming regime: elementwise passes over arrays far larger than
    cache — the memory-access profile of the engine's vectorized numpy
    stages (remap, byte-matrix WKB/MVT assembly), which share the
    socket's memory bandwidth across processes where the cache-resident
    matmul probe does not."""
    import numpy as np
    x = np.random.RandomState(1).rand(6_000_000)  # ~48 MB
    y = np.empty_like(x)
    for _ in range(30):
        np.multiply(x, 1.0000001, out=y)
        np.add(y, 0.1, out=y)
        x, y = y, x
    return float(x[0])


def run_probe(fn, label):
    results = {}
    for n in (1, 2, 4, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(fn, range(64))
        results[n] = time.time() - t0
        print(f"[{label}] {n:3d} procs: {results[n]:6.2f} s  "
              f"speedup {results[1] / results[n]:5.2f}x")
    for (a, b) in ((2, 8), (4, 16), (8, 32)):
        eff = (results[a] / results[b]) / (b / a)
        print(f"[{label}] efficiency {a}->{b}: {eff:.2f}")


def main():
    run_probe(burn, "compute(cache-resident matmul)")
    run_probe(burn_bandwidth, "bandwidth(streaming 48MB)")


if __name__ == "__main__":
    main()
