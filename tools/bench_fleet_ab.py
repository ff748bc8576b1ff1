"""Paired strips-vs-cells executor-fleet A/B in one time window.

The fleet legs in tools/bench_executors.py are weather-sensitive: on
this host, identical 8-JVM legs have measured 5.3k-9.0k tiles/sec
depending on when they run (BENCH/BASELINE.md "host noise"). Comparing
the strip layout against the cell layout from runs taken hours apart
therefore confounds layout with weather. This driver interleaves the
four legs (strips@2, cells@2, strips@8, cells@8) inside each rep, so
every rep is a paired sample taken in one window, and reports
per-rep paired ratios plus per-width best-of.

Reuses already-staged inputs (they are deterministic functions of the
replica count):
  --strips2/--strips8  strip-sharded dirs from bench_executors.py
  --cells-table        write_cell_partitioned table
"""

from __future__ import annotations

import argparse
import json

from bench_executors import run_width


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strips2", required=True)
    ap.add_argument("--strips8", required=True)
    ap.add_argument("--cells-table", required=True)
    ap.add_argument("--cell-zoom", type=int, default=3)
    ap.add_argument("--maxzoom", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    legs = []
    for rep in range(args.reps):
        for w, strip_dir in ((2, args.strips2), (8, args.strips8)):
            for mode, shard, cz in (("strips", strip_dir, None),
                                    ("cells", args.cells_table,
                                     args.cell_zoom)):
                for attempt in (0, 1):
                    try:
                        leg = run_width(w, shard, args.maxzoom, cz)
                        break
                    except Exception as e:  # transient worker death
                        print(f"# leg {mode}@{w} rep {rep} attempt "
                              f"{attempt} failed: {e}", flush=True)
                        if attempt:
                            raise
                leg["rep"], leg["mode"] = rep, mode
                legs.append(leg)
                print(json.dumps(leg), flush=True)

    out = {"metric": "paired strips-vs-cells fleet A/B "
                     f"(z*-z{args.maxzoom}, interleaved legs)",
           "reps": args.reps}
    for mode in ("strips", "cells"):
        sel = [r for r in legs if r["mode"] == mode]
        best = {w: max(r["tiles_per_sec"] for r in sel if r["nprocs"] == w)
                for w in (2, 8)}
        out[mode] = {"best_tiles_per_sec": best,
                     "eff_2to8": round(best[8] / best[2] / 4.0, 3),
                     "all": {w: sorted(r["tiles_per_sec"] for r in sel
                                       if r["nprocs"] == w)
                             for w in (2, 8)}}
    # paired per-rep, per-width ratio cells/strips (same window)
    ratios = {}
    for w in (2, 8):
        rs = []
        for rep in range(args.reps):
            s = next(r["tiles_per_sec"] for r in legs
                     if r["mode"] == "strips" and r["nprocs"] == w
                     and r["rep"] == rep)
            c = next(r["tiles_per_sec"] for r in legs
                     if r["mode"] == "cells" and r["nprocs"] == w
                     and r["rep"] == rep)
            rs.append(round(c / s, 3))
        ratios[w] = rs
    out["cells_over_strips_paired"] = ratios
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
