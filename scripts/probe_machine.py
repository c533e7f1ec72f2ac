#!/usr/bin/env python
"""Measure this host's intrinsic scaling ceilings (context for BENCH).

Two sustained probes, pure Python/numpy (no Spark):

* cpu   — image decode + phash loops (the crawl validator's kernel) at
          several process counts; shows how much CPU the host really
          delivers as parallelism grows (vCPU overcommit shows up here).
* mem   — large-buffer copy loops; shows the shared-DRAM bandwidth curve
          (on one box, 4x cores does NOT bring 4x memory channels — the
          payload-bound crawl regime is capped by this, a limit that does
          not exist across separate cluster nodes).

Output: one JSON line per probe level.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cpu_work(args):
    dur, = args
    from monocator_spark.datagen.corpus import corpus_row
    from monocator_spark.functions.imaging import decode, phash64

    rows = [corpus_row(i) for i in range(200)]
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < dur:
        r = rows[n % 200]
        px, _ = decode(r["bytes"])
        phash64(px)
        n += 1
    return n


def mem_work(args):
    dur, = args
    import numpy as np

    buf = np.frombuffer(np.random.bytes(64 << 20), dtype=np.uint8).copy()
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < dur:
        _ = buf.copy()
        n += 1
    return n * 128  # MB moved (read+write)


def run(kind, fn, levels, dur):
    for procs in levels:
        with mp.Pool(procs) as pool:
            t0 = time.monotonic()
            res = pool.map(fn, [(dur,)] * procs)
            wall = time.monotonic() - t0
        total = sum(res)
        print(
            json.dumps(
                {
                    "probe": kind,
                    "procs": procs,
                    "throughput": round(total / wall, 1),
                    "unit": "rows/s" if kind == "cpu" else "MB/s",
                    "per_proc": round(total / wall / procs, 1),
                }
            )
        )


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    levels = (2, 4, 8, 16, 32)
    run("cpu", cpu_work, levels, dur)
    run("mem", mem_work, levels, dur)
