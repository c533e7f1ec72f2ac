#!/usr/bin/env python
"""Measure this host's intrinsic scaling ceilings (context for BENCH).

Three sustained probes, pure Python/numpy (no Spark):

* cpu   — image decode + phash loops (the crawl validator's kernel) at
          several process counts; shows how much CPU the host really
          delivers as parallelism grows (vCPU overcommit shows up here).
* mem   — large-buffer copy loops; shows the shared-DRAM bandwidth curve
          (on one box, 4x cores does NOT bring 4x memory channels — the
          payload-bound crawl regime is capped by this, a limit that does
          not exist across separate cluster nodes).
* disk  — buffered write+fsync+read loops on /tmp (where spark.local.dir
          puts shuffle/spill and the store puts tables); the virtual disk
          is shared with other tenants, so this one also varies BETWEEN
          runs — the leading suspect for the observed window drift.

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


def disk_work(args):
    """Sustained buffered write+fsync+read over the same filesystem Spark's
    shuffle/spill/store writes land on (spark.local.dir -> /tmp). The host's
    disk is virtualized and SHARED; its delivered bandwidth is the third
    ceiling next to vCPU and DRAM — and unlike them it also swings with
    *other tenants'* IO, which is the leading suspect for the observed
    1.5-2x run-to-run drift (shrinking shuffle bytes via zstd bought ~2x at
    16 cores precisely in contended windows)."""
    dur, idx = args
    import os
    import tempfile

    import numpy as np

    chunk = np.frombuffer(np.random.bytes(32 << 20), dtype=np.uint8).copy()
    mb = 0
    t0 = time.monotonic()
    with tempfile.NamedTemporaryFile(dir="/tmp", prefix=f"diskprobe{idx}-") as f:
        while time.monotonic() - t0 < dur:
            f.seek(0)
            f.write(chunk.tobytes())
            f.flush()
            os.fsync(f.fileno())
            # Evict the (now clean) pages so the read-back below hits the
            # device, not the page cache — without this the read half
            # measures DRAM and inflates the reported "disk" MB/s.
            os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED)
            f.seek(0)
            while f.read(1 << 22):
                pass
            mb += 64  # 32 written+fsynced + 32 read (cache-evicted)
    return mb


def run(kind, fn, levels, dur):
    for procs in levels:
        with mp.Pool(procs) as pool:
            t0 = time.monotonic()
            res = pool.map(
                fn,
                [(dur, i) for i in range(procs)] if kind == "disk" else [(dur,)] * procs,
            )
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
    run("disk", disk_work, (1, 4, 16), dur)
