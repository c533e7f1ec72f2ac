#!/usr/bin/env python
"""Measure actual shuffle bytes written under lz4 vs zstd (ADVICE r3).

The '~40% smaller shuffle' figure behind the zstd default was asserted
from codec literature, never measured on THIS workload. This runs the
identical crawl job once per codec with the Spark event log on, then sums
`Shuffle Bytes Written` (post-compression file bytes) and shuffle-read
bytes across all task-end events. Byte counts are deterministic
properties of the plan + codec — unlike throughput they do not depend on
the host window, so one run per codec suffices.

Usage: python scripts/measure_shuffle_bytes.py [--world W] [--cores N]
Writes BENCH/attempts/shuffle_bytes_codecs.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_leg(codec: str, args) -> dict:
    ev_dir = f"/tmp/evlog_{codec}"
    out = REPO / "BENCH" / "attempts" / f"shufbytes_{codec}.json"
    env = dict(os.environ)
    env["SPARK_DRIVER_MEM"] = f"{6 * args.cores}g"
    env["MONO_SPARK_CONF"] = (
        "spark.sql.adaptive.enabled=false"
        f";spark.io.compression.codec={codec}"
        # plain-text event log so the parse below needs no codec lib —
        # NOTE this also keeps the measured shuffle codec from touching
        # the event log itself
        ";spark.eventLog.compress=false"
    )
    env["SPARK_EVENTLOG_DIR"] = ev_dir
    cmd = [
        "taskset", "-c", args.cpuset,
        sys.executable, str(REPO / "scripts" / "bench_crawl.py"),
        "--world", args.world, "--cores", str(args.cores),
        "--wave-size", str(args.wave_size), "--epochs", str(args.epochs),
        "--per-host-quota", "8", "--salt", "16",
        "--out", str(out),
    ]
    subprocess.run(cmd, check=True, env=env)
    wr = rd = recs = 0
    for log in Path(ev_dir).rglob("*"):
        if not log.is_file() or not log.name.startswith("events"):
            continue
        for line in open(log, errors="replace"):
            if '"Event":"SparkListenerTaskEnd"' not in line.replace(" ", ""):
                continue
            ev = json.loads(line)
            tm = ev.get("Task Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            srm = tm.get("Shuffle Read Metrics") or {}
            wr += swm.get("Shuffle Bytes Written", 0)
            recs += swm.get("Shuffle Records Written", 0)
            rd += srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
    leg = json.load(open(out))
    return {
        "codec": codec,
        "shuffle_bytes_written": wr,
        "shuffle_records_written": recs,
        "shuffle_bytes_read": rd,
        "order_checksum": leg["order_checksum"],
        "seen_checksum": leg["seen_checksum"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="/tmp/mono_lc_probe_world")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--cpuset", default="16-23",
                    help="taskset range (keep off any concurrent pairing)")
    ap.add_argument("--wave-size", type=int, default=20_000)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    for d in ("/tmp/evlog_lz4", "/tmp/evlog_zstd"):
        subprocess.run(["rm", "-rf", d], check=True)

    legs = [run_leg(c, args) for c in ("lz4", "zstd")]
    assert legs[0]["order_checksum"] == legs[1]["order_checksum"]
    assert legs[0]["seen_checksum"] == legs[1]["seen_checksum"]
    assert legs[0]["shuffle_records_written"] == legs[1]["shuffle_records_written"], (
        "same plan must shuffle the same records"
    )
    ratio = round(
        legs[1]["shuffle_bytes_written"] / legs[0]["shuffle_bytes_written"], 4
    )
    summary = {
        "world": args.world,
        "legs": legs,
        "zstd_over_lz4_bytes_written": ratio,
        "note": "post-compression shuffle file bytes; deterministic per plan+codec",
    }
    out_path = REPO / "BENCH" / "attempts" / "shuffle_bytes_codecs.json"
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
