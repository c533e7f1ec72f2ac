#!/usr/bin/env python
"""spark-submit --py-files packaging probe (north_rule: "packaged for
spark-submit --py-files on multi-executor clusters").

Proves the zip is self-sufficient: ``crawl_job.py`` is copied OUTSIDE the
repo (so its sys.path fallback cannot see the source tree) and launched
with ``spark-submit --py-files dist/monocator_spark.zip`` on a toy world.
Every import must then resolve from the zip — exactly what executors on a
real cluster do. Asserts the job completes, then re-submits with the same
store and asserts the resume is a no-op (already-complete crawl).
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from monocator_spark.session import get_spark
    from monocator_spark.datagen import corpus as dg
    from scripts.make_pyfiles_zip import build

    zip_path = build()
    work = Path(tempfile.mkdtemp(prefix="submit_probe_"))
    job = work / "crawl_job.py"
    shutil.copy(REPO / "scripts" / "crawl_job.py", job)

    world = work / "world"
    spark = get_spark("submit-probe-gen", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    dg.write_world(spark, str(world), n_images=150, n_hosts=8, n_seeds=25)
    spark.stop()
    # crawl_job reads the config from the world meta (test worlds skip it)
    (world / "_WORLD_META.json").write_text(
        json.dumps({"n_images": 150, "n_hosts": 8, "n_seeds": 25})
    )

    def submit() -> str:
        cmd = [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", str(zip_path),
            str(job),
            "--world", str(world),
            "--store", str(work / "store"),
        ]
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            raise SystemExit(f"spark-submit failed rc={r.returncode}")
        return r.stdout

    out1 = submit()
    stats1 = json.loads([l for l in out1.splitlines() if l.startswith("{")][-1])
    assert stats1["fetched"] > 0, stats1
    print(f"SUBMIT RUN ✓ fetched={stats1['fetched']} epochs={stats1['epochs']}")

    out2 = submit()  # resume on a completed store: zero new work
    stats2 = json.loads([l for l in out2.splitlines() if l.startswith("{")][-1])
    assert stats2["epochs"] == 0 and stats2["fetched"] == 0, stats2
    print("SUBMIT RESUME NO-OP ✓")
    shutil.rmtree(work)


if __name__ == "__main__":
    main()
