"""Probe: kill-resume + different parallelism still matches the simulator."""
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.session import get_spark
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 300, 10, 40
cfg = spec.CrawlConfig(n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=50)

# different parallelism than the smoke run (8): local[4], 4 shuffle partitions
spark = get_spark("probe", cores=4, shuffle_partitions=4)
tmp = tempfile.mkdtemp(prefix="mono-probe-")
try:
    world = f"{tmp}/world"
    dg.write_world(spark, world, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)

    sim = ReferenceSimulator(
        dg.build_corpus(N_IMAGES).to_dict("records"),
        dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records"),
        cfg,
    )
    sres = sim.run(dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist())

    store = SnapshotStore(f"{tmp}/state")
    eng1 = CrawlEngine(spark, store, world, cfg)
    s1 = eng1.run(max_epochs=2)  # "killed" after 2 epochs
    print("PHASE1 epochs:", s1.epochs, "last manifest:", store.last_epoch())

    # brand-new engine + store object on the same dir = process restart
    store2 = SnapshotStore(f"{tmp}/state")
    eng2 = CrawlEngine(spark, store2, world, cfg)
    s2 = eng2.run()  # resume to completion
    print("PHASE2 epochs:", s2.epochs)

    got = [(r.epoch, r.wave_pos, r.url_norm, r.url_hash)
           for r in eng2.order_df().orderBy("epoch", "wave_pos").collect()]
    exp = [(d["epoch"], d["wave_pos"], d["url_norm"], d["url_hash"]) for d in sres.order]
    print("RESUME ORDER MATCH ✓" if got == exp else f"RESUME ORDER MISMATCH {len(got)} vs {len(exp)}")
    got_seen = {(r.url_hash, r.url_norm) for r in eng2.seen_df().collect()}
    exp_seen = set(sres.seen.items())
    print("RESUME SEEN MATCH ✓" if got_seen == exp_seen else "RESUME SEEN MISMATCH")
    if got != exp or got_seen != exp_seen:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
