"""Time-based politeness (O7 range gate): crawl_delay_ms gates hosts via
next_allowed_ts <= epoch_ts; delayed rows stay pending; waves with zero
eligible hosts are idle epochs. Engine == simulator on a world with
nonzero crawl delays (the fixture host_state carries 0/100/1000 ms).
"""

import pytest

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 200, 8, 40
CFG = spec.CrawlConfig(
    n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=40, time_politeness=True
)


@pytest.fixture(scope="module")
def runs(spark, tmp_root):
    d = f"{tmp_root}/world-timepol"
    dg.write_world(spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)
    sim = ReferenceSimulator(
        dg.build_corpus(N_IMAGES).to_dict("records"),
        dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records"),
        CFG,
    )
    sres = sim.run(dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist())
    eng = CrawlEngine(spark, SnapshotStore(f"{tmp_root}/state-timepol"), d, CFG)
    stats = eng.run()
    return eng, stats, sres


def test_order_matches_with_delays(runs):
    eng, _, sres = runs
    got = [(r.epoch, r.wave_pos, r.url_norm, r.url_hash)
           for r in eng.order_df().orderBy("epoch", "wave_pos").collect()]
    exp = [(d["epoch"], d["wave_pos"], d["url_norm"], d["url_hash"])
           for d in sres.order]
    assert got == exp


def test_seen_matches_with_delays(runs):
    eng, _, sres = runs
    got = {(r.url_hash, r.url_norm) for r in eng.seen_df().collect()}
    assert got == set(sres.seen.items())


def test_delays_actually_gated(runs):
    """The fixture must exercise the gate: a delayed host's consecutive
    scheduling epochs are spaced by ceil(delay/EPOCH_MS), and at least one
    host with the 1000ms delay was scheduled in 2+ epochs."""
    _, stats, sres = runs
    from monocator_spark.functions.urlnorm import host_of

    epochs_of_host: dict[str, list[int]] = {}
    for d in sres.order:
        epochs_of_host.setdefault(host_of(d["url_norm"]), []).append(d["epoch"])
    hs = {r["host"]: r for r in
          dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records")}
    checked = 0
    for host, eps in epochs_of_host.items():
        delay = hs[host]["crawl_delay_ms"]
        if delay <= 0:
            continue
        gap = -(-delay // spec.EPOCH_MS)  # ceil
        distinct = sorted(set(eps))
        for a, b in zip(distinct, distinct[1:]):
            assert b - a >= gap, (host, delay, distinct)
        if delay >= 1000 and len(distinct) >= 2:
            checked += 1
    assert checked >= 1
    # idle epochs existed: max epoch > scheduled-epoch count - 1
    max_epoch = max(d["epoch"] for d in sres.order)
    assert max_epoch >= stats.epochs  # gaps ⇒ idle epochs were skipped over
