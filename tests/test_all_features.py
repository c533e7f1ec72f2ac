"""Everything-on integration: TLS scan (O8/O12/O13) + time-based politeness
(O7) + cross-epoch change detection (O14) + fault paths (O9/O11/O16) +
forced recrawl + a mid-run kill-resume — engine == simulator on every
output table.

Each feature is pinned individually in its own module (test_scan,
test_time_politeness, test_change, test_e2e_crawl); this module pins their
INTERACTIONS: idle politeness epochs interleaving with the scan cache's
epoch stamps, retries racing crawl delays, lag-based change detection
reading history written before a kill/resume boundary, and the scan cache
surviving resume.
"""

import pytest

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 150, 8, 25
CORRUPT = frozenset({5})
OVERSIZE = frozenset({9})
CFG = spec.CrawlConfig(
    n_images=N_IMAGES,
    n_hosts=N_HOSTS,
    wave_size=30,
    tls_scan=True,
    time_politeness=True,
    change_detection=True,
)


@pytest.fixture(scope="module")
def runs(spark, tmp_root):
    d = f"{tmp_root}/world-allon"
    dg.write_world(
        spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS,
        corrupt_ids=CORRUPT, oversize_ids=OVERSIZE,
    )
    seeds = dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist()
    # 404+retry fixture: a seed past the corpus, on a host whose robots
    # rules admit the path at this world size (h1's deny it — the seed
    # would be denied instead of 404-retried and no failure would occur)
    seeds += [f"http://h4.example/img{N_IMAGES + 3:010d}"]
    spark.createDataFrame([(u,) for u in seeds], "url string").write.mode(
        "overwrite"
    ).parquet(f"{d}/seeds")

    corpus = dg.build_corpus(N_IMAGES, corrupt_ids=CORRUPT, oversize_ids=OVERSIZE)
    hs = dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records")

    first = ReferenceSimulator(corpus.to_dict("records"), hs, CFG).run(seeds)
    # last productive epoch + 1 (idle politeness epochs write no metrics row)
    inject_at = first.metrics[-1]["epoch"] + 1
    refetch = sorted({f["url_norm"] for f in first.fetched})[:6]
    sres = ReferenceSimulator(corpus.to_dict("records"), hs, CFG).run(
        seeds, reenqueue_at={inject_at: refetch}
    )

    state = f"{tmp_root}/state-allon"
    # phase 1: run two epochs, then "kill" (drop the engine object)
    CrawlEngine(spark, SnapshotStore(state), d, CFG).run(max_epochs=2)
    # phase 2: a fresh engine resumes from the committed manifest
    eng = CrawlEngine(spark, SnapshotStore(state), d, CFG)
    eng.run()
    eng.reenqueue(refetch)
    eng.run()
    return eng, sres


def test_order_matches(runs):
    eng, sres = runs
    got = [(r.epoch, r.wave_pos, r.url_hash)
           for r in eng.order_df().orderBy("epoch", "wave_pos").collect()]
    exp = [(f["epoch"], f["wave_pos"], f["url_hash"]) for f in sres.order]
    assert got == exp and got


def test_seen_matches(runs):
    eng, sres = runs
    got = {(r.url_hash, r.url_norm) for r in eng.seen_df().collect()}
    assert got == set(sres.seen.items())


def test_fetched_change_columns_match(runs):
    eng, sres = runs
    got = {
        (r.url_hash, r.fetch_epoch, r.prior_phash, r.policy, r.screenshot)
        for r in eng.fetched_df().collect()
    }
    exp = {
        (f["url_hash"], f["fetch_epoch"], f["prior_phash"], f["policy"],
         f["screenshot"])
        for f in sres.fetched
    }
    assert got == exp
    # the recrawl branch actually fired across the resume+reenqueue
    assert any(f["prior_phash"] is not None for f in sres.fetched)


def test_tls_and_cache_match(runs):
    eng, sres = runs

    def norm(m):
        return tuple((v, bool(tuple(m[v])[0]), tuple(m[v])[1]) for v in sorted(m))

    got = {
        (r.host, r.ip, r.connect_ok, r.cache_hit, r.epoch, norm(r.scan))
        for r in eng.tls_df().collect()
    }
    exp = {
        (t["host"], t["ip"], t["connect_ok"], t["cache_hit"], t["epoch"],
         norm(t["scan"]))
        for t in sres.tls
    }
    assert got == exp and got
    assert {r.ip for r in eng.scan_cache_df().collect()} == set(sres.scan_cache)


def test_interactions_exercised(runs):
    """The fixture is only meaningful if the features genuinely overlap:
    politeness delays must have produced multi-epoch spreading, the scan
    cache must hit, and a retry must resolve after its 404."""
    _, sres = runs
    assert len({f["epoch"] for f in sres.order}) >= 3
    assert any(t["cache_hit"] for t in sres.tls)
    assert sres.failed  # the past-corpus seed exhausted its 404 retries
