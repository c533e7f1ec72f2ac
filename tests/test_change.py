"""O14 screenshot policy + cross-epoch change detection.

Unit grid: the Catalyst decision column equals ``spec.screenshot_decision``
on every policy branch (changed / unchanged / first-fetch included).
E2E: a forced recrawl (engine.reenqueue == simulator reenqueue_at) refetches
URLs in a later epoch; the lag-derived prior_phash and the screenshot
decision match the simulator row-for-row.
"""

import pandas as pd
import pytest

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.operators import change
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore


def test_decision_grid_matches_spec(spark):
    rows = []
    for i, policy in enumerate(spec.SCREENSHOT_POLICIES):
        for j, (prior, phash) in enumerate(
            [(None, 160), (160, 160), (160, 161), (None, 7), (32, 32)]
        ):
            url = f"http://h{i}.example/img{j:010d}"
            caption = " ".join(["w"] * (4 + 2 * j))  # 4..12 words
            rows.append((policy, url, prior, phash, caption))
    pdf = pd.DataFrame(
        rows, columns=["policy", "url_norm", "prior_phash", "phash", "caption"]
    )
    df = spark.createDataFrame(
        pdf.astype({"prior_phash": "object"}),
        "policy string, url_norm string, prior_phash long, phash long, caption string",
    )
    got = {
        (r.policy, r.url_norm): r.screenshot
        for r in df.withColumn("screenshot", change.decision_col()).collect()
    }
    for policy, url, prior, phash, caption in rows:
        exp = spec.screenshot_decision(
            policy, spec.outlink_count_of(url), prior, phash, caption
        )
        assert got[(policy, url)] == exp, (policy, url, prior, phash)


def test_policy_assignment_matches_spec(spark):
    hosts = [f"h{j}.example" for j in range(40)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r.host: r.policy for r in df.withColumn("policy", change.policy_col()).collect()}
    assert got == {h: spec.screenshot_policy_of(h) for h in hosts}
    assert len(set(got.values())) == 5  # all five policies occur


N_IMAGES, N_HOSTS, N_SEEDS = 150, 6, 25
CFG = spec.CrawlConfig(
    n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=30, change_detection=True
)


@pytest.fixture(scope="module")
def recrawl_runs(spark, tmp_root):
    d = f"{tmp_root}/world-change"
    dg.write_world(spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)
    seeds = dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist()
    corpus = dg.build_corpus(N_IMAGES).to_dict("records")
    hs = dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records")

    first = ReferenceSimulator(corpus, hs, CFG).run(seeds)
    n_epochs = len(first.metrics)
    refetch = sorted({d_["url_norm"] for d_ in first.fetched})[:8]
    sres = ReferenceSimulator(corpus, hs, CFG).run(
        seeds, reenqueue_at={n_epochs: refetch}
    )

    eng = CrawlEngine(spark, SnapshotStore(f"{tmp_root}/state-change"), d, CFG)
    s1 = eng.run()
    assert s1.epochs == n_epochs
    eng.reenqueue(refetch)
    eng.run()
    return eng, sres


def test_recrawl_fetched_matches(recrawl_runs):
    eng, sres = recrawl_runs
    got = {
        (r.url_hash, r.fetch_epoch, r.prior_phash, r.policy, r.screenshot)
        for r in eng.fetched_df().collect()
    }
    exp = {
        (d["url_hash"], d["fetch_epoch"], d["prior_phash"], d["policy"],
         d["screenshot"])
        for d in sres.fetched
    }
    assert got == exp


def test_recrawl_order_matches(recrawl_runs):
    eng, sres = recrawl_runs
    got = [(r.epoch, r.wave_pos, r.url_hash)
           for r in eng.order_df().orderBy("epoch", "wave_pos").collect()]
    exp = [(d["epoch"], d["wave_pos"], d["url_hash"]) for d in sres.order]
    assert got == exp


def test_same_epoch_duplicate_image(spark, tmp_root):
    """Two URLs fetching the SAME image in ONE wave (different hosts, same
    path leaf): the lag window must order by (fetch_epoch, wave_pos) — the
    simulator's sequential last_phash semantics — and the prior join must
    key on the unique per-row url_hash, producing exactly one output row
    per fetch (no image_id cross-product): the first fetch gets a null
    prior, the second gets the first's phash."""
    n_images, n_hosts = 40, 6
    cfg = spec.CrawlConfig(
        n_images=n_images, n_hosts=n_hosts, wave_size=50,
        follow_outlinks=False, change_detection=True,
    )
    d = f"{tmp_root}/world-dupimg"
    dg.write_world(spark, d, n_images=n_images, n_hosts=n_hosts, n_seeds=6)
    base = dg.build_seeds(6, n_images, n_hosts)["url"].tolist()
    # two extra URLs on distinct hosts pointing at one existing image; pick
    # an image whose path no fixture robots rule denies on either host
    corpus = dg.build_corpus(n_images).to_dict("records")
    hs = dg.build_host_state(n_hosts, n_images).to_dict("records")
    dup = None
    for i in range(n_images):
        iid = dg.image_id_of(i)
        urls = [f"http://h3.example/{iid}", f"http://h4.example/{iid}"]
        if all(
            dg.robots_allowed("/" + iid, h["robots_rules"]) and not h["blacklisted"]
            for h in hs if h["host"] in ("h3.example", "h4.example")
        ):
            dup = (iid, urls)
            break
    assert dup is not None
    iid, urls = dup
    seeds = base + urls
    spark.createDataFrame([(u,) for u in seeds], "url string").write.mode(
        "overwrite"
    ).parquet(f"{d}/seeds")

    sres = ReferenceSimulator(corpus, hs, cfg).run(seeds)
    sim_rows = [f for f in sres.fetched if f["image_id"] == iid]
    assert len(sim_rows) >= 2  # both duplicate URLs fetched
    epochs = {f["fetch_epoch"] for f in sim_rows}
    assert len(epochs) == 1  # ... in the SAME wave (fixture precondition)
    priors = sorted(
        (f["wave_pos"], f["prior_phash"]) for f in sim_rows
    )
    assert priors[0][1] is None and priors[1][1] == sim_rows[0]["phash"]

    eng = CrawlEngine(spark, SnapshotStore(f"{tmp_root}/state-dupimg"), d, cfg)
    eng.run()
    got = {
        (r.url_hash, r.fetch_epoch, r.wave_pos, r.prior_phash, r.screenshot)
        for r in eng.fetched_df().collect()
    }
    exp = {
        (f["url_hash"], f["fetch_epoch"], f["wave_pos"], f["prior_phash"],
         f["screenshot"])
        for f in sres.fetched
    }
    assert got == exp
    # no duplicated output rows from the prior join
    assert eng.fetched_df().count() == len(sres.fetched)


def test_change_detection_really_fired(recrawl_runs):
    """Refetched rows must carry a non-null prior_phash (the lag found the
    earlier fetch), and an unchanged if_html_changed refetch must NOT
    screenshot while its first fetch DID."""
    _, sres = recrawl_runs
    refetched = [d for d in sres.fetched if d["prior_phash"] is not None]
    assert refetched
    assert all(d["prior_phash"] == d["phash"] for d in refetched)  # unchanged
    by_hash: dict[int, list] = {}
    for d in sres.fetched:
        by_hash.setdefault(d["url_hash"], []).append(d)
    pairs = [v for v in by_hash.values() if len(v) == 2]
    assert pairs
    changed_pairs = [
        v for v in pairs if v[0]["policy"] == "if_html_changed"
    ]
    for v in changed_pairs:
        first, second = sorted(v, key=lambda d: d["fetch_epoch"])
        assert first["screenshot"] is True and second["screenshot"] is False
