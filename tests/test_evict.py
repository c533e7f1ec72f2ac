"""TTL / refresh eviction: CrawlEngine.evict_seen forgets URLs from the
URL-seen state so the regular dedup path re-admits them.

The dual of reenqueue (which refetches WITHOUT forgetting). Exercises the
structure-specific state surgery in ``dedup.evict_filter``: true
fingerprint deletion for the cuckoo twin (operators/cuckoo.delete_hashes —
the capability that justifies shipping cuckoo at all), affected-shard
rebuild for Bloom (bits cannot be unset).
"""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.operators import dedup, enqueue
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 150, 8, 25
BASE = spec.CrawlConfig(n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=30)


@pytest.fixture(scope="module")
def world(spark, tmp_root):
    d = f"{tmp_root}/world-evict"
    dg.write_world(spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)
    return d


@pytest.mark.parametrize("seen_filter", ["bloom", "cuckoo"])
def test_evict_then_dedup_readmits(spark, tmp_root, world, seen_filter):
    cfg = dataclasses.replace(BASE, seen_filter=seen_filter)
    store = SnapshotStore(f"{tmp_root}/state-evict-{seen_filter}")
    eng = CrawlEngine(spark, store, world, cfg)
    eng.run()

    seen_rows = eng.seen_df().collect()
    n_seen = len(seen_rows)
    assert n_seen > 10
    urls = sorted(r.url_norm for r in seen_rows)
    victims, keepers = urls[:5], urls[5:10]

    # never-seen URL: a no-op that must not disturb state
    assert eng.evict_seen(["http://never-seen.example/x.jpg"]) == 0
    assert len(eng.seen_df().collect()) == n_seen

    assert eng.evict_seen(victims) == 5
    after = {r.url_norm for r in eng.seen_df().collect()}
    assert len(after) == n_seen - 5
    assert not (after & set(victims))
    assert set(keepers) <= after

    # the dedup path itself: evicted URLs come back as NEW through
    # filter_new (pre-filter + exact confirm), keepers stay deduped
    raw = spark.createDataFrame(
        [(u,) for u in victims + keepers], "url string"
    ).withColumn("depth", F.lit(0))
    cands = enqueue.dedup_within_batch(enqueue.prepare_candidates(raw))
    fresh = dedup.filter_new(
        cands,
        store.load(spark, "seen"),
        store.load(spark, "bloom"),
        cfg,
    )
    got = {r.url_norm for r in fresh.collect()}
    assert got == set(victims)

    # idempotent: evicting again finds nothing
    assert eng.evict_seen(victims) == 0

    # the commit is a resumable manifest epoch: a fresh engine resumes
    # cleanly (crawl_epoch unchanged, crawl already complete -> no-op run)
    eng2 = CrawlEngine(spark, SnapshotStore(store.root), world, cfg)
    stats = eng2.run()
    assert stats.fetched == 0
    assert {r.url_norm for r in eng2.seen_df().collect()} == after
