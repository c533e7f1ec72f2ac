"""Bucketed corpus fetch ≡ broadcast fetch — identical crawl outputs.

The bench worlds ship a bucketed+sorted corpus table (the 100 TB layout);
tests and small worlds use the plain parquet + broadcast join. Both engines
must produce byte-identical crawl order / seen set / fetched rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monocator_spark import spec
from monocator_spark.datagen.distributed import write_world_distributed
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 400, 11, 160


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bucketed") / "world")
    write_world_distributed(
        spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS,
        partitions=4, bucket_corpus=True,
    )
    return d


def _run(spark, world, store_dir, bucketed: bool):
    cfg = spec.CrawlConfig(
        n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=60, per_host_quota=4
    )
    eng = CrawlEngine(spark, SnapshotStore(store_dir), world, cfg)
    if not bucketed:
        eng.corpus_bucketed = False
        eng.corpus = spark.read.parquet(f"{world}/corpus")
    eng.run(max_epochs=6)
    order = [
        (r.epoch, r.wave_pos, r.url_hash)
        for r in eng.order_df().orderBy("epoch", "wave_pos").collect()
    ]
    seen = sorted(r.url_hash for r in eng.seen_df().collect())
    fetched = sorted(
        (r.url_hash, r.image_id, r.caption, r.phash, r.fetch_epoch, r.wave_pos)
        for r in eng.fetched_df().collect()
    )
    return order, seen, fetched


def test_bucketed_equals_broadcast(spark, world, tmp_path):
    a = _run(spark, world, str(tmp_path / "s_bucketed"), bucketed=True)
    b = _run(spark, world, str(tmp_path / "s_broadcast"), bucketed=False)
    assert a[0] == b[0] and len(a[0]) > 0
    assert a[1] == b[1]
    assert a[2] == b[2]
