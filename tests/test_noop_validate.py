"""cfg.noop_validate parity — the measurement flag must be output-invisible.

The flag replaces the decode/PSNR/caption/phash Arrow UDF with a
pure-Catalyst status (spec.CrawlConfig docstring). On a world whose
payloads are all well-formed — every bench world — the crawl order, seen
set, and fetched rows must be byte-identical to the real validator's, or
the scaling A/B it exists for (separating engine CPU from byte movement)
would not be measuring the same job.
"""

from __future__ import annotations

import pytest

from monocator_spark import spec
from monocator_spark.datagen.distributed import write_world_distributed
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 300, 9, 120


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("noopval") / "world")
    write_world_distributed(
        spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS,
        partitions=4, bucket_corpus=True,
    )
    return d


def _run(spark, world, store_dir, noop: bool):
    cfg = spec.CrawlConfig(
        n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=50, per_host_quota=4,
        noop_validate=noop,
    )
    eng = CrawlEngine(spark, SnapshotStore(store_dir), world, cfg)
    eng.run(max_epochs=4)
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


def test_noop_validate_output_identical(spark, world, tmp_path):
    real = _run(spark, world, str(tmp_path / "s_real"), noop=False)
    noop = _run(spark, world, str(tmp_path / "s_noop"), noop=True)
    assert real[0] == noop[0] and len(real[0]) > 0
    assert real[1] == noop[1]
    assert real[2] == noop[2]
