"""Distributed datagen ≡ driver-side datagen (SURVEY.md §7 step 2 parity).

The bench frontier is generated with ``write_world_distributed``; every test
and the reference simulator use the driver-side ``write_world``. This pins
bit-identical equality between the two paths at small n.
"""

from __future__ import annotations

import pytest

from monocator_spark.datagen import corpus as dg
from monocator_spark.datagen.distributed import write_world_distributed

N_IMAGES, N_HOSTS, N_SEEDS = 120, 7, 60


@pytest.fixture(scope="module")
def worlds(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("gen_parity")
    drv, dist = str(root / "driver"), str(root / "dist")
    dg.write_world(spark, drv, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)
    write_world_distributed(
        spark, dist, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS, partitions=5
    )
    return drv, dist


@pytest.mark.parametrize("table,key", [("corpus", "image_id"), ("host_state", "host")])
def test_tables_identical(spark, worlds, table, key):
    drv, dist = worlds
    a = spark.read.parquet(f"{drv}/{table}")
    b = spark.read.parquet(f"{dist}/{table}")
    assert a.schema == b.schema
    rows_a = sorted(a.collect(), key=lambda r: r[key])
    rows_b = sorted(b.collect(), key=lambda r: r[key])
    assert rows_a == rows_b


def test_seeds_identical_multiset(spark, worlds):
    drv, dist = worlds
    a = sorted(r.url for r in spark.read.parquet(f"{drv}/seeds").collect())
    b = sorted(r.url for r in spark.read.parquet(f"{dist}/seeds").collect())
    assert a == b
