"""Storage-interface contract: SnapshotStore (parquet fallback) and
IcebergStore (the cluster twin) expose the same surface and the same
commit/preview/resume semantics. The Iceberg half runs only when an
Iceberg catalog is live (the runtime jar is absent in this sandbox — the
skip records that); the semantics themselves are pinned on SnapshotStore
so the contract is executable truth, not prose.
"""

import inspect

import pytest

from monocator_spark.sources.iceberg_store import IcebergStore
from monocator_spark.sources.store import SnapshotStore

PUBLIC = [
    "stage_append", "stage_overwrite", "stage_append_local", "commit",
    "abort", "preview", "load", "last_epoch", "meta",
]


def test_surface_parity():
    """Every public method of the engine's store contract exists on both
    classes with identical parameter names (self/constructor excluded) —
    the swap is mechanical."""
    for name in PUBLIC:
        a = inspect.signature(getattr(SnapshotStore, name))
        b = inspect.signature(getattr(IcebergStore, name))
        assert list(a.parameters) == list(b.parameters), name


def _contract(store, spark):
    df1 = spark.range(5).toDF("x")
    df2 = spark.range(5, 8).toDF("x")

    store.stage_overwrite("t", df1, 0)
    # staged-but-uncommitted: invisible to load, visible to preview
    assert store.last_epoch() is None
    assert store.preview(spark, "t").count() == 5
    store.commit(0, {"crawl_epoch": -1})
    assert store.last_epoch() == 0
    assert store.load(spark, "t").count() == 5
    assert store.meta() == {"crawl_epoch": -1}

    store.stage_append("t", df2, 1)
    assert store.load(spark, "t").count() == 5  # still epoch-0 view
    assert store.preview(spark, "t").count() == 8
    store.commit(1, {"crawl_epoch": 0})
    assert store.load(spark, "t").count() == 8
    # time travel: epoch 0 still readable
    assert store.load(spark, "t", epoch=0).count() == 5
    assert store.meta(0) == {"crawl_epoch": -1}

    # abort drops staging without touching committed state
    store.stage_append("t", df2, 2)
    store.abort()
    assert store.load(spark, "t").count() == 8
    assert store.last_epoch() == 1


def test_snapshot_store_contract(spark, tmp_root):
    _contract(SnapshotStore(f"{tmp_root}/contract-snap"), spark)


def test_iceberg_store_contract(spark):
    if not IcebergStore.is_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath: searched "
            "pyspark/jars, ~/.ivy2 and ~/.m2 (none exist offline) and the "
            "sandbox has no network for spark.jars.packages resolution. "
            "IcebergStore is the cluster swap-in (see its docstring for the "
            "spark-submit config); its LOGIC is executed against a mocked "
            "catalog in tests/test_iceberg_mock.py, and the shared contract "
            "semantics run on SnapshotStore above."
        )
    _contract(IcebergStore(spark), spark)
