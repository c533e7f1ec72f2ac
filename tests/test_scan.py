"""O8/O12/O13 scan module: engine == simulator on a world where several
hosts share an IP (the FullScanCache.find(ip) semantics,
/root/reference/src/TODO.MD:41: co-hosted hosts reuse one TLS scan).
"""

import pytest

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 150, 8, 25
# n_ips = max(4, 8//3) = 4 → 8 hosts over 4 IPs: co-hosting guaranteed
CFG = spec.CrawlConfig(n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=30, tls_scan=True)


@pytest.fixture(scope="module")
def world(spark, tmp_root):
    d = f"{tmp_root}/world-scan"
    dg.write_world(spark, d, n_images=N_IMAGES, n_hosts=N_HOSTS, n_seeds=N_SEEDS)
    return d


@pytest.fixture(scope="module")
def runs(spark, tmp_root, world):
    sim = ReferenceSimulator(
        dg.build_corpus(N_IMAGES).to_dict("records"),
        dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records"),
        CFG,
    )
    sres = sim.run(dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist())
    eng = CrawlEngine(spark, SnapshotStore(f"{tmp_root}/state-scan"), world, CFG)
    eng.run()
    return eng, sres


def _norm_scan(m) -> tuple:
    """scan map → hashable sorted entries; engine values are Rows
    (connect_ok, cipher), simulator values are plain tuples — both unpack
    as 2-sequences."""
    out = []
    for v in sorted(m):
        ok, cipher = tuple(m[v])
        out.append((v, bool(ok), cipher))
    return tuple(out)


def test_tls_rows_match(runs):
    eng, sres = runs
    got = {
        (r.host, r.ip, r.connect_ok, r.cache_hit, r.epoch, _norm_scan(r.scan))
        for r in eng.tls_df().collect()
    }
    exp = {
        (d["host"], d["ip"], d["connect_ok"], d["cache_hit"], d["epoch"],
         _norm_scan(d["scan"]))
        for d in sres.tls
    }
    assert got == exp and got


def test_cohosting_and_cache_hits_exercised(runs):
    """The fixture must actually exercise O13: ≥2 hosts on one IP, and at
    least one later-epoch visit must be served from the cache."""
    eng, sres = runs
    by_ip: dict[int, set] = {}
    for d in sres.tls:
        by_ip.setdefault(d["ip"], set()).add(d["host"])
    assert any(len(hosts) >= 2 for hosts in by_ip.values())
    assert any(d["cache_hit"] for d in sres.tls)
    # engine cache table: one row per distinct IP ever scanned
    cache = {r.ip for r in eng.scan_cache_df().collect()}
    assert cache == set(sres.scan_cache)


def test_scan_versions_deterministic(runs):
    """Per-IP scan recomputed from the shared spec equals both engines."""
    eng, _ = runs
    for r in eng.scan_cache_df().collect():
        exp = {v: spec.tls_scan_of(r.ip, v) for v in spec.tls_versions_of_ip(r.ip)}
        assert _norm_scan(r.scan) == _norm_scan(exp)
        assert r.connect_ok == any(ok for ok, _ in exp.values())
