"""Scan modules: engine == simulator on a world where several hosts share
an IP (the FullScanCache.find(ip) semantics,
/root/reference/src/TODO.MD:41: co-hosted hosts reuse one TLS scan).
Covers O12 TLS fan-out + O15-fringe certificate chains, the O8 DNS
prefixes/rrtypes fan-out (TODO.MD:57-59), and the SMTP module
(TODO.MD:76) — all VisitRequest modules, each behind its flag.
"""

import pytest

from monocator_spark import spec
from monocator_spark.datagen import corpus as dg
from monocator_spark.plans.epoch import CrawlEngine
from monocator_spark.sim.simulator import ReferenceSimulator
from monocator_spark.sources.store import SnapshotStore

N_IMAGES, N_HOSTS, N_SEEDS = 150, 8, 25
# n_ips = max(4, 8//3) = 4 → 8 hosts over 4 IPs: co-hosting guaranteed
CFG = spec.CrawlConfig(
    n_images=N_IMAGES, n_hosts=N_HOSTS, wave_size=30,
    tls_scan=True, dns_scan=True, smtp_scan=True,
)


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


def _norm_chain(chain) -> tuple | None:
    """certificates array → hashable; engine elements are Rows, simulator
    elements are dicts — both expose subject/issuer/not_after."""
    if chain is None:
        return None
    out = []
    for c in chain:
        d = c.asDict() if hasattr(c, "asDict") else c
        out.append((d["subject"], d["issuer"], int(d["not_after"])))
    return tuple(out)


def test_certificate_chains_match(runs):
    """O15 fringe: the array-of-struct chain column (TODO.MD:15-17,50) —
    present iff the scan connected, linked leaf→root, equal to the
    simulator's and to spec.cert_chain_of."""
    eng, sres = runs
    got = {
        (r.host, r.epoch): _norm_chain(r.certificates)
        for r in eng.tls_df().collect()
    }
    exp = {
        (d["host"], d["epoch"]): _norm_chain(d["certificates"])
        for d in sres.tls
    }
    assert got == exp and got
    # presence ≡ connect_ok (the Optional<List<Certificate>> analogue)
    for r in eng.tls_df().collect():
        assert (r.certificates is not None) == r.connect_ok
        assert _norm_chain(r.certificates) == _norm_chain(
            spec.cert_chain_of(r.ip)
        )
    # chain linkage: element k's issuer is element k+1's subject
    for v in set(got.values()):
        if v:
            for k in range(len(v) - 1):
                assert v[k][1] == v[k + 1][0]
            assert v[-1][1].startswith("CN=root-")


def test_cert_chain_column_grid(spark):
    """Catalyst cert_chain_col == spec.cert_chain_of over an IP grid wide
    enough to hit BOTH branches (null chain for never-connected IPs) and
    every depth 1..CERT_MAX_DEPTH."""
    from monocator_spark.operators import scan as scanop

    ips = list(range(200))
    out = scanop.tls_scan_ips(
        spark.createDataFrame([(ip,) for ip in ips], "ip long")
    )
    got = {r.ip: _norm_chain(r.certificates) for r in out.collect()}
    exp = {ip: _norm_chain(spec.cert_chain_of(ip)) for ip in ips}
    assert got == exp
    vals = set(got.values())
    assert None in vals  # never-connected branch hit
    depths = {len(v) for v in vals if v}
    assert depths == set(range(1, spec.CERT_MAX_DEPTH + 1))


def _norm_records(recs) -> tuple:
    out = []
    for r in recs:
        d = r.asDict() if hasattr(r, "asDict") else r
        out.append((d["prefix"], d["rrtype"], d["value"], int(d["ttl"])))
    return tuple(out)


def test_dns_rows_match(runs):
    """O8 completion: per-(host, prefix, rrtype) record sets (TODO.MD:58-59),
    host-keyed cache, engine == simulator row-for-row."""
    eng, sres = runs
    got = {
        (r.host, r.epoch, r.cache_hit, r.n_records, _norm_records(r.records))
        for r in eng.dns_df().collect()
    }
    exp = {
        (d["host"], d["epoch"], d["cache_hit"], d["n_records"],
         _norm_records(d["records"]))
        for d in sres.dns
    }
    assert got == exp and got
    assert any(d["cache_hit"] for d in sres.dns)  # cache path exercised
    # spec parity + at least one NXDOMAIN'd pair somewhere
    full_grid = len(spec.DNS_PREFIXES) * len(spec.DNS_RRTYPES)
    sizes = set()
    for r in eng.dns_df().collect():
        assert _norm_records(r.records) == _norm_records(
            spec.dns_records_of(r.host)
        )
        sizes.add(r.n_records)
    assert any(s < full_grid for s in sizes)


def test_smtp_rows_match(runs):
    """SMTP module (TODO.MD:76): per-IP banner grab with the O13 cache —
    co-hosted hosts share one probe; engine == simulator."""
    eng, sres = runs
    got = {
        (r.host, r.ip, r.port, r.connect_ok, r.banner, r.cache_hit, r.epoch)
        for r in eng.smtp_df().collect()
    }
    exp = {
        (d["host"], d["ip"], d["port"], d["connect_ok"], d["banner"],
         d["cache_hit"], d["epoch"])
        for d in sres.smtp
    }
    assert got == exp and got
    for r in eng.smtp_df().collect():
        assert {
            "port": r.port, "connect_ok": r.connect_ok, "banner": r.banner
        } == spec.smtp_probe_of(r.ip)


def test_scan_modules_do_not_perturb_crawl(runs):
    """Enabling DNS/TLS/SMTP must not change scheduling: the crawl order
    with every module on equals the order with all of them off."""
    _, sres = runs
    import dataclasses

    lean = dataclasses.replace(
        CFG, tls_scan=False, dns_scan=False, smtp_scan=False
    )
    sim = ReferenceSimulator(
        dg.build_corpus(N_IMAGES).to_dict("records"),
        dg.build_host_state(N_HOSTS, N_IMAGES).to_dict("records"),
        lean,
    )
    base = sim.run(dg.build_seeds(N_SEEDS, N_IMAGES, N_HOSTS)["url"].tolist())
    assert [d["url_hash"] for d in base.order] == [
        d["url_hash"] for d in sres.order
    ]
