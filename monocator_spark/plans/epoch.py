"""The epoch pipeline — SURVEY.md §3.1's Spark mapping, end to end.

One scheduling epoch = one batch job over the state tables:

    frontier(pending) → blacklist/robots gate → salted per-host quota →
    global wave (priority DESC, url_hash ASC) → corpus join ("fetch") →
    Arrow validation → outlink expansion → Bloom+exact dedup →
    atomic multi-table commit (SnapshotStore manifest = the checkpoint)

Reference lifecycle mirrored: MainCrawler.collectData → module visits →
VisitService.save transaction (/root/reference/src/TODO.MD:36-51).

Determinism contract (BENCH gate): every wave is totally ordered by
(priority DESC, url_hash ASC) with no possible ties, so the crawl order and
URL-seen set are byte-identical at local[8] and local[32] and equal to the
pure-Python reference simulator's.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from monocator_spark import spec
from monocator_spark.operators import dedup, enqueue, fetch, outlinks, politeness
from monocator_spark.sim.simulator import MISSING, OK
from monocator_spark.sources.store import SnapshotStore

FRONTIER_SCHEMA = StructType(
    [
        StructField("url_norm", StringType()),
        StructField("url_hash", LongType()),
        StructField("host", StringType()),
        StructField("priority", DoubleType()),
        StructField("depth", IntegerType()),
        StructField("retries", IntegerType()),
    ]
)


@dataclass
class RunStats:
    epochs: int = 0
    scheduled: int = 0
    fetched: int = 0
    failed: int = 0
    elapsed_sec: float = 0.0
    per_epoch: list[dict] = field(default_factory=list)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        world_dir: str,
        cfg: spec.CrawlConfig,
    ):
        self.spark = spark
        self.store = store
        self.world_dir = world_dir
        self.cfg = cfg
        self.corpus = spark.read.parquet(f"{world_dir}/corpus")
        # host_state is O(hosts) — tiny next to the frontier; cache + broadcast
        self.host_state = spark.read.parquet(f"{world_dir}/host_state").cache()

    # -- bootstrap -------------------------------------------------------------
    def bootstrap(self) -> None:
        """Epoch-0 commit: seeds → frontier, seen set, Bloom shards."""
        seeds = self.spark.read.parquet(f"{self.world_dir}/seeds").withColumn(
            "depth", F.lit(0)
        )
        frontier = enqueue.dedup_within_batch(enqueue.prepare_candidates(seeds)).cache()
        seen = frontier.select("url_hash", "url_norm")
        bloom = dedup.build_shards(frontier.select("url_hash"), self.cfg)
        self.store.stage_overwrite("frontier", frontier, 0)
        self.store.stage_append("seen", seen, 0)
        self.store.stage_overwrite("bloom", dedup.merge_shards(None, bloom, self.cfg), 0)
        self.store.commit(0, {"crawl_epoch": -1})
        frontier.unpersist()

    # -- one epoch ---------------------------------------------------------------
    def run_epoch(self, epoch: int) -> dict:
        import os

        timing: dict[str, float] = {}
        _debug = bool(os.environ.get("MONO_EPOCH_TIMING"))
        _last = [time.monotonic()]

        def _mark(label: str) -> None:
            if _debug:
                now = time.monotonic()
                timing[label] = round(now - _last[0], 2)
                _last[0] = now

        cfg = self.cfg
        # every cached df created this epoch lands here; released in finally
        persisted: list = []
        pending = self.store.load(self.spark, "frontier").cache()
        persisted.append(pending)
        seen = self.store.load(self.spark, "seen")
        bloom = self.store.load(self.spark, "bloom")

        schedulable, denied = politeness.gate(pending, self.host_state, cfg)
        # schedulable feeds both the wave selection and the next-frontier
        # anti-join; caching avoids re-running the robots gate scan twice.
        schedulable = schedulable.cache()
        persisted.append(schedulable)
        wave = politeness.select_wave(schedulable, cfg, persisted).cache()
        persisted.append(wave)
        n_wave = wave.count()
        _mark("wave_select")
        if n_wave == 0:
            for df in persisted:
                df.unpersist()
            return {"epoch": epoch, "scheduled": 0, "fetched": 0, "failed": 0,
                    "frontier_size": 0}

        t0 = time.monotonic()
        fetched = fetch.fetch_wave(
            wave.select(*enqueue.FRONTIER_COLS, "wave_pos"), self.corpus, cfg,
            persisted,
        ).persist()
        persisted.append(fetched)

        ok = fetched.where(F.col("status") == OK)
        retry = (
            fetched.where(
                (F.col("status") == MISSING) & (F.col("retries") < cfg.max_retries)
            )
            .select(
                "url_norm", "url_hash", "host", "priority", "depth",
                (F.col("retries") + 1).alias("retries"),
            )
        )
        perm_failed = fetched.where(
            (F.col("status") != OK)
            & ~((F.col("status") == MISSING) & (F.col("retries") < cfg.max_retries))
        ).select("url_hash", "url_norm", "status", F.lit(epoch).alias("epoch"))

        # outlink discovery → shared enqueue path → dedup vs seen
        new_entries = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        lineage = None
        if cfg.follow_outlinks:
            raw_links = outlinks.expand_outlinks(ok.select("url_norm", "depth"), cfg)
            # cands is read twice (dedup + lineage tagging) and runs the
            # canonicalizer UDF — cache so the Arrow pass happens once.
            cands = enqueue.dedup_within_batch(enqueue.prepare_candidates(raw_links)).cache()
            persisted.append(cands)
            new_entries = dedup.filter_new(cands, seen, bloom, cfg).cache()
            persisted.append(new_entries)
            # per-partition lineage: dedup hit rate by host bucket (O17)
            tagged = cands.join(
                new_entries.select("url_hash", F.lit(1).alias("is_new")),
                "url_hash",
                "left",
            )
            lineage = (
                tagged.withColumn("partition_id", F.spark_partition_id())
                .withColumn(
                    "host_bucket",
                    F.pmod(F.xxhash64("host"), F.lit(spec.HOST_BUCKETS)).cast("int"),
                )
                .groupBy("partition_id", "host_bucket")
                .agg(
                    F.count(F.lit(1)).alias("urls_emitted"),
                    (F.count(F.lit(1)) - F.sum(F.coalesce("is_new", F.lit(0)))).alias("dedup_hits"),
                )
                .withColumn(
                    "dedup_hit_rate",
                    F.col("dedup_hits") / F.col("urls_emitted"),
                )
                .withColumn("epoch", F.lit(epoch))
            )

        # next frontier: schedulable minus this wave, plus retries, plus new
        remaining = schedulable.select(*enqueue.FRONTIER_COLS).join(
            F.broadcast(wave.select("url_hash")), "url_hash", "left_anti"
        )
        next_frontier = remaining.unionByName(retry).unionByName(
            new_entries.select(*enqueue.FRONTIER_COLS)
        ).cache()  # materialized once: parquet write + frontier_size count
        persisted.append(next_frontier)

        # ---- stage + atomically commit the epoch (O15) ----
        # The frontier flush is run first: that single action materializes
        # every persisted intermediate in its lineage (corpus fetch +
        # validation, outlink dedup, the next frontier). The remaining table
        # flushes and the counts are then independent reads of those caches,
        # so they are submitted CONCURRENTLY — Spark schedules them as
        # parallel jobs sharing the executor slots, which collapses the
        # epoch's serial stage-latency tail (a large win at every scale; on
        # a 1000-executor cluster these are parallel Iceberg table commits).
        st = self.store
        st.stage_overwrite("frontier", next_frontier, epoch + 1)
        _mark("write_frontier")

        flushes: list = [
            lambda: st.stage_append(
                "order",
                wave.select(
                    F.lit(epoch).alias("epoch"), "wave_pos", "url_norm", "url_hash"
                ),
                epoch + 1,
            ),
            lambda: st.stage_append(
                "fetched",
                ok.select(
                    "url_hash", "image_id", "bytes", "w", "h", "fmt", "caption",
                    "phash", F.lit(epoch).alias("fetch_epoch"), "wave_pos", "status",
                ),
                epoch + 1,
            ),
            lambda: st.stage_append("failed", perm_failed, epoch + 1),
            lambda: st.stage_append(
                "denied", denied.withColumn("epoch", F.lit(epoch)), epoch + 1
            ),
        ]
        if cfg.follow_outlinks:
            flushes += [
                lambda: st.stage_append(
                    "seen", new_entries.select("url_hash", "url_norm"), epoch + 1
                ),
                lambda: st.stage_overwrite(
                    "bloom",
                    dedup.merge_shards(
                        bloom, dedup.build_shards(new_entries.select("url_hash"), cfg), cfg
                    ),
                    epoch + 1,
                ),
            ]
            if lineage is not None:
                flushes.append(lambda: st.stage_append("lineage", lineage, epoch + 1))
        # counts ride the same pool: one job over the persisted fetch result
        status_counts: dict = {}
        sizes: dict = {}
        flushes += [
            lambda: status_counts.update(
                {
                    (r["status"], r["retries"]): r["n"]
                    for r in fetched.groupBy("status", "retries")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            ),
            lambda: sizes.update(frontier=next_frontier.count()),
        ]
        with ThreadPoolExecutor(max_workers=len(flushes)) as pool:
            for fut in [pool.submit(f) for f in flushes]:
                fut.result()  # re-raise any failure before committing
        n_fetched = sum(n for (s, _), n in status_counts.items() if s == OK)
        n_failed = sum(
            n
            for (s, r), n in status_counts.items()
            if s != OK and not (s == MISSING and r < cfg.max_retries)
        )
        frontier_size = sizes["frontier"]
        _mark("parallel_flush")
        m = {
            "epoch": epoch,
            "scheduled": n_wave,
            "fetched": n_fetched,
            "failed": n_failed,
            "frontier_size": frontier_size,
            "elapsed_ms": int((time.monotonic() - t0) * 1000),
        }
        import pyarrow as pa

        st.stage_append_local(
            "metrics",
            [m],
            pa.schema(
                [
                    ("epoch", pa.int32()),
                    ("scheduled", pa.int64()),
                    ("fetched", pa.int64()),
                    ("failed", pa.int64()),
                    ("frontier_size", pa.int64()),
                    ("elapsed_ms", pa.int64()),
                ]
            ),
            epoch + 1,
        )
        st.commit(epoch + 1, {"crawl_epoch": epoch})
        _mark("metrics_commit")
        if _debug:
            m["timing"] = timing
        for df in persisted:
            df.unpersist(blocking=True)
        return m

    # -- loop / resume -----------------------------------------------------------
    def run(self, max_epochs: int = 1000) -> RunStats:
        """Run (or resume — the last committed manifest is the checkpoint)."""
        t0 = time.monotonic()
        if self.store.last_epoch() is None:
            self.bootstrap()
        start = self.store.meta()["crawl_epoch"] + 1
        stats = RunStats()
        for epoch in range(start, start + max_epochs):
            m = self.run_epoch(epoch)
            if m["scheduled"] == 0:
                break
            stats.epochs += 1
            stats.scheduled += m["scheduled"]
            stats.fetched += m["fetched"]
            stats.failed += m["failed"]
            stats.per_epoch.append(m)
        stats.elapsed_sec = time.monotonic() - t0
        return stats

    # -- outputs for golden-file comparison ---------------------------------------
    def order_df(self) -> DataFrame:
        return self.store.load(self.spark, "order")

    def seen_df(self) -> DataFrame:
        return self.store.load(self.spark, "seen")

    def fetched_df(self) -> DataFrame:
        return self.store.load(self.spark, "fetched")
