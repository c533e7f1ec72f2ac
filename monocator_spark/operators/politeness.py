"""Politeness gate + wave selection (SURVEY.md §2 O1, O5, O6, O7).

Reference analogues: `BlacklistEntry`/`BlackListRepository`
(/root/reference/src/TODO.MD:11-13), per-module gating + `web.max_pages`
budget (/root/reference/src/TODO.MD:57-76), Mercator per-host politeness
[canon].

All JVM-side: the robots longest-prefix match is a Catalyst higher-order
function over the per-host rules array (no UDF), the blacklist is a
broadcast filter, and the per-host quota is a *salted two-phase* window
rank so a mega-host owning 30% of the frontier cannot pin a single shuffle
partition (north_star: "salted window-ranked DataFrame batches to defeat
host-key skew").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from monocator_spark import spec

# longest-prefix-wins, allow-wins-ties (RFC 9309): struct ordering on
# (prefix_len, allow) makes array_max pick exactly that rule.
_ROBOTS_ALLOWED = (
    "coalesce(array_max(transform("
    "  filter(robots_rules, r -> startswith(parse_url(url_norm, 'PATH'), r.path_prefix)),"
    "  r -> struct(length(r.path_prefix) AS l, r.allow AS a)"
    ")).a, true)"
)


def gate(pending: DataFrame, host_state: DataFrame, cfg: spec.CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """→ (schedulable, denied). host_state is small (O(hosts)) → broadcast."""
    hs = F.broadcast(
        host_state.select("host", "robots_rules", "budget_per_epoch", "blacklisted")
    )
    joined = pending.join(hs, "host", "left").withColumn(
        "quota",
        F.least(F.lit(cfg.per_host_quota), F.coalesce("budget_per_epoch", F.lit(cfg.per_host_quota))),
    )
    denied = joined.where(
        F.coalesce("blacklisted", F.lit(False)) | ~F.expr(_ROBOTS_ALLOWED)
    ).select(
        "url_hash",
        "url_norm",
        F.when(F.coalesce("blacklisted", F.lit(False)), "blacklist")
        .otherwise("robots")
        .alias("reason"),
    )
    schedulable = joined.where(
        ~F.coalesce("blacklisted", F.lit(False)) & F.expr(_ROBOTS_ALLOWED)
    ).drop("robots_rules", "budget_per_epoch", "blacklisted")
    return schedulable, denied


# Waves larger than this use the range-partitioned distributed rank; below
# it the single-partition window is cheaper (and is what the unit fixtures
# exercise). Both paths produce identical rows — pinned by
# tests/test_wave_paths.py.
DISTRIBUTED_RANK_MIN_WAVE = 20_000


def select_wave(
    schedulable: DataFrame, cfg: spec.CrawlConfig, persisted: list | None = None
) -> DataFrame:
    """Per-host top-quota, then global (priority DESC, url_hash ASC) cap.

    Phase 1 ranks within (host, salt) — any row in a host's true top-q is in
    the top-q of its salt bucket, so the pre-filter is lossless while
    splitting a hot host across ``salt_per_host`` partitions. Phase 2 ranks
    the ≤ salt_per_host×quota survivors per host exactly. The global sort
    feeds ``limit(wave_size)``; wave_pos is a single-partition window over
    at most wave_size rows (bounded by construction, so no scale concern).
    """
    order = [F.col("priority").desc(), F.col("url_hash").asc()]
    salted = schedulable.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(cfg.salt_per_host)).cast("int")
    )
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    pre = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= F.col("quota"))
        .drop("rn1", "salt")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    quota_rows = (
        pre.withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") <= F.col("quota"))
        .drop("rn2", "quota")
    )
    if cfg.wave_size >= DISTRIBUTED_RANK_MIN_WAVE:
        return _ranked_distributed(quota_rows, cfg.wave_size, persisted)
    wave = quota_rows.orderBy(*order).limit(cfg.wave_size)
    return wave.withColumn(
        "wave_pos", F.row_number().over(Window.orderBy(*order)) - 1
    )


def _ranked_distributed(
    quota_rows: DataFrame, wave_size: int, persisted: list | None = None
) -> DataFrame:
    """Global rank + cap without a single-partition sort.

    ``orderBy().limit(n)`` for a large n falls back to a total sort whose
    global-limit (and the wave_pos window after it) funnels every row
    through one partition. Instead: range-partition on the total order,
    sort within partitions, then assign
    ``wave_pos = partition_offset + local index`` via ``mapInPandas`` —
    offsets come from one tiny per-partition count job. The global rank is
    exact for ANY range boundaries, so the sampled boundary placement and
    the parallelism level never affect the result rows, only which
    partition ranks them — determinism across local[8]/local[32] is
    preserved (BENCH gate).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    order = [F.col("priority").desc(), F.col("url_hash").asc()]
    spark = quota_rows.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (
        quota_rows.repartitionByRange(parts, *order)
        .sortWithinPartitions(*order)
        .cache()
    )
    if persisted is not None:
        persisted.append(part)
    counts = (
        part.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    offsets = np.zeros(parts + 1, dtype=np.int64)
    for r in counts:
        offsets[r["pid"] + 1] = r["count"]
    offsets_list = np.cumsum(offsets).tolist()

    # fresh StructType — StructType.add would mutate the DataFrame's own
    # cached schema object and corrupt self.columns
    out_schema = StructType(
        list(part.schema.fields) + [StructField("wave_pos", LongType())]
    )
    cols = [f.name for f in out_schema.fields]

    def assign(it):
        from pyspark import TaskContext

        base = offsets_list[TaskContext.get().partitionId()]
        done = 0
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["wave_pos"] = np.arange(base + done, base + done + n, dtype=np.int64)
            done += n
            yield pdf[cols]

    ranked = part.mapInPandas(assign, out_schema)
    return ranked.where(F.col("wave_pos") < wave_size)
