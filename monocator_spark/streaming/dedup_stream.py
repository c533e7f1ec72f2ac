"""Streaming URL-seen dedup (SURVEY.md §2 O4, Structured Streaming form).

The batch engine dedups discovered URLs with a sharded Bloom pre-filter +
exact-confirm anti-join against the persisted ``seen`` table
(`operators/dedup.py`). On a live cluster the same semantics run as a
Structured Streaming job over the discovery feed. Two entry points, same
split as `streaming/windows.py`:

* ``first_seen_drain`` — BOUNDED oracle surface: drain the feed with
  ``Trigger.AvailableNow`` into a complete-mode memory sink computing
  ``url_key → (first_seen, last_seen, n_dups)``. min/max/count are
  processing-order-insensitive, so on a static input the result is exactly
  the batch groupBy and DuckDB hash-verifies the streaming plan end to end
  (``queries/streamingops.py::dedup_stream_first_seen``). This is also the
  crawl's ``seen`` ledger semantics: when a URL first appeared and how many
  duplicate discoveries were suppressed.
* ``start_dedup_stream`` — the UNBOUNDED deployment shape:
  ``withWatermark(ts) → dropDuplicatesWithinWatermark(url_key)`` appended
  to a parquet sink. The first row per key within the watermark horizon is
  emitted, later duplicates are dropped, and — the part bounded state
  requires — a key re-arriving after the watermark passed its horizon is
  emitted AGAIN (state was evicted). tests/test_streaming.py pins all
  three behaviours file-by-file.

Scale notes: dropDuplicatesWithinWatermark keys state on url_key; state
size is O(keys seen within the watermark horizon), not O(all keys ever) —
the bounded-state property that makes streaming dedup deployable at a
100 TB/day discovery feed, at the price the crawl accepts anyway (the
batch path's TTL eviction, `CrawlEngine.evict_seen`, makes the same
trade). The dedup itself is a hash shuffle on url_key — the same key the
batch anti-join shuffles on.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

# stand-in discovery key synthesized from the events feed (testdata carries
# no URL stream): deterministic, collision-rich (many events share a
# (user, type) pair → real duplicate pressure)
_URL_KEY = "concat('u', cast(user_id as string), '/', event_type)"


def _first_seen_agg(src: DataFrame) -> DataFrame:
    """url_key → first_seen/last_seen/n_dups. Timestamps leave as formatted
    strings for the same cross-engine reason as the window rollup."""
    return (
        src.select(F.expr(_URL_KEY).alias("url_key"), "ts")
        .groupBy("url_key")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )


def first_seen_drain(spark: SparkSession, events_path: str) -> DataFrame:
    """Drain ``events_path`` through the streaming first-seen aggregate and
    return the final (batch-equivalent) result."""
    schema = spark.read.parquet(events_path).schema  # footer read only
    if os.path.isfile(events_path):
        # file stream source needs a dir/glob; one-char class = exact file
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"
    src = spark.readStream.schema(schema).parquet(events_path)
    name = f"dedup_stream_{uuid.uuid4().hex[:12]}"
    q = (
        _first_seen_agg(src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
):
    """Start the unbounded dedup: watermark-bounded state, append sink.

    Returns the StreamingQuery; callers step it with ``AvailableNow``
    restarts against the same checkpoint (the tests' cadence). Semantics
    (Spark's dropDuplicatesWithinWatermark contract): a duplicate is
    dropped iff its event time is within the watermark delay of the first
    row's; once the watermark passes ``first_ts + delay`` the key's state
    is evicted and a later arrival is emitted as a fresh first-seen.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    deduped = (
        src.select(F.expr(_URL_KEY).alias("url_key"), "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["url_key"])
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
