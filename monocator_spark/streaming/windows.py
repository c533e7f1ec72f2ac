"""Streaming tumbling-window aggregation (O17 metrics rollup, stream form).

The batch engine emits per-epoch metrics rollups; on a live cluster the same
rollup runs as a Structured Streaming job over the event feed — watermarked
tumbling windows, late rows beyond the watermark dropped, results appended
to a sink as windows finalize. Reference analogue: the per-epoch metrics
tables of the crawl loop (SURVEY.md §2 O17), re-expressed as
``readStream → window(ts) → agg → writeStream``.

Two entry points:

* ``tumbling_event_counts`` — BOUNDED run: ``Trigger.AvailableNow`` + a
  complete-mode memory sink, so the stream drains the source and the result
  comes back as an ordinary DataFrame. This is the driver-oracle surface:
  on a static input, complete-mode output ≡ the batch groupBy, which DuckDB
  can verify (``queries/streamingops.py``).
* ``start_append_stream`` — the UNBOUNDED shape: append output mode with a
  real watermark, parquet sink + checkpoint. Windows are emitted exactly
  once, when the watermark passes their end; rows later than the watermark
  are dropped (pinned by tests/test_streaming.py's late-row case). This is
  the form a deployment runs; the bounded form above exists so its
  aggregation logic is oracle-checkable.

Scale notes: the windowed aggregate is a standard partial-agg shuffle keyed
on (window, event_type) — map-side combined, no skew concern because the
window key rotates. State size in append mode is O(open windows × group
cardinality), bounded by the watermark horizon, which is exactly the
knob a 1000-executor deployment tunes (longer watermark = more state,
fewer late drops).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

_CENTS = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731


def _windowed_agg(src: DataFrame, watermark: str | None) -> DataFrame:
    """window(ts, 1 hour) × event_type → (n, sum_value_cents).

    The hour bucket is emitted as a formatted string for the same reason the
    batch twin does it (queries/relational.py::q_tumbling_window): parquet
    timestamps are µs, Spark/pandas round-trip them as ns, and a string
    sidesteps any timestamp-unit mismatch in cross-engine value hashing.
    """
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS("value")).alias("sum_value_cents"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            ),
            "event_type",
            "n",
            "sum_value_cents",
        )
    )


def tumbling_event_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Drain ``events_path`` through a streaming tumbling-window aggregate
    and return the final result as a batch DataFrame.

    ``AvailableNow`` processes every file currently in the source then
    stops; complete output mode re-emits the full aggregate on the last
    batch, so the memory sink holds exactly the batch-equivalent result
    (watermarks never drop rows in complete mode — late-data semantics are
    exercised by the append-mode path below, where they are observable).
    The memory sink is driver-resident and small: O(hours × event types).
    """
    schema = spark.read.parquet(events_path).schema  # footer read only
    if os.path.isfile(events_path):
        # the file stream source monitors a directory or glob, never a bare
        # file (it infers basePath from the pattern and requires a dir);
        # wrapping the last char in a one-char class makes any file path a
        # glob matching exactly that file
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"
    src = spark.readStream.schema(schema).parquet(events_path)
    name = f"tumbling_stream_{uuid.uuid4().hex[:12]}"
    q = (
        _windowed_agg(src, watermark=None)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def start_append_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
):
    """Start the unbounded form: append mode + watermark + parquet sink.

    Returns the StreamingQuery; the caller drives it (tests use
    ``Trigger.AvailableNow`` restarts against the same checkpoint to step
    the watermark deterministically file-by-file). A window's row is
    written exactly once, after the watermark passes its end; input rows
    older than the watermark are dropped on arrival.

    Watermark fine print (Spark 3.4+ watermark propagation): each micro-batch
    filters LATE records with the previous batch's watermark and evicts /
    emits finalized windows with the current one. A record is therefore
    guaranteed dropped only once the watermark passed it a full batch
    earlier — tests/test_streaming.py pins exactly this cadence.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    return (
        _windowed_agg(src, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
