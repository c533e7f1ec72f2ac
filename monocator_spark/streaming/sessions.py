"""Gap-based session tracking — batch form + the custom stateful
streaming operator (``applyInPandasWithState``).

The crawl engine's per-host politeness state (``host_next`` in
``plans/epoch.py``) is epoch-granular; a live deployment also wants
event-granular session tracking over the activity stream — "which
entities are active right now, when did their burst start, how many
events so far" — which is the canonical custom-stateful-streaming shape:
per-key state that built-in windowed aggregation can't express because
the window boundary depends on the DATA (the gap), not the clock grid.

Two implementations of the same semantics (a session = a maximal run of
one entity's events where consecutive gaps are < ``gap``):

* ``sessionize_batch`` — pure Catalyst: ``lag`` gap flags → running-sum
  session ids → groupBy. Linear, two window passes over one
  hash-partition by entity, no UDF. This is the oracle-checked
  ``queries()`` surface (DuckDB runs the identical SQL).
* ``start_session_stream`` — the unbounded twin:
  ``groupBy(entity).applyInPandasWithState`` with per-key state
  (session_start, last_ts, n_events) and **event-time timeouts**: a
  session closes either when a later event of the same key arrives past
  the gap (emitted immediately) or when the watermark passes
  ``last_ts + gap`` (state times out, session emitted, state removed).
  Closed-session rows append to a parquet sink. On any bounded prefix of
  the stream, the emitted rows are exactly the batch sessionizer's
  sessions whose closure the watermark has proven — pinned by
  tests/test_streaming.py.

Scale: state is O(active keys), not O(events) — each key holds three
scalars, evicted on timeout, which is what lets a 1000-executor stream
track billions of entities; the shuffle is the same entity-keyed
hash-partition the batch form does once per job, done once per
micro-batch on the delta only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", StringType()),
        StructField("session_end", StringType()),
        StructField("n_events", LongType()),
        StructField("duration_ms", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
_FMT = "yyyy-MM-dd HH:mm:ss"


def sessionize_batch(events: DataFrame, gap_minutes: int) -> DataFrame:
    """Batch gap sessionization: lag → gap flag → running session id →
    groupBy. ``event_id`` tie-breaks equal timestamps so the session split
    is deterministic on both engines."""
    # events.ts is TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the cast to TIMESTAMP is a micros-identity
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60_000_000  # integer µs: exact on both engines
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
            > F.lit(gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        flagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("start_ts", _FMT).alias("session_start"),
            F.date_format("end_ts", _FMT).alias("session_end"),
            "n_events",
            (
                F.unix_millis(F.col("end_ts").cast("timestamp"))
                - F.unix_millis(F.col("start_ts").cast("timestamp"))
            ).alias(
                "duration_ms"
            ),
        )
    )


def _session_rows(start: pd.Timestamp, end: pd.Timestamp, uid: int, n: int):
    return pd.DataFrame(
        {
            "user_id": [int(uid)],
            "session_start": [start.strftime("%Y-%m-%d %H:%M:%S")],
            "session_end": [end.strftime("%Y-%m-%d %H:%M:%S")],
            "n_events": [int(n)],
            "duration_ms": [int((end.value - start.value) // 1_000_000)],
        }
    )


def _make_update_fn(gap_minutes: int):
    gap_us = gap_minutes * 60_000_000  # µs, same unit the batch twin compares in
    gap_ms = gap_minutes * 60_000

    def update(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            yield _session_rows(pd.Timestamp(start), pd.Timestamp(last), uid, n)
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n = state.get
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        else:
            start = last = None
            n = 0
        for ts in rows["ts"]:
            ts = pd.Timestamp(ts)
            if last is not None and (ts.value - last.value) // 1_000 > gap_us:
                yield _session_rows(start, last, uid, n)
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        state.update((start.to_pydatetime(), last.to_pydatetime(), int(n)))
        # close via event time: when the watermark passes last + gap the
        # session provably cannot grow. +1 ms: the timeout API is ms-grained
        # while the gap check is µs-grained, so round the deadline UP past
        # any sub-ms tail. Spark also requires it strictly past the current
        # watermark.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(last.value // 1_000_000 + gap_ms + 1, wm + 1)
        )

    return update


def start_session_stream(
    spark,
    source_dir: str,
    schema,
    sink_dir: str,
    checkpoint_dir: str,
    gap_minutes: int,
    max_files_per_trigger: int | None = 1,
):
    """The unbounded twin: closed sessions append to ``sink_dir``.

    Watermark delay 0: the watermark is the max event time of the previous
    micro-batch, so feeding time-ordered files one per trigger makes every
    timeout step deterministic (same cadence note as
    ``windows.start_append_stream``)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir).withWatermark("ts", "0 seconds")
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(gap_minutes),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
