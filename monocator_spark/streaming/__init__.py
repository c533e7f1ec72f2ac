"""Structured Streaming surface of the crawl engine.

Three jobs live here:

* ``enqueue_stream.StreamingEnqueue`` — the continuous-discovery twin of the
  batch enqueue path (O1-O4): a file-source ``readStream`` over a seed-feed
  directory, run through the SAME canonicalize / hash / dedup / politeness
  operators inside ``foreachBatch``, appending to the SAME SnapshotStore
  state tables the epoch pipeline reads, with idempotent (exactly-once)
  commits across micro-batch replays.
* ``windows.tumbling_event_counts`` — the O17 metrics rollup as a
  watermarked streaming aggregation, runnable in bounded mode
  (``Trigger.AvailableNow`` + memory sink) so the driver's DuckDB oracle can
  hash-compare its output against the batch equivalent.
* ``sessions`` — gap-based session tracking: the custom stateful operator
  (``applyInPandasWithState``, per-key state + event-time timeouts) and its
  pure-Catalyst batch twin ``sessionize_batch`` (the oracle-checked
  ``session_gap_user`` query).
* ``dedup_stream`` — the URL-seen dedup (O4) in streaming form: a bounded
  first-seen/duplicate-count drain (the oracle surface) and the unbounded
  watermark-bounded-state ``dropDuplicatesWithinWatermark`` deployment
  shape.
"""

from monocator_spark.streaming.dedup_stream import first_seen_drain  # noqa: F401
from monocator_spark.streaming.enqueue_stream import StreamingEnqueue  # noqa: F401
from monocator_spark.streaming.sessions import sessionize_batch  # noqa: F401
from monocator_spark.streaming.windows import tumbling_event_counts  # noqa: F401
