"""Driver-surface streaming ops (SURVEY.md §2 O17, Structured Streaming form).

``tumbling_window_stream`` runs the O17 metrics rollup as a REAL Structured
Streaming query — file-source ``readStream`` over the events table, tumbling
``window(ts, '1 hour')`` aggregate, ``Trigger.AvailableNow`` draining into a
memory sink — and returns the final result as a batch DataFrame. On a static
input the complete-mode output is exactly the batch groupBy, so the standard
DuckDB oracle (identical to the batch ``tumbling_window``'s) hash-verifies
the streaming plan end to end. The unbounded append-mode + watermark form of
the same aggregation (late-row dropping, exactly-once window emission) is
pinned by tests/test_streaming.py, where its behaviour is observable.
"""

from __future__ import annotations


def q_tumbling_window_stream(spark, sf_dir):
    from monocator_spark.streaming.windows import tumbling_event_counts

    return tumbling_event_counts(spark, f"{sf_dir}/events.parquet")


SQL_TUMBLE_STREAM = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


STREAMING = {
    "tumbling_window_stream": (q_tumbling_window_stream, SQL_TUMBLE_STREAM),
}
