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


_SESSION_GAP_MIN = 240  # 4h: the sf0.01 events table's median per-user gap
# is ~7.3h over a 30-day span, so 4h yields a real mix of multi-event
# sessions and splits (not all-singletons, not one-session-per-user)


def q_session_gap_user(spark, sf_dir):
    """Gap-based sessionization, batch form (`streaming/sessions.py`) —
    the oracle-checked half of the applyInPandasWithState session
    operator; the streaming twin is pinned equal on bounded prefixes by
    tests/test_streaming.py."""
    from monocator_spark.streaming.sessions import sessionize_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize_batch(ev, _SESSION_GAP_MIN)


SQL_SESSION_GAP = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > CAST({_SESSION_GAP_MIN} AS BIGINT) * 60000000 THEN 1
              ELSE 0 END
           AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events,
       epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms
FROM sess GROUP BY user_id, session_id
"""


def q_dedup_stream_first_seen(spark, sf_dir):
    """The crawl's URL-seen dedup (O4) as a REAL streaming query — bounded
    complete-mode drain whose min/max/count aggregate is processing-order-
    insensitive, hence batch-equivalent on a static input; the unbounded
    dropDuplicatesWithinWatermark form is pinned by tests/test_streaming.py
    where its evict/re-emit behaviour is observable."""
    from monocator_spark.streaming.dedup_stream import first_seen_drain

    return first_seen_drain(spark, f"{sf_dir}/events.parquet")


SQL_DEDUP_STREAM = """
SELECT 'u' || CAST(user_id AS VARCHAR) || '/' || event_type AS url_key,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
       COUNT(*) - 1 AS n_dups
FROM events GROUP BY 1
"""


STREAMING = {
    "tumbling_window_stream": (q_tumbling_window_stream, SQL_TUMBLE_STREAM),
    "session_gap_user": (q_session_gap_user, SQL_SESSION_GAP),
    "dedup_stream_first_seen": (q_dedup_stream_first_seen, SQL_DEDUP_STREAM),
}
