"""Event-time windowed aggregation over ``events`` (SURVEY.md §2.10: the
reference has NO streaming — this subsystem is the Structured Streaming
extension; FIXTURES.md §B designates events as its input).

Each query here is the BATCH form of a streaming aggregation, using the
same ``window()``/``session_window()`` operators Structured Streaming
executes incrementally — identical semantics, which is the point: the
engine can backfill historically (batch) and serve continuously (stream,
see streaming.engine) from one definition. Tumbling/sliding windows have
DuckDB oracles; the streaming runtime itself is exercised in
tests/test_streaming.py with a file source + memory sink + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_sum, query, sql_exact_sum
from ..sources import load_table


@query(
    "s1_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_exact_sum('value', 'total_value')}
    FROM events
    GROUP BY window_start, event_type
    """,
)
def s1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window × event_type: counts and exact value sums.
    1-hour tumbling windows are epoch-aligned, hence equal to
    date_trunc('hour') — which is exactly what the oracle asserts.
    In streaming mode this plan + withWatermark is incremental state with
    map-side partial aggregation; keys are (window, type) so state size is
    bounded by windows retained × type cardinality."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), "total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "s2_sliding_window",
    oracle=f"""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP),
                     time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
                       - INTERVAL '30 minutes']) AS window_start,
             value
      FROM events
    )
    SELECT window_start, COUNT(*) AS n_events,
           {sql_exact_sum('value', 'total_value')}
    FROM expanded
    GROUP BY window_start
    """,
)
def s2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour wide, 30-minute slide): every event lands in
    exactly 2 windows. The oracle expands each event to its two window
    starts (30-minute grid floor and the one before) and re-aggregates —
    the relational definition of what ``window(ts, '1h', '30m')`` does."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), "total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


@query(
    "s3_session_window",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           {sql_exact_sum('value', 'total_value')}
    FROM s GROUP BY user_id, sid
    """,
)
def s3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-minute inactivity gap): Spark's native
    ``session_window`` operator. State per (user, open session) in
    streaming mode; sessions close when the watermark passes last+gap.

    Oracle: gaps-and-islands — a session breaks when the gap STRICTLY
    exceeds 30 minutes (verified empirically: Spark merges an event at
    exactly last+gap), session_end = last event + gap. Events with equal
    (user_id, ts) make lag() order ambiguous but the break flag is
    order-independent there (zero gap never breaks).
    tests/test_streaming.py additionally cross-checks per-user session
    counts against the same islands computation."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), "total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "s7_stream_dedup",
    oracle="""
    SELECT DISTINCT event_id, ts, user_id, event_type, value, props
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
)
def s7_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-once recovery from at-least-once delivery: the input is the
    events table delivered TWICE (union with itself — the batch model of
    a source that redelivers on retry), deduplicated on the unique
    ``event_id``. Batch face of ``engine.dedup_stream``
    (``dropDuplicatesWithinWatermark`` — state bounded by the watermark
    horizon instead of the corpus); the streaming run is measured in
    bench.py as ``stream_s7_dedup``.

    Deterministic despite dropDuplicates' arbitrary-row pick: duplicate
    groups contain only bit-identical rows. One hash shuffle on the
    uniform event_id key; map-side partial dedup keeps the shuffle near
    |distinct| rows."""
    events = load_table(spark, sf_dir, "events")
    redelivered = events.unionByName(events)
    return redelivered.dropDuplicates(["event_id"])
