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


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (round 13)
# ---------------------------------------------------------------------------

#: Per-event-type inactivity gap: transactional events close sessions
#: fast, browsing events slowly — the per-activity session policy real
#: clickstream pipelines run (a purchase ends intent quickly; a view
#: keeps the session alive longest).
_DYN_GAPS = (("purchase", 10), ("click", 20), ("error", 15))
_DYN_DEFAULT_MIN = 30


def dynamic_session_gap(col: str = "event_type"):
    """The per-event gap expression shared by the batch face, the
    streaming face, and (as SQL CASE) the oracle."""
    # STRING interval literals, not INTERVAL expressions: session_window's
    # dynamic-gap overload requires CalendarIntervalType, and a string
    # branch is cast there while `INTERVAL 10 MINUTES` yields the
    # non-castable DayTimeIntervalType (AnalysisException).
    expr = None
    for etype, minutes in _DYN_GAPS:
        lit = F.lit(f"{minutes} minutes")
        branch = F.when(F.col(col) == etype, lit)
        expr = branch if expr is None else expr.when(F.col(col) == etype, lit)
    return expr.otherwise(F.lit(f"{_DYN_DEFAULT_MIN} minutes"))


_DYN_GAP_SQL = (
    "CASE event_type "
    + " ".join(f"WHEN '{e}' THEN INTERVAL {m} MINUTE" for e, m in _DYN_GAPS)
    + f" ELSE INTERVAL {_DYN_DEFAULT_MIN} MINUTE END"
)


@query(
    "s19_dynamic_session_gap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value, ts + {_DYN_GAP_SQL} AS w_end
      FROM events
    ), e AS (
      SELECT user_id, ts, value, w_end,
             MAX(w_end) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prev_end
      FROM g
    ), s AS (
      SELECT user_id, ts, value, w_end,
             SUM(CASE WHEN prev_end IS NULL OR ts > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM s_src
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(w_end) AS session_end,
           COUNT(*) AS n_events,
           {sql_exact_sum('value', 'total_value')}
    FROM s GROUP BY user_id, sid
    """.replace("FROM s_src", "FROM e"),
)
def s19_dynamic_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC per-event inactivity gap
    (``session_window(ts, <column expression>)`` — the Structured
    Streaming API face s3's fixed 30-minute gap cannot exercise):
    purchases close a session after 10 idle minutes, clicks after 20,
    errors after 15, everything else after 30. Each event contributes a
    candidate window [ts, ts + gap(event)); overlapping candidates merge,
    so session_end is the MAX of member (ts + gap) — not last-event +
    constant — and the merge rule is non-strict at the boundary (an
    event at exactly the running end joins, matching s3's empirically
    verified fixed-gap semantics).

    Oracle: gaps-and-islands generalized to variable gaps — the running
    session end is a cumulative MAX of (ts + gap) over preceding events
    (a constant-gap island oracle compares against lag(ts) only and is
    WRONG here: a long-gap event can hold the session open across a
    short-gap successor). Duplicate (user_id, ts) rows leave the window
    order ambiguous but not the session MEMBERSHIP: a tied row's
    candidate end is ≥ ts, so ties never break sessions in any order.

    Scale: identical shape to s3 — one (user, session) keyed aggregation;
    in streaming mode the state is one open session per user bounded by
    the watermark horizon; the gap expression is row-local codegen.
    tests/test_streaming.py runs the REAL watermarked stream face
    (engine.session_counts_dynamic) and cross-checks it against this
    batch plan."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", dynamic_session_gap()).alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
