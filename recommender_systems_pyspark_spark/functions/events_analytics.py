"""Event-stream product analytics (SURVEY.md §2.13 round-3): retention
cohorts, RFM segmentation, multi-touch attribution, session statistics,
and triangle counting — the batch analytics a clickstream warehouse runs
daily over the same events table the streaming operators consume live.

Scale notes (events at 100 TB):
- Every query here is one or two shuffles keyed on ``user_id`` (150 at
  fixture scale, millions in production — uniform, no skew) or on a
  bounded derived key (cohort week, RFM bucket). Per-user windows are
  incremental running state, not per-user sorts of the whole table.
- Triangle counting is the one super-linear op: the pair-generation join
  is bounded by Σ deg(order)² — fine while orders have ~4-7 lines. The
  id-ordered orientation (a<b<c) counts each triangle exactly once and
  keeps the wedge join's probe side the smaller adjacency direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import with_global_ntile
from ..registry import exact_sum, query, sql_exact_sum, ts_ntz
from ..sources import tables


@query(
    "x_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_diff('day', TIMESTAMP '2024-01-01', MIN(ts)) // 7
               AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           date_diff('day', TIMESTAMP '2024-01-01', e.ts) // 7 AS active_week,
           COUNT(DISTINCT e.user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def x_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: cohort = week of first activity, cell =
    distinct users from that cohort active in each later week. Two
    aggregations on user_id — the first collapses to one row per user
    (broadcastable back), the second groups by the (cohort, week) pair
    whose cardinality is O(weeks²), so the final shuffle is tiny."""
    ev = tables(spark, sf_dir)["events"]
    epoch = ts_ntz("2024-01-01")
    week = lambda ts: F.floor(  # noqa: E731
        F.datediff(F.to_date(ts), F.to_date(epoch)) / 7
    )
    firsts = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .groupBy("cohort_week", week(F.col("ts")).alias("active_week"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("cohort_week", "active_week")
    )


@query(
    "x_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT user_id,
             date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01')
               AS recency_days,
             COUNT(*) AS frequency,
             {sql_exact_sum('value', 'monetary')}
      FROM events GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
           ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
           ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
    FROM rfm
    ORDER BY user_id
    """,
)
def x_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: one aggregate per user (recency vs a fixed
    anchor, frequency, exact monetary sum), then three NTILE(4) quartile
    scores. Every ntile ordering carries the unique user_id tiebreaker —
    without it equal metrics straddle bucket boundaries
    nondeterministically.

    The quartiles use :func:`with_global_ntile` — a distributed two-phase
    rank (range repartition + per-partition row_number + broadcast
    offsets) producing byte-identical NTILE output WITHOUT the
    single-partition global sort ``F.ntile().over(Window.orderBy(...))``
    compiles to (VERDICT r3 "What's wrong" #1). Three range shuffles of
    the already-tiny per-user aggregate, each fully parallel."""
    ev = tables(spark, sf_dir)["events"]
    anchor = F.lit("2024-02-01").cast("date")
    rfm = ev.groupBy("user_id").agg(
        F.datediff(anchor, F.to_date(F.max("ts"))).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("monetary"),
    )
    scored = with_global_ntile(
        rfm, 4, [F.col("recency_days").asc(), F.col("user_id")], "r_score"
    )
    scored = with_global_ntile(
        scored, 4, [F.col("frequency").desc(), F.col("user_id")], "f_score"
    )
    scored = with_global_ntile(
        scored, 4, [F.col("monetary").desc(), F.col("user_id")], "m_score"
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
    ).orderBy("user_id")


@query(
    "x_attribution_touch",
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type IN ('view', 'click')
                              THEN event_type END IGNORE NULLS)
               OVER w AS first_touch,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER w AS last_touch,
             COUNT(CASE WHEN event_type IN ('view', 'click') THEN 1 END)
               OVER w AS n_touches
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, first_touch, last_touch, n_touches
    FROM marked
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def x_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch attribution: for every purchase, the first and
    most recent preceding view/click by the same user, plus the touch
    count — all from ONE running window (rows unbounded→1 preceding,
    ordered by (ts, event_id) so timestamp ties can't flip the answer).
    No self-join: the classic join-per-conversion formulation shuffles
    events × purchases; the window is a single user-keyed shuffle and
    one ordered pass."""
    ev = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
            F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
            F.count(touch).over(w).alias("n_touches"),
        )
        .where(F.col("event_type") == "purchase")
        .drop("event_type")
        .orderBy("event_id")
    )


@query(
    "x_sessionize_stats",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), sessions AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             date_diff('microsecond', MIN(ts), MAX(ts)) // 1000000 AS dur_sec
      FROM s GROUP BY user_id, sid
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           CAST(SUM(dur_sec) AS BIGINT) AS total_dur_sec,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def x_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics on top of gaps-and-islands
    sessionization (same strict->30-min break convention the s3 streaming
    session operator was verified against): session count, event totals,
    longest session, summed duration, bounce count. Batch twin of the
    streaming session window — one user-keyed shuffle, two cheap
    aggregations over per-session rows."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts is TIMESTAMP_NTZ (no long cast). The break test compares the
    # exact interval (sub-second precision), matching the oracle's
    # `ts - lag(ts) > INTERVAL '30 minutes'`; a SECOND-truncated diff
    # would disagree for gaps in (1800s, 1801s).
    gap_break = F.lag("ts").over(w).isNull() | (
        (F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")
    )
    with_sid = ev.select(
        "user_id",
        "ts",
        F.sum(gap_break.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    # Duration floored to whole seconds FROM the exact microsecond diff on
    # both sides (DuckDB's date_diff('second', …) counts boundary
    # crossings instead — a 0.9s→1.1s span would differ).
    sessions = with_sid.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.floor(
            F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")) / 1000000
        ).alias("dur_sec"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum("dur_sec").alias("total_dur_sec"),
            F.sum((F.col("n_events") == 1).cast("int")).cast("bigint").alias("n_bounces"),
        )
        .orderBy("user_id")
    )


@query(
    "x_triangle_count",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT COUNT(*)
            FROM edges e1
            JOIN edges e2 ON e2.u = e1.v
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def x_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-occurrence graph (parts sharing an
    order are adjacent). Edges are id-oriented (u<v) so each triangle
    u<v<w is counted exactly once by the wedge join e1=(u,v), e2=(v,w),
    closed by e3=(u,w). Two shuffle joins over the deduplicated edge
    list; at 100 TB orient by (degree, id) instead of raw id so wedge
    generation is bounded by the LOW-degree endpoint (the standard
    skew-proofing for power-law graphs — same plan shape)."""
    li = tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    triangles = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return edges.agg(F.count("*").alias("n_edges")).crossJoin(triangles)


@query(
    "x_interval_overlap",
    oracle="""
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), sessions AS (
      SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
      FROM s GROUP BY user_id, sid
    ), pairs AS (
      SELECT a.user_id AS ua, a.sid AS sa, b.user_id AS ub
      FROM sessions a JOIN sessions b
        ON a.user_id < b.user_id
       AND a.t0 <= b.t1 AND b.t0 <= a.t1
    ), sym AS (
      SELECT ua AS user_id, sa AS sid, ub AS partner FROM pairs
      UNION ALL
      SELECT p.ub, b.sid, p.ua
      FROM pairs p JOIN sessions a ON a.user_id = p.ua AND a.sid = p.sa
                   JOIN sessions b ON b.user_id = p.ub
      WHERE a.t0 <= b.t1 AND b.t0 <= a.t1
    ), per_session AS (
      SELECT DISTINCT user_id, sid FROM sym
    ), per_user AS (
      SELECT user_id,
             COUNT(DISTINCT sid) AS n_overlapped_sessions,
             COUNT(DISTINCT partner) AS n_partner_users
      FROM sym GROUP BY user_id
    )
    SELECT s.user_id,
           COUNT(*) AS n_sessions,
           COALESCE(ANY_VALUE(pu.n_overlapped_sessions), 0)
             AS n_overlapped_sessions,
           COALESCE(ANY_VALUE(pu.n_partner_users), 0) AS n_partner_users
    FROM sessions s LEFT JOIN per_user pu USING (user_id)
    GROUP BY s.user_id
    ORDER BY s.user_id
    """,
)
def x_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join at scale: which users' sessions ran
    CONCURRENTLY with other users'? Candidate pairs come from an
    HOUR-BUCKET equi-join — each session explodes into the hour indices
    it spans (fan-out = duration/1h, bounded), overlapping intervals
    necessarily share a bucket (lossless blocking), and only same-bucket
    candidates reach the exact predicate `a.t0 ≤ b.t1 ∧ b.t0 ≤ a.t1`.
    The quadratic interval self-join this replaces is the classic
    scale-killer; the bucket join is one uniform shuffle (time buckets
    skew only if the workload does — then bucket finer). The oracle
    verifies via its own quadratic join — fine at oracle scale."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_break = F.lag("ts").over(w).isNull() | (
        (F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")
    )
    with_sid = ev.select(
        "user_id",
        "ts",
        F.sum(gap_break.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    sessions = with_sid.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    epoch = ts_ntz("2024-01-01")
    hour_idx = lambda c: F.floor(  # noqa: E731
        F.timestamp_diff("MICROSECOND", epoch, c) / (3600 * 1000 * 1000)
    )
    buckets = sessions.select(
        "user_id",
        "sid",
        "t0",
        "t1",
        F.explode(F.sequence(hour_idx(F.col("t0")), hour_idx(F.col("t1")))).alias("h"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.t0") <= F.col("b.t1"))
            & (F.col("b.t0") <= F.col("a.t1")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("a.sid").alias("sa"),
            F.col("b.user_id").alias("ub"),
            F.col("b.sid").alias("sb"),
        )
        .dropDuplicates(["ua", "sa", "ub", "sb"])  # >1 shared hour bucket
    )
    sym = pairs.select(
        F.col("ua").alias("user_id"), F.col("sa").alias("sid"), F.col("ub").alias("partner")
    ).unionAll(
        pairs.select(
            F.col("ub").alias("user_id"), F.col("sb").alias("sid"), F.col("ua").alias("partner")
        )
    )
    per_user = sym.groupBy("user_id").agg(
        F.countDistinct("sid").alias("n_overlapped_sessions"),
        F.countDistinct("partner").alias("n_partner_users"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .join(per_user, "user_id", "left")
        .select(
            "user_id",
            "n_sessions",
            F.coalesce("n_overlapped_sessions", F.lit(0)).alias("n_overlapped_sessions"),
            F.coalesce("n_partner_users", F.lit(0)).alias("n_partner_users"),
        )
        .orderBy("user_id")
    )


@query(
    "x_funnel_steps",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER w AS views_before,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w AS clicks_before
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND views_before > 0
                      THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND clicks_before > 0
                       AND views_before > 0
                      THEN 1 ELSE 0 END) AS s3
      FROM flagged GROUP BY user_id
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS users_viewed,
           CAST(SUM(s2) AS BIGINT) AS users_clicked_after_view,
           CAST(SUM(s3) AS BIGINT) AS users_purchased_after_click
    FROM per_user
    """,
)
def x_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step conversion funnel (view → later click → later
    purchase, strict event-time order with event_id tiebreak): users
    reaching each step. The step-2/3 conditions use running PRECEDING
    counts, so the whole funnel is ONE user-keyed window pass + one
    per-user aggregate — never a join per step (the naive 3-way
    self-join shuffles the events table once per funnel stage).

    Approximation note (shared with the oracle, so hash-exact): step 3
    requires a prior click and a prior view, not a prior
    click-that-itself-followed-a-view — the strict-path variant needs
    one more running flag, same plan shape."""
    ev = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_ = lambda t: F.when(F.col("event_type") == t, 1).otherwise(0)  # noqa: E731
    flagged = ev.select(
        "user_id",
        "event_type",
        F.sum(is_("view")).over(w).alias("views_before"),
        F.sum(is_("click")).over(w).alias("clicks_before"),
    )
    per_user = flagged.groupBy("user_id").agg(
        F.max(is_("view")).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("views_before") > 0), 1
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("clicks_before") > 0)
                & (F.col("views_before") > 0),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    return per_user.agg(
        F.sum("s1").cast("long").alias("users_viewed"),
        F.sum("s2").cast("long").alias("users_clicked_after_view"),
        F.sum("s3").cast("long").alias("users_purchased_after_click"),
    )


@query(
    "x_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM c
    ORDER BY prev_type, next_type
    """,
)
def x_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: counts and
    row-normalized probabilities over consecutive event pairs per user
    (ts order, event_id tiebreak). One user-keyed window for the lag,
    one bounded-key aggregate (|types|² rows), one tiny partitioned
    window for the normalizer — the per-prev_type SUM is over ≤|types|
    rows, never the event stream. The probability is a single double
    division of exact counts, so it is bit-identical cross-engine."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return (
        c.select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "x_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), r AS (
      SELECT user_id, sid, event_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rn
      FROM s
    ), p AS (
      SELECT user_id, sid,
             string_agg(event_type, ',' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, sid
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def x_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session opening paths: sessionize per user (30-minute
    inactivity gap, same islands rule the s3 oracle certifies), take each
    session's first three event types in (ts, event_id) order, count
    path frequencies. The ordered-list aggregation uses the
    sort-struct-then-project idiom (``array_sort`` on (rn, type) structs)
    because ``collect_list`` has no ordering contract — engine-portable
    and shuffle-count-identical to an ordered string_agg.

    Scale: two user-keyed windows share one partitioning; the path agg
    keys on (user, session) — uniform; the final count keys on the path
    string (≤ |types|³ distinct values)."""
    ev = tables(spark, sf_dir)["events"]
    w_scan = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w_scan)
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            lag_ts.isNull()
            | ((F.col("ts") - lag_ts) > F.expr("INTERVAL '30' MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("brk")
        .over(w_scan.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    r = s.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id", "sid").orderBy("ts", "event_id"))
        .alias("rn"),
    ).where(F.col("rn") <= 3)
    p = (
        r.groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ",",
            ).alias("path")
        )
    )
    return (
        p.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@query(
    "x_ohlc_bars",
    oracle=f"""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_start, value,
             row_number() OVER w AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
      WINDOW w AS (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id)
    )
    SELECT event_type, bar_start,
           MIN(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_close = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_exact_sum('value', 'volume')}
    FROM r GROUP BY event_type, bar_start
    ORDER BY event_type, bar_start
    """,
)
def x_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type — the time-series resample: open
    and close are the first/last value in event-time order (event_id
    tiebreak), high/low/volume plain aggregates. Spark expresses
    open/close with ``min_by``/``max_by`` over a (ts, event_id) struct
    key — ONE hash aggregate, no window pass; the oracle states the same
    relation with row_number windows. This is a11's arg-extrema
    primitive composed into the OHLC shape; bar keys are
    (type, hour) — bounded and uniform."""
    ev = tables(spark, sf_dir)["events"]
    bar = F.date_trunc("hour", F.col("ts")).alias("bar_start")
    okey = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", bar)
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), "volume"),
        )
        .orderBy("event_type", "bar_start")
    )


@query(
    "x_funnel_strict",
    oracle="""
    WITH f1 AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER w AS views_before
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), f2 AS (
      SELECT user_id, event_type, views_before,
             SUM(CASE WHEN event_type = 'click' AND views_before > 0
                      THEN 1 ELSE 0 END) OVER w AS qclicks_before
      FROM f1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND views_before > 0
                      THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND qclicks_before > 0
                      THEN 1 ELSE 0 END) AS s3
      FROM f2 GROUP BY user_id
    )
    SELECT CAST(SUM(s1) AS BIGINT) AS users_viewed,
           CAST(SUM(s2) AS BIGINT) AS users_clicked_after_view,
           CAST(SUM(s3) AS BIGINT) AS users_strict_funnel
    FROM per_user
    """,
)
def x_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-path funnel (closes x_funnel_steps' documented
    approximation): step 3 requires a prior click that ITSELF followed a
    view — the qualified-click running count is a second window over the
    first window's output. Both windows share the user_id partitioning
    and (ts, event_id) order, so Catalyst plans ONE Exchange + one sort
    for the chain; still no per-step join."""
    ev = tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_ = lambda t: F.when(F.col("event_type") == t, 1).otherwise(0)  # noqa: E731
    f1 = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(is_("view")).over(w).alias("views_before"),
    )
    f2 = f1.select(
        "user_id",
        "event_type",
        "views_before",
        F.sum(
            F.when(
                (F.col("event_type") == "click") & (F.col("views_before") > 0), 1
            ).otherwise(0)
        )
        .over(w)
        .alias("qclicks_before"),
    )
    per_user = f2.groupBy("user_id").agg(
        F.max(is_("view")).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("views_before") > 0), 1
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("qclicks_before") > 0), 1
            ).otherwise(0)
        ).alias("s3"),
    )
    return per_user.agg(
        F.sum("s1").cast("long").alias("users_viewed"),
        F.sum("s2").cast("long").alias("users_clicked_after_view"),
        F.sum("s3").cast("long").alias("users_strict_funnel"),
    )


# ---------------------------------------------------------------------------
# Distribution drift monitor: total-variation distance between cohorts
# ---------------------------------------------------------------------------

_DRIFT_BIN_W = 25   # equal-width value bins
_DRIFT_BINS = 20    # bucket ids 0..19 (tail clamped)


@query(
    "x_tvd_drift",
    oracle=f"""
    WITH binned AS (
      SELECT CASE WHEN event_type = 'click' THEN 'ref' ELSE 'cur' END AS cohort,
             LEAST(CAST(FLOOR(value / {_DRIFT_BIN_W}) AS BIGINT), {_DRIFT_BINS - 1})
               AS bucket
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    counts AS (
      SELECT bucket,
             SUM(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END) AS ref_n,
             SUM(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END) AS cur_n
      FROM binned GROUP BY bucket
    ),
    totals AS (
      SELECT SUM(ref_n) AS ref_total, SUM(cur_n) AS cur_total FROM counts
    )
    SELECT bucket,
           CAST(ref_n AS BIGINT) AS ref_n,
           CAST(cur_n AS BIGINT) AS cur_n,
           CAST(ref_n * 1000000 // ref_total AS BIGINT) AS ref_ppm,
           CAST(cur_n * 1000000 // cur_total AS BIGINT) AS cur_ppm,
           CAST(ABS(ref_n * 1000000 // ref_total
                    - cur_n * 1000000 // cur_total) AS BIGINT) AS abs_diff_ppm
    FROM counts CROSS JOIN totals
    ORDER BY bucket
    """,
)
def x_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two event cohorts (reference =
    clicks, current = purchases): equal-width value histogram per cohort
    in exact integer parts-per-million shares; the per-bucket
    ``abs_diff_ppm`` column sums to 2,000,000 × the total-variation
    distance. Log-free by design — PSI/KL need ln(), whose last-ulp
    varies across engines; TVD certifies the same "did the ingest
    distribution move" question in integer arithmetic a hash gate can
    verify.

    Scale: one map-side bucket projection + one 20-key hash aggregate
    over the cohort stream; the totals are a broadcast scalar pair. At
    100 TB the monitor runs per ingest tick over the new slice vs the
    published reference histogram (a 20-row artifact, not a rescan)."""
    ev = tables(spark, sf_dir)["events"].where(
        F.col("event_type").isin("click", "purchase")
    )
    binned = ev.select(
        F.when(F.col("event_type") == "click", "ref").otherwise("cur").alias("cohort"),
        F.least(
            F.floor(F.col("value") / _DRIFT_BIN_W).cast("bigint"),
            F.lit(_DRIFT_BINS - 1).cast("bigint"),
        ).alias("bucket"),
    )
    counts = binned.groupBy("bucket").agg(
        F.sum(F.when(F.col("cohort") == "ref", 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(F.col("cohort") == "cur", 1).otherwise(0)).alias("cur_n"),
    )
    totals = counts.agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    ref_ppm = F.expr("CAST(ref_n * 1000000 DIV ref_total AS BIGINT)")
    cur_ppm = F.expr("CAST(cur_n * 1000000 DIV cur_total AS BIGINT)")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("ref_n").cast("bigint").alias("ref_n"),
            F.col("cur_n").cast("bigint").alias("cur_n"),
            ref_ppm.alias("ref_ppm"),
            cur_ppm.alias("cur_ppm"),
            F.abs(ref_ppm - cur_ppm).cast("bigint").alias("abs_diff_ppm"),
        )
        .orderBy("bucket")
    )
