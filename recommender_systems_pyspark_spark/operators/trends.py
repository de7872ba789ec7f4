"""Time-series / distribution analytics (round 5): OLS trend fitting,
lag-1 autocorrelation and lead-lag cross-correlation, cumulative-distinct
and rolling-distinct user growth, LTV cohort triangles, time-weighted
averages, dyadic-weight EWMA smoothing, mergeable histogram quantiles,
all-integer CUSUM changepoint detection, the Gini concentration
coefficient, and the distribution-testing family (binned two-sample
Kolmogorov-Smirnov, two-proportion A/B z, Welch t).

The reference app reports only point aggregates (means / counts —
``utils/imb_rating.py:55-64``, ``app.py:217-236``); a warehouse engine
replacing it needs trend and distribution-shape analytics over the same
fact tables. Everything here follows the engine's determinism doctrine
(registry docstring): every statistic is derived from EXACT integer /
decimal power sums (associative, partial-aggregation-order independent),
and the final floating-point formula is written as the IDENTICAL IEEE
operation sequence on both engines — no libm calls (Spark's ``Math.log``
and DuckDB's ``std::log`` disagree in the last ulp on ~24% of integer
arguments, measured 1..1e6 this round), only +,-,*,/,sqrt,abs, which are
correctly rounded everywhere.

Scale notes (100 TB):
- Trend/autocorr reduce the fact table to one row per (group, day) with a
  map-side-combined hash aggregate (the only full-data shuffle), then fit
  on the tiny daily frame. Power-sum state is O(1) per group.
- ``x_cumulative_distinct`` shuffles once on user_id (the unavoidable
  distinct), then works on a ≤#days frame. The running-total window is
  over that aggregated frame — bounded by the calendar, not the data.
- The KS statistic is computed on a FIXED-WIDTH binned CDF (price/1000),
  so the window frame is bounded by the price domain (~500 bins), not by
  row count; an exact KS over raw values would need a global sort of the
  whole column.
- Gini needs a true global rank — delegated to
  :func:`operators.ranking.with_global_row_number` (distributed two-phase
  rank: range shuffle + per-partition row_number + broadcast offsets), so
  no single-partition sort appears anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables
from .ranking import with_global_row_number

#: Shared sub-expression (Spark side): exact integer day number and cents.
_EPOCH = "1970-01-01"


def _day(col: str) -> F.Column:
    return F.datediff(F.col(col).cast("date"), F.lit(_EPOCH).cast("date")).cast(
        "bigint"
    )


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


@query(
    "x_linreg_trend",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag,
             DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS t,
             CAST(SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM lineitem
      GROUP BY 1, 2
    ),
    s AS (
      SELECT l_returnflag,
             COUNT(*) AS n_days,
             CAST(SUM(CAST(t AS DECIMAL(18,0))) AS DOUBLE) AS st,
             CAST(SUM(CAST(t * t AS DECIMAL(18,0))) AS DOUBLE) AS stt,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(t * y AS DECIMAL(28,0))) AS DOUBLE) AS sty
      FROM daily
      GROUP BY 1
    )
    SELECT l_returnflag, n_days,
           ((CAST(n_days AS DOUBLE) * sty - st * sy)
            / (CAST(n_days AS DOUBLE) * stt - st * st)) / 100.0 AS slope_per_day,
           ((sy - ((CAST(n_days AS DOUBLE) * sty - st * sy)
                   / (CAST(n_days AS DOUBLE) * stt - st * st)) * st)
            / CAST(n_days AS DOUBLE)) / 100.0 AS intercept,
           (sy / CAST(n_days AS DOUBLE)) / 100.0 AS mean_daily_rev
    FROM s
    ORDER BY l_returnflag
    """,
)
def x_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS trend of daily revenue vs epoch-day: slope and
    intercept from the closed form ``b = (nΣty − ΣtΣy)/(nΣt² − (Σt)²)``
    over EXACT power sums. Two hash aggregates, one data shuffle: fact →
    (flag, day) daily cents (BIGINT, exact), then day-frame → 5 power
    sums per flag. Per-row ``t·y`` is cast to DECIMAL(28,0) (epoch-day
    ~1e4 × daily cents — at very large SF the 18-digit per-row cast the
    other sums use would overflow first). The closed form runs in DOUBLE
    on exact inputs with the identical operation sequence in the oracle,
    so both engines round through the same IEEE path."""
    li = tables(spark, sf_dir)["lineitem"]
    daily = li.groupBy(
        "l_returnflag", _day("l_shipdate").alias("t")
    ).agg(
        F.sum(_cents("l_extendedprice").cast("decimal(18,0)"))
        .cast("bigint")
        .alias("y")
    )
    t, y = F.col("t"), F.col("y")
    s = daily.groupBy("l_returnflag").agg(
        F.count("*").alias("n_days"),
        F.sum(t.cast("decimal(18,0)")).cast("double").alias("st"),
        F.sum((t * t).cast("decimal(18,0)")).cast("double").alias("stt"),
        F.sum(y.cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((t * y).cast("decimal(28,0)")).cast("double").alias("sty"),
    )
    n = F.col("n_days").cast("double")
    st, stt, sy, sty = (F.col(c) for c in ("st", "stt", "sy", "sty"))
    slope_c = (n * sty - st * sy) / (n * stt - st * st)
    return s.select(
        "l_returnflag",
        "n_days",
        (slope_c / 100.0).alias("slope_per_day"),
        (((sy - slope_c * st) / n) / 100.0).alias("intercept"),
        ((sy / n) / 100.0).alias("mean_daily_rev"),
    ).orderBy("l_returnflag")


@query(
    "x_autocorr_daily",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT event_type, y,
             LAG(y) OVER (PARTITION BY event_type ORDER BY day) AS x
      FROM daily
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n_pairs,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,0))) AS DOUBLE) AS sxy
      FROM pairs
      WHERE x IS NOT NULL
      GROUP BY 1
    )
    SELECT event_type, n_pairs,
           (sxy - (sx * sy) / n_pairs)
             / sqrt((sxx - (sx * sx) / n_pairs) * (syy - (sy * sy) / n_pairs))
             AS autocorr_lag1
    FROM s
    ORDER BY event_type
    """,
)
def x_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily revenue series per event type:
    Pearson correlation of (day t, day t−1) pairs via exact integer power
    sums (the a10_stat_moments scheme). The lag window is PARTITIONED by
    event_type and ordered over the per-day aggregate — a tiny frame, no
    global sort. Missing calendar days pair across the gap (series
    autocorr of the OBSERVED sequence), which is deterministic and
    identical in the oracle's LAG."""
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(_cents("value").cast("decimal(18,0)")).cast("bigint").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = daily.withColumn("x", F.lag("y").over(w)).where(F.col("x").isNotNull())
    x, y = F.col("x"), F.col("y")
    s = pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.sum(x.cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,0)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,0)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(28,0)")).cast("double").alias("sxy"),
    )
    n = F.col("n_pairs")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in ("sx", "sy", "sxx", "syy", "sxy"))
    return s.select(
        "event_type",
        "n_pairs",
        (
            (sxy - (sx * sy) / n)
            / F.sqrt((sxx - (sx * sx) / n) * (syy - (sy * sy) / n))
        ).alias("autocorr_lag1"),
    ).orderBy("event_type")


@query(
    "x_cumulative_distinct",
    oracle="""
    WITH per_day AS (
      SELECT CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS active_users
      FROM events
      GROUP BY 1
    ),
    first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day
      FROM events
      GROUP BY 1
    ),
    new_by_day AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY 1
    )
    SELECT CAST(p.day AS VARCHAR) AS day, p.n_events, p.active_users,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
             OVER (ORDER BY p.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
    FROM per_day p LEFT JOIN new_by_day n USING (day)
    ORDER BY p.day
    """,
)
def x_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily audience growth: events per day, exact daily active users,
    first-time (new) users, and the running cumulative distinct-user
    count. The classic streaming-dashboard query — computed EXACTLY with
    one shuffle on user_id (min first-seen day per user; turning
    cumulative-distinct into a plain running SUM of new-user counts is
    what makes it scale: no growing distinct state, no re-scan per day).
    The running-total window is over the per-day aggregate — bounded by
    the calendar (≤ #days), hence allowlisted from the unpartitioned-
    window plan guard."""
    ev = tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    per_day = ev.groupBy(day.alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("active_users"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    new_by_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.join(new_by_day, "day", "left")
        .withColumn("new_users", F.coalesce(F.col("new_users"), F.lit(0)))
        .withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
        .select(
            F.col("day").cast("string").alias("day"),
            "n_events",
            "active_users",
            "new_users",
            "cum_users",
        )
    )


@query(
    "x_ks_two_sample",
    oracle="""
    WITH f AS (
      SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin,
             COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS c1,
             COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS c2
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY 1
    ),
    c AS (
      SELECT bin,
             SUM(c1) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a1,
             SUM(c2) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a2,
             SUM(c1) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n1,
             SUM(c2) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n2
      FROM f
    )
    SELECT MAX(ABS(CAST(a1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(a2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_stat,
           CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
    FROM c
    """,
)
def x_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the URGENT and LOW
    order-price distributions, on a fixed-width binned CDF ($1000 bins).
    Binning is what makes KS scale-safe: the cumulative window runs over
    ~500 bin rows bounded by the PRICE DOMAIN (an exact KS would need a
    global sort of every raw value). One hash aggregate over the fact
    scan with both groups counted in a single pass (conditional counts),
    then the bounded window; the max |F1−F2| reduction is computed from
    exact integer cumulative counts, divided in DOUBLE with the identical
    expression in the oracle."""
    o = tables(spark, sf_dir)["orders"].where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    f = o.groupBy(
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bin")
    ).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("c1"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("c2"),
    )
    run = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = f.select(
        "bin",
        F.sum("c1").over(run).alias("a1"),
        F.sum("c2").over(run).alias("a2"),
        F.sum("c1").over(full).alias("n1"),
        F.sum("c2").over(full).alias("n2"),
    )
    d = F.abs(
        F.col("a1").cast("double") / F.col("n1").cast("double")
        - F.col("a2").cast("double") / F.col("n2").cast("double")
    )
    return c.agg(
        F.max(d).alias("ks_stat"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )


@query(
    "x_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM orders
      GROUP BY 1
    ),
    ranked AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY y, o_custkey) AS r FROM rev
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(28,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(r * y AS DECIMAL(28,0))) AS DOUBLE) AS sry
      FROM ranked
    )
    SELECT n AS n_customers,
           sy / 100.0 AS total_rev,
           (2.0 * sry - (CAST(n AS DOUBLE) + 1.0) * sy)
             / (CAST(n AS DOUBLE) * sy) AS gini
    FROM s
    """,
)
def x_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers, via
    the rank formula ``G = (2Σ r·y − (n+1)Σy) / (nΣy)`` on exact cent
    sums. The global rank comes from the distributed two-phase
    row_number (range shuffle + broadcast offsets — never a single-
    partition sort); ties in revenue are broken by customer key, which
    leaves the statistic invariant (equal y values contribute the same
    Σr·y under any permutation of their consecutive ranks). The oracle
    replays the identical formula with a plain ROW_NUMBER()."""
    o = tables(spark, sf_dir)["orders"]
    rev = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice").cast("decimal(18,0)")).cast("bigint").alias("y")
    )
    ranked, _ = with_global_row_number(
        rev, [F.col("y"), F.col("o_custkey")], alias="r"
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("y").cast("decimal(28,0)")).cast("double").alias("sy"),
        F.sum((F.col("r") * F.col("y")).cast("decimal(28,0)"))
        .cast("double")
        .alias("sry"),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        (F.col("sy") / 100.0).alias("total_rev"),
        (
            (2.0 * F.col("sry") - (n_d + 1.0) * F.col("sy")) / (n_d * F.col("sy"))
        ).alias("gini"),
    )


@query(
    "x_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS v,
             DATE_DIFF('microsecond', ts,
                       LEAD(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS w
      FROM events
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n_intervals,
             CAST(SUM(CAST(w AS DECIMAL(28,0))) AS DOUBLE) AS sw,
             CAST(SUM(CAST(w * v AS DECIMAL(28,0))) AS DOUBLE) AS swv
      FROM seq
      WHERE w IS NOT NULL
      GROUP BY 1
    )
    SELECT event_type, n_intervals,
           (swv / sw) / 100.0 AS time_weighted_avg,
           sw / 1000000.0 AS total_hold_secs
    FROM s
    ORDER BY event_type
    """,
)
def x_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event type, where each
    observation is held until the same USER's next event (the
    last-value-carried-forward weighting used for position/price
    series; a plain AVG over-weights bursts). Weights are exact
    microsecond intervals from one user-partitioned LEAD window —
    microseconds, not truncated seconds, so both engines count the
    identical integers. Σw·v uses DECIMAL(28,0) per-row casts (interval
    × cents exceeds 18 digits) and the final division runs in DOUBLE
    with the identical expression in the oracle."""
    ev = tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        _cents("value").alias("v"),
        F.timestamp_diff("MICROSECOND", F.col("ts"), F.lead("ts").over(w)).alias(
            "w"
        ),
    ).where(F.col("w").isNotNull())
    s = seq.groupBy("event_type").agg(
        F.count("*").alias("n_intervals"),
        F.sum(F.col("w").cast("decimal(28,0)")).cast("double").alias("sw"),
        F.sum((F.col("w") * F.col("v")).cast("decimal(28,0)"))
        .cast("double")
        .alias("swv"),
    )
    return s.select(
        "event_type",
        "n_intervals",
        ((F.col("swv") / F.col("sw")) / 100.0).alias("time_weighted_avg"),
        (F.col("sw") / 1000000.0).alias("total_hold_secs"),
    ).orderBy("event_type")


@query(
    "x_histogram_quantile",
    oracle="""
    WITH f AS (
      SELECT o_orderpriority AS prio,
             CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM orders
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT prio, bin, c,
             CAST(SUM(c) OVER (PARTITION BY prio ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS a,
             CAST(SUM(c) OVER (PARTITION BY prio
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n
      FROM f
    ),
    q AS (SELECT unnest([50, 90, 99]) AS qp)
    SELECT prio, qp,
           CAST(bin * 1000 AS DOUBLE)
             + 1000.0 * (CAST(qp * n - 100 * (a - c) AS DOUBLE)
                         / CAST(100 * c AS DOUBLE)) AS quantile_est
    FROM cum CROSS JOIN q
    WHERE 100 * (a - c) < qp * n AND qp * n <= 100 * a
    ORDER BY prio, qp
    """,
)
def x_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 estimates from a fixed-width ($1000-bin) histogram
    with linear interpolation inside the crossing bin — the MERGEABLE
    quantile scheme (per-bin counts combine associatively across
    partitions and across time, unlike exact sorted-value percentiles,
    and the error is bounded by the bin width). The crossing bin for
    quantile q is found with PURE INTEGER comparisons (``100·cum_prev <
    q·n ≤ 100·cum`` — no float thresholds, so exactly one row matches
    per (group, q) on both engines); only the final interpolation
    divides, in DOUBLE, identically in the oracle. The per-group CDF
    window is partitioned and bounded by the price domain (~500 bins)."""
    o = tables(spark, sf_dir)["orders"]
    f = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bin"),
    ).agg(F.count("*").alias("c"))
    run = (
        Window.partitionBy("prio")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = Window.partitionBy("prio").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = f.select(
        "prio",
        "bin",
        "c",
        F.sum("c").over(run).alias("a"),
        F.sum("c").over(full).alias("n"),
    )
    qs = cum.withColumn("qp", F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))))
    qp, n, a, c = (F.col(x) for x in ("qp", "n", "a", "c"))
    crossing = qs.where((100 * (a - c) < qp * n) & (qp * n <= 100 * a))
    est = (F.col("bin") * 1000).cast("double") + 1000.0 * (
        (qp * n - 100 * (a - c)).cast("double") / (100 * c).cast("double")
    )
    return crossing.select(
        "prio", "qp", est.alias("quantile_est")
    ).orderBy("prio", "qp")


@query(
    "x_ewma_halflife",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, y,
             LAG(y, 1) OVER w AS l1, LAG(y, 2) OVER w AS l2,
             LAG(y, 3) OVER w AS l3, LAG(y, 4) OVER w AS l4,
             LAG(y, 5) OVER w AS l5, LAG(y, 6) OVER w AS l6,
             LAG(y, 7) OVER w AS l7, LAG(y, 8) OVER w AS l8,
             LAG(y, 9) OVER w AS l9
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           CAST(y AS DOUBLE) / 100.0 AS daily_rev,
           ((CAST(y AS DOUBLE) * 0.5
             + COALESCE(CAST(l1 AS DOUBLE), 0) * 0.25
             + COALESCE(CAST(l2 AS DOUBLE), 0) * 0.125
             + COALESCE(CAST(l3 AS DOUBLE), 0) * 0.0625
             + COALESCE(CAST(l4 AS DOUBLE), 0) * 0.03125
             + COALESCE(CAST(l5 AS DOUBLE), 0) * 0.015625
             + COALESCE(CAST(l6 AS DOUBLE), 0) * 0.0078125
             + COALESCE(CAST(l7 AS DOUBLE), 0) * 0.00390625
             + COALESCE(CAST(l8 AS DOUBLE), 0) * 0.001953125
             + COALESCE(CAST(l9 AS DOUBLE), 0) * 0.0009765625)
            / (0.5
               + CASE WHEN l1 IS NULL THEN 0 ELSE 0.25 END
               + CASE WHEN l2 IS NULL THEN 0 ELSE 0.125 END
               + CASE WHEN l3 IS NULL THEN 0 ELSE 0.0625 END
               + CASE WHEN l4 IS NULL THEN 0 ELSE 0.03125 END
               + CASE WHEN l5 IS NULL THEN 0 ELSE 0.015625 END
               + CASE WHEN l6 IS NULL THEN 0 ELSE 0.0078125 END
               + CASE WHEN l7 IS NULL THEN 0 ELSE 0.00390625 END
               + CASE WHEN l8 IS NULL THEN 0 ELSE 0.001953125 END
               + CASE WHEN l9 IS NULL THEN 0 ELSE 0.0009765625 END))
           / 100.0 AS ewma
    FROM lagged
    ORDER BY event_type, day
    """,
)
def x_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (half-life = 1 day, 10-tap
    kernel) of the daily revenue series per event type — smoothing with
    NO libm: α = 1/2 makes every weight a DYADIC rational (2⁻¹ … 2⁻¹⁰),
    exactly representable in binary floating point, and cent values fit
    in ~22 bits, so every product and partial sum below the final
    division is EXACT in IEEE double on both engines (the no-libm
    doctrine's answer to exponential decay). Early rows renormalize over
    the available taps. Ten LAGs share ONE partitioned window spec — a
    single window pass over the per-day aggregate."""
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(_cents("value").cast("decimal(18,0)")).cast("bigint").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = {k: F.lag("y", k).over(w) for k in range(1, 10)}
    weights = {k: 2.0 ** -(k + 1) for k in range(0, 10)}
    num = F.col("y").cast("double") * F.lit(weights[0])
    den = F.lit(weights[0])
    for k in range(1, 10):
        num = num + F.coalesce(lags[k].cast("double"), F.lit(0.0)) * F.lit(weights[k])
        den = den + F.when(lags[k].isNull(), 0.0).otherwise(weights[k])
    return (
        daily.select(
            "event_type",
            F.col("day"),
            (F.col("y").cast("double") / 100.0).alias("daily_rev"),
            ((num / den) / 100.0).alias("ewma"),
        )
        .orderBy("event_type", "day")
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_rev",
            "ewma",
        )
    )


@query(
    "x_abtest_lift",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             user_id % 2 AS variant,
             CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                       >= 14 THEN 1 ELSE 0 END AS converted
      FROM events
      GROUP BY 1, 2
    ),
    s AS (
      SELECT COUNT(CASE WHEN variant = 0 THEN 1 END) AS n_a,
             COUNT(CASE WHEN variant = 1 THEN 1 END) AS n_b,
             CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
                  AS BIGINT) AS conv_b
      FROM assign
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS abs_lift,
           (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
           / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                           / CAST(n_a + n_b AS DOUBLE))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             AS z_score
    FROM s
    """,
)
def x_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test readout: deterministic hash assignment
    (user_id parity), per-user conversion flag (≥14 purchases — the
    high-frequency-purchaser bar; the fixture's per-user purchase rate
    saturates a ≥1 bar to p=1, which degenerates the z denominator),
    conversion
    rates, absolute lift, and the pooled two-proportion z-statistic —
    the experimentation primitive, computed end-to-end with one
    user-keyed aggregate plus a 1-row combine. The z formula uses only
    +,−,×,÷,√ on exact integer inputs, written identically in the
    oracle (the engine's stats-testing family: a19 chi-square,
    x_ks_two_sample, and this)."""
    ev = tables(spark, sf_dir)["events"]
    assign = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14, 1
        )
        .otherwise(0)
        .alias("converted")
    )
    s = assign.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    p_a, p_b = ca / n_a, cb / n_b
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (p_b - p_a) / F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b))
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (p_b - p_a).alias("abs_lift"),
        z.alias("z_score"),
    )


@query(
    "x_rolling_distinct_7d",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (SELECT MAX(day) AS max_day FROM pairs),
    dau AS (SELECT day, COUNT(*) AS dau FROM pairs GROUP BY 1),
    covered AS (
      SELECT DISTINCT p.day + f.k AS day, p.user_id
      FROM pairs p, LATERAL (SELECT CAST(unnest(range(0, 7)) AS INTEGER) AS k) f
      WHERE p.day + f.k <= (SELECT max_day FROM bounds)
    ),
    wau AS (SELECT day, COUNT(*) AS wau_7d FROM covered GROUP BY 1)
    SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau_7d,
           CAST(d.dau AS DOUBLE) / CAST(w.wau_7d AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w USING (day)
    ORDER BY day
    """,
)
def x_rolling_distinct_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling distinct users (WAU) next to daily distinct
    (DAU) and the DAU/WAU stickiness ratio. COUNT(DISTINCT) over a
    sliding window has no mergeable state — the scale form used here
    maps each (day, user) presence onto the ≤7 trailing windows it
    belongs to (a BOUNDED 7× fan-out of the deduplicated day-user
    pairs, NOT of raw events) and deduplicates per covered day: two
    uniform-key shuffles, zero growing state, works identically in a
    backfill or an incremental refresh. The same trick generalizes to
    any trailing-k distinct; k bounds cost linearly."""
    ev = tables(spark, sf_dir)["events"]
    pairs = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    )
    max_day = pairs.agg(F.max("day").alias("max_day"))
    dau = pairs.groupBy("day").agg(F.count("*").alias("dau"))
    covered = (
        pairs.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.date_add(F.col("day"), F.col("k")).alias("day"), "user_id")
        .crossJoin(F.broadcast(max_day))
        .where(F.col("day") <= F.col("max_day"))
        .select("day", "user_id")
        .distinct()
    )
    wau = covered.groupBy("day").agg(F.count("*").alias("wau_7d"))
    return (
        dau.join(wau, "day")
        .orderBy("day")
        .select(
            F.col("day").cast("string").alias("day"),
            "dau",
            "wau_7d",
            (F.col("dau").cast("double") / F.col("wau_7d").cast("double")).alias(
                "stickiness"
            ),
        )
    )


@query(
    "x_welch_ttest",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS is_weekend,
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    s AS (
      SELECT is_weekend,
             COUNT(*) AS n,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(y * y AS DECIMAL(28,0))) AS DOUBLE) AS syy
      FROM daily
      GROUP BY 1
    ),
    w AS (
      SELECT
        (SELECT n FROM s WHERE is_weekend = 0) AS n0,
        (SELECT sy FROM s WHERE is_weekend = 0) AS sy0,
        (SELECT syy FROM s WHERE is_weekend = 0) AS syy0,
        (SELECT n FROM s WHERE is_weekend = 1) AS n1,
        (SELECT sy FROM s WHERE is_weekend = 1) AS sy1,
        (SELECT syy FROM s WHERE is_weekend = 1) AS syy1
    )
    SELECT n0 AS n_weekday, n1 AS n_weekend,
           (sy0 / CAST(n0 AS DOUBLE)) / 100.0 AS mean_weekday,
           (sy1 / CAST(n1 AS DOUBLE)) / 100.0 AS mean_weekend,
           (sy0 / CAST(n0 AS DOUBLE) - sy1 / CAST(n1 AS DOUBLE))
           / sqrt(((syy0 - (sy0 * sy0) / CAST(n0 AS DOUBLE))
                   / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)
                  + ((syy1 - (sy1 * sy1) / CAST(n1 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE))
             AS t_stat
    FROM w
    """,
)
def x_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-statistic comparing weekday vs weekend
    daily revenue — the third member of the stats-testing family (a19
    χ², x_ks_two_sample, x_abtest_lift). Group means and sample
    variances come from exact integer power sums over the per-day
    aggregate; the t formula runs in DOUBLE with the identical
    expression in the oracle (√ only — no libm, no t-distribution CDF,
    which IS a libm surface; the statistic is the deliverable, the
    p-value lookup belongs client-side). dayofweek: DuckDB Sunday=0 /
    Spark Sunday=1, aligned via each engine's own weekend test."""
    ev = tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    daily = ev.groupBy(
        day.alias("day"),
        F.when(F.dayofweek(day).isin(1, 7), 1).otherwise(0).alias("is_weekend"),
    ).agg(F.sum(_cents("value").cast("decimal(18,0)")).cast("bigint").alias("y"))
    y = F.col("y")
    s = daily.groupBy("is_weekend").agg(
        F.count("*").alias("n"),
        F.sum(y.cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((y * y).cast("decimal(28,0)")).cast("double").alias("syy"),
    )
    g0 = s.where(F.col("is_weekend") == 0).select(
        F.col("n").alias("n0"), F.col("sy").alias("sy0"), F.col("syy").alias("syy0")
    )
    g1 = s.where(F.col("is_weekend") == 1).select(
        F.col("n").alias("n1"), F.col("sy").alias("sy1"), F.col("syy").alias("syy1")
    )
    w = g0.crossJoin(F.broadcast(g1))
    n0, n1 = F.col("n0").cast("double"), F.col("n1").cast("double")
    sy0, sy1 = F.col("sy0"), F.col("sy1")
    syy0, syy1 = F.col("syy0"), F.col("syy1")
    se2 = ((syy0 - (sy0 * sy0) / n0) / (n0 - 1.0)) / n0 + (
        (syy1 - (sy1 * sy1) / n1) / (n1 - 1.0)
    ) / n1
    return w.select(
        F.col("n0").alias("n_weekday"),
        F.col("n1").alias("n_weekend"),
        ((sy0 / n0) / 100.0).alias("mean_weekday"),
        ((sy1 / n1) / 100.0).alias("mean_weekend"),
        ((sy0 / n0 - sy1 / n1) / F.sqrt(se2)).alias("t_stat"),
    )


@query(
    "x_crosscorr_lagged",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'view' THEN
               CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(18,0))
               ELSE 0 END) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN
               CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(18,0))
               ELSE 0 END) AS BIGINT) AS p
      FROM events
      GROUP BY 1
    ),
    lagged AS (
      SELECT f.k AS lag, p AS y,
             LAG(v, f.k) OVER (PARTITION BY f.k ORDER BY day) AS x
      FROM daily, LATERAL (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS k) f
    ),
    s AS (
      SELECT lag, COUNT(*) AS n_pairs,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(28,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,0))) AS DOUBLE) AS sxy
      FROM lagged
      WHERE x IS NOT NULL
      GROUP BY 1
    )
    SELECT lag, n_pairs,
           (sxy - (sx * sy) / n_pairs)
             / sqrt((sxx - (sx * sx) / n_pairs) * (syy - (sy * sy) / n_pairs))
             AS crosscorr
    FROM s
    ORDER BY lag
    """,
)
def x_crosscorr_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: does view revenue LEAD purchase
    revenue? Correlates purchase(t) with view(t−k) for k = 0..3 — the
    lag whose correlation peaks estimates the conversion delay. One
    conditional-sum pivot to the (day, view, purchase) frame, a 4-way
    lag explode over the tiny daily frame (windows PARTITIONED by lag),
    then the a10 exact-power-sum Pearson per lag. The daily pivot is the
    only full-data pass."""
    ev = tables(spark, sf_dir)["events"]
    cents = _cents("value").cast("decimal(18,0)")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0))
        .cast("bigint")
        .alias("v"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("bigint")
        .alias("p"),
    )
    lagged = daily.withColumn(
        "lag", F.explode(F.array(*[F.lit(k) for k in range(4)]))
    )
    w = Window.partitionBy("lag").orderBy("day")
    # LAG's offset must be a literal (Spark and SQL both), so the four
    # lag depths are a CASE over per-depth lag columns sharing one
    # window spec — still a single window pass.
    pairs = (
        lagged.select(
            "lag",
            F.col("p").alias("y"),
            F.when(F.col("lag") == 0, F.col("v"))
            .when(F.col("lag") == 1, F.lag("v", 1).over(w))
            .when(F.col("lag") == 2, F.lag("v", 2).over(w))
            .otherwise(F.lag("v", 3).over(w))
            .alias("x"),
        )
    ).where(F.col("x").isNotNull())
    x, y = F.col("x"), F.col("y")
    s = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(x.cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,0)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,0)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(28,0)")).cast("double").alias("sxy"),
    )
    n = F.col("n_pairs")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in ("sx", "sy", "sxx", "syy", "sxy"))
    return s.select(
        "lag",
        "n_pairs",
        (
            (sxy - (sx * sy) / n)
            / F.sqrt((sxx - (sx * sx) / n) * (syy - (sy * sy) / n))
        ).alias("crosscorr"),
    ).orderBy("lag")


@query(
    "x_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, day, y,
             CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS prefix,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS t,
             CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS total,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM daily
    ),
    scored AS (
      -- HUGEINT (INT128) products: at 100 TB scale n*prefix can exceed
      -- 2^63 (total cents ~1e16 × n ~1e3), so widen BEFORE multiplying.
      -- Spark side mirrors with DECIMAL(38,0) — both exact integers.
      SELECT event_type, day,
             abs(CAST(n AS HUGEINT) * prefix
                 - CAST(t AS HUGEINT) * total) AS score, n, total
      FROM c
    )
    SELECT event_type,
           CAST(day AS VARCHAR) AS changepoint_day,
           CAST(score AS BIGINT) AS cusum_scaled,
           CAST(score AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS cusum_dollars
    FROM (
      SELECT event_type, day, score, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY score DESC, day DESC) AS r
      FROM scored
    )
    WHERE r = 1
    ORDER BY event_type
    """,
)
def x_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily revenue series per event
    type, in ALL-INTEGER arithmetic: the textbook statistic max_t |Σ_{i≤t}
    (y_i − ȳ)| is rescaled by n to ``max_t |n·prefix_t − t·total|`` —
    bit-exact integer compares, no float mean anywhere; the day attaining
    the max (ties → latest day, via the composite max_by key) is the
    changepoint candidate, and the dollar-scale column divides back out
    ONCE at the end. Windows are partitioned per event type over the
    per-day aggregate; at 100 TB the only full-data pass is the daily
    rollup."""
    ev = tables(spark, sf_dir)["events"]
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.sum(_cents("value").cast("decimal(18,0)")).cast("bigint").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = daily.select(
        "event_type",
        "day",
        F.sum("y").over(run).alias("prefix"),
        F.row_number().over(w).cast("bigint").alias("t"),
        F.sum("y").over(full).alias("total"),
        F.count("*").over(full).alias("n"),
    )
    # DECIMAL(38,0) widening before the products: n*prefix overflows
    # BIGINT once total cents ~1e16 meets n ~1e3 days (the 100 TB shape) —
    # ANSI mode would error, non-ANSI would wrap silently. Exact integer
    # decimal arithmetic mirrors the oracle's HUGEINT.
    dec = "decimal(38,0)"
    score = F.abs(
        F.col("n").cast(dec) * F.col("prefix").cast(dec)
        - F.col("t").cast(dec) * F.col("total").cast(dec)
    )
    scored = c.select("event_type", "day", score.alias("score"), "n")
    return (
        scored.groupBy("event_type")
        .agg(
            F.max_by(F.col("day"), F.struct(F.col("score"), F.col("day")))
            .cast("string")
            .alias("changepoint_day"),
            F.max("score").cast("bigint").alias("cusum_scaled"),
            (
                F.max("score").cast("double")
                / (F.max("n").cast("double") * 100.0)
            ).alias("cusum_dollars"),
        )
        .orderBy("event_type")
    )


@query(
    "x_ltv_cohort_triangle",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_day
      FROM events
      GROUP BY 1
    ),
    cohorts AS (
      SELECT user_id,
             DATE_DIFF('day', DATE '2024-01-01', first_day) // 7 AS cohort_week
      FROM firsts
    ),
    cohort_sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_users
      FROM cohorts GROUP BY 1
    ),
    rev AS (
      SELECT c.cohort_week,
             DATE_DIFF('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7
               - c.cohort_week AS age_week,
             CAST(SUM(CAST(CAST(ROUND(e.value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS week_cents
      FROM events e JOIN cohorts c USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.age_week, s.cohort_users,
           CAST(r.week_cents AS DOUBLE) / 100.0 AS week_rev,
           CAST(CAST(SUM(r.week_cents) OVER (PARTITION BY r.cohort_week
                  ORDER BY r.age_week
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS DOUBLE)
             / (CAST(s.cohort_users AS DOUBLE) * 100.0) AS cum_ltv_per_user
    FROM rev r JOIN cohort_sizes s USING (cohort_week)
    ORDER BY cohort_week, age_week
    """,
)
def x_ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value cohort triangle: users grouped by
    first-seen week (cohort), purchase revenue rolled up by cohort ×
    age-week, and the running cumulative LTV per cohort member — the
    table a growth team reads diagonally. Complements
    x_retention_cohorts (presence counts) with VALUE. Exact cents
    throughout; the cumulative window is partitioned per cohort over the
    ≤(weeks²)/2 triangle frame. Epoch-anchored week indexing (``days
    since 2024-01-01 // 7``) is identical integer arithmetic on both
    engines. Scale: one user-keyed shuffle for first-seen, one
    (cohort, age) aggregate of the purchase slice — the triangle itself
    is calendar-bounded, never data-bounded."""
    ev = tables(spark, sf_dir)["events"]
    anchor = F.lit("2024-01-01").cast("date")
    day = F.col("ts").cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    cohorts = firsts.select(
        "user_id",
        F.expr("datediff(first_day, date'2024-01-01') div 7").alias("cohort_week"),
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.expr("datediff(cast(ts as date), date'2024-01-01') div 7")
                - F.col("cohort_week")
            ).alias("age_week"),
        )
        .agg(
            F.sum(_cents("value").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("week_cents")
        )
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "cohort_users",
            (F.col("week_cents").cast("double") / 100.0).alias("week_rev"),
            (
                F.sum("week_cents").over(w).cast("bigint").cast("double")
                / (F.col("cohort_users").cast("double") * 100.0)
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "age_week")
    )


@query(
    "x_seasonal_dow_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             dayofweek(CAST(ts AS DATE)) AS dow_duck,
             CAST(SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                           AS DECIMAL(18,0))) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    ),
    by_dow AS (
      SELECT CASE WHEN dow_duck = 0 THEN 7 ELSE dow_duck END AS dow,
             COUNT(*) AS n_days,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS BIGINT) AS cents
      FROM daily GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(CAST(n_days AS DECIMAL(18,0))) AS BIGINT) AS all_days,
             CAST(SUM(CAST(cents AS DECIMAL(28,0))) AS BIGINT) AS all_cents
      FROM by_dow
    )
    SELECT dow, n_days,
           CAST(cents AS DOUBLE) / (CAST(n_days AS DOUBLE) * 100.0)
             AS mean_daily_rev,
           (CAST(cents AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(all_cents AS DOUBLE) / CAST(all_days AS DOUBLE))
             AS seasonal_index
    FROM by_dow, tot
    ORDER BY dow
    """,
)
def x_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each weekday's mean daily revenue
    relative to the all-days mean (index 1.0 = no seasonality) — the
    multiplicative seasonal profile a forecaster divides out before
    trend fitting (x_linreg_trend) and the direct quantification behind
    x_welch_ttest's weekday/weekend split. ISO day numbering (Mon=1 …
    Sun=7) on both engines: Spark's ``dayofweek`` is Sun=1-based and
    DuckDB's Sun=0-based, each remapped to ISO in its own dialect.
    Exact cents; two divisions at the end with identical expressions."""
    ev = tables(spark, sf_dir)["events"]
    day = F.col("ts").cast("date")
    # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
    iso_dow = F.when(F.dayofweek(day) == 1, 7).otherwise(F.dayofweek(day) - 1)
    daily = ev.groupBy(day.alias("day"), iso_dow.alias("dow")).agg(
        F.sum(_cents("value").cast("decimal(18,0)")).cast("bigint").alias("y")
    )
    by_dow = daily.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("y").cast("decimal(18,0)")).cast("bigint").alias("cents"),
    )
    tot = by_dow.agg(
        F.sum(F.col("n_days").cast("decimal(18,0)")).cast("bigint").alias("all_days"),
        F.sum(F.col("cents").cast("decimal(28,0)")).cast("bigint").alias("all_cents"),
    )
    return (
        by_dow.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            (
                F.col("cents").cast("double")
                / (F.col("n_days").cast("double") * 100.0)
            ).alias("mean_daily_rev"),
            (
                (F.col("cents").cast("double") / F.col("n_days").cast("double"))
                / (
                    F.col("all_cents").cast("double")
                    / F.col("all_days").cast("double")
                )
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@query(
    "x_ship_latency_profile",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS prio,
             DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT prio,
           COUNT(*) AS n_lines,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days,
           CAST(SUM(CAST(days AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)
             AS mean_days,
           CAST(COUNT(CASE WHEN days <= 30 THEN 1 END) AS DOUBLE) / COUNT(*)
             AS frac_within_30d
    FROM lat
    GROUP BY prio
    ORDER BY prio
    """,
)
def x_ship_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per order priority: line-level
    day-lag min/max/exact-mean and the 30-day SLA attainment fraction —
    the operational-latency readout (and a direct priority-effectiveness
    check: URGENT should ship faster). One fact-keyed equi join
    (orderkey — uniform, AQE-managed) and one bounded-key aggregate;
    day lags are exact integers, the mean and SLA fraction divide once
    in DOUBLE with identical expressions."""
    t = tables(spark, sf_dir)
    o = t["orders"].select(
        "o_orderkey", "o_orderdate", F.col("o_orderpriority").alias("prio")
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "prio",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days"),
    )
    return (
        lat.groupBy("prio")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("days").cast("bigint").alias("min_days"),
            F.max("days").cast("bigint").alias("max_days"),
            (
                F.sum(F.col("days").cast("decimal(18,0)")).cast("double")
                / F.count("*")
            ).alias("mean_days"),
            (
                F.count(F.when(F.col("days") <= 30, 1)).cast("double")
                / F.count("*")
            ).alias("frac_within_30d"),
        )
        .orderBy("prio")
    )
