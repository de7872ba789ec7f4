"""Statistical aggregate family (SURVEY.md §2.13 round-3 additions):
moments (variance/stddev/correlation), arg-extrema (max_by/min_by),
fixed-width histograms, ordered collect, and deterministic mode.

The reference app computes only count/avg-style aggregates
(``utils/imb_rating.py:55-64`` weighted means, ``app.py:217-236``
vote-count gates); an engine replacing it needs the full descriptive-
statistics toolbox. Everything here is a single hash aggregate with
map-side partials — one shuffle on the group key, mergeable state.

Determinism across engines:
- Moments are NOT computed with the engines' native ``var_samp``/``corr``
  (those use one-pass update formulas whose floating intermediate state
  differs per engine and per partial-aggregation order). Instead every
  moment derives from exact decimal power sums (Σx, Σx², Σxy — associative,
  order-independent; see :func:`registry.exact_sum`) combined by an
  IDENTICAL closed-form expression on both sides, so the final doubles are
  bit-equal. This is also the 100 TB shape: power sums are tiny mergeable
  state (3 decimals per group), unlike a sorted-values percentile.
- ``max_by``/``min_by`` carry a unique-key tiebreaker inside a struct
  ordering — without it, ties make the returned row nondeterministic.
- ``mode`` is computed as arg-max over (count, value) rather than the
  builtin ``F.mode`` (tie behavior implementation-defined).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, sql_exact_sum
from ..sources import tables


@query(
    "a10_stat_moments",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS cx,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cy
      FROM lineitem
    ),
    sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(cx AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS sx,
             CAST(SUM(CAST(cx * cx AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS sxx,
             CAST(SUM(CAST(cy AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS sy,
             CAST(SUM(CAST(cy * cy AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS syy,
             CAST(SUM(CAST(cx * cy AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS sxy
      FROM cents
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (sxx - (sx * sx) / n) / (n - 1) AS var_qty,
           sqrt((sxx - (sx * sx) / n) / (n - 1)) AS std_qty,
           (sxy - (sx * sy) / n)
             / sqrt((sxx - (sx * sx) / n) * (syy - (sy * sy) / n)) AS corr_qty_price
    FROM sums
    ORDER BY l_returnflag
    """,
)
def a10_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample variance / stddev / Pearson correlation per group from
    exact INTEGER power sums (one pass, one shuffle). Quantities/prices
    carry exactly 2 decimals, so ``round(x*100)`` is an exact integer on
    both engines and every power sum (Σcx, Σcx², Σcx·cy — decimal
    accumulators, associative) is exact with NO double→decimal rounding
    anywhere. (Summing ``decimal(18,6)``-cast squares instead diverged at
    the last ulp: price² needs rounding to the 1e-6 grid and Spark/DuckDB
    round ties differently.) The closed-form combine — ``(Σx² −
    (Σx)²/n)/(n−1)`` etc. — is written identically in the oracle, so both
    engines round the same exact rationals through the same IEEE operation
    sequence. Per-row cx·cy stays < 1e11, inside the DECIMAL(18,0)
    per-row cast; the accumulator auto-widens."""
    li = tables(spark, sf_dir)["lineitem"]
    cx = F.round(F.col("l_quantity") * 100).cast("bigint")
    cy = F.round(F.col("l_extendedprice") * 100).cast("bigint")

    def int_sum(expr: F.Column, scale: float, alias: str) -> F.Column:
        return (
            F.sum(expr.cast("decimal(18,0)")).cast("double") / F.lit(scale)
        ).alias(alias)

    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        int_sum(cx, 100.0, "sx"),
        int_sum(cx * cx, 10000.0, "sxx"),
        int_sum(cy, 100.0, "sy"),
        int_sum(cy * cy, 10000.0, "syy"),
        int_sum(cx * cy, 10000.0, "sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    var_qty = (sxx - (sx * sx) / n) / (n - 1)
    return sums.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        var_qty.alias("var_qty"),
        F.sqrt(var_qty).alias("std_qty"),
        (
            (sxy - (sx * sy) / n)
            / F.sqrt((sxx - (sx * sx) / n) * (syy - (sy * sy) / n))
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "a11_arg_extrema",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
      FROM customer
    )
    SELECT mx.c_mktsegment,
           mx.c_name AS richest_name, mx.c_acctbal AS richest_bal,
           mn.c_name AS poorest_name, mn.c_acctbal AS poorest_bal
    FROM ranked mx JOIN ranked mn
      ON mx.c_mktsegment = mn.c_mktsegment AND mx.rmax = 1 AND mn.rmin = 1
    ORDER BY mx.c_mktsegment
    """,
)
def a11_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_by``/``min_by`` (arg-extrema) per group: the row-valued
    aggregate that replaces a self-join-with-max (one shuffle instead of
    two plus a join). The ordering key is ``struct(c_acctbal, c_custkey)``
    — struct comparison is lexicographic, so the unique custkey breaks
    acctbal ties deterministically. The oracle states the same semantics
    as a window rank (DuckDB's ``arg_max`` doesn't take a composite
    ordering directly)."""
    c = tables(spark, sf_dir)["customer"]
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by(F.col("c_name"), key).alias("richest_name"),
            F.max(F.col("c_acctbal")).alias("richest_bal"),
            F.min_by(F.col("c_name"), key).alias("poorest_name"),
            F.min(F.col("c_acctbal")).alias("poorest_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "a12_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS INT) AS bucket,
           COUNT(*) AS n_orders,
           {sql_exact_sum('o_totalprice', 'bucket_total')}
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def a12_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = ⌊price/25000⌋ computed in the
    projection so the aggregate is a plain hash-group on a small int key.
    At 100 TB this is the degenerate-skew-free aggregation: bucket count
    is bounded (~40), partial aggregation collapses each partition to ≤40
    rows before the shuffle — the shuffle moves KB regardless of input
    size."""
    o = tables(spark, sf_dir)["orders"]
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("int").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("bucket_total"),
        )
        .orderBy("bucket")
    )


@query(
    "a13_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments_sorted
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def a13_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered set collection: ``collect_set`` → ``array_sort`` →
    ``array_join`` (the deterministic form of ordered string_agg — a bare
    collect_list's order is partition-arrival nondeterministic, so sorting
    AFTER collecting is mandatory for a stable result). Emitted as a
    joined string: the driver canonicalizer hashes scalar cells only.
    Set cardinality is bounded (5 segments), so per-group state is O(1)."""
    c = tables(spark, sf_dir)["customer"]
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments_sorted"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "a14_mode_count_distinct",
    oracle="""
    WITH month_counts AS (
      SELECT l_returnflag, month(l_shipdate) AS m, COUNT(*) AS cnt
      FROM lineitem
      GROUP BY 1, 2
    ),
    modes AS (
      SELECT l_returnflag, m AS mode_month, cnt AS mode_count,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, m DESC) AS rn
      FROM month_counts
    ),
    distincts AS (
      SELECT l_returnflag,
             COUNT(DISTINCT (l_linestatus, year(l_shipdate))) AS n_status_years
      FROM lineitem
      GROUP BY 1
    )
    SELECT d.l_returnflag, d.n_status_years, mo.mode_month, mo.mode_count
    FROM distincts d JOIN modes mo
      ON d.l_returnflag = mo.l_returnflag AND mo.rn = 1
    ORDER BY d.l_returnflag
    """,
)
def a14_mode_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode + multi-column distinct count. Mode = arg-max
    over the (count, value) pair from a pre-aggregation — NOT ``F.mode``,
    whose tie choice is implementation-defined; ``max_by(m, struct(cnt,
    m))`` picks highest-count-then-highest-month on both engines. The
    two-granularity plan is two hash aggregates over the same scan; the
    second input is already tiny (|flags|×12 rows)."""
    li = tables(spark, sf_dir)["lineitem"]
    month_counts = li.groupBy(
        "l_returnflag", F.month("l_shipdate").alias("m")
    ).agg(F.count("*").alias("cnt"))
    modes = month_counts.groupBy("l_returnflag").agg(
        F.max_by(F.col("m"), F.struct(F.col("cnt"), F.col("m"))).alias("mode_month"),
        F.max(F.struct(F.col("cnt"), F.col("m"))).getField("cnt").alias("mode_count"),
    )
    distincts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_linestatus", F.year("l_shipdate")).alias("n_status_years")
    )
    return (
        distincts.join(modes, "l_returnflag")
        .select("l_returnflag", "n_status_years", "mode_month", "mode_count")
        .orderBy("l_returnflag")
    )


@query(
    "a15_heavy_hitters",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT k AS l_suppkey, cnt,
           CAST(cnt AS DOUBLE) / tot.n AS support,
           TRUE AS approx_found
    FROM counts, tot
    ORDER BY cnt DESC, k
    LIMIT 10
    """,
)
def a15_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: exact top-10 keys by frequency next to Spark's
    ``freqItems`` sketch (Karp-Papadimitriou-Shenker single-pass frequent
    items). The gate column asserts every exact heavy hitter above the
    sketch's support threshold IS in the sketch result — the sketch's
    one-sided guarantee (no false negatives above support) is the ERROR
    CONTRACT the oracle checks, the a2/a9 pattern for approximate
    operators. Exact side: one hash aggregate + TakeOrdered; sketch side:
    one pass, fixed state, mergeable — the 100 TB shape when the key
    space itself doesn't fit an aggregate."""
    li = tables(spark, sf_dir)["lineitem"]
    # KPS sketch with support 0.1%: keys above support are guaranteed out
    sketch = set(li.freqItems(["l_suppkey"], support=0.001).collect()[0][0])
    n = li.count()
    counts = li.groupBy(F.col("l_suppkey")).agg(F.count("*").alias("cnt"))
    top = (
        counts.select(
            "l_suppkey",
            "cnt",
            (F.col("cnt").cast("double") / F.lit(n)).alias("support"),
        )
        .orderBy(F.col("cnt").desc(), "l_suppkey")
        .limit(10)
    )
    found = F.when(
        F.col("support") >= 0.001, F.col("l_suppkey").isin(list(sketch))
    ).otherwise(F.lit(True))
    return top.select("l_suppkey", "cnt", "support", found.alias("approx_found"))


@query(
    "a16_skew_profile",
    oracle="""
    WITH g AS (SELECT l_orderkey, COUNT(*) AS sz FROM lineitem GROUP BY 1)
    SELECT COUNT(*) AS n_keys,
           CAST(MIN(sz) AS BIGINT) AS min_sz,
           CAST(MAX(sz) AS BIGINT) AS max_sz,
           quantile_cont(sz, 0.5) AS p50_sz,
           quantile_cont(sz, 0.99) AS p99_sz,
           CAST(MAX(sz) AS DOUBLE)
             / (CAST(SUM(sz) AS DOUBLE) / COUNT(*)) AS skew_factor
    FROM g
    """,
)
def a16_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy-key skew diagnostics: the group-size distribution of a
    prospective shuffle key (min/max/p50/p99 group size and max/mean skew
    factor). This is the query you run BEFORE committing a 100 TB join to
    a key — skew_factor ≫ 1 means salting or AQE skew-join handling
    (tests/test_scale_plans.py proves the engine applies it). Two
    aggregates: per-key sizes, then the tiny distribution summary."""
    li = tables(spark, sf_dir)["lineitem"]
    g = li.groupBy("l_orderkey").agg(F.count("*").alias("sz"))
    return g.agg(
        F.count("*").alias("n_keys"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        F.percentile("sz", 0.5).alias("p50_sz"),
        F.percentile("sz", 0.99).alias("p99_sz"),
        (
            F.max("sz").cast("double")
            / (F.sum("sz").cast("double") / F.count("*"))
        ).alias("skew_factor"),
    )


@query(
    "a17_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_v,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    ORDER BY col
    """,
)
def a17_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (ANALYZE-style data-quality summary): null count,
    distinct count, min/max per profiled column, one row per column —
    values rendered as strings so heterogeneous column types stack in one
    relation. ALL columns profile in a single scan (one aggregate
    computes every column's stats; the per-column rows are a constant
    unpivot of that one row). At 100 TB swap exact distinct for the HLL
    sketch (a2) — same output contract with a tolerance gate."""
    o = tables(spark, sf_dir)["orders"]
    agg = o.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("string").alias("min_ck"),
        F.max("o_custkey").cast("string").alias("max_ck"),
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").alias("min_st"),
        F.max("o_orderstatus").alias("max_st"),
        F.count("o_orderpriority").alias("nn_pr"),
        F.countDistinct("o_orderpriority").alias("nd_pr"),
        F.min("o_orderpriority").alias("min_pr"),
        F.max("o_orderpriority").alias("max_pr"),
    )
    cols = [
        ("o_custkey", "nn_ck", "nd_ck", "min_ck", "max_ck"),
        ("o_orderpriority", "nn_pr", "nd_pr", "min_pr", "max_pr"),
        ("o_orderstatus", "nn_st", "nd_st", "min_st", "max_st"),
    ]
    profile = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        (F.col("n") - F.col(nn)).alias("n_null"),
                        F.col(nd).alias("n_distinct"),
                        F.col(mn).alias("min_v"),
                        F.col(mx).alias("max_v"),
                    )
                    for c, nn, nd, mn, mx in cols
                ]
            )
        ).alias("p")
    )
    return profile.select(
        F.col("p.col").alias("col"),
        F.col("p.n_null").alias("n_null"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_v").alias("min_v"),
        F.col("p.max_v").alias("max_v"),
    ).orderBy("col")


@query(
    "a18_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(d.med) AS med,
           MIN(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def a18_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier profile: median + MAD (median absolute
    deviation) per event_type, and the count of values beyond the
    3σ-equivalent robust gate (1.4826·MAD ≈ σ under normality). Unlike
    mean/stddev (a10), a single corrupt value cannot drag the gate.

    Exact interpolated medians (same ``percentile``/``quantile_cont``
    parity a8 certifies); two grouped aggregates over the bounded
    event_type key plus one broadcast-size join back — the per-group
    sorted-collect state is the a8 caveat: at very large groups switch
    the medians to ``percentile_approx`` and the oracle to a tolerance
    gate."""
    ev = tables(spark, sf_dir)["events"]
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "a19_chi2_contingency",
    oracle="""
    WITH obs AS (
      SELECT c_mktsegment AS segment, o_orderstatus AS status,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT SUM(observed) AS n FROM obs
    ),
    margins AS (
      SELECT o.segment, o.status, o.observed,
             SUM(o.observed) OVER (PARTITION BY o.segment) AS row_total,
             SUM(o.observed) OVER (PARTITION BY o.status) AS col_total
      FROM obs o
    )
    SELECT segment, status, observed,
           CAST(row_total AS DOUBLE) * col_total / (SELECT n FROM tot)
             AS expected,
           CAST(CAST((observed - CAST(row_total AS DOUBLE) * col_total
                        / (SELECT n FROM tot))
                     * (observed - CAST(row_total AS DOUBLE) * col_total
                        / (SELECT n FROM tot))
                     / (CAST(row_total AS DOUBLE) * col_total
                        / (SELECT n FROM tot))
                AS DECIMAL(18,9)) AS DOUBLE) AS chi2_contrib
    FROM margins
    ORDER BY segment, status
    """,
)
def a19_chi2_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence scaffold over the market-segment ×
    order-status contingency table: observed counts, independence-model
    expectations (row·col/n), and per-cell χ² contributions (quantized
    to DECIMAL(18,9) so a downstream exact sum is order-independent —
    the same discipline as exact_sum). The margins are windows over the
    15-cell aggregate, not the fact table; the only fact-scale work is
    one broadcast join + one grouped count."""
    t = tables(spark, sf_dir)
    obs = (
        t["orders"]
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("observed"))
    )
    from pyspark.sql import Window

    row_t = F.sum("observed").over(Window.partitionBy("segment"))
    col_t = F.sum("observed").over(Window.partitionBy("status"))
    # grand total via a broadcast 1-row aggregate, NOT an unpartitioned
    # window (the engine-wide invariant bans that shape; over a 15-cell
    # frame it would be harmless, but the clean form costs nothing)
    obs = obs.crossJoin(F.broadcast(obs.agg(F.sum("observed").alias("n"))))
    expected = row_t.cast("double") * col_t / F.col("n")
    contrib = (
        ((F.col("observed") - expected) * (F.col("observed") - expected) / expected)
        .cast("decimal(18,9)")
        .cast("double")
    )
    return (
        obs.select(
            "segment",
            "status",
            "observed",
            expected.alias("expected"),
            contrib.alias("chi2_contrib"),
        )
        .orderBy("segment", "status")
    )


@query(
    "x_join_size_estimate",
    oracle="""
    WITH h1 AS (
      SELECT user_id, user_id % 128 AS b, COUNT(*) AS c
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY 1, 2
    ),
    h2 AS (
      SELECT user_id, user_id % 128 AS b, COUNT(*) AS c
      FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY 1, 2
    ),
    actual AS (
      SELECT CAST(SUM(CAST(h1.c * h2.c AS DECIMAL(28,0))) AS BIGINT) AS pairs
      FROM h1 JOIN h2 USING (user_id)
    ),
    g AS (
      SELECT (SELECT CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) FROM h1) AS n1,
             (SELECT CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) FROM h2) AS n2,
             (SELECT COUNT(*) FROM h1) AS ndv1,
             (SELECT COUNT(*) FROM h2) AS ndv2
    ),
    hb AS (
      SELECT CAST(SUM(CAST(CAST(r1 AS DOUBLE) * CAST(r2 AS DOUBLE)
                           / CAST(CASE WHEN x1 >= x2 THEN x1 ELSE x2 END
                                  AS DOUBLE)
                      AS DECIMAL(28,9))) AS DOUBLE) AS est_hist
      FROM (
        SELECT b,
               CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) AS r1,
               COUNT(*) AS x1
        FROM h1 GROUP BY b
      ) s1
      JOIN (
        SELECT b,
               CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) AS r2,
               COUNT(*) AS x2
        FROM h2 GROUP BY b
      ) s2 USING (b)
    )
    SELECT g.n1, g.n2, g.ndv1, g.ndv2, actual.pairs AS actual_pairs,
           CAST(g.n1 AS DOUBLE) * CAST(g.n2 AS DOUBLE)
             / CAST(CASE WHEN g.ndv1 >= g.ndv2 THEN g.ndv1 ELSE g.ndv2 END
                    AS DOUBLE) AS est_uniform,
           hb.est_hist AS est_histogram
    FROM g, actual, hb
    """,
)
def x_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation diagnostics — the statistics a
    cost-based optimizer (ANALYZE) keeps, certified against the exact
    answer. For the user-keyed self-join of the first vs second half of
    the month: the EXACT output size Σᵤ c₁(u)·c₂(u), the textbook
    uniform estimate |R|·|S|/max(ndv_R, ndv_S), and the 128-bucket
    histogram estimate Σ_b r₁(b)·r₂(b)/max(ndv₁(b), ndv₂(b)) — the
    per-bucket refinement that tightens the uniform bound. Exact counts
    flow through integer/decimal sums; estimates divide in DOUBLE with
    identical expressions both engines. Completes the pre-flight
    diagnostics family (a15 heavy hitters, a16 skew profile, a17 table
    profile): at 100 TB, these numbers decide broadcast-vs-shuffle and
    shuffle-partition sizing BEFORE the job runs, from per-key aggs that
    are a tiny fraction of the join itself."""
    ev = tables(spark, sf_dir)["events"]
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    h1 = (
        ev.where(F.col("ts") < cut)
        .groupBy("user_id", (F.col("user_id") % 128).alias("b"))
        .agg(F.count("*").alias("c"))
    )
    h2 = (
        ev.where(F.col("ts") >= cut)
        .groupBy("user_id", (F.col("user_id") % 128).alias("b"))
        .agg(F.count("*").alias("c"))
    )
    actual = (
        h1.select("user_id", F.col("c").alias("c1"))
        .join(h2.select("user_id", F.col("c").alias("c2")), "user_id")
        .agg(
            F.sum((F.col("c1") * F.col("c2")).cast("decimal(28,0)"))
            .cast("bigint")
            .alias("actual_pairs")
        )
    )
    g = h1.agg(
        F.sum(F.col("c").cast("decimal(18,0)")).cast("bigint").alias("n1"),
        F.count("*").alias("ndv1"),
    ).crossJoin(
        F.broadcast(
            h2.agg(
                F.sum(F.col("c").cast("decimal(18,0)")).cast("bigint").alias("n2"),
                F.count("*").alias("ndv2"),
            )
        )
    )
    s1 = h1.groupBy("b").agg(
        F.sum(F.col("c").cast("decimal(18,0)")).cast("bigint").alias("r1"),
        F.count("*").alias("x1"),
    )
    s2 = h2.groupBy("b").agg(
        F.sum(F.col("c").cast("decimal(18,0)")).cast("bigint").alias("r2"),
        F.count("*").alias("x2"),
    )
    # per-bucket terms are DECIMAL-quantized before the sum — a plain
    # double sum would depend on partial-aggregation order
    hb = s1.join(s2, "b").agg(
        F.sum(
            (
                F.col("r1").cast("double")
                * F.col("r2").cast("double")
                / F.greatest("x1", "x2").cast("double")
            ).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("est_hist")
    )
    est_uniform = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / F.greatest("ndv1", "ndv2").cast("double")
    )
    return (
        g.crossJoin(F.broadcast(actual))
        .crossJoin(F.broadcast(hb))
        .select(
            "n1",
            "n2",
            "ndv1",
            "ndv2",
            "actual_pairs",
            est_uniform.alias("est_uniform"),
            F.col("est_hist").alias("est_histogram"),
        )
    )


@query(
    "x_countmin_freq",
    oracle="""
    WITH buckets AS (
      SELECT user_id,
             ('0x' || substr(md5('1-' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 256 AS b1,
             ('0x' || substr(md5('2-' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 256 AS b2
      FROM events
    ),
    row1 AS (SELECT b1 AS b, COUNT(*) AS c FROM buckets GROUP BY 1),
    row2 AS (SELECT b2 AS b, COUNT(*) AS c FROM buckets GROUP BY 1),
    exact AS (
      SELECT user_id, b1, b2, COUNT(*) AS exact_cnt
      FROM buckets
      GROUP BY 1, 2, 3
      ORDER BY exact_cnt DESC, user_id
      LIMIT 10
    )
    SELECT e.user_id, e.exact_cnt,
           CASE WHEN r1.c <= r2.c THEN r1.c ELSE r2.c END AS cms_est,
           CASE WHEN r1.c <= r2.c THEN r1.c ELSE r2.c END - e.exact_cnt
             AS overestimate
    FROM exact e
    JOIN row1 r1 ON e.b1 = r1.b
    JOIN row2 r2 ON e.b2 = r2.b
    ORDER BY e.exact_cnt DESC, e.user_id
    """,
)
def x_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (d=2 hash rows, w=256
    buckets, md5-derived engine-portable hashes), certified against the
    exact counts of the top-10 users: the CMS estimate is the MIN over
    the per-row bucket counts and can only OVER-estimate (collisions add,
    never subtract) — the ``overestimate`` column exposes exactly how
    much. The sketch state is d×w integers — constant-size, mergeable
    across partitions and micro-batches, which is why CMS (not exact
    groupBy) is the 100 TB/streaming shape for frequency queries; here
    both the sketch build (two 256-key hash aggs) and the probe replay
    exactly in SQL. Pure integer arithmetic throughout."""
    ev = tables(spark, sf_dir)["events"]

    def bucket(seed: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "-"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 256
        )

    b = ev.select("user_id", bucket("1").alias("b1"), bucket("2").alias("b2"))
    row1 = b.groupBy(F.col("b1").alias("b")).agg(F.count("*").alias("c1"))
    row2 = b.groupBy(F.col("b2").alias("b")).agg(F.count("*").alias("c2"))
    exact = (
        b.groupBy("user_id", "b1", "b2")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(10)
    )
    est = F.least("c1", "c2")
    return (
        exact.join(F.broadcast(row1), exact["b1"] == row1["b"])
        .join(F.broadcast(row2), exact["b2"] == row2["b"])
        .select(
            "user_id",
            "exact_cnt",
            est.alias("cms_est"),
            (est - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


@query(
    "x_table_checksum",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' ||
               o_orderstatus || '|' ||
               CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                 || '|' ||
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||
               o_orderpriority), 1, 15))::BIGINT AS rh
      FROM orders
    )
    SELECT COUNT(*) AS n_rows, bit_xor(rh) AS checksum_xor
    FROM h
    """,
)
def x_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint: per-row md5 over a
    canonicalized column serialization (integers and ISO dates — never
    raw double formatting, which engines print differently), folded with
    the commutative-associative ``bit_xor`` aggregate. Constant-size
    state, no sort, no shuffle beyond the final 1-row combine — the
    cheap replication / migration consistency check two engines (or two
    clusters) can both compute and compare, certified here by DuckDB
    producing the identical 60-bit checksum. XOR fold means row ORDER
    and PARTITIONING are provably irrelevant; a single changed row flips
    the checksum with probability 1 − 2⁻⁶⁰."""
    o = tables(spark, sf_dir)["orders"]
    serialized = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(serialized), 1, 15), 16, 10).cast("bigint")
    return o.select(rh.alias("rh")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(rh)").alias("checksum_xor"),
    )


#: log10(1 + 1/d) for d = 1..9, as exact double literals — Benford's
#: expected first-digit frequencies, hardcoded so NO engine evaluates a
#: log (libm results differ cross-engine in the last ulp).
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


@query(
    "x_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS d
      FROM orders
    ),
    c AS (
      SELECT d, COUNT(*) AS observed,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      FROM digits GROUP BY d
    )
    SELECT d, observed,
           CAST(observed AS DOUBLE) / CAST(n AS DOUBLE) AS observed_freq,
           CASE d {' '.join(f"WHEN {d} THEN CAST('{f!r}' AS DOUBLE)" for d, f in _BENFORD.items())}
           END AS benford_freq,
           (CAST(observed AS DOUBLE)
            - CASE d {' '.join(f"WHEN {d} THEN CAST('{f!r}' AS DOUBLE)" for d, f in _BENFORD.items())}
              END * CAST(n AS DOUBLE))
           * (CAST(observed AS DOUBLE)
              - CASE d {' '.join(f"WHEN {d} THEN CAST('{f!r}' AS DOUBLE)" for d, f in _BENFORD.items())}
                END * CAST(n AS DOUBLE))
           / (CASE d {' '.join(f"WHEN {d} THEN CAST('{f!r}' AS DOUBLE)" for d, f in _BENFORD.items())}
              END * CAST(n AS DOUBLE)) AS chi2_contrib
    FROM c
    ORDER BY d
    """,
)
def x_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the classic
    fraud / data-fabrication screen. The leading digit comes from the
    CENTS integer's decimal string (identical on both engines; no float
    formatting), expected frequencies are the nine ``log10(1+1/d)``
    values hardcoded as exact double literals (the no-libm doctrine:
    neither engine evaluates a log; the oracle passes them as STRING
    casts — DuckDB's bare numeric literal parses through DECIMAL and is
    NOT correctly rounded to double, off by 1 ulp on d=3), and each
    digit's χ² contribution is
    the identical +,−,×,÷ sequence. One map-side digit projection + one
    9-key hash aggregate; the grand total rides the aggregate as a
    window over 9 rows."""
    o = tables(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d = F.substring(cents.cast("string"), 1, 1).cast("int")
    c = o.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("observed"))
    # grand total via a broadcast 1-row aggregate, NOT an unpartitioned
    # window (engine-wide invariant; same idiom as a19_chi2_contingency)
    total = c.agg(F.sum("observed").cast("bigint").alias("n"))
    benford = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )[F.col("d")]
    obs_d = F.col("observed").cast("double")
    n_d = F.col("n").cast("double")
    expected = benford * n_d
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "d",
            "observed",
            (obs_d / n_d).alias("observed_freq"),
            benford.alias("benford_freq"),
            ((obs_d - expected) * (obs_d - expected) / expected).alias(
                "chi2_contrib"
            ),
        )
        .orderBy("d")
    )


@query(
    "x_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey % 500 AS item FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    singles AS (SELECT item, COUNT(*) AS c FROM baskets GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_c
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, pair_c,
           CAST(pair_c AS DOUBLE) / CAST(sa.c AS DOUBLE) AS confidence,
           CAST(pair_c AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
             / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS lift
    FROM pairs
    JOIN singles sa ON sa.item = item_a
    JOIN singles sb ON sb.item = item_b
    CROSS JOIN n
    ORDER BY pair_c DESC, item_a, item_b
    LIMIT 20
    """,
)
def x_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchase associations with support, confidence and lift
    — the relational association query (support counts exact; compare
    x_fpgrowth_itemsets, which certifies the MLlib PFP trainer producing
    the same supports). Items are coarsened (partkey % 500) so pairs
    recur. The pair join is basket-keyed (order) with constant fan-out —
    baskets hold 4-7 items, so the self-join is Σ|basket|², linear in
    orders; singles broadcast into the pair frame; total order on
    (support desc, pair) makes the LIMIT deterministic."""
    li = tables(spark, sf_dir)["lineitem"]
    baskets = li.select(
        "l_orderkey", (F.col("l_partkey") % 500).alias("item")
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    singles = baskets.groupBy("item").agg(F.count("*").alias("c"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").alias("pair_c"))
    )
    sa = singles.select(F.col("item").alias("item_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("item").alias("item_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "pair_c",
            (F.col("pair_c").cast("double") / F.col("ca").cast("double")).alias(
                "confidence"
            ),
            (
                F.col("pair_c").cast("double")
                * F.lit(float(n_orders))
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("pair_c").desc(), "item_a", "item_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Functional-dependency / column-correlation profile (ANALYZE statistics)
# ---------------------------------------------------------------------------

#: (table, determinant column, dependent column) pairs profiled — one
#: perfect FD (nation key → name), one hierarchical partial (brand →
#: type), and three independence-suspect pairs the optimizer would
#: otherwise assume uncorrelated.
_FD_PAIRS = (
    ("nation", "n_nationkey", "n_name"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("customer", "c_mktsegment", "c_nationkey"),
)


def _fd_oracle() -> str:
    parts = [
        f"""
    SELECT '{t}' AS tbl, '{a}' AS lhs, '{b}' AS rhs,
           COUNT(DISTINCT {a}) AS ndv_lhs,
           COUNT(DISTINCT {b}) AS ndv_rhs,
           COUNT(DISTINCT ({a}, {b})) AS ndv_pair,
           COUNT(DISTINCT {a}) = COUNT(DISTINCT ({a}, {b})) AS fd_holds,
           CAST(COUNT(DISTINCT {a}) * 1000000
                // COUNT(DISTINCT ({a}, {b})) AS BIGINT) AS strength_ppm
    FROM {t}"""
        for t, a, b in _FD_PAIRS
    ]
    return "\n    UNION ALL".join(parts) + "\n    ORDER BY tbl, lhs, rhs"


def fd_profile_core(
    t: dict[str, DataFrame], exact: bool = True, rsd: float = 0.02
) -> DataFrame:
    """The FD profile over ``_FD_PAIRS`` with a selectable NDV engine:
    ``exact=True`` → ``COUNT(DISTINCT …)`` (a full distinct-hash per
    pair — what the hash-gated oracle certifies); ``exact=False`` →
    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``) —
    the 100 TB path, where three exact distinct-aggregates per pair
    would each shuffle every distinct value and the profile only feeds
    a cost model that tolerates ±2% (VERDICT r9 #5: the approx swap is
    now code behind this flag, not a docstring aspiration; a pytest
    bounds approx-vs-exact strength_ppm error on the fixtures). The
    pair NDV sketches a struct of both columns — one pass, constant
    sketch state per aggregate, no shuffle of values."""
    outs = []
    for tbl, a, b in _FD_PAIRS:
        if exact:
            ndv_lhs = F.countDistinct(a)
            ndv_pair = F.countDistinct(a, b)
            ndv_rhs = F.countDistinct(b)
        else:
            ndv_lhs = F.approx_count_distinct(a, rsd)
            ndv_rhs = F.approx_count_distinct(b, rsd)
            ndv_pair = F.approx_count_distinct(F.struct(a, b), rsd)
        outs.append(
            t[tbl].agg(
                F.lit(tbl).alias("tbl"),
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                ndv_lhs.alias("ndv_lhs"),
                ndv_rhs.alias("ndv_rhs"),
                ndv_pair.alias("ndv_pair"),
                (ndv_lhs == ndv_pair).alias("fd_holds"),
                (ndv_lhs * F.lit(1_000_000))
                .cast("bigint")
                .alias("_scaled"),
            ).select(
                "tbl",
                "lhs",
                "rhs",
                "ndv_lhs",
                "ndv_rhs",
                "ndv_pair",
                "fd_holds",
                F.expr("_scaled DIV ndv_pair").alias("strength_ppm"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("tbl", "lhs", "rhs")


@query("x_fd_profile", oracle=_fd_oracle())
def x_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency strength profile — the ANALYZE statistic a
    cost-based optimizer needs to avoid the independence assumption:
    for each (determinant, dependent) column pair, the three distinct
    counts and ``strength_ppm = 1e6·ndv(lhs)/ndv(lhs,rhs)`` (1e6 ⇔ a
    perfect FD: the pair adds no entropy; smaller ⇔ the dependent
    fans out). Complements `x_join_size_estimate` (histograms) and
    `a17_table_profile` (single-column stats) with CROSS-column
    structure.

    Scale: one distinct-aggregate per profiled pair over its own scan;
    the registered face runs :func:`fd_profile_core` with
    ``exact=True`` (hash-exact against the oracle), and the SAME core
    with ``exact=False`` is the runnable approx_count_distinct path for
    100 TB — both faces pytest-covered."""
    return fd_profile_core(tables(spark, sf_dir), exact=True)


#: HLL++ relative standard deviation for the registered approx face, and
#: the in-query acceptance bound expressed as a multiple of it. 5·rsd is
#: ≈5σ of the sketch's error distribution — loose enough to never flake,
#: tight enough that a broken sketch path (wrong column, wrong struct)
#: fails the flag column immediately.
_FD_APPROX_RSD = 0.02
_FD_APPROX_BOUND_PPM = int(5 * _FD_APPROX_RSD * 1_000_000)


@query("x_fd_profile_approx", oracle=None)
def x_fd_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB ANALYZE path of the FD profile as its own driver row
    (VERDICT r11 #4): :func:`fd_profile_core` with
    ``approx_count_distinct`` (HyperLogLog++, rsd={rsd}) side-by-side
    with the exact face, plus an IN-QUERY error audit — per profiled
    pair, the worst relative NDV error across lhs/rhs/pair sketches in
    ppm and a ``within_bound`` flag at {bound} ppm (≈5σ). No SQL oracle:
    DuckDB cannot replay Spark's HLL++ registers, so the driver records
    rows-only — but the bound column makes the grade meaningful (the
    x_countmin_freq pattern: the query certifies its own approximation
    against the exact computation it ships with).

    Scale: the exact twin here exists only to audit the sketch at
    fixture scale; at 100 TB one runs the approx face alone — three
    constant-state sketches per pair, one pass per table, no shuffle of
    distinct values (the exact face shuffles every distinct value three
    times per pair)."""
    t = tables(spark, sf_dir)
    keys = ["tbl", "lhs", "rhs"]

    def rel_err_ppm(side: str) -> Column:
        a = F.col(f"ndv_{side}_approx").cast("double")
        e = F.col(f"ndv_{side}_exact").cast("double")
        return F.abs(a - e) * F.lit(1_000_000.0) / e

    worst = F.greatest(
        rel_err_ppm("lhs"), rel_err_ppm("rhs"), rel_err_ppm("pair")
    ).cast("bigint")
    # BOTH engines' NDVs from ONE aggregation per table (guide §2.4,
    # VERDICT r14 next-round #3): the exact and approx faces used to run
    # fd_profile_core twice — 10 table scans and a keys-join to zip the
    # two 5-row frames. The fused aggregate scans each table once (the
    # HLL sketches ride the same Expand the multi-distinct plan already
    # pays) and the join disappears. Expression-identical aggregates →
    # value-identical output (countDistinct exact; approx_count_distinct
    # deterministic for a given column), audited by
    # test_fd_profile_approx_* and the bound column itself.
    outs = []
    for tbl, a, b in _FD_PAIRS:
        outs.append(
            t[tbl]
            .agg(
                F.lit(tbl).alias("tbl"),
                F.lit(a).alias("lhs"),
                F.lit(b).alias("rhs"),
                F.countDistinct(a).alias("ndv_lhs_exact"),
                F.countDistinct(b).alias("ndv_rhs_exact"),
                F.countDistinct(a, b).alias("ndv_pair_exact"),
                F.approx_count_distinct(a, _FD_APPROX_RSD).alias("ndv_lhs_approx"),
                F.approx_count_distinct(b, _FD_APPROX_RSD).alias("ndv_rhs_approx"),
                F.approx_count_distinct(F.struct(a, b), _FD_APPROX_RSD).alias(
                    "ndv_pair_approx"
                ),
            )
            .select(
                "*",
                # identical integer chain to fd_profile_core: scale in
                # bigint, then Spark's integral DIV
                (F.col("ndv_lhs_exact") * F.lit(1_000_000))
                .cast("bigint")
                .alias("_se"),
                (F.col("ndv_lhs_approx") * F.lit(1_000_000))
                .cast("bigint")
                .alias("_sa"),
            )
            .select(
                "*",
                F.expr("_se DIV ndv_pair_exact").alias("strength_ppm_exact"),
                F.expr("_sa DIV ndv_pair_approx").alias("strength_ppm_approx"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.select(
        *keys,
        "ndv_lhs_exact",
        "ndv_lhs_approx",
        "ndv_pair_exact",
        "ndv_pair_approx",
        "strength_ppm_exact",
        "strength_ppm_approx",
        worst.alias("max_ndv_err_ppm"),
        (worst <= F.lit(_FD_APPROX_BOUND_PPM)).alias("within_bound"),
    ).orderBy(*keys)


x_fd_profile_approx.__doc__ = x_fd_profile_approx.__doc__.format(
    rsd=_FD_APPROX_RSD, bound=_FD_APPROX_BOUND_PPM
)


# ---------------------------------------------------------------------------
# Mergeable-sketch rollup: day HLL sketches union-merged to months (round 13)
# ---------------------------------------------------------------------------

_HLL_ERR_PCT = 2  # loud bound: Datasketches HLL at default lgConfigK=12 has
                  # ~0.8% relative standard error; a rollup estimate drifting
                  # past 2% of exact hash-mismatches the oracle's 0 bucket


@query(
    "x_hll_rollup_merge",
    oracle=f"""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
             AS n_hour_sketches,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(0 AS BIGINT) AS err_gt_{_HLL_ERR_PCT}pct
    FROM events GROUP BY 1
    """,
)
def x_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count rollup: per-HOUR Datasketches HLL
    sketches of active users (``hll_sketch_agg``), union-merged to
    coarser windows (``hll_union_agg``; hour → day here, day → month at
    production horizons) WITHOUT re-scanning raw events —
    THE 100 TB distinct-count architecture (store O(kB) day sketches;
    any coarser window is a register-max merge, where exact distinct
    would re-shuffle the raw corpus per rollup). Sketch merging is
    order-independent (per-register max) and the Datasketches HLL is
    deterministic for fixed input values, so the whole pipeline is
    reproducible.

    Certification split (the x_fd_profile_approx doctrine, here made
    hash-green): DuckDB cannot replay Spark's HLL registers, so the
    oracle certifies (a) the EXACT per-month distinct (audit tier,
    recomputed from raw at fixture scale) and (b) the error BOUND — the
    Spark side emits floor(|est − exact|·(100/{_HLL_ERR_PCT})/exact),
    which is 0 iff the merged estimate lands within {_HLL_ERR_PCT}% of
    exact; the oracle pins the column to literal 0, so an estimator or
    merge regression hash-mismatches LOUDLY instead of drifting
    silently.

    Reference contrast: no sketch surface in the reference; extends
    §2.13's drift/diagnostics family (HLL NDV r12, KMV overlap r12,
    CountMin r11) with the mergeable-rollup face.
    """
    ev = tables(spark, sf_dir)["events"].select(
        F.to_date("ts").cast("string").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
    )
    hour_sketches = ev.groupBy("day", "hour").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily = hour_sketches.groupBy("day").agg(
        F.count("*").cast("long").alias("n_hour_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return daily.join(exact, "day").select(
        "day",
        "n_hour_sketches",
        "exact_distinct",
        F.floor(
            F.abs(F.col("est") - F.col("exact_distinct"))
            * F.lit(100.0 / _HLL_ERR_PCT)
            / F.col("exact_distinct")
        )
        .cast("long")
        .alias(f"err_gt_{_HLL_ERR_PCT}pct"),
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics (round 13)
# ---------------------------------------------------------------------------

#: Winsorization tails: clamp below the p05 and above the p95 order
#: statistic (rank-DISC cutoffs — exact integers, engine-portable; an
#: interpolated percentile would put a float in the hash).
_WINSOR_LO_PCT = 5
_WINSOR_HI_PCT = 95


@query(
    "x_winsorized_stats",
    oracle=f"""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                              AS BIGINT)) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ),
    cuts AS (
      SELECT grp,
             MIN(CASE WHEN rn = (n * {_WINSOR_LO_PCT} + 99) // 100
                      THEN cents END) AS lo,
             MIN(CASE WHEN rn = (n * {_WINSOR_HI_PCT} + 99) // 100
                      THEN cents END) AS hi
      FROM v GROUP BY grp
    )
    SELECT v.grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           cuts.lo AS lo_cents,
           cuts.hi AS hi_cents,
           CAST(SUM(v.cents) AS BIGINT) AS sum_cents_raw,
           CAST(SUM(least(greatest(v.cents, cuts.lo), cuts.hi)) AS BIGINT)
             AS sum_cents_winsorized,
           CAST(SUM(CASE WHEN v.cents < cuts.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(SUM(CASE WHEN v.cents > cuts.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high
    FROM v JOIN cuts USING (grp)
    GROUP BY v.grp, cuts.lo, cuts.hi
    ORDER BY v.grp
    """,
)
def x_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per order priority: exact
    rank-DISC p{lo}/p{hi} cutoffs (the value at rank ⌈p·n⌉ — an
    integer ORDER STATISTIC, so everything emitted is an exact bigint),
    tail rows clamped to the cutoffs, and both the raw and winsorized
    sums with clamp counts. The standard heavy-tail-robust alternative
    to trimming: winsorization keeps n constant (weights every row)
    while bounding the influence of outliers — what a revenue or
    token-count aggregate should publish when single extreme rows can
    move the mean. Complements a18_anomaly_mad (which FLAGS outliers)
    with the CAPPED-AGGREGATE face (which neutralizes them).

    Plan: one per-group value sort (partitioned window — group count is
    bounded), cutoffs reduced to a 1-row-per-group frame that broadcasts
    back onto the rows, one clamped aggregation. Two passes over the
    fact table, no all-pairs anything; at 100 TB swap the exact rank for
    the two-phase distributed rank (operators/ranking.py) the same way
    a8's docstring prescribes.

    Reference contrast: the reference publishes raw AVG() dashboards
    (app.py:218-236) with no robustness surface; §2.13 stats family.
    """
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    from pyspark.sql import Window

    v = tables(spark, sf_dir)["orders"].select(
        F.col("o_orderpriority").alias("grp"), cents.alias("cents")
    )
    w = Window.partitionBy("grp").orderBy("cents")
    ranked = v.select(
        "grp",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).alias("n"),
    )
    cuts = ranked.groupBy("grp").agg(
        F.min(
            F.when(
                F.col("rn")
                == F.expr(f"(n * {_WINSOR_LO_PCT} + 99) DIV 100"),
                F.col("cents"),
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rn")
                == F.expr(f"(n * {_WINSOR_HI_PCT} + 99) DIV 100"),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        v.join(F.broadcast(cuts), "grp")
        .groupBy("grp", "lo", "hi")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents_raw"),
            F.sum(clamped).cast("long").alias("sum_cents_winsorized"),
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
        )
        .select(
            "grp",
            "n_rows",
            F.col("lo").alias("lo_cents"),
            F.col("hi").alias("hi_cents"),
            "sum_cents_raw",
            "sum_cents_winsorized",
            "n_clamped_low",
            "n_clamped_high",
        )
        .orderBy("grp")
    )


x_winsorized_stats.__doc__ = x_winsorized_stats.__doc__.format(
    lo=_WINSOR_LO_PCT, hi=_WINSOR_HI_PCT
)


# ---------------------------------------------------------------------------
# Mergeable-sketch rollups, rounds 14: quantiles + KMV bottom-k samples
# ---------------------------------------------------------------------------

#: Fixed histogram bin width in cents for the mergeable quantile sketch.
#: events.value spans [0.01, ~490] → ≤ ~50 live bins at $10 width: the
#: per-hour sketch is a bounded (bin → count) map, and the deterministic
#: estimate is guaranteed within one bin width of the exact rank statistic.
_QSK_WIDTH_CENTS = 1000


@query(
    "x_quantile_rollup_merge",
    oracle=f"""
    WITH v AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             date_trunc('hour', ts) AS hour,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    hh AS (
      SELECT day, hour, cents // {_QSK_WIDTH_CENTS} AS bin, COUNT(*) AS cnt
      FROM v GROUP BY 1, 2, 3
    ),
    dh AS (
      SELECT day, bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM hh GROUP BY 1, 2
    ),
    tot AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT hour) AS BIGINT) AS n_hour_sketches
      FROM v GROUP BY 1
    ),
    cum AS (
      SELECT day, bin,
             SUM(cnt) OVER (PARTITION BY day ORDER BY bin) AS cum
      FROM dh
    ),
    est AS (
      SELECT c.day,
             MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bin END)
               * {_QSK_WIDTH_CENTS} AS est_p50_cents,
             MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bin END)
               * {_QSK_WIDTH_CENTS} AS est_p95_cents
      FROM cum c JOIN tot USING (day) GROUP BY c.day
    ),
    rk AS (
      SELECT day, cents,
             row_number() OVER (PARTITION BY day ORDER BY cents) AS rn
      FROM v
    ),
    exact AS (
      SELECT r.day,
             MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END)
               AS exact_p50_cents,
             MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END)
               AS exact_p95_cents
      FROM rk r JOIN tot USING (day) GROUP BY r.day
    )
    SELECT t.day, t.n, t.n_hour_sketches,
           est_p50_cents, exact_p50_cents,
           est_p95_cents, exact_p95_cents,
           (exact_p50_cents - est_p50_cents) // {_QSK_WIDTH_CENTS}
             AS p50_err_div_width,
           (exact_p95_cents - est_p95_cents) // {_QSK_WIDTH_CENTS}
             AS p95_err_div_width
    FROM tot t JOIN est USING (day) JOIN exact USING (day)
    ORDER BY t.day
    """,
)
def x_quantile_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE-sketch rollup — the quantile twin of
    x_hll_rollup_merge (VERDICT r13 next-step #6, completing the
    mergeable-sketch story: distinct ✓ HLL, frequency ✓ count-min,
    quantiles now ✓): per-HOUR fixed-boundary histograms of event value
    cents (bin = cents DIV {w} — a bounded (bin → count) map, THE
    textbook mergeable quantile sketch: merging is count addition, no
    raw re-scan), union-merged to DAY, then the p50/p95 rank statistics
    read off the merged cumulative histogram. Fixed shared boundaries
    make the merge exact (unlike KLL/t-digest whose compaction is
    engine-specific and unreplayable — this sketch is deterministic and
    hash-certifiable end to end), at the cost of a data-dependent bin
    count; width ${w//100} bounds it ≤ ~50 on this value domain.

    Certification (all integer): the exact tier recomputes the rank-DISC
    p50/p95 from raw per day (the x_winsorized_stats rank convention),
    and the pinned-error columns ``(exact − est) DIV width`` are 0 by
    construction — the exact statistic lies inside the estimated bin, so
    any estimator/merge regression hash-mismatches loudly.

    Scale: the hour tier is one map-side-combinable groupBy (sketch
    state ≈ bins × hours, kilobytes); day/week/month rollups re-aggregate
    SKETCHES, never raw events — at 100 TB the raw scan happens once at
    ingest and every later horizon is metadata-scale. The exact tier
    exists only to audit at fixture scale (its per-day rank sort is the
    part one drops at 100 TB, or swaps for the two-phase global-rank
    primitive in operators/ranking.py for extreme days).

    Reference contrast: no sketch surface in the reference; extends the
    §2.13 diagnostics family's mergeable-rollup row (x_hll_rollup_merge,
    stats.py) from distinct counts to order statistics."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"].select(
        F.to_date("ts").cast("string").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    hour_hist = ev.groupBy(
        "day", "hour", F.expr(f"cents DIV {_QSK_WIDTH_CENTS}").alias("bin")
    ).agg(F.count("*").alias("cnt"))
    day_hist = hour_hist.groupBy("day", "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    tot = ev.groupBy("day").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("hour").cast("long").alias("n_hour_sketches"),
    )
    cum = day_hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("day").orderBy("bin")
        ),
    )
    est = (
        cum.join(F.broadcast(tot), "day")
        .groupBy("day")
        .agg(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n * 50 + 99) DIV 100"),
                        F.col("bin"),
                    )
                )
                * _QSK_WIDTH_CENTS
            ).alias("est_p50_cents"),
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr("(n * 95 + 99) DIV 100"),
                        F.col("bin"),
                    )
                )
                * _QSK_WIDTH_CENTS
            ).alias("est_p95_cents"),
        )
    )
    rk = ev.withColumn(
        "rn", F.row_number().over(Window.partitionBy("day").orderBy("cents"))
    )
    exact = (
        rk.join(F.broadcast(tot), "day")
        .groupBy("day")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.expr("(n * 50 + 99) DIV 100"),
                    F.col("cents"),
                )
            ).alias("exact_p50_cents"),
            F.min(
                F.when(
                    F.col("rn") == F.expr("(n * 95 + 99) DIV 100"),
                    F.col("cents"),
                )
            ).alias("exact_p95_cents"),
        )
    )
    return (
        tot.join(est, "day")
        .join(exact, "day")
        .select(
            "day",
            "n",
            "n_hour_sketches",
            "est_p50_cents",
            "exact_p50_cents",
            "est_p95_cents",
            "exact_p95_cents",
            F.expr(
                f"(exact_p50_cents - est_p50_cents) DIV {_QSK_WIDTH_CENTS}"
            ).alias("p50_err_div_width"),
            F.expr(
                f"(exact_p95_cents - est_p95_cents) DIV {_QSK_WIDTH_CENTS}"
            ).alias("p95_err_div_width"),
        )
        .orderBy("day")
    )


x_quantile_rollup_merge.__doc__ = x_quantile_rollup_merge.__doc__.replace(
    "{w}", str(_QSK_WIDTH_CENTS)
).replace("{w//100}", str(_QSK_WIDTH_CENTS // 100))


#: Bottom-k sketch size for the mergeable distinct-sample rollup. Per-day
#: distinct users comfortably exceed K at sf ≥ 0.01 (the estimator tier);
#: below K the sketch IS the exact set and the estimate equals it.
_KMV_ROLLUP_K = 48
#: 15 hex chars of the md5 → a 60-bit integer rank space for the KMV
#: distinct estimator (the x_ktruss_peel edge-hash convention).
_KMV_SPACE = 1 << 60


@query(
    "x_kmv_rollup_merge",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             date_trunc('hour', ts) AS hour, user_id,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM events
    ),
    hs AS (
      SELECT day, hour, user_id, h FROM (
        SELECT *, row_number() OVER (PARTITION BY day, hour ORDER BY h) AS r
        FROM u)
      WHERE r <= {_KMV_ROLLUP_K}
    ),
    du AS (SELECT DISTINCT day, user_id, h FROM hs),
    ds AS (
      SELECT day, user_id, h FROM (
        SELECT *, row_number() OVER (PARTITION BY day ORDER BY h) AS r
        FROM du)
      WHERE r <= {_KMV_ROLLUP_K}
    ),
    agg AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS k_used,
             CAST(bit_xor(user_id) AS BIGINT) AS sample_xor,
             CAST(('0x' || substr(MAX(h), 1, 15))::BIGINT AS BIGINT)
               AS kth_hash60
      FROM ds GROUP BY 1
    ),
    ex AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
             CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
               AS n_hour_sketches
      FROM events GROUP BY 1
    ),
    est AS (
      SELECT day, n_hour_sketches, k_used, kth_hash60, sample_xor,
             exact_distinct,
             CAST(CASE WHEN k_used < {_KMV_ROLLUP_K} THEN k_used
                  ELSE ({_KMV_SPACE} // kth_hash60) * {_KMV_ROLLUP_K - 1}
                  END AS BIGINT) AS est_distinct
      FROM agg JOIN ex USING (day)
    )
    SELECT day, n_hour_sketches, k_used, kth_hash60, est_distinct,
           exact_distinct,
           ABS(est_distinct - exact_distinct) // exact_distinct
             AS err_gt_100pct,
           sample_xor
    FROM est ORDER BY day
    """,
)
def x_kmv_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable BOTTOM-K (KMV) distinct-sample rollup: per HOUR, the
    k={k} lexicographically-smallest md5 hashes of the hour's distinct
    users — simultaneously (a) a uniform sample of the distinct-user set
    and (b) a KMV distinct-count sketch — union-merged to DAY by taking
    the k smallest of the hour sketches' union. Bottom-k merge is EXACT
    (any of the day's k smallest distinct hashes is necessarily inside
    its own hour's k smallest), so the two-tier result is byte-identical
    to a direct single-tier pass — which is exactly what the oracle
    certifies: it computes the hour tier then the day merge, while the
    columns it pins (``sample_xor`` of the sampled user ids, the k-th
    hash threshold, the KMV estimate) would diverge on ANY merge bug.
    The third mergeable-sketch face next to x_hll_rollup_merge (opaque
    registers, estimate-only) and x_quantile_rollup_merge (histogram):
    KMV is the one whose state doubles as a REAL row sample — the seed
    for downstream inspection/labeling jobs.

    Estimator tier (all integer, no libm): with the 60-bit hash rank
    space, ``est = (space DIV h_k) · (k−1)`` when the sketch is full,
    else the sketch is the exhaustive set and ``est = k_used``. The
    pinned ``err_gt_100pct = |est − exact| DIV exact`` is 0 at ~7σ of
    the KMV error distribution (rsd ≈ 1/√(k−2) ≈ 15%) — the
    x_hll_rollup_merge loud-bound doctrine.

    Scale: hour tier is one distinct + one bounded per-hour top-k
    (map-side combinable on (day, hour)); every coarser horizon merges
    k-row sketches — metadata-scale, no raw re-scan. The exact tier is
    the fixture-scale audit only.

    Reference contrast: no sketch surface in the reference; §2.13
    diagnostics family, mergeable-rollup row three of three."""
    from pyspark.sql import Window

    ev = tables(spark, sf_dir)["events"]
    u = ev.select(
        F.to_date("ts").cast("string").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    hs = (
        u.withColumn(
            "r",
            F.row_number().over(Window.partitionBy("day", "hour").orderBy("h")),
        )
        .where(F.col("r") <= _KMV_ROLLUP_K)
        .select("day", "user_id", "h")
    )
    du = hs.distinct()
    ds = (
        du.withColumn(
            "r", F.row_number().over(Window.partitionBy("day").orderBy("h"))
        )
        .where(F.col("r") <= _KMV_ROLLUP_K)
    )
    agg = ds.groupBy("day").agg(
        F.count("*").cast("long").alias("k_used"),
        F.expr("bit_xor(user_id)").cast("long").alias("sample_xor"),
        F.conv(F.substring(F.max("h"), 1, 15), 16, 10)
        .cast("long")
        .alias("kth_hash60"),
    )
    ex = ev.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct"),
        F.countDistinct(F.date_trunc("hour", "ts"))
        .cast("long")
        .alias("n_hour_sketches"),
    )
    est = F.when(
        F.col("k_used") < _KMV_ROLLUP_K, F.col("k_used")
    ).otherwise(
        F.expr(f"({_KMV_SPACE} DIV kth_hash60) * {_KMV_ROLLUP_K - 1}")
    ).cast("long")
    return (
        agg.join(ex, "day")
        .withColumn("est_distinct", est)
        .select(
            "day",
            "n_hour_sketches",
            "k_used",
            "kth_hash60",
            "est_distinct",
            "exact_distinct",
            F.expr("abs(est_distinct - exact_distinct) DIV exact_distinct")
            .cast("long")
            .alias("err_gt_100pct"),
            "sample_xor",
        )
        .orderBy("day")
    )


x_kmv_rollup_merge.__doc__ = x_kmv_rollup_merge.__doc__.replace(
    "{k}", str(_KMV_ROLLUP_K)
)


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap (round 14)
# ---------------------------------------------------------------------------

#: Bootstrap replicates. 32 gives rank-based 2nd-smallest/2nd-largest
#: endpoints ≈ a 94% interval; constant fan-out, so the explode is a
#: fixed 32× map-side multiplier absorbed by partial aggregation.
_BOOT_REPS = 32

_SQL_BOOTSTRAP = f"""
    WITH reps AS (SELECT CAST(r AS INTEGER) AS r FROM range({_BOOT_REPS}) t(r)),
    w AS (
      SELECT d.source, d.n_chars, reps.r,
             (CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                        CAST(reps.r AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3') THEN 1 ELSE 0 END
            + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                        CAST(reps.r AS VARCHAR)), 2, 1)
                   IN ('0','1','2','3') THEN 1 ELSE 0 END
            + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                        CAST(reps.r AS VARCHAR)), 3, 1)
                   IN ('0','1','2','3') THEN 1 ELSE 0 END
            + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                        CAST(reps.r AS VARCHAR)), 4, 1)
                   IN ('0','1','2','3') THEN 1 ELSE 0 END) AS wt
      FROM documents d CROSS JOIN reps
    ),
    g AS (
      SELECT source, r,
             CAST(SUM(wt) AS BIGINT) AS wsum,
             CAST(SUM(wt * n_chars) AS BIGINT) AS wn
      FROM w GROUP BY 1, 2
    ),
    rep_means AS (
      SELECT source, r,
             CAST(wn AS DOUBLE) / NULLIF(wsum, 0) AS rep_mean,
             wsum, wn
      FROM g
    ),
    boot AS (
      SELECT source,
             list_sort(list(rep_mean)) AS arr,
             CAST(SUM(wsum) AS BIGINT) AS sum_wsum,
             CAST(SUM(wn) AS BIGINT) AS sum_wn
      FROM rep_means GROUP BY 1
    ),
    exact AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1
    )
    SELECT e.source, e.n_docs, e.sum_chars,
           CAST(e.sum_chars AS DOUBLE) / e.n_docs AS mean_chars,
           b.arr[2] AS boot_lo,
           b.arr[{_BOOT_REPS - 1}] AS boot_hi,
           b.sum_wsum, b.sum_wn,
           (b.arr[2] <= CAST(e.sum_chars AS DOUBLE) / e.n_docs
            AND CAST(e.sum_chars AS DOUBLE) / e.n_docs
                <= b.arr[{_BOOT_REPS - 1}]) AS covers_mean
    FROM exact e JOIN boot b USING (source)
    ORDER BY e.source
    """


@query("x_bootstrap_ci", oracle=_SQL_BOOTSTRAP)
def x_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap confidence interval for the per-source mean
    document length, with DETERMINISTIC resampling: replicate weights are
    Binomial(4, 1/4) draws (mean 1 — the Poisson-bootstrap approximation,
    Chamandy et al.'s "Estimating Uncertainty for Massive Data Streams")
    read off four md5 hex digits of (doc_id, replicate), so every run,
    every engine, and every partitioning draws the SAME bootstrap sample
    — the oracle certifies the resampling itself, not just the interval
    arithmetic. Endpoints are the rank-based 2nd-smallest / 2nd-largest
    of the {r} replicate means (≈94% coverage); ``covers_mean`` flags
    the sanity invariant a healthy interval almost always satisfies.

    This is THE scale-out uncertainty recipe: a classical resample-n-rows
    bootstrap cannot run on 100 TB (each replicate would shuffle the
    corpus), but Poissonized per-row weights make all {r} replicates ONE
    map-side pass — explode a constant 32-element range, weight, and
    hash-aggregate with map-side partials; state per (source, replicate)
    is two bigints, then 32 doubles per source for the rank endpoints
    (bounded arrays, never row collections).

    Integer doctrine: weights and weighted sums are exact integers;
    each replicate mean is ONE double division of two bigints (identical
    expression both engines); the sorted 32-array lookup is rank logic,
    not float summation.

    Reference contrast: the reference has no uncertainty surface at all
    (``app.py`` prints point estimates); extends SURVEY §2.13's
    stats/eval family alongside a10_stat_moments (exact moments) and
    x_welch_ttest (parametric inference) with the nonparametric face."""
    docs = tables(spark, sf_dir)["documents"]
    w = docs.select(
        "source",
        "n_chars",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))).alias("r"),
    )
    key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("r").cast("string"),
        )
    )
    wt = sum(
        F.when(F.substring(key, k, 1).isin("0", "1", "2", "3"), 1).otherwise(0)
        for k in range(1, 5)
    )
    g = w.select("source", "r", wt.alias("wt"), "n_chars").groupBy(
        "source", "r"
    ).agg(
        F.sum("wt").cast("long").alias("wsum"),
        F.sum(F.col("wt") * F.col("n_chars")).cast("long").alias("wn"),
    )
    rep_mean = F.col("wn").cast("double") / F.nullif(
        F.col("wsum"), F.lit(0)
    )
    boot = g.select("source", rep_mean.alias("rep_mean"), "wsum", "wn").groupBy(
        "source"
    ).agg(
        F.sort_array(F.collect_list("rep_mean")).alias("arr"),
        F.sum("wsum").cast("long").alias("sum_wsum"),
        F.sum("wn").cast("long").alias("sum_wn"),
    )
    exact = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    mean_chars = F.col("sum_chars").cast("double") / F.col("n_docs")
    lo = F.col("arr").getItem(1)
    hi = F.col("arr").getItem(_BOOT_REPS - 2)
    return (
        exact.join(boot, "source")
        .select(
            "source",
            "n_docs",
            "sum_chars",
            mean_chars.alias("mean_chars"),
            lo.alias("boot_lo"),
            hi.alias("boot_hi"),
            "sum_wsum",
            "sum_wn",
            ((lo <= mean_chars) & (mean_chars <= hi)).alias("covers_mean"),
        )
        .orderBy("source")
    )


x_bootstrap_ci.__doc__ = x_bootstrap_ci.__doc__.replace("{r}", str(_BOOT_REPS))
