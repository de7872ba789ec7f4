"""Declarative data-quality expectations (round 4): a Deequ-style
constraint suite evaluated in ONE pass over the table plus one
referential-integrity anti-join — the validation layer the reference
scatters across ad-hoc regex checks (``utils/user.py:141``) and
defensive try/except fallbacks (``app.py:134-155``), made systematic.

Scale notes: all row-local constraints fold into a single hash-free
global aggregate (count/min/max/conditional sums — map-side partials,
one scalar row out). The FK check is the only join: a left-anti against
the dimension's key column, broadcast when the dimension is small.
Output is one row per constraint — constant-size regardless of input."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


@query(
    "x_expectations_orders",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT o_orderkey) AS n_keys,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_keys,
             SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg_price,
             SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                      THEN 1 ELSE 0 END) AS bad_status,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                       OR o_orderdate >= TIMESTAMP '2002-01-01'
                      THEN 1 ELSE 0 END) AS bad_date
      FROM orders
    ),
    fk AS (
      SELECT COUNT(*) AS orphans
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      -- CAST: DuckDB SUM(int) widens to HUGEINT (→ float64 in pandas);
      -- Spark emits int64
      SELECT 'o_orderkey_unique' AS constraint_name,
             n_rows = n_keys AS passed,
             CAST(n_rows - n_keys AS BIGINT) AS violations FROM agg
      UNION ALL SELECT 'o_orderkey_complete', null_keys = 0,
             CAST(null_keys AS BIGINT) FROM agg
      UNION ALL SELECT 'o_totalprice_nonnegative', neg_price = 0,
             CAST(neg_price AS BIGINT) FROM agg
      UNION ALL SELECT 'o_orderstatus_domain', bad_status = 0,
             CAST(bad_status AS BIGINT) FROM agg
      UNION ALL SELECT 'o_orderdate_range', bad_date = 0,
             CAST(bad_date AS BIGINT) FROM agg
      UNION ALL SELECT 'o_custkey_ref_integrity', orphans = 0,
             CAST(orphans AS BIGINT) FROM fk
    ) ORDER BY constraint_name
    """,
)
def x_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over orders: key uniqueness and completeness,
    value range, categorical domain, date range, FK integrity against
    customer. One scalar aggregate + one anti-join count; every
    constraint reports (name, passed, violation count) so a pipeline
    gates on ``passed`` and debugs from ``violations``."""
    t = tables(spark, sf_dir)
    o = t["orders"]
    agg = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("null_keys"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
                | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
    )
    orphans = (
        o.join(
            F.broadcast(t["customer"].select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("orphans"))
    )

    def row(name: str, violations: F.Column) -> F.Column:
        return F.struct(
            F.lit(name).alias("constraint_name"),
            (violations == 0).alias("passed"),
            violations.cast("long").alias("violations"),
        )

    checks = agg.select(
        F.explode(
            F.array(
                row("o_orderkey_unique", F.col("n_rows") - F.col("n_keys")),
                row("o_orderkey_complete", F.col("null_keys")),
                row("o_totalprice_nonnegative", F.col("neg_price")),
                row("o_orderstatus_domain", F.col("bad_status")),
                row("o_orderdate_range", F.col("bad_date")),
            )
        ).alias("c")
    ).select("c.*")
    fk = orphans.select(
        F.lit("o_custkey_ref_integrity").alias("constraint_name"),
        (F.col("orphans") == 0).alias("passed"),
        F.col("orphans").cast("long").alias("violations"),
    )
    return checks.unionByName(fk).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# Privacy audit: k-anonymity / l-diversity ledger (round 12)
# ---------------------------------------------------------------------------

#: Quasi-identifier bucket width for the account balance, in cents
#: (thousand-dollar buckets), and the offset that keeps the integer
#: division operand non-negative (c_acctbal ≥ −1 000.00 on every TPC-H
#: scale) — Spark's DIV truncates toward zero while DuckDB's // floors,
#: so the bucketing arithmetic must never see a negative operand.
_KANON_BUCKET_CENTS = 100_000
_KANON_OFFSET_CENTS = 10_000_000
#: The k threshold below which an equivalence class is re-identifiable.
_KANON_K = 5


@query(
    "x_kanon_audit",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey,
             (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
              + {_KANON_OFFSET_CENTS}) // {_KANON_BUCKET_CENTS} AS bal_bucket,
             COUNT(*) AS class_size,
             COUNT(DISTINCT c_mktsegment) AS l_div
      FROM customer
      GROUP BY 1, 2
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
           COUNT(*) AS n_classes,
           CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_div) AS BIGINT) AS min_l_diversity,
           class_size < {_KANON_K} AS below_k
    FROM classes
    GROUP BY class_size
    ORDER BY class_size
    """,
)
def x_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk ledger for a release candidate: group the
    customer dimension by its quasi-identifiers — (nation,
    thousand-dollar balance bucket) — and emit the equivalence-class
    size histogram with, per size, the class count, covered rows, the
    MINIMUM l-diversity of the sensitive attribute (market segment)
    across classes of that size, and a ``below_k`` flag at k={k}. The
    table's k-anonymity number is the first histogram row; rows in
    ``below_k`` classes are the suppression/generalization work list.
    Complements ``x_forget_users`` (erasure) with the BEFORE-release
    audit: erasure handles who asked to be removed, k-anonymity bounds
    who could be singled out.

    Reference contrast: the app stores user rows and exposes them by
    exact id (utils/user.py:141, app.py:134-155) with no
    re-identification surface at all — this is the audit a training-
    data release at 100 TB runs before publishing any user-derived
    table.

    Scale: one groupBy over the dimension (map-side partials; the QI
    space is bounded) then a histogram over the CLASS frame — two
    uniform-key aggregations, no joins, constant-size output. The
    balance bucketing offsets cents positive before integer division:
    Spark DIV truncates toward zero, DuckDB // floors, and the two only
    agree on non-negative operands."""
    classes = (
        tables(spark, sf_dir)["customer"]
        .groupBy(
            "c_nationkey",
            F.expr(
                f"(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
                f" + {_KANON_OFFSET_CENTS}) DIV {_KANON_BUCKET_CENTS}"
            ).alias("bal_bucket"),
        )
        .agg(
            F.count("*").alias("class_size"),
            F.countDistinct("c_mktsegment").alias("l_div"),
        )
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count("*").alias("n_classes"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .select(
            F.col("class_size").cast("long").alias("class_size"),
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
            F.col("min_l_diversity").cast("long").alias("min_l_diversity"),
            (F.col("class_size") < _KANON_K).alias("below_k"),
        )
        .orderBy("class_size")
    )


x_kanon_audit.__doc__ = x_kanon_audit.__doc__.format(k=_KANON_K)


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder (round 13)
# ---------------------------------------------------------------------------

#: Quasi-identifier coarsening ladder, finest first: balance-bucket width
#: in exact cents at each rung, then nation-only, then region-only.
_KGEN_WIDTHS = (1_000, 10_000, 100_000)


@query(
    "x_kanon_generalize",
    oracle=f"""    WITH
    r0 AS (
      SELECT 0 AS rung, 'nation+bal$10' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(COALESCE(SUM(CASE WHEN cs < {_KANON_K} THEN cs END), 0) AS BIGINT)
               AS n_rows_below_k
      FROM (
        SELECT COUNT(*) AS cs FROM customer
        GROUP BY c_nationkey,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  + {_KANON_OFFSET_CENTS}) // 1000
      )
    ),
    r1 AS (
      SELECT 1 AS rung, 'nation+bal$100' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(COALESCE(SUM(CASE WHEN cs < {_KANON_K} THEN cs END), 0) AS BIGINT)
               AS n_rows_below_k
      FROM (
        SELECT COUNT(*) AS cs FROM customer
        GROUP BY c_nationkey,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  + {_KANON_OFFSET_CENTS}) // 10000
      )
    ),
    r2 AS (
      SELECT 2 AS rung, 'nation+bal$1000' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(COALESCE(SUM(CASE WHEN cs < {_KANON_K} THEN cs END), 0) AS BIGINT)
               AS n_rows_below_k
      FROM (
        SELECT COUNT(*) AS cs FROM customer
        GROUP BY c_nationkey,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  + {_KANON_OFFSET_CENTS}) // 100000
      )
    ),
    r3 AS (
      SELECT 3 AS rung, 'nation' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(COALESCE(SUM(CASE WHEN cs < {_KANON_K} THEN cs END), 0) AS BIGINT)
               AS n_rows_below_k
      FROM (SELECT COUNT(*) AS cs FROM customer GROUP BY c_nationkey)
    ),
    r4 AS (
      SELECT 4 AS rung, 'region' AS qi,
             CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(COALESCE(SUM(CASE WHEN cs < {_KANON_K} THEN cs END), 0) AS BIGINT)
               AS n_rows_below_k
      FROM (
        SELECT COUNT(*) AS cs FROM customer c
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_regionkey
      )
    ),
    u AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL
          SELECT * FROM r2 UNION ALL SELECT * FROM r3 UNION ALL
          SELECT * FROM r4),
    pick AS (SELECT MIN(rung) AS m FROM u WHERE n_rows_below_k = 0)
    SELECT u.rung, u.qi, u.n_classes, u.n_rows_below_k,
           u.n_rows_below_k = 0 AS k_ok,
           u.rung = pick.m AS chosen
    FROM u, pick ORDER BY u.rung
""",
)
def x_kanon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization LADDER for the k-anonymity release decision:
    re-audit the customer dimension under progressively coarser
    quasi-identifiers — (nation, $10 balance bucket) → ($100) → ($1000)
    → nation only → region only — and emit one row per rung with its
    class count, the rows still inside below-k classes, a ``k_ok``
    verdict at k={k}, and ``chosen`` marking the FIRST rung that
    satisfies k-anonymity: the minimum information loss at which the
    table is releasable. x_kanon_audit answers "is THIS table safe";
    this face answers the follow-up a release pipeline actually acts
    on — "how much must I coarsen it".

    Plan: ONE scan of the dimension builds the finest class frame; every
    coarser rung is a groupBy-SUM roll-up of the previous rung's
    (bounded) class frame — the nested-coarsening structure makes class
    counts mergeable partials, so the ladder costs one dim aggregation
    plus metadata-scale roll-ups at any scale, and the winning rung is
    one broadcast scalar. Balance cents are offset positive before integer division
    (Spark DIV truncates toward zero, DuckDB // floors; they only agree
    on non-negative operands — the x_kanon_audit rule).

    Reference contrast: no privacy surface in the reference
    (utils/user.py exposes rows by exact id); §2.13 privacy family,
    completing audit (r12) → minimal-generalization release (r13).
    """
    cust = tables(spark, sf_dir)["customer"]
    nation = tables(spark, sf_dir)["nation"].select(
        F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"
    )
    cents = (
        F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast("long")
        + F.lit(_KANON_OFFSET_CENTS)
    )
    # ROLLUP-TREE plan (mergeable partials): the rungs are NESTED
    # coarsenings (bucket widths ×10 each, then nation, then region), so
    # every coarser rung's class counts are a groupBy-SUM over the finest
    # class frame — the corpus-scale dimension is scanned ONCE (every
    # rung's branch shares the finest agg exchange; ReusedExchange
    # dedupes it within the one union plan, no checkpoint needed — eager
    # checkpoints here were measured at +1 s of pure job overhead at
    # sf0.1), and the four roll-ups aggregate the (bounded) class frame,
    # not the data. The naive per-rung re-scan (5 scans) was replaced
    # in-round; at 100 TB dims the scan is the only data-volume term.
    # Integer DIV throughout (ADVICE r13 #1): true division + cast('long')
    # is numerically identical only while operands stay far below 2^53;
    # DIV is the engine-portable integer-division convention the oracles
    # (and x_kanon_audit's offset rule) are written against.
    r0 = (
        cust.select("c_nationkey", cents.alias("cents"))
        .groupBy(
            "c_nationkey",
            F.expr(f"cents DIV {_KGEN_WIDTHS[0]}").alias("b"),
        )
        .agg(F.count("*").alias("cs"))
    )
    step10 = _KGEN_WIDTHS[1] // _KGEN_WIDTHS[0]
    r1 = r0.groupBy(
        "c_nationkey", F.expr(f"b DIV {step10}").alias("b")
    ).agg(F.sum("cs").alias("cs"))
    r2 = r1.groupBy(
        "c_nationkey",
        F.expr(f"b DIV {_KGEN_WIDTHS[2] // _KGEN_WIDTHS[1]}").alias("b"),
    ).agg(F.sum("cs").alias("cs"))
    r3 = r2.groupBy("c_nationkey").agg(F.sum("cs").alias("cs"))
    r4 = (
        r3.join(F.broadcast(nation), "c_nationkey")
        .groupBy("n_regionkey")
        .agg(F.sum("cs").alias("cs"))
    )
    specs: list[tuple[int, str, DataFrame]] = [
        (0, f"nation+bal${_KGEN_WIDTHS[0] // 100}", r0),
        (1, f"nation+bal${_KGEN_WIDTHS[1] // 100}", r1),
        (2, f"nation+bal${_KGEN_WIDTHS[2] // 100}", r2),
        (3, "nation", r3),
        (4, "region", r4),
    ]
    rows = None
    for rung, qi, classes in specs:
        summary = classes.agg(
            F.count("*").cast("long").alias("n_classes"),
            F.coalesce(
                F.sum(F.when(F.col("cs") < _KANON_K, F.col("cs"))), F.lit(0)
            )
            .cast("long")
            .alias("n_rows_below_k"),
        ).select(
            F.lit(rung).cast("int").alias("rung"),
            F.lit(qi).alias("qi"),
            "n_classes",
            "n_rows_below_k",
        )
        rows = summary if rows is None else rows.unionByName(summary)
    assert rows is not None
    pick = rows.where(F.col("n_rows_below_k") == 0).agg(
        F.min("rung").alias("m")
    )
    return (
        rows.crossJoin(F.broadcast(pick))
        .select(
            "rung",
            "qi",
            "n_classes",
            "n_rows_below_k",
            (F.col("n_rows_below_k") == 0).alias("k_ok"),
            (F.col("rung") == F.col("m")).alias("chosen"),
        )
        .orderBy("rung")
    )


x_kanon_generalize.__doc__ = x_kanon_generalize.__doc__.format(k=_KANON_K)


# ---------------------------------------------------------------------------
# Differential privacy: seeded discrete-Laplace histogram release
# ---------------------------------------------------------------------------

#: ε for the released histogram (sensitivity 1: one document moves one
#: (source, lang) cell by one — parallel composition across cells).
_DP_EPS = 1.0
#: Truncation bound of the discrete-Laplace noise: P(|Z| > 40) < 4e-18 at
#: ε=1 — the truncated mechanism is itself a valid (slightly tighter) DP
#: mechanism, and a FINITE table is what makes the draw replayable without
#: transcendental functions at query time (no-libm doctrine).
_DP_BOUND = 40
_DP_SCALE = 1 << 60


def _dp_cdf_table(
    eps: float = _DP_EPS, bound: int = _DP_BOUND, sensitivity: int = 1
) -> list[tuple[int, int]]:
    """(z, hi) rows of the truncated discrete-Laplace CDF at scale
    sensitivity/eps, scaled to integers in [0, 2^60]: a 60-bit uniform u
    maps to the first z with u < hi. math.exp runs ONCE here at import;
    both the Spark expression and the oracle SQL are generated from this
    same list, so the two engines compare u against bit-identical
    constants."""
    import math

    alpha = math.exp(-eps / sensitivity)
    zs = list(range(-bound, bound + 1))
    weights = [alpha ** abs(z) for z in zs]
    total = sum(weights)
    out: list[tuple[int, int]] = []
    cum = 0.0
    for z, w in zip(zs, weights):
        cum += w / total
        out.append((z, min(_DP_SCALE, round(cum * _DP_SCALE))))
    out[-1] = (zs[-1], _DP_SCALE)  # every u in [0, 2^60) matches exactly once
    return out


_DP_TABLE = _dp_cdf_table()

_DP_SQL_CASE = "CASE " + " ".join(
    f"WHEN u < {hi} THEN CAST({z} AS BIGINT)" for z, hi in _DP_TABLE
) + " END"


@query(
    "x_dp_noisy_counts",
    oracle=f"""
    WITH cells AS (
      SELECT source, COALESCE(lang, '∅') AS lang, COUNT(*) AS true_n
      FROM documents GROUP BY 1, 2
    ),
    seeded AS (
      SELECT source, lang, true_n,
             ('0x' || substr(md5('dp:' || source || ':' || lang), 1, 15))::BIGINT
               AS u
      FROM cells
    )
    SELECT source, lang,
           CAST(true_n AS BIGINT) AS true_n,
           {_DP_SQL_CASE} AS noise,
           GREATEST(CAST(true_n AS BIGINT) + {_DP_SQL_CASE}, 0) AS released_n
    FROM seeded
    """,
)
def x_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: documents per
    (source, lang) cell with truncated discrete-Laplace noise at ε=1
    (two-sided geometric, Ghosh–Roughgarden–Sundararajan's universally
    optimal mechanism for counts), plus non-negativity post-processing —
    the privacy-release face complementing x_kanon_audit's
    re-identification audit and x_forget_users' erasure path.

    The noise draw is SEEDED (60-bit md5 of the cell key → inverse-CDF
    lookup against a compile-time integer threshold table) so the
    mechanism's arithmetic is replayable and driver-certifiable; a
    production release swaps the seed for fresh randomness and drops the
    true_n column — here the exact count rides along so the realized
    noise IS the certified output, same doctrine as the sketch queries.
    The inverse CDF is an 81-branch integer CASE inside codegen: no
    transcendental functions at query time, no join, map-side only.

    Scale: one uniform-key aggregation (cells), then row-local noise —
    constant output in the number of cells regardless of corpus size.
    Sensitivity 1 per cell; parallel composition keeps the whole
    histogram at ε=1.

    Reference contrast: no privacy surface exists in the reference app
    (raw tables are displayed verbatim, ``app.py``); this extends SURVEY
    §2.13's quality/privacy family.
    """
    t = tables(spark, sf_dir)
    cells = (
        t["documents"]
        .groupBy("source", F.coalesce(F.col("lang"), F.lit("∅")).alias("lang"))
        .agg(F.count("*").alias("true_n"))
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dp:"), F.col("source"), F.lit(":"), F.col("lang"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    noise = F.lit(None).cast("long")
    # descending when-chain so evaluation order matches the ascending SQL
    # CASE: build from the last row backwards, each earlier row overrides.
    for z, hi in reversed(_DP_TABLE):
        noise = F.when(F.col("u") < F.lit(hi), F.lit(z).cast("long")).otherwise(noise)
    return (
        cells.withColumn("u", u)
        .withColumn("noise", noise)
        .select(
            "source",
            "lang",
            F.col("true_n").cast("long").alias("true_n"),
            "noise",
            F.greatest(
                F.col("true_n").cast("long") + F.col("noise"), F.lit(0).cast("long")
            ).alias("released_n"),
        )
    )


# ---------------------------------------------------------------------------
# User-level DP: contribution bounding before the noisy release (round 14)
# ---------------------------------------------------------------------------

_DPU_EPS = 1.0
#: L0 bound: each user contributes to at most this many event types.
_DPU_T = 2
#: L∞ bound: within a kept (user, type), at most this many events count.
_DPU_C = 2
#: L1 sensitivity of the whole released histogram to ONE USER.
_DPU_SENS = _DPU_T * _DPU_C
#: Truncation of the scale-4 discrete Laplace: P(|Z| > 120) < 2e-13.
_DPU_BOUND = 120

_DPU_TABLE = _dp_cdf_table(_DPU_EPS, _DPU_BOUND, _DPU_SENS)

_DPU_SQL_CASE = "CASE " + " ".join(
    f"WHEN u < {hi} THEN CAST({z} AS BIGINT)" for z, hi in _DPU_TABLE
) + " END"


@query(
    "x_dp_bounded_contribution",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY md5(CAST(user_id AS VARCHAR) || ':' || event_type),
                        event_type) AS rk
      FROM per
    ),
    bounded AS (
      SELECT event_type,
             CAST(SUM(LEAST(n, {_DPU_C})) AS BIGINT) AS true_n,
             CAST(COUNT(*) AS BIGINT) AS n_users_kept
      FROM ranked WHERE rk <= {_DPU_T} GROUP BY 1
    ),
    raw AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS raw_n,
             CAST(COUNT(*) AS BIGINT) AS n_user_types
      FROM per GROUP BY 1
    ),
    seeded AS (
      SELECT r.event_type, r.raw_n, r.n_user_types,
             COALESCE(b.true_n, 0) AS true_n,
             COALESCE(b.n_users_kept, 0) AS n_users_kept,
             ('0x' || substr(md5('dpu:' || r.event_type), 1, 15))::BIGINT AS u
      FROM raw r LEFT JOIN bounded b USING (event_type)
    )
    SELECT event_type, raw_n, n_user_types, true_n, n_users_kept,
           {_DPU_SQL_CASE} AS noise,
           GREATEST(true_n + {_DPU_SQL_CASE}, 0) AS released_n
    FROM seeded ORDER BY event_type
    """,
)
def x_dp_bounded_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-level differentially-private event-type histogram —
    the contribution-bounding face x_dp_noisy_counts (row-level, Δ=1)
    cannot express: one user may emit thousands of events, so releasing
    per-type counts with ±1-scale noise protects rows, not people. The
    pipeline-standard fix (Wilson et al., "Differentially Private SQL
    with Bounded User Contributions"): per user keep at most T={t} event
    types (deterministic md5 rank — replayable, unlike a sampled keep)
    and cap the kept (user, type) contribution at C={c} events, making
    the whole histogram's L1 sensitivity to ONE USER at most T·C={s};
    then add truncated discrete-Laplace noise at scale {s}/ε per cell.
    ``raw_n`` vs ``true_n`` is the bounding cost ledger (how much signal
    the privacy clamp discards — the knob a release tunes BEFORE
    spending ε), n_users_kept the surviving support.

    Seeding doctrine as x_dp_noisy_counts: the 60-bit md5 uniform and
    the {b2}-branch integer inverse-CDF CASE are generated from ONE
    compile-time table (``_dp_cdf_table(eps, bound, sensitivity)``,
    math.exp at import only), so the realized noise is bit-replayable by
    the oracle; production swaps the seed for fresh randomness and drops
    raw_n/true_n.

    Scale: one (user, type) hash agg (uniform keys), one window
    partitioned BY USER (bounded by the #types a user touches — never
    corpus-wide), one bounded-key type agg, then row-local noise over
    #event_type cells. Constant state per user regardless of event
    volume — the exact shape user-level DP needs at 100 TB.

    Reference contrast: no privacy surface in the reference (raw tables
    displayed verbatim, ``app.py``); completes the §2.13 privacy family
    (k-anon audit → generalization ladder → row-DP → user-DP)."""
    t = tables(spark, sf_dir)
    per = (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
    )
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("event_type"),
                )
            ),
            "event_type",
        )
    )
    bounded = (
        per.withColumn("rk", rk)
        .where(F.col("rk") <= _DPU_T)
        .groupBy("event_type")
        .agg(
            F.sum(F.least(F.col("n"), F.lit(_DPU_C))).cast("long").alias("true_n"),
            F.count("*").cast("long").alias("n_users_kept"),
        )
    )
    raw = per.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("raw_n"),
        F.count("*").cast("long").alias("n_user_types"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dpu:"), F.col("event_type"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    noise = F.lit(None).cast("long")
    # descending when-chain so evaluation order matches the ascending SQL
    # CASE: build from the last row backwards, each earlier row overrides.
    for z, hi in reversed(_DPU_TABLE):
        noise = F.when(F.col("u") < F.lit(hi), F.lit(z).cast("long")).otherwise(noise)
    return (
        raw.join(bounded, "event_type", "left")
        .select(
            "event_type",
            "raw_n",
            "n_user_types",
            F.coalesce(F.col("true_n"), F.lit(0).cast("long")).alias("true_n"),
            F.coalesce(F.col("n_users_kept"), F.lit(0).cast("long")).alias(
                "n_users_kept"
            ),
            u.alias("u"),
        )
        .withColumn("noise", noise)
        .select(
            "event_type",
            "raw_n",
            "n_user_types",
            "true_n",
            "n_users_kept",
            "noise",
            F.greatest(
                F.col("true_n") + F.col("noise"), F.lit(0).cast("long")
            ).alias("released_n"),
        )
        .orderBy("event_type")
    )


x_dp_bounded_contribution.__doc__ = (
    x_dp_bounded_contribution.__doc__.replace("{t}", str(_DPU_T))
    .replace("{c}", str(_DPU_C))
    .replace("{s}", str(_DPU_SENS))
    .replace("{b2}", str(2 * _DPU_BOUND + 1))
)
