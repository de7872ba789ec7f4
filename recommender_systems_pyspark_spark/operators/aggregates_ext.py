"""Aggregation extensions (SURVEY.md §2.4 lists these as absent from the
reference but in-scope for an engine): approximate distinct counts,
exact percentiles/median, and the array<struct> explode round-trip (F3,
the shape of the reference's ALS-recommendations flattening at
``utils/recommender.py:154-161``).

Scale notes:
- ``approx_count_distinct`` (HyperLogLog++) is THE distinct-count at
  100 TB: mergeable fixed-size sketches, one pass, no per-key state
  explosion. Exact ``countDistinct`` on a high-cardinality key forces a
  full shuffle of the distinct pairs; the approx sketch merges map-side.
- Exact percentiles collect per-group sorted state; at very large groups
  switch to ``percentile_approx`` (t-digest-ish, mergeable). Both are
  exposed here: the exact form is the oracle-checked one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


@query(
    "a2_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS approx_parts_ok,
           TRUE AS approx_supps_ok
    FROM lineitem
    """,
)
def a2_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 at scale: exact distinct counts next to HyperLogLog++ sketches,
    gated to within 3× rsd relative error (rsd=0.01 → 3%). The gate
    booleans are what the oracle checks — the sketch estimate itself is
    implementation-defined, the ERROR CONTRACT is not. The 3-sigma-style
    margin (ADVICE.md r1) keeps the gate from coupling the whole
    correctness run to one HLL++ implementation detail; the tighter 2%
    bound lives in tests/test_relational.py as a pytest property."""
    li = tables(spark, sf_dir)["lineitem"]
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("asup"),
    )
    within = lambda approx, exact: (  # noqa: E731
        F.abs(approx - F.col(exact)) / F.col(exact) <= 0.03
    )
    return agg.select(
        "exact_parts",
        "exact_supps",
        within(F.col("ap"), "exact_parts").alias("approx_parts_ok"),
        within(F.col("asup"), "exact_supps").alias("approx_supps_ok"),
    )


@query(
    "a8_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.9) AS q90,
           quantile_cont(l_extendedprice, 0.5) AS med_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a8_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles / median per group (linear-interpolation
    semantics — verified identical between Spark ``percentile`` and
    DuckDB ``quantile_cont``). For 100 TB groups swap in
    ``percentile_approx`` (mergeable sketch) and widen the oracle to a
    tolerance gate like a2's."""
    li = tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", 0.9).alias("q90"),
        F.percentile("l_extendedprice", 0.5).alias("med_price"),
    )


@query(
    "f3_explode_struct_array",
    oracle="""
    SELECT l_orderkey, l_linenumber, u.kind AS kind, u.amt AS amount
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest([
               struct_pack(kind := 'disc', amt := l_extendedprice * (1 - l_discount)),
               struct_pack(kind := 'tax',  amt := l_extendedprice * (1 + l_tax))
             ]) AS u
      FROM lineitem
    )
    """,
)
def f3_explode_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: build array<struct> then explode + nested-field access — the
    exact shape of flattening ALS recommendations
    (utils/recommender.py:154-161: explode("recommendations") →
    rec.tconstIndexed / rec.rating). Generate-side explode is map-only."""
    li = tables(spark, sf_dir)["lineitem"]
    charges = F.array(
        F.struct(
            F.lit("disc").alias("kind"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amt"),
        ),
        F.struct(
            F.lit("tax").alias("kind"),
            (F.col("l_extendedprice") * (1 + F.col("l_tax"))).alias("amt"),
        ),
    )
    return (
        li.select("l_orderkey", "l_linenumber", F.explode(charges).alias("u"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("u.kind").alias("kind"),
            F.col("u.amt").alias("amount"),
        )
    )


@query(
    "a9_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_med,
           quantile_cont(l_quantity, 0.99) AS exact_p99,
           TRUE AS approx_med_ok,
           TRUE AS approx_p99_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a9_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8's 100 TB form: ``percentile_approx`` (KLL-style mergeable
    sketch — map-side partials merge associatively, no global sort) next
    to the exact percentile, gated on RANK error: the approximate median
    must sit between the exact 40th and 60th percentiles, the approximate
    p99 between p97 and p100 — 10×/2× the sketch's nominal 1/accuracy
    rank error, so the gate checks the ERROR CONTRACT without coupling
    the correctness run to one sketch implementation (same ADVICE-r1
    pattern as a2's HLL gate; the tight bound is a pytest property).
    Exact percentile forces a per-group sort of all values — fine at
    fixture scale, a straggler at 100 TB; the sketch is the scale path."""
    li = tables(spark, sf_dir)["lineitem"]
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("exact_med"),
        F.percentile("l_quantity", 0.99).alias("exact_p99"),
        F.percentile("l_quantity", 0.4).alias("lo_med"),
        F.percentile("l_quantity", 0.6).alias("hi_med"),
        F.percentile("l_quantity", 0.97).alias("lo_p99"),
        F.max("l_quantity").alias("hi_p99"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("ap_med"),
        F.percentile_approx("l_quantity", 0.99, 1000).alias("ap_p99"),
    )
    return agg.select(
        "l_returnflag",
        "exact_med",
        "exact_p99",
        F.col("ap_med").between(F.col("lo_med"), F.col("hi_med")).alias("approx_med_ok"),
        F.col("ap_p99").between(F.col("lo_p99"), F.col("hi_p99")).alias("approx_p99_ok"),
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (Apache DataSketches HLL, built in
# since Spark 3.5: hll_sketch_agg / hll_union_agg / hll_sketch_estimate)
# ---------------------------------------------------------------------------

def distinct_sketch(df: DataFrame, col: str, group_col: str | None = None) -> DataFrame:
    """Per-group (or global) HLL sketch of ``col`` as a binary column —
    the MERGEABLE form of approx_count_distinct. At 100 TB this is what
    incremental pipelines store: per-shard/per-day sketches union in
    O(sketch) instead of rescanning history (a2's approx_count_distinct
    answers once; a sketch column answers forever)."""
    agg = F.expr(f"hll_sketch_agg({col})").alias("sketch")
    return df.groupBy(group_col).agg(agg) if group_col else df.agg(agg)


def merge_distinct_sketches(sketches: DataFrame, group_col: str | None = None) -> DataFrame:
    """Union previously-stored sketches (e.g. one per shard/day) and
    estimate: ``hll_union_agg`` then ``hll_sketch_estimate`` — the
    read-side of :func:`distinct_sketch`."""
    agg = F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("estimate")
    return sketches.groupBy(group_col).agg(agg) if group_col else sketches.agg(agg)
