"""Semi-structured (JSON) columns and the spark.sql() surface.

The reference stores event-ish payloads as opaque strings and parses them
driver-side; the engine treats JSON as a first-class typed boundary:
``from_json`` against a declared schema at the edge (exactly like TSV
ingest's schema enforcement — S1), then plain relational ops on the typed
result. Parsing is JVM-side codegen, one pass, no Python.

Also exercises the engine's SQL API path (``spark.sql`` over registered
views — the reference's raw-SQL surface, app.py:218-236, collapses here):
GROUPING SETS, which the DataFrame API only gained late and SQL expresses
directly.

Scale notes: ``from_json`` with an explicit schema is a map-only stage the
optimizer can push projections through (only referenced JSON fields are
parsed with ``spark.sql.optimizer.enableJsonExpressionOptimization``). A
malformed payload yields NULL (PERMISSIVE), so the parsed-ok flag is a
normal column — dead-letter routing is a filter, not an exception path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_avg, query, sql_exact_avg
from ..sources import tables
from ..sources.loaders import register_views


@query(
    "x_json_extract_typed",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
             AS parsed_ok
    FROM events
    """,
)
def x_json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → typed columns at the boundary: parse ``props`` against a
    declared schema, surface the field and a parsed-ok flag. from_json is
    whole-stage-codegen; the schema declaration is what makes downstream
    predicate pushdown possible (a string-typed blob can't prune)."""
    t = tables(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k int")
    return t["events"].select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.getField("k").isNotNull().alias("parsed_ok"),
    )


@query(
    "x_json_agg_by_bucket",
    oracle=f"""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           {sql_exact_avg('value', 'avg_value')}
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)
def x_json_agg_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-derived grouping key feeding a relational aggregate — the
    typical telemetry rollup. The extract happens once in the scan stage;
    the aggregate is an ordinary partial/final hash agg on the derived
    key."""
    t = tables(spark, sf_dir)
    k = F.from_json(F.col("props"), "k int").getField("k")
    return (
        t["events"]
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            exact_avg(F.col("value"), "avg_value"),
        )
        .orderBy("k_bucket")
    )


@query(
    "x_date_spine_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS lo,
             date_trunc('month', max(o_orderdate)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
      FROM bounds
    ),
    rev AS (
      SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS n_orders
      FROM orders GROUP BY month
    )
    SELECT spine.month, COALESCE(rev.n_orders, 0) AS n_orders,
           rev.n_orders IS NULL AS is_gap
    FROM spine LEFT JOIN rev USING (month)
    ORDER BY spine.month
    """,
)
def x_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine with gap-fill: generate every month between the data
    bounds (sequence + explode — no calendar table needed), LEFT-join the
    actual monthly rollup, zero-fill misses. The pattern that makes
    time-series reports correct when a period has no rows — a plain
    GROUP BY silently drops empty months. The spine is generated from a
    1-row aggregate (broadcast), so the join cost is the rollup itself."""
    t = tables(spark, sf_dir)
    bounds = t["orders"].agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    rev = (
        t["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        spine.join(rev, "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("n_orders").isNull().alias("is_gap"),
        )
        .orderBy("month")
    )


@query(
    "x_array_functions",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
             AS vocab_csv,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           list_sort(list_distinct(string_split(text, ' ')))[1] AS first_term,
           list_reverse(list_sort(list_distinct(string_split(text, ' '))))[1]
             AS last_term,
           list_contains(string_split(text, ' '), 'spark') AS mentions_spark
    FROM documents
    """,
)
def x_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function family in one pass: distinct → sort → index/reverse
    access → membership, over the token arrays. All codegen; the sorted
    distinct vocabulary per document is also the shape a corpus
    vocabulary-build stage emits before its global aggregate."""
    t = tables(spark, sf_dir)
    vocab = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    return t["documents"].select(
        "doc_id",
        # serialized for the comparator (array columns are unhashable in
        # the pandas row-sort both gates use); full content still checked
        F.array_join(vocab, ",").alias("vocab_csv"),
        F.size(vocab).alias("n_distinct"),
        F.element_at(vocab, 1).alias("first_term"),
        F.element_at(F.reverse(vocab), 1).alias("last_term"),
        F.array_contains(F.split(F.col("text"), " "), "spark").alias("mentions_spark"),
    )


@query(
    "f13_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
           TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INTEGER) AS brand_num,
           TRY_CAST(p_name AS DOUBLE) IS NULL AS name_not_numeric
    FROM part
    """,
)
def f13_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant casts (P2's 'nulls on failure' semantics made
    explicit): try_cast yields NULL instead of failing the job — the only
    sane cast semantics for dirty data at scale, where one malformed row
    in a trillion must not kill a 6-hour job. Paired with the regex
    extraction that salvages the numeric payload."""
    t = tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.regexp_extract(F.col("p_brand"), "[0-9]+", 0).try_cast("int").alias(
            "brand_num"
        ),
        F.col("p_name").try_cast("double").isNull().alias("name_not_numeric"),
    )


@query(
    "g4_grouping_sets",
    oracle="""
    SELECT c_mktsegment, n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
    """,
)
def g4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's spark.sql() surface
    (views registered per call — the SQL twin of §2.6's rollup/cube).
    Spark compiles this to a single Expand + hash aggregate: one scan
    produces all three grouping combinations, not three jobs."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
        """
    )
