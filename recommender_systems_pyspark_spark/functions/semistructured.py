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
