"""Ratings derivation: the engine's analog of the reference's user_ratings
table (utils/user.py:52-57), synthesized deterministically from the
``events`` fixture (FIXTURES.md §B maps events → user_ratings).

The reference synthesizes ratings driver-side with ``random.choices``
(utils/imb_rating.py:99-129); here derivation is a pure column expression —
distributed, reproducible, and oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

#: SQL twin of the rating derivation (DuckDB), kept adjacent to the Spark
#: expression below so they cannot drift.
SQL_RATINGS = """
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS item_id,
           CAST(1.0 + (value % 4.0) AS FLOAT) AS rating,
           ts AS rated_at
    FROM events
    WHERE event_type IN ('view', 'click', 'purchase')
"""


def ratings_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, item_id, rating, rated_at) from events.

    - item_id comes from the JSON props (``$.k``) — the engine's stand-in
      for tconst; kept as STRING to exercise the StringIndexer path the
      reference relies on (utils/recommender.py:65-71).
    - rating = 1.0 + (value mod 4.0) ∈ [1, 5) — deterministic, same IEEE
      arithmetic in Spark and DuckDB.
    - error/signup events are not preference signals and are filtered out.
    - Duplicate (user, item) pairs are KEPT — append semantics, matching
      utils/user.py:162-168; see latest_ratings() for the dedup view.
    """
    return (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.get_json_object("props", "$.k").alias("item_id"),
            (F.lit(1.0) + (F.col("value") % 4.0)).cast("float").alias("rating"),
            F.col("ts").alias("rated_at"),
        )
    )


def latest_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-rating-per-(user, item) dedup view (SURVEY.md §2.12: the sane
    default the reference lacks — its stats count duplicate appends)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "item_id").orderBy(F.col("rated_at").desc())
    return (
        ratings_from_events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
