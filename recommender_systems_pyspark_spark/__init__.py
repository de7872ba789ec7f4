"""spark-graft: a PySpark-native analytics + recommender engine.

Brand-new engine with the query and data-processing capabilities of the
reference (jgchoti/recommender-systems-pyspark, surveyed in SURVEY.md),
re-expressed Spark-first: one SparkSession surface, parquet storage,
DataFrame/SQL plans optimized by Catalyst, MLlib for the ALS recommender,
Structured Streaming for the streaming extension, and LLM-data-pipeline
operators (dedup, similarity search, text analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"
