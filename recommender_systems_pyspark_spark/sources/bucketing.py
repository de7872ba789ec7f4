"""Bucketed storage: shuffle-free co-located joins (SURVEY.md scale plan;
the reference has no storage-layout story at all — its joins re-shuffle
through Postgres every run).

``bucketBy(n, key)`` pre-shuffles a table ONCE at write time into n
hash buckets per key; two tables bucketed on the same key with the same
bucket count join with NO Exchange on either side — at 100 TB this turns
the recurring fact ⋈ fact join (orders ⋈ lineitem every query) from two
full shuffles per query into zero. Bucketed data also pre-sorts within
buckets (``sortBy``) so the sort-merge join skips its sort.

Spark constraint: bucketed layout lives in the catalog (saveAsTable), not
bare parquet paths — the bucket spec is table metadata. Bucket count is a
layout commitment: pick n so (table size / n) ≈ a healthy task input
(128–512 MB), and keep it identical across co-bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def purge_table(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND delete its (possibly orphaned) warehouse
    location. ``saveAsTable`` dies with LOCATION_ALREADY_EXISTS when the
    directory survives from a previous session whose (per-session Derby)
    metastore entry did not — dropping the catalog entry alone is not
    enough. Uses the Hadoop FileSystem API so it is correct on any
    warehouse FS, not just local disk."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` as a bucketed (and optionally bucket-sorted) catalog
    table. The write performs the one-time shuffle every later join on
    ``bucket_col`` then skips. Idempotent: any stale table/orphaned
    location is purged first (the LOCATION_ALREADY_EXISTS trap)."""
    purge_table(df.sparkSession, table)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
