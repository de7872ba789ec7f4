"""Batch ingest: schema-enforced delimited-file reader with IMDb-style
cleaning (SURVEY.md §2.1 S1 — utils/data_loader.py:115-158, rebuilt).

The reference reads gzipped TSV with explicit schemas and '\\N' nulls, then
eagerly count()s before every write (an extra full pass over non-splittable
gzip — §2.12). The engine version:
- reads lazily (no eager counts; row counts come from parquet footers later),
- cleans at the boundary ONCE: year-like digit-strings → nullable INT via
  regex-guarded cast (app.py:230-231's query-time guard moved to ingest),
  comma-packed list columns → real ArrayType (genres, app.py:355),
- lands as parquet, partitioned by a caller-chosen column — gzip TSV is a
  single-task scan per file; parquet restores parallelism for everything
  downstream. At 100 TB, ingest parallelism = number of input files, which
  is why the landing step exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: IMDb's null sentinel (utils/data_loader.py:127).
NULL_SENTINEL = "\\N"


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    sep: str = "\t",
    null_value: str = NULL_SENTINEL,
) -> DataFrame:
    """S1: schema-enforced TSV scan with header and null sentinel. No
    inference — schema drift fails loudly at read, not silently at query."""
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("nullValue", null_value)
        .schema(schema)
        .csv(path)
    )


def clean_year(col: Column) -> Column:
    """Digit-string year → nullable INT (the regex+cast guard of
    app.py:230-231, applied once at ingest instead of per query)."""
    return F.when(col.rlike(r"^[0-9]+$"), col.cast("int")).otherwise(F.lit(None))


def split_packed_list(col: Column, sep: str = ",") -> Column:
    """Comma-packed string → trimmed ArrayType(StringType), null-safe
    (genres/directors/knownForTitles, utils/data_loader.py:48,86-87,95-96)."""
    return F.when(
        col.isNotNull(), F.transform(F.split(col, sep), lambda s: F.trim(s))
    ).otherwise(F.lit(None))


def land_as_parquet(
    df: DataFrame, path: str, *, partition_by: str | None = None, mode: str = "overwrite"
) -> None:
    """Land cleaned data as parquet. partition_by chooses the pruning key
    (e.g. a date or language column) — the single highest-leverage layout
    decision for downstream scans at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def read_tsv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    sep: str = "\t",
    null_value: str = NULL_SENTINEL,
) -> tuple[DataFrame, DataFrame]:
    """S1 hardened: schema-enforced scan that SPLITS clean rows from
    malformed ones instead of silently nulling them (PERMISSIVE default)
    or killing the job (FAILFAST).

    Returns ``(clean, quarantine)``: ``clean`` has exactly ``schema``;
    ``quarantine`` carries the raw offending line for a dead-letter sink.
    At 100 TB a handful of corrupt lines per billion is CERTAIN — the
    pipeline must neither stop nor silently drop them; landing them beside
    the data (with lineage) is what makes the ingest auditable.

    Mechanics: the reader's PERMISSIVE mode populates a
    ``columnNameOfCorruptRecord`` column for rows that fail schema
    application (wrong arity / uncastable values); rows where it is null
    parsed fully. Both outputs come from ONE scan (Spark caches nothing
    here — the split is two lazy filters; at scale land both in one pass
    via ``df.persist()`` or a two-sink foreachBatch).
    """
    from pyspark.sql.types import StringType, StructField

    # StructType.add MUTATES in PySpark — build a copy, don't grow the caller's schema
    aug = StructType(schema.fields + [StructField("_corrupt_record", StringType())])
    raw = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(aug)
        .csv(path)
    )
    clean = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    # Quarantine keeps the partially-parsed columns alongside the raw line:
    # (a) the triage sink can see WHICH field failed, and (b) projecting data
    # columns is what makes the plan legal — Spark refuses a query whose only
    # referenced file column is the internal corrupt-record column.
    quarantine = (
        raw.where(F.col("_corrupt_record").isNotNull())
        .withColumnRenamed("_corrupt_record", "raw_line")
        .withColumn("source_file", F.input_file_name())
    )
    return clean, quarantine


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingest with the same clean/quarantine split as
    :func:`read_tsv_quarantine` — the wire format of most document dumps
    (Common Crawl derivatives, API exports) that feed the documents table.
    Schema is explicit for the same reason as S1: inference over 100 TB is
    a full extra pass AND locks in whatever the first sampled files had."""
    from pyspark.sql.types import StringType, StructField

    aug = StructType(schema.fields + [StructField("_corrupt_record", StringType())])
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(aug)
        .json(path)
    )
    clean = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    # Quarantine keeps the partially-parsed columns alongside the raw line:
    # (a) the triage sink can see WHICH field failed, and (b) projecting data
    # columns is what makes the plan legal — Spark refuses a query whose only
    # referenced file column is the internal corrupt-record column.
    quarantine = (
        raw.where(F.col("_corrupt_record").isNotNull())
        .withColumnRenamed("_corrupt_record", "raw_line")
        .withColumn("source_file", F.input_file_name())
    )
    return clean, quarantine
