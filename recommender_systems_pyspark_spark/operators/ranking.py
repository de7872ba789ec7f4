"""Distributed total-order ranking: global ``row_number`` / ``NTILE``
without the single-partition window trap.

``F.ntile(n).over(Window.orderBy(...))`` compiles to ``Exchange
SinglePartition`` + one sort of the ENTIRE input on one task — the classic
scale killer Spark itself warns about ("No Partition Defined for Window
operation"). The helpers here produce byte-identical results with a
DISTRIBUTED plan, the same two-phase scheme as
``ml.recommender.dict_from_column``:

1. ``repartitionByRange`` on the sort key — a sampled range shuffle, so the
   sort is parallel and each partition holds a contiguous key range;
2. per-partition ``row_number`` (window partitioned by partition id —
   local, no second shuffle);
3. add each partition's cumulative row offset via a broadcast join of one
   tiny (partition → offset) table. Driver state is O(#partitions), never
   O(rows).

``NTILE(n)`` is then pure arithmetic on the global row number: with N rows,
the first ``N mod n`` buckets get ``ceil(N/n)`` rows, the rest ``floor(N/n)``
— exactly the SQL-standard (Spark's and DuckDB's) tiling, so an oracle using
real ``NTILE`` keeps hash-matching.

The sort key MUST be a total order (include a unique-key tiebreaker):
range-partition boundaries may split equal leading keys across partitions,
which is only safe when the full key is unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order: list[Column],
    alias: str = "_rn",
    n_parts: int | None = None,
) -> tuple[DataFrame, int]:
    """Append a 1-based global ``row_number`` over ``order`` (must be a
    total order) with a distributed plan. Returns ``(df_with_rank, n_rows)``
    — the count is a free by-product of the offset computation.

    The ranged repartition is cached while the per-partition sizes are
    collected (RangePartitioner re-samples per job; an uncached recompute
    could draw different boundaries and corrupt ranks), then the result is
    ``localCheckpoint``-ed so the cache can be released immediately instead
    of leaking for the session lifetime.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    sizes = ranged.groupBy("_pid").agg(F.count("*").alias("sz")).collect()
    offsets: list[tuple[int, int]] = []
    acc = 0
    for r in sorted(sizes, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["sz"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], schema="_pid int, _off bigint")
    w = Window.partitionBy("_pid").orderBy(*order)
    out = (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(alias, (F.row_number().over(w) + F.col("_off")).cast("bigint"))
        .drop("_pid", "_off")
        .localCheckpoint(eager=True)
    )
    ranged.unpersist()
    return out, acc


def with_global_ntile(
    df: DataFrame,
    n: int,
    order: list[Column],
    alias: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Append SQL-standard ``NTILE(n) OVER (ORDER BY order)`` (as ``int``,
    matching ``F.ntile``'s type) with a distributed plan. ``order`` must be
    a total order."""
    rn = "_rn_" + alias
    ranked, n_rows = with_global_row_number(df, order, alias=rn, n_parts=n_parts)
    q, rem = divmod(n_rows, n)
    big = q + 1  # first `rem` buckets take one extra row
    r = F.col(rn)
    if q == 0:
        # fewer rows than buckets: row k lands alone in bucket k
        bucket = r
    else:
        bucket = F.when(
            r <= rem * big, F.floor((r - 1) / big) + 1
        ).otherwise(rem + F.floor((r - rem * big - 1) / q) + 1)
    return ranked.withColumn(alias, bucket.cast("int")).drop(rn)


# ---------------------------------------------------------------------------
# Registered query: certifies the distributed rank primitive itself against
# a real ROW_NUMBER() oracle (the helper backs every global rank/tile in the
# engine — x_rfm_segments, x_text_unigram_score, ml dictionary encoding).
# ---------------------------------------------------------------------------

def _register() -> None:
    from ..registry import query
    from ..sources import tables

    @query(
        "x_global_rank",
        oracle="""
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents
        ORDER BY rank
        """,
    )
    def x_global_rank(spark, sf_dir):  # noqa: ANN001, ANN202
        """Global total-order rank of every document by size (unique
        doc_id tiebreaker), via :func:`with_global_row_number` — the
        distributed two-phase plan. Byte-identical to the SQL
        ``ROW_NUMBER()`` the oracle runs, with no single-partition sort
        anywhere: the range shuffle is the only data movement, and driver
        state is one (partition → offset) list."""
        docs = tables(spark, sf_dir)["documents"].select("doc_id", "n_chars")
        ranked, _ = with_global_row_number(
            docs, [F.col("n_chars").desc(), F.col("doc_id")], alias="rank"
        )
        return ranked.select("doc_id", "n_chars", "rank").orderBy("rank")


_register()
