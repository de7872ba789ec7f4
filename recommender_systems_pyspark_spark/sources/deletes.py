"""Merge-on-read deletion vectors (round 11): position + equality
deletes applied at scan time — the Iceberg-v2/Delta-DV read path.

A lakehouse delete does not rewrite data files; it writes small DELETE
FILES that readers merge at scan time:

- **position deletes** — (file, position-in-file) pairs marking
  individual rows of specific data files dead;
- **equality deletes** — predicates ("every row with source='web-7'")
  applied to all files written before the delete.

The read-side operator here is the part engines get wrong at scale: the
live set is ``data LEFT ANTI JOIN position_deletes ON (file, pos)``
followed by the equality-delete filter. The delete frame is orders of
magnitude smaller than the data (that is the point of MoR), so the
anti-join BROADCASTS the delete vector — zero data-side shuffle, scan
stays pushdown-friendly. A pathological delete vector (≈data size)
degrades to one co-keyed shuffle join, still linear; compaction
(x_compaction_apply) is the cure, not a bigger join.

Reference contrast: the app's only delete story is the full-table
JDBC overwrite (utils/data_loader.py:146) — every reload rewrites
everything; deletion vectors are the engine-grade mechanism that makes
point deletes O(|deletes|) instead of O(|table|).

The fixture has no real file manifest, so files are modeled
deterministically (``file_id = doc_id // 100``, ``pos = doc_id % 100``
— same device as x_compaction_plan) and the delete files by modular
rules the DuckDB oracle replays exactly. Precedence is defined:
position deletes apply first; equality deletes count only rows they
newly kill — every row lands in exactly one of (live, pos-deleted,
eq-deleted), so the per-file ledger sums to the file size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table

#: Rows-per-modeled-file (same granularity device as x_compaction_plan).
_FILE_ROWS = 100
#: Position-delete rule: every 13th doc starting at 3 is individually dead.
_POS_MOD, _POS_REM = 13, 3
#: Equality-delete predicate: these source partitions are recalled
#: wholesale (the "bad crawl batch" incident shape).
_EQ_SOURCES = ("src3", "src7")
_eq_tuple = "(" + ", ".join(f"'{s}'" for s in _EQ_SOURCES) + ")"


@query(
    "x_deletion_vectors",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             doc_id // {_FILE_ROWS} AS file_id,
             doc_id % {_FILE_ROWS} AS pos,
             (doc_id % {_POS_MOD} = {_POS_REM}) AS pos_dead,
             (source IN {_eq_tuple}) AS eq_dead
      FROM documents
    )
    SELECT file_id,
           COUNT(*) FILTER (WHERE NOT pos_dead AND NOT eq_dead)
             AS n_live,
           COUNT(*) FILTER (WHERE pos_dead) AS n_pos_deleted,
           COUNT(*) FILTER (WHERE NOT pos_dead AND eq_dead)
             AS n_eq_deleted,
           COALESCE(bit_xor(CASE WHEN NOT pos_dead AND NOT eq_dead
                                 THEN doc_id END), 0) AS live_checksum
    FROM base
    GROUP BY file_id
    ORDER BY file_id
    """,
)
def x_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply position + equality delete files to the documents "data
    files" at scan time and emit the per-file liveness ledger:
    (n_live, n_pos_deleted, n_eq_deleted, live_checksum). The position
    delete vector is a real second DataFrame anti-joined on
    (file_id, pos) — broadcast, because delete files are small by
    construction — not a fused filter; the oracle replays both delete
    rules arithmetically, so a precedence or join bug hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") / _FILE_ROWS).cast("long").alias("file_id"),
        (F.col("doc_id") % _FILE_ROWS).alias("pos"),
        "source",
    )
    # The position-delete FILE: built as its own frame (in production
    # this is a scan of *-deletes.parquet), then broadcast into the
    # anti-join marker. Derived from the same fixture so the oracle can
    # replay it, but the JOIN is real.
    pos_deletes = (
        docs.where(F.col("doc_id") % _POS_MOD == _POS_REM)
        .select("file_id", "pos")
    )
    marked = docs.join(
        F.broadcast(pos_deletes.withColumn("_dead", F.lit(True))),
        ["file_id", "pos"],
        "left",
    ).select(
        "file_id",
        "doc_id",
        F.coalesce(F.col("_dead"), F.lit(False)).alias("pos_dead"),
        F.col("source").isin(*_EQ_SOURCES).alias("eq_dead"),
    )
    live = ~F.col("pos_dead") & ~F.col("eq_dead")
    return (
        marked.groupBy("file_id")
        .agg(
            F.count_if(live).alias("n_live"),
            F.count_if(F.col("pos_dead")).alias("n_pos_deleted"),
            F.count_if(~F.col("pos_dead") & F.col("eq_dead")).alias(
                "n_eq_deleted"
            ),
            F.coalesce(
                F.bit_xor(F.when(live, F.col("doc_id"))), F.lit(0)
            ).alias("live_checksum"),
        )
        .orderBy("file_id")
    )
