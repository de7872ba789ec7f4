"""Z-order (Morton-curve) clustering for multi-dimensional data skipping
(round 7).

The 100 TB problem this solves: parquet/Delta/Iceberg scans prune row
groups by min/max statistics, but sorting by ONE key destroys locality in
every other key — a selective 2-D predicate (``part BETWEEN … AND supp
BETWEEN …``) prunes nothing on a single-key layout. Interleaving the bits
of both keys into one Morton code and range-sorting by it gives every row
group a small axis-aligned bounding box in BOTH dimensions, so 2-D
predicates prune most of the file (what Delta ``OPTIMIZE ZORDER BY`` and
Iceberg's sort orders do; see the ``databricks/delta`` docs and Morton
1966). Everything here is native Spark expressions — exact integer bit
arithmetic inside whole-stage codegen, `repartitionByRange` +
`sortWithinPartitions` for the layout (range exchange, no global sort
bottleneck) — and the curve math is certified against a DuckDB oracle;
the actual row-group pruning win is asserted by
``tests/test_zorder_skipping.py`` on real parquet footers.

Design notes:
- Keys are quantized to ``_BITS``-bit grid coordinates with exact integer
  arithmetic (``x * 2^bits div (max+1)``) — rank-preserving, no floats.
- The interleave is a static sum of shift/mask terms (no loops at run
  time); 2×16 bits → a 32-bit Morton code in one codegen stage.
- ``repartitionByRange(z)`` assigns contiguous curve segments to files;
  ``sortWithinPartitions(z)`` orders row groups inside each file. At
  cluster scale this is exactly one range-exchange shuffle of the fact
  table — the same cost as any global sort-write, paid once at layout
  time and amortized over every selective scan after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: Bits per dimension in the Morton code (2 dims × 16 → 32-bit z-values).
_BITS = 16

#: Coarse curve cell for the certification query: top byte of the code.
_CELL_SHIFT = 24


def _spark_interleave(x: str, y: str) -> str:
    """Spark-SQL expression interleaving the low ``_BITS`` bits of integer
    expressions ``x`` (even positions) and ``y`` (odd positions)."""
    terms = []
    for i in range(_BITS):
        terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _duck_interleave(x: str, y: str) -> str:
    """The identical interleave in DuckDB's operator syntax."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem with its (l_partkey, l_suppkey) Morton code attached —
    the layout input for :func:`write_zordered` and the cell query."""
    li = tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    mx = li.agg(
        F.max("l_partkey").alias("maxp"), F.max("l_suppkey").alias("maxs")
    )
    scale = 1 << _BITS
    j = li.crossJoin(F.broadcast(mx))
    xq = f"(CAST(l_partkey AS BIGINT) * {scale} div (CAST(maxp AS BIGINT) + 1))"
    yq = f"(CAST(l_suppkey AS BIGINT) * {scale} div (CAST(maxs AS BIGINT) + 1))"
    return j.withColumn("z", F.expr(_spark_interleave(xq, yq)))


def write_zordered(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = 4, **writer_opts
) -> None:
    """Materialize lineitem in Z-order layout: contiguous curve ranges per
    file (`repartitionByRange`), row groups ordered inside each file
    (`sortWithinPartitions`). One range-exchange shuffle total."""
    (
        zorder_lineitem(spark, sf_dir)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .options(**writer_opts)
        .parquet(path)
    )


@query(
    "x_zorder_cells",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs FROM lineitem
    ),
    coded AS (
      SELECT ({_duck_interleave(
          f"(CAST(l_partkey AS BIGINT) * {1 << _BITS} // (CAST(maxp AS BIGINT) + 1))",
          f"(CAST(l_suppkey AS BIGINT) * {1 << _BITS} // (CAST(maxs AS BIGINT) + 1))",
      )}) AS z,
             l_partkey, l_suppkey
      FROM lineitem CROSS JOIN mx
    )
    SELECT CAST(z >> {_CELL_SHIFT} AS BIGINT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM coded
    GROUP BY cell
    ORDER BY cell
    """,
)
def x_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve cell statistics over lineitem's (l_partkey,
    l_suppkey): rows + per-dimension bounding box per coarse curve cell
    (z >> {shift}). The bounding boxes are the data-skipping surface —
    tight boxes in BOTH dimensions are exactly what makes Z-order layouts
    prunable; the oracle recomputes the full bit-interleave in SQL, so a
    green hash certifies the curve arithmetic end-to-end."""
    return (
        zorder_lineitem(spark, sf_dir)
        .groupBy(
            F.shiftright("z", _CELL_SHIFT).cast("bigint").alias("cell")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("l_partkey").cast("bigint").alias("min_part"),
            F.max("l_partkey").cast("bigint").alias("max_part"),
            F.min("l_suppkey").cast("bigint").alias("min_supp"),
            F.max("l_suppkey").cast("bigint").alias("max_supp"),
        )
        .orderBy("cell")
    )


x_zorder_cells.__doc__ = x_zorder_cells.__doc__.format(shift=_CELL_SHIFT)
