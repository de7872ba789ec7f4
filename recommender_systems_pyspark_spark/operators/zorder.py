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


# ---------------------------------------------------------------------------
# Pruning-gain certification: Z-order vs single-key layout (round 8)
# ---------------------------------------------------------------------------

#: Simulated file count for the layout comparison (equal-WIDTH key ranges
#: — map-side assignable, so no global window/sort enters the plan; the
#: physical equal-frequency layout is exercised by write_zordered and
#: tests/test_zorder_skipping.py on real parquet footers).
_N_FILES = 64


@query(
    "x_zorder_pruning_gain",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(l_partkey) AS maxp, MAX(l_suppkey) AS maxs FROM lineitem
    ),
    coded AS (
      SELECT l_partkey AS p, l_suppkey AS s, maxp, maxs,
             ({_duck_interleave(
                 f"(CAST(l_partkey AS BIGINT) * {1 << _BITS} // (CAST(maxp AS BIGINT) + 1))",
                 f"(CAST(l_suppkey AS BIGINT) * {1 << _BITS} // (CAST(maxs AS BIGINT) + 1))",
             )}) AS z
      FROM lineitem CROSS JOIN mx
    ),
    filed AS (
      SELECT p, s, maxp, maxs,
             (z * {_N_FILES} // ({(1 << (2 * _BITS))})) AS f_z,
             (CAST(p AS BIGINT) * {_N_FILES} // (CAST(maxp AS BIGINT) + 1)) AS f_p,
             (s * 16 <= maxs) AS hit_slice,
             (p * 8 <= maxp AND s * 8 <= maxs) AS hit_box
      FROM coded
    ),
    layouts AS (
      SELECT 'zorder' AS layout, f_z AS f, p, s, hit_slice, hit_box FROM filed
      UNION ALL
      SELECT 'partkey_sorted', f_p, p, s, hit_slice, hit_box FROM filed
    ),
    boxes AS (
      SELECT layout, f, MIN(p) mnp, MAX(p) mxp, MIN(s) mns, MAX(s) mxs,
             COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN hit_slice THEN 1 ELSE 0 END) AS BIGINT) AS m_slice,
             CAST(SUM(CASE WHEN hit_box THEN 1 ELSE 0 END) AS BIGINT) AS m_box
      FROM layouts GROUP BY layout, f
    ),
    lim AS (SELECT maxp, maxs FROM mx)
    SELECT layout, predicate,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(scanned) AS BIGINT) AS n_files_scanned,
           CAST(SUM(CASE WHEN scanned = 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_rows_scanned,
           CAST(SUM(m) AS BIGINT) AS n_rows_matched
    FROM (
      SELECT b.layout, 'supp_slice_1_16' AS predicate, b.n_rows, b.m_slice AS m,
             CASE WHEN b.mns * 16 <= l.maxs THEN 1 ELSE 0 END AS scanned
      FROM boxes b CROSS JOIN lim l
      UNION ALL
      SELECT b.layout, 'pd_box_1_8x1_8', b.n_rows, b.m_box,
             CASE WHEN b.mnp * 8 <= l.maxp AND b.mns * 8 <= l.maxs
                  THEN 1 ELSE 0 END
      FROM boxes b CROSS JOIN lim l
    )
    GROUP BY layout, predicate
    ORDER BY layout, predicate
    """,
)
def x_zorder_pruning_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-skipping LEDGER for the Z-order layout, certified cross-
    engine: partition lineitem into {n} equal-width curve-range "files"
    under (a) the Morton layout and (b) a plain partkey-sorted layout,
    compute each file's (part, supp) bounding box — the min/max stats a
    parquet footer records — and count which files two selective
    predicates must scan: a suppkey 1/16 slice (selective only in the
    NON-sort key) and a 1/8×1/8 2-D corner box. The Z layout bounds both
    dimensions per file, so it skips files the single-key layout must
    read; `n_rows_matched` is layout-invariant (same rows either way),
    which the oracle certifies alongside the scan counts. File
    assignment is a map-side integer expression (`z·N div zmax` — no
    global sort/window in the plan); the equal-frequency physical
    variant of the same claim is asserted on REAL parquet footers by
    tests/test_zorder_skipping.py.

    At 100 TB: this query IS the layout-selection tool — run it on a
    sample, read `n_rows_scanned(zorder) / n_rows_scanned(sorted)`, and
    decide whether the one-time range-exchange rewrite pays for itself
    before touching the full table."""
    li = tables(spark, sf_dir)["lineitem"].select("l_partkey", "l_suppkey")
    mx = li.agg(
        F.max("l_partkey").alias("maxp"), F.max("l_suppkey").alias("maxs")
    )
    scale = 1 << _BITS
    j = li.crossJoin(F.broadcast(mx))
    xq = f"(CAST(l_partkey AS BIGINT) * {scale} div (CAST(maxp AS BIGINT) + 1))"
    yq = f"(CAST(l_suppkey AS BIGINT) * {scale} div (CAST(maxs AS BIGINT) + 1))"
    filed = j.select(
        F.col("l_partkey").alias("p"),
        F.col("l_suppkey").alias("s"),
        "maxp",
        "maxs",
        F.expr(
            f"({_spark_interleave(xq, yq)}) * {_N_FILES} div {1 << (2 * _BITS)}"
        ).alias("f_z"),
        F.expr(
            f"CAST(l_partkey AS BIGINT) * {_N_FILES} div (CAST(maxp AS BIGINT) + 1)"
        ).alias("f_p"),
        (F.col("l_suppkey") * 16 <= F.col("maxs")).alias("hit_slice"),
        (
            (F.col("l_partkey") * 8 <= F.col("maxp"))
            & (F.col("l_suppkey") * 8 <= F.col("maxs"))
        ).alias("hit_box"),
    )
    layouts = filed.select(
        F.lit("zorder").alias("layout"), F.col("f_z").alias("f"),
        "p", "s", "hit_slice", "hit_box",
    ).unionByName(
        filed.select(
            F.lit("partkey_sorted").alias("layout"), F.col("f_p").alias("f"),
            "p", "s", "hit_slice", "hit_box",
        )
    )
    boxes = layouts.groupBy("layout", "f").agg(
        F.min("p").alias("mnp"),
        F.max("p").alias("mxp"),
        F.min("s").alias("mns"),
        F.max("s").alias("mxs"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("hit_slice"), 1).otherwise(0)).cast("bigint").alias("m_slice"),
        F.sum(F.when(F.col("hit_box"), 1).otherwise(0)).cast("bigint").alias("m_box"),
    ).crossJoin(F.broadcast(mx))

    def _pred(name, scanned, matched):
        return boxes.select(
            "layout",
            F.lit(name).alias("predicate"),
            "n_rows",
            matched.alias("m"),
            scanned.cast("int").alias("scanned"),
        )

    per_file = _pred(
        "supp_slice_1_16",
        F.col("mns") * 16 <= F.col("maxs"),
        F.col("m_slice"),
    ).unionByName(
        _pred(
            "pd_box_1_8x1_8",
            (F.col("mnp") * 8 <= F.col("maxp"))
            & (F.col("mns") * 8 <= F.col("maxs")),
            F.col("m_box"),
        )
    )
    return (
        per_file.groupBy("layout", "predicate")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("scanned").cast("bigint").alias("n_files_scanned"),
            F.sum(F.when(F.col("scanned") == 1, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_scanned"),
            F.sum("m").cast("bigint").alias("n_rows_matched"),
        )
        .orderBy("layout", "predicate")
    )


x_zorder_pruning_gain.__doc__ = x_zorder_pruning_gain.__doc__.format(n=_N_FILES)
