"""Market-basket mining over lineitem orders (round 4): distributed
FPGrowth frequent itemsets — the association-rule upgrade of the
reference's co-occurrence intuition (its recommender learns latent
factors from explicit ratings, ``utils/recommender.py:73-80``; basket
mining learns co-purchase structure with no ratings at all).

Scale notes: ``pyspark.ml.fpm.FPGrowth`` is the parallel FP-Growth of
Li et al. (PFP) — transactions are grouped by conditional suffix,
per-group FP-trees are built independently, and the only driver state is
the frequent-item header table. Support counts are exact, hence
hash-gateable; the oracle replays the ≤2-itemset slice relationally
(singles: one GROUP BY; pairs: the id-ordered wedge join bounded by
order size, same bound as x_triangle_count)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: Fraction-of-transactions support gate; Spark turns this into
#: minCount = ceil(minSupport · n_transactions) — the oracle replicates
#: that exact rounding.
_MIN_SUPPORT = 0.0002


@query(
    "x_fpgrowth_itemsets",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_txn FROM li),
    minc AS (SELECT CAST(CEIL({_MIN_SUPPORT} * n_txn) AS BIGINT) AS m FROM n),
    singles AS (
      SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS k, COUNT(*) AS freq
      FROM li GROUP BY l_partkey
      HAVING COUNT(*) >= (SELECT m FROM minc)
    ),
    pairs AS (
      SELECT CAST(a.l_partkey AS VARCHAR) || ',' || CAST(b.l_partkey AS VARCHAR)
               AS itemset,
             2 AS k, COUNT(*) AS freq
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= (SELECT m FROM minc)
    )
    SELECT CAST(itemset AS VARCHAR) AS itemset, CAST(k AS INTEGER) AS k, freq
    FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs)
    ORDER BY k, itemset
    """,
)
def x_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent itemsets of size ≤ 2 from distributed FPGrowth
    (minSupport={sup}): each order's distinct parts form one transaction.
    Itemsets print as comma-joined ascending part keys (atomic column —
    the driver hash needs scalars); support counts are exact so the
    relational oracle reproduces them bit-for-bit. Larger itemsets exist
    in the model (nothing truncates the mining); the ≤2 slice is what a
    SQL oracle can replay without enumerating the lattice."""
    li = (
        tables(spark, sf_dir)["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    txns = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    from pyspark.ml.fpm import FPGrowth

    model = FPGrowth(
        itemsCol="items", minSupport=_MIN_SUPPORT, minConfidence=0.5
    ).fit(txns)
    fi = model.freqItemsets  # items: array<long>, freq: long
    return (
        fi.where(F.size("items") <= 2)
        .select(
            F.array_join(F.sort_array("items"), ",").alias("itemset"),
            F.size("items").alias("k"),
            "freq",
        )
        .orderBy("k", "itemset")
    )


x_fpgrowth_itemsets.__doc__ = x_fpgrowth_itemsets.__doc__.format(sup=_MIN_SUPPORT)
