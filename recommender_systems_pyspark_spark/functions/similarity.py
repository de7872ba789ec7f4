"""Similarity search over the ``embeddings`` table (north-star extension):
brute-force cosine top-k as the exact baseline, an IVF-style coarse-quantized
variant as the scale path, and cosine pair joins for embedding near-dup.

Scale architecture (100 TB of vectors):
- Brute force is one broadcast of the query vector + a map-side cosine +
  TakeOrderedAndProject — exact, reads everything once. Right answer for
  one-off queries; wrong cost model for high QPS.
- The IVF variant clusters once (here: per-label centroids as the coarse
  quantizer), probes the nearest n_probe cells, and scans only those
  partitions. With the corpus written partitioned-by-cell, partition
  pruning makes the probe touch ~n_probe/n_cells of the data.
- All vector math is fold-based higher-order functions over array<float>
  cast to double — JVM-side, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double — left-fold, matching DuckDB's list_dot_product
    accumulation order on DOUBLE[] so results are bit-comparable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / norm(a) / norm(b)


#: DuckDB twin of cosine() — same operand order and association.
_SQL_COSINE = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " / sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    " / sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))"
)


@query(
    "x_knn_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           {_SQL_COSINE.format(a='embedding', b='qv')} AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def x_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbours of vec_id 0. The query vector
    is broadcast (1 row); cosine is map-side; ORDER BY+LIMIT compiles to
    TakeOrderedAndProject — per-partition top-k heaps, no global sort."""
    t = tables(spark, sf_dir)
    e = t["embeddings"]
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query(
    "x_embed_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           {_SQL_COSINE.format(a='a.embedding', b='b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_SQL_COSINE.format(a='a.embedding', b='b.embedding')} >= 0.4
    """,
)
def x_embed_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (the coarse
    cluster): pair join inside each block, cosine threshold. The blocking
    key is what keeps this sub-quadratic — at 100 TB the block is an IVF
    cell / LSH bucket, not a full cross join."""
    t = tables(spark, sf_dir)
    e = t["embeddings"]
    a = e.alias("a")
    b = e.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            sim.alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.4)
    )


@query("x_knn_ivf_topk")  # approximate by design → rows-only; pytest recall
def x_knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-10 for vec_id 0: coarse-quantize by
    centroid (labels play the cell assignment; production would k-means
    once and persist), probe the 3 nearest cells, brute-force only inside
    them. Centroids are a tiny aggregate (posexplode → per-dimension avg)
    that broadcasts; the probed scan is the only data touched — with the
    corpus partitioned by cell on disk, that is partition pruning, not a
    filter. Rows-only check; pytest measures recall vs the exact query."""
    t = tables(spark, sf_dir)
    e = t["embeddings"]

    # centroid per cell: mean vector via posexplode + groupBy(label, dim)
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select("label", F.transform("dc", lambda s: s.getField("c")).alias("centroid"))
    )

    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    probed = (
        cent.crossJoin(F.broadcast(q))
        .select("label", cosine(F.col("centroid"), F.col("qv")).alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), "label")
        .limit(3)
        .select("label")
    )

    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(probed), "label", "left_semi")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine(F.col("embedding"), F.col("qv")).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )
