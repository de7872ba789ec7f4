"""Deterministic per-label embedding centroids — shared leaf module (no
intra-package imports) so both the corpus queries (x_embed_centroids /
x_embed_assign) and the similarity queries (x_knn_ivf_topk) can reuse the
same engine-portable centroid definition without an import cycle.

Centroid averaging quantum: components are floor-quantized to 1e-9 before
the exact bigint sum. Unlike a DECIMAL cast (whose HALF_UP vs
round-half-even tie-breaking differs between engines on full-precision
floats), floor(v * 1e9) of the same double is bit-identical everywhere, the
bigint sum is exact and order-independent, and the single final division is
one deterministic double rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CENT_QUANTUM = 1_000_000_000.0

_SQL_CENTROIDS = f"""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           CAST(SUM(CAST(floor(v * {_CENT_QUANTUM}) AS BIGINT)) AS DOUBLE)
             / COUNT(v) / {_CENT_QUANTUM} AS centroid
    FROM (SELECT label,
                 unnest(generate_series(1, len(embedding))) AS i,
                 unnest(embedding::DOUBLE[]) AS v
          FROM embeddings)
    GROUP BY label, i
"""


def centroids_exploded(e: DataFrame) -> DataFrame:
    """(label, dim, centroid): per-label mean vector in exploded form via
    posexplode + exact quantized average (order-independent, so the hash
    aggregate's partial ordering cannot move the double result; the 1e-9
    input quantization is far below float32's precision at unit scale)."""
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.floor(F.col("v").cast("double") * _CENT_QUANTUM)).cast("double")
                / F.count("v")
                / _CENT_QUANTUM
            ).alias("centroid")
        )
    )


def centroids_assembled(e: DataFrame, label_alias: str = "label") -> DataFrame:
    """(label, centroid array<double>): the exploded centroids re-assembled
    into dim-ordered vectors — the broadcastable form every probe joins
    against."""
    return (
        centroids_exploded(e)
        .groupBy(F.col("label").alias(label_alias))
        .agg(F.array_sort(F.collect_list(F.struct("dim", "centroid"))).alias("dc"))
        .select(
            label_alias,
            F.transform("dc", lambda s: s.getField("centroid")).alias("centroid"),
        )
    )
