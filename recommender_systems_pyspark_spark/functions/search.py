"""Ranked retrieval over the documents corpus (round 4): full BM25
scoring for a multi-term query — the read side of the inverted index
(`x_inverted_index`) and the per-doc salience scorer
(`x_text_tfidf_top_terms`) composed into an actual search query.

Determinism: BM25 normally ends in log(idf); both engines' libm log can
differ in the last ulp, so the idf here is the RATIONAL BM25 core
(N − df + ½)/(df + ½) — the same monotone surrogate x_text_tfidf_top_terms
certifies — and every other factor is plain IEEE arithmetic written in
the identical operation order in both engines. Per-term scores are
quantized to DECIMAL(18,9) before the per-document sum, so summation
order cannot perturb the total (same discipline as registry.exact_sum).

Scale notes (100 TB corpus):
- The probe filters the exploded term stream to the query's terms BEFORE
  any aggregation — the tf relation is |docs containing a query term| ×
  |query terms|, not the corpus posting list.
- df/N/avgdl are corpus statistics a production deployment precomputes
  once per snapshot; here they are tiny aggregates (df of 3 terms → 3
  rows, broadcast).
- Final top-k is TakeOrderedAndProject over per-doc scores — no global
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: The bench query: three mid-frequency corpus terms.
_QUERY_TERMS = ("table", "hash", "merge")
_K1, _B = 1.2, 0.75
_TOP_K = 10


@query(
    "x_bm25_topk",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) t
      WHERE t.term IN {_QUERY_TERMS!r}
      GROUP BY doc_id, t.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST((n_docs - df + 0.5) / (df + 0.5)
                  * (CAST(tf AS DOUBLE) * {_K1 + 1})
                  / (CAST(tf AS DOUBLE)
                     + {_K1} * ({1 - _B} + {_B} * CAST(dl.dl AS DOUBLE) / avgdl))
                  AS DECIMAL(18,9)) AS term_score
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_terms_matched,
           CAST(SUM(term_score) AS DOUBLE) AS score
    FROM scored
    GROUP BY doc_id
    ORDER BY SUM(term_score) DESC, doc_id
    LIMIT {_TOP_K}
    """,
)
def x_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k} retrieval for the query ``{terms}`` (k1=1.2, b=0.75):
    rational idf × saturated, length-normalized tf, summed over matched
    query terms per document. Ties broken by doc_id; the per-term
    decimal quantization makes the double score hash-stable."""
    t = tables(spark, sf_dir)
    docs = t["documents"]
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.count("*").alias("df"))
    tf_d = F.col("tf").cast("double")
    term_score = (
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        * (tf_d * (_K1 + 1))
        / (tf_d + _K1 * ((1 - _B) + _B * F.col("dl").cast("double") / F.col("avgdl")))
    ).cast("decimal(18,9)")
    scored = (
        tf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms_matched"),
            F.sum("term_score").alias("total"),
        )
        .orderBy(F.col("total").desc(), "doc_id")
        .limit(_TOP_K)
        .select(
            "doc_id",
            "n_terms_matched",
            F.col("total").cast("double").alias("score"),
        )
    )


x_bm25_topk.__doc__ = x_bm25_topk.__doc__.format(k=_TOP_K, terms=_QUERY_TERMS)
