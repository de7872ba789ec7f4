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
from .similarity import _SQL_COSINE

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


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical and semantic rankers
# ---------------------------------------------------------------------------
#
# The two rankers the engine already certifies — BM25 (x_bm25_topk) and
# brute-force cosine (x_knn_cosine_topk) — fused with RRF
# (Cormack/Clarke/Büttcher 2009): score(d) = Σ_rankers 1/(K + rank_r(d)),
# K = 60, over each ranker's top-_FUSE_K candidates. The query is document
# 0: its embedding drives the semantic leg; the fixed _QUERY_TERMS panel
# drives the lexical leg; doc 0 itself is excluded from both.
#
# Determinism: ranks are integers from a total order (score desc, doc_id),
# and each reciprocal contribution is the double 1/(60+rank) — one IEEE
# division of exact integers, bit-identical in any engine — quantized to
# DECIMAL(18,9) before the 2-term sum, so the fused score hash-compares
# exactly.
#
# Scale (100 TB corpus, high-QPS serving): each leg is already sub-linear —
# BM25 touches only the query terms' postings, ANN probes only nearby cells
# (x_knn_ivf_topk) — and fusion joins two K-row frames: cost is O(K), not
# O(corpus). The full-outer join of the two candidate lists is the entire
# shuffle surface, and both sides fit in one broadcast at any corpus size.

_FUSE_K = 20   # candidate depth per ranker
_RRF_C = 60    # RRF smoothing constant (single source of truth: the SQL
# template interpolates it below — ADVICE r9 flagged the hardcoded twin)
_SQL_RRF_CONTRIB = (
    f"CAST(CAST(1 AS DOUBLE) / ({_RRF_C} + {{r}}) AS DECIMAL(18,9))"
)


def _ranked_topk(df, score, ascending_id: str, k: int, alias: str):
    """Rank a candidate frame's top-``k`` by (score desc, id asc) WITHOUT a
    window or range shuffle: TakeOrderedAndProject selects the k rows,
    then ONE aggregation packs them as sort_array(collect_list(struct(-score,
    id))) — lexicographic struct order = (score desc, id asc) — and
    posexplode re-emits (rank, id). Constant k keeps the packed row tiny;
    this replaces two range-repartition + localCheckpoint stages the
    general distributed ranker would spend on a 20-row frame."""
    top = df.orderBy(score.desc(), ascending_id).limit(k)
    packed = top.agg(
        F.sort_array(
            F.collect_list(F.struct((-score).alias("ns"), F.col(ascending_id)))
        ).alias("arr")
    )
    return packed.select(
        F.posexplode("arr").alias("pos", "s")
    ).select(
        F.col(f"s.{ascending_id}").alias(ascending_id),
        (F.col("pos") + 1).cast("int").alias(alias),
    )


@query(
    "x_hybrid_rrf",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
      WHERE doc_id <> 0
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents WHERE doc_id <> 0) t
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
    ),
    bm25 AS (
      SELECT doc_id, SUM(term_score) AS s FROM scored GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS INTEGER) AS lex_rank
      FROM bm25 QUALIFY lex_rank <= {_FUSE_K}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cos AS (
      SELECT vec_id AS doc_id,
             {_SQL_COSINE.format(a='embedding', b='qv')} AS c
      FROM embeddings, q WHERE vec_id <> 0
    ),
    sem AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS INTEGER) AS sem_rank
      FROM cos QUALIFY sem_rank <= {_FUSE_K}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex_rank, sem_rank,
             COALESCE({_SQL_RRF_CONTRIB.format(r='lex_rank')},
                      CAST(0 AS DECIMAL(18,9)))
             + COALESCE({_SQL_RRF_CONTRIB.format(r='sem_rank')},
                        CAST(0 AS DECIMAL(18,9))) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, lex_rank, sem_rank, CAST(rrf AS DOUBLE) AS rrf_score
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT {_TOP_K}
    """,
)
def x_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid top-10 retrieval: reciprocal-rank fusion (K=60) of the BM25
    lexical ranker over ``_QUERY_TERMS`` and the cosine semantic ranker
    against document 0's embedding, each contributing its top-20. RRF
    contributions are decimal-quantized doubles so the fused score is
    hash-stable; candidates outside one leg fuse with a single term."""
    t = tables(spark, sf_dir)
    docs = t["documents"].where(F.col("doc_id") != 0)

    # --- lexical leg: BM25 totals (same math as x_bm25_topk) ------------
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
    bm25 = (
        tf.join(F.broadcast(df_rel), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("s"))
    )
    lex = _ranked_topk(bm25, F.col("s"), "doc_id", _FUSE_K, "lex_rank")

    # --- semantic leg: cosine vs doc 0's embedding ----------------------
    from .similarity import cosine

    e = t["embeddings"]
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("qv")).alias("c"),
        )
    )
    sem = _ranked_topk(cos, F.col("c"), "doc_id", _FUSE_K, "sem_rank")

    # --- fusion: two K-row frames, O(K) ---------------------------------
    zero = F.lit(0).cast("decimal(18,9)")

    def contrib(rank_col: str):
        return (F.lit(1.0) / (F.lit(_RRF_C) + F.col(rank_col).cast("double"))).cast(
            "decimal(18,9)"
        )

    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(contrib("lex_rank"), zero)
                + F.coalesce(contrib("sem_rank"), zero)
            ).alias("rrf"),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_TOP_K)
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.col("rrf").cast("double").alias("rrf_score"),
        )
    )
