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


#: Phrase search: how many top-frequency bigrams serve as query phrases.
_N_PHRASES = 3


@query(
    "x_phrase_search",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id, s.t1 AS t1, s.t2 AS t2
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> struct_pack(t1 := ws[i], t2 := ws[i + 1]))) AS s
        FROM w)
    ),
    top_q AS (
      SELECT t1, t2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2
      ORDER BY cnt DESC, t1 ASC, t2 ASC LIMIT {_N_PHRASES}
    ),
    m AS (
      SELECT b.t1, b.t2, b.doc_id, COUNT(*) AS occ
      FROM bg b JOIN top_q q USING (t1, t2)
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY t1, t2
                                ORDER BY occ DESC, doc_id ASC) AS rk
      FROM m
    )
    SELECT m.t1 || ' ' || m.t2 AS phrase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m.occ) AS BIGINT) AS n_occurrences,
           COALESCE(bit_xor(
             ('0x' || substr(md5(CAST(m.doc_id AS VARCHAR)), 1, 15))::BIGINT
           ), 0) AS docs_xor,
           CAST(MIN(CASE WHEN r.rk = 1 THEN m.doc_id END) AS BIGINT)
             AS top_doc_id,
           CAST(MIN(CASE WHEN r.rk = 1 THEN m.occ END) AS BIGINT)
             AS top_doc_occ
    FROM m JOIN ranked r ON m.t1 = r.t1 AND m.t2 = r.t2
                         AND m.doc_id = r.doc_id
    GROUP BY 1
    """,
)
def x_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: exact adjacent-bigram matching over a
    positional inverted index — the retrieval face BM25's bag-of-words
    scoring cannot express ("merge join" must not match "join ... merge").

    Query workload: the corpus's {n} most frequent bigrams (ties broken
    lexicographically), derived in-query so the certification is
    self-contained and deterministic. INDEX path: per-doc bigram arrays
    inside codegen (guarded transform — a <2-token doc yields an empty
    array, never a descending sequence) → global count → top-{n} under a
    total order. MATCH path: the positional posting list (posexplode)
    filtered to the query phrases' terms BEFORE the self-join — the
    adjacency join (doc_id, pos+1 = pos) runs on query-relevant postings
    only, the standard positional-index read. Output per phrase:
    matching-doc count, total occurrences, an order-independent xor of
    matching doc ids, and the top document (occurrences desc, doc_id
    asc).

    Scale: postings are uniform term-keyed; the phrase filter is a
    broadcast semi-join of query terms; adjacency is an equi-join on
    (doc_id, pos) — no all-pairs anywhere. At 100 TB the top-bigram
    workload derivation would be replaced by the user's query log; the
    match path is unchanged.

    Reference contrast: no text-retrieval surface in the reference;
    extends §2.13 retrieval (inverted index, BM25, RRF) with positional
    semantics.
    """
    docs = tables(spark, sf_dir)["documents"]
    # Token array materialized before an exchange (the dedup.shingled
    # fix): the inline split(text) inside the transform re-split the
    # document per bigram position; both the bigram fan-out and the
    # positional postings below read the materialized ``toks`` column.
    toked = docs.select("doc_id", F.split("text", " ").alias("toks")).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    bigrams = toked.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS t1,"
                    "             toks[i+1] AS t2))"
                ),
            ).otherwise(F.expr("array()"))
        ).alias("bg"),
    ).select("doc_id", F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))

    top_q = (
        bigrams.groupBy("t1", "t2")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(_N_PHRASES)
        .select("t1", "t2")
    )

    # Positional-index read path: posting list filtered to query terms,
    # then the adjacency equi-join (doc, pos+1).
    postings = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    )
    q_t1 = top_q.select(F.col("t1").alias("term")).distinct()
    q_t2 = top_q.select(F.col("t2").alias("term")).distinct()
    p1 = postings.join(F.broadcast(q_t1), "term", "left_semi").select(
        "doc_id", F.col("term").alias("t1"), F.col("pos").alias("pos1")
    )
    p2 = postings.join(F.broadcast(q_t2), "term", "left_semi").select(
        F.col("doc_id").alias("doc_id2"),
        F.col("term").alias("t2"),
        F.col("pos").alias("pos2"),
    )
    matches = (
        p1.join(
            p2,
            (F.col("doc_id") == F.col("doc_id2"))
            & (F.col("pos2") == F.col("pos1") + 1),
        )
        .join(F.broadcast(top_q), ["t1", "t2"], "left_semi")
        .groupBy("t1", "t2", "doc_id")
        .agg(F.count("*").alias("occ"))
    )

    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("t1", "t2").orderBy(
            F.col("occ").desc(), F.col("doc_id").asc()
        )
    )
    doc_hash = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        matches.withColumn("rk", rk)
        .groupBy(F.concat_ws(" ", F.col("t1"), F.col("t2")).alias("phrase"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("occ").cast("long").alias("n_occurrences"),
            F.coalesce(
                F.expr(
                    "bit_xor(cast(conv(substring(md5(cast(doc_id as string)),"
                    " 1, 15), 16, 10) as bigint))"
                ),
                F.lit(0).cast("long"),
            ).alias("docs_xor"),
            F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).cast("long").alias("top_doc_id"),
            F.min(F.when(F.col("rk") == 1, F.col("occ"))).cast("long").alias("top_doc_occ"),
        )
    )


x_phrase_search.__doc__ = x_phrase_search.__doc__.format(n=_N_PHRASES)
