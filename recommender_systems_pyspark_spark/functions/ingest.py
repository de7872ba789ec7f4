"""Cross-modal ingest gate (round 8): the per-document admission verdict
a production curation pipeline computes at every ingest tick, composed
from the engine's incremental primitives over BOTH modalities of the same
batch:

- **text tier** (:func:`..functions.dedup.incremental_text_verdicts`):
  canonical-sha256 exact-dup probe + Jaccard-verified MinHash-LSH
  near-dup probe against the established corpus;
- **quality tier**: token-count floor (the cheap always-on filter that
  runs before anything expensive);
- **semantic tier** (:func:`..functions.similarity.semdedup_inc_verdicts`):
  embedding near-dup against the established corpus via the train-once
  √N-k-means quantizer — documents and embeddings share the id space
  (doc_id ≡ vec_id), and documents WITHOUT an embedding (at sf0.1 only
  2 of 5 docs are embedded) pass through the semantic tier unjudged,
  exactly as a real pipeline admits unembedded items on text evidence
  alone.

A document is admitted iff no tier objects. Every tier's verdict is kept
in the output row — the manifest a pipeline appends per tick, with the
reject reason(s) attached.

Scale shape: all three tiers are NEW-side-driven probes against
precomputable corpus-side state (digest set, band table, centroid model
+ cell-assigned corpus) — per-tick cost is O(|batch| × probe fan-out),
never |corpus|²; the three verdict frames join on the batch's own id
key (one shuffle of |batch| rows, or zero with the batch landed
id-bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables
from .dedup import incremental_text_verdicts, sql_incremental_text_parts
from .similarity import semdedup_inc_verdicts, sql_semdedup_inc_parts

#: Established corpus: doc_id % 10 < 8; arriving batch: % 10 >= 8 (the
#: same split x_dedup_incremental certifies, where fixture near-dups
#: actually straddle the boundary).
_CORPUS_PRED = "doc_id % 10 < 8"
_BATCH_PRED = "doc_id % 10 >= 8"

#: Minimum whitespace tokens for the quality tier.
_MIN_TOKENS = 30


def _sql_ingest_gate() -> str:
    return f"""
    WITH {sql_incremental_text_parts(_CORPUS_PRED, _BATCH_PRED)},
    {sql_semdedup_inc_parts("vec_id % 10 >= 8")},
    tok AS (
      SELECT doc_id, len(string_split(text, ' ')) >= {_MIN_TOKENS} AS quality_ok
      FROM batch
    ),
    sem AS (
      SELECT n.vec_id AS doc_id, TRUE AS has_embedding,
             (h.vec_id IS NOT NULL) AS sem_dup,
             COALESCE(h.n_close, 0) AS n_close
      FROM new_assign n LEFT JOIN hits h USING (vec_id)
    )
    SELECT b.doc_id,
           (ex.doc_id IS NOT NULL) AS exact_dup,
           (nr.doc_id IS NOT NULL) AS near_dup,
           t.quality_ok,
           COALESCE(s.has_embedding, FALSE) AS has_embedding,
           COALESCE(s.sem_dup, FALSE) AS sem_dup,
           COALESCE(s.n_close, 0) AS n_close,
           (ex.doc_id IS NULL AND nr.doc_id IS NULL AND t.quality_ok
            AND NOT COALESCE(s.sem_dup, FALSE)) AS admitted
    FROM batch b
    LEFT JOIN exact ex ON ex.doc_id = b.doc_id
    LEFT JOIN near nr ON nr.doc_id = b.doc_id
    JOIN tok t ON t.doc_id = b.doc_id
    LEFT JOIN sem s ON s.doc_id = b.doc_id
    ORDER BY b.doc_id
    """


@query("x_ingest_gate_e2e", oracle=_sql_ingest_gate())
def x_ingest_gate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal admission gate for the arriving batch (doc_id % 10 ≥ 8):
    text exact/near dedup vs the established corpus, token-count quality
    floor, and embedding semantic dedup (train-once quantizer) — one
    verdict row per batch document with every tier's finding and the
    final ``admitted`` bit. See the module docstring for the composition
    and the 100 TB cost model."""
    docs = tables(spark, sf_dir)["documents"]
    corpus_d = docs.where(F.expr(_CORPUS_PRED))
    batch_d = docs.where(F.expr(_BATCH_PRED))

    text_v = incremental_text_verdicts(corpus_d, batch_d)
    tok = batch_d.select(
        "doc_id",
        (F.size(F.split(F.col("text"), " ")) >= _MIN_TOKENS).alias("quality_ok"),
    )
    sem_v = semdedup_inc_verdicts(
        spark, sf_dir, "est_mod10ge8", F.col("vec_id") % 10 >= 8
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.lit(True).alias("has_embedding"),
        F.col("pruned").alias("sem_dup"),
        "n_close",
    )
    # Tier merge as UNION + one grouped max instead of two more joins
    # (guide §2.4: every tier frame is keyed on doc_id, so one exchange
    # merges them all). Each tier emits exactly 0 or 1 row per doc_id and
    # max() ignores NULLs, so the merged row is identical to the
    # join + coalesce form; text_v and tok both cover every batch doc, so
    # group membership is unchanged too. The previous 3-join assembly
    # planned 6 sort-merge joins / 20 exchanges end-to-end and ran with a
    # 6–17 s spread at sf0.1; this form carries one exchange past the
    # tier subtrees.
    nul_b = F.lit(None).cast("boolean")
    nul_l = F.lit(None).cast("long")
    u = (
        text_v.select(
            "doc_id",
            F.col("exact_dup").alias("e"),
            F.col("near_dup").alias("nd"),
            nul_b.alias("q"),
            nul_b.alias("he"),
            nul_b.alias("sd"),
            nul_l.alias("nc"),
        )
        .unionByName(
            tok.select(
                "doc_id",
                nul_b.alias("e"),
                nul_b.alias("nd"),
                F.col("quality_ok").alias("q"),
                nul_b.alias("he"),
                nul_b.alias("sd"),
                nul_l.alias("nc"),
            )
        )
        .unionByName(
            sem_v.select(
                "doc_id",
                nul_b.alias("e"),
                nul_b.alias("nd"),
                nul_b.alias("q"),
                F.col("has_embedding").alias("he"),
                F.col("sem_dup").alias("sd"),
                F.col("n_close").alias("nc"),
            )
        )
    )
    return (
        u.groupBy("doc_id")
        .agg(
            F.max("e").alias("exact_dup"),
            F.max("nd").alias("near_dup"),
            F.max("q").alias("quality_ok"),
            F.max("he").alias("he"),
            F.max("sd").alias("sd"),
            F.max("nc").alias("nc"),
        )
        .select(
            "doc_id",
            "exact_dup",
            "near_dup",
            "quality_ok",
            F.coalesce("he", F.lit(False)).alias("has_embedding"),
            F.coalesce("sd", F.lit(False)).alias("sem_dup"),
            F.coalesce("nc", F.lit(0).cast("long")).alias("n_close"),
            (
                ~F.col("exact_dup")
                & ~F.col("near_dup")
                & F.col("quality_ok")
                & ~F.coalesce("sd", F.lit(False))
            ).alias("admitted"),
        )
        .orderBy("doc_id")
    )
