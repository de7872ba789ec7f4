"""DSIR-style data selection via importance resampling (round 7).

Implements the core of *Data Selection for Language Models via Importance
Resampling* (Xie et al., NeurIPS 2023, arXiv:2302.03169) Spark-first: fit
two bag-of-hashed-unigram language models — one on a small TARGET corpus
(the distribution you want more of) and one on the RAW pool — then score
every raw document with the log importance weight

    log w(d) = Σ_f  cnt_d[f] · ( log p_target[f] − log p_raw[f] )

over hashed feature buckets ``f``, and keep the top-k. The published
method samples with Gumbel noise; the deterministic top-k variant here is
the same estimator with temperature → 0 (a seeded Gumbel draw via the
md5-uniform idiom of ``f10_deterministic_sample`` would drop in as
``weight + (-ln(-ln(u)))`` if sampling diversity is wanted).

This is THE canonical 100 TB pretraining-data operator: the target fit is
tiny (quality corpus), the raw scoring is one explode → broadcast-join →
sum per doc — map-side work plus a single per-doc aggregation, no
quadratic anything, no driver state beyond the 2×B bucket table.

Determinism across engines (the oracle hash gate):
- Feature hashing uses the portable md5 idiom (``conv(substr(md5(t),1,8))``
  ≡ ``('0x'||substr(md5(t),1,8))::BIGINT``) — exact integers.
- The per-bucket log-ratio is computed as ``ln`` of ONE double division of
  two exact integer products, then quantized to DECIMAL(18,9) BEFORE the
  per-document sum (libm's last-ulp divergence disappears at 9 decimal
  places; the sum is exact decimal arithmetic, order-independent).
- Smoothing is add-one over the B buckets, all integer until the single
  division.

Scale notes:
- The λ table is B rows (B=256) — broadcast to the token stream; the only
  shuffle is the per-doc weight aggregation (partial aggs map-side).
- Raw-pool token explosion is the dominant cost and is embarrassingly
  parallel; at 100 TB you would precompute per-doc bucket-count sketches
  at ingest and skip the explode (same join/sum tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables

#: Number of hashed feature buckets (the paper uses 10k buckets of hashed
#: n-grams; 256 keeps the fixture's per-bucket counts well-populated).
_B = 256

#: Target slice: every 7th doc plays the "quality corpus" the selection
#: steers toward; the rest are the raw pool being scored.
_TARGET_MOD = 7

#: Selection size.
_TOP_K = 200


def _bucket(col):
    """Portable hashed-unigram bucket: first 8 md5 hex chars as an int,
    mod B — bit-identical in Spark and DuckDB (memory: md5 int-parsing
    is portable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % _B


def _sql_bucket(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {_B})"


@query(
    "x_dsir_select",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             doc_id % {_TARGET_MOD} = 0 AS is_target,
             {_sql_bucket('t.term')} AS f
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) t
    ),
    counts AS (
      SELECT f,
             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
      FROM tok GROUP BY f
    ),
    totals AS (
      SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr
      FROM counts
    ),
    lam AS (
      -- add-one smoothing; ONE double division of exact integer products,
      -- ln, then DECIMAL(18,9) quantization (cross-engine hash-stable)
      SELECT f,
             CAST(ln(CAST((ct + 1) * (nr + {_B}) AS DOUBLE)
                     / CAST((cr + 1) * (nt + {_B}) AS DOUBLE))
                  AS DECIMAL(18,9)) AS lam
      FROM counts CROSS JOIN totals
    ),
    doc_feat AS (
      SELECT doc_id, f, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok WHERE NOT is_target GROUP BY doc_id, f
    ),
    weighted AS (
      SELECT d.doc_id,
             CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
             SUM(d.cnt * l.lam) AS w
      FROM doc_feat d JOIN lam l USING (f)
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens, CAST(w AS DOUBLE) AS log_weight
    FROM weighted
    ORDER BY w DESC, doc_id
    LIMIT {_TOP_K}
    """,
)
def x_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: top-{k} raw documents by hashed-unigram importance
    weight toward the doc_id%{m}==0 target slice (B={b} buckets, add-one
    smoothing, per-bucket λ quantized to DECIMAL(18,9) before the exact
    per-doc decimal sum). Ties broken by doc_id."""
    docs = tables(spark, sf_dir)["documents"]
    # Generators cannot nest inside expressions (UNSUPPORTED_GENERATOR):
    # explode into `term` first, bucket in a second projection.
    tok = docs.select(
        "doc_id",
        (F.col("doc_id") % _TARGET_MOD == 0).alias("is_target"),
        F.explode(F.split("text", " ")).alias("term"),
    ).select("doc_id", "is_target", _bucket(F.col("term")).alias("f"))
    counts = tok.groupBy("f").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("bigint").alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).cast("bigint").alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("cr").cast("bigint").alias("nr"),
    )
    lam = counts.crossJoin(F.broadcast(totals)).select(
        "f",
        F.log(
            ((F.col("ct") + 1) * (F.col("nr") + _B)).cast("double")
            / ((F.col("cr") + 1) * (F.col("nt") + _B)).cast("double")
        )
        .cast("decimal(18,9)")
        .alias("lam"),
    )
    doc_feat = (
        tok.where(~F.col("is_target"))
        .groupBy("doc_id", "f")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # cnt must multiply λ as DECIMAL(10,0), not BIGINT: bigint×decimal(18,9)
    # needs precision 39 > 38, so Spark silently REDUCES SCALE to 8 digits
    # (Decimal adjustedScale rule) while DuckDB keeps all 9 — measured
    # ≤4e-8 drift per doc. decimal(10,0)×decimal(18,9) → (29,9), exact.
    weighted = (
        doc_feat.join(F.broadcast(lam), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt").cast("decimal(10,0)") * F.col("lam")).alias("w"),
        )
    )
    return (
        weighted.orderBy(F.col("w").desc(), "doc_id")
        .limit(_TOP_K)
        .select("doc_id", "n_tokens", F.col("w").cast("double").alias("log_weight"))
    )


x_dsir_select.__doc__ = x_dsir_select.__doc__.format(
    k=_TOP_K, m=_TARGET_MOD, b=_B
)
