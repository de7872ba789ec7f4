"""Corpus stratification utilities (round 5): deterministic hash-based
train/val/test splitting, per-language token-entropy profiling, and the
composed dataset-publish pipeline (quality → dedup → split → shard
manifest with XOR fingerprints).

A 100 TB training-data pipeline needs splits that are (a) stable across
re-runs and engines — membership must be a PURE function of the row key,
never of row order, partitioning, or a sampled RNG stream — and (b)
stratified, so per-language proportions hold within every split. Both
engines compute the identical md5-derived bucket, so the oracle certifies
the actual assignment, not just the counts.

Entropy is the one place this engine's no-libm doctrine meets a
genuinely log-shaped statistic. Spark's ``Math.log`` and DuckDB's
``std::log`` differ in the last ulp on ~24% of integer arguments
(measured over 1..1e6 this round), so per-term contributions are
quantized to DECIMAL(18,9) BEFORE the exact decimal sum (the
``functions/search.py`` BM25 scheme): a last-ulp input difference flips
the quantized value only when the true value sits within one ulp of a
0.5e-9 grid midpoint — vanishingly rare, and the per-term risk is
independent, not compounded by summation order (the sum itself is exact
decimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tables


def split_bucket(key: F.Column) -> F.Column:
    """Deterministic 0..99 bucket from the md5 of the row key: first 8 hex
    digits parsed as an integer, mod 100. Engine-portable (DuckDB:
    ``('0x' || substr(md5(k), 1, 8))::BIGINT % 100``) and a pure map-side
    projection — no shuffle, no RNG state, stable under repartitioning.
    Reusable primitive for any keyed holdout (the x_contamination /
    x_shard_assign family uses the same idea with different moduli)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )


@query(
    "x_stratified_split",
    oracle="""
    WITH b AS (
      SELECT lang, n_chars, doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM b
    GROUP BY 1, 2
    ORDER BY lang, split
    """,
)
def x_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment of documents, stratified per
    language, keyed on ``md5(doc_id)`` — the split every run, every
    engine, and every partitioning reproduces bit-identically (unlike
    ``randomSplit``, whose membership depends on partition layout). One
    map-side bucket projection + one hash aggregate; the min/max doc_id
    per cell gives the oracle a membership-sensitive fingerprint beyond
    bare counts."""
    docs = tables(spark, sf_dir)["documents"]
    bucket = split_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.groupBy("lang", split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang", "split")
    )


@query(
    "x_token_entropy",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (
      SELECT lang, tok, COUNT(*) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    s AS (
      SELECT lang,
             CAST(SUM(CAST(c AS DECIMAL(18,0))) AS BIGINT) AS n_tokens,
             COUNT(*) AS vocab,
             CAST(SUM(CAST(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
                           AS DECIMAL(18,9))) AS DOUBLE) AS clogc
      FROM counts
      GROUP BY 1
    )
    SELECT lang, n_tokens, vocab,
           CAST(CAST(log2(CAST(n_tokens AS DOUBLE))
                     - clogc / CAST(n_tokens AS DOUBLE)
                AS DECIMAL(18,9)) AS DOUBLE) AS entropy_bits,
           CAST(CAST(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                AS DECIMAL(18,9)) AS DOUBLE) AS type_token_ratio
    FROM s
    ORDER BY lang
    """,
)
def x_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits/token) and type-token ratio of the unigram
    distribution per language — the standard corpus-diversity /
    degenerate-text signal. Uses ``H = log2(n) − (Σ c·log2 c)/n`` so
    every log argument is an INTEGER count; each ``c·log2 c`` term is
    DECIMAL(18,9)-quantized before the exact decimal sum and the final
    double goes through the same quantization (see module docstring for
    the cross-engine ulp analysis). Plan: explode → (lang, tok) hash
    aggregate with map-side combine → per-lang reduce; at corpus scale
    the token shuffle is the cost, and it is one pass."""
    docs = tables(spark, sf_dir)["documents"]
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    c_d = F.col("c").cast("double")
    s = counts.groupBy("lang").agg(
        F.sum(F.col("c").cast("decimal(18,0)")).cast("bigint").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum((c_d * F.log2(c_d)).cast("decimal(18,9)"))
        .cast("double")
        .alias("clogc"),
    )
    n_d = F.col("n_tokens").cast("double")
    return s.select(
        "lang",
        "n_tokens",
        "vocab",
        (F.log2(n_d) - F.col("clogc") / n_d)
        .cast("decimal(18,9)")
        .cast("double")
        .alias("entropy_bits"),
        (F.col("vocab").cast("double") / n_d)
        .cast("decimal(18,9)")
        .cast("double")
        .alias("type_token_ratio"),
    ).orderBy("lang")


def _sql_publish() -> str:
    from .corpus import SQL_GOPHER_KEEP

    return f"""
    WITH w AS (
      SELECT doc_id, n_chars, text, string_split(text, ' ') AS ws
      FROM documents
    ),
    q AS (SELECT doc_id, n_chars, text FROM w WHERE {SQL_GOPHER_KEEP}),
    hashed AS (
      SELECT doc_id, n_chars, sha256(lower(trim(text))) AS h FROM q
    ),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM hashed GROUP BY h),
    kept AS (
      SELECT hashed.doc_id, hashed.n_chars
      FROM hashed JOIN keepers USING (doc_id)
    ),
    placed AS (
      SELECT doc_id, n_chars,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 100 < 80 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split,
             ('0x' || substr(md5('s-' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % 4 AS shard
      FROM kept
    )
    SELECT split, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   ::BIGINT) AS manifest_xor
    FROM placed
    GROUP BY 1, 2
    ORDER BY split, shard
    """


@query("x_dataset_publish_e2e", oracle=_sql_publish())
def x_dataset_publish_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-DELIVERY tail of corpus curation, composed end-to-end
    from certified primitives: Gopher quality gate (shared
    ``gopher_metrics`` expression — the gate and this pipeline cannot
    drift) → exact sha256 dedup with keep-lowest-id election → md5
    stratified 80/10/10 split → md5 shard assignment (4 shards) →
    per-(split, shard) manifest with doc count, char total, and an
    order-independent XOR content fingerprint (the x_table_checksum
    idiom). The manifest is what a training job consumes; the XOR
    fingerprint is what lets the consumer VERIFY a shard without
    re-reading the corpus. Plan: one map-only gate, one hash-keyed
    dedup shuffle, one keeper semi-join, then a single bounded-key
    aggregate — the whole funnel replays in the SQL oracle."""
    docs = tables(spark, sf_dir)["documents"]
    q = docs.where(gopher_metrics_keep()).select("doc_id", "n_chars", "text")
    hashed = q.select(
        "doc_id",
        "n_chars",
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("h"),
    )
    keepers = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keepers.select("doc_id"), "doc_id").select(
        "doc_id", "n_chars"
    )
    bucket = split_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("s-"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 4
    )
    manifest_hash = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return (
        kept.select(
            split.alias("split"),
            shard.alias("shard"),
            "n_chars",
            manifest_hash.alias("mh"),
        )
        .groupBy("split", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            .cast("bigint")
            .alias("total_chars"),
            F.expr("bit_xor(mh)").alias("manifest_xor"),
        )
        .orderBy("split", "shard")
    )


def gopher_metrics_keep():
    """The shared Gopher keep expression (import indirection keeps the
    module import graph acyclic at definition time)."""
    from .corpus import gopher_metrics

    return gopher_metrics()["keep"]


@query(
    "x_mixture_resample",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             -- NULLIF guard: a digitless source extracts '' which CAST
             -- would raise on in DuckDB while Spark yields NULL — both
             -- engines must agree on NULL srcnum (ADVICE r5).
             CAST(NULLIF(regexp_extract(source, '([0-9]+)', 1), '')
                  AS INTEGER) AS srcnum,
             ('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT % 10000 AS u
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, source, srcnum,
             (u < (srcnum + 1) * 250) AS kept
      FROM d
    )
    SELECT source,
           COUNT(*) AS n_docs,
           (srcnum + 1) * 250 AS target_permille10k,
           CAST(COUNT(CASE WHEN kept THEN 1 END) AS BIGINT) AS sampled,
           CAST(COUNT(CASE WHEN kept THEN 1 END) AS DOUBLE) / COUNT(*)
             AS achieved_rate,
           COALESCE(bit_xor(CASE WHEN kept THEN
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             END), 0) AS sample_xor
    FROM flagged
    GROUP BY source, srcnum
    ORDER BY source
    """,
)
def x_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture re-weighting by doc-level acceptance
    sampling: each source gets a target acceptance rate ((srcnum+1)/40
    here — in production, the ratio of desired to natural mixture
    weight), and a document survives iff its seeded md5 bucket clears
    the source's INTEGER threshold — membership is a pure function of
    (seed, doc_id), so the sample is identical on every engine, run,
    and partitioning, and composable with the split/shard stages
    (different seeds ⇒ independent decisions). The oracle certifies the
    achieved rates AND the exact membership (XOR fingerprint of kept
    ids). Map-only decision + one bounded-key aggregate; complements
    x_mixture_interleave (ordering keys) with doc-level down-sampling."""
    docs = tables(spark, sf_dir)["documents"]
    # nullif guard mirrors the oracle: digitless source → NULL srcnum on
    # both engines (a bare cast of '' raises under ANSI mode); NULL srcnum
    # ⇒ NULL threshold ⇒ kept is NULL ⇒ document never sampled, and
    # target_permille10k is NULL — identical semantics in DuckDB.
    srcnum = F.nullif(
        F.regexp_extract(F.col("source"), r"(\d+)", 1), F.lit("")
    ).cast("int")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    kept = u < (srcnum + 1) * 250
    doc_hash = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    flagged = docs.select(
        "source",
        srcnum.alias("srcnum"),
        kept.alias("kept"),
        F.when(kept, doc_hash).alias("kept_hash"),
    )
    return (
        flagged.groupBy("source", "srcnum")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).cast("bigint").alias("sampled"),
            (
                F.count(F.when(F.col("kept"), 1)).cast("double") / F.count("*")
            ).alias("achieved_rate"),
            F.coalesce(F.expr("bit_xor(kept_hash)"), F.lit(0)).alias("sample_xor"),
        )
        .select(
            "source",
            "n_docs",
            ((F.col("srcnum") + 1) * 250).alias("target_permille10k"),
            "sampled",
            "achieved_rate",
            "sample_xor",
        )
        .orderBy("source")
    )


def _sql_gate_eval() -> str:
    from .corpus import SQL_GOPHER_KEEP

    return f"""
    WITH w AS (
      SELECT doc_id, text, string_split(text, ' ') AS ws
      FROM documents WHERE length(text) > 0
    ),
    gates AS (
      SELECT doc_id,
             ({SQL_GOPHER_KEEP}) AS ref_keep,
             ((-1.5
               + 2.0 * (CAST(len(list_filter(ws, t -> t IN ('the', 'a')))
                             AS DOUBLE) / len(ws))
               + 3.0 * (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
               + 0.25 * (CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(ws))) > 1.8) AS pred_keep
      FROM w
    ),
    c AS (
      SELECT
        COUNT(CASE WHEN pred_keep AND ref_keep THEN 1 END) AS tp,
        COUNT(CASE WHEN pred_keep AND NOT ref_keep THEN 1 END) AS fp,
        COUNT(CASE WHEN NOT pred_keep AND ref_keep THEN 1 END) AS fn,
        COUNT(CASE WHEN NOT pred_keep AND NOT ref_keep THEN 1 END) AS tn
      FROM gates
    )
    SELECT tp, fp, fn, tn,
           CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
             AS accuracy,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_keep,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_keep,
           CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1_keep,
           (CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
            - CAST((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS DOUBLE)
              / (CAST(tp + fp + fn + tn AS DOUBLE)
                 * CAST(tp + fp + fn + tn AS DOUBLE)))
           / (1.0
              - CAST((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS DOUBLE)
                / (CAST(tp + fp + fn + tn AS DOUBLE)
                   * CAST(tp + fp + fn + tn AS DOUBLE))) AS cohens_kappa
    FROM c
    """


@query("x_classifier_eval", oracle=_sql_gate_eval())
def x_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation metrics computed IN the engine: the linear
    quality classifier (x_quality_logit's frozen-weight score) graded
    against the Gopher rule battery as reference labels — confusion
    counts, accuracy, precision/recall/F1 on the keep class, and Cohen's
    κ (agreement above chance). This is the model-eval primitive a data
    pipeline runs after every reweighting/retrain; every metric is a
    ratio of exact integer confusion counts (one scan, one 4-counter
    aggregate), divided once in DOUBLE with identical expressions — the
    whole evaluation is oracle-replayable, unlike sklearn-side eval."""
    from .corpus import gopher_metrics

    docs = tables(spark, sf_dir)["documents"].where(F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("double")
        / n_tokens
    )
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    mean_tok_len = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_tokens
    )
    pred = (
        -1.5 + 2.0 * stop_ratio + 3.0 * uniq_ratio + 0.25 * mean_tok_len
    ) > 1.8
    ref = gopher_metrics()["keep"]
    c = docs.agg(
        F.count(F.when(pred & ref, 1)).alias("tp"),
        F.count(F.when(pred & ~ref, 1)).alias("fp"),
        F.count(F.when(~pred & ref, 1)).alias("fn"),
        F.count(F.when(~pred & ~ref, 1)).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    n_d = (tp + fp + fn + tn).cast("double")
    po = (tp + tn).cast("double") / n_d
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)).cast("double") / (
        n_d * n_d
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        po.alias("accuracy"),
        (tp.cast("double") / (tp + fp).cast("double")).alias("precision_keep"),
        (tp.cast("double") / (tp + fn).cast("double")).alias("recall_keep"),
        ((2 * tp).cast("double") / (2 * tp + fp + fn).cast("double")).alias(
            "f1_keep"
        ),
        ((po - pe) / (1.0 - pe)).alias("cohens_kappa"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching efficiency (round 8)
# ---------------------------------------------------------------------------

_LB_BUCKETS = 8


@query(
    "x_length_bucketing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tok,
             NTILE({_LB_BUCKETS}) OVER (ORDER BY n_tok, doc_id) AS bucket
      FROM tok
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok,
           -- SUM(BIGINT) widens to HUGEINT (pandas float64) — pin BIGINT
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           COUNT(*) * MAX(n_tok) AS padded_tok,
           CAST((COUNT(*) * MAX(n_tok) - SUM(n_tok)) * 1000000
             // (COUNT(*) * MAX(n_tok)) AS BIGINT) AS waste_ppm
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def x_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching ledger: documents NTILE'd into
    {g} equal-population buckets by token count (exact SQL-standard
    ntile via the DISTRIBUTED two-phase rank — never a single-partition
    window), then per bucket the padding waste a trainer pays batching
    that bucket to its own max length (pad-to-max within the bucket,
    integer ppm). This is the ledger that justifies length-grouped
    batching: compare Σ waste against the one-bucket degenerate case and
    pick the bucket count where marginal savings flatten.

    Scale shape: token counting is map-only; the ntile is
    range-repartition + per-partition rank + broadcast offsets
    (O(#partitions) driver state, operators/ranking.py); the ledger is
    one bounded-key aggregate. All integers — COUNT·MAX and the ppm
    division replay exactly in the oracle."""
    from ..operators.ranking import with_global_ntile

    tok = tables(spark, sf_dir)["documents"].select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    b = with_global_ntile(
        tok, _LB_BUCKETS, [F.col("n_tok"), F.col("doc_id")], alias="bucket"
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_tok",
            "max_tok",
            "sum_tok",
            (F.col("n_docs") * F.col("max_tok")).alias("padded_tok"),
            F.expr(
                "(n_docs * max_tok - sum_tok) * 1000000 DIV (n_docs * max_tok)"
            ).alias("waste_ppm"),
        )
        .orderBy("bucket")
    )


x_length_bucketing.__doc__ = x_length_bucketing.__doc__.format(g=_LB_BUCKETS)


# ---------------------------------------------------------------------------
# Leakage-safe K-fold target encoding (round 8)
# ---------------------------------------------------------------------------

_TE_FOLDS = 5


@query(
    "x_target_encoding",
    oracle=f"""
    WITH base AS (
      SELECT c.c_nationkey AS category, o.o_totalprice AS target,
             ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               % {_TE_FOLDS} AS fold
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    cf AS (
      SELECT category, fold, COUNT(*) AS n,
             SUM(CAST(target AS DECIMAL(18,6))) AS s
      FROM base GROUP BY 1, 2
    ),
    cat AS (
      SELECT category, CAST(SUM(n) AS BIGINT) AS n_cat, SUM(s) AS s_cat
      FROM cf GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_tot, SUM(s) AS s_tot FROM cf
    )
    SELECT cf.category, cf.fold, cf.n AS n_rows,
           COALESCE(
             CASE WHEN cat.n_cat > cf.n
                  THEN CAST(cat.s_cat - cf.s AS DOUBLE) / (cat.n_cat - cf.n)
             END,
             CAST(tot.s_tot - cf.s AS DOUBLE) / (tot.n_tot - cf.n)
           ) AS enc
    FROM cf JOIN cat USING (category), tot
    ORDER BY category, fold
    """,
)
def x_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding of customer nation against
    order value — the feature-prep operator that replaces a high-
    cardinality category with the mean target of OTHER folds' rows
    (enc(cat, fold) = (Σ_cat − Σ_cat,fold) / (n_cat − n_cat,fold)), so a
    model trained on fold f never sees its own rows' targets inside the
    feature. Folds come from the md5 of the row key ([[split_bucket]]
    discipline) — engine-, run- and partition-stable. A category entirely
    inside one fold falls back to the global out-of-fold mean.

    Determinism: all sums are exact DECIMAL(18,6) (associative), the
    subtraction stays decimal, and ONE double conversion + ONE exact-
    integer division produce the encoding — bit-replayable in the oracle.

    Scale shape: one fact-side join (customer broadcastable), one
    (category, fold) hash aggregate with map-side partials, one tiny
    per-category re-aggregate + a 1-row global frame broadcast back —
    the fact table is scanned once; output is |categories| × K rows."""
    t = tables(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % _TE_FOLDS
    )
    base = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_nationkey").alias("category"),
            F.col("o_totalprice").alias("target"),
            fold.alias("fold"),
        )
    )
    cf = base.groupBy("category", "fold").agg(
        F.count("*").alias("n"),
        F.sum(F.col("target").cast("decimal(18,6)")).alias("s"),
    )
    cat = cf.groupBy("category").agg(
        F.sum("n").alias("n_cat"), F.sum("s").alias("s_cat")
    )
    tot = cf.agg(F.sum("n").alias("n_tot"), F.sum("s").alias("s_tot"))
    oof = (F.col("s_cat") - F.col("s")).cast("double") / (
        F.col("n_cat") - F.col("n")
    )
    fallback = (F.col("s_tot") - F.col("s")).cast("double") / (
        F.col("n_tot") - F.col("n")
    )
    return (
        cf.join(cat, "category")
        .crossJoin(F.broadcast(tot))
        .select(
            "category",
            "fold",
            F.col("n").alias("n_rows"),
            F.coalesce(
                F.when(F.col("n_cat") > F.col("n"), oof), fallback
            ).alias("enc"),
        )
        .orderBy("category", "fold")
    )


# ---------------------------------------------------------------------------
# Weighted sampling: sequential Poisson (πps) per-stratum subsample
# ---------------------------------------------------------------------------

_WSAMPLE_K = 10  # sample size per language stratum


@query(
    "x_weighted_sample",
    oracle=f"""
    WITH pri AS (
      SELECT lang, doc_id, n_chars,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              / 4294967296.0) / CAST(n_chars AS DOUBLE) AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT lang, doc_id, n_chars, priority,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY priority, doc_id) AS rk
      FROM pri
    )
    WHERE rk <= {_WSAMPLE_K}
    ORDER BY lang, rank
    """,
)
def x_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, probability ∝ size:
    sequential Poisson sampling (Ohlsson 1998 — the πps estimator behind
    several national CPI samples): each row gets priority u/w where u is
    its md5 hash fraction (exact: 32-bit hash integer / 2³²) and w its
    weight (n_chars); the k smallest priorities per stratum are the
    sample. Both divisions are single IEEE ops on exactly-representable
    operands, so the priorities — and the selected SET — are bit-identical
    in any engine, stable under repartitioning, and reproducible without
    RNG state. The weighted face of `x_quota_sample`'s uniform top-k:
    quality- or length-weighted corpus subsampling at 100 TB is this
    exact plan — map-side priority, per-stratum top-k heaps, no global
    sort, no sampling pass over the data twice."""
    docs = tables(spark, sf_dir)["documents"].where(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    pri = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        (u / F.col("n_chars").cast("double")).alias("priority"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    return (
        pri.select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= _WSAMPLE_K)
        .orderBy("lang", "rank")
    )


#: Temperature for mixture flattening: τ = 1/2 (weights ∝ n^τ). sqrt is
#: the ONE fractional power both engines compute identically (IEEE-754
#: correctly-rounded), so τ=0.5 keeps the no-libm doctrine; other
#: temperatures would need an integer-rational pow approximation.
_MIX_TOTAL_QUOTA = 10_000


@query(
    "x_mixture_temperature",
    oracle=f"""
    WITH n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    w AS (
      SELECT source, n_docs,
             CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000000) AS BIGINT)
               AS weight_scaled
      FROM n
    ),
    tot AS (SELECT SUM(weight_scaled) AS big_w, SUM(n_docs) AS big_n FROM w),
    base AS (
      SELECT w.source, w.n_docs, w.weight_scaled,
             ({_MIX_TOTAL_QUOTA} * w.weight_scaled) // t.big_w AS quota_floor,
             ({_MIX_TOTAL_QUOTA} * w.weight_scaled) % t.big_w AS rem,
             t.big_w, t.big_n
      FROM w, tot t
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
             {_MIX_TOTAL_QUOTA} - SUM(quota_floor) OVER () AS leftover
      FROM base
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           weight_scaled,
           CAST(quota_floor + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota,
           CAST(1000000 * n_docs // big_n AS BIGINT) AS natural_ppm,
           CAST(1000000 * (quota_floor
                + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                // {_MIX_TOTAL_QUOTA} AS BIGINT) AS tempered_ppm
    FROM ranked
    """,
)
def x_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture quotas: per-source sampling targets
    ∝ n^τ at τ=1/2 (the multilingual-LM recipe that up-weights small
    sources without letting any source dominate), apportioned to an
    integer quota of {q} draws by the largest-remainder method
    (Hamilton) — quotas sum EXACTLY to the target, ties broken by
    source name. Weights are round(sqrt(n)·1e9) as bigints: sqrt is
    IEEE-correctly-rounded in every engine, and from there every
    comparison, division, and remainder is integer arithmetic — no
    order-dependent float summation anywhere (the no-libm doctrine
    applied to a fractional power).

    Scale: one uniform-key count per source, then a constant-size
    (#sources) frame for the apportionment window — the quota math is
    metadata-scale regardless of corpus size. Complements
    x_mixture_resample (acceptance-samples to GIVEN rates) by computing
    the rates themselves; feed these quotas into its thresholds.

    Reference contrast: no sampling/mixing surface in the reference;
    §2.13 pipeline-funnel family.
    """
    docs = tables(spark, sf_dir)["documents"]
    n = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = n.withColumn(
        "weight_scaled",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000_000).cast(
            "bigint"
        ),
    )
    tot = w.agg(
        F.sum("weight_scaled").alias("big_w"),
        F.sum("n_docs").alias("big_n"),
    )
    q = F.lit(_MIX_TOTAL_QUOTA)
    base = w.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "weight_scaled",
        (q * F.col("weight_scaled")).cast("long").alias("scaled_q"),
        "big_w",
        "big_n",
    )
    base = base.select(
        "source",
        "n_docs",
        "weight_scaled",
        F.expr("scaled_q div big_w").alias("quota_floor"),
        (F.col("scaled_q") % F.col("big_w")).alias("rem"),
        "big_w",
        "big_n",
    )
    # apportionment runs on the constant-size per-source frame: the rank
    # window is bounded by #sources (ALLOWED_GLOBAL_WINDOW class); the
    # floor-sum goes through a broadcast scalar frame, not a global window
    floors = base.agg(F.sum("quota_floor").alias("sum_floor"))
    win = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = (
        base.join(F.broadcast(floors))
        .withColumn("rk", F.row_number().over(win))
        .withColumn("leftover", q - F.col("sum_floor"))
    )
    quota = F.col("quota_floor") + F.when(
        F.col("rk") <= F.col("leftover"), 1
    ).otherwise(0)
    return ranked.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "weight_scaled",
        quota.cast("long").alias("quota"),
        F.expr("(1000000 * n_docs) div big_n").alias("natural_ppm"),
        (F.lit(1_000_000) * quota)
        .cast("long")
        .alias("t_num"),
    ).select(
        "source",
        "n_docs",
        "weight_scaled",
        "quota",
        "natural_ppm",
        F.expr(f"t_num div {_MIX_TOTAL_QUOTA}").alias("tempered_ppm"),
    )


x_mixture_temperature.__doc__ = x_mixture_temperature.__doc__.format(
    q=_MIX_TOTAL_QUOTA
)


# ---------------------------------------------------------------------------
# Raking / iterative proportional fitting (round 13)
# ---------------------------------------------------------------------------

#: Fixed-point scale for raking weights (1.0 == 1e6 — weight_ppm).
_RAKE_SC = 1_000_000
#: Synchronous IPF rounds (row pass + column pass each), unrolled in the
#: oracle like the pagerank/BPE recurrences.
_RAKE_ROUNDS = 3


#: The unrolled IPF oracle chain (cells → w3 with the converged weights),
#: shared by x_raking_weights and x_weighted_quantile so the recurrence
#: cannot drift between the weight face and its consumers.
_SQL_RAKE_CTES = """cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    rref AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS rt
      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    cref AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS ct
      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    w0 AS (
      SELECT c.source, c.lang, c.n,
             COALESCE(rref.rt, 0) AS rt, COALESCE(cref.ct, 0) AS ct,
             CAST(1000000 AS BIGINT) AS w
      FROM cells c
      LEFT JOIN rref ON rref.source = c.source
      LEFT JOIN cref ON cref.lang = c.lang
    ),
    rs0 AS (SELECT source, SUM(n * w) AS rs FROM w0 GROUP BY 1),
    wr0 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.rt * 1000000000000) // NULLIF(rs0.rs, 0))) // 1000000, 0) AS w
      FROM w0 w JOIN rs0 ON rs0.source = w.source
    ),
    cs0 AS (SELECT lang, SUM(n * w) AS cs FROM wr0 GROUP BY 1),
    w1 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.ct * 1000000000000) // NULLIF(cs0.cs, 0))) // 1000000, 0) AS w
      FROM wr0 w JOIN cs0 ON cs0.lang = w.lang
    ),
    rs1 AS (SELECT source, SUM(n * w) AS rs FROM w1 GROUP BY 1),
    wr1 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.rt * 1000000000000) // NULLIF(rs1.rs, 0))) // 1000000, 0) AS w
      FROM w1 w JOIN rs1 ON rs1.source = w.source
    ),
    cs1 AS (SELECT lang, SUM(n * w) AS cs FROM wr1 GROUP BY 1),
    w2 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.ct * 1000000000000) // NULLIF(cs1.cs, 0))) // 1000000, 0) AS w
      FROM wr1 w JOIN cs1 ON cs1.lang = w.lang
    ),
    rs2 AS (SELECT source, SUM(n * w) AS rs FROM w2 GROUP BY 1),
    wr2 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.rt * 1000000000000) // NULLIF(rs2.rs, 0))) // 1000000, 0) AS w
      FROM w2 w JOIN rs2 ON rs2.source = w.source
    ),
    cs2 AS (SELECT lang, SUM(n * w) AS cs FROM wr2 GROUP BY 1),
    w3 AS (
      SELECT w.source, w.lang, w.n, w.rt, w.ct,
             COALESCE((w.w * ((w.ct * 1000000000000) // NULLIF(cs2.cs, 0))) // 1000000, 0) AS w
      FROM wr2 w JOIN cs2 ON cs2.lang = w.lang
    )"""


@query(
    "x_raking_weights",
    oracle=f"""
    WITH {_SQL_RAKE_CTES}
    SELECT source, lang, n AS n_docs,
           CAST(w AS BIGINT) AS weight_ppm,
           CAST((n * w) // 1000000 AS BIGINT) AS weighted_count
    FROM w3
    ORDER BY source, lang
""",
)
def x_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking (iterative proportional fitting) of per-cell sampling
    weights over the (source × lang) grid: {r} synchronous IPF rounds
    alternately scale each cell weight so the WEIGHTED row marginals
    match the reference row targets, then the column marginals the
    column targets — the post-stratification estimator survey
    statistics and dataset-mixture reweighting both rest on (Deming &
    Stephan 1940). Targets here are the marginals of a deterministic
    reference half (doc_id % 2 = 0): "reweight the full corpus so its
    source AND language mixes match the reference sample" — the 2-D
    version of what x_mixture_resample does per 1-D source quota, for
    the case where per-cell targets are unknown and only the two
    marginal mixes are specified.

    All arithmetic is fixed-point bigint (weights in ppm of 1.0,
    scaling factors (target·SC²) DIV marginal-mass, one DIV per pass) —
    deterministic, order-independent, and replayable by the oracle's
    unrolled CTE chain; operands stay nonnegative so Spark's
    truncate-toward-zero DIV and DuckDB's flooring ``//`` agree (the
    repo-wide integer-DIV rule). Cells whose source or lang is absent
    from the reference get factor 0 → weight 0 (excluded mass), guarded
    by NULLIF/COALESCE on both engines.

    Scale: the cell grid is |sources|·|langs| — METADATA-scale next to
    the corpus scan that builds it (one uniform groupBy); every IPF
    pass is a groupBy + broadcast join over that grid, so rounds cost
    nothing at 100 TB and the single corpus-scale operation is the
    initial count. Weight application downstream is a broadcast-map.

    Reference contrast: no weighting surface in the reference; §2.13
    mixture family (resample r11, temperature r12) — this adds the
    marginal-matching face.
    """
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "source", "lang")
    cells, rref, cref = _rake_inputs(docs)
    return rake_cell_weights(cells, rref, cref).orderBy("source", "lang")


x_raking_weights.__doc__ = x_raking_weights.__doc__.format(r=_RAKE_ROUNDS)


def _rake_inputs(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(cells, row_targets, col_targets) for the IPF faces from ONE corpus
    scan instead of three: the per-cell aggregate carries both the full
    count and the reference-half count, and the marginal targets are
    metadata-scale roll-ups of that grid (rt = Σ_lang nref per source is
    exactly the reference half's per-source count; sources/langs absent
    from the reference surface as rt/ct = 0, the same 0 the old LEFT
    JOIN + COALESCE produced). Eagerly checkpointed: the grid is
    |sources|·|langs| rows with three consumers."""
    cell_stats = (
        docs.groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("nref"),
        )
        .localCheckpoint(eager=True)
    )
    cells = cell_stats.select("source", "lang", "n")
    rref = cell_stats.groupBy("source").agg(F.sum("nref").cast("long").alias("rt"))
    cref = cell_stats.groupBy("lang").agg(F.sum("nref").cast("long").alias("ct"))
    return cells, rref, cref


def rake_cell_weights(
    cells: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = _RAKE_ROUNDS,
) -> DataFrame:
    """The IPF core behind x_raking_weights, reusable on any 2-D grid:
    ``cells`` (source, lang, n), ``row_targets`` (source, rt),
    ``col_targets`` (lang, ct). Returns (source, lang, n_docs,
    weight_ppm, weighted_count). Hypothesis property-tests replay the
    exact fixed-point recurrence in pure python on random grids."""
    w = (
        cells.join(F.broadcast(row_targets), "source", "left")
        .join(F.broadcast(col_targets), "lang", "left")
        .select(
            "source",
            "lang",
            "n",
            F.coalesce(F.col("rt"), F.lit(0)).alias("rt"),
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
            F.lit(_RAKE_SC).cast("long").alias("w"),
        )
    )

    def pass_(frame: DataFrame, key: str, target: str) -> DataFrame:
        # Marginal mass as SUM() OVER (PARTITION BY key) instead of a
        # groupBy + broadcast join back: the IPF grid is metadata-scale
        # (|sources|·|langs| rows), and the join form planned one
        # aggregate exchange + one broadcast build PER PASS — 16 shuffles
        # / 32 broadcasts across the unrolled 3-round chain (PLANS_r14
        # row). The window keeps one small exchange per pass and nothing
        # else. Same sum over the same partition → bit-identical weights.
        mass = F.sum(F.col("n") * F.col("w")).over(Window.partitionBy(key))
        return frame.withColumn("ms", mass).select(
            "source",
            "lang",
            "n",
            "rt",
            "ct",
            F.coalesce(
                F.expr(
                    f"(w * (({target} * {_RAKE_SC * _RAKE_SC}) DIV"
                    f" nullif(ms, 0))) DIV {_RAKE_SC}"
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("w"),
        )

    for _ in range(rounds):
        w = pass_(w, "source", "rt")
        w = pass_(w, "lang", "ct")
    return w.select(
        "source",
        "lang",
        F.col("n").alias("n_docs"),
        F.col("w").alias("weight_ppm"),
        F.expr(f"(n * w) DIV {_RAKE_SC}").cast("long").alias("weighted_count"),
    )


# ---------------------------------------------------------------------------
# Score-calibration reliability profile (round 14)
# ---------------------------------------------------------------------------

#: Reliability-diagram bins over the normalized classifier confidence.
_ECE_BINS = 10


def _sql_conf_cte() -> str:
    """Shared oracle CTE: per-document Gopher reference label + the
    exact-integer classifier confidence in ppm (the no-libm form — see
    x_ece_calibration's docstring for the derivation). Produces
    ``conf_scored(doc_id, lang, ref_keep, conf_ppm)``; consumed by the
    ECE (calibration) and AUC (ranking) eval oracles so the score
    definition cannot drift between the two faces."""
    from .corpus import SQL_GOPHER_KEEP

    return f"""w AS (
      SELECT doc_id, COALESCE(lang, '∅') AS lang, text,
             string_split(text, ' ') AS ws
      FROM documents WHERE length(text) > 0
    ),
    conf_scored AS (
      SELECT doc_id, lang,
             ({SQL_GOPHER_KEEP}) AS ref_keep,
             (1000000 * LEAST(80 * len(ws), GREATEST(0,
                5 * (-6 * len(ws)
                     + 8 * len(list_filter(ws, t -> t IN ('the', 'a')))
                     + 12 * len(list_distinct(ws))
                     + length(replace(text, ' ', '')))
                + 4 * len(ws))))
             // (80 * len(ws)) AS conf_ppm
      FROM w
    )"""


def conf_scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :func:`_sql_conf_cte`: one map-side projection per
    document → (lang, ref_keep, conf_ppm). The confidence is the exact
    rational (5I + 4n)/(80n) floored to ppm with the numerator clamped
    non-negative BEFORE the DIV (trunc-vs-floor rule); I = 4·score·n is
    the integer numerator of the frozen-weight linear quality score."""
    from .corpus import gopher_metrics

    docs = tables(spark, sf_dir)["documents"].where(F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("long")
    stops = F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("long")
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "long"
    )
    score_i = -6 * n_tok + 8 * stops + 12 * uniq + chars  # = 4·score·n_tok
    conf_num = F.least(
        80 * n_tok, F.greatest(F.lit(0).cast("long"), 5 * score_i + 4 * n_tok)
    )
    return docs.select(
        F.coalesce(F.col("lang"), F.lit("∅")).alias("lang"),
        gopher_metrics()["keep"].alias("ref_keep"),
        (1000000 * conf_num).alias("cn"),
        (80 * n_tok).alias("cd"),
    ).select("lang", "ref_keep", F.expr("cn DIV cd").alias("conf_ppm"))


def _sql_ece() -> str:
    return f"""
    WITH {_sql_conf_cte()},
    scored AS (SELECT doc_id, ref_keep, conf_ppm FROM conf_scored),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM scored),
    b AS (
      SELECT CAST(LEAST({_ECE_BINS - 1}, conf_ppm // 100000) AS INTEGER)
               AS bin,
             ref_keep, conf_ppm
      FROM scored
    ),
    g AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(CASE WHEN ref_keep THEN 1 END) AS BIGINT) AS n_keep,
             CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf_ppm
      FROM b GROUP BY bin
    )
    SELECT bin, n_docs, n_keep, sum_conf_ppm,
           CAST(sum_conf_ppm AS DOUBLE) / n_docs / 1000000.0 AS avg_conf,
           CAST(n_keep AS DOUBLE) / n_docs AS keep_rate,
           ABS(CAST(sum_conf_ppm AS DOUBLE) / n_docs / 1000000.0
               - CAST(n_keep AS DOUBLE) / n_docs) AS abs_gap,
           ABS(CAST(sum_conf_ppm AS DOUBLE) / n_docs / 1000000.0
               - CAST(n_keep AS DOUBLE) / n_docs)
             * n_docs / (SELECT n_total FROM tot) AS ece_term
    FROM g ORDER BY bin
    """


@query("x_ece_calibration", oracle=_sql_ece())
def x_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram / expected-calibration-error profile of the
    frozen-weight quality classifier (x_classifier_eval's linear score)
    against the Gopher rule battery as reference labels: the raw score
    is normalized to a [0, 1] confidence (affine map centered on the
    1.8 decision threshold), cut into {b} equal-width bins, and each bin
    reports its size, mean confidence, empirical keep rate, calibration
    gap, and its ECE contribution (gap × bin mass) — summing ``ece_term``
    IS the expected calibration error. The metric a pipeline checks
    before using classifier scores as sampling WEIGHTS (DSIR-style
    reweighting, x_dsir_select) rather than as a hard gate: a
    well-ranked but mis-calibrated score corrupts weighted mixtures
    while leaving x_classifier_eval's accuracy/F1 untouched — this face
    sees what that one cannot.

    Determinism (the no-libm doctrine, learned the hard way in-round:
    the float-expression form diverged from DuckDB by 1 ulp on ONE
    document, which the decimal cast then amplified into a hash
    mismatch): the score's ratio terms share denominator n_tokens, so
    4·score·n_tokens is an exact integer I = −6n + 8·stops + 12·uniq +
    chars, the normalized confidence is the exact rational
    (5I + 4n)/(80n), and ``conf_ppm`` floors its ppm scaling with the
    numerator clamped non-negative BEFORE the division (Spark DIV
    truncates, DuckDB // floors — they agree only on non-negative
    operands, the x_kanon_audit rule). Every aggregate is an integer
    sum; the final doubles are single identical divisions.

    Scale: one scan, one {b}-group aggregate with map-side partials,
    one broadcast of the scalar total — the same shape at any corpus
    size.

    Reference contrast: no model-eval surface in the reference; extends
    the §2.13 eval family (classifier_eval r11, recs/ndcg r11/r13) with
    the calibration face."""
    scored = conf_scored_docs(spark, sf_dir).select("ref_keep", "conf_ppm")
    tot = scored.agg(F.count("*").cast("long").alias("n_total"))
    binned = scored.select(
        F.least(F.lit(_ECE_BINS - 1), F.expr("conf_ppm DIV 100000"))
        .cast("int")
        .alias("bin"),
        "ref_keep",
        "conf_ppm",
    )
    g = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count(F.when(F.col("ref_keep"), 1)).cast("long").alias("n_keep"),
        F.sum("conf_ppm").cast("long").alias("sum_conf_ppm"),
    )
    avg_conf = (
        F.col("sum_conf_ppm").cast("double")
        / F.col("n_docs")
        / F.lit(1000000.0)
    )
    keep_rate = F.col("n_keep").cast("double") / F.col("n_docs")
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_docs",
            "n_keep",
            "sum_conf_ppm",
            avg_conf.alias("avg_conf"),
            keep_rate.alias("keep_rate"),
            F.abs(avg_conf - keep_rate).alias("abs_gap"),
            (
                F.abs(avg_conf - keep_rate)
                * F.col("n_docs")
                / F.col("n_total")
            ).alias("ece_term"),
        )
        .orderBy("bin")
    )


x_ece_calibration.__doc__ = x_ece_calibration.__doc__.replace(
    "{b}", str(_ECE_BINS)
)


# ---------------------------------------------------------------------------
# Ranking quality of the classifier score: exact Mann-Whitney AUC (round 14)
# ---------------------------------------------------------------------------


def _sql_auc() -> str:
    return f"""
    WITH {_sql_conf_cte()},
    g AS (
      SELECT lang, conf_ppm,
             CAST(COUNT(CASE WHEN ref_keep THEN 1 END) AS BIGINT) AS n_pos,
             CAST(COUNT(CASE WHEN NOT ref_keep THEN 1 END) AS BIGINT) AS n_neg
      FROM conf_scored GROUP BY 1, 2
    ),
    cum AS (
      SELECT lang, n_pos, n_neg,
             COALESCE(SUM(n_neg) OVER (
               PARTITION BY lang ORDER BY conf_ppm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
      FROM g
    ),
    per_lang AS (
      SELECT lang,
             CAST(SUM(n_pos) AS BIGINT) AS n_pos,
             CAST(SUM(n_neg) AS BIGINT) AS n_neg,
             CAST(SUM(2 * n_pos * cneg + n_pos * n_neg) AS BIGINT) AS u2
      FROM cum GROUP BY 1
    ),
    gg AS (
      SELECT conf_ppm, SUM(n_pos) AS n_pos, SUM(n_neg) AS n_neg
      FROM g GROUP BY 1
    ),
    gcum AS (
      SELECT n_pos, n_neg,
             COALESCE(SUM(n_neg) OVER (
               ORDER BY conf_ppm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg
      FROM gg
    ),
    overall AS (
      SELECT 'ALL' AS lang,
             CAST(SUM(n_pos) AS BIGINT) AS n_pos,
             CAST(SUM(n_neg) AS BIGINT) AS n_neg,
             CAST(SUM(2 * n_pos * cneg + n_pos * n_neg) AS BIGINT) AS u2
      FROM gcum
    ),
    u AS (SELECT * FROM per_lang UNION ALL SELECT * FROM overall)
    SELECT lang, n_pos, n_neg, u2,
           CAST((1000000 * u2) // NULLIF(2 * n_pos * n_neg, 0) AS BIGINT)
             AS auc_ppm
    FROM u ORDER BY lang
    """


@query("x_auc_rank", oracle=_sql_auc())
def x_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware Mann-Whitney AUC of the frozen-weight quality
    classifier against the Gopher rule battery, per language plus an
    'ALL' corpus row — the RANKING face of the eval family:
    x_classifier_eval grades the thresholded decision, x_ece_calibration
    grades the probability calibration, this grades the score's ordering
    power (can it rank a random kept doc above a random dropped one?),
    which is what matters when the score drives top-p selection or
    quality-weighted sampling rather than a fixed gate. A per-language
    AUC split exposes the classic failure where a score that ranks well
    globally is random WITHIN a low-resource language.

    Exactness: AUC = (#(pos>neg) + ½·#(pos==neg)) / (n_pos·n_neg). The
    score is the shared integer ``conf_ppm`` (``conf_scored_docs``), so
    ties are exact; doubling the numerator keeps everything integer:
    u2 = Σ_v [2·n_pos(v)·cumneg(<v) + n_pos(v)·n_neg(v)] and
    auc_ppm = 10⁶·u2 DIV (2·n_pos·n_neg) — operands non-negative, so
    Spark's truncating DIV and DuckDB's flooring // agree. NULLIF guards
    the all-one-class language.

    Scale: one map-side score projection, one (lang, conf_ppm) hash agg
    — after which every frame is bounded by the score CODOMAIN, not the
    corpus: ≤ 1,000,001 distinct ppm values per language partition (the
    cumulative window is partitioned by lang), and the 'ALL' face
    re-aggregates that histogram to ≤ 1,000,001 rows total before its
    global window (bounded-by-construction allowlist,
    tests/test_scale_plans.py). u2 ≤ (n_docs)² needs DECIMAL(38,0)
    beyond ~3·10⁹ docs per language — swap the three sum types there;
    the plan shape is unchanged.

    Reference contrast: no eval surface in the reference app (app.py
    displays ALS outputs raw); extends SURVEY §2.13's eval family."""
    s = conf_scored_docs(spark, sf_dir)
    g = s.groupBy("lang", "conf_ppm").agg(
        F.count(F.when(F.col("ref_keep"), 1)).cast("long").alias("n_pos"),
        F.count(F.when(~F.col("ref_keep"), 1)).cast("long").alias("n_neg"),
    )

    def _u2(grouped: DataFrame, part_cols: list[str], lang_col) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols).orderBy("conf_ppm")
            if part_cols
            else Window.orderBy("conf_ppm")
        ).rowsBetween(Window.unboundedPreceding, -1)
        cneg = F.coalesce(F.sum("n_neg").over(w), F.lit(0).cast("long"))
        terms = grouped.select(
            lang_col.alias("lang"),
            "n_pos",
            "n_neg",
            (2 * F.col("n_pos") * cneg + F.col("n_pos") * F.col("n_neg")).alias(
                "t"
            ),
        )
        return terms.groupBy("lang").agg(
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum("n_neg").cast("long").alias("n_neg"),
            F.sum("t").cast("long").alias("u2"),
        )

    per_lang = _u2(g, ["lang"], F.col("lang"))
    gg = g.groupBy("conf_ppm").agg(
        F.sum("n_pos").alias("n_pos"), F.sum("n_neg").alias("n_neg")
    )
    overall = _u2(gg, [], F.lit("ALL"))
    u = per_lang.unionByName(overall)
    return u.select(
        "lang",
        "n_pos",
        "n_neg",
        "u2",
        F.expr("(1000000 * u2) DIV NULLIF(2 * n_pos * n_neg, 0)")
        .cast("long")
        .alias("auc_ppm"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Weighted order statistics under the raked weights (round 14)
# ---------------------------------------------------------------------------


def _sql_weighted_quantile() -> str:
    return f"""
    WITH {_SQL_RAKE_CTES},
    wdoc AS (
      SELECT d.lang, d.n_chars, w3.w
      FROM documents d
      JOIN w3 ON w3.source = d.source AND w3.lang = d.lang
    ),
    hist AS (
      SELECT lang, n_chars,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(w) AS BIGINT) AS wsum
      FROM wdoc GROUP BY 1, 2
    ),
    tot AS (
      SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(wsum) AS BIGINT) AS wtot
      FROM hist GROUP BY 1
    ),
    cum AS (
      SELECT lang, n_chars, cnt, wsum,
             SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS ccnt,
             SUM(wsum) OVER (PARTITION BY lang ORDER BY n_chars) AS cw
      FROM hist
    )
    SELECT c.lang, t.n AS n_docs, t.wtot AS total_weight,
           MIN(CASE WHEN c.ccnt >= (t.n * 50 + 99) // 100
                    THEN c.n_chars END) AS p50_chars,
           MIN(CASE WHEN c.cw >= (t.wtot * 50 + 99) // 100
                    THEN c.n_chars END) AS wp50_chars,
           MIN(CASE WHEN c.ccnt >= (t.n * 95 + 99) // 100
                    THEN c.n_chars END) AS p95_chars,
           MIN(CASE WHEN c.cw >= (t.wtot * 95 + 99) // 100
                    THEN c.n_chars END) AS wp95_chars,
           MIN(CASE WHEN c.cw >= (t.wtot * 50 + 99) // 100
                    THEN c.n_chars END)
             - MIN(CASE WHEN c.ccnt >= (t.n * 50 + 99) // 100
                        THEN c.n_chars END) AS p50_shift
    FROM cum c JOIN tot t USING (lang)
    GROUP BY c.lang, t.n, t.wtot
    ORDER BY c.lang
    """


@query("x_weighted_quantile", oracle=_sql_weighted_quantile())
def x_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED order statistics under the raked sampling weights — the
    consumer face of x_raking_weights that demonstrates why a pipeline
    rakes at all: per language, the weighted rank-DISC p50/p95 of
    document length (smallest value whose cumulative WEIGHT reaches
    ⌈q·W⌉) next to the unweighted ones, with the induced median shift.
    After IPF reweights the (source × lang) grid to the reference
    marginals, every downstream statistic must fold the weights in —
    an unweighted median of a raked corpus silently reports the
    pre-correction population. The IPF oracle chain is shared verbatim
    with x_raking_weights (one definition, two faces), so weight drift
    between the producer and this consumer is impossible.

    Exactness: weights are integer ppm, cumulative sums exact bigints,
    the quantile pick pure rank logic — no interpolation, no floats.

    Scale: one broadcast join of the (source × lang) weight grid onto
    the corpus, one (lang, n_chars) hash agg; the cumulative windows run
    over per-language HISTOGRAMS bounded by the length codomain, not the
    corpus (the x_auc_rank bounded-frame argument; swap in the two-phase
    rank only if the value domain were unbounded).

    Reference contrast: no weighting surface in the reference; extends
    the §2.13 mixture/stats families with the weighted-statistics face."""
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "source", "lang")
    cells, rref, cref = _rake_inputs(docs)
    weights = rake_cell_weights(cells, rref, cref).select(
        "source", "lang", F.col("weight_ppm").alias("w")
    )
    wdoc = (
        tables(spark, sf_dir)["documents"]
        .select("source", "lang", "n_chars")
        .join(F.broadcast(weights), ["source", "lang"])
    )
    hist = wdoc.groupBy("lang", "n_chars").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("w").cast("long").alias("wsum"),
    )
    tot = hist.groupBy("lang").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("wsum").cast("long").alias("wtot"),
    )
    w_lang = Window.partitionBy("lang").orderBy("n_chars")
    cum = hist.select(
        "lang",
        "n_chars",
        F.sum("cnt").over(w_lang).alias("ccnt"),
        F.sum("wsum").over(w_lang).alias("cw"),
    )
    j = cum.join(F.broadcast(tot), "lang")
    pick = lambda cond: F.min(F.when(cond, F.col("n_chars")))  # noqa: E731
    p50 = pick(F.col("ccnt") >= F.expr("(n * 50 + 99) DIV 100"))
    wp50 = pick(F.col("cw") >= F.expr("(wtot * 50 + 99) DIV 100"))
    p95 = pick(F.col("ccnt") >= F.expr("(n * 95 + 99) DIV 100"))
    wp95 = pick(F.col("cw") >= F.expr("(wtot * 95 + 99) DIV 100"))
    return (
        j.groupBy("lang", "n", "wtot")
        .agg(
            p50.alias("p50_chars"),
            wp50.alias("wp50_chars"),
            p95.alias("p95_chars"),
            wp95.alias("wp95_chars"),
            (wp50 - p50).alias("p50_shift"),
        )
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            F.col("wtot").alias("total_weight"),
            "p50_chars",
            "wp50_chars",
            "p95_chars",
            "wp95_chars",
            "p50_shift",
        )
        .orderBy("lang")
    )
