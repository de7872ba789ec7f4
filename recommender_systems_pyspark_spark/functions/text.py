"""Text-analysis operators over the ``documents`` table (north-star
extension per BASELINE.json: token counting, quality scoring, language ID,
fingerprinting — the per-document stages of an LLM-data pipeline).

All of it is built-in column expressions inside whole-stage codegen — no
Python UDFs — so a 100 TB corpus streams through map-only stages with zero
shuffles except where an aggregation is the point of the query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, sql_exact_avg
from ..sources import tables

#: Tiny embedded stopword list (marker words for quality + lang-id). The
#: fixtures' synthetic vocabulary is English-like; real deployments swap in
#: per-language lists via a broadcast join against a stopword dimension.
EN_STOP = ("the", "a", "of", "and", "to", "in")

_TOKS = "split(text, ' ')"


def tokens() -> Column:
    """Whitespace tokenization (the engine's canonical token stream)."""
    return F.split(F.col("text"), " ")


@query(
    "x_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_measured,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
                AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len
    FROM documents
    """,
)
def x_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, char length, mean token length.
    Map-only; the BPE-ish variant (x_text_bpe_tokens) uses a regex
    tokenizer on the same plan shape."""
    t = tables(spark, sf_dir)
    toks = tokens()
    tok_len_sum = F.aggregate(
        F.transform(toks, lambda s: F.length(s)), F.lit(0), lambda acc, v: acc + v
    )
    return t["documents"].select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_measured"),
        (tok_len_sum.cast("double") / F.size(toks)).alias("avg_token_len"),
    )


@query(
    "x_text_bpe_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INTEGER) AS n_subtokens
    FROM documents
    """,
)
def x_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alpha runs / digit runs / single punctuation
    as separate tokens (regex pre-tokenization, the split GPT-style BPE
    applies before merges)."""
    t = tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0)")
        ).alias("n_subtokens"),
    )


@query(
    "x_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN {EN_STOP!r})) AS DOUBLE)
             / len(string_split(text, ' ')) AS stop_ratio,
           CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
           (CASE WHEN len(string_split(text, ' ')) >= 20
                  AND len(list_filter(string_split(text, ' '),
                                      t -> t IN {EN_STOP!r})) > 0
                 THEN 'keep' ELSE 'flag' END) AS quality_gate
    FROM documents
    """,
)
def x_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + chars-per-token + a keep/flag gate
    (the C4/Gopher-style heuristic family). Pure expressions — the gate
    becomes a pushable predicate when used as a corpus filter."""
    t = tables(spark, sf_dir)
    toks = tokens()
    n_stop = F.size(F.filter(toks, lambda s: s.isin(*EN_STOP)))
    gate = F.when(
        (F.size(toks) >= 20) & (n_stop > 0), "keep"
    ).otherwise("flag")
    return t["documents"].select(
        "doc_id",
        (n_stop.cast("double") / F.size(toks)).alias("stop_ratio"),
        (F.length("text").cast("double") / F.size(toks)).alias("chars_per_token"),
        gate.alias("quality_gate"),
    )


@query(
    "x_lang_id",
    oracle="""
    SELECT doc_id, lang AS labeled_lang,
           (CASE WHEN len(list_filter(string_split(text, ' '),
                                      t -> t IN ('the', 'a', 'of', 'and'))) >= 2
                 THEN 'en'
                 WHEN len(list_filter(string_split(text, ' '),
                                      t -> t IN ('le', 'la', 'les', 'der', 'die', 'el'))) >= 2
                 THEN 'other'
                 ELSE 'und' END) AS predicted_lang
    FROM documents
    """,
)
def x_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID, marker-word heuristic: count language-marker hits and
    pick by precedence. NOTE the fixtures generate English-like text with a
    random ``lang`` label, so agreement with the label is not meaningful —
    the operator (and its n-gram-profile upgrade path) is what is tested.
    At scale the marker lists become a broadcast dimension, keeping this a
    map-only stage."""
    t = tables(spark, sf_dir)
    toks = tokens()
    en_hits = F.size(F.filter(toks, lambda s: s.isin("the", "a", "of", "and")))
    other_hits = F.size(F.filter(toks, lambda s: s.isin("le", "la", "les", "der", "die", "el")))
    predicted = (
        F.when(en_hits >= 2, "en").when(other_hits >= 2, "other").otherwise("und")
    )
    return t["documents"].select(
        "doc_id", F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang")
    )


@query(
    "x_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_md5,
           sha256(lower(trim(text))) AS content_sha256,
           substr(md5(lower(trim(text))), 1, 16) AS short_fp
    FROM documents
    """,
)
def x_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonicalize (trim+lower) then hash. The
    md5/sha256 hex digests are engine-portable (identical in DuckDB), which
    is exactly the property a cross-system dedup pipeline needs."""
    t = tables(spark, sf_dir)
    canon = F.lower(F.trim(F.col("text")))
    return t["documents"].select(
        "doc_id",
        F.md5(canon).alias("content_md5"),
        F.sha2(canon, 256).alias("content_sha256"),
        F.substring(F.md5(canon), 1, 16).alias("short_fp"),
    )


#: Chunking geometry: 32-token windows every 24 tokens (8-token overlap) —
#: the sliding context-window shape an LLM pretraining tokenizer emits.
_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24


@query(
    "x_text_chunking",
    oracle=f"""
    SELECT doc_id, CAST(g.i AS INTEGER) AS chunk_idx,
           CAST(len(toks[g.i * {_CHUNK_STRIDE} + 1 : g.i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}])
                AS INTEGER) AS n_chunk_tokens,
           array_to_string(
             toks[g.i * {_CHUNK_STRIDE} + 1 : g.i * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}],
             ' ') AS chunk_text
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         LATERAL (SELECT unnest(range(0,
                    CAST(floor((len(toks) - 1) / {_CHUNK_STRIDE}) AS BIGINT) + 1)) AS i) g
    """,
)
def x_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: overlapping fixed-size token windows (32 tokens,
    stride 24) — one→many map-only explode, no shuffle. The chunk table is
    what embeds/pretrains downstream; at 100 TB the explode fan-out is the
    only cost and it stays inside the scan's stage. Slice semantics are
    identical in Spark (slice(toks, start, len)) and DuckDB (1-based
    inclusive list slicing), so the oracle matches chunk text exactly."""
    t = tables(spark, sf_dir)
    toks = tokens()
    n_chunks_minus1 = F.floor((F.size(toks) - 1) / _CHUNK_STRIDE).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks_minus1),
        lambda i: F.slice(toks, i * _CHUNK_STRIDE + 1, _CHUNK_TOKENS),
    )
    return (
        t["documents"]
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("n_chunk_tokens"),
            F.concat_ws(" ", "chunk").alias("chunk_text"),
        )
    )


#: Scrub patterns: email, URL, long digit runs (PII-ish), plus a vocabulary
#: mask (entity redaction). Same regex dialect subset in Java and RE2.
_RE_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_RE_URL = "https?://[^ ]+"
_RE_LONGNUM = "[0-9]{6,}"
_RE_ENTITY = "\\bspark\\b"


@query(
    "x_text_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             text, '{_RE_EMAIL}', '<EMAIL>', 'g'),
                   '{_RE_URL}', '<URL>', 'g'),
                   '{_RE_LONGNUM}', '<NUM>', 'g'),
                   '{_RE_ENTITY}', '<ENTITY>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{_RE_ENTITY}')) AS INTEGER) AS n_masked
    FROM documents
    """,
)
def x_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII / entity scrubbing: chained regexp_replace masks for emails,
    URLs, long digit runs, and a vocabulary entity — the redaction stage
    before a corpus leaves the trust boundary. Map-only codegen; the mask
    count rides along for monitoring. (Fixture text contains no PII-shaped
    strings, so the email/URL/number masks are additionally pytest-proven
    on synthetic rows; the entity mask fires on fixture content, keeping
    the oracle non-vacuous.)"""
    t = tables(spark, sf_dir)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), _RE_EMAIL, "<EMAIL>"),
                _RE_URL,
                "<URL>",
            ),
            _RE_LONGNUM,
            "<NUM>",
        ),
        _RE_ENTITY,
        "<ENTITY>",
    )
    # regexp_count takes the pattern as a Column — no SQL-literal escaping
    # round (an F.expr would need '\\\\b'; the \b became a backspace)
    n_masked = F.regexp_count(F.col("text"), F.lit(_RE_ENTITY)).cast("int")
    return t["documents"].select(
        "doc_id", scrubbed.alias("scrubbed"), n_masked.alias("n_masked")
    )


@query(
    "x_text_tfidf_top_terms",
    oracle="""
    WITH tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents) t
      GROUP BY doc_id, t.term
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf,
           CAST(tf AS DOUBLE) * (n_docs - df + 0.5) / (df + 0.5) AS salience
    FROM tf JOIN df USING (term) CROSS JOIN n
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY salience DESC, term) <= 3
    """,
)
def x_text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms: tf × rational-idf ((N − df + ½)/(df + ½),
    the BM25 idf core WITHOUT the log — pure rational arithmetic, so the
    score is bit-identical across engines), top-3 per doc. Plan: explode →
    two hash aggregations (term counts, doc frequencies) → term-keyed join
    (the term dictionary is the small side; broadcast under AQE) → per-doc
    window top-k. The df relation is corpus-wide state but scales with
    VOCABULARY, not corpus size."""
    from pyspark.sql import Window

    t = tables(spark, sf_dir)
    docs = t["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_rel = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_rel, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("salience"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("salience").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "salience")
    )


@query(
    "x_doc_stats_by_lang",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           {sql_exact_avg('n_chars', 'avg_chars')},
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def x_doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per-language doc counts and length stats — the
    monitoring query a curation pipeline runs after every filter stage."""
    from ..registry import exact_avg

    t = tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            exact_avg(F.col("n_chars").cast("double"), "avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick): bag-of-words → fixed-width vector
# ---------------------------------------------------------------------------

_FH_DIM = 64  # hashed feature dimensionality


@query(
    "x_feature_hashing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % {_FH_DIM} AS bucket,
             -- signed hashing (Weinberger et al. 2009): the 9th hex digit's
             -- low bit decides the sign, making collisions unbiased
             CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks WHERE tok <> ''
    )
    SELECT doc_id, bucket,
           CAST(SUM(sgn) AS BIGINT) AS feature_val,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM hashed
    GROUP BY doc_id, bucket
    HAVING SUM(sgn) <> 0
    ORDER BY doc_id, bucket
    """,
)
def x_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): bag-of-words →
    fixed-{dim}-dimension SIGNED hashed feature vector per document, in
    sparse (doc, bucket, value) form — the vectorizer that needs NO
    vocabulary build, no dictionary broadcast, and no second pass, which
    is exactly why it is the 100 TB featurizer of choice. Bucket and sign
    both come from the token's md5 (engine-portable integer parsing), so
    the features are bit-identical anywhere; the signed sum makes
    collision noise zero-mean. Zero-valued features are dropped (signed
    collisions can cancel) — the HAVING is part of the contract.

    Scale: one explode + one (doc, bucket)-keyed hash aggregate with
    map-side partial combine; output is bounded by {dim} per document."""
    docs = tables(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % _FH_DIM
    )
    sgn = F.when(
        F.conv(F.substring(F.md5("tok"), 9, 1), 16, 10).cast("bigint") % 2 == 0, 1
    ).otherwise(-1)
    return (
        tok.select("doc_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(
            F.sum("sgn").cast("bigint").alias("feature_val"),
            F.count("*").cast("bigint").alias("n_tokens"),
        )
        .where(F.col("feature_val") != 0)
        .orderBy("doc_id", "bucket")
    )


x_feature_hashing.__doc__ = x_feature_hashing.__doc__.format(dim=_FH_DIM)
