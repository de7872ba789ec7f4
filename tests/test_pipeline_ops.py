"""Property tests for the training-data pipeline operators
(functions/pipeline.py): algorithm replicas, invariants, and plan shape.
Oracle parity (vs DuckDB) is covered by tools/verify_local.py; these tests
pin the semantics that SQL parity alone can't (the winnowing guarantee, plan
map-only-ness, determinism across runs).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.functions import pipeline as P
from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.sources import tables

SPECS = all_queries()


def _py_winnow(text: str) -> list[int]:
    """Pure-Python replica of the winnowing fingerprint (the spec)."""
    codes = [ord(c) for c in text]
    k, w, b, m = P._GRAM_K, P._WINNOW_W, P._HASH_BASE, P._HASH_MOD
    grams = []
    for i in range(len(codes) - k + 1):
        h = 0
        for c in codes[i : i + k]:
            h = (h * b + c) % m
        grams.append(h)
    if len(grams) >= w:
        fps = [min(grams[j : j + w]) for j in range(len(grams) - w + 1)]
    else:
        fps = [min(grams)]
    return sorted(set(fps))


def test_winnow_matches_python_replica(spark, sf_dir):
    out = {
        r.doc_id: r.fps_csv
        for r in SPECS["x_fingerprint_winnow"].fn(spark, sf_dir).collect()
    }
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "text").limit(25)
    for row in docs.collect():
        expect = ",".join(str(x) for x in _py_winnow(row.text))
        assert out[row.doc_id] == expect, f"doc {row.doc_id}"


def test_winnow_shared_passage_shares_fingerprint(spark, sf_dir):
    """The MOSS guarantee: two docs sharing a substring of length
    >= k + w - 1 share at least one fingerprint."""
    docs = tables(spark, sf_dir)["documents"].select("text").limit(2).collect()
    passage = docs[0].text[: P._GRAM_K + P._WINNOW_W - 1 + 10]
    a = _py_winnow("left padding words " + passage)
    b = _py_winnow(passage + " unrelated right tail text")
    assert set(a) & set(b)


def test_winnow_plan_is_map_only(spark, sf_dir):
    plan = (
        SPECS["x_fingerprint_winnow"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_seq_packing_conserves_tokens_and_bins_contiguous(spark, sf_dir):
    bins = SPECS["x_seq_packing"].fn(spark, sf_dir).collect()
    direct = {
        (r.lang, r.shard): r.total
        for r in tables(spark, sf_dir)["documents"]
        .groupBy(
            "lang", P._md5_shard(F.col("doc_id"), 16).cast("int").alias("shard")
        )
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    by_group: dict[tuple, list] = {}
    for r in bins:
        by_group.setdefault((r.lang, r.shard), []).append(r)
    assert set(by_group) == set(direct)
    for key, rows in by_group.items():
        assert sum(r.bin_tokens for r in rows) == direct[key]
        ids = sorted(r.bin_id for r in rows)
        assert ids == list(range(len(ids)))  # bins contiguous from 0


def test_contamination_excludes_benchmark_and_rates_bounded(spark, sf_dir):
    rows = SPECS["x_contamination_ngrams"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.doc_id % P._BENCH_MOD != 0 for r in rows)
    assert all(0.0 <= r.contamination_rate <= 1.0 for r in rows)
    assert all(r.n_matched <= r.n_ngrams for r in rows)
    assert any(r.n_matched > 0 for r in rows)  # non-vacuous overlap


def test_shard_assign_covers_corpus_and_matches_md5(spark, sf_dir):
    rows = SPECS["x_shard_assign"].fn(spark, sf_dir).collect()
    total_docs = tables(spark, sf_dir)["documents"].count()
    assert sum(r.n_docs for r in rows) == total_docs
    assert all(0 <= r.shard_id < P._N_SHARDS for r in rows)
    # the shard function is exactly md5-hex-prefix mod N (portability spec)
    some = (
        tables(spark, sf_dir)["documents"]
        .select("doc_id", P._md5_shard(F.col("doc_id"), P._N_SHARDS).alias("s"))
        .limit(20)
        .collect()
    )
    for r in some:
        expect = (
            int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
            % P._N_SHARDS
        )
        assert r.s == expect


def test_quota_sample_caps_and_is_deterministic(spark, sf_dir):
    fn = SPECS["x_quota_sample"].fn
    a = fn(spark, sf_dir).collect()
    sizes = {
        r.lang: r.n
        for r in tables(spark, sf_dir)["documents"]
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    per_lang: dict[str, set] = {}
    for r in a:
        per_lang.setdefault(r.lang, set()).add(r.doc_id)
    for lang, picked in per_lang.items():
        assert len(picked) == min(P._QUOTA_PER_LANG, sizes[lang])
    b = {(r.lang, r.doc_id) for r in fn(spark, sf_dir).collect()}
    assert {(r.lang, r.doc_id) for r in a} == b


def test_tokens_e2e_funnel_accounting(spark, sf_dir):
    """Whole-funnel drop accounting: every train doc is exactly one of
    contaminated / quota_dropped / packed; per-lang packed totals respect
    the quota; bin counts match ceil(total_tokens / capacity) bounds."""
    from recommender_systems_pyspark_spark.functions.pipeline import (
        _PACK_CAPACITY,
        _QUOTA_PER_LANG,
        x_tokens_e2e,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    rows = x_tokens_e2e(spark, sf_dir).collect()
    assert rows
    n_train = (
        load_table(spark, sf_dir, "documents")
        .where("doc_id % 97 <> 0")
        .count()
    )
    assert sum(r.n_in for r in rows) == n_train
    by_lang: dict[str, int] = {}
    for r in rows:
        assert r.n_in == r.n_contaminated + r.n_quota_dropped + r.n_packed
        by_lang[r.lang] = by_lang.get(r.lang, 0) + r.n_packed
        if r.n_packed == 0:
            assert r.n_bins == 0 and r.total_tokens == 0
        else:
            # concat-and-chunk: bins are contiguous starting at 0
            assert 1 <= r.n_bins <= r.total_tokens // _PACK_CAPACITY + 1
    for lang, packed in by_lang.items():
        assert packed <= _QUOTA_PER_LANG, f"{lang}: quota exceeded"
