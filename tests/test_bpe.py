"""BPE trainer tests: exact equivalence with a pure-Python replica of the
same greedy algorithm (word-frequency weighting, (count, left, right)
tie-break, left-to-right non-overlapping merge fold)."""

from __future__ import annotations

from collections import Counter

from recommender_systems_pyspark_spark.functions.bpe import (
    _BPE_MERGES,
    _EOW,
    bpe_encode,
    bpe_train,
    word_table,
)
from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.sources import tables


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference implementation (Sennrich-style, matching bpe.py)."""
    vocab = {w: list(w) + [_EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max by (count, left, right) — identical tie-break to Spark's
        # orderBy(count desc, l, r).limit(1): highest count, then LOWEST
        # (l, r) lexicographically
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((l, r, c))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_python_replica(spark, sf_dir):
    docs = tables(spark, sf_dir)["documents"]
    wc = {r.word: r.cnt for r in word_table(docs).collect()}
    py_merges, py_vocab = _py_bpe(wc, _BPE_MERGES)

    merges = bpe_train(docs)
    assert merges == py_merges

    enc = {r.word: list(r.syms) for r in bpe_encode(docs, merges).collect()}
    assert enc == py_vocab


def test_bpe_query_shape_and_compression(spark, sf_dir):
    out = all_queries()["x_bpe_train"].fn(spark, sf_dir).collect()
    assert out, "corpus must yield at least one merge"
    assert [r.step for r in out] == list(range(1, len(out) + 1))
    # every merge must have been worth learning
    assert all(r.pair_count >= 2 for r in out)
    # chars+eow per word starts well above the encoded average
    docs = tables(spark, sf_dir)["documents"]
    wc = {r.word: (r.cnt, len(r.word) + 1) for r in word_table(docs).collect()}
    total = sum(c for c, _ in wc.values())
    raw_avg = sum(c * n for c, n in wc.values()) / total
    assert 1.0 <= out[0].avg_syms_per_word < raw_avg
