"""Round-4 operator tests: the distributed two-phase rank primitive
(equivalence with the single-partition window forms it replaces, across
edge cases the oracle fixtures don't hit) and the composed corpus-curation
funnel's stage-monotonicity invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.operators.ranking import (
    with_global_ntile,
    with_global_row_number,
)


def _rand_df(spark, n: int, seed: int = 7):
    # collisions in `v` on purpose: the unique-id tiebreaker must resolve them
    return spark.range(n).select(
        F.col("id"), (F.xxhash64(F.col("id") + seed) % 50).alias("v")
    )


@pytest.mark.parametrize("n_rows,n_parts", [(0, 4), (1, 4), (17, 4), (1000, 8), (5, 64)])
def test_global_row_number_matches_window(spark, n_rows, n_parts):
    df = _rand_df(spark, n_rows)
    order = [F.col("v").desc(), F.col("id")]
    got, total = with_global_row_number(df, order, alias="rn", n_parts=n_parts)
    assert total == n_rows
    want = df.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rn")
    )
    g = {r.id: r.rn for r in got.collect()}
    w = {r.id: r.rn for r in want.collect()}
    assert g == w


@pytest.mark.parametrize("n_rows,n", [(17, 4), (16, 4), (3, 7), (1000, 3), (1, 1)])
def test_global_ntile_matches_window_ntile(spark, n_rows, n):
    df = _rand_df(spark, n_rows, seed=13)
    order = [F.col("v"), F.col("id")]
    got = with_global_ntile(df, n, order, "t", n_parts=4)
    want = df.select("id", F.ntile(n).over(Window.orderBy(*order)).alias("t"))
    g = {r.id: r.t for r in got.collect()}
    w = {r.id: r.t for r in want.collect()}
    assert g == w


def test_corpus_e2e_funnel_is_monotone(spark, sf_dir):
    """A later-stage keep implies every earlier stage passed: final_keep ⊆
    exact_keep ⊆ (gopher ∧ logit ∧ ¬repetitive). And the curated corpus is
    nonempty at fixture scale (the funnel isn't vacuously green)."""
    from recommender_systems_pyspark_spark.functions.corpus import x_corpus_e2e

    rows = x_corpus_e2e(spark, sf_dir).collect()
    assert rows
    n_final = 0
    for r in rows:
        q = r.gopher_keep and r.logit_keep and not r.repetitive
        assert not r.exact_keep or q, f"exact_keep without quality pass: {r}"
        assert not r.final_keep or r.exact_keep, f"final_keep without exact_keep: {r}"
        n_final += int(r.final_keep)
    assert 0 < n_final < len(rows)


def test_global_rank_is_total_permutation(spark, sf_dir):
    from recommender_systems_pyspark_spark.registry import all_queries

    df = all_queries()["x_global_rank"].fn(spark, sf_dir)
    ranks = [r.rank for r in df.collect()]
    assert ranks == list(range(1, len(ranks) + 1))
