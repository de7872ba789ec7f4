"""Tests for the late-round-4 warehouse/graph operators: SCD2 history,
CDC merge, range frames, salted join, Bloom semi-prune, PageRank, and the
streaming dedup face. Property-style where the oracle fixtures are thin:
each operator is checked against an independent reformulation, not just
against itself."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from recommender_systems_pyspark_spark.functions.pagerank import (
    _SCALE,
    pagerank_scaled,
    x_pagerank,
)
from recommender_systems_pyspark_spark.functions.warehouse import (
    bloom_prune,
    x_merge_upsert,
    x_range_frame_trailing,
    x_scd2_history,
)
from recommender_systems_pyspark_spark.operators.skew import salted_join
from recommender_systems_pyspark_spark.sources import tables

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

def test_scd2_intervals_tile_each_user(spark):
    """Per user: versions are 1..k, exactly one open row, and each closed
    interval's valid_to equals the next version's valid_from (half-open
    tiling with no gaps or overlaps)."""
    hist = x_scd2_history(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type  # runs are maximal


def test_scd2_replays_latest_state(spark):
    """The open (is_current) row per user must carry the event_type of the
    user's latest event — SCD2's 'current view' equals the overwrite view."""
    ev = tables(spark, SF)["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = {
        r.user_id: r.event_type
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    current = {
        r.user_id: r.event_type
        for r in x_scd2_history(spark, SF).where("is_current").collect()
    }
    assert current == latest


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------

def test_merge_upsert_key_algebra(spark):
    """Row-count algebra: |result| = |snapshot| - |deletes| + |inserts|;
    deleted keys absent, inserted keys present, updated rows changed."""
    orders = tables(spark, SF)["orders"]
    n = orders.count()
    n_del = orders.where("o_orderkey % 100 = 7").count()
    n_ins = orders.where("o_orderkey % 100 = 42").count()
    merged = x_merge_upsert(spark, SF)
    assert merged.count() == n - n_del + n_ins
    assert merged.where("o_orderkey % 100 = 7 AND o_orderkey < 100000000").count() == 0
    assert merged.where("o_orderstatus = 'N'").count() == n_ins
    upd = merged.where("o_orderstatus = 'U'")
    assert upd.count() == orders.where("o_orderkey % 100 IN (11, 23)").count()
    # updates added exactly 100.00 to each touched price
    joined = upd.alias("m").join(
        orders.alias("o"), F.col("m.o_orderkey") == F.col("o.o_orderkey")
    )
    bad = joined.where(
        F.abs(F.col("m.o_totalprice") - F.col("o.o_totalprice") - 100.0) > 1e-6
    )
    assert bad.count() == 0


def test_merge_upsert_is_idempotent_on_keys(spark):
    """Merged table keeps o_orderkey unique (MERGE is keyed, not append)."""
    merged = x_merge_upsert(spark, SF)
    assert merged.count() == merged.select("o_orderkey").distinct().count()


# ---------------------------------------------------------------------------
# RANGE frame
# ---------------------------------------------------------------------------

def test_range_frame_matches_self_join(spark):
    """Trailing 30-day window ≡ the quadratic self-join definition
    (blocked per customer) — checked exhaustively at smoke scale."""
    got = {
        r.o_orderkey: (r.trailing_cnt, round(r.trailing_sum, 4))
        for r in x_range_frame_trailing(spark, SF).collect()
    }
    o = tables(spark, SF)["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    want_df = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.d") <= F.col("a.d"))
            & (F.col("b.d") >= F.col("a.d") - 30),
        )
        .groupBy(F.col("a.o_orderkey").alias("k"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("b.o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("s"),
        )
    )
    want = {r.k: (r.cnt, round(r.s, 4)) for r in want_df.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Salted join
# ---------------------------------------------------------------------------

def test_salted_join_multiplicity_on_skew(spark):
    """On a deliberately skewed fact (90% of rows share one key) the
    salted join returns the exact multiset of the plain join, for inner
    and for left (including unmatched fact rows)."""
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
    )
    for how in ("inner", "left"):
        plain = fact.join(dim, "k", how).groupBy("k").count()
        salted = salted_join(fact, dim, on="k", salt_buckets=5, how=how).groupBy("k").count()
        p = {r.k: r["count"] for r in plain.collect()}
        s = {r.k: r["count"] for r in salted.collect()}
        assert p == s, how


# ---------------------------------------------------------------------------
# Bloom prune
# ---------------------------------------------------------------------------

def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    keys = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    probe = spark.range(20000).select((F.col("id") % 5000).alias("pk"), "id")
    pruned = bloom_prune(probe, "pk", keys)
    # every true match survives
    true_matches = probe.join(
        keys.withColumnRenamed("k", "pk"), "pk", "left_semi"
    ).count()
    surviving_true = pruned.join(
        keys.withColumnRenamed("k", "pk"), "pk", "left_semi"
    ).count()
    assert surviving_true == true_matches
    # false positives exist only below a sane bound (m=2^20, n=715, k=3
    # → FP ≈ 1e-8; allow slack of 1% of the probe)
    assert pruned.count() <= true_matches + probe.count() // 100


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def test_pagerank_conserves_mass_and_ranks_hub_first(spark):
    """Star graph (hub 0 ↔ spokes 1..10, symmetric): the hub must rank
    first, spokes tie; total mass stays within the truncation budget of
    ONE _SCALE unit per node per iteration."""
    spokes = list(range(1, 11))
    edges = spark.createDataFrame(
        [(0, s) for s in spokes] + [(s, 0) for s in spokes], "src long, dst long"
    )
    ranked = pagerank_scaled(edges, iters=5).collect()
    ranks = {r.node: r["rank"] for r in ranked}
    assert max(ranks, key=ranks.get) == 0
    assert len({ranks[s] for s in spokes}) == 1  # symmetric spokes tie exactly
    total = sum(ranks.values())
    n = len(ranks)
    assert total <= _SCALE
    # each node loses < 1 unit to each of: init floor, contrib floor, damp floor
    assert total >= _SCALE - 3 * n * 6


def test_pagerank_query_shape(spark):
    df = x_pagerank(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= 25
    scores = [r.rank_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(abs(r.rank_score - r.rank_scaled / _SCALE) < 1e-15 for r in rows)


# ---------------------------------------------------------------------------
# Z-order
# ---------------------------------------------------------------------------

def test_zorder_key_is_a_morton_interleave(spark):
    """Python-replica check of the bit interleave, plus the locality
    property data skipping relies on: sorting by zval bounds BOTH
    dimensions' spread inside each equal-size chunk far tighter than a
    1-D sort bounds its secondary dimension."""
    from recommender_systems_pyspark_spark.functions.warehouse import x_zorder_key

    rows = x_zorder_key(spark, SF).collect()

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows[:200]:
        assert r.zval == morton(r.o_custkey & 0xFFFF, r.order_day & 0xFFFF)

    by_z = sorted(rows, key=lambda r: r.zval)
    by_cust = sorted(rows, key=lambda r: r.o_custkey)
    chunk = max(1, len(rows) // 16)

    def day_spread(ordering):
        spreads = []
        for i in range(0, len(ordering), chunk):
            c = ordering[i : i + chunk]
            spreads.append(max(x.order_day for x in c) - min(x.order_day for x in c))
        return sum(spreads) / len(spreads)

    # z-order chunks must localize order_day; a pure customer sort cannot
    assert day_spread(by_z) < day_spread(by_cust)


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

def test_bm25_matches_python_replica(spark):
    """Exact python replay of the BM25 scoring (rational idf, k1/b
    saturation, decimal-quantized term sums) over the smoke corpus."""
    from decimal import Decimal, ROUND_HALF_UP

    from recommender_systems_pyspark_spark.functions.search import (
        _B,
        _K1,
        _QUERY_TERMS,
        _TOP_K,
        x_bm25_topk,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in tables(spark, SF)["documents"].collect()
    }
    n_docs = len(docs)
    avgdl = float(sum(len(t) for t in docs.values())) / n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, toks in docs.items():
        for t in toks:
            if t in _QUERY_TERMS:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores: dict[int, Decimal] = {}
    matched: dict[int, int] = {}
    for (d, t), f in tf.items():
        idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
        s = idf * (f * (_K1 + 1)) / (f + _K1 * ((1 - _B) + _B * len(docs[d]) / avgdl))
        # replicate Spark's double→decimal cast (exact binary value, not repr)
        q = Decimal(s).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        scores[d] = scores.get(d, Decimal(0)) + q
        matched[d] = matched.get(d, 0) + 1
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
    got = x_bm25_topk(spark, SF).collect()
    assert [r.doc_id for r in got] == [d for d, _ in want]
    for r in got:
        assert r.n_terms_matched == matched[r.doc_id]
        assert abs(r.score - float(scores[r.doc_id])) < 1e-12


# ---------------------------------------------------------------------------
# Basket mining / expectations / funnel / transitions
# ---------------------------------------------------------------------------

def test_fpgrowth_pairs_bounded_by_singles(spark):
    """Anti-monotonicity: every frequent pair's support <= the support of
    each of its items (Apriori property), and all supports >= minCount."""
    import math

    from recommender_systems_pyspark_spark.ml.basket import (
        _MIN_SUPPORT,
        x_fpgrowth_itemsets,
    )

    rows = x_fpgrowth_itemsets(spark, SF).collect()
    assert rows
    li = tables(spark, SF)["lineitem"].select("l_orderkey", "l_partkey").distinct()
    n_txn = li.select("l_orderkey").distinct().count()
    min_count = math.ceil(_MIN_SUPPORT * n_txn)
    singles = {r.itemset: r.freq for r in rows if r.k == 1}
    for r in rows:
        assert r.freq >= min_count
        if r.k == 2:
            a, b = r.itemset.split(",")
            assert r.freq <= singles.get(a, 0) and r.freq <= singles.get(b, 0)


def test_expectations_pass_on_clean_fixture(spark):
    from recommender_systems_pyspark_spark.operators.expectations import (
        x_expectations_orders,
    )

    rows = {r.constraint_name: r for r in x_expectations_orders(spark, SF).collect()}
    assert len(rows) == 6
    for name, r in rows.items():
        assert r.passed and r.violations == 0, name


def test_funnel_steps_are_monotone(spark):
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        x_funnel_steps,
    )

    [r] = x_funnel_steps(spark, SF).collect()
    assert r.users_viewed >= r.users_clicked_after_view >= r.users_purchased_after_click
    assert r.users_viewed > 0


def test_event_transitions_rows_normalize(spark):
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        x_event_transitions,
    )

    rows = x_event_transitions(spark, SF).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0 < r.p <= 1
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-9, prev


def test_session_paths_shapes(spark):
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        x_session_paths,
    )

    rows = x_session_paths(spark, SF).collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        parts = r.path.split(",")
        assert 1 <= len(parts) <= 3
        assert set(parts) <= types


# ---------------------------------------------------------------------------
# HLL sketch mergeability
# ---------------------------------------------------------------------------

def test_hll_sketches_merge_across_shards(spark):
    """The sketch union over per-shard sketches must estimate the SAME
    cardinality as one sketch over the concatenated data (mergeability —
    what lets incremental pipelines avoid rescans), and land within HLL
    error of the exact count."""
    from recommender_systems_pyspark_spark.operators.aggregates_ext import (
        distinct_sketch,
        merge_distinct_sketches,
    )

    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("shard"), (F.col("id") % 13_177).alias("v")
    )
    per_shard = distinct_sketch(df, "v", "shard")
    [merged] = merge_distinct_sketches(per_shard).collect()
    [direct] = (
        distinct_sketch(df, "v")
        .select(F.expr("hll_sketch_estimate(sketch)").alias("estimate"))
        .collect()
    )
    exact = 13_177
    assert abs(merged.estimate - exact) / exact < 0.05
    assert abs(direct.estimate - exact) / exact < 0.05


def test_new_ops_handle_empty_inputs(spark):
    """Degenerate-input hardening: empty graphs/build-sides/streams must
    produce empty (or full-pass) results, not crashes."""
    from recommender_systems_pyspark_spark.functions.pagerank import pagerank_scaled

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_scaled(empty_edges, iters=2).count() == 0

    # bloom prune with an EMPTY build side: no key can match — every
    # probe row must be dropped (no-false-negative still holds trivially)
    probe = spark.range(100).select(F.col("id").alias("pk"))
    no_keys = spark.createDataFrame([], "k long")
    assert bloom_prune(probe, "pk", no_keys).count() == 0


def test_ohlc_bars_invariants(spark):
    """low <= open,close <= high per bar; volumes positive; bar keys unique."""
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        x_ohlc_bars,
    )

    rows = x_ohlc_bars(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        key = (r.event_type, r.bar_start)
        assert key not in seen
        seen.add(key)
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.n_events >= 1


def test_incremental_rollup_equals_direct(spark):
    from recommender_systems_pyspark_spark.operators.rollup_tree import (
        x_incremental_rollup,
    )

    got = {
        (r.month, r.o_orderstatus): (r.n_orders, round(r.revenue, 4))
        for r in x_incremental_rollup(spark, SF).collect()
    }
    o = tables(spark, SF)["orders"]
    direct = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"), "o_orderstatus"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("rev"),
        )
        .collect()
    )
    want = {(r.month, r.o_orderstatus): (r.n, round(r.rev, 4)) for r in direct}
    assert got == want


def test_strict_funnel_bounded_by_loose(spark):
    from recommender_systems_pyspark_spark.functions.events_analytics import (
        x_funnel_steps,
        x_funnel_strict,
    )

    [loose] = x_funnel_steps(spark, SF).collect()
    [strict] = x_funnel_strict(spark, SF).collect()
    assert strict.users_viewed == loose.users_viewed
    assert strict.users_clicked_after_view == loose.users_clicked_after_view
    # the strict path is a subset of the loose one
    assert strict.users_strict_funnel <= loose.users_purchased_after_click


def test_mom_growth_consistent(spark):
    from recommender_systems_pyspark_spark.operators.rollup_tree import x_mom_growth

    rows = x_mom_growth(spark, SF).collect()
    assert rows[0].prev_revenue is None and rows[0].mom_growth is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur.prev_revenue == prev.revenue
        assert abs(cur.mom_growth - (cur.revenue - prev.revenue) / prev.revenue) < 1e-12


def test_chi2_contingency_margins(spark):
    """Observed totals and expected totals must both sum to n (the
    algebraic identity of the independence model), and every
    contribution must be non-negative."""
    from recommender_systems_pyspark_spark.operators.stats import (
        a19_chi2_contingency,
    )

    rows = a19_chi2_contingency(spark, SF).collect()
    assert rows
    n_obs = sum(r.observed for r in rows)
    n_exp = sum(r.expected for r in rows)
    assert abs(n_exp - n_obs) < 1e-6
    assert all(r.chi2_contrib >= 0 for r in rows)


def test_pareto_frontier_is_undominated_and_complete(spark):
    """No frontier order is dominated; every non-frontier order IS
    dominated (strictly better price at an earlier-or-equal date,
    with the (date, key) tie rule) — checked brute-force at smoke scale."""
    from recommender_systems_pyspark_spark.functions.warehouse import (
        x_pareto_frontier,
    )

    t = tables(spark, SF)
    orders = (
        t["orders"]
        .join(
            t["customer"].select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    by_seg: dict[str, list] = {}
    for r in orders:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    frontier = {
        (r.segment, r.o_orderkey) for r in x_pareto_frontier(spark, SF).collect()
    }
    for seg, rows in by_seg.items():
        for r in rows:
            dominated = any(
                (o.o_orderdate, o.o_orderkey) < (r.o_orderdate, r.o_orderkey)
                and o.o_totalprice >= r.o_totalprice
                for o in rows
            )
            assert ((seg, r.o_orderkey) in frontier) == (not dominated), (
                seg,
                r.o_orderkey,
            )


def test_scd2_asof_covers_every_user_once(spark):
    from recommender_systems_pyspark_spark.functions.warehouse import x_scd2_asof

    rows = x_scd2_asof(spark, SF).collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))
    ev_users = {
        r.user_id
        for r in tables(spark, SF)["events"]
        .where("ts <= timestamp '2024-01-20 00:00:00'")
        .select("user_id")
        .distinct()
        .collect()
    }
    assert set(users) == ev_users


def test_ngram_novelty_first_doc_fully_novel(spark):
    """The lowest doc_id with any trigrams must be 100% novel; novelty is
    a fraction in (0, 1]; and total novel trigrams across docs equals the
    distinct trigram vocabulary (each trigram is novel exactly once)."""
    from recommender_systems_pyspark_spark.functions.corpus import x_ngram_novelty

    rows = x_ngram_novelty(spark, SF).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty == 1.0 and first.n_novel == first.n_ngrams
    for r in rows:
        assert 0 <= r.n_novel <= r.n_ngrams
        assert abs(r.novelty - r.n_novel / r.n_ngrams) < 1e-12
    docs = tables(spark, SF)["documents"].select("doc_id", "text")
    vocab = (
        docs.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(text, ' ')) - 3), "
                    "i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == vocab
