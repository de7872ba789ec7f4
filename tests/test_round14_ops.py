"""Round-14 operators: mergeable quantile/KMV sketch rollups, ECE
calibration, the full-outer funnel join face, and the session-memo
eviction contract (ADVICE r13 #2)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


def _rows(df):
    return [r.asDict() for r in df.collect()]


# ---------------------------------------------------------------------------
# x_quantile_rollup_merge
# ---------------------------------------------------------------------------


def test_quantile_rollup_est_within_one_bin_width(spark):
    from recommender_systems_pyspark_spark.operators.stats import (
        x_quantile_rollup_merge,
    )

    out = _rows(x_quantile_rollup_merge(spark, SF_ORACLE))
    assert out, "no day rows"
    for r in out:
        # the exact statistic lies inside the estimated bin by construction
        assert r["p50_err_div_width"] == 0, r
        assert r["p95_err_div_width"] == 0, r
        assert r["est_p50_cents"] <= r["exact_p50_cents"]
        assert r["est_p95_cents"] <= r["exact_p95_cents"]
        assert r["n_hour_sketches"] <= 24


def test_quantile_rollup_matches_python_replay(spark):
    """Exact p50/p95 and the histogram estimate replayed in plain python
    from the raw parquet for every day at smoke scale."""
    import duckdb

    from recommender_systems_pyspark_spark.operators.stats import (
        _QSK_WIDTH_CENTS,
        x_quantile_rollup_merge,
    )

    raw = duckdb.sql(
        f"SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,"
        f" CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents"
        f" FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    by_day: dict[str, list[int]] = {}
    for day, cents in raw:
        by_day.setdefault(day, []).append(cents)
    got = {r["day"]: r for r in _rows(x_quantile_rollup_merge(spark, SF_SMOKE))}
    assert set(got) == set(by_day)
    for day, vals in by_day.items():
        vals.sort()
        n = len(vals)
        for q, ecol, xcol in ((50, "est_p50_cents", "exact_p50_cents"),
                              (95, "est_p95_cents", "exact_p95_cents")):
            rank = (n * q + 99) // 100
            exact = vals[rank - 1]
            assert got[day][xcol] == exact, (day, q)
            assert got[day][ecol] == (exact // _QSK_WIDTH_CENTS) * _QSK_WIDTH_CENTS


# ---------------------------------------------------------------------------
# x_kmv_rollup_merge
# ---------------------------------------------------------------------------


def test_kmv_two_tier_merge_equals_direct_bottom_k(spark):
    """The mergeability theorem, replayed in python: the day-level
    bottom-k of the hour sketches' union equals the bottom-k computed
    directly over the day's distinct users."""
    import duckdb

    from recommender_systems_pyspark_spark.operators.stats import (
        _KMV_ROLLUP_K,
        x_kmv_rollup_merge,
    )

    raw = duckdb.sql(
        f"SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id"
        f" FROM '{SF_ORACLE}/events.parquet'"
    ).fetchall()
    by_day: dict[str, set[int]] = {}
    for day, uid in raw:
        by_day.setdefault(day, set()).add(uid)
    got = {r["day"]: r for r in _rows(x_kmv_rollup_merge(spark, SF_ORACLE))}
    assert set(got) == set(by_day)
    for day, users in by_day.items():
        ranked = sorted(
            (hashlib.md5(str(u).encode()).hexdigest(), u) for u in users
        )[:_KMV_ROLLUP_K]
        xor = 0
        for _, u in ranked:
            xor ^= u
        assert got[day]["k_used"] == len(ranked)
        assert got[day]["sample_xor"] == xor, day
        assert got[day]["kth_hash60"] == int(ranked[-1][0][:15], 16)
        assert got[day]["exact_distinct"] == len(users)
        assert got[day]["err_gt_100pct"] == 0


def test_kmv_underfull_sketch_is_exact(spark):
    """At smoke scale some days hold fewer distinct users than K: the
    sketch is then the exhaustive set and est must EQUAL exact."""
    from recommender_systems_pyspark_spark.operators.stats import (
        _KMV_ROLLUP_K,
        x_kmv_rollup_merge,
    )

    rows = _rows(x_kmv_rollup_merge(spark, SF_SMOKE))
    underfull = [r for r in rows if r["k_used"] < _KMV_ROLLUP_K]
    assert underfull, "smoke fixture should have at least one underfull day"
    for r in underfull:
        assert r["est_distinct"] == r["exact_distinct"] == r["k_used"]


# ---------------------------------------------------------------------------
# x_ece_calibration
# ---------------------------------------------------------------------------


def test_ece_bins_partition_the_corpus_and_terms_sum_to_ece(spark):
    from recommender_systems_pyspark_spark.functions.strata import (
        x_ece_calibration,
    )
    from recommender_systems_pyspark_spark.sources import tables

    rows = _rows(x_ece_calibration(spark, SF_ORACLE))
    n_docs_total = (
        tables(spark, SF_ORACLE)["documents"]
        .where(F.length("text") > 0)
        .count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    assert all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r["avg_conf"] <= 1.0
        assert 0.0 <= r["keep_rate"] <= 1.0
        assert abs(r["abs_gap"] - abs(r["avg_conf"] - r["keep_rate"])) < 1e-12
        # mean confidence must lie inside the bin's value range
        lo, hi = r["bin"] / 10.0, (r["bin"] + 1) / 10.0 if r["bin"] < 9 else 1.0
        assert lo - 1e-9 <= r["avg_conf"] <= hi + 1e-9
    ece = sum(r["ece_term"] for r in rows)
    manual = (
        sum(r["abs_gap"] * r["n_docs"] for r in rows) / n_docs_total
    )
    assert abs(ece - manual) < 1e-12
    assert 0.0 <= ece <= 1.0


# ---------------------------------------------------------------------------
# s21_view_click_full — batch-face algebra against the other join modes
# ---------------------------------------------------------------------------


def test_full_outer_funnel_is_inner_plus_both_null_extensions(spark):
    from recommender_systems_pyspark_spark.streaming.joins import (
        s6_view_click_funnel,
        s20_view_click_semi,
        s21_view_click_full,
    )
    from recommender_systems_pyspark_spark.sources import load_table

    full = _rows(s21_view_click_full(spark, SF_SMOKE))
    inner = _rows(s6_view_click_funnel(spark, SF_SMOKE))
    semi = _rows(s20_view_click_semi(spark, SF_SMOKE))
    ev = load_table(spark, SF_SMOKE, "events")
    n_views = ev.where(F.col("event_type") == "view").count()
    n_clicks = ev.where(F.col("event_type") == "click").count()

    matched = [r for r in full if r["view_id"] is not None and r["click_id"] is not None]
    null_clicks = [r for r in full if r["click_id"] is None]
    null_views = [r for r in full if r["view_id"] is None]
    # matched rows ARE the inner join
    assert {(r["view_id"], r["click_id"]) for r in matched} == {
        (r["view_id"], r["click_id"]) for r in inner
    }
    # unconverted views = views minus the semi (converted) set
    assert len(null_clicks) == n_views - len(semi)
    # every click appears: matched distinct + orphans = all clicks
    matched_clicks = {r["click_id"] for r in matched}
    assert len(matched_clicks) + len(null_views) == n_clicks
    # no row loses both sides
    assert all(r["view_id"] is not None or r["click_id"] is not None for r in full)
    assert all(r["user_id"] is not None for r in full)


# ---------------------------------------------------------------------------
# session_memo eviction (ADVICE r13 #2)
# ---------------------------------------------------------------------------


def test_session_memo_evicts_dead_session_keys(spark):
    from recommender_systems_pyspark_spark.memo import session_memo

    memo: dict[tuple, str] = {
        ("dead-app-1", "x"): "stale1",
        ("dead-app-2", "y"): "stale2",
    }
    got = session_memo(memo, spark, ("k",), lambda: "fresh")
    assert got == "fresh"
    app = spark.sparkContext.applicationId
    assert set(memo) == {(app, "k")}, "stale-session keys must be evicted"
    # second call: cache hit, no rebuild
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return "rebuilt"

    assert session_memo(memo, spark, ("k",), build) == "fresh"
    assert calls["n"] == 0


def test_ktruss_wedge_counts_reuse_memoized_peel(spark):
    """ADVICE r13 #3: the instrumentation must not replay the peel —
    after x_ktruss_peel runs, ktruss_round_wedge_counts reuses the
    memoized round frames, and both report consistent round structure."""
    from recommender_systems_pyspark_spark.functions.pagerank import (
        _KTRUSS_ROUNDS,
        ktruss_round_wedge_counts,
        x_ktruss_peel,
    )

    peel = {r["round"]: r for r in _rows(x_ktruss_peel(spark, SF_SMOKE))}
    wedges = ktruss_round_wedge_counts(spark, SF_SMOKE)
    assert set(wedges) == {f"round{r}" for r in range(_KTRUSS_ROUNDS + 1)}
    # wedge volume is monotonically non-increasing as edges peel away
    vals = [wedges[f"round{r}"] for r in range(_KTRUSS_ROUNDS + 1)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    # edge counts shrink (or hold) each round too — peel invariant
    edges = [peel[r]["n_edges"] for r in range(_KTRUSS_ROUNDS + 1)]
    assert all(a >= b for a, b in zip(edges, edges[1:]))


# ---------------------------------------------------------------------------
# x_bpe_fertility
# ---------------------------------------------------------------------------


def test_bpe_fertility_consistent_with_per_doc_encode(spark):
    """Per-language sums must reconcile with the per-document encode face
    (same merges, same corpus), and each word yields >= 1 token."""
    from recommender_systems_pyspark_spark.functions.bpe import (
        x_bpe_encode,
        x_bpe_fertility,
    )

    fert = _rows(x_bpe_fertility(spark, SF_SMOKE))
    enc = _rows(x_bpe_encode(spark, SF_SMOKE))
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in enc)
    assert sum(r["n_tokens"] for r in fert) == sum(r["n_tokens"] for r in enc)
    for r in fert:
        assert r["n_tokens"] >= r["n_words"]
        assert r["fertility_ppm"] >= 1_000_000
        assert r["fertility_ppm"] == r["n_tokens"] * 1_000_000 // r["n_words"]
        assert r["chars_per_token_ppm"] == r["n_chars"] * 1_000_000 // r["n_tokens"]


# ---------------------------------------------------------------------------
# x_dedup_source_priority
# ---------------------------------------------------------------------------


def test_source_priority_election_matches_python_replay(spark):
    import duckdb

    from recommender_systems_pyspark_spark.functions.dedup import (
        x_dedup_source_priority,
    )

    raw = duckdb.sql(
        f"SELECT doc_id, source, lower(trim(text)) AS t"
        f" FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    clusters: dict[str, list[tuple[int, int, str]]] = {}
    for doc_id, source, t in raw:
        h = hashlib.sha256(t.encode()).hexdigest()
        clusters.setdefault(h, []).append((int(source[3:]), doc_id, source))
    per_src: dict[str, dict[str, int]] = {}
    for members in clusters.values():
        keeper = min(members)
        for prio, doc_id, source in members:
            s = per_src.setdefault(
                source,
                {"n_docs": 0, "n_kept": 0, "n_lost_cross": 0, "kept_xor": 0},
            )
            s["n_docs"] += 1
            if (prio, doc_id, source) == keeper:
                s["n_kept"] += 1
                s["kept_xor"] ^= doc_id
            elif keeper[2] != source:
                s["n_lost_cross"] += 1
    got = {r["source"]: r for r in _rows(x_dedup_source_priority(spark, SF_SMOKE))}
    assert set(got) == set(per_src)
    for src, exp in per_src.items():
        g = got[src]
        assert g["n_docs"] == exp["n_docs"], src
        assert g["n_kept"] == exp["n_kept"], src
        assert g["n_dropped"] == exp["n_docs"] - exp["n_kept"], src
        assert g["n_lost_cross_source"] == exp["n_lost_cross"], src
        assert g["kept_xor"] == exp["kept_xor"], src
    # conservation: one keeper per content cluster
    assert sum(r["n_kept"] for r in got.values()) == len(clusters)


# ---------------------------------------------------------------------------
# x_auc_rank
# ---------------------------------------------------------------------------


def test_auc_rank_matches_pair_counting_replay(spark):
    """The windowed u2 accumulation must equal the literal tie-aware
    Mann-Whitney pair count 2·#(pos>neg) + #(pos==neg), per language and
    for the 'ALL' row (O(n²) replay is fine at smoke scale)."""
    import collections

    from recommender_systems_pyspark_spark.functions.strata import (
        conf_scored_docs,
        x_auc_rank,
    )

    by_lang = collections.defaultdict(list)
    for r in _rows(conf_scored_docs(spark, SF_SMOKE)):
        by_lang[r["lang"]].append((r["ref_keep"], r["conf_ppm"]))
        by_lang["ALL"].append((r["ref_keep"], r["conf_ppm"]))
    got = {r["lang"]: r for r in _rows(x_auc_rank(spark, SF_SMOKE))}
    assert set(got) == set(by_lang)
    for lang, items in by_lang.items():
        pos = [c for keep, c in items if keep]
        neg = [c for keep, c in items if not keep]
        u2 = sum(2 * (p > n) + (p == n) for p in pos for n in neg)
        g = got[lang]
        assert g["n_pos"] == len(pos) and g["n_neg"] == len(neg), lang
        assert g["u2"] == u2, lang
        if pos and neg:
            assert g["auc_ppm"] == (1_000_000 * u2) // (2 * len(pos) * len(neg))
            assert 0 <= g["auc_ppm"] <= 1_000_000
        else:
            assert g["auc_ppm"] is None


# ---------------------------------------------------------------------------
# x_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_matches_python_replay(spark):
    """The deterministic Poisson-bootstrap is a pure function of
    (doc_id, replicate): replay the md5 weight draws and the rank-based
    endpoints in plain python and compare every column."""
    import duckdb

    from recommender_systems_pyspark_spark.operators.stats import (
        _BOOT_REPS,
        x_bootstrap_ci,
    )

    raw = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    acc: dict[str, dict] = {}
    for source, doc_id, n_chars in raw:
        s = acc.setdefault(
            source,
            {
                "n_docs": 0,
                "sum_chars": 0,
                "wsum": [0] * _BOOT_REPS,
                "wn": [0] * _BOOT_REPS,
            },
        )
        s["n_docs"] += 1
        s["sum_chars"] += n_chars
        for r in range(_BOOT_REPS):
            h = hashlib.md5(f"{doc_id}:{r}".encode()).hexdigest()
            wt = sum(1 for k in range(4) if h[k] in "0123")
            s["wsum"][r] += wt
            s["wn"][r] += wt * n_chars
    got = {r["source"]: r for r in _rows(x_bootstrap_ci(spark, SF_SMOKE))}
    assert set(got) == set(acc)
    for source, exp in acc.items():
        g = got[source]
        means = sorted(
            exp["wn"][r] / exp["wsum"][r] for r in range(_BOOT_REPS)
        )
        assert g["n_docs"] == exp["n_docs"]
        assert g["sum_chars"] == exp["sum_chars"]
        assert g["sum_wsum"] == sum(exp["wsum"])
        assert g["sum_wn"] == sum(exp["wn"])
        assert g["boot_lo"] == means[1]
        assert g["boot_hi"] == means[_BOOT_REPS - 2]
        assert g["boot_lo"] <= g["boot_hi"]
        mean = exp["sum_chars"] / exp["n_docs"]
        assert g["covers_mean"] == (g["boot_lo"] <= mean <= g["boot_hi"])
        # a sane bootstrap at this n almost surely covers; flag if not
        assert g["covers_mean"], f"{source}: CI misses the exact mean"


# ---------------------------------------------------------------------------
# x_dp_bounded_contribution
# ---------------------------------------------------------------------------


def test_dp_bounded_contribution_replay_and_sensitivity(spark):
    """Replay the L0/L∞ bounding in python and assert (a) every column
    matches, (b) noise lies in the truncated support, and (c) the DP
    guarantee's premise holds mechanically: no single user contributes
    more than T·C to the bounded histogram."""
    import collections

    import duckdb

    from recommender_systems_pyspark_spark.operators.expectations import (
        _DPU_BOUND,
        _DPU_C,
        _DPU_SENS,
        _DPU_T,
        x_dp_bounded_contribution,
    )

    raw = duckdb.sql(
        f"SELECT user_id, event_type, COUNT(*) FROM"
        f" '{SF_SMOKE}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per_user: dict[int, list] = collections.defaultdict(list)
    for user_id, etype, n in raw:
        key = hashlib.md5(f"{user_id}:{etype}".encode()).hexdigest()
        per_user[user_id].append((key, etype, n))
    true_n = collections.Counter()
    n_users_kept = collections.Counter()
    raw_n = collections.Counter()
    n_user_types = collections.Counter()
    user_contrib = collections.Counter()
    for user_id, items in per_user.items():
        for rank, (_, etype, n) in enumerate(sorted(items), start=1):
            raw_n[etype] += n
            n_user_types[etype] += 1
            if rank <= _DPU_T:
                capped = min(n, _DPU_C)
                true_n[etype] += capped
                n_users_kept[etype] += 1
                user_contrib[user_id] += capped
    assert user_contrib and max(user_contrib.values()) <= _DPU_SENS
    got = {r["event_type"]: r for r in _rows(x_dp_bounded_contribution(spark, SF_SMOKE))}
    assert set(got) == set(raw_n)
    for etype, g in got.items():
        assert g["raw_n"] == raw_n[etype]
        assert g["n_user_types"] == n_user_types[etype]
        assert g["true_n"] == true_n[etype]
        assert g["n_users_kept"] == n_users_kept[etype]
        assert -_DPU_BOUND <= g["noise"] <= _DPU_BOUND
        assert g["released_n"] == max(g["true_n"] + g["noise"], 0)
        # bounding only ever removes signal
        assert g["true_n"] <= g["raw_n"]


# ---------------------------------------------------------------------------
# s22_stream_quantile_rollup
# ---------------------------------------------------------------------------


def test_stream_quantile_rollup_closure_and_estimator(spark):
    """The streamed sketch must cover exactly the watermark-closed hours,
    conserve counts, and place the exact rank statistic inside the
    estimated bin (err DIV width == 0) — replayed from the raw fixture."""
    import collections
    import datetime

    import duckdb

    from recommender_systems_pyspark_spark.operators.stats import (
        _QSK_WIDTH_CENTS,
    )
    from recommender_systems_pyspark_spark.streaming.chained_rollup import (
        s22_stream_quantile_rollup,
    )

    raw = duckdb.sql(
        f"SELECT ts, value FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    wm = max(ts for ts, _ in raw).replace(microsecond=0) - datetime.timedelta(
        minutes=53
    )
    per_hour = collections.defaultdict(list)
    for ts, value in raw:
        hour = ts.replace(minute=0, second=0, microsecond=0)
        if hour + datetime.timedelta(hours=1) <= wm:
            import math

            per_hour[hour].append(math.floor(value * 100 + 0.5))
    got = {r["hour"]: r for r in _rows(s22_stream_quantile_rollup(spark, SF_SMOKE))}
    assert set(got) == set(per_hour), "emitted hours != watermark-closed hours"
    for hour, cents in per_hour.items():
        g = got[hour]
        cents.sort()
        n = len(cents)
        assert g["n"] == n
        assert g["n_bins"] == len({c // _QSK_WIDTH_CENTS for c in cents})
        for p, est_col, exact_col in (
            (50, "est_p50_cents", "exact_p50_cents"),
            (95, "est_p95_cents", "exact_p95_cents"),
        ):
            exact = cents[(n * p + 99) // 100 - 1]
            assert g[exact_col] == exact
            assert g[est_col] == (exact // _QSK_WIDTH_CENTS) * _QSK_WIDTH_CENTS
        assert g["p50_err_div_width"] == 0 and g["p95_err_div_width"] == 0


# ---------------------------------------------------------------------------
# x_range_partition_balance
# ---------------------------------------------------------------------------


def test_range_partition_balance_partitions_everything_once(spark):
    """Python replay of the whole recipe: the deterministic sample, the
    rank-DISC boundary pick, the half-open interval assignment — and the
    audit invariants: buckets partition the table exactly (Σ n_rows = N,
    min/max inside [lo, hi)), shares sum to ~1e6."""
    import duckdb

    from recommender_systems_pyspark_spark.operators.ranking import (
        _register,  # noqa: F401  (module import registers the query)
    )
    from recommender_systems_pyspark_spark.registry import all_queries

    rows = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM '{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    import math

    cents = {k: math.floor(p * 100 + 0.5) for k, p in rows}
    smp = sorted(
        (cents[k], k)
        for k in cents
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 20 == 0
    )
    sn = len(smp)
    K = 8
    positions = sorted({max(1, (i * sn) // K) for i in range(1, K)})
    bounds = sorted({smp[p - 1][0] for p in positions})
    got = [
        r.asDict()
        for r in all_queries()["x_range_partition_balance"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    assert len(got) == len(bounds) + 1
    assert sum(r["n_rows"] for r in got) == len(cents)
    n = len(cents)
    nb = len(bounds) + 1
    for i, r in enumerate(got):
        lo = None if i == 0 else bounds[i - 1]
        hi = bounds[i] if i < len(bounds) else None
        assert r["lo"] == lo and r["hi"] == hi
        members = [
            c
            for c in cents.values()
            if (lo is None or c >= lo) and (hi is None or c < hi)
        ]
        assert r["n_rows"] == len(members)
        assert r["min_cents"] == min(members)
        assert r["max_cents"] == max(members)
        assert r["share_ppm"] == len(members) * 1_000_000 // n
        assert r["dev_ppm"] == abs(len(members) * nb - n) * 1_000_000 // (n * nb)


# ---------------------------------------------------------------------------
# x_media_hash_agreement
# ---------------------------------------------------------------------------


def test_media_hash_agreement_dhash_replay_and_classes(spark):
    """Replay the gradient hash from the ASCII payload model for every
    candidate pair and check both Hamming columns and the class logic;
    the aHash column must agree with the certified pair ledger."""
    import duckdb

    from recommender_systems_pyspark_spark.multimodal.media import (
        _AHASH_BITS,
        _MEDIA_DEDUP_HAM,
        x_media_ahash_pairs,
        x_media_hash_agreement,
    )

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
            f" WHERE doc_id % 3 = 0 AND length(text) > 0"
        ).fetchall()
    )

    def dhash_bits(text: str) -> list[int]:
        n = len(text)
        s = [
            ord(text[i * (n - 1) // _AHASH_BITS])
            for i in range(_AHASH_BITS + 1)
        ]
        return [1 if s[i] > s[i + 1] else 0 for i in range(_AHASH_BITS)]

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _rows(x_media_ahash_pairs(spark, SF_SMOKE))
    }
    got = _rows(x_media_hash_agreement(spark, SF_SMOKE))
    assert {(r["doc_a"], r["doc_b"]) for r in got} == set(pairs)
    classes = set()
    for r in got:
        a, b = r["doc_a"], r["doc_b"]
        assert r["hamming_ahash"] == pairs[(a, b)]
        if all(ord(c) < 128 for c in texts[a]) and all(
            ord(c) < 128 for c in texts[b]
        ):
            ba, bb = dhash_bits(texts[a]), dhash_bits(texts[b])
            assert r["hamming_dhash"] == sum(x != y for x, y in zip(ba, bb))
        ha, hd = r["hamming_ahash"], r["hamming_dhash"]
        want = (
            "both"
            if ha <= _MEDIA_DEDUP_HAM and hd <= _MEDIA_DEDUP_HAM
            else "ahash_only"
            if ha <= _MEDIA_DEDUP_HAM
            else "dhash_only"
            if hd <= _MEDIA_DEDUP_HAM
            else "neither"
        )
        assert r["dup_class"] == want
        classes.add(want)
    assert classes, "no candidate pairs at smoke scale?"


def test_auc_rank_single_class_language_yields_null(spark):
    """A language whose docs are all one reference class has no pos/neg
    pairs — auc_ppm must be NULL (the NULLIF guard), never a crash or a
    fabricated number; a perfectly-separating language must score 1e6."""
    import tempfile

    from recommender_systems_pyspark_spark.functions.strata import x_auc_rank

    # Gopher keep wants 6+ tokens with stopwords and variety; these two
    # are engineered: 'good*' docs pass the battery, 'bad' docs (one
    # repeated token) fail it. Language 'xx' holds ONLY failing docs;
    # language 'yy' holds both classes, with keeps scoring higher.
    good = (
        "the quick brown fox jumps over a lazy dog near the old river "
        "bank while a calm wind blows through the tall green trees today"
    )
    bad = "spam " * 30
    rows = [
        (1, bad, "xx", "s", len(bad)),
        (2, bad + "extra words here now", "xx", "s", 10),
        (3, good, "yy", "s", len(good)),
        (4, bad, "yy", "s", len(bad)),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {r["lang"]: r.asDict() for r in x_auc_rank(spark, d).collect()}
    assert set(got) == {"xx", "yy", "ALL"}
    xx = got["xx"]
    assert (xx["n_pos"] == 0) or (xx["n_neg"] == 0)
    assert xx["auc_ppm"] is None and xx["u2"] == 0
    yy = got["yy"]
    if yy["n_pos"] and yy["n_neg"]:  # engineered separation
        assert yy["auc_ppm"] == 1_000_000


# ---------------------------------------------------------------------------
# x_weighted_quantile
# ---------------------------------------------------------------------------


def test_weighted_quantile_matches_python_replay(spark):
    """Weighted rank-DISC quantiles replayed in python from the engine's
    own raked weights: the smallest value whose cumulative weight reaches
    ceil(q*W), per language — plus the weight-conservation tie to the
    producer face."""
    import collections

    import duckdb

    from recommender_systems_pyspark_spark.functions.strata import (
        x_raking_weights,
        x_weighted_quantile,
    )

    weights = {
        (r["source"], r["lang"]): r["weight_ppm"]
        for r in _rows(x_raking_weights(spark, SF_SMOKE))
    }
    docs = duckdb.sql(
        f"SELECT source, lang, n_chars FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    per_lang = collections.defaultdict(list)
    for source, lang, n_chars in docs:
        per_lang[lang].append((n_chars, weights[(source, lang)]))
    got = {r["lang"]: r.asDict() for r in x_weighted_quantile(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_lang)
    for lang, items in per_lang.items():
        items.sort()
        n = len(items)
        wtot = sum(w for _, w in items)
        g = got[lang]
        assert g["n_docs"] == n and g["total_weight"] == wtot
        for q, ucol, wcol in ((50, "p50_chars", "wp50_chars"), (95, "p95_chars", "wp95_chars")):
            target_n = (n * q + 99) // 100
            target_w = (wtot * q + 99) // 100
            cc = cw = 0
            up = wp = None
            for v, w in items:
                cc += 1
                cw += w
                if up is None and cc >= target_n:
                    up = v
                if wp is None and cw >= target_w:
                    wp = v
            assert g[ucol] == up, (lang, q)
            assert g[wcol] == wp, (lang, q)
        assert g["p50_shift"] == g["wp50_chars"] - g["p50_chars"]
