"""Round-5 operator tests (trend / distribution analytics + corpus
stratification): pure-Python replicas and algebraic invariants. Oracle
parity is covered by tools/verify_local.py; these pin what SQL parity
can't — that the statistics match their textbook definitions."""

from __future__ import annotations

import hashlib
import math

import pytest

from recommender_systems_pyspark_spark.registry import all_queries
from recommender_systems_pyspark_spark.sources import tables

SPECS = all_queries()


def _rows(spark, sf_dir, name):
    return SPECS[name].fn(spark, sf_dir).collect()


# ---------------------------------------------------------------------------
# x_linreg_trend — slope/intercept equal the closed-form OLS fit computed
# in python on the same (day, daily-cents) series.
# ---------------------------------------------------------------------------


def test_linreg_matches_python_ols(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    daily: dict[tuple[str, int], int] = {}
    epoch = __import__("datetime").date(1970, 1, 1)
    for r in li.collect():
        t = (r.l_shipdate.date() - epoch).days
        key = (r.l_returnflag, t)
        daily[key] = daily.get(key, 0) + round(r.l_extendedprice * 100)
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for (flag, t), y in daily.items():
        by_flag.setdefault(flag, []).append((t, y))
    got = {r.l_returnflag: r for r in _rows(spark, sf_dir, "x_linreg_trend")}
    assert set(got) == set(by_flag)
    for flag, pts in by_flag.items():
        n = len(pts)
        st = sum(t for t, _ in pts)
        stt = sum(t * t for t, _ in pts)
        sy = sum(y for _, y in pts)
        sty = sum(t * y for t, y in pts)
        slope_c = (n * sty - st * sy) / (n * stt - st * st)
        assert got[flag].n_days == n
        assert got[flag].slope_per_day == pytest.approx(slope_c / 100.0, rel=1e-12)
        assert got[flag].mean_daily_rev == pytest.approx(sy / n / 100.0, rel=1e-12)


# ---------------------------------------------------------------------------
# x_autocorr_daily — Pearson r of the (lagged, current) series, |r| ≤ 1.
# ---------------------------------------------------------------------------


def test_autocorr_is_pearson_of_lagged_series(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("event_type", "ts", "value")
    daily: dict[tuple[str, object], int] = {}
    for r in ev.collect():
        key = (r.event_type, r.ts.date())
        daily[key] = daily.get(key, 0) + round(r.value * 100)
    series: dict[str, list[int]] = {}
    for (et, day) in sorted(daily, key=lambda k: (k[0], k[1])):
        series.setdefault(et, []).append(daily[(et, day)])
    got = {r.event_type: r for r in _rows(spark, sf_dir, "x_autocorr_daily")}
    for et, ys in series.items():
        xs, yy = ys[:-1], ys[1:]
        n = len(xs)
        if n < 2:
            continue
        mx, my = sum(xs) / n, sum(yy) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, yy))
        vx = sum((a - mx) ** 2 for a in xs)
        vy = sum((b - my) ** 2 for b in yy)
        r_ref = cov / math.sqrt(vx * vy)
        assert got[et].n_pairs == n
        assert got[et].autocorr_lag1 == pytest.approx(r_ref, rel=1e-9)
        assert -1.0 <= got[et].autocorr_lag1 <= 1.0


# ---------------------------------------------------------------------------
# x_cumulative_distinct — running total ends at the overall distinct-user
# count; new_users sums to cum tail; active ≥ new per day.
# ---------------------------------------------------------------------------


def test_cumulative_distinct_invariants(spark, sf_dir):
    rows = _rows(spark, sf_dir, "x_cumulative_distinct")
    ev = tables(spark, sf_dir)["events"]
    total_users = ev.select("user_id").distinct().count()
    assert rows[-1].cum_users == total_users
    assert sum(r.new_users for r in rows) == total_users
    running = 0
    for r in rows:
        running += r.new_users
        assert r.cum_users == running
        assert r.active_users >= r.new_users
        assert r.n_events >= r.active_users


# ---------------------------------------------------------------------------
# x_ks_two_sample — equals the python KS of the binned CDFs; in [0, 1].
# ---------------------------------------------------------------------------


def test_ks_matches_python_binned_cdf(spark, sf_dir):
    o = tables(spark, sf_dir)["orders"].select("o_orderpriority", "o_totalprice")
    c1: dict[int, int] = {}
    c2: dict[int, int] = {}
    for r in o.collect():
        b = math.floor(r.o_totalprice / 1000)
        if r.o_orderpriority == "1-URGENT":
            c1[b] = c1.get(b, 0) + 1
        elif r.o_orderpriority == "5-LOW":
            c2[b] = c2.get(b, 0) + 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    a1 = a2 = 0
    ks = 0.0
    for b in sorted(set(c1) | set(c2)):
        a1 += c1.get(b, 0)
        a2 += c2.get(b, 0)
        ks = max(ks, abs(a1 / n1 - a2 / n2))
    [row] = _rows(spark, sf_dir, "x_ks_two_sample")
    assert (row.n1, row.n2) == (n1, n2)
    assert row.ks_stat == pytest.approx(ks, rel=1e-12)
    assert 0.0 <= row.ks_stat <= 1.0


# ---------------------------------------------------------------------------
# x_gini_concentration — equals the python rank-formula Gini; invariant
# under permutation of ties; in [0, 1) for positive revenues.
# ---------------------------------------------------------------------------


def test_gini_matches_python_rank_formula(spark, sf_dir):
    o = tables(spark, sf_dir)["orders"].select("o_custkey", "o_totalprice")
    rev: dict[int, int] = {}
    for r in o.collect():
        rev[r.o_custkey] = rev.get(r.o_custkey, 0) + round(r.o_totalprice * 100)
    ys = sorted(rev.values())
    n, sy = len(ys), sum(ys)
    sry = sum((i + 1) * y for i, y in enumerate(ys))
    gini_ref = (2 * sry - (n + 1) * sy) / (n * sy)
    [row] = _rows(spark, sf_dir, "x_gini_concentration")
    assert row.n_customers == n
    assert row.total_rev == pytest.approx(sy / 100.0, rel=1e-12)
    assert row.gini == pytest.approx(gini_ref, rel=1e-12)
    assert 0.0 <= row.gini < 1.0


# ---------------------------------------------------------------------------
# x_stratified_split — membership is the md5 bucket recomputed in python;
# cells partition the corpus; every (lang) stratum has all three splits
# at oracle scale.
# ---------------------------------------------------------------------------


def test_stratified_split_membership_and_partition(spark, sf_dir):
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "lang", "n_chars")
    cells: dict[tuple[str, str], list] = {}
    for r in docs.collect():
        bucket = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 100
        split = "train" if bucket < 80 else ("val" if bucket < 90 else "test")
        cells.setdefault((r.lang, split), []).append(r)
    got = _rows(spark, sf_dir, "x_stratified_split")
    assert {(r.lang, r.split) for r in got} == set(cells)
    for r in got:
        ref = cells[(r.lang, r.split)]
        assert r.n_docs == len(ref)
        assert r.total_chars == sum(x.n_chars for x in ref)
        assert r.min_doc == min(x.doc_id for x in ref)
        assert r.max_doc == max(x.doc_id for x in ref)
    assert sum(r.n_docs for r in got) == docs.count()


# ---------------------------------------------------------------------------
# x_token_entropy — matches the python Shannon entropy of the unigram
# counts (to the declared 1e-9 quantization); bounded by log2(vocab).
# ---------------------------------------------------------------------------


def test_token_entropy_matches_python(spark, sf_dir):
    docs = tables(spark, sf_dir)["documents"].select("lang", "text")
    counts: dict[str, dict[str, int]] = {}
    for r in docs.collect():
        d = counts.setdefault(r.lang, {})
        for tok in r.text.split(" "):
            if tok:
                d[tok] = d.get(tok, 0) + 1
    got = {r.lang: r for r in _rows(spark, sf_dir, "x_token_entropy")}
    assert set(got) == set(counts)
    for lang, d in counts.items():
        n = sum(d.values())
        h_ref = -sum((c / n) * math.log2(c / n) for c in d.values())
        row = got[lang]
        assert row.n_tokens == n
        assert row.vocab == len(d)
        assert row.entropy_bits == pytest.approx(h_ref, abs=1e-6)
        assert 0.0 <= row.entropy_bits <= math.log2(len(d)) + 1e-9
        assert row.type_token_ratio == pytest.approx(len(d) / n, abs=1e-8)


# ---------------------------------------------------------------------------
# x_time_weighted_avg — equals the python LOCF-weighted mean; differs from
# the plain mean when holding times vary.
# ---------------------------------------------------------------------------


def test_time_weighted_avg_matches_python(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    by_user: dict[int, list] = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append(r)
    sums: dict[str, list[int]] = {}
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for cur, nxt in zip(rows, rows[1:]):
            w_us = round((nxt.ts - cur.ts).total_seconds() * 1_000_000)
            s = sums.setdefault(cur.event_type, [0, 0, 0])
            s[0] += 1
            s[1] += w_us
            s[2] += w_us * round(cur.value * 100)
    got = {r.event_type: r for r in _rows(spark, sf_dir, "x_time_weighted_avg")}
    assert set(got) == set(sums)
    for et, (n, sw, swv) in sums.items():
        assert got[et].n_intervals == n
        assert got[et].time_weighted_avg == pytest.approx(swv / sw / 100.0, rel=1e-9)
        assert got[et].total_hold_secs == pytest.approx(sw / 1e6, rel=1e-12)


# ---------------------------------------------------------------------------
# x_histogram_quantile — brackets the exact percentile within one bin
# width, and is monotone in q.
# ---------------------------------------------------------------------------


def test_histogram_quantile_brackets_exact_percentile(spark, sf_dir):
    import math as _m

    o = tables(spark, sf_dir)["orders"].select("o_orderpriority", "o_totalprice")
    by_prio: dict[str, list[float]] = {}
    for r in o.collect():
        by_prio.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    got: dict[tuple[str, int], float] = {
        (r.prio, r.qp): r.quantile_est
        for r in _rows(spark, sf_dir, "x_histogram_quantile")
    }
    assert set(got) == {(p, q) for p in by_prio for q in (50, 90, 99)}
    for prio, vals in by_prio.items():
        vals.sort()
        n = len(vals)
        for q in (50, 90, 99):
            est = got[(prio, q)]
            # exact value at the ceil(q*n/100)-th order statistic lives in
            # the crossing bin; the interpolated estimate must be within
            # one bin width of it
            exact = vals[_m.ceil(q * n / 100) - 1]
            assert abs(est - exact) <= 1000.0
        assert got[(prio, 50)] <= got[(prio, 90)] <= got[(prio, 99)]


# ---------------------------------------------------------------------------
# x_join_size_estimate — the exact pair count matches a python replay, and
# the histogram estimate is sandwiched between exact and uniform (it can
# only refine the coarser statistic).
# ---------------------------------------------------------------------------


def test_join_size_estimate_exact_and_bounds(spark, sf_dir):
    import datetime

    ev = tables(spark, sf_dir)["events"].select("user_id", "ts")
    cut = datetime.datetime(2024, 1, 16)
    c1: dict[int, int] = {}
    c2: dict[int, int] = {}
    for r in ev.collect():
        d = c1 if r.ts < cut else c2
        d[r.user_id] = d.get(r.user_id, 0) + 1
    actual = sum(c * c2.get(u, 0) for u, c in c1.items())
    [row] = _rows(spark, sf_dir, "x_join_size_estimate")
    assert row.actual_pairs == actual
    assert (row.n1, row.n2) == (sum(c1.values()), sum(c2.values()))
    assert (row.ndv1, row.ndv2) == (len(c1), len(c2))
    # per-bucket refinement never loosens the uniform estimate, and both
    # under-estimate only when keys correlate more than uniform
    assert row.est_histogram >= row.est_uniform - 1e-6
    assert row.est_uniform > 0


# ---------------------------------------------------------------------------
# s8_view_click_left — superset of the inner join: same matched pairs,
# plus exactly one null row per unmatched view.
# ---------------------------------------------------------------------------


def test_s8_outer_is_inner_plus_unmatched_views(spark, sf_dir):
    inner = _rows(spark, sf_dir, "s6_view_click_funnel")
    outer = _rows(spark, sf_dir, "s8_view_click_left")
    inner_pairs = {(r.view_id, r.click_id) for r in inner}
    outer_matched = {
        (r.view_id, r.click_id) for r in outer if r.click_id is not None
    }
    assert outer_matched == inner_pairs
    null_views = {r.view_id for r in outer if r.click_id is None}
    matched_views = {v for v, _ in inner_pairs}
    assert not (null_views & matched_views)
    n_views = (
        tables(spark, sf_dir)["events"]
        .where("event_type = 'view'")
        .count()
    )
    assert len(null_views) + len(matched_views) == n_views


# ---------------------------------------------------------------------------
# x_countmin_freq — CMS never under-estimates, and matches the python
# sketch replay exactly.
# ---------------------------------------------------------------------------


def test_countmin_matches_python_sketch(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("user_id")
    users = [r.user_id for r in ev.collect()]

    def bucket(seed, u):
        return int(hashlib.md5(f"{seed}-{u}".encode()).hexdigest()[:8], 16) % 256

    row1: dict[int, int] = {}
    row2: dict[int, int] = {}
    exact: dict[int, int] = {}
    for u in users:
        row1[bucket(1, u)] = row1.get(bucket(1, u), 0) + 1
        row2[bucket(2, u)] = row2.get(bucket(2, u), 0) + 1
        exact[u] = exact.get(u, 0) + 1
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _rows(spark, sf_dir, "x_countmin_freq")
    assert [(r.user_id, r.exact_cnt) for r in got] == top
    for r in got:
        ref_est = min(row1[bucket(1, r.user_id)], row2[bucket(2, r.user_id)])
        assert r.cms_est == ref_est
        assert r.overestimate == ref_est - r.exact_cnt
        assert r.overestimate >= 0, "CMS must never under-estimate"


# ---------------------------------------------------------------------------
# x_table_checksum — python XOR-fold replay; single-row sensitivity.
# ---------------------------------------------------------------------------


def test_table_checksum_matches_python_fold(spark, sf_dir):
    o = tables(spark, sf_dir)["orders"].collect()
    acc = 0
    for r in o:
        s = "|".join(
            [
                str(r.o_orderkey),
                str(r.o_custkey),
                r.o_orderstatus,
                str(round(r.o_totalprice * 100)),
                r.o_orderdate.date().isoformat(),
                r.o_orderpriority,
            ]
        )
        acc ^= int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    [row] = _rows(spark, sf_dir, "x_table_checksum")
    assert row.n_rows == len(o)
    assert row.checksum_xor == acc


# ---------------------------------------------------------------------------
# x_ewma_halflife — dyadic weights make the kernel exactly representable;
# python replay matches bit-for-bit (not just approximately).
# ---------------------------------------------------------------------------


def test_ewma_matches_python_exactly(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("event_type", "ts", "value")
    daily: dict[tuple[str, object], int] = {}
    for r in ev.collect():
        k = (r.event_type, r.ts.date())
        daily[k] = daily.get(k, 0) + round(r.value * 100)
    series: dict[str, list[tuple[object, int]]] = {}
    for (et, day) in sorted(daily, key=lambda k: (k[0], k[1])):
        series.setdefault(et, []).append((day, daily[(et, day)]))
    got = {(r.event_type, r.day): r for r in _rows(spark, sf_dir, "x_ewma_halflife")}
    for et, pts in series.items():
        for i, (day, y) in enumerate(pts):
            num = den = 0.0
            for k in range(0, 10):
                if i - k < 0:
                    break
                wgt = 2.0 ** -(k + 1)
                num += pts[i - k][1] * wgt
                den += wgt
            row = got[(et, day.isoformat())]
            assert row.daily_rev == y / 100.0
            # dyadic weights + integer cents → exact until the division
            assert row.ewma == (num / den) / 100.0


# ---------------------------------------------------------------------------
# x_abtest_lift — matches the python two-proportion z-test; variants
# partition the users.
# ---------------------------------------------------------------------------


def test_abtest_matches_python_ztest(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("user_id", "event_type")
    per_user: dict[int, int] = {}
    for r in ev.collect():
        per_user.setdefault(r.user_id, 0)
        if r.event_type == "purchase":
            per_user[r.user_id] += 1
    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for u, np_ in per_user.items():
        v = u % 2
        n[v] += 1
        conv[v] += 1 if np_ >= 14 else 0
    [row] = _rows(spark, sf_dir, "x_abtest_lift")
    assert (row.n_a, row.n_b) == (n[0], n[1])
    assert (row.conv_a, row.conv_b) == (conv[0], conv[1])
    p_a, p_b = conv[0] / n[0], conv[1] / n[1]
    pool = (conv[0] + conv[1]) / (n[0] + n[1])
    z = (p_b - p_a) / math.sqrt(pool * (1 - pool) * (1 / n[0] + 1 / n[1]))
    assert row.p_a == pytest.approx(p_a, rel=1e-12)
    assert row.p_b == pytest.approx(p_b, rel=1e-12)
    assert row.abs_lift == pytest.approx(p_b - p_a, rel=1e-12)
    assert row.z_score == pytest.approx(z, rel=1e-12)


# ---------------------------------------------------------------------------
# x_zonemap_prune — clustered layout must beat hashed layout; pruning is
# lossless (scanned files contain every matching row).
# ---------------------------------------------------------------------------


def test_zonemap_clustered_beats_hashed_and_is_lossless(spark, sf_dir):
    [row] = _rows(spark, sf_dir, "x_zonemap_prune")
    assert row.n_files == 64
    # hashed layout: every file spans the whole date range -> no pruning
    assert row.files_scanned_hashed == 64
    # date-clustered layout: a one-month slice of ~6 years touches a
    # handful of contiguous files
    assert row.files_scanned_clustered < 8
    assert row.exact_rows > 0
    # losslessness: scanned rows can never be fewer than matching rows
    assert row.amplification_clustered >= 1.0
    assert row.amplification_hashed >= 1.0
    assert row.amplification_clustered < row.amplification_hashed


# ---------------------------------------------------------------------------
# x_rolling_distinct_7d — equals the brute-force trailing-window distinct;
# WAU ≥ DAU; stickiness in (0, 1].
# ---------------------------------------------------------------------------


def test_rolling_distinct_matches_bruteforce(spark, sf_dir):
    import datetime

    ev = tables(spark, sf_dir)["events"].select("ts", "user_id")
    by_day: dict[datetime.date, set] = {}
    for r in ev.collect():
        by_day.setdefault(r.ts.date(), set()).add(r.user_id)
    got = _rows(spark, sf_dir, "x_rolling_distinct_7d")
    assert len(got) == len(by_day)
    for r in got:
        day = datetime.date.fromisoformat(r.day)
        window_users = set()
        for k in range(0, 7):
            window_users |= by_day.get(day - datetime.timedelta(days=k), set())
        assert r.dau == len(by_day[day])
        assert r.wau_7d == len(window_users)
        assert r.wau_7d >= r.dau
        assert 0.0 < r.stickiness <= 1.0


# ---------------------------------------------------------------------------
# x_scd2_event_enrich — exactly one dimension version per fact; the
# version really is the one valid at the fact's timestamp.
# ---------------------------------------------------------------------------


def test_scd2_enrich_point_in_time_correct(spark, sf_dir):
    enriched = _rows(spark, sf_dir, "x_scd2_event_enrich")
    hist = _rows(spark, sf_dir, "x_scd2_history")
    purchases = (
        tables(spark, sf_dir)["events"].where("event_type = 'purchase'").collect()
    )
    assert len(enriched) == len(purchases), "exactly one version per fact"
    assert len({r.event_id for r in enriched}) == len(enriched)
    by_user: dict[int, list] = {}
    for h in hist:
        by_user.setdefault(h.user_id, []).append(h)
    for r in enriched:
        [match] = [
            h
            for h in by_user[r.user_id]
            if h.valid_from <= r.ts and (h.valid_to is None or r.ts < h.valid_to)
        ]
        assert (match.event_type, match.version) == (r.state_type, r.state_version)
        # a purchase observed at ts must sit inside a 'purchase' state run
        assert r.state_type == "purchase"


# ---------------------------------------------------------------------------
# x_dataset_publish_e2e — funnel monotonicity and manifest consistency
# against independently-computed stage outputs.
# ---------------------------------------------------------------------------


def test_dataset_publish_composes_certified_stages(spark, sf_dir):
    quality = {r.doc_id for r in _rows(spark, sf_dir, "x_quality_gopher") if r.keep}
    docs = {
        r.doc_id: r
        for r in tables(spark, sf_dir)["documents"].collect()
    }
    # replay dedup over the quality survivors
    by_hash: dict[str, int] = {}
    for d in sorted(quality):
        h = hashlib.sha256(docs[d].text.lower().strip().encode()).hexdigest()
        by_hash.setdefault(h, d)
    kept = set(by_hash.values())
    manifest = _rows(spark, sf_dir, "x_dataset_publish_e2e")
    assert sum(r.n_docs for r in manifest) == len(kept)
    # replay placement + fingerprint per cell
    cells: dict[tuple[str, int], list[int]] = {}
    for d in kept:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        shard = int(hashlib.md5(f"s-{d}".encode()).hexdigest()[:8], 16) % 4
        cells.setdefault((split, shard), []).append(d)
    assert {(r.split, r.shard) for r in manifest} == set(cells)
    for r in manifest:
        ids = cells[(r.split, r.shard)]
        assert r.n_docs == len(ids)
        assert r.total_chars == sum(docs[d].n_chars for d in ids)
        acc = 0
        for d in ids:
            acc ^= int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        assert r.manifest_xor == acc


# ---------------------------------------------------------------------------
# x_benford_digits — digits partition the orders; frequencies sum to 1;
# chi2 contributions match a python replay.
# ---------------------------------------------------------------------------


def test_benford_matches_python(spark, sf_dir):
    o = tables(spark, sf_dir)["orders"].collect()
    import math as m

    counts: dict[int, int] = {}
    for r in o:
        d = int(str(round(r.o_totalprice * 100))[0])
        counts[d] = counts.get(d, 0) + 1
    n = len(o)
    got = _rows(spark, sf_dir, "x_benford_digits")
    assert sum(r.observed for r in got) == n
    assert sum(r.observed_freq for r in got) == pytest.approx(1.0, abs=1e-12)
    for r in got:
        assert r.observed == counts[r.d]
        expected_f = m.log10(1 + 1 / r.d)
        assert r.benford_freq == pytest.approx(expected_f, rel=1e-15)
        e = expected_f * n  # same formula up to literal rounding
        assert r.chi2_contrib == pytest.approx(
            (counts[r.d] - e) ** 2 / e, rel=1e-9
        )


# ---------------------------------------------------------------------------
# x_basket_lift — support/confidence/lift equal the python replay on the
# coarsened baskets; confidence ≤ 1; support ordering holds.
# ---------------------------------------------------------------------------


def test_basket_lift_matches_python(spark, sf_dir):
    li = tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey")
    baskets: dict[int, set] = {}
    for r in li.collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey % 500)
    singles: dict[int, int] = {}
    pairs: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        for i in items:
            singles[i] = singles.get(i, 0) + 1
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pairs[(s[x], s[y])] = pairs.get((s[x], s[y]), 0) + 1
    n = len(baskets)
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _rows(spark, sf_dir, "x_basket_lift")
    assert [((r.item_a, r.item_b), r.pair_c) for r in got] == top
    for r in got:
        ca, cb = singles[r.item_a], singles[r.item_b]
        assert r.confidence == pytest.approx(r.pair_c / ca, rel=1e-12)
        assert r.confidence <= 1.0
        assert r.lift == pytest.approx(r.pair_c * n / (ca * cb), rel=1e-12)


# ---------------------------------------------------------------------------
# x_welch_ttest — matches scipy-free python Welch computation.
# ---------------------------------------------------------------------------


def test_welch_matches_python(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("ts", "value")
    daily: dict[object, int] = {}
    for r in ev.collect():
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + round(r.value * 100)
    groups: dict[int, list[int]] = {0: [], 1: []}
    for d, y in daily.items():
        groups[1 if d.weekday() >= 5 else 0].append(y)
    [row] = _rows(spark, sf_dir, "x_welch_ttest")
    assert (row.n_weekday, row.n_weekend) == (len(groups[0]), len(groups[1]))
    means = {}
    ses = {}
    for g, ys in groups.items():
        n = len(ys)
        m = sum(ys) / n
        var = sum((v - m) ** 2 for v in ys) / (n - 1)
        means[g], ses[g] = m, var / n
    assert row.mean_weekday == pytest.approx(means[0] / 100, rel=1e-12)
    assert row.mean_weekend == pytest.approx(means[1] / 100, rel=1e-12)
    t_ref = (means[0] - means[1]) / math.sqrt(ses[0] + ses[1])
    assert row.t_stat == pytest.approx(t_ref, rel=1e-9)


# ---------------------------------------------------------------------------
# x_crosscorr_lagged / x_cusum_changepoint — python replays.
# ---------------------------------------------------------------------------


def _daily_series(spark, sf_dir):
    ev = tables(spark, sf_dir)["events"].select("event_type", "ts", "value")
    daily: dict[tuple[str, object], int] = {}
    for r in ev.collect():
        k = (r.event_type, r.ts.date())
        daily[k] = daily.get(k, 0) + round(r.value * 100)
    return daily


def test_crosscorr_matches_python(spark, sf_dir):
    daily = _daily_series(spark, sf_dir)
    days = sorted({d for _, d in daily})
    v = [daily.get(("view", d), 0) for d in days]
    p = [daily.get(("purchase", d), 0) for d in days]
    got = {r.lag: r for r in _rows(spark, sf_dir, "x_crosscorr_lagged")}
    for k in range(4):
        xs, ys = v[: len(v) - k] if k else v, p[k:]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        vx = sum((a - mx) ** 2 for a in xs)
        vy = sum((b - my) ** 2 for b in ys)
        assert got[k].n_pairs == n
        assert got[k].crosscorr == pytest.approx(
            cov / math.sqrt(vx * vy), rel=1e-9
        )


def test_cusum_matches_python(spark, sf_dir):
    daily = _daily_series(spark, sf_dir)
    series: dict[str, list[tuple[object, int]]] = {}
    for (et, d), y in sorted(daily.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series.setdefault(et, []).append((d, y))
    got = {r.event_type: r for r in _rows(spark, sf_dir, "x_cusum_changepoint")}
    for et, pts in series.items():
        n = len(pts)
        total = sum(y for _, y in pts)
        prefix = 0
        best = (-1, None)
        for t, (d, y) in enumerate(pts, start=1):
            prefix += y
            score = abs(n * prefix - t * total)
            if score > best[0] or (score == best[0] and d > best[1]):
                best = (score, d)
        assert got[et].cusum_scaled == best[0]
        assert got[et].changepoint_day == best[1].isoformat()
        assert got[et].cusum_dollars == pytest.approx(
            best[0] / (n * 100.0), rel=1e-12
        )


# ---------------------------------------------------------------------------
# x_ltv_cohort_triangle — python replay; cumulative LTV monotone in age.
# ---------------------------------------------------------------------------


def test_ltv_triangle_matches_python(spark, sf_dir):
    import datetime

    anchor = datetime.date(2024, 1, 1)
    ev = tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    first: dict[int, object] = {}
    for r in ev:
        d = r.ts.date()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    cohort = {u: (d - anchor).days // 7 for u, d in first.items()}
    sizes: dict[int, int] = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    rev: dict[tuple[int, int], int] = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        c = cohort[r.user_id]
        age = (r.ts.date() - anchor).days // 7 - c
        rev[(c, age)] = rev.get((c, age), 0) + round(r.value * 100)
    got = _rows(spark, sf_dir, "x_ltv_cohort_triangle")
    assert {(r.cohort_week, r.age_week) for r in got} == set(rev)
    by_cohort: dict[int, list] = {}
    for r in got:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for c, rows in by_cohort.items():
        rows.sort(key=lambda r: r.age_week)
        cum = 0
        prev_ltv = -1.0
        for r in rows:
            assert r.cohort_users == sizes[c]
            cum += rev[(c, r.age_week)]
            assert r.week_rev == pytest.approx(rev[(c, r.age_week)] / 100, rel=1e-12)
            assert r.cum_ltv_per_user == pytest.approx(
                cum / sizes[c] / 100, rel=1e-12
            )
            assert r.cum_ltv_per_user >= prev_ltv
            prev_ltv = r.cum_ltv_per_user


# ---------------------------------------------------------------------------
# x_seasonal_dow_index / x_ship_latency_profile — python replays.
# ---------------------------------------------------------------------------


def test_seasonal_dow_index_matches_python(spark, sf_dir):
    daily = _daily_series(spark, sf_dir)
    by_day: dict[object, int] = {}
    for (_, d), y in daily.items():
        by_day[d] = by_day.get(d, 0) + y
    by_dow: dict[int, list[int]] = {}
    for d, y in by_day.items():
        by_dow.setdefault(d.isoweekday(), []).append(y)
    all_days = sum(len(v) for v in by_dow.values())
    all_cents = sum(sum(v) for v in by_dow.values())
    got = {r.dow: r for r in _rows(spark, sf_dir, "x_seasonal_dow_index")}
    assert set(got) == set(by_dow)
    weighted = 0.0
    for dow, ys in by_dow.items():
        r = got[dow]
        assert r.n_days == len(ys)
        assert r.mean_daily_rev == pytest.approx(
            sum(ys) / len(ys) / 100, rel=1e-12
        )
        ref_idx = (sum(ys) / len(ys)) / (all_cents / all_days)
        assert r.seasonal_index == pytest.approx(ref_idx, rel=1e-12)
        weighted += r.seasonal_index * r.n_days
    # day-weighted mean index is exactly 1
    assert weighted / all_days == pytest.approx(1.0, rel=1e-12)


def test_ship_latency_matches_python(spark, sf_dir):
    t = tables(spark, sf_dir)
    odate = {
        r.o_orderkey: (r.o_orderdate.date(), r.o_orderpriority)
        for r in t["orders"].collect()
    }
    lat: dict[str, list[int]] = {}
    for r in t["lineitem"].select("l_orderkey", "l_shipdate").collect():
        od, prio = odate[r.l_orderkey]
        lat.setdefault(prio, []).append((r.l_shipdate.date() - od).days)
    got = {r.prio: r for r in _rows(spark, sf_dir, "x_ship_latency_profile")}
    assert set(got) == set(lat)
    for prio, days in lat.items():
        r = got[prio]
        assert r.n_lines == len(days)
        assert (r.min_days, r.max_days) == (min(days), max(days))
        assert r.mean_days == pytest.approx(sum(days) / len(days), rel=1e-12)
        assert r.frac_within_30d == pytest.approx(
            sum(1 for d in days if d <= 30) / len(days), rel=1e-12
        )
        # note: the synthetic fixture does NOT constrain shipdate to
        # follow orderdate (negative lags exist) — the profile reports
        # the data as it is, so no non-negativity assertion here


# ---------------------------------------------------------------------------
# x_mixture_resample — python membership replay; rates track targets.
# ---------------------------------------------------------------------------


def test_mixture_resample_membership(spark, sf_dir):
    docs = tables(spark, sf_dir)["documents"].select("doc_id", "source").collect()
    cells: dict[str, list] = {}
    for r in docs:
        cells.setdefault(r.source, []).append(r.doc_id)
    got = {r.source: r for r in _rows(spark, sf_dir, "x_mixture_resample")}
    assert set(got) == set(cells)
    for src, ids in cells.items():
        srcnum = int("".join(ch for ch in src if ch.isdigit()))
        thr = (srcnum + 1) * 250
        kept = [
            d
            for d in ids
            if int(hashlib.md5(f"mix-{d}".encode()).hexdigest()[:8], 16) % 10000
            < thr
        ]
        r = got[src]
        assert r.n_docs == len(ids)
        assert r.target_permille10k == thr
        assert r.sampled == len(kept)
        assert r.achieved_rate == pytest.approx(len(kept) / len(ids), rel=1e-12)
        acc = 0
        for d in kept:
            acc ^= int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        assert r.sample_xor == acc


# ---------------------------------------------------------------------------
# x_classifier_eval — confusion partition + metric identities against the
# two gates' own registered outputs.
# ---------------------------------------------------------------------------


def test_classifier_eval_consistent_with_gates(spark, sf_dir):
    gopher = {r.doc_id: r.keep for r in _rows(spark, sf_dir, "x_quality_gopher")}
    logit = {r.doc_id: r.keep for r in _rows(spark, sf_dir, "x_quality_logit")}
    tp = sum(1 for d in logit if logit[d] and gopher[d])
    fp = sum(1 for d in logit if logit[d] and not gopher[d])
    fn = sum(1 for d in logit if not logit[d] and gopher[d])
    tn = sum(1 for d in logit if not logit[d] and not gopher[d])
    [row] = _rows(spark, sf_dir, "x_classifier_eval")
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    n = tp + fp + fn + tn
    assert n == len(logit)
    assert row.accuracy == pytest.approx((tp + tn) / n, rel=1e-12)
    assert row.precision_keep == pytest.approx(tp / (tp + fp), rel=1e-12)
    assert row.recall_keep == pytest.approx(tp / (tp + fn), rel=1e-12)
    assert row.f1_keep == pytest.approx(2 * tp / (2 * tp + fp + fn), rel=1e-12)
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    assert row.cohens_kappa == pytest.approx((po - pe) / (1 - pe), rel=1e-9)
    assert -1.0 <= row.cohens_kappa <= 1.0
