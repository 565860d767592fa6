"""Invariant tests for the round-3 analytics operators.

The oracle check (tools/check_oracle.py) proves cross-engine equality;
these tests prove the SEMANTICS are right — properties that would hold
on any dataset, not just that two engines agree on this one.
"""

import math

from pyspark.sql import functions as F

from varda_spark import catalog
from tests.conftest import SF_SMALL

SF = "/root/testdata/sf0.01"


def test_pagerank_is_deterministic_and_mass_bounded(spark):
    top = catalog.graph_pagerank(spark, SF).collect()
    again = catalog.graph_pagerank(spark, SF).collect()
    assert top == again  # integer fixed-point ⇒ retry-deterministic
    assert len(top) == 20
    ranks = [r.pr_scaled for r in top]
    assert ranks == sorted(ranks, reverse=True)
    # damped fixed-point keeps every rank ≥ the teleport floor
    assert all(r >= 150000 for r in ranks)


def test_attribution_latencies_within_window(spark):
    rows = catalog.win_attribution(spark, SF).collect()
    assert rows, "testdata has purchases preceded by clicks"
    assert all(0 < r.latency_us <= 604800000000 for r in rows)
    # one attribution row per purchase at most
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))


def test_corr_matches_numpy(spark):
    import numpy as np

    got = {r.flag: r for r in catalog.agg_corr(spark, SF).collect()}
    li = catalog.read_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, g in li.groupby("l_returnflag"):
        ref = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
        assert math.isclose(got[flag].corr, ref, rel_tol=1e-9)
        ref_cov = np.cov(g.l_quantity, g.l_extendedprice, ddof=1)[0, 1]
        assert math.isclose(got[flag].covar_samp, ref_cov, rel_tol=1e-9)


def test_moments_match_scipy_style(spark):
    import numpy as np

    got = {r.flag: r for r in catalog.agg_moments(spark, SF).collect()}
    li = catalog.read_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).toPandas()
    for flag, g in li.groupby("l_returnflag"):
        x = g.l_quantity.to_numpy()
        m = x.mean()
        v = ((x - m) ** 2).mean()
        skew = ((x - m) ** 3).mean() / v**1.5
        kurt = ((x - m) ** 4).mean() / v**2 - 3
        assert math.isclose(got[flag].var_pop, v, rel_tol=1e-9)
        assert math.isclose(got[flag].skew, skew, rel_tol=1e-6)
        assert math.isclose(got[flag].kurt_excess, kurt, rel_tol=1e-6)


def test_hhi_shares_sum_to_one_million(spark):
    # per nation, ppm shares must sum to ~1e6 (floor loss < n_suppliers)
    # and HHI is bounded by [1e12/n, 1e12]
    rows = catalog.agg_hhi(spark, SF).collect()
    for r in rows:
        assert r.hhi_ppm2 <= 1_000_000**2
        assert r.hhi_ppm2 >= (1_000_000**2) // r.n_suppliers - 2 * 1_000_000


def test_rfm_quartiles_balanced(spark):
    df = catalog.agg_rfm(spark, SF)
    per = (
        df.groupBy("nation", "r_q").count().groupBy("nation")
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"))
        .collect()
    )
    # ntile(4) balance: max and min quartile sizes differ by ≤ 1
    assert all(r.mx - r.mn <= 1 for r in per)


def test_weighted_sampling_rate_tracks_weight(spark):
    docs = catalog.read_table(spark, SF, "documents")
    kept = catalog.sample_weighted(spark, SF)
    n, k = docs.count(), kept.count()
    exp = docs.select((F.least("n_chars", F.lit(1000)) / 1000.0).alias("p")).agg(
        F.sum("p")
    ).collect()[0][0]
    # md5 coin ⇒ binomial-ish: allow 5 sigma
    sigma = math.sqrt(exp * (1 - exp / n)) if n else 0
    assert abs(k - exp) <= 5 * sigma + 5
    # deterministic: same rows every run
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )


def test_integrity_clean_on_shipped_data(spark):
    rows = {r.chk: r.n_bad for r in catalog.qa_integrity(spark, SF_SMALL).collect()}
    assert rows["orphan_lineitems"] == 0
    assert rows["dup_orderkeys"] == 0
    assert rows["null_order_dates"] == 0


def test_interval_density_spine_has_no_holes(spark):
    rows = catalog.interval_density(spark, SF_SMALL).orderBy("win_start").collect()
    starts = [r.win_start for r in rows]
    assert starts == list(range(starts[0], starts[-1] + 900, 900))
    assert any(r.n == 0 for r in rows) or len(rows) > 0


def test_ks_matches_scipy_formula(spark):
    got = {r.status: r for r in catalog.agg_ks(spark, SF).collect()}
    li = (
        catalog.read_table(spark, SF, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "N"))
        .select("l_linestatus", "l_returnflag", F.floor("l_quantity").alias("x"))
        .toPandas()
    )
    import numpy as np

    for status, g in li.groupby("l_linestatus"):
        a = np.sort(g[g.l_returnflag == "R"].x.to_numpy())
        b = np.sort(g[g.l_returnflag == "N"].x.to_numpy())
        grid = np.union1d(a, b)
        d_ref = np.max(
            np.abs(
                np.searchsorted(a, grid, side="right") / len(a)
                - np.searchsorted(b, grid, side="right") / len(b)
            )
        )
        assert math.isclose(got[status].ks_stat, d_ref, rel_tol=1e-12)
        assert 0.0 <= got[status].ks_stat <= 1.0


def test_chisq_cells_reconstruct_marginals(spark):
    rows = catalog.agg_chisq(spark, SF).collect()
    assert len(rows) == 6  # 3 flags x 2 statuses
    n = sum(r.obs for r in rows)
    # expected cell counts also sum to N (property of the independence model)
    assert math.isclose(sum(r.expected for r in rows), n, rel_tol=1e-9)
    assert all(r.chisq_contrib >= 0 for r in rows)


def test_benford_shares_cover_all_orders(spark):
    rows = catalog.agg_benford(spark, SF).collect()
    digits = {r.digit for r in rows}
    assert digits <= set("123456789")
    total_ppm = sum(r.share_ppm for r in rows)
    # floor rounding loses < 1 ppm per digit
    assert 1000000 - 9 <= total_ppm <= 1000000


def test_graph_jaccard_scores_bounded_and_sorted(spark):
    rows = catalog.graph_jaccard(spark, SF_SMALL).collect()
    assert rows
    scores = [r.jac_ppm for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r.cn <= r.un  # intersection never exceeds union
        assert 0 < r.jac_ppm <= 1000000


def test_emb_quantize_codes_in_range_and_complete(spark):
    df = catalog.emb_quantize(spark, SF)
    rows = df.collect()
    assert all(0 <= r.code <= 255 for r in rows)
    emb = catalog.read_table(spark, SF, "embeddings")
    n_vecs = emb.count()
    dim = emb.select(F.size("embedding").alias("d")).first().d
    # histogram mass = n_vecs per dimension, all dims present
    per_dim = {r.dim: 0 for r in rows}
    for r in rows:
        per_dim[r.dim] += r.n
    assert set(per_dim) == set(range(dim))
    assert all(v == n_vecs for v in per_dim.values())


def test_ewma_is_convex_and_tracks_constant(spark):
    df = catalog.win_ewma(spark, SF)
    ev = catalog.read_table(spark, SF, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    rows = df.limit(2000).collect()
    # EWMA is a convex combination -> bounded by the global value range
    # (loose bound: quantization to 1e-4 can nudge by < 1e-4)
    assert all(lo - 1e-3 <= r.ewma <= hi + 1e-3 for r in rows)
    assert all(r.den <= 255 and r.den >= 128 for r in rows)


def test_readability_formula_consistent(spark):
    rows = catalog.text_readability(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.total_words > 0
        # Flesch for natural-ish text lands in a wide sane band
        assert -200.0 < r.flesch < 220.0


def test_autocorr_matches_numpy(spark):
    import numpy as np

    got = {r.event_type: r for r in catalog.agg_autocorr(spark, SF).collect()}
    daily = (
        catalog.read_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        x = g["count"].to_numpy()
        ref = np.corrcoef(x[1:], x[:-1])[0, 1]
        assert math.isclose(got[et].autocorr, ref, rel_tol=1e-9)
        assert got[et].n_pairs == len(x) - 1


def test_bollinger_bands_bracket_mid(spark):
    rows = catalog.win_bollinger(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.lower <= r.mid <= r.upper
        # window mean stays within the window's value range; first row
        # (n=1) has zero-width bands
        if r.n == 1:
            assert math.isclose(r.lower, r.upper)


def test_rolling_median_matches_numpy(spark):
    import numpy as np

    got = {
        (r.event_type, r.day): (r.rolling_median, r.n_window)
        for r in catalog.win_rolling_median(spark, SF).collect()
    }
    daily = (
        catalog.read_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        days = list(g["day"])
        counts = list(g["count"])
        for idx, d in enumerate(days):
            win = [
                c
                for dd, c in zip(days, counts)
                if (d - dd).days <= 6 and dd <= d
            ]
            lower_med = int(np.sort(win)[(len(win) - 1) // 2])
            assert got[(et, d)] == (lower_med, len(win))


def test_interval_knn_contains_nearest_and_is_ranked(spark):
    knn = catalog.join_interval_knn(spark, SF_SMALL)
    rows = knn.collect()
    per = {}
    for r in rows:
        per.setdefault((r.chromosome, r.position, r.p_partkey), []).append(r)
    nearest = {
        (r.chromosome, r.position, r.p_partkey): (r.nearest_key, r.distance)
        for r in catalog.join_nearest(spark, SF_SMALL).collect()
    }
    for key, grp in per.items():
        grp.sort(key=lambda r: r.k_rank)
        assert [r.k_rank for r in grp] == list(range(1, len(grp) + 1))
        dists = [r.distance for r in grp]
        assert dists == sorted(dists)
        # rank-1 of the kNN equals the dedicated nearest-sweep join
        assert (grp[0].nearest_key, grp[0].distance) == nearest[key]


def test_leadtime_stats_consistent(spark):
    rows = catalog.agg_leadtime(spark, SF).collect()
    assert rows
    li = catalog.read_table(spark, SF, "lineitem").count()
    assert sum(r.n_lines for r in rows) == li  # every line classified once
    for r in rows:
        assert r.min_days <= r.median_days <= r.max_days
        assert r.min_days <= r.avg_days <= r.max_days
    # the synthetic dates are not causally ordered (ship can precede
    # order) — the operator faithfully reports that rather than hiding it


def test_trimmed_mean_matches_scipy_style(spark):
    import numpy as np

    got = {r.flag: r for r in catalog.agg_trimmed_mean(spark, SF).collect()}
    li = (
        catalog.read_table(spark, SF, "lineitem")
        .selectExpr("l_returnflag AS flag", "CAST(FLOOR(l_quantity) AS BIGINT) AS x")
        .toPandas()
    )
    for flag, g in li.groupby("flag"):
        x = np.sort(g.x.to_numpy())
        k = len(x) // 10
        ref = x[k : len(x) - k].mean()
        assert got[flag].n_total == len(x)
        assert got[flag].n_kept == len(x) - 2 * k
        assert math.isclose(got[flag].trimmed_mean, ref, rel_tol=1e-12)


def test_quartile_skew_bounded_and_ordered(spark):
    rows = catalog.agg_quartile_skew(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q2 <= r.q3
        assert -1.0 <= r.bowley_skew <= 1.0  # Bowley is bounded by construction


def test_runs_test_matches_python_reference(spark):
    got = {r.event_type: r for r in catalog.agg_runs_test(spark, SF).collect()}
    daily = (
        catalog.read_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .orderBy("event_type", "day")
        .toPandas()
    )
    for et, g in daily.groupby("event_type"):
        x = list(g["count"])
        signs = [1 if b > a else 0 for a, b in zip(x, x[1:]) if b != a]
        if not signs:
            continue
        n1, n2 = sum(signs), len(signs) - sum(signs)
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        if n1 == 0 or n2 == 0:
            assert et not in got
            continue
        r = got[et]
        assert (r.n1, r.n2, r.runs) == (n1, n2, runs)
        n = n1 + n2
        mu = 2 * n1 * n2 / n + 1
        var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) / (n * n * (n - 1))
        assert math.isclose(r.runs_z, (runs - mu) / math.sqrt(var), rel_tol=1e-12)


def test_minmax_scale_bounds_and_extremes(spark):
    rows = catalog.win_minmax_scale(spark, SF).collect()
    assert rows
    per = {}
    for r in rows:
        per.setdefault(r.label, []).append(r.scaled_ppm)
    for label, vals in per.items():
        assert all(0 <= v <= 1000000 for v in vals)
        if len(set(vals)) > 1:
            assert min(vals) == 0 and max(vals) == 1000000


def test_novelty_first_doc_fully_novel_and_monotone_trend(spark):
    rows = {r.doc_id: r for r in catalog.text_ngram_novelty(spark, SF).collect()}
    assert rows
    first = rows[min(rows)]
    # the lowest-id document is first seer of every one of its shingles
    assert first.n_novel == first.n_shingles and first.novelty_ppm == 1000000
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_shingles


def test_seasonality_shares_total_and_dow_domain(spark):
    rows = catalog.agg_seasonality(spark, SF).collect()
    per = {}
    for r in rows:
        assert 0 <= r.dow <= 6
        per.setdefault(r.event_type, 0)
        per[r.event_type] += r.share_ppm
    # floor rounding loses < 1 ppm per bucket (7 buckets)
    assert all(1000000 - 7 <= v <= 1000000 for v in per.values())


def test_peaks_are_strict_local_maxima(spark):
    rows = catalog.win_peak_detect(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cnt > r.prev and r.cnt > r.next
    daily = {
        (r.event_type, r.day): r.cnt
        for r in catalog.read_table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    import datetime

    for r in rows:
        assert daily[(r.event_type, r.day - datetime.timedelta(days=1))] == r.prev
        assert daily[(r.event_type, r.day + datetime.timedelta(days=1))] == r.next


def test_tiles_partition_each_interval_exactly(spark):
    tiles = catalog.interval_tile(spark, SF_SMALL).collect()
    assert tiles
    per = {}
    for t in tiles:
        per.setdefault(t.sample_key, []).append(t)
    for key, ts in per.items():
        ts.sort(key=lambda t: t.tile_idx)
        assert [t.tile_idx for t in ts] == list(range(len(ts)))
        # tiles abut with no gaps/overlaps and cover [begin, end)
        for a, b in zip(ts, ts[1:]):
            assert a.tile_end == b.tile_start
        widths = [t.tile_end - t.tile_start for t in ts]
        assert all(w == 500 for w in widths[:-1])
        assert 0 < widths[-1] <= 500


def test_interarrival_median_le_mean_on_bursty_series(spark):
    rows = catalog.agg_interarrival(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_gap_us <= r.median_gap_us <= r.max_gap_us
        assert r.min_gap_us <= r.mean_gap_us <= r.max_gap_us
        assert r.n_gaps > 0


def test_abc_classes_partition_parts_and_respect_pareto(spark):
    rows = {r.abc: r for r in catalog.agg_abc_class(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        catalog.read_table(spark, SF, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    tot = sum(r.class_rev_c for r in rows.values())
    # A holds at least the 80% line minus one item's worth; A < all revenue
    assert rows["A"].class_rev_c >= 0.75 * tot
    assert rows["A"].n_parts < n_parts


def test_vwap_is_bounded_by_price_range(spark):
    df = catalog.win_vwap(spark, SF)
    li = catalog.read_table(spark, SF, "lineitem")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    agg = df.agg(F.min("vwap"), F.max("vwap")).first()
    # a weighted mean of prices can never leave the price range
    assert lo - 1e-3 <= agg[0] and agg[1] <= hi + 1e-3
    # cumulative sums are monotone within a flag by construction
    last = {}
    for r in df.orderBy("flag", "cum_q").limit(5000).collect():
        if r.flag in last:
            assert r.cum_q >= last[r.flag]
        last[r.flag] = r.cum_q


def test_basket_lift_matches_python_recompute(spark):
    rows = catalog.join_basket_lift(spark, SF_SMALL).collect()
    assert rows
    lp = (
        catalog.read_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import Counter, defaultdict

    orders = defaultdict(set)
    for r in lp:
        orders[r.l_orderkey].add(r.l_partkey)
    n = len(orders)
    item = Counter()
    pair = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        item.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    for r in rows:
        assert pair[(r.pa, r.pb)] == r.n_ab and r.n_ab >= 3
        assert r.lift_centi == (100 * r.n_ab * n) // (item[r.pa] * item[r.pb])


def test_regression_matches_numpy_lstsq(spark):
    import numpy as np

    got = {r.brand: r for r in catalog.agg_regression(spark, SF).collect()}
    b = (
        catalog.read_table(spark, SF, "lineitem")
        .join(
            catalog.read_table(spark, SF, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .selectExpr(
            "p_brand AS brand",
            "CAST(FLOOR(l_quantity) AS BIGINT) AS x",
            "l_extendedprice AS y",
        )
        .toPandas()
    )
    for brand, g in b.groupby("brand"):
        slope, intercept = np.polyfit(g.x, g.y, 1)
        assert math.isclose(got[brand].slope, slope, rel_tol=1e-6)
        assert math.isclose(got[brand].intercept, intercept, rel_tol=1e-6)


def test_upsample_plan_caps_and_floors(spark):
    rows = catalog.text_upsample_plan(spark, SF).collect()
    assert rows
    max_tok = max(r.n_tokens for r in rows)
    for r in rows:
        assert 1 <= r.repeat_factor <= 4
        assert r.repeat_factor == min(max_tok // r.n_tokens, 4)
        assert r.effective_tokens == r.n_tokens * r.repeat_factor


def test_depth_hist_conserves_interval_mass(spark):
    """Sweep-line conservation law: Σ depth·bases over the histogram must
    equal Σ (end − begin) over the input intervals — every base of every
    interval is counted at exactly one depth. Also: depths positive,
    segment counts positive."""
    from varda_spark.catalog import _points_intervals

    hist = catalog.interval_depth_hist(spark, SF).collect()
    _, s = _points_intervals(spark, SF)
    total = s.select(F.sum(F.col("end") - F.col("begin"))).collect()[0][0]
    assert sum(r.depth * r.bases for r in hist) == total
    assert all(r.depth > 0 and r.n_segments > 0 for r in hist)


def test_salted_join_matches_plain_and_shuffles(spark):
    """The salt must be semantically invisible (equals the plain join agg)
    and the plan must actually take the shuffle path the demo documents
    (SortMergeJoin, not broadcast)."""
    got = {(r.flag, r.n, r.qty) for r in catalog.join_salted(spark, SF).collect()}
    li = catalog.read_table(spark, SF, "lineitem")
    want = {
        (r.flag, r.n, r.qty)
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("CAST(FLOOR(l_quantity) AS BIGINT)")).cast("bigint").alias("qty"),
        )
        .collect()
    }
    assert got == want
    plan = catalog.join_salted(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan


def test_rolling_corr_bounds_and_window(spark):
    """Pearson r ∈ [−1, 1] wherever defined; defined rows have n ≥ 2;
    n never exceeds the 20-row frame."""
    rows = catalog.win_rolling_corr(spark, SF).collect()
    assert rows and all(1 <= r.n <= 20 for r in rows)
    defined = [r for r in rows if r.roll_corr is not None]
    assert defined, "some windows must have nonzero variance"
    assert all(-1.0 - 1e-12 <= r.roll_corr <= 1.0 + 1e-12 for r in defined)


def test_minhash_recall_estimator_sane(spark):
    """Candidate pairs share ≥1 shingle (banding ⇒ shared argmin), exact
    Jaccard obeys inter ≤ union, and the estimator stays in [0, 8]."""
    rows = catalog.dedup_minhash_recall(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_inter >= 1          # band agreement ⇒ shared shingle
        assert r.n_inter <= r.n_union
        assert 0 <= r.est_matches <= 8
        assert 0 <= r.jac_pct <= 100 and 0 <= r.est_pct <= 100


def test_lsh_recall_bounds_and_sampling(spark):
    """Recall stats are consistent: hits ≤ edges, ppm in [0, 1e6], and the
    ground-truth side only contains sampled (vec_id % 4 == 0) queries."""
    rows = catalog.sim_lsh_recall(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= r.n_edges
        assert 0 <= r.recall_ppm <= 1_000_000


def test_pow2_hist_bucket_invariant(spark):
    """Every bucket's min/max must satisfy 2^(k-1) ≤ v < 2^k (bin-length
    log2 exactness), and counts sum to the lineitem row count."""
    rows = catalog.agg_pow2_hist(spark, SF).collect()
    li_n = catalog.read_table(spark, SF, "lineitem").count()
    assert sum(r.n for r in rows) == li_n
    for r in rows:
        k = r.pow2_bucket
        assert 2 ** (k - 1) <= r.min_cents <= r.max_cents < 2 ** k


def test_bucketed_join_key_plan_has_no_exchange(spark):
    """The join_bucketed catalog key's executed plan must contain a
    SortMergeJoin fed by NO hash Exchange — the zero-shuffle property the
    docstring claims (bucket metadata satisfies the distribution)."""
    df = catalog.join_bucketed(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_hashing_tf_conserves_token_mass(spark):
    """Σ tf over buckets per doc == token count of the doc (hashing drops
    nothing), and buckets stay in [0, 16)."""
    rows = catalog.text_hashing_tf(spark, SF).collect()
    from collections import defaultdict

    per_doc = defaultdict(int)
    for r in rows:
        assert 0 <= r.bucket < 16
        per_doc[r.doc_id] += r.tf
    d = catalog.read_table(spark, SF, "documents")
    want = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), " ")).alias("n")
        ).collect()
    }
    assert per_doc == want


def test_countmin_sketch_properties(spark):
    """CM sketch invariants: ≤ 4×64 cells, every row's cells sum to the
    total token count (each token increments exactly one counter per
    row), counts positive."""
    rows = catalog.agg_countmin(spark, SF).collect()
    assert len(rows) <= 256
    d = catalog.read_table(spark, SF, "documents")
    n_tok = d.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
    ).collect()[0][0]
    from collections import defaultdict

    per_row = defaultdict(int)
    for r in rows:
        assert 0 <= r.row < 4 and 0 <= r.col < 64 and r.cnt > 0
        per_row[r.row] += r.cnt
    assert all(per_row[r] == n_tok for r in range(4))


def test_labelprop_communities_partition_nodes(spark):
    """Community sizes partition the node set: Σ n_members == |nodes|,
    and the result is retry-deterministic (sync rounds + pinned ties)."""
    a = {(r.community, r.n_members) for r in catalog.graph_labelprop(spark, SF).collect()}
    b = {(r.community, r.n_members) for r in catalog.graph_labelprop(spark, SF).collect()}
    assert a == b
    from varda_spark.catalog import _coorder_edges

    e = _coorder_edges(spark, SF)
    n_nodes = (
        e.select(F.col("pa").alias("v"))
        .unionAll(e.select(F.col("pb").alias("v")))
        .distinct()
        .count()
    )
    assert sum(n for _, n in a) == n_nodes


def test_topn_share_bounds(spark):
    """top10_rev ≤ total_rev; ppm within [0, 1e6]; segments with ≤ 10
    customers have share exactly 1e6."""
    for r in catalog.agg_topn_share(spark, SF).collect():
        assert 0 < r.top10_rev <= r.total_rev
        assert 0 <= r.top10_ppm <= 1_000_000
        if r.n_customers <= 10:
            assert r.top10_ppm == 1_000_000


def test_sample_qc_counts_consistent(spark):
    """n_het + n_hom ≤ n_obs (NULL zygosity excluded), ti + tv = n_obs,
    and alt never equals ref by construction (titv well-defined)."""
    rows = catalog.freq_sample_qc(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_het + r.n_hom <= r.n_obs
        assert r.n_ti + r.n_tv == r.n_obs
        if r.n_tv > 0:
            assert r.titv_ppm is not None


def test_countmin_query_upper_bounds_truth(spark):
    """The CM guarantee, visible: est ≥ true for every probe; probes are
    the exact top-20 tokens so true counts are positive."""
    rows = catalog.agg_countmin_query(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.true_cnt > 0
        assert r.est_cnt >= r.true_cnt


def test_kcore_monotone_and_invariant(spark):
    """Peeling is monotone (nodes and edges never grow round-over-round)
    and round 0 equals the raw co-purchase graph."""
    rows = {r.round: (r.n_nodes, r.n_edges) for r in catalog.graph_kcore(spark, SF).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    for r in range(1, 4):
        assert rows[r][0] <= rows[r - 1][0]
        assert rows[r][1] <= rows[r - 1][1]
    from varda_spark.catalog import _coorder_edges

    e = _coorder_edges(spark, SF)
    assert rows[0][1] == e.count()


def test_interval_cluster_partitions_intervals(spark):
    rows = catalog.interval_cluster(spark, SF).collect()
    assert len(rows) == 100  # one output row per input interval
    # cluster members must pairwise-overlap transitively: within a cluster,
    # each interval's begin is <= the running max end of earlier members
    from collections import defaultdict

    clusters = defaultdict(list)
    for r in rows:
        clusters[(r.chromosome, r.cluster)].append((r.begin, r.end))
        assert r.cluster_size >= 1
    for (_, _), ivs in clusters.items():
        ivs.sort()
        run_end = ivs[0][1]
        for b, e in ivs[1:]:
            assert b <= run_end  # overlap/touch chains the island
            run_end = max(run_end, e)
    # cluster_size agrees with actual membership
    sizes = {(r.chromosome, r.cluster): r.cluster_size for r in rows}
    for k, ivs in clusters.items():
        assert sizes[k] == len(ivs)


def test_interval_subtract_removes_exactly_b(spark):
    segs = catalog.interval_subtract(spark, SF).collect()
    a = {r.iv_id: (r.chromosome, r.ab, r.ae) for r in
         catalog._points_intervals(spark, SF)[1].select(
             F.col("sample_key").alias("iv_id"), "chromosome",
             F.col("begin").alias("ab"), F.col("end").alias("ae")).collect()}
    part = catalog.read_table(spark, SF, "part").filter(F.col("p_partkey") % 11 == 0)
    b = part.select(
        (F.col("p_partkey") % 5).cast("string").alias("chromosome"),
        (F.col("p_partkey") * 31 + 1).alias("bb"),
        (F.col("p_partkey") * 31 + 1 + 100 + (F.col("p_partkey") % 4) * 200).alias("be"),
    ).collect()
    bmap = {}
    for r in b:
        bmap.setdefault(r.chromosome, []).append((r.bb, r.be))
    for s in segs:
        chrom, ab, ae = a[s.iv_id]
        # residual segments stay inside their A interval...
        assert ab <= s.seg_begin <= s.seg_end <= ae
        # ...and never intersect any B interval
        for bb, be in bmap.get(chrom, []):
            assert s.seg_end < bb or s.seg_begin > be
    # base-count conservation: residual bases = A bases - covered bases
    total_resid = sum(s.seg_end - s.seg_begin + 1 for s in segs)
    total_a = sum(ae - ab + 1 for (_, ab, ae) in a.values())
    covered = 0
    for iv_id, (chrom, ab, ae) in a.items():
        pts = sorted(set())
        merged = []
        for bb, be in sorted(bmap.get(chrom, [])):
            lo, hi = max(ab, bb), min(ae, be)
            if lo > hi:
                continue
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        covered += sum(hi - lo + 1 for lo, hi in merged)
    assert total_resid == total_a - covered


def test_assortativity_in_pearson_range(spark):
    r = catalog.graph_assortativity(spark, SF).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_endpoints % 2 == 0  # symmetrized edge list is even-sized
    # moments are consistent: E[x^2] >= E[x]^2 (variance nonneg)
    assert r.n_endpoints * r.sum_xx >= r.sum_deg * r.sum_deg


def test_rsi_and_stochastic_bounded_ppm(spark):
    rsi = catalog.win_rsi(spark, SF).collect()
    assert rsi
    for r in rsi:
        assert r.sgain >= 0 and r.sloss >= 0
        if r.rsi_ppm is not None:
            assert 0 <= r.rsi_ppm <= 1000000
    st = catalog.win_stochastic(spark, SF).collect()
    assert st
    for r in st:
        assert r.low14 <= r.high14
        if r.pctk_ppm is not None:
            assert 0 <= r.pctk_ppm <= 1000000


def test_zipf_rank1_is_million(spark):
    rows = sorted(catalog.text_zipf(spark, SF).collect(), key=lambda r: r.rnk)
    assert rows[0].rnk == 1 and rows[0].zipf_ppm == 1000000
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
