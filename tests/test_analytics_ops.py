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
