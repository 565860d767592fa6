"""Independent reference checks for the round-5 operator batch.

Same philosophy as test_statistics_ops.py: the DuckDB oracle proves the
two engines agree; these tests prove the MATH/ALGORITHM is right with a
numpy / plain-Python reference that shares no SQL with either twin, so a
bug replicated into both engines still gets caught.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_SMALL):
    return REGISTRY[key].fn(spark, sf).toPandas()


def _gt_matrix(spark, sf, n_samples):
    """Collected deduplicated genotype matrix, the freq-family synthesis."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_orderkey"
    ).toPandas()
    li["g"] = np.where(li.l_orderkey % 3 == 0, 2, np.where(li.l_orderkey % 3 == 1, 1, 0))
    li["sample_id"] = li.l_suppkey % n_samples
    return (
        li.groupby(["l_partkey", "sample_id"])["g"].min().reset_index()
        .rename(columns={"l_partkey": "site_id"})
    )


def test_kinship_matches_bruteforce(spark):
    """phi_ppm == the literal KING-robust formula evaluated pairwise in
    numpy over the collected genotype matrix."""
    got = run(spark, "freq_kinship").set_index(["sample_a", "sample_b"])
    gt = _gt_matrix(spark, SF_SMALL, 20)
    piv = gt.pivot(index="site_id", columns="sample_id", values="g")
    samples = sorted(piv.columns)
    checked = 0
    for i, a in enumerate(samples):
        for b in samples[i + 1:]:
            both = piv[[a, b]].dropna()
            ga, gb = both[a].to_numpy(), both[b].to_numpy()
            n_hh = int(((ga == 1) & (gb == 1)).sum())
            n_opp = int((((ga == 2) & (gb == 0)) | ((ga == 0) & (gb == 2))).sum())
            den = int((ga == 1).sum() + (gb == 1).sum())
            if den == 0:
                assert (a, b) not in got.index
                continue
            want = int(1000000 * (n_hh - 2 * n_opp) / den)  # trunc toward 0
            row = got.loc[(a, b)]
            assert int(row.phi_ppm) == want, (a, b, int(row.phi_ppm), want)
            assert int(row.n_shared) == len(both)
            checked += 1
    # sf0.001 ships 10 distinct suppliers -> 10 samples -> C(10,2) pairs
    assert checked >= 40


def test_mips_prune_equals_bruteforce_top1(spark):
    """The pruned scan's top-1 must equal the UNPRUNED exact top-1 for
    every query — the whole point of the Cauchy-Schwarz bound."""
    emb = spark.read.parquet(f"{SF_001}/embeddings.parquet").toPandas()
    q = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 100).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    got = run(spark, "sim_mips_prune", SF_001).set_index("query_id")
    n_total = len(ids)
    for qid in ids[ids % 97 == 0]:
        qi = np.where(ids == qid)[0][0]
        dots = q @ q[qi]
        dots[qi] = np.iinfo(np.int64).min  # exclude self
        best = dots.max()
        # tie resolution: smallest candidate id among maxima
        top1 = ids[dots == best].min()
        row = got.loc[qid]
        assert int(row.dot_q) == int(best)
        assert int(row.top1_id) == int(top1)
        assert int(row.n_total) == n_total
        assert 0 < int(row.scanned) <= n_total - 1


def test_hist_quantile_brackets_exact(spark):
    """Each histogram estimate must land within one 5000-wide bucket of
    the exact rank statistic."""
    o = spark.read.parquet(f"{SF_001}/orders.parquet").select("o_totalprice").toPandas()
    x = np.sort(np.floor(o.o_totalprice.to_numpy()).astype(np.int64))
    got = run(spark, "agg_hist_quantile", SF_001).set_index("p")
    for p in (50, 90, 99):
        target = -(-p * len(x) // 100)  # ceil
        exact = x[target - 1]
        est = int(got.loc[p].est_value)
        assert abs(est - exact) <= 5000, (p, est, exact)
        assert int(got.loc[p].n) == len(x)


def test_gnomad_style_consistent_with_parents(spark):
    """Fusion must not change semantics: popmax_ppm matches freq_popmax
    and chi2_ppm matches freq_hwe on every site both report."""
    fused = run(spark, "freq_gnomad_style").set_index("site_id")
    popmax = run(spark, "freq_popmax").set_index("site_id")
    hwe = run(spark, "freq_hwe").set_index("site_id")
    assert len(fused) >= len(hwe)
    for sid, row in popmax.iterrows():
        assert int(fused.loc[sid].popmax_ppm) == int(row.popmax_ppm), sid
        assert int(fused.loc[sid].popmax_pop) == int(row.popmax_pop), sid
    for sid, row in hwe.iterrows():
        assert int(fused.loc[sid].chi2_ppm) == int(row.chi2_ppm), sid
    # monomorphic sites: fused keeps the row, chi2 NULL
    mono = fused.index.difference(hwe.index)
    assert fused.loc[mono].chi2_ppm.isna().all()


def test_roh_matches_python_islands(spark):
    """Per-sample run stats == a literal python scan of the sorted
    genotype vector."""
    got = run(spark, "freq_roh").set_index("sample_id")
    gt = _gt_matrix(spark, SF_SMALL, 10)
    gt["chrom"] = gt.site_id % 5
    gt["pos"] = gt.site_id * 31 + 1
    # data-derived genome span: sum of per-chromosome max position
    # (the F_ROH denominator — fixed spans drift with sf, ADVICE r5)
    genome_bp = int(gt.groupby("chrom").pos.max().sum())
    for sid, grp in gt.groupby("sample_id"):
        runs = []
        for _, cg in grp.groupby("chrom"):
            cg = cg.sort_values("pos")
            cur = []
            for _, r in cg.iterrows():
                if r.g != 1:
                    cur.append(r.pos)
                else:
                    if len(cur) >= 5:
                        runs.append(cur)
                    cur = []
            if len(cur) >= 5:
                runs.append(cur)
        if not runs:
            assert sid not in got.index
            continue
        row = got.loc[sid]
        assert int(row.n_runs) == len(runs)
        assert int(row.longest_sites) == max(len(r) for r in runs)
        assert int(row.longest_bp) == max(max(r) - min(r) for r in runs)
        assert int(row.froh_ppm) == 1000000 * sum(max(r) - min(r) for r in runs) // genome_bp


def test_blocking_pairs_are_true_matches(spark):
    """Every reported pair must be a genuine <=3 edit-distance match on
    the composed entity string (DP Levenshtein reference), and exact
    duplicates sharing a block must be recalled."""
    got = run(spark, "dedup_blocking", SF_001)
    part = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    part["name"] = part.p_name + " " + part.p_brand
    part["block"] = part.p_name + "|" + part.p_type + "|" + part.p_size.astype(str)
    names = dict(zip(part.p_partkey, part.name))

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    sample = got.head(200)
    for _, r in sample.iterrows():
        assert lev(names[r.ent_a], names[r.ent_b]) == r.edit_dist <= 3
    # recall: identical (name, block) entities adjacent in sort order
    # must be matched at distance 0
    pairs = set(zip(got.ent_a, got.ent_b))
    dups = part.groupby(["block", "name"]).p_partkey.apply(list)
    checked = 0
    for ks in dups:
        if len(ks) >= 2:
            ks = sorted(ks)[:2]
            assert (ks[0], ks[1]) in pairs or checked > 50
            checked += 1
    assert checked > 0


def test_changepoint_matches_numpy_argmax(spark):
    """cp_day == numpy argmax of |S_i*D - i*T| per event type."""
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select("event_type", "ts").toPandas()
    ev["d"] = ev.ts.dt.date
    daily = ev.groupby(["event_type", "d"]).size().reset_index(name="x")
    got = run(spark, "agg_changepoint").set_index("event_type")
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("d")
        x = grp.x.to_numpy(np.int64)
        nd, t = len(x), x.sum()
        s = np.cumsum(x)
        i = np.arange(1, nd + 1)
        score = np.abs(s * nd - i * t)[:-1]  # last index excluded
        best = score.max()
        first = int(np.argmax(score == best))
        row = got.loc[et]
        assert int(row.score) == int(best)
        assert row.cp_day == grp.d.iloc[first]


def test_spc_zscores_match_numpy(spark):
    """z2_ppm == floor(1e6 * z^2) from numpy mean/var (cross-checked via
    the same integer identity evaluated in floats)."""
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select("event_type", "ts").toPandas()
    ev["d"] = ev.ts.dt.date
    daily = ev.groupby(["event_type", "d"]).size().reset_index(name="x")
    got = run(spark, "agg_spc_rules").set_index(["event_type", "d"])
    for et, grp in daily.groupby("event_type"):
        x = grp.x.to_numpy(np.int64)
        nd, t, q = len(x), int(x.sum()), int((x * x).sum())
        var2 = nd * q - t * t
        if var2 <= 0:
            continue
        for d, xi in zip(grp.d, x):
            dev2 = (int(xi) * nd - t) ** 2
            row = got.loc[(et, d)]
            assert int(row.z2_ppm) == 1000000 * dev2 // var2
            assert bool(row.breach_2s) == (dev2 > 4 * var2)
            assert bool(row.breach_3s) == (dev2 > 9 * var2)
