"""Independent reference checks for the round-7 batch-N additions."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_frame_dedup_matches_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    vids = docs[docs.doc_id % 3 == 2]
    frames = defaultdict(list)  # item -> [md5...]
    owners = defaultdict(set)  # md5 -> items
    for r in vids.itertuples():
        n = min(len(r.text) // 64, 3)
        for i in range(n + 1):
            h = hashlib.md5(r.text[i * 64 : i * 64 + 64].encode()).hexdigest()
            frames[r.doc_id].append(h)
            owners[h].add(r.doc_id)
    got = run(spark, "multimodal_frame_dedup").set_index("item_id")
    expect = {}
    for item, hs in frames.items():
        shared = sum(1 for h in hs if len(owners[h]) >= 2)
        if shared:
            expect[item] = (len(hs), shared)
    assert set(got.index) == set(expect)
    for item, (nf, ns) in expect.items():
        row = got.loc[item]
        assert int(row.n_frames) == nf
        assert int(row.n_shared) == ns
        assert int(row.shared_ppm) == 10**6 * ns // nf


def test_eb_shrinkage_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    j = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    j["ret"] = (j.l_returnflag == "R").astype(int)
    per = j.groupby("p_brand").agg(n=("ret", "size"), x=("ret", "sum"))
    N, X = int(per.n.sum()), int(per.x.sum())
    got = run(spark, "agg_eb_shrinkage").set_index("brand")
    for brand, r in per.iterrows():
        row = got.loc[brand]
        n, x = int(r.n), int(r.x)
        assert (int(row.n), int(row.x)) == (n, x)
        assert int(row.raw_ppm) == 10**6 * x // n
        assert int(row.global_ppm) == 10**6 * X // N
        assert int(row.shrunk_ppm) == 10**6 * (x * N + 50 * X) // (N * (n + 50))
        # shrinkage moves the estimate TOWARD the global rate
        raw, g, sh = 10**6 * x // n, 10**6 * X // N, int(row.shrunk_ppm)
        assert min(raw, g) - 1 <= sh <= max(raw, g) + 1


import pytest


@pytest.mark.parametrize("sf_dir", [SF_001, "/root/testdata/sf0.1"])
def test_anova_matches_python(spark, sf_dir):
    """sf0.1 is load-bearing: S²/N ≈ 1.68e19 there (1.8× int64 max), the
    scale at which the old `s*s DIV n` silently wrapped (ADVICE r7)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{sf_dir}/part.parquet").toPandas()
    j = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    j["cents"] = (j.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    n = len(j)
    s = int(j.cents.sum())
    q = int((j.cents.astype(object) ** 2).sum())
    grp = j.groupby("p_brand").cents.agg(["size", "sum"])
    k = len(grp)
    ssb_raw = sum(int(r["sum"]) ** 2 // int(r["size"]) for _, r in grp.iterrows())
    sst = q - s * s // n
    ssb = ssb_raw - s * s // n
    got = run(spark, "agg_anova_oneway", sf_dir).iloc[0]
    assert int(got.n_obs) == n and int(got.k_groups) == k
    assert int(got.ms_between_cents2) == ssb // (k - 1)
    assert int(got.ms_within_cents2) == (sst - ssb) // (n - k)
    assert int(got.eta2_ppm) == 10**6 * ssb // sst
    assert int(got.f_stat_int) == (ssb * (n - k)) // ((sst - ssb) * (k - 1))
