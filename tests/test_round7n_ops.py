"""Independent reference checks for the round-7 batch-O additions."""

from __future__ import annotations

import math

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_forecast_topdown_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    j = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    sd = pd.to_datetime(j.l_shipdate)
    j["ym"] = sd.dt.year * 12 + sd.dt.month
    j["cents"] = (j.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    mth = j.groupby(["p_brand", "ym"]).cents.sum().reset_index()
    m = int(mth.ym.max())
    fcast = int(mth[mth.ym > m - 3].cents.sum()) // 3
    hist = mth[mth.ym > m - 12].groupby("p_brand").cents.sum()
    total = int(hist.sum())
    floors = {b: int(h) * fcast // total for b, h in hist.items()}
    rems = {b: int(h) * fcast % total for b, h in hist.items()}
    short = fcast - sum(floors.values())
    order = sorted(hist.index, key=lambda b: (-rems[b], b))
    alloc = dict(floors)
    for b in order[:short]:
        alloc[b] += 1
    got = run(spark, "agg_forecast_topdown").set_index("brand")
    assert len(got) == len(hist)
    # the allocations must sum to the forecast EXACTLY
    assert int(got.alloc_cents.sum()) == fcast
    for b, h in hist.items():
        row = got.loc[b]
        assert int(row.hist12_cents) == int(h)
        assert int(row.share_ppm) == 10**6 * int(h) // total
        assert int(row.alloc_cents) == alloc[b]


def test_index_advisor_matches_python(spark):
    emb = spark.read.parquet(f"{SF_001}/embeddings.parquet").toPandas()
    n = len(emb)
    dim = max(len(v) for v in emb.embedding)
    cells = math.isqrt(n)
    b_flat = n * dim * 4
    b_ivf = b_flat + cells * dim * 8
    b_pq = n * 4 + 4 * 8 * (dim // 4) * 8
    b_bin = n * (dim // 8)
    got = run(spark, "sim_index_advisor").set_index("budget_bytes").sort_index()
    assert list(got.index) == [1048576, 4194304, 16777216, 67108864]
    for budget, row in got.iterrows():
        assert int(row.n) == n and int(row.cells) == cells
        if b_flat <= budget:
            exp = ("flat_exact", b_flat, n)
        elif b_ivf <= budget:
            exp = ("ivf_flat", b_ivf, 2 * ((n + cells - 1) // cells))
        elif b_pq <= budget:
            exp = ("ivf_pq", b_pq, 2 * ((n + cells - 1) // cells))
        elif b_bin <= budget:
            exp = ("binary_hamming", b_bin, n)
        else:
            exp = ("disk_resident", b_pq, n)
        assert (row.recommended, int(row.index_bytes), int(row.est_rows_per_query)) == exp
