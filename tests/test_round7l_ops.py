"""Independent reference checks for the round-7 batch-M additions."""

from __future__ import annotations

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_join_skew_matches_pandas(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    cnt = li.groupby("l_partkey").size()
    total, nkeys = int(cnt.sum()), len(cnt)
    top = cnt.reset_index(name="c").sort_values(
        ["c", "l_partkey"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    got = run(spark, "qa_join_skew").sort_values("rank").reset_index(drop=True)
    assert len(got) == 10
    for i in range(10):
        r, ref = got.iloc[i], top.iloc[i]
        assert int(r.join_key) == int(ref.l_partkey)
        c = int(ref.c)
        assert int(r.n_rows) == c
        assert int(r.x_avg_ppm) == 10**6 * c * nkeys // total
        assert int(r.salt_hint) == (c * nkeys + total - 1) // total
        assert bool(r.needs_salting) == (c * nkeys > 4 * total)


def test_abc_xyz_matches_pandas(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    j = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    sd = pd.to_datetime(j.l_shipdate)
    j["m"] = sd.dt.year * 12 + sd.dt.month
    j["cents"] = (j.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    mth = j.groupby(["p_brand", "m"]).cents.sum()
    got = run(spark, "agg_abc_xyz").set_index("brand")
    stats = mth.groupby(level=0).agg(["count", "sum"])
    q = (mth**2).groupby(level=0).sum()
    order = stats["sum"].sort_values(ascending=False).index  # ties: none expected
    # recompute with explicit tie-break (sum desc, brand asc)
    order = sorted(stats.index, key=lambda b: (-int(stats.loc[b, "sum"]), b))
    grand = int(stats["sum"].sum())
    cum = 0
    for b in order:
        n, s = int(stats.loc[b, "count"]), int(stats.loc[b, "sum"])
        cum += s
        row = got.loc[b]
        assert int(row.n_months) == n
        assert int(row.total_cents) == s
        cv2 = 10**6 * (n * int(q.loc[b]) - s * s) // (s * s)
        assert int(row.cv2_ppm) == cv2
        abc = "A" if cum * 10 <= grand * 8 else "B" if cum * 100 <= grand * 95 else "C"
        assert row.abc == abc
        xyz = "X" if cv2 < 10000 else "Y" if cv2 < 40000 else "Z"
        assert row.xyz == xyz
