"""Independent reference checks for the round-7 batch-L additions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_nprobe_sweep_monotone_and_exact_at_full(spark):
    """Structural invariants a buggy sweep would break: recall is
    monotone non-decreasing in nprobe per query; n_exact = 3; recall at
    a given nprobe >= the certified single-point sim_recall_eval at
    nprobe=2 equality."""
    got = run(spark, "sim_nprobe_sweep")
    assert len(got) == 15
    piv = got.pivot(index="query_id", columns="nprobe", values="recall_ppm")
    for _, row in piv.iterrows():
        assert row[1] <= row[2] <= row[4]
    assert (got.n_exact == 3).all()
    single = run(spark, "sim_recall_eval").set_index("query_id")
    for qid, r in single.iterrows():
        assert int(piv.loc[qid, 2] ) == int(r.recall_ppm)


def test_rfm_migration_matches_pandas(spark):
    c = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.isin([1996, 1997])]
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    j = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
    spend = (
        j.groupby(["c_custkey", "c_nationkey", "yr"]).cents.sum().reset_index()
    )

    def ntile4(grp: pd.DataFrame) -> pd.Series:
        grp = grp.sort_values(["cents", "c_custkey"]).reset_index()
        n = len(grp)
        # SQL NTILE: first (n % 4) tiles get ceil(n/4)
        base, extra = divmod(n, 4)
        tiles = []
        for t in range(1, 5):
            tiles.extend([t] * (base + (1 if t <= extra else 0)))
        return pd.Series(tiles, index=grp["index"])

    spend["tier"] = 0
    for (nat, yr), grp in spend.groupby(["c_nationkey", "yr"]):
        spend.loc[grp.index, "tier"] = ntile4(grp)
    a = spend[spend.yr == 1996].set_index("c_custkey").tier
    b = spend[spend.yr == 1997].set_index("c_custkey").tier
    custs = set(a.index) | set(b.index)
    ref = {}
    for cu in custs:
        key = (int(a.get(cu, 0)), int(b.get(cu, 0)))
        ref[key] = ref.get(key, 0) + 1
    got = run(spark, "agg_rfm_migration")
    assert len(got) == len(ref)
    for r in got.itertuples():
        assert ref[(int(r.tier_from), int(r.tier_to))] == int(r.n_customers)


def test_holt_smooth_matches_loop(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    got = run(spark, "win_holt_smooth")
    got["d"] = pd.to_datetime(got.d).dt.date
    got = got.set_index(["prio", "d"]).sort_index()

    def tdiv2(a):
        return abs(a) // 2 * (1 if a >= 0 else -1)

    for prio, grp in o.groupby("o_orderpriority"):
        daily = grp.groupby("d").cents.sum().sort_index()
        l, b = int(daily.iloc[0]), 0
        row0 = got.loc[(prio, daily.index[0])]
        assert (int(row0.level_cents), int(row0.trend_cents)) == (l, 0)
        for day, y in daily.iloc[1:].items():
            y = int(y)
            err = y - (l + b)
            l_new = tdiv2(y + l + b)
            b = tdiv2(b + (l_new - l))
            l = l_new
            row = got.loc[(prio, day)]
            assert int(row.level_cents) == l
            assert int(row.trend_cents) == b
            assert int(row.fcast_err_cents) == err
