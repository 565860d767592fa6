"""Independent reference checks for the round-7 batch-Q additions."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_tail_dependence_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    j = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    j["d"] = pd.to_datetime(j.o_orderdate).dt.date
    j["s"] = np.where(j.c_mktsegment == "BUILDING", "a", "b")
    day = j.groupby(["d", "s"]).cents.sum().unstack()
    day = day.dropna()
    ca, cb = day["a"].astype(int), day["b"].astype(int)
    n = len(day)
    r = (9 * n + 9) // 10
    # rank with day tiebreak == plain sort since values can tie only on
    # (value, day) which is unique; take the r-th smallest value
    ta = int(np.sort(ca.to_numpy())[r - 1])
    tb = int(np.sort(cb.to_numpy())[r - 1])
    ex_a = int((ca > ta).sum())
    ex_b = int((cb > tb).sum())
    joint = int(((ca > ta) & (cb > tb)).sum())
    got = run(spark, "agg_tail_dependence").iloc[0]
    assert int(got.n_days) == n
    assert (int(got.thr_a_cents), int(got.thr_b_cents)) == (ta, tb)
    assert (int(got.ex_a), int(got.ex_b), int(got.joint)) == (ex_a, ex_b, joint)
    assert int(got.lambda_ppm) == 10**6 * joint // ex_b
    assert int(got.lift_ppm) == 10**6 * joint * n // (ex_a * ex_b)


def test_benford_chisq_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    cents = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    cents = cents[cents > 0]
    digits = cents.astype(str).str[0].astype(int)
    obs = digits.value_counts().to_dict()
    n = len(digits)
    ppm = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
    # cross-check the hardcoded constants against log10 itself
    for d in range(1, 10):
        assert ppm[d - 1] == int(math.log10(1 + 1 / d) * 10**6 + 0.5)
    chi2 = 0
    worst = None
    for d in range(1, 10):
        od = obs.get(d, 0)
        e = n * ppm[d - 1] // 10**6
        chi2 += 1000 * (od - e) ** 2 // e if e > 0 else 0
        key = (abs(od - e) * 10 + d, d)
        if worst is None or key > worst:
            worst = key
    got = run(spark, "agg_benford_chisq").iloc[0]
    assert int(got.n_values) == n
    assert int(got.chi2_milli) == chi2
    assert int(got.dof) == 8
    assert int(got.worst_digit) == worst[1]


def test_sequence_gaps_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    keys = sorted(int(k) for k in o.o_orderkey if k % 13 != 0)
    lo, hi, n = keys[0], keys[-1], len(keys)
    total_missing = hi - lo + 1 - n
    # intra-bucket gaps, as documented
    gaps = []
    prev = {}
    for k in keys:
        b = k // 4096
        if b in prev and k - prev[b] - 1 > 0:
            gaps.append((k - prev[b] - 1, prev[b] + 1))
        prev[b] = k
    gaps.sort(key=lambda t: (-t[0], t[1]))
    got = run(spark, "qa_sequence_gaps").sort_values("rank")
    assert len(got) == 3
    for i, (g, gs) in enumerate(gaps[:3]):
        row = got.iloc[i]
        assert (int(row.gap_len), int(row.gap_start)) == (g, gs)
        assert (int(row.key_min), int(row.key_max), int(row.n_keys)) == (lo, hi, n)
        assert int(row.total_missing) == total_missing


def test_drawdown_spell_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    got = run(spark, "win_drawdown_spell").set_index("prio")
    for prio, grp in o.groupby("o_orderpriority"):
        daily = grp.groupby("d").cents.sum().sort_index()
        equity = daily.cumsum()
        peak = equity.cummax()
        under = (equity < peak).to_numpy()
        depth = (peak - equity).to_numpy()
        spells = []
        cur_len, cur_depth = 0, 0
        for u, dp in zip(under, depth):
            if u:
                cur_len += 1
                cur_depth = max(cur_depth, int(dp))
            elif cur_len:
                spells.append((cur_len, cur_depth))
                cur_len, cur_depth = 0, 0
        if cur_len:
            spells.append((cur_len, cur_depth))
        row = got.loc[prio]
        assert int(row.n_spells) == len(spells)
        assert int(row.max_spell_days) == (max(s[0] for s in spells) if spells else 0)
        assert int(row.max_depth_cents) == (max(s[1] for s in spells) if spells else 0)
