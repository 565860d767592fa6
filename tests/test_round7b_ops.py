"""Independent reference checks for the round-7 continuation batch A.

Same discipline as test_round5/6/7_ops: a numpy/plain-Python reference
that shares no SQL with either engine, so a bug replicated into both
oracle twins still gets caught. Also pins the scan_dpp physical plan
(dynamic partition pruning must actually fire, not just produce the
right rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_kmv_intersect_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    A = set(o.loc[o.o_orderstatus == "F", "o_custkey"])
    B = set(o.loc[o.o_orderstatus == "O", "o_custkey"])
    ska = sorted({_h60(v) for v in A})[:128]
    skb = sorted({_h60(v) for v in B})[:128]
    theta = min(ska[-1], skb[-1])
    common = len({h for h in ska if h < theta} & {h for h in skb if h < theta})
    est = common * (1 << 60) // theta
    exact = len(A & B)
    row = run(spark, "agg_kmv_intersect").iloc[0]
    assert int(row.k) == 128
    assert int(row.theta) == theta
    assert int(row.n_common) == common
    assert int(row.est_inter) == est
    assert int(row.exact_inter) == exact
    assert int(row.err_ppm) == abs(est - exact) * 1_000_000 // exact
    # the sketch estimate should be in the right ballpark of the truth
    assert abs(est - exact) / exact < 0.35


def test_l_diversity_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["qi_year"] = pd.to_datetime(o.o_orderdate).dt.year
    got = run(spark, "agg_l_diversity").set_index(["qi_year", "qi_priority"])
    for (y, p), grp in o.groupby(["qi_year", "o_orderpriority"]):
        row = got.loc[(y, p)]
        counts = grp.o_orderstatus.value_counts()
        n = len(grp)
        assert int(row.n) == n
        assert int(row.l_distinct) == len(counts)
        assert int(row.simpson_ppm) == int(counts.pow(2).sum()) * 1_000_000 // (n * n)
        assert bool(row.meets_l3) == (len(counts) >= 3)


def test_candidate_keys_matches_pandas(spark):
    e = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    e["d"] = pd.to_datetime(e.ts).dt.date
    got = run(spark, "qa_candidate_keys").set_index("candidate")
    for name, cols in [
        ("event_id", ["event_id"]),
        ("user_id,ts", ["user_id", "ts"]),
        ("user_id,event_type,day", ["user_id", "event_type", "d"]),
    ]:
        sizes = e.groupby(cols).size()
        row = got.loc[name]
        assert int(row.n_rows) == len(e)
        assert int(row.n_keys) == len(sizes)
        assert int(row.dup_rows) == len(e) - len(sizes)
        assert int(row.max_mult) == int(sizes.max())
        # bracket access: Series.is_unique is a pandas property
        assert bool(row["is_unique"]) == (int(sizes.max()) == 1)
    # event_id must actually be unique in the shipped data
    assert bool(got.loc["event_id"]["is_unique"])


def _largest_remainder(weights: dict, budget: int) -> dict:
    total = sum(weights.values())
    floors = {s: budget * w // total for s, w in weights.items()}
    rems = {s: budget * w % total for s, w in weights.items()}
    deficit = budget - sum(floors.values())
    order = sorted(weights, key=lambda s: (-rems[s], s))
    return {s: floors[s] + (1 if i < deficit else 0) for i, s in enumerate(order)}


def test_anneal_plan_budgets_exact(spark):
    got = run(spark, "text_anneal_plan")
    assert int(got.p1_tokens.sum()) == 1_000_000
    assert int(got.p2_tokens.sum()) == 250_000
    # python largest-remainder reference over the key's own rollup columns
    w1 = dict(zip(got.source, got.toks.astype(int)))
    w2 = dict(zip(got.source, got.hq_toks.astype(int)))
    p1 = _largest_remainder(w1, 1_000_000)
    p2 = _largest_remainder(w2, 250_000)
    for _, r in got.iterrows():
        assert int(r.p1_tokens) == p1[r.source]
        assert int(r.p2_tokens) == p2[r.source]
    # phase 2 must actually shift mass toward high-quality sources:
    # a source with zero hq tokens gets zero anneal budget
    zero_hq = got[got.hq_toks == 0]
    assert (zero_hq.p2_tokens == 0).all()


def test_scan_dpp_plan_has_dynamic_pruning(spark):
    df = REGISTRY["scan_dpp"].fn(spark, SF_001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = df.toPandas().set_index("ym")
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    od = pd.to_datetime(o.o_orderdate)
    o["ym"] = od.dt.year * 100 + od.dt.month
    q1 = o[od.dt.month <= 3]
    ref = q1.groupby("ym").agg(
        n=("o_orderkey", "size"), tot=("o_totalprice", lambda s: int(np.floor(s).sum()))
    )
    assert len(got) == len(ref)
    for ym, r in ref.iterrows():
        assert int(got.loc[ym].n_orders) == int(r.n)
        assert int(got.loc[ym].tot) == int(r.tot)
