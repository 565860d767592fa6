"""Independent reference checks for the round-7 batch-K additions."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_threshold_curve_matches_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    sets = {}
    for r in docs.itertuples():
        w = r.text.strip().split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))} if len(w) >= 3 else {
            " ".join(w[:3])
        }
        # mirror the range(1, greatest(len-1, 1)) oracle bound: docs with
        # < 3 tokens emit the (padded) single shingle the SQL builds
        if len(w) >= 3:
            sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        sets[r.doc_id] = sh
    inv = defaultdict(set)
    for d, sh in sets.items():
        for s in sh:
            inv[s].add(d)
    pair_inter = defaultdict(int)
    for s, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_inter[(ds[i], ds[j])] += 1
    jac = {}
    for (a, b), ni in pair_inter.items():
        nu = len(sets[a]) + len(sets[b]) - ni
        jac[(a, b)] = ni * 100 // nu
    got = run(spark, "dedup_threshold_curve").set_index("threshold_pct").sort_index()
    assert list(got.index) == [20, 30, 40, 50, 60, 70, 80]
    for t in got.index:
        pairs = [p for p, j in jac.items() if j >= t]
        docs_hit = {d for p in pairs for d in p}
        row = got.loc[t]
        assert int(row.n_pairs) == len(pairs)
        assert int(row.n_docs_affected) == len(docs_hit)


def test_schema_evolution_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    got = run(spark, "store_schema_evolution").set_index("prio")
    v1 = o[o.yr == 1996]
    assert int(got.loc["PRE-EVOLUTION"].n) == len(v1)
    assert int(got.loc["PRE-EVOLUTION"].tot_cents) == int(v1.cents.sum())
    v2 = o[o.yr == 1997]
    for prio, grp in v2.groupby("o_orderpriority"):
        assert int(got.loc[prio].n) == len(grp)
        assert int(got.loc[prio].tot_cents) == int(grp.cents.sum())
    assert len(got) == 1 + v2.o_orderpriority.nunique()
