"""Independent reference checks for the round-7 continuation batch C.

numpy/pandas references sharing no SQL text with either engine twin
(the test_round5/6/7_ops discipline).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_kcenter_matches_numpy_greedy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 10000
    ).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    # independent greedy farthest-point loop
    chosen = [0]  # ids sorted ascending -> index 0 is the lowest vec_id
    expect = [(1, int(ids[0]), 0)]
    for step in range(2, 9):
        d2 = np.min(
            ((X[:, None, :] - X[chosen][None, :, :]) ** 2).sum(axis=2), axis=1
        )
        j = int(np.lexsort((ids, -d2))[0])
        chosen.append(j)
        expect.append((step, int(ids[j]), int(d2[j])))
    got = run(spark, "emb_kcenter_coreset").sort_values("step")
    assert list(map(tuple, got[["step", "vec_id", "dist2"]].to_numpy())) == expect
    # selection invariants: strictly shrinking coverage radius after step 2
    radii = [e[2] for e in expect[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_partition_skew_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    od = pd.to_datetime(o.o_orderdate)
    sizes = (
        o.assign(ym=od.dt.year * 100 + od.dt.month)
        .groupby("ym")
        .size()
        .reset_index(name="n")
        .sort_values(["n", "ym"])
        .reset_index(drop=True)
    )
    n = len(sizes)
    t = int(sizes.n.sum())
    x = sizes.n.to_numpy()
    p50 = int(x[(n + 1) // 2 - 1])
    s_rank = int((np.arange(1, n + 1) * x).sum())
    gini = (2 * s_rank - (n + 1) * t) * 1_000_000 // (n * t)
    got = run(spark, "store_partition_skew").iloc[0]
    assert int(got.n_partitions) == n
    assert int(got.total_rows) == t
    assert int(got.min_rows) == int(x[0])
    assert int(got.max_rows) == int(x[-1])
    assert int(got.p50_rows) == p50
    assert int(got.skew_ppm) == int(x[-1]) * 1_000_000 // p50
    assert int(got.gini_ppm) == gini


def test_cluster_advisor_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    od = pd.to_datetime(o.o_orderdate)
    m = (od.dt.year * 12 + od.dt.month).to_numpy()
    cands = {
        "date": (od.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days.to_numpy(),
        "custkey": o.o_custkey.to_numpy(),
        "price": np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64),
    }
    months = np.sort(np.unique(m))
    rank = {mm: i + 1 for i, mm in enumerate(months)}
    got = run(spark, "store_cluster_advisor").set_index("cand")
    for cand, v in cands.items():
        v = v.astype(np.int64)
        fid = (v - v.min()) * 20 // (v.max() - v.min() + 1)
        df = pd.DataFrame({"f": fid, "m": m}).groupby("f").m.agg(["min", "max"])
        reads = sum(rank[hi] - rank[lo] + 1 for lo, hi in df.to_numpy())
        row = got.loc[cand]
        assert int(row.n_files) == len(df)
        assert int(row.n_queries) == len(months)
        assert int(row.files_read) == reads
        assert int(row.avg_files_read_ppm) == reads * 1_000_000 // (
            len(months) * len(df)
        )
    # the advisor's whole point: date-clustering dominates for a monthly
    # workload
    assert (
        got.loc["date"].avg_files_read_ppm
        < got.loc["custkey"].avg_files_read_ppm
    )
    assert got.loc["date"].avg_files_read_ppm < got.loc["price"].avg_files_read_ppm


def test_domain_score_matches_python(spark):
    d = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    tok = d.text.str.strip().str.split()
    df_counts: Counter = Counter()
    for ts, lang in zip(tok, d.lang):
        if lang == "en":
            df_counts.update(set(ts))
    seed = set(
        t for t, _ in sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    )
    got = run(spark, "text_domain_score").set_index("doc_id")
    assert len(got) == len(d)
    for doc_id, ts in zip(d.doc_id, tok):
        distinct = set(ts)
        hits = len(distinct & seed)
        row = got.loc[doc_id]
        assert int(row.n_distinct) == len(distinct)
        assert int(row.seed_hits) == hits
        assert int(row.score_ppm) == hits * 1_000_000 // len(distinct)


def test_hamming_topk_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    bits = (X >= 0).astype(np.uint8)  # n x 64 sign bits
    got = run(spark, "sim_hamming_topk")
    assert len(got) == 15
    for qi in range(5):
        ham = (bits ^ bits[qi]).sum(axis=1)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (ham[i], ids[i]),
        )[:3]
        sub = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(sub.vec_id) == [int(ids[i]) for i in order]
        assert list(sub.hamming) == [int(ham[i]) for i in order]


def test_diff_in_diff_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["treat"] = (j.c_mktsegment == "BUILDING").astype(int)
    j["post"] = (pd.to_datetime(j.o_orderdate) >= pd.Timestamp("1998-01-01")).astype(
        int
    )
    j["cents"] = np.round(j.o_totalprice.to_numpy() * 100).astype(np.int64)
    got = run(spark, "agg_diff_in_diff").iloc[0]
    means = {}
    for t in (0, 1):
        for p in (0, 1):
            cell = j[(j.treat == t) & (j.post == p)]
            assert int(got[f"n{t}{p}"]) == len(cell)
            means[(t, p)] = int(cell.cents.sum()) * 1000 // len(cell)
            assert int(got[f"m{t}{p}"]) == means[(t, p)]
    assert int(got.did_millicents) == (means[(1, 1)] - means[(1, 0)]) - (
        means[(0, 1)] - means[(0, 0)]
    )


def test_price_elasticity_matches_pandas(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    sd = pd.to_datetime(li.l_shipdate)
    li = li.assign(
        m=sd.dt.year * 12 + sd.dt.month,
        qty=np.round(li.l_quantity.to_numpy()).astype(np.int64),
        cents=np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64),
    )
    mth = (
        li.groupby("m")
        .agg(q=("qty", "sum"), r=("cents", "sum"))
        .sort_index()
        .reset_index()
    )
    mth["p"] = mth.r * 1000 // mth.q
    got = run(spark, "agg_price_elasticity").set_index("m")
    n_expected = 0
    for i in range(1, len(mth)):
        q2, q1 = int(mth.q[i]), int(mth.q[i - 1])
        p2, p1 = int(mth.p[i]), int(mth.p[i - 1])
        if p2 == p1:
            continue
        n_expected += 1
        # python // floors; the engines truncate toward zero — emulate
        num = (q2 - q1) * (p2 + p1) * 1_000_000
        den = (p2 - p1) * (q2 + q1)
        e = abs(num) // abs(den) * (1 if (num >= 0) == (den >= 0) else -1)
        row = got.loc[int(mth.m[i])]
        assert int(row.q_units) == q2
        assert int(row.p_milli) == p2
        assert int(row.elasticity_ppm) == e
    assert len(got) == n_expected


def test_shapley_attribution_matches_python(spark):
    from itertools import combinations

    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    masks: dict = {}
    conv: dict = {}
    for uid, et in zip(ev.user_id, ev.event_type):
        masks[uid] = masks.get(uid, 0) | bits.get(et, 0)
        conv[uid] = conv.get(uid, 0) or (et == "purchase")
    cu = Counter(
        masks[u] for u in masks if conv[u] and masks[u] != 0
    )

    def v(S):
        return sum(c for m, c in cu.items() if (m & S) == m)

    import math

    got = run(spark, "agg_shapley_attribution").set_index("channel")
    total = v(15)
    sum_scaled = 0
    for ch, b in bits.items():
        others = [x for x in bits.values() if x != b]
        sc = 0
        for k in range(4):
            for sub in combinations(others, k):
                S = sum(sub)
                sc += math.factorial(k) * math.factorial(3 - k) * (v(S | b) - v(S))
        row = got.loc[ch]
        assert int(row.shapley_scaled) == sc
        assert int(row.total_conv) == total
        assert int(row.shapley_ppm) == (
            sc * 1_000_000 // (24 * total) if total else 0
        )
        sum_scaled += sc
    # efficiency axiom: the shares exactly exhaust the attributable total
    assert sum_scaled == 24 * (total - v(0))


def test_tdt_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    li = li[li.l_linenumber % 3 != 2]
    li = li.assign(
        chrom=(li.l_partkey % 5).astype(str),
        pos=li.l_partkey * 31 + 1,
        gt=np.where(li.l_linenumber % 3 == 0, 2, 1),
    )
    g = (
        li.groupby(["l_suppkey", "chrom", "pos"])
        .gt.max()
        .to_dict()
    )
    sites: dict = {}
    for (sid, chrom, pos), cgt in g.items():
        if sid % 3 != 0:
            continue
        fgt = g.get((sid - 2, chrom, pos), 0)
        mgt = g.get((sid - 1, chrom, pos), 0)
        hom = (fgt == 2) + (mgt == 2)
        cap = (fgt >= 1) + (mgt >= 1)
        if not (hom <= cgt <= cap):
            continue  # Mendel error: excluded from TDT
        h = (fgt == 1) + (mgt == 1)
        b = cgt - hom
        B, C = sites.get((chrom, pos), (0, 0))
        sites[(chrom, pos)] = (B + b, C + (h - b))
    got = run(spark, "freq_tdt").set_index(["chromosome", "position"])
    expected = {k: v for k, v in sites.items() if v[0] + v[1] > 0}
    assert len(got) == len(expected)
    for (chrom, pos), (B, C) in expected.items():
        row = got.loc[(chrom, pos)]
        assert int(row.b) == B and int(row.c) == C
        assert int(row.n_informative) == B + C
        assert int(row.tdt_chi2_ppm) == (B - C) * (B - C) * 1_000_000 // (B + C)


def test_group_kfold_no_leakage_and_balance(spark):
    import hashlib

    c = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    folds = {
        ck: int(hashlib.md5(str(ck).encode()).hexdigest()[:15], 16) % 5
        for ck in c.c_custkey
    }
    n_groups = Counter(folds.values())
    n_rows = Counter(folds[ck] for ck in o.o_custkey)
    total = sum(n_rows.values())
    got = run(spark, "sample_group_kfold").set_index("fold")
    assert len(got) == 5
    for f in range(5):
        row = got.loc[f]
        assert int(row.n_groups) == n_groups[f]
        assert int(row.n_rows) == n_rows[f]
        assert int(row.rows_ppm) == n_rows[f] * 1_000_000 // total
        assert int(row.dev_ppm) == n_rows[f] * 1_000_000 // total - 200_000
    # partition property: folds exhaust the groups and the rows
    assert int(got.n_groups.sum()) == len(c)
    assert int(got.n_rows.sum()) == len(o)


def test_conductance_matches_python_lpa(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    lp = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in lp.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for jj in range(i + 1, len(ps)):
                edges.add((ps[i], ps[jj]))
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(2):
        new = {}
        for v, ns in adj.items():
            cnt = Counter(lab[n] for n in ns)
            top = max(cnt.values())
            new[v] = min(l for l, cc in cnt.items() if cc == top)
        lab = new
    m2 = 2 * len(edges)
    vol: Counter = Counter()
    cut: Counter = Counter()
    nm: Counter = Counter()
    for v, ns in adj.items():
        vol[lab[v]] += len(ns)
        nm[lab[v]] += 1
    for a, b in edges:
        if lab[a] != lab[b]:
            cut[lab[a]] += 1
            cut[lab[b]] += 1
    got = run(spark, "graph_conductance").set_index("community")
    assert len(got) == len(vol)
    for c_ in vol:
        row = got.loc[c_]
        assert int(row.n_members) == nm[c_]
        assert int(row.vol) == vol[c_]
        assert int(row.cut_edges) == cut.get(c_, 0)
        den = min(vol[c_], m2 - vol[c_])
        assert int(row.conductance_ppm) == (
            cut.get(c_, 0) * 1_000_000 // den if den else 0
        )


def test_hamming_recall_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor(X * 10000).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    bits = (X >= 0).astype(np.uint8)
    got = run(spark, "sim_hamming_recall").set_index("query_id")
    assert len(got) == 5
    for qi in range(5):
        ham = (bits ^ bits[qi]).sum(axis=1)
        others = [i for i in range(len(ids)) if ids[i] != ids[qi]]
        approx = set(
            ids[i] for i in sorted(others, key=lambda i: (ham[i], ids[i]))[:3]
        )
        d2 = ((Q - Q[qi]) ** 2).sum(axis=1)
        exact = set(
            ids[i] for i in sorted(others, key=lambda i: (d2[i], ids[i]))[:3]
        )
        row = got.loc[ids[qi]]
        hits = len(exact & approx)
        assert int(row.n_exact) == 3
        assert int(row.n_hits) == hits
        assert int(row.recall_ppm) == 1_000_000 * hits // 3


def test_atr_matches_pandas(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    ev = ev.assign(
        d=pd.to_datetime(ev.ts).dt.normalize(),
        cents=np.floor(ev.value * 100).astype(np.int64),
    )
    got = run(spark, "win_atr")
    n_rows = 0
    for et, grp in ev.groupby("event_type"):
        days = []
        for d, g in grp.sort_values(["ts", "event_id"]).groupby("d"):
            days.append(
                (d, int(g.cents.max()), int(g.cents.min()), int(g.cents.iloc[-1]))
            )
        days.sort()
        trs = []
        for i, (d, hi, lo, cl) in enumerate(days):
            if i == 0:
                tr = hi - lo
            else:
                pc = days[i - 1][3]
                tr = max(hi - lo, abs(hi - pc), abs(lo - pc))
            trs.append(tr)
            frame = trs[max(0, i - 13) : i + 1]
            atr = sum(frame) // len(frame)
            row = got[(got.event_type == et) & (got.d == d.date())]
            assert len(row) == 1
            assert int(row.tr_cents.iloc[0]) == tr
            assert int(row.atr_cents.iloc[0]) == atr
            n_rows += 1
    assert len(got) == n_rows
