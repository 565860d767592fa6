"""Independent reference checks for the round-7 continuation batch B.

numpy/pandas references sharing no SQL text with either engine twin
(the test_round5/6/7_ops discipline).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_knn_classify_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 100).astype(
        np.int64
    )
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    got = run(spark, "emb_knn_classify").set_index("query_id")
    assert len(got) == 50
    for qi in range(50):
        dots = X @ X[qi]
        # exclude self; total order (dot desc, id asc)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-dots[i], ids[i]),
        )[:5]
        votes = Counter(labels[i] for i in order)
        # tie-break: highest count, then smallest label
        top_count = max(votes.values())
        pred = min(l for l, c in votes.items() if c == top_count)
        row = got.loc[ids[qi]]
        assert row.true_label == labels[qi]
        assert row.pred_label == pred
        assert int(row.n_votes) == votes[pred]
        assert bool(row.correct) == (pred == labels[qi])


def test_vacuum_plan_matches_pandas(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    od = pd.to_datetime(o.o_orderdate)
    o["ym"] = od.dt.year * 100 + od.dt.month
    o["d"] = od.dt.normalize()
    f = o.groupby(["ym", "d"]).o_totalprice.apply(
        lambda s: int(np.floor(s).sum())
    ).rename("bytes").reset_index()
    cutoff = f.d.max() - pd.Timedelta(days=90)
    got = run(spark, "store_vacuum_plan").set_index("ym")
    for ym, grp in f.groupby("ym"):
        latest = grp.d.max()
        deletable = grp[(grp.d < cutoff) & (grp.d != latest)]
        row = got.loc[ym]
        assert int(row.n_files) == len(grp)
        assert int(row.n_delete) == len(deletable)
        assert int(row.bytes_reclaimed) == int(deletable.bytes.sum())
        assert pd.Timestamp(row.latest_day) == latest
    # the newest-snapshot pin must hold: never delete every file of a month
    assert (got.n_delete < got.n_files).all()


def test_vocab_growth_matches_python(spark):
    d = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    first_seen: dict[str, int] = {}
    occ = Counter()
    docs = Counter()
    for _, r in d.iterrows():
        b = int(r.doc_id) % 10
        docs[b] += 1
        for t in str(r.text).strip().split(" "):
            occ[b] += 1
            if t not in first_seen or b < first_seen[t]:
                first_seen[t] = b
    new = Counter(first_seen.values())
    got = run(spark, "text_vocab_growth").set_index("bucket").sort_index()
    dc = tc = vc = 0
    for b in range(10):
        dc += docs[b]
        tc += occ[b]
        vc += new[b]
        assert int(got.loc[b].docs_cum) == dc
        assert int(got.loc[b].tokens_cum) == tc
        assert int(got.loc[b].vocab_cum) == vc
    # the curve must be concave-ish: later shards add fewer new types
    assert new[9] < new[0]


def test_gk_tau_matches_python(spark):
    e = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    x = e.event_type.to_numpy()
    y = np.floor(e.value.to_numpy() / 50).astype(np.int64)
    n = len(e)
    cells = Counter(zip(x, y))
    nx = Counter(x)
    ny = Counter(y)

    def tau_ppm(cells, margin_given, margin_pred, n):
        a = 0
        per_given: dict = {}
        for (g, p), c in cells.items():
            per_given.setdefault(g, 0)
            per_given[g] += c * c
        a = sum(s * 1_000_000 // margin_given[g] for g, s in per_given.items())
        b = sum(c * c for c in margin_pred.values()) * 1_000_000 // n
        return (a - b) * 1_000_000 // (n * 1_000_000 - b)

    row = run(spark, "agg_gk_tau").iloc[0]
    assert int(row.n) == n
    assert int(row.n_x) == len(nx)
    assert int(row.n_y) == len(ny)
    assert int(row.tau_xy_ppm) == tau_ppm(cells, nx, ny, n)
    cells_r = Counter({(b, a): c for (a, b), c in cells.items()})
    assert int(row.tau_yx_ppm) == tau_ppm(cells_r, ny, nx, n)


def test_softdedup_weights_matches_python(spark):
    d = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    h = d.text.map(lambda t: hashlib.md5(str(t).encode()).hexdigest())
    sizes = h.value_counts()
    got = run(spark, "text_softdedup_weights").set_index("doc_id")
    assert len(got) == len(d)
    for doc_id, hv in zip(d.doc_id, h):
        row = got.loc[doc_id]
        assert int(row.cluster_size) == int(sizes[hv])
        assert int(row.weight_ppm) == 1_000_000 // int(sizes[hv])
