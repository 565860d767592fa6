"""Independent reference checks for the round-7 batch-H additions.

Plain-Python / numpy references sharing no SQL text with either twin.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_rich_club_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    lp = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in lp.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    got = run(spark, "graph_rich_club").set_index("k")
    for k in (2, 4, 8, 16, 32):
        rich = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in edges if a in rich and b in rich)
        nk = len(rich)
        row = got.loc[k]
        assert int(row.n_nodes) == nk
        assert int(row.n_edges) == ek
        phi = 2 * ek * 10**6 // (nk * (nk - 1)) if nk >= 2 else 0
        assert int(row.phi_ppm) == phi


def test_coverage_gini_matches_per_base(spark):
    """Gini recomputed the O(bases) way: materialize every covered
    base's depth and apply the textbook sorted-rank formula."""
    sup = spark.read.parquet(f"{SF_001}/supplier.parquet").toPandas()
    depth: Counter = Counter()
    for sk in sup.s_suppkey:
        b = sk * 97 + 1
        e = b + 200 + (sk % 7) * 500
        chrom = sk % 5
        for pos in range(b, e):
            depth[(chrom, pos)] += 1
    ds = np.sort(np.array(list(depth.values()), dtype=np.int64))
    n = len(ds)
    s = int(ds.sum())
    # G = (2 sum i*d_i - (n+1) sum d) / (n sum d), i 1-based on sorted d
    num = 2 * int((np.arange(1, n + 1) * ds).sum()) - (n + 1) * s
    gini_ppm = 10**6 * num // (n * s)
    got = run(spark, "interval_coverage_gini")
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.covered_bases) == n
    assert int(row.mean_depth_milli) == 1000 * s // n
    assert int(row.gini_ppm) == gini_ppm
    assert int(row.n_depths) == len(set(depth.values()))


def test_bleu_pairs_matches_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    en = docs[docs.lang == "en"].sort_values("doc_id").head(20).reset_index(drop=True)
    got = run(spark, "text_bleu_pairs").set_index(["doc_a", "doc_b"])
    assert len(got) == 10
    for i in range(0, 20, 2):
        a, b = en.iloc[i], en.iloc[i + 1]
        ta, tb = a.text.strip().split(), b.text.strip().split()
        row = got.loc[(a.doc_id, b.doc_id)]
        for ngrams, col, tot_col in (
            (1, "bleu1_ppm", "n_unigrams"),
            (2, "bleu2_ppm", "n_bigrams"),
        ):
            ca = Counter(
                tuple(ta[j : j + ngrams]) for j in range(len(ta) - ngrams + 1)
            )
            cb = Counter(
                tuple(tb[j : j + ngrams]) for j in range(len(tb) - ngrams + 1)
            )
            hits = sum(min(c, cb[g]) for g, c in ca.items())
            total = sum(ca.values())
            assert int(row[tot_col]) == total
            assert int(row[col]) == 10**6 * hits // total


def test_deletion_vectors_consistent(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    ymd = pd.to_datetime(o.o_orderdate)
    o["part_ym"] = ymd.dt.year * 100 + ymd.dt.month
    o["del_"] = o.o_orderkey % 13 == 0
    ref = o.groupby("part_ym").agg(
        n_rows=("o_orderkey", "size"), n_deleted=("del_", "sum")
    )
    got = run(spark, "store_deletion_vectors").set_index("part_ym")
    assert len(got) == len(ref)
    for ym, r in ref.iterrows():
        g = got.loc[ym]
        assert int(g.n_rows) == r.n_rows
        assert int(g.n_deleted) == r.n_deleted
        # the anti-join live count must reconcile exactly
        assert int(g.n_live) == r.n_rows - r.n_deleted
        ppm = 10**6 * int(r.n_deleted) // int(r.n_rows)
        assert int(g.dv_ppm) == ppm
        assert bool(g.rewrite) == (ppm > 200000)
