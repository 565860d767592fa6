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


def test_ccnet_buckets_matches_python(spark):
    from collections import Counter, defaultdict

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    grams = {}
    counts: Counter = Counter()
    for r in docs.itertuples():
        w = r.text.strip().split(" ")
        gs = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)] if len(w) >= 2 else []
        grams[r.doc_id] = gs
        counts.update(gs)
    score = {}
    for r in docs.itertuples():
        gs = grams[r.doc_id]
        if not gs:
            continue
        logsum = sum(counts[g].bit_length() - 1 for g in gs)
        score[r.doc_id] = (r.source, 1000 * logsum // len(gs), len(gs))
    per_source = defaultdict(list)
    for doc, (src, sc, nb) in score.items():
        per_source[src].append((sc, doc, nb))
    expect = {}
    for src, rows in per_source.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        n = len(rows)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if t < extra else 0) for t in range(3)]
        i = 0
        for b, (sz, name) in enumerate(zip(sizes, ["head", "middle", "tail"])):
            chunk = rows[i : i + sz]
            i += sz
            expect[(src, name)] = (
                len(chunk),
                sum(c[2] for c in chunk),
                min(c[0] for c in chunk),
                max(c[0] for c in chunk),
            )
    got = run(spark, "text_ccnet_buckets").set_index(["source", "bucket"])
    assert len(got) == len(expect)
    for key, (nd, nb, mn, mx) in expect.items():
        row = got.loc[key]
        assert int(row.n_docs) == nd
        assert int(row.n_bigrams) == nb
        assert int(row.min_score_milli) == mn
        assert int(row.max_score_milli) == mx
