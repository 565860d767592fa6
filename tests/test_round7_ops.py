"""Independent reference checks for the round-7 additions.

Same discipline as test_round5_ops/test_round6_ops: a numpy/plain-Python
reference that shares no SQL with either engine, so a bug replicated
into both oracle twins still gets caught. Also holds the freq_sex_check
reference test ADVICE r6 flagged as missing, the pq_fit quality test
(VERDICT r6 item 6), and the string-key regression for the ADC path
(ADVICE r6: pq_adc_topk hardcoded bigint ids).
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL
from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def _quantized_embeddings(spark, sf):
    emb = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000).astype(
        np.int64
    )
    return emb.vec_id.to_numpy(), X


def test_sex_check_matches_pandas(spark):
    """ADVICE r6: het count and the 0.25 is_xx boundary per sample,
    computed with pandas ops that share no formula text with either
    oracle twin."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").toPandas()
    li["g3"] = li.l_orderkey % 3
    li["g"] = np.where(li.g3 == 0, 2, np.where(li.g3 == 1, 1, 0))
    gt = (
        li.groupby([li.l_partkey.rename("site"), (li.l_suppkey % 10).rename("samp")])
        .g.min()
        .reset_index()
    )
    x = gt[gt.site % 5 == 0]
    got = run(spark, "freq_sex_check", SF_SMALL).set_index("sample_id")
    assert len(got) == x.samp.nunique()
    for samp, grp in x.groupby("samp"):
        row = got.loc[samp]
        n = len(grp)
        het = int((grp.g == 1).sum())
        assert int(row.n_x_sites) == n
        assert int(row.n_het) == het
        # truncating integer division, like python int() on the fraction
        assert int(row.het_ppm) == int(1_000_000 * het / n)
        assert bool(row.is_xx) == (1_000_000 * het // n >= 250_000)


def test_pq_fit_reduces_qerr(spark):
    """Lloyd refinement must strictly decrease total quantization error
    vs the deterministic lowest-id init (VERDICT r6 item 6)."""
    from varda_spark.operators.similarity import pq_codes, pq_fit

    e = spark.read.parquet(f"{SF_001}/embeddings.parquet")
    base = pq_codes(e, m=4, k=8).agg({"qerr": "sum"}).collect()[0][0]
    refined = pq_fit(e, m=4, k=8, iters=2)
    fit = (
        pq_codes(e, m=4, k=8, codebooks=refined).agg({"qerr": "sum"}).collect()[0][0]
    )
    assert fit < base, f"refined qerr {fit} !< init qerr {base}"


def test_pq_fit_matches_numpy_lloyd(spark):
    """pq_fit's distributed partial-sum update equals a literal
    single-process Lloyd loop (floor-mean update, first-min argmin)."""
    from varda_spark.operators.similarity import pq_fit

    ids, X = _quantized_embeddings(spark, SF_001)
    m, k, iters = 4, 8, 2
    dsub = X.shape[1] // m
    subC = [X[:k, j * dsub : (j + 1) * dsub].copy() for j in range(m)]
    for _ in range(iters):
        new = [c.copy() for c in subC]
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
            code = d2.argmin(axis=1)
            for c in range(k):
                mask = code == c
                if mask.any():
                    # python floor division on exact integer sums
                    new[j][c] = np.array(
                        [int(v) // int(mask.sum()) for v in S[mask].sum(axis=0)]
                    )
        subC = new
    e = spark.read.parquet(f"{SF_001}/embeddings.parquet")
    got = pq_fit(e, m=m, k=k, iters=iters)
    for j in range(m):
        assert (got[j] == subC[j]).all(), f"subspace {j}"


def test_ivfpq_matches_numpy_composition(spark):
    """sim_ivfpq == numpy IVF routing (argmax dot, nprobe=2) composed
    with ADC lookups restricted to probed cells."""
    ids, X = _quantized_embeddings(spark, SF_001)
    m, k, ncells, nprobe, topk = 4, 8, 8, 2, 3
    dsub = X.shape[1] // m
    C = X[:k]
    Cv = X[:ncells]
    cids = ids[:ncells]
    codes = np.zeros((len(X), m), dtype=np.int64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        Cj = C[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = ((S[:, None, :] - Cj[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    dots = X @ Cv.T  # n × ncells
    cell = cids[dots.argmax(axis=1)]
    want = {}
    for qi in range(5):
        probe = set(cids[np.lexsort((cids, -dots[qi]))[:nprobe]])
        in_probe = np.isin(cell, list(probe))
        lut = np.stack(
            [
                (
                    (X[qi, j * dsub : (j + 1) * dsub][None, :] - C[:, j * dsub : (j + 1) * dsub])
                    ** 2
                ).sum(axis=1)
                for j in range(m)
            ]
        )
        adc = sum(lut[j][codes[:, j]] for j in range(m))
        cand = np.where(in_probe)[0]
        order = cand[np.lexsort((ids[cand], adc[cand]))[:topk]]
        want[int(ids[qi])] = [
            (int(ids[i]), int(cell[i]), int(adc[i])) for i in order
        ]
    got = run(spark, "sim_ivfpq")
    assert len(got) == 5 * topk
    for qid, rows in got.groupby("query_id"):
        rows = rows.sort_values("rank")
        assert [
            (int(r.vec_id), int(r.cell_id), int(r.adc)) for r in rows.itertuples()
        ] == want[int(qid)]


def test_pq_adc_string_key(spark):
    """ADVICE r6: the ADC path must accept non-integer doc keys — the
    output schema and id handling derive from the input key type."""
    from varda_spark.operators.similarity import pq_adc_topk

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(40)
    s = e.selectExpr("concat('doc_', lpad(CAST(vec_id AS STRING), 6, '0')) AS doc_id",
                     "embedding")
    out = pq_adc_topk(s, n_queries=3, topk=2, key="doc_id").toPandas()
    assert len(out) == 6
    assert out.doc_id.str.startswith("doc_").all()
    assert out.query_id.str.startswith("doc_").all()
    # per-query ranks are 1..topk and adc is non-decreasing in rank
    for _, rows in out.groupby("query_id"):
        rows = rows.sort_values("rank")
        assert list(rows["rank"]) == [1, 2]
        assert rows.adc.is_monotonic_increasing
