"""Independent reference checks for the round-7 batch-G additions.

numpy / fractions.Fraction references that share no SQL text with
either engine twin.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def _emb(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    Q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    return ids, labels, Q


def test_hard_negatives_matches_numpy(spark):
    ids, labels, Q = _emb(spark)
    got = run(spark, "emb_hard_negatives").set_index("anchor_id")
    assert len(got) == 5
    for a in range(5):
        dots = Q @ Q[a]
        same = (labels == labels[a]) & (ids != ids[a])
        diff = labels != labels[a]
        pos = max(
            ((dots[i], -ids[i], ids[i]) for i in np.where(same)[0]),
            key=lambda t: (t[0], t[1]),
        )
        neg = max(
            ((dots[i], -ids[i], ids[i]) for i in np.where(diff)[0]),
            key=lambda t: (t[0], t[1]),
        )
        row = got.loc[ids[a]]
        assert int(row.label) == labels[a]
        assert (int(row.pos_id), int(row.pos_dot)) == (pos[2], pos[0])
        assert (int(row.neg_id), int(row.neg_dot)) == (neg[2], neg[0])
        assert int(row.margin) == pos[0] - neg[0]


def test_kn_bigram_matches_fractions(spark):
    """Kneser-Ney probabilities recomputed with exact Fractions and a
    float discount D=0.75 (no quarters trick), then ppm-floored."""
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    from collections import Counter, defaultdict

    c_vw: Counter = Counter()
    for text in docs[docs.lang == "en"].text:
        ts = text.strip().split()
        for a, b in zip(ts, ts[1:]):
            c_vw[(a, b)] += 1
    c_v: Counter = Counter()
    n1_fwd: Counter = Counter()
    n1_bwd: Counter = Counter()
    for (v, w), c in c_vw.items():
        c_v[v] += c
        n1_fwd[v] += 1
        n1_bwd[w] += 1
    T = len(c_vw)
    got = run(spark, "text_kn_bigram")
    assert len(got) == 50
    top = sorted(c_vw.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.v, r.w) for r in got.sort_values(
        ["c_vw", "v", "w"], ascending=[False, True, True]
    ).itertuples()] == [vw for vw, _ in top]
    for r in got.itertuples():
        D = Fraction(3, 4)
        p = (
            max(Fraction(c_vw[(r.v, r.w)]) - D, 0)
            + D * n1_fwd[r.v] * Fraction(n1_bwd[r.w], T)
        ) / c_v[r.v]
        assert int(r.p_kn_ppm) == (p.numerator * 10**6) // p.denominator
        assert (int(r.c_vw), int(r.c_v)) == (c_vw[(r.v, r.w)], c_v[r.v])
        assert (int(r.n1_fwd), int(r.n1_bwd)) == (n1_fwd[r.v], n1_bwd[r.w])
        assert int(r.t_types) == T


def test_mmr_rerank_matches_numpy(spark):
    ids, _, Q = _emb(spark)
    got = run(spark, "sim_mmr_rerank")
    for a in range(5):
        rel_all = Q @ Q[a]
        mask = ids != ids[a]
        order = np.lexsort((ids[mask], -rel_all[mask]))[:10]
        pool = ids[mask][order]
        idx = [int(np.where(ids == v)[0][0]) for v in pool]
        rel = {v: int(rel_all[i]) for v, i in zip(pool, idx)}
        P = Q[idx] @ Q[idx].T
        chosen: list[int] = []
        expect = []
        for rnd in range(1, 6):
            best = None
            for j, v in enumerate(pool):
                if j in chosen:
                    continue
                pen = max(int(P[j][c]) for c in chosen) if chosen else 0
                s = rel[v] - pen
                if best is None or (s, -v) > (best[0], -best[1]):
                    best = (s, v, j)
            chosen.append(best[2])
            expect.append((rnd, best[1], best[0]))
        g = got[got.query_id == ids[a]].sort_values("round")
        assert [(int(r), int(v), int(s)) for r, v, s in zip(
            g["round"], g.vec_id, g.mmr_score
        )] == expect
