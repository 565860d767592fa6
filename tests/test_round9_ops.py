"""Independent reference checks for the round-9 additions.

Pure numpy / pure-python references — no SQL text shared with the
oracle twins (the check_oracle sweep proves cross-engine equality;
these prove the SEMANTICS against a third implementation).
"""

from __future__ import annotations

import math

import numpy as np

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def _encode(emb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sign_bits[n,64] bool, quantized[n,64] int64) — float64 promotion
    then floor, matching both engines' CAST(x AS DOUBLE) discipline."""
    x = emb.astype(np.float64)
    return x >= 0.0, np.floor(x * 10000).astype(np.int64)


def test_stream_cascade_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    vecs = np.stack(emb.embedding.to_numpy())
    signs, q = _encode(vecs)

    queries = [v for v in ids if v % 97 == 3][:8]
    expect = {}
    for qid in queries:
        qi = int(np.where(ids == qid)[0][0])
        ham = (signs != signs[qi]).sum(axis=1)
        keep = (ham <= 26) & (ids != qid)
        if not keep.any():
            continue
        dots = q[keep] @ q[qi]
        cand_ids = ids[keep]
        cand_ham = ham[keep]
        # best dot, ties to the smallest vec_id
        order = np.lexsort((cand_ids, -dots))
        b = order[0]
        expect[int(qid)] = (
            int(keep.sum()),
            int(cand_ids[b]),
            int(dots[b]),
            int(cand_ham[b]),
        )

    got = {
        int(r.query_id): (int(r.n_cand), int(r.top_vec), int(r.top_dot), int(r.top_ham))
        for r in REGISTRY["stream_cascade"].fn(spark, SF_001).collect()
    }
    assert got == expect
    assert len(got) > 0  # the fixture must yield non-empty radius pools


def test_stream_cascade_radius_is_selective(spark):
    """The radius prefilter must actually prune (the point of stage 1):
    every query's pool is a strict subset of the corpus, and stage-2
    work (sum of pool sizes) is far below queries x corpus."""
    df = run(spark, "stream_cascade")
    n_corpus = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet").count()
    )
    assert (df.n_cand < n_corpus - 1).all()
    assert df.n_cand.sum() < 0.5 * len(df) * n_corpus
