"""LLM-pipeline operator tests: dedup, similarity, simhash, jaccard."""

from pyspark.sql import Row, functions as F

from varda_spark.operators.dedup import (
    dedup_exact,
    minhash_candidates,
    ngram_jaccard,
    simhash,
)
from varda_spark.operators.similarity import cosine_topk, quantized_topk
from varda_spark.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog today"),  # exact dup
            Row(doc_id=3, text="the quick brown fox jumps over the lazy cat today"),  # near dup
            Row(doc_id=4, text="completely different words about spark engines and parquet files"),
        ]
    )


def test_dedup_exact_keeps_lowest_key(spark):
    out = dedup_exact(_docs(spark))
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3, 4}


def test_minhash_finds_near_dup(spark):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_candidates(_docs(spark), 8, 4, 3).collect()}
    assert (1, 2) in pairs  # exact dup always collides on every band
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard_scores(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=1, doc_b=3), Row(doc_a=1, doc_b=4)])
    out = {(r.doc_a, r.doc_b): r.jaccard_pct for r in ngram_jaccard(docs, pairs).collect()}
    assert out[(1, 2)] == 100
    assert 0 < out[(1, 3)] < 100
    assert (1, 4) not in out  # zero shared shingles → no row (inner join)


def test_simhash_close_for_near_dups(spark):
    out = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert out[1] == out[2]
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def test_quantized_topk_agrees_with_cosine_on_top1(spark):
    emb = read_table(spark, SF, "embeddings")
    qt = {r.query_id: r.neighbor_id for r in quantized_topk(emb, k=1).collect()}
    ct = {r.query_id: r.neighbor_id for r in cosine_topk(emb, k=1).collect()}
    # dot-product ranking vs cosine ranking agree for most near-unit vectors
    agree = sum(1 for k in qt if ct.get(k) == qt[k])
    assert agree / len(qt) > 0.8
