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


def test_simhash_pairs_banding(spark):
    from varda_spark.operators.dedup import simhash_pairs

    out = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(_docs(spark), max_hamming=60).collect()}
    assert out[(1, 2)] == 0  # exact dup → identical fingerprint
    assert all(a < b for a, b in out)
    # banding guarantee: any pair within Hamming ≤ 3 shares a 15-bit chunk
    # and is therefore present (exact dups prove the plumbing end-to-end)


def test_ngram_jaccard_all_pairs(spark):
    out = {(r.doc_a, r.doc_b): r.jaccard_pct for r in ngram_jaccard(_docs(spark)).collect()}
    assert out[(1, 2)] == 100
    assert (1, 4) not in out  # no shared shingle → never a candidate


def _vecs(spark):
    return spark.createDataFrame(
        [
            Row(vec_id=0, label="a", embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=1, label="a", embedding=[1.0, 0.01, 0.0, 0.0]),  # ~dup of 0
            Row(vec_id=2, label="a", embedding=[0.0, 1.0, 0.0, 0.0]),   # orthogonal
            Row(vec_id=3, label="b", embedding=[1.0, 0.0, 0.0, 0.0]),   # other block
        ]
    )


def test_quantized_neardup(spark):
    from varda_spark.operators.similarity import quantized_neardup

    out = {(r.doc_a, r.doc_b): r.cos_pct for r in quantized_neardup(_vecs(spark), threshold_pct=80).collect()}
    assert (0, 1) in out and out[(0, 1)] >= 99
    assert (0, 2) not in out       # orthogonal
    assert (0, 3) not in out       # different block never compared


def test_ivf_topk_cells_and_ranks(spark):
    from varda_spark.operators.similarity import ivf_topk

    out = ivf_topk(_vecs(spark), n_centroids=2, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert len({r.cell_id for r in rows}) == 1  # neighbors from own cell only
    # identical vectors 0 and 3 land in the same cell (tie → lowest cell)
    # and are each other's top neighbor
    assert by_q[0][0].neighbor_id == 3 and by_q[3][0].neighbor_id == 0


def test_language_id_markers(spark):
    from varda_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of paris"),
            Row(doc_id=2, text="le chat et la vie"),
            Row(doc_id=3, text="xyzzy plugh qwerty"),
        ]
    )
    out = {r.doc_id: (r.lang_pred, r.lang_score) for r in language_id(df).collect()}
    assert out[1] == ("en", 3)
    assert out[2] == ("fr", 3)
    assert out[3] == ("unknown", 0)


def test_blocked_topk_matches_pure_df(spark):
    """The applyInPandas matmul path is bit-identical to the DF reference."""
    from varda_spark.operators.similarity import quantized_topk, quantized_topk_fast

    e = read_table(spark, SF, "embeddings")
    fast = quantized_topk_fast(e, k=3)
    ref = quantized_topk(e, k=3)
    assert fast.exceptAll(ref).count() == 0
    assert ref.exceptAll(fast).count() == 0


def test_connected_components_transitive(spark):
    """Pairs are not transitive-closed; components are: a chain 1-2, 2-3,
    5-6 plus isolated pair 8-9 yields clusters {1,2,3}, {5,6}, {8,9} with
    min-id canonical."""
    from varda_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6), (9, 8), (3, 1)], ["doc_a", "doc_b"]
    )
    got = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8}


def test_connected_components_long_chain(spark):
    """Pointer jumping: a 200-node path converges in ~log2(200) rounds —
    far under the default max_iter — and every node reaches component 0."""
    from varda_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["doc_a", "doc_b"]
    )
    got = connected_components(pairs, max_iter=12).toPandas()
    assert (got["comp"] == 0).all() and len(got) == 201


def test_kmeans_assign_properties(spark):
    """Every vector gets exactly one cell; cells are 0..k-1; assignment is
    deterministic across invocations."""
    from varda_spark.operators.similarity import kmeans_assign

    e = read_table(spark, SF, "embeddings")
    a1 = kmeans_assign(e, k=4, iters=2).toPandas().sort_values("vec_id").reset_index(drop=True)
    assert len(a1) == e.count()
    assert set(a1["cell_id"].unique()) <= set(range(4))
    a2 = kmeans_assign(e, k=4, iters=2).toPandas().sort_values("vec_id").reset_index(drop=True)
    assert a1.equals(a2)


def test_blocked_topk_max_block_split(spark):
    """The max_block guard splits oversized blocks into hash sub-blocks:
    output stays structurally valid (k rows per query, self excluded,
    neighbors from the same original block) and is exact within sub-blocks.
    """
    from pyspark.sql import functions as F

    from varda_spark.operators.similarity import blocked_topk_pandas, quantized

    e = (
        read_table(spark, SF, "embeddings")
        .limit(100)
        .select("vec_id", F.lit("one").alias("label"), quantized("embedding").alias("_q"))
    )
    out = blocked_topk_pandas(e, k=3, max_block=32).toPandas()
    # every query present, exactly k neighbors each (sub-blocks have ≥33 rows)
    assert len(out) == 100 * 3
    assert out.groupby("query_id").size().eq(3).all()
    assert (out["query_id"] != out["neighbor_id"]).all()
    # unsplit call on the same data is the exact superset ranking: rank-1
    # dot of the split run can never exceed the true rank-1 dot
    exact = blocked_topk_pandas(e, k=1, max_block=8192).toPandas().set_index("query_id")["dot_q"]
    split1 = out[out["rank"] == 1].set_index("query_id")["dot_q"]
    assert (split1 <= exact.loc[split1.index]).all()
    # degradation is observable: split rows flagged true, exact run false
    assert out["split"].all()
    assert not blocked_topk_pandas(e, k=1, max_block=8192).toPandas()["split"].any()


def test_pack_sequences_invariants(spark):
    """Every doc exactly once; bin token sums bounded by capacity unless a
    single oversized doc (flagged); bins densely numbered; deterministic."""
    from varda_spark.operators.packing import pack_sequences

    d = read_table(spark, SF, "documents")
    out = pack_sequences(d, max_tokens=256, n_shards=4).toPandas()
    assert len(out) == d.count() and out["doc_id"].is_unique
    sums = out.groupby(["shard", "bin_id"]).agg(
        total=("n_tokens", "sum"), n_docs=("doc_id", "count"), over=("overflow", "any")
    )
    bad = sums[(sums["total"] > 256) & ~((sums["n_docs"] == 1) & sums["over"])]
    assert bad.empty, f"overfull bins: {bad}"
    for _, grp in out.groupby("shard"):
        bins = sorted(grp["bin_id"].unique())
        assert bins == list(range(len(bins)))
    again = pack_sequences(d, max_tokens=256, n_shards=4).toPandas()
    key = ["shard", "bin_id", "doc_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_pack_sequences_string_keys_and_blank_text(spark):
    """String doc ids (JSONL-style) pack unchanged; blank/NULL text is 0
    tokens, not the size(split(''))==1 footgun."""
    from pyspark.sql import Row

    from varda_spark.operators.packing import pack_sequences

    d = spark.createDataFrame(
        [
            Row(doc_id="a", text="one two three"),
            Row(doc_id="b", text=""),
            Row(doc_id="c", text=None),
            Row(doc_id="d", text="  padded  words  "),
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in pack_sequences(d, max_tokens=8, n_shards=2).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert out["a"].n_tokens == 3 and out["d"].n_tokens == 2
    assert out["b"].n_tokens == 0 and out["c"].n_tokens == 0
    assert not any(r.overflow for r in out.values())


def test_udtf_sentences_matches_sql_split(spark):
    """The Python UDTF splits exactly like the SQL posexplode twin."""
    from varda_spark.catalog import REGISTRY

    got = REGISTRY["udtf_sentences"].fn(spark, SF)
    d = read_table(spark, SF, "documents").filter(F.col("doc_id") < 100)
    twin = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), r"\.")).alias("sent_idx", "raw"),
        )
        .select("doc_id", "sent_idx", F.trim(F.col("raw")).alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    assert got.exceptAll(twin).count() == 0
    assert twin.exceptAll(got).count() == 0


def test_kmeans_centroid_persistence_bit_equals_refit(spark, tmp_path):
    """Persist the fitted quantizer, reload it, and prove both the cell
    assignment and the IVF top-k are bit-identical to the refit run —
    the persisted-model path repeated ANN queries should take."""
    from varda_spark.operators.similarity import (
        blocked_topk_pandas,
        ivf_topk,
        kmeans_assign,
        kmeans_fit,
        load_centroids,
        quantized,
        save_centroids,
    )

    e = read_table(spark, SF, "embeddings").limit(400)
    cents = kmeans_fit(e, k=4, iters=2)
    save_centroids(cents, str(tmp_path / "cents"))
    loaded = load_centroids(spark, str(tmp_path / "cents"))

    refit = kmeans_assign(e, k=4, iters=2).toPandas().sort_values("vec_id").reset_index(drop=True)
    persisted = (
        kmeans_assign(e, centroids=loaded).toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert refit.equals(persisted)

    key = ["query_id", "rank"]
    t_refit = (
        ivf_topk(e, centroids=cents).toPandas().sort_values(key).reset_index(drop=True)
    )
    t_loaded = (
        ivf_topk(e, centroids=loaded).toPandas().sort_values(key).reset_index(drop=True)
    )
    assert t_refit.equals(t_loaded)


def test_cc_stars_equals_label_propagation(spark):
    """Large-star/small-star CC must produce the identical component table
    as min-label propagation on random graphs and a long chain — on BOTH
    the distributed star rounds (local_threshold=0 forces them) and the
    driver-side union-find fast path (the default at these sizes)."""
    import random

    from varda_spark.operators.dedup import cc_stars, connected_components

    for seed in (1, 2):
        rng = random.Random(seed)
        pairs = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(60)]
        pairs = [(x, y) for x, y in pairs if x != y]
        df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        fast = {r.id: r.comp for r in cc_stars(df).collect()}
        stars = {r.id: r.comp for r in cc_stars(df, local_threshold=0).collect()}
        want = {
            r.id: r.comp
            for r in connected_components(df, local_threshold=0).collect()
        }
        assert fast == want
        assert stars == want
    chain = spark.createDataFrame([(i, i + 1) for i in range(120)], ["doc_a", "doc_b"])
    got = {r.id: r.comp for r in cc_stars(chain, max_iter=15, local_threshold=0).collect()}
    assert all(v == 0 for v in got.values()) and len(got) == 121


def test_temperature_sampling_flattens_mix(spark):
    from varda_spark import catalog
    import math as _math

    SF = "/root/testdata/sf0.01"
    kept = catalog.sample_temperature(spark, SF)
    per = {r.domain: r["count"] for r in kept.groupBy("domain").count().collect()}
    docs = catalog.read_table(spark, SF, "documents")
    n = {
        r.domain: r["count"]
        for r in docs.selectExpr(
            "CASE WHEN doc_id % 100 < 60 THEN 'web'"
            " WHEN doc_id % 100 < 90 THEN 'news' ELSE 'code' END AS domain"
        ).groupBy("domain").count().collect()
    }
    # expected kept ~= sqrt(n_min * n_s): binomial 5-sigma band
    n_min = min(n.values())
    for dom, n_s in n.items():
        exp = _math.sqrt(n_min * n_s)
        sigma = _math.sqrt(exp * (1 - exp / n_s))
        assert abs(per.get(dom, 0) - exp) <= 5 * sigma + 5
    # determinism
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in kept.collect()
    )


def test_span_mask_rate_and_reconstruction(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    df = catalog.text_span_mask(spark, SF)
    agg = df.agg(F.sum("n_masked"), F.sum("n_tokens")).first()
    rate = agg[0] / agg[1]
    assert 0.10 < rate < 0.20  # 15% +- binomial noise
    # corrupted text has exactly n_tokens tokens and n_masked sentinels
    chk = df.selectExpr(
        "size(split(corrupted, ' ')) = n_tokens AS len_ok",
        "size(filter(split(corrupted, ' '), t -> t = '<extra_id>')) = n_masked AS cnt_ok",
    ).agg(F.min("len_ok"), F.min("cnt_ok")).first()
    assert chk[0] and chk[1]


def test_kmv_estimate_near_exact(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    est = {r.event_type: r for r in catalog.agg_kmv(spark, SF).collect()}
    ev = catalog.read_table(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        e = est[et].est_distinct
        if est[et].k_used < 64:
            assert e == n  # sketch below k is exact
        else:
            # KMV rel error ~ 1/sqrt(k-2) ~ 13%; allow 4x
            assert abs(e - n) / n < 0.5


def test_bloom_prefilter_has_no_false_negatives(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    row = catalog.join_bloom(spark, SF).first()
    li = catalog.read_table(spark, SF, "lineitem")
    s = catalog.read_table(spark, SF, "supplier")
    dim = s.filter(F.col("s_acctbal") > 7000).select("s_suppkey")
    n_true = li.join(dim, li["l_suppkey"] == dim["s_suppkey"], "left_semi").count()
    assert row.n_true == n_true  # bloom never drops a true match
    assert row.n_pass >= row.n_true
    assert row.n_false_pos == row.n_pass - row.n_true
    assert row.n_pass <= row.n_fact


def test_split_is_total_disjoint_and_sized(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    df = catalog.sample_split(spark, SF)
    n = catalog.read_table(spark, SF, "documents").count()
    assert df.count() == n  # total: every doc assigned exactly once
    per = {r.split: r["count"] for r in df.groupBy("split").count().collect()}
    assert set(per) <= {"train", "valid", "test"}
    # 90/5/5 within binomial 5-sigma
    import math as _m

    for name, p in [("train", 0.9), ("valid", 0.05), ("test", 0.05)]:
        exp, sig = n * p, _m.sqrt(n * p * (1 - p))
        assert abs(per.get(name, 0) - exp) <= 5 * sig + 5


def test_paragraph_dedup_kills_repeats_keeps_first(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    out = catalog.text_paragraph_dedup(spark, SF)
    rows = out.collect()
    docs = catalog.read_table(spark, SF, "documents")
    assert len(rows) == docs.count()
    assert all(r.n_kept + r.n_dropped >= r.n_kept >= 0 for r in rows)
    # every surviving span is globally unique after the pass
    spans = out.selectExpr(
        "explode(filter(transform(regexp_extract_all(clean_text, '[^.!?]+', 0),"
        " x -> trim(x)), x -> x <> '')) AS s"
    ).selectExpr("lower(s) AS s")
    dup = spans.groupBy("s").count().filter(F.col("count") > 1).count()
    assert dup == 0
    # the shipped corpus has globally unique sentences, so nothing drops
    # there; prove the dedup actually fires on a corpus WITH repeats
    import tempfile

    d = tempfile.mkdtemp(prefix="pdedup_")
    spark.createDataFrame(
        [
            (1, "Alpha beta gamma. Shared boilerplate line. Unique one."),
            (2, "Shared boilerplate line. Different prose here."),
            (3, "Shared boilerplate line."),
        ],
        "doc_id bigint, text string",
    ).write.parquet(f"{d}/documents.parquet")
    out2 = {r.doc_id: r for r in catalog.text_paragraph_dedup(spark, d).collect()}
    assert out2[1].n_dropped == 0  # first occurrence survives in doc 1
    assert out2[2].n_kept == 1 and out2[2].n_dropped == 1
    assert out2[3].n_kept == 0 and out2[3].clean_text == ""
    assert "Shared boilerplate line" in out2[1].clean_text
    assert "Shared boilerplate line" not in out2[2].clean_text


def test_cc_topologies_chain_star_islands(spark):
    """Both CC implementations (hybrid union-find/pointer-jumping and
    large-star/small-star) agree with ground truth on adversarial
    topologies: a 64-long chain (forces pointer jumping past the
    neighbor rounds), a hub star, two islands, and an isolated pair."""
    from varda_spark.operators.dedup import cc_stars, connected_components

    chain = [(i, i + 1) for i in range(100, 164)]          # one long path
    star = [(500, x) for x in range(501, 540)]              # hub
    island = [(900, 901), (901, 902), (950, 951)]           # two islands
    edges = chain + star + island
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")

    want = {}
    for a, b in edges:
        want.setdefault(a, a)
        want.setdefault(b, b)

    def find(x):
        while want[x] != x:
            x = want[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            want[hi] = lo
    truth = {x: find(x) for x in want}

    for impl in (
        lambda p: connected_components(p),                  # union-find path
        lambda p: connected_components(p, local_threshold=0),  # distributed path
        lambda p: cc_stars(p),
    ):
        got = {r.id: r.comp for r in impl(pairs).collect()}
        assert got == truth


def test_pair_dist_hist_mass_equals_pair_count(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.01"
    rows = catalog.emb_pair_dist_hist(spark, SF).collect()
    assert rows
    per_label_pairs = {
        r.label: r.n * (r.n - 1) // 2
        for r in catalog.read_table(spark, SF, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {}
    for r in rows:
        assert 0 <= r.dist_decile <= 20  # distance in [0, 2] -> decile <= 20
        got[r.label] = got.get(r.label, 0) + r.n
    assert got == {k: v for k, v in per_label_pairs.items() if v > 0}


def test_code_detect_mostly_prose_and_flags_injected_code(spark):
    from varda_spark import catalog
    from pyspark.sql import functions as F
    import tempfile

    SF = "/root/testdata/sf0.01"
    df = catalog.text_code_detect(spark, SF)
    n = df.count()
    n_code = df.filter("looks_like_code").count()
    assert n_code <= 0.05 * n  # the shipped corpus is prose
    # injected code document must trip the detector
    d = tempfile.mkdtemp(prefix="codedet_")
    spark.createDataFrame(
        [
            (1, "def main(): import os; return {x: y[0] for x in range(3)}"),
            (2, "Plain friendly prose with no punctuation tricks at all."),
        ],
        "doc_id bigint, text string",
    ).write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r.looks_like_code for r in catalog.text_code_detect(spark, d).collect()}
    assert out[1] is True and out[2] is False


def test_dup_factor_floor_is_unity(spark):
    from varda_spark import catalog

    rows = catalog.agg_dup_factor(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n_total
        assert r.dup_factor_ppm >= 1000000  # at least 1.0x by definition
