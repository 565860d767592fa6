"""Similarity search over embedding columns (north-star K3).

Brute-force cosine top-k as the correctness baseline; label-blocked (IVF-
style) variant as the scale path. At 100 TB you never all-pairs join: the
blocking key (here `label`; in production a coarse-quantizer cell id)
bounds each bucket, and the per-bucket self-join shuffles on that key only.

Dot products use ``zip_with`` + ``aggregate`` — JVM-side, sequential fold,
deterministic. For oracle-checkable ranking the catalog uses the quantized
integer dot (associative → order-independent → exact across engines);
``cosine_topk`` below is the real float API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# Bound for the driver-side solver fast paths (kmeans_fit, kcenter_greedy):
# when the quantized corpus limit-collects under this many rows the
# inherently-sequential solver loop runs as identical integer math on the
# driver (one job) instead of one-job-per-round scheduling. Module-level so
# tests can force the distributed path on small data and assert bit-equality
# of the two paths (tests/test_round14_opt.py).
_LOCAL_SOLVER_THRESHOLD = 65536


def dot(a: str, b: str) -> Column:
    """Deterministic double dot product of two array<float|double> cols."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def quantized(a: str, scale: int = 10000) -> Column:
    """array<bigint> quantization: floor(x * scale). Integer dot products
    over these are exact and associative → engine-independent ranking."""
    return F.expr(f"transform({a}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT))")


def qdot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def sign_words64(df: DataFrame, id_col: str = "vec_id", emb: str = "embedding",
                 scale: int = 10000) -> DataFrame:
    """Encode a 64-dim embedding as two 32-bit sign words + quantized ints.

    (id, w1, w2, e_q): w1/w2 pack sign(x_i) into 8 bytes total — the
    binary-prefilter representation sim_hamming_topk / sim_cascade_rerank /
    stream_cascade all scan (bit_count(w^q) Hamming in whole-stage codegen);
    e_q is the floor-quantized integer vector for the exact re-rank stage.
    All integer math → bit-exact across engines and batch/stream."""
    lits = ", ".join(str(1 << (31 - i)) for i in range(32))

    def word(lo: int) -> str:
        return (
            f"aggregate(zip_with(slice({emb}, {lo}, 32), array({lits}),"
            " (x, p) -> CASE WHEN CAST(x AS DOUBLE) >= 0"
            " THEN p ELSE CAST(0 AS BIGINT) END),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )

    return df.select(
        id_col,
        F.expr(word(1)).alias("w1"),
        F.expr(word(33)).alias("w2"),
        quantized(emb, scale).alias("e_q"),
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    block: str | None = "label",
) -> DataFrame:
    """Top-k nearest neighbors per vector by cosine similarity.

    block=None → brute force all-pairs (baseline, small data only);
    block=<col> → IVF-style bucket self-join (the scale path).
    """
    cols = [key, vec] + ([block] if block else [])
    base = emb.select(*cols).withColumn("_norm", norm(vec))
    a = base.select([F.col(c).alias(f"a_{c}") for c in base.columns])
    b = base.select([F.col(c).alias(f"b_{c}") for c in base.columns])
    cond = F.col(f"a_{key}") != F.col(f"b_{key}")
    if block:
        cond = cond & (F.col(f"a_{block}") == F.col(f"b_{block}"))
    pairs = a.join(b, cond)
    pairs = pairs.withColumn(
        "cosine", dot(f"a_{vec}", f"b_{vec}") / (F.col("a__norm") * F.col("b__norm"))
    )
    w = Window.partitionBy(f"a_{key}").orderBy(F.col("cosine").desc(), F.col(f"b_{key}"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col(f"a_{key}").alias("query_id"),
            F.col(f"b_{key}").alias("neighbor_id"),
            "cosine",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


def blocked_topk_pandas(
    base: DataFrame,
    k: int = 3,
    *,
    key: str = "vec_id",
    block: str = "label",
    qcol: str = "_q",
    max_block: int = 8192,
) -> DataFrame:
    """Per-block exact top-k by integer dot product via applyInPandas.

    The production path: each block becomes ONE Arrow batch, the gram
    matrix is ONE int64 matmul (exact — no float ranking ambiguity), and
    every vector ships once instead of once per candidate pair. Measured
    9× faster than the pair-join formulation at sf0.1 (0.5s vs 4.6s)
    with bit-identical output (ties break by neighbor id ascending).
    The whole per-block ranking is vectorized numpy (matmul + one stable
    row-wise argsort) — no Python-level per-row loop.

    ``max_block`` bounds the Arrow batch: a block with more than
    ``max_block`` rows is split into ceil(n/max_block) sub-blocks by a
    hash of ``key`` (same shape as the dedup banding split), so a hot
    IVF cell / label can neither straggle nor OOM an executor. RECALL
    NOTE: when the split triggers, neighbors are found within the
    sub-block only — exact for any block ≤ max_block (the salt is the
    constant 0 there), approximate above it. Size max_block so that
    max_block² int64 gram cells fit executor memory (8192² = 512 MiB).
    Degradation is OBSERVABLE, not silent: every output row carries a
    ``split`` boolean — true iff its block exceeded max_block and was
    therefore ranked sub-block-only. Exact callers project it away after
    asserting (or knowing) their blocks are bounded; pipelines at scale
    can route split=true rows to a re-rank pass.
    """
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(columns=[block, "query_id", "neighbor_id", "dot_q", "rank", "split"])

    def _block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[key].to_numpy(dtype=np.int64)
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            return empty
        was_split = bool(pdf["_bn"].iloc[0] > max_block)
        blk = pdf[block].iloc[0]
        Q = np.vstack(pdf[qcol].to_numpy())
        G = Q @ Q.T  # int64, exact
        # Tie-break by neighbor id ascending, fully vectorized: permute the
        # columns into id-ascending order, then a STABLE row-wise argsort
        # on the negated dots keeps that id order within equal dots.
        col_order = np.argsort(ids, kind="stable")
        Gs = G[:, col_order]
        inv = np.empty(n, dtype=np.int64)
        inv[col_order] = np.arange(n)
        # self never ranks: sentinel below any real dot (min+1 so the
        # negation used for descending sort cannot overflow)
        Gs[np.arange(n), inv] = np.iinfo(np.int64).min + 1
        top = np.argsort(-Gs, axis=1, kind="stable")[:, :kk]
        ids_sorted = ids[col_order]
        return pd.DataFrame(
            {
                block: np.repeat(blk, n * kk),
                "query_id": np.repeat(ids, kk),
                "neighbor_id": ids_sorted[top].ravel(),
                "dot_q": np.take_along_axis(Gs, top, axis=1).ravel(),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), n),
                "split": np.repeat(was_split, n * kk),
            }
        )

    block_t = dict(base.dtypes)[block]
    schema = (
        f"{block} {block_t}, query_id bigint, neighbor_id bigint, dot_q bigint, "
        "rank bigint, split boolean"
    )
    w = Window.partitionBy(block)
    sel = (
        base.select(key, block, qcol)
        .withColumn("_bn", F.count(F.lit(1)).over(w))
        .withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(key)), F.greatest(F.lit(1), F.ceil(F.col("_bn") / max_block))),
        )
    )
    return sel.groupBy(block, "_salt").applyInPandas(_block, schema)


def quantized_topk_fast(
    emb: DataFrame,
    k: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    block: str = "label",
    scale: int = 10000,
) -> DataFrame:
    """quantized_topk semantics on the blocked-matmul path (bit-identical
    output, pytest-compared against the pure-DF reference)."""
    base = emb.select(F.col(key).alias("vec_id"), block, quantized(vec, scale).alias("_q"))
    return blocked_topk_pandas(base, k, key="vec_id", block=block).select(
        "query_id", "neighbor_id", "dot_q", "rank"
    )


def quantized_neardup(
    emb: DataFrame,
    threshold_pct: int = 80,
    key: str = "vec_id",
    vec: str = "embedding",
    block: str = "label",
    scale: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) within a block.

    cos_pct = floor(100 * dot / sqrt(|a|²·|b|²)) over integer-quantized
    vectors: the dot and squared norms are exact bigints, and the final
    sqrt/divide/floor are single correctly-rounded IEEE ops — bit-identical
    across engines. Block bounds the self-join fan-out (scale path: at
    100 TB the block key is an LSH/IVF cell, never a full cross join).
    """
    base = (
        emb.select(key, block, quantized(vec, scale).alias("_q"))
        .withColumn("_n2", qdot("_q", "_q"))
    )
    # same blocked-matmul verification as the LSH path (one gram matrix per
    # block instead of a per-pair fold) — see _blocked_cos_pairs
    return _blocked_cos_pairs(base, threshold_pct, key=key, block=block)


def ivf_topk(
    emb: DataFrame,
    n_centroids: int = 8,
    k: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest of n_centroids seed
    vectors (argmax integer dot), then exact top-k within each cell.

    The scale path for K3: centroid table is tiny → broadcast, assignment
    is map-side (no shuffle), and the self-join shuffles on cell id only.
    Centroids are the n_centroids lowest-key vectors (deterministic; a
    production system plugs in k-means output — same plan shape).

    ``centroids``: a persisted (cell_id, _ce) table from kmeans_fit /
    load_centroids — repeated queries then skip both the seed selection
    and any refit; n_centroids is ignored.
    """
    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    if centroids is not None:
        cents = centroids.select("cell_id", F.col("_ce").alias("_qc"))
    else:
        cents = (
            q_.orderBy(key).limit(n_centroids)
            .select(F.col(key).alias("cell_id"), F.col("_q").alias("_qc"))
        )
    # max-dot assignment as one numpy matmul per Arrow batch — O(n·nlist)
    # multiplies but never O(n·nlist) materialized ROWS (the previous
    # crossJoin+rank-window shape cost 294 s at sf5 with nlist=316; this
    # reads 13 s). Ties break to the smallest cell_id: rows are sorted
    # cell_id-ascending and np.argmax takes the FIRST maximum, identical
    # to the oracle's (cd DESC, cell_id) ordering.
    assigned = _assign_to_centroids_dot(q_, cents, key)
    topk = blocked_topk_pandas(
        assigned.withColumnRenamed(key, "vec_id"), k, key="vec_id", block="cell_id"
    )
    return topk.select(
        "query_id",
        F.col("cell_id").cast("bigint").alias("cell_id"),
        "neighbor_id",
        "dot_q",
        "rank",
    )


def quantized_topk(
    emb: DataFrame,
    k: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    block: str = "label",
    scale: int = 10000,
) -> DataFrame:
    """Oracle-exact variant: rank by integer quantized dot product."""
    base = emb.select(key, block, quantized(vec, scale).alias("_q"))
    a = base.select(F.col(key).alias("query_id"), F.col(block).alias("_bl"), F.col("_q").alias("_qa"))
    b = base.select(F.col(key).alias("neighbor_id"), F.col(block).alias("_bl"), F.col("_q").alias("_qb"))
    pairs = a.join(b, ["_bl"]).filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn("dot_q", qdot("_qa", "_qb"))
    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dot_q", F.col("rn").cast("bigint").alias("rank"))
    )


def lsh_hyperplane_coefs(tables: int = 4, bits: int = 4, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix for sign-random-projection LSH
    (Charikar SimHash for cosine): coefficient (t, i) is +1 iff the low bit
    of md5(f"{t}|{i}") is 0. md5 agrees across Python/Spark/DuckDB, so both
    the engine and the oracle bake the SAME literal matrix — the sketch is
    reproducible anywhere, no RNG state to ship."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{t}|{i}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1
            for i in range(dim)
        ]
        for t in range(tables * bits)
    ]


def lsh_neardup(
    emb: DataFrame,
    threshold_pct: int = 30,
    *,
    tables: int = 4,
    bits: int = 6,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    dim: int = 64,
) -> DataFrame:
    """Content-based ANN near-dup: multi-table hyperplane LSH buckets as
    candidate generation, exact quantized cosine as verification.

    Unlike the label-blocked quantized_neardup, the blocking key here is
    derived from the VECTOR itself — the true 100 TB shape when no label
    exists: `tables` independent b-bit sign sketches, a pair collides if it
    agrees on ALL b bits of ANY table (collision prob (1-θ/π)^b per table).
    Bucket fan-out is bounded by 2^bits per table; candidates are verified
    with the exact integer-math cosine before emit, so false positives cost
    only the verification dot product. All integer/single-IEEE-op math —
    oracle-exact.
    """
    buckets = lsh_buckets(emb, tables=tables, bits=bits, key=key, vec=vec, scale=scale, dim=dim)
    # a pair may collide in several tables; emit once
    return _blocked_cos_pairs(buckets, threshold_pct, key=key, block="_bucket").distinct()


def lsh_buckets(
    emb: DataFrame,
    *,
    tables: int = 4,
    bits: int = 6,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    dim: int = 64,
) -> DataFrame:
    """Tag every vector with its per-table sign-sketch bucket id (one row
    per (vector, table) after the explode). Shared by lsh_neardup (which
    verifies candidates) and lsh_candidate_pairs (which doesn't)."""
    import numpy as np

    coefs = lsh_hyperplane_coefs(tables, bits, dim)
    base = emb.select(key, quantized(vec, scale).alias("_q"))
    key_t = base.schema[key].dataType.simpleString()
    # r14 (guide §4.2): the tables·bits sign sketches were per-row
    # zip_with/aggregate folds — higher-order lambdas run interpreted
    # outside codegen, ~6M lambda invocations at sf0.1. One int64 matmul
    # per Arrow batch against the closure-shipped (tables·bits × dim)
    # hyperplane matrix computes the identical integer dots (sign ⟺
    # >= 0, same '1'/'0' string assembly, same per-table explode), and
    # _n2 is the same exact int64 self-dot.
    H = np.array(coefs, dtype=np.int64)

    def _tag(batches, H=H, tables=tables, bits=bits):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.vstack(pdf["_q"].to_numpy()).astype(np.int64)
            ids = pdf[key].to_numpy()
            n = len(pdf)
            S = Q @ H.T  # (n, tables·bits), exact int64
            sbits = np.where(S >= 0, "1", "0")
            bucket_strs = [
                [
                    f"{tb}|" + "".join(sbits[i, tb * bits:(tb + 1) * bits])
                    for tb in range(tables)
                ]
                for i in range(n)
            ]
            n2 = (Q * Q).sum(axis=1)
            yield pd.DataFrame(
                {
                    key: np.repeat(ids, tables),
                    "_q": [list(q) for q in Q for _ in range(tables)],
                    "_n2": np.repeat(n2, tables),
                    "_bucket": [b for row in bucket_strs for b in row],
                }
            )

    return base.mapInPandas(
        _tag, f"{key} {key_t}, _q array<bigint>, _n2 bigint, _bucket string"
    )


def lsh_candidate_pairs(
    emb: DataFrame,
    *,
    tables: int = 4,
    bits: int = 6,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    dim: int = 64,
) -> DataFrame:
    """Raw bucket-collision pairs (doc_a < doc_b), NO cosine verification —
    the candidate-generation surface whose recall sim_lsh_recall audits.
    Bucket equi-join, fan-out bounded by per-bucket occupancy."""
    buckets = lsh_buckets(emb, tables=tables, bits=bits, key=key, vec=vec, scale=scale, dim=dim)
    a = buckets.select(F.col(key).alias("doc_a"), F.col("_bucket").alias("_ba"))
    b = buckets.select(F.col(key).alias("doc_b"), F.col("_bucket").alias("_bb"))
    return (
        a.join(b, (F.col("_ba") == F.col("_bb")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _blocked_cos_pairs(
    blocks: DataFrame, threshold_pct: int, *, key: str, block: str
) -> DataFrame:
    """Within-block cosine-threshold pairs via ONE int64 matmul per block
    (applyInPandas), not a per-pair zip_with fold: each candidate pair's
    dot is a cell of the block's gram matrix, and fold lambdas are not
    codegen'd — measured 2.1× end-to-end on sim_lsh (1.75 s vs 3.7 s at
    sf0.1) with bit-identical output (int64 dot; float64 sqrt/div/floor
    are single IEEE ops numpy and the JVM both round correctly).

    `blocks` must carry (key, _q, _n2, block); emits (doc_a < doc_b,
    cos_pct) within each block.
    """
    import numpy as np
    import pandas as pd

    thr = threshold_pct

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cos_pct": []}).astype("int64")
        pdf = pdf.sort_values(key).reset_index(drop=True)  # triu ⇒ doc_a < doc_b
        ids = pdf[key].to_numpy(dtype=np.int64)
        Q = np.vstack(pdf["_q"].to_numpy())
        n2 = pdf["_n2"].to_numpy(dtype=np.int64)
        G = Q @ Q.T  # int64, exact
        P = np.floor(100.0 * G / np.sqrt((n2[:, None] * n2[None, :]).astype(np.float64)))
        iu, ju = np.triu_indices(n, 1)
        keep = (G[iu, ju] > 0) & (P[iu, ju] >= thr)
        return pd.DataFrame(
            {
                "doc_a": ids[iu[keep]],
                "doc_b": ids[ju[keep]],
                "cos_pct": P[iu[keep], ju[keep]].astype(np.int64),
            }
        )

    return blocks.groupBy(block).applyInPandas(
        _verify, "doc_a bigint, doc_b bigint, cos_pct bigint"
    )


# Guard on the quantizer collect in the assigners below: the centroid
# table is driver state (like any fitted model), but it is also the
# kmeans_fit/load_centroids entry point, so a user COULD hand it a
# million-row "centroid" table and silently OOM the driver. √n-sized
# tables at any realistic corpus stay far under this (√(10^9) ≈ 32k).
_MAX_CENTROID_ROWS = 262144


def _collect_centroids(cents: DataFrame, col: str):
    """Collect the k-row quantizer, bounded and cell_id-sorted."""
    import numpy as np

    crows = cents.limit(_MAX_CENTROID_ROWS + 1).collect()
    if len(crows) > _MAX_CENTROID_ROWS:
        raise ValueError(
            f"centroid table exceeds {_MAX_CENTROID_ROWS} rows; a quantizer "
            "this large is no longer driver state — reduce n_centroids "
            "(√n is the intended scale) or use a distributed join"
        )
    crows.sort(key=lambda r: r["cell_id"])
    C = np.array([r[col] for r in crows], dtype=np.int64)
    cid = np.array([r["cell_id"] for r in crows], dtype=np.int64)
    return C, cid


def _assign_to_centroids_dot(q_: DataFrame, cents: DataFrame, key: str) -> DataFrame:
    """Map-side argMAX-dot assignment of quantized vectors to a
    (cell_id, _qc) centroid table -> (key, cell_id, _q).

    Same closure-shipped k-row quantizer pattern as the L2 assigner
    below, but ranking by inner product (the sim_ivf family's metric).
    Exact & deterministic: integer dots, np.argmax takes the FIRST
    maximum over cell_id-ascending rows. The key column keeps its input
    type (string doc ids work, not just bigint vec ids); the collect is
    bounded by _MAX_CENTROID_ROWS."""
    import numpy as np

    C, cid = _collect_centroids(cents, "_qc")

    def _assign(batches, C=C, cid=cid):
        for pdf in batches:
            Q = np.vstack(pdf["_q"].to_numpy())
            S = Q @ C.T  # int64, exact
            out = pdf[[key]].copy()
            out["cell_id"] = cid[S.argmax(axis=1)]
            out["_q"] = pdf["_q"]
            yield out

    key_t = q_.schema[key].dataType.simpleString()
    return q_.mapInPandas(_assign, f"{key} {key_t}, cell_id bigint, _q array<bigint>")


def _assign_to_centroids(q_: DataFrame, cents: DataFrame, key: str) -> DataFrame:
    """Map-side argmin-L2 assignment of quantized vectors to a (cell_id,
    _ce) centroid table → (key, cell_id, _q).

    The k-row quantizer is collected (k·dim ints — the same driver state
    any fitted model holds) and closure-shipped; assignment is then one
    numpy matmul per Arrow batch on the executors. Facts never leave
    executors; an 8×64 int table rides the task binary. Exact &
    deterministic: integer scores |c|²−2x·c, np.argmin takes the FIRST
    minimum and rows are cell_id-ascending → lowest-cell tie-break,
    identical to the oracle's (score, cell_id) ordering. Key column
    keeps its input type; collect bounded by _MAX_CENTROID_ROWS."""
    import numpy as np

    C, cid = _collect_centroids(cents, "_ce")
    c2 = (C * C).sum(axis=1)

    def _assign(batches, C=C, cid=cid, c2=c2):
        for pdf in batches:
            Q = np.vstack(pdf["_q"].to_numpy())
            S = c2[None, :] - 2 * (Q @ C.T)  # int64, exact
            out = pdf[[key]].copy()
            out["cell_id"] = cid[S.argmin(axis=1)]
            out["_q"] = pdf["_q"]
            yield out

    key_t = q_.schema[key].dataType.simpleString()
    return q_.mapInPandas(_assign, f"{key} {key_t}, cell_id bigint, _q array<bigint>")


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Fit deterministic Lloyd's k-means; returns the FITTED MODEL as a
    k-row DataFrame (cell_id bigint, _ce array<bigint>) — persistable via
    save_centroids/load_centroids so repeated ANN queries skip the fit
    (the warehouse's continuous-rollup story applied to model state).

    Engine-portable by construction: init = the k lowest-key vectors
    (cell_id 0..k-1 in key order); assignment = argmin integer L2 score
    |c|² − 2x·c (ties → lowest cell); update = per-dimension
    floor(sum/count) keeping centroids integer. Every round is one
    broadcast of k centroids (map-side assignment, no shuffle) plus one
    (cell, dim)-grouped aggregate — at 100 TB the assignment scan
    dominates and parallelizes perfectly; k·64 centroid cells are
    driver-trivial. Fixed iteration count (no convergence action) keeps
    the plan static and the oracle replicable.
    """
    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    # Small-corpus fast path (the union-find / kcenter discipline):
    # Lloyd's loop is iters sequential rounds of centroid-collect +
    # assignment scan + (cell,dim) shuffle + checkpoint — ~6 jobs/round
    # of almost pure scheduling at bench scale. When the quantized corpus
    # is bounded (limit-collect, ≤ threshold+1 rows ever on the driver)
    # the IDENTICAL integer math runs in numpy in one job: same k-lowest-
    # key init, same |c|²−2x·c argmin with first-minimum (lowest-cell)
    # ties, same floor(int-sum / count) double-division update, same
    # empty-cell carry-forward. Above the threshold the distributed loop
    # below runs unchanged (r14: sim_kmeans 18 jobs → 3, 1.7 → 0.8 s).
    import numpy as np

    local_threshold = _LOCAL_SOLVER_THRESHOLD
    rows = q_.limit(local_threshold + 1).collect()
    if len(rows) <= local_threshold and rows:
        ids = np.array([r[key] for r in rows])
        X = np.array([r["_q"] for r in rows], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        X = X[order]
        C = X[:k].copy()
        for _ in range(iters):
            S = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
            a = S.argmin(axis=1)  # first minimum → lowest cell id
            for c in range(len(C)):
                m = a == c
                if m.any():
                    C[c] = np.floor(
                        X[m].sum(axis=0).astype(np.float64) / int(m.sum())
                    ).astype(np.int64)
        return emb.sparkSession.createDataFrame(
            [(c, [int(v) for v in C[c]]) for c in range(len(C))],
            "cell_id bigint, _ce array<bigint>",
        )
    # partition the k-row init window by pmod(key,1)≡0: same single task
    # over k rows, but the non-foldable constant survives Catalyst (a bare
    # literal is folded out of the partitionSpec) so WindowExec stops
    # spamming "No Partition Defined" across every log tail
    w0 = Window.partitionBy(F.pmod(F.col(key), F.lit(1))).orderBy(key)
    cents = (
        q_.orderBy(key).limit(k)
        .select((F.row_number().over(w0) - 1).alias("cell_id"), F.col("_q").alias("_ce"))
    )
    for _ in range(iters):
        assigned = _assign_to_centroids(q_, cents, key)
        # centroid update stays the exploded (cell, dim) aggregate ON
        # PURPOSE: partial aggregation combines map-side down to k·dim rows
        # before the wire, and no task ever holds a whole cell — a per-cell
        # pandas mean would ship n/k vectors to one task (straggler/OOM at
        # scale) and measured no faster
        upd = (
            assigned.select("cell_id", F.posexplode("_q").alias("dim", "v"))
            .groupBy("cell_id", "dim")
            .agg(F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).cast("bigint").alias("cv"))
            .groupBy("cell_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, cv))), x -> x.cv)"
                ).alias("_nce")
            )
        )
        cents = (
            cents.join(upd, "cell_id", "left")
            .select("cell_id", F.coalesce(F.col("_nce"), F.col("_ce")).alias("_ce"))
            # k tiny rows, but WITHOUT this each round's plan replays every
            # previous round (lineage grows multiplicatively)
            .localCheckpoint()
        )
    return cents


def save_centroids(cents: DataFrame, path: str) -> None:
    """Persist a fitted centroid table (cell_id, _ce) — k rows of bigint
    arrays, an exact parquet round-trip (no floats to perturb)."""
    cents.write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> DataFrame:
    """Load a centroid table written by save_centroids."""
    return spark.read.parquet(path)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its k-means cell → (vec_id, cell_id): the
    real coarse quantizer for IVF ANN (ivf_topk's seeded centroids upgrade
    to this output).

    ``centroids``: a previously fitted (cell_id, _ce) table (from
    kmeans_fit / load_centroids) — assignment then skips the fit entirely
    and is a single map-side pass; k/iters are ignored. Bit-equal to the
    refit path for the same model by construction (same closure-shipped
    argmin math — proven in tests/test_llm_ops.py)."""
    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    cents = centroids if centroids is not None else kmeans_fit(emb, k, iters, key, vec, scale)
    assigned = _assign_to_centroids(q_, cents, key)
    return assigned.select(key, F.col("cell_id").cast("bigint").alias("cell_id"))


# ---------------------------------------------------------------------
# Product quantization (PQ): the memory-bound ANN path. IVF bounds which
# vectors a query scans; PQ bounds the BYTES per scanned vector — m
# codes (one byte each at k<=256) replace the full float vector, and
# search runs against per-query lookup tables (ADC, Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search"). At 100 TB the
# corpus holds codes only; full vectors stay in cold storage for
# optional re-ranking.
# ---------------------------------------------------------------------


def _pq_codebooks(emb: DataFrame, m: int, k: int, key: str, vec: str, scale: int):
    """Deterministic PQ codebooks: the k lowest-key vectors' quantized
    subvectors, code id 0..k-1 in key order (the sim_ivf quantizer-init
    discipline — engine-portable, no RNG). Returns (subC, dsub, q_)."""
    import numpy as np

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    rows = q_.orderBy(key).limit(k).collect()  # k rows — driver state
    C = np.array([r["_q"] for r in rows], dtype=np.int64)
    dim = C.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    subC = [C[:, j * dsub:(j + 1) * dsub] for j in range(m)]
    return subC, dsub, q_


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
):
    """Lloyd-refine the PQ codebooks per subspace (the k-means step of
    Jégou et al. 2011 §II): init = the deterministic lowest-key
    subvectors (_pq_codebooks), then each iteration (a) assigns every
    subvector to its argmin integer-L2 codeword and (b) recomputes each
    codeword as the per-dimension floor-mean of its assigned
    subvectors (empty codewords keep their previous value). Returns the
    refined codebooks as a list of m (k × dsub) int64 arrays, passable
    to pq_codes / pq_adc_topk via ``codebooks=``.

    Scale shape: each iteration is ONE corpus pass; the mapInPandas
    kernel reduces every Arrow batch down to per-(subspace, code, dim)
    partial sums+counts BEFORE the wire (≤ m·k·dsub rows per batch —
    index metadata, not data), so the shuffle is batches·m·k·dsub tiny
    rows and the final groupBy collect is m·k·dsub rows of driver-side
    model state, same as any fitted quantizer. Exact integer math; the
    catalog keys keep the un-refined deterministic init so their DuckDB
    twins stay replicable — pq_fit is the quality lever a production
    index build runs first."""
    import numpy as np

    subC, dsub, q_ = _pq_codebooks(emb, m, k, key, vec, scale)
    for _ in range(iters):
        def _stats(batches, subC=subC, dsub=dsub, m=m, k=k):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.vstack(pdf["_q"].to_numpy())
                rows = {"j": [], "c": [], "d": [], "s": [], "n": []}
                for j in range(m):
                    Sj = Q[:, j * dsub:(j + 1) * dsub]
                    d2 = ((Sj[:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
                    code = d2.argmin(axis=1)
                    for c in range(k):
                        mask = code == c
                        n = int(mask.sum())
                        if not n:
                            continue
                        s = Sj[mask].sum(axis=0)
                        for d in range(dsub):
                            rows["j"].append(j)
                            rows["c"].append(c)
                            rows["d"].append(d)
                            rows["s"].append(int(s[d]))
                            rows["n"].append(n)
                yield pd.DataFrame(rows)

        stats = (
            q_.mapInPandas(_stats, "j int, c int, d int, s bigint, n bigint")
            .groupBy("j", "c", "d")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()  # ≤ m·k·dsub rows — fitted-model state
        )
        subC = [sc.copy() for sc in subC]
        for r in stats:
            subC[r["j"]][r["c"], r["d"]] = r["s"] // r["n"]
    return subC


def pq_codes(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    codebooks=None,
) -> DataFrame:
    """PQ-encode every vector: (key, code_0..code_{m-1}, qerr).

    Each subspace assigns to the argmin integer-L2 codeword (ties →
    lowest code id: np.argmin takes the first minimum over id-ascending
    rows — the oracle's (distance, code_id) ordering); qerr is the total
    squared quantization error, the compression-quality number a
    recall-vs-memory decision reads. One mapInPandas pass, codebooks
    closure-shipped (m·k·dsub ints); exact integer math throughout.
    ``codebooks`` (e.g. from pq_fit) overrides the deterministic
    lowest-key init."""
    import numpy as np

    subC, dsub, q_ = _pq_codebooks(emb, m, k, key, vec, scale)
    if codebooks is not None:
        subC = codebooks

    def _enc(batches, subC=subC, dsub=dsub, m=m):
        for pdf in batches:
            Q = np.vstack(pdf["_q"].to_numpy())
            out = pdf[[key]].copy()
            qerr = np.zeros(len(pdf), dtype=np.int64)
            for j in range(m):
                Sj = Q[:, j * dsub:(j + 1) * dsub]
                d2 = ((Sj[:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
                code = d2.argmin(axis=1)
                out[f"code_{j}"] = code.astype(np.int64)
                qerr += d2[np.arange(len(pdf)), code]
            out["qerr"] = qerr
            yield out

    key_t = q_.schema[key].dataType.simpleString()
    codes = ", ".join(f"code_{j} bigint" for j in range(m))
    return q_.mapInPandas(_enc, f"{key} {key_t}, {codes}, qerr bigint")


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 3,
    m: int = 4,
    k: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    codebooks=None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the n_queries
    lowest-key vectors probe the encoded corpus; distance(query, doc) =
    Σ_j LUT_j[code_j] where LUT_j[c] = ‖query_sub_j − codeword_c‖² —
    the query is never quantized, only the corpus is.

    Scale shape: the corpus-side pass reads CODES ONLY (m bigints per
    row here; m bytes in a packed layout) and computes distances by
    table lookup — no per-pair vector math. Per-Arrow-batch the kernel
    keeps just the local top-k per query (np.argpartition over the
    total (adc, key) order), so the final exact window ranks
    batches·q·topk survivors, never n·q rows — the standard two-phase
    top-k. Exact integer math; ties → lowest key. ``codebooks`` (e.g.
    from pq_fit) overrides the deterministic lowest-key init."""
    import numpy as np

    subC, dsub, q_ = _pq_codebooks(emb, m, k, key, vec, scale)
    if codebooks is not None:
        subC = codebooks
    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)  # q × dim
    qids = np.array([r[key] for r in qrows])  # key-type-generic (ADVICE r6)
    # per-query per-subspace lookup tables: q × m × k
    lut = np.stack(
        [
            ((Qm[:, j * dsub:(j + 1) * dsub][:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )

    def _scan(batches, lut=lut, qids=qids, m=m, topk=topk):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            codes = np.stack(
                [pdf[f"code_{j}"].to_numpy(dtype=np.int64) for j in range(m)], axis=1
            )  # n × m
            ids = pdf[key].to_numpy()  # native key dtype; lexsort orders it
            # adc[q, i] = Σ_j lut[q, j, codes[i, j]]
            adc = np.zeros((len(qids), n), dtype=np.int64)
            for j in range(m):
                adc += lut[:, j, :][:, codes[:, j]]
            out = {"query_id": [], key: [], "adc": []}
            kk = min(topk, n)
            for qi in range(len(qids)):
                # total order (adc, id): lexsort then take first kk
                order = np.lexsort((ids, adc[qi]))[:kk]
                out["query_id"].extend([qids[qi]] * kk)
                out[key].extend(ids[order])
                out["adc"].extend(adc[qi][order])
            yield pd.DataFrame(out)

    key_t = q_.schema[key].dataType.simpleString()
    codes_df = pq_codes(emb, m, k, key, vec, scale, codebooks=codebooks)
    local = codes_df.mapInPandas(
        _scan, f"query_id {key_t}, {key} {key_t}, adc bigint"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col(key).asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", key, "adc")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold_pct: int = 95,
    n_centroids: int | None = None,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 100,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    near-duplicate removal. Vectors cluster into √n cells (argmax
    integer dot vs the √n lowest-key seed vectors — the sim_ivf_scaled
    discipline), then only WITHIN-cell pairs are tested for cosine ≥
    threshold; the higher id of each duplicate pair is removable.
    Returns per-cell stats: (cell_id, n_vecs, n_pairs, n_dup_pairs,
    n_removed).

    Scale shape: clustering makes the pair space n·√n instead of n²
    (the SemDeDup design point — at 100 TB cells are further capped so
    a cell always fits one task, exactly as this kernel assumes). The
    within-cell stage is ONE applyInPandas per cell: a single numpy
    Gram matmul scores every pair and the task emits just the 1-row
    per-cell stats — the O(n_c²) pair rows are never materialized,
    never shuffled (the earlier cell-keyed self-join shape measured
    13.5 s at sf1; this reads 3.1 s). The cosine test is all-integer:
    dot > 0 AND dot²·10⁴ ≥ thr²·‖a‖²·‖b‖² with scale=100 quantization,
    so every product fits int64 (dot ≤ 64·10⁴ → dot²·10⁴ ≤ 4.1e15) and
    the oracle twins bit-exactly — no float cosine anywhere."""
    import numpy as np

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    if n_centroids is None:
        import math

        n_centroids = max(8, math.isqrt(q_.count()))
    cents = (
        q_.orderBy(key).limit(n_centroids)
        .select(F.col(key).alias("cell_id"), F.col("_q").alias("_qc"))
    )
    assigned = _assign_to_centroids_dot(q_, cents, key)
    thr2 = threshold_pct * threshold_pct

    def _cell_stats(pdf):
        # thr2 bound by closure, NOT a default arg: a second parameter
        # makes applyInPandas pass (grouping_key, pdf) instead of pdf
        import pandas as pd

        pdf = pdf.sort_values(key)  # a<b by id == upper triangle
        X = np.vstack(pdf["_q"].to_numpy())
        ids = pdf[key].to_numpy()
        n = len(ids)
        cell = pdf["cell_id"].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {"cell_id": [cell], "n_vecs": [n], "n_pairs": [0],
                 "n_dup_pairs": [0], "n_removed": [0]}
            )
        n2 = (X * X).sum(axis=1)
        D = X @ X.T  # int64 Gram, exact
        iu = np.triu_indices(n, 1)
        d = D[iu]
        dup = (d > 0) & (d * d * 10000 >= thr2 * n2[iu[0]] * n2[iu[1]])
        removed = np.unique(iu[1][dup])  # higher-id member of each pair
        return pd.DataFrame(
            {"cell_id": [cell], "n_vecs": [n], "n_pairs": [len(d)],
             "n_dup_pairs": [int(dup.sum())], "n_removed": [len(removed)]}
        )

    return assigned.groupBy("cell_id").applyInPandas(
        _cell_stats,
        "cell_id bigint, n_vecs bigint, n_pairs bigint, "
        "n_dup_pairs bigint, n_removed bigint",
    )


def exact_l2_topk(
    emb: DataFrame,
    n_queries: int = 5,
    topk: int = 3,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact integer-L2 top-k for a FIXED probe set: the ground truth an
    ANN index (ivf_pq_topk / pq_adc_topk) is evaluated against. The
    n_queries lowest-key vectors ride the task closure (q·dim ints);
    the corpus pass is one mapInPandas with per-Arrow-batch local top-k
    under the total (d², key) order, and the final window ranks only
    batches·q·topk survivors — linear in n for fixed q, never n·q
    materialized rows. All-integer; ties → lowest key. With
    ``exclude_self`` the probe row itself is masked out of its own
    candidate list (for comparing against indexes that exclude self,
    e.g. sim_hamming_topk)."""
    import numpy as np

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    key_t = q_.schema[key].dataType.simpleString()
    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)
    qids = np.array([r[key] for r in qrows])

    def _scan(batches, Qm=Qm, qids=qids, topk=topk, exclude_self=exclude_self):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            X = np.vstack(pdf["_q"].to_numpy())
            ids = pdf[key].to_numpy()
            # d²[q, i] = |x_i|² − 2 q·x_i + |q|²; exact int64
            d2 = (
                (X * X).sum(axis=1)[None, :]
                - 2 * (Qm @ X.T)
                + (Qm * Qm).sum(axis=1)[:, None]
            )
            out = {"query_id": [], key: [], "d2": []}
            kk = min(topk, n)
            for qi in range(len(qids)):
                if exclude_self:
                    d2[qi][ids == qids[qi]] = np.iinfo(np.int64).max - 1
                order = np.lexsort((ids, d2[qi]))[:kk]
                out["query_id"].extend([qids[qi]] * kk)
                out[key].extend(ids[order])
                out["d2"].extend(d2[qi][order])
            yield pd.DataFrame(out)

    local = q_.mapInPandas(_scan, f"query_id {key_t}, {key} {key_t}, d2 bigint")
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col(key).asc())
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", key, "d2")
    )


def query_sample_dot_topk(
    emb: DataFrame,
    n_queries: int = 50,
    topk: int = 5,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 100,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact max-dot top-k of a lowest-key query sample vs the full
    corpus in ONE scan — the similarity twin of exact_l2_topk: the
    q×dim integer query matrix rides the task closure, each Arrow
    batch is one int64 matmul (Xb @ Qᵀ), the kernel keeps the local
    top-k per query under the total (dot DESC, key ASC) order with
    SELF-matches excluded, and the final window ranks batches·q·topk
    survivors — linear in n for fixed q, never n·q materialized rows.
    ``carry`` columns (e.g. a label) ride along per neighbor row."""
    import numpy as np

    q_ = emb.select(key, *carry, quantized(vec, scale).alias("_q"))
    key_t = q_.schema[key].dataType.simpleString()
    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)
    qids = np.array([r[key] for r in qrows])

    def _scan(batches, Qm=Qm, qids=qids, topk=topk, carry=carry):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            X = np.vstack(pdf["_q"].to_numpy())
            ids = pdf[key].to_numpy()
            dots = X @ Qm.T  # n × q, exact int64
            out = {"query_id": [], key: [], "dot": []}
            for c in carry:
                out[c] = []
            kk = min(topk, n)
            cvals = {c: pdf[c].to_numpy() for c in carry}
            for qi in range(len(qids)):
                col = dots[:, qi].copy()
                col[ids == qids[qi]] = np.iinfo(np.int64).min + 1  # self out
                order = np.lexsort((ids, -col))[:kk]
                out["query_id"].extend([qids[qi]] * kk)
                out[key].extend(ids[order])
                out["dot"].extend(col[order])
                for c in carry:
                    out[c].extend(cvals[c][order])
            yield pd.DataFrame(out)

    carry_t = "".join(
        f", {c} {q_.schema[c].dataType.simpleString()}" for c in carry
    )
    local = q_.mapInPandas(_scan, f"query_id {key_t}, {key} {key_t}, dot bigint{carry_t}")
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col(key).asc())
    return (
        local.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", key, "dot", *carry)
    )


def ivf_pq_topk(
    emb: DataFrame,
    ncells: int = 8,
    nprobe: int = 2,
    n_queries: int = 5,
    topk: int = 3,
    m: int = 4,
    k: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ: the composed production ANN index. IVF routes (each query
    probes its nprobe best coarse cells), PQ compresses (the scan inside
    probed cells reads codes only, distances by ADC lookup) — together
    they bound BOTH how many rows a query touches and how many bytes
    per row, which is the whole 100 TB ANN story.

    One corpus pass encodes cell id (argmax integer dot vs the ncells
    lowest-key seed vectors — the sim_ivf discipline) AND the m PQ codes
    (argmin integer L2 per subspace). Query routing and LUT construction
    are driver-side numpy over ncells·m·k ints (index metadata, like any
    fitted model); the probe table (n_queries·nprobe rows carrying the
    LUT arrays) broadcasts into an equi-join on cell_id, so the only
    corpus-side work after encode is a broadcast-filtered scan with
    element_at lookups — whole-stage-codegen Column math, no python.
    Ties everywhere break to the lowest id; all-integer → oracle-exact.
    """
    import numpy as np

    subC, dsub, q_ = _pq_codebooks(emb, m, k, key, vec, scale)
    if codebooks is not None:  # e.g. pq_fit output; same plan shape
        subC = codebooks
    key_t = q_.schema[key].dataType.simpleString()
    crows = q_.orderBy(key).limit(ncells).collect()
    C2 = np.array([r["_q"] for r in crows], dtype=np.int64)
    cids = np.array([r[key] for r in crows])  # key-type-generic

    def _enc(batches, C2=C2, cids=cids, subC=subC, dsub=dsub, m=m):
        for pdf in batches:
            Q = np.vstack(pdf["_q"].to_numpy())
            out = pdf[[key]].copy()
            S = Q @ C2.T
            out["cell_id"] = cids[S.argmax(axis=1)]
            for j in range(m):
                Sj = Q[:, j * dsub:(j + 1) * dsub]
                d2 = ((Sj[:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
                out[f"code_{j}"] = d2.argmin(axis=1).astype(np.int64)
            yield out

    code_cols = ", ".join(f"code_{j} bigint" for j in range(m))
    enc = q_.mapInPandas(_enc, f"{key} {key_t}, cell_id {key_t}, {code_cols}")

    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)
    qids = [r[key] for r in qrows]
    qd = Qm @ C2.T  # n_queries × ncells coarse dots
    probe_rows = []
    for qi, qid in enumerate(qids):
        luts = [
            (
                (Qm[qi, j * dsub:(j + 1) * dsub][None, :] - subC[j]) ** 2
            ).sum(axis=1).tolist()
            for j in range(m)
        ]
        # nprobe best cells by (dot DESC, cell_id ASC)
        order = np.lexsort((cids, -qd[qi]))[:nprobe]
        for ci in order:
            probe_rows.append((qid, cids[ci].item(), *luts))
    lut_cols = ", ".join(f"l{j} array<bigint>" for j in range(m))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, f"query_id {key_t}, cell_id {key_t}, {lut_cols}"
    )
    j = enc.join(F.broadcast(probes), "cell_id")
    adc = None
    for jj in range(m):
        term = F.element_at(f"l{jj}", F.col(f"code_{jj}").cast("int") + 1)
        adc = term if adc is None else adc + term
    scored = j.select("query_id", key, "cell_id", adc.cast("bigint").alias("adc"))
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col(key).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", key, "cell_id", "adc")
    )


def kcenter_greedy(
    emb: DataFrame,
    k: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 10000,
) -> DataFrame:
    """Greedy k-center / farthest-point coreset selection (Gonzalez 1985;
    Sener & Savarese ICLR 2018 use exactly this traversal to pick
    maximally-diverse training subsets): seed at the lowest key, then
    k-1 rounds each adding the point FARTHEST (exact integer L2 squared
    on the floor(x*scale) grid, ties to the lowest key) from the set
    chosen so far.

    Scale: one corpus scan per round via mapInPandas — the <=k x dim
    int64 center matrix rides the task closure, each Arrow batch reduces
    to ONE candidate row (the batch-local argmax of the min-distance to
    the centers), and the global argmax is a TakeOrdered over the
    per-batch survivors; driver state is k rows by construction (the
    sim_kmeans discipline). The quantized corpus is localCheckpoint-ed
    once so the k-1 scans skip re-reading parquet and re-quantizing.

    Returns k rows (step, <key>, dist2): the selection order and the
    selected point's exact min-L2-squared coverage radius at selection
    time (step 1 is the seed, dist2 0).
    """
    import numpy as np

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    key_t = q_.schema[key].dataType.simpleString()
    # Small-corpus fast path (the union-find discipline from
    # operators/dedup.py): the greedy loop is inherently sequential —
    # k-1 round-trips of one job each — so when the quantized corpus is
    # bounded (limit-collect, never more than threshold+1 rows on the
    # driver, ~35 MB at 64 dims) the identical integer greedy runs in
    # numpy in ONE job. Exact same argmax/tie rules, so the output is
    # bit-identical; above the threshold the distributed scan loop below
    # runs unchanged (r14 profile: 11 jobs / 1.9-2.1 s → 2 jobs at sf0.1).
    local_threshold = _LOCAL_SOLVER_THRESHOLD
    rows = q_.limit(local_threshold + 1).collect()
    # `and rows` mirrors kmeans_fit's empty-input guard (ADVICE r14):
    # both solvers fall through to the distributed path on empty input
    # instead of the fast path raising IndexError at ids[0].
    if len(rows) <= local_threshold and rows:
        ids = np.array([r[key] for r in rows])
        X = np.array([r["_q"] for r in rows], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, X = ids[order], X[order]
        picks = [(1, ids[0].item(), 0)]
        mind2 = ((X - X[0]) ** 2).sum(axis=1)
        for step in range(2, k + 1):
            j = int(np.lexsort((ids, -mind2))[0])
            picks.append((step, ids[j].item(), int(mind2[j])))
            mind2 = np.minimum(mind2, ((X - X[j]) ** 2).sum(axis=1))
        return emb.sparkSession.createDataFrame(
            picks, f"step bigint, {key} {key_t}, dist2 bigint"
        )
    q_ = q_.localCheckpoint()
    seed = q_.orderBy(key).limit(1).collect()[0]
    centers = np.array([seed["_q"]], dtype=np.int64)
    picks = [(1, seed[key], 0)]
    for step in range(2, k + 1):

        def _scan(batches, C=centers):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf["_q"].to_numpy()).astype(np.int64)
                ids = pdf[key].to_numpy()
                # exact int64: |x-c|^2 <= dim * (2*scale)^2 ~ 2.6e10
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
                j = int(np.lexsort((ids, -d2))[0])
                yield pd.DataFrame(
                    {key: [ids[j]], "_d2": [int(d2[j])], "_q": [list(X[j])]}
                )

        cand = q_.mapInPandas(_scan, f"{key} {key_t}, _d2 bigint, _q array<bigint>")
        best = cand.orderBy(F.col("_d2").desc(), F.col(key).asc()).limit(1).collect()[0]
        centers = np.vstack([centers, np.array(best["_q"], dtype=np.int64)])
        picks.append((step, best[key], int(best["_d2"])))
    return emb.sparkSession.createDataFrame(
        picks, f"step bigint, {key} {key_t}, dist2 bigint"
    )


def mmr_rerank(
    emb: DataFrame,
    n_queries: int = 5,
    pool: int = 10,
    k: int = 5,
    scale: int = 1000,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of each query's dot-product top-`pool` candidates: greedily
    select `k` results maximizing relevance minus the max similarity to
    anything already selected (λ = 1/2, so the argmax reduces to
    rel − max_sim — exact integer arithmetic throughout).

    Plan shape: candidate pools come from the broadcast-query scan with
    the salted two-phase top-k (no task holds a full candidate list);
    the greedy loop then runs per query in ONE applyInPandas group of
    `pool` rows — pairwise dots are a pool×pool int64 matmul, driver
    never sees a vector. Deterministic: ties break on ascending id
    (np.lexsort, same as the oracle's (score DESC, id) ordering).
    """
    import numpy as np
    import pandas as pd

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    key_t = q_.schema[key].dataType.simpleString()
    qs = (
        q_.orderBy(key)
        .limit(n_queries)
        .select(F.col(key).alias("_qid"), F.col("_q").alias("_pq"))
    )
    cand = (
        q_.crossJoin(F.broadcast(qs))
        .filter(F.col(key) != F.col("_qid"))
        .select(
            "_qid",
            key,
            "_q",
            F.expr(
                "CAST(aggregate(zip_with(_q, _pq, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT)"
            ).alias("_rel"),
            F.expr(f"pmod(hash({key}), 64)").alias("_salt"),
        )
    )
    wloc = Window.partitionBy("_qid", "_salt").orderBy(
        F.col("_rel").desc(), F.col(key)
    )
    wglob = Window.partitionBy("_qid").orderBy(F.col("_rel").desc(), F.col(key))
    top = (
        cand.withColumn("_r", F.row_number().over(wloc))
        .filter(F.col("_r") <= pool)
        .withColumn("_rn", F.row_number().over(wglob))
        .filter(F.col("_rn") <= pool)
        .select("_qid", key, "_q", "_rel")
    )

    kk_rounds = k

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        k = kk_rounds
        pdf = pdf.sort_values(key).reset_index(drop=True)
        ids = pdf[key].to_numpy()
        rel = pdf["_rel"].to_numpy(dtype=np.int64)
        C = np.vstack(pdf["_q"].to_numpy()).astype(np.int64)
        P = C @ C.T  # pool×pool int64, exact
        n = len(pdf)
        chosen: list[int] = []
        rounds, out_ids, scores = [], [], []
        for r in range(1, min(k, n) + 1):
            if chosen:
                pen = P[:, chosen].max(axis=1)
                s = rel - pen
            else:
                s = rel.copy()
            s_mask = s.copy()
            # min+1, not min: lexsort keys on -s_mask and -int64.min
            # overflows back to the minimum (the Gs mask lesson above)
            s_mask[chosen] = np.iinfo(np.int64).min + 1
            j = int(np.lexsort((ids, -s_mask))[0])
            chosen.append(j)
            rounds.append(r)
            out_ids.append(ids[j])
            scores.append(int(s[j]))
        return pd.DataFrame(
            {
                "query_id": pdf["_qid"].iloc[0],
                "round": np.array(rounds, dtype=np.int64),
                key: out_ids,
                "mmr_score": np.array(scores, dtype=np.int64),
            }
        )

    return top.groupBy("_qid").applyInPandas(
        _greedy,
        f"query_id {key_t}, round bigint, {key} {key_t}, mmr_score bigint",
    )


def dual_retriever_pools(
    emb: DataFrame,
    n_queries: int = 5,
    pool: int = 10,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Dense-dot AND sign-Hamming candidate pools from ONE corpus scan —
    the hybrid-retrieval feeder (sim_rrf_fusion): the q×dim integer
    query matrix plus its sign bits ride the task closure; each Arrow
    batch does one int64 matmul for the dots and one for the Hamming
    counts (h = |b| + |q| − 2·B@Qᵀ on the sign matrices — exactly
    bit_count(xor) of packed words), keeps the local top-`pool` per
    query per metric, and the tiny survivor table (batches·q·2·pool
    rows) is localCheckpointed so BOTH final rank windows read it
    without re-scanning the corpus. Signs come from the quantized
    ints (floor(x·s) ≥ 0 ⟺ x ≥ 0 for s > 0, so they equal the raw
    float sign test bit-exactly). Returns (query_id, key, ra, rb)
    full-outer-merged pool ranks with 0 = not in that retriever's pool.
    """
    import numpy as np

    q_ = emb.select(key, quantized(vec, scale).alias("_q"))
    key_t = q_.schema[key].dataType.simpleString()
    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)
    qids = np.array([r[key] for r in qrows])
    QB = (Qm >= 0).astype(np.int64)
    qbsum = QB.sum(axis=1)

    def _scan(batches, Qm=Qm, qids=qids, QB=QB, qbsum=qbsum, pool=pool):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            X = np.vstack(pdf["_q"].to_numpy())
            ids = pdf[key].to_numpy()
            D = X @ Qm.T  # n × q int64, exact
            B = (X >= 0).astype(np.int64)
            H = B.sum(axis=1)[:, None] + qbsum[None, :] - 2 * (B @ QB.T)
            out = {"query_id": [], key: [], "metric": [], "score": []}
            for qi in range(len(qids)):
                # DROP the query's own row rather than sentinel-masking
                # it: with <= pool non-self candidates in a batch the
                # sentinel row would re-enter the emitted pool and
                # diverge from the oracle's WHERE vec_id != query_id
                # (ADVICE r7).
                keep = ids != qids[qi]
                ids_q = ids[keep]
                kk = min(pool, len(ids_q))
                d = D[keep, qi]
                order = np.lexsort((ids_q, -d))[:kk]
                out["query_id"].extend([qids[qi]] * kk)
                out[key].extend(ids_q[order])
                out["metric"].extend(["d"] * kk)
                out["score"].extend(d[order])
                h = H[keep, qi]
                order = np.lexsort((ids_q, h))[:kk]
                out["query_id"].extend([qids[qi]] * kk)
                out[key].extend(ids_q[order])
                out["metric"].extend(["b"] * kk)
                out["score"].extend(h[order])
            yield pd.DataFrame(out)

    local = q_.mapInPandas(
        _scan, f"query_id {key_t}, {key} {key_t}, metric string, score bigint"
    )
    surv = local.localCheckpoint()  # bounded: batches * q * 2 * pool rows
    wd = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(key).asc()
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col(key).asc()
    )
    dense = (
        surv.filter(F.col("metric") == "d")
        .withColumn("ra", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("ra") <= pool)
        .select("query_id", key, "ra")
    )
    binry = (
        surv.filter(F.col("metric") == "b")
        .withColumn("rb", F.row_number().over(wb).cast("bigint"))
        .filter(F.col("rb") <= pool)
        .select("query_id", key, "rb")
    )
    return dense.join(binry, ["query_id", key], "full_outer")


def ivf_pq_nprobe_sweep(
    emb: DataFrame,
    nprobes: tuple[int, ...] = (1, 2, 4),
    ncells: int = 8,
    n_queries: int = 5,
    topk: int = 3,
    m: int = 4,
    k: int = 8,
    key: str = "vec_id",
    vec: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Recall-vs-nprobe sweep for the IVF-PQ index — the tuning curve an
    ANN deployment reads before fixing nprobe (the speed/recall dial):
    ONE corpus encode (cells + PQ codes, the ivf_pq_topk kernel), ONE
    probe join carrying each probed cell's rank, then every requested
    nprobe is a filter over that shared scored table (a 3-row broadcast
    spine — never a re-encode, never a rescan per configuration), each
    ranked top-k and scored against the exact integer-L2 ground truth.
    Returns (nprobe, query_id, n_exact, n_hits, recall_ppm)."""
    import numpy as np

    subC, dsub, q_ = _pq_codebooks(emb, m, k, key, vec, scale)
    key_t = q_.schema[key].dataType.simpleString()
    crows = q_.orderBy(key).limit(ncells).collect()
    C2 = np.array([r["_q"] for r in crows], dtype=np.int64)
    cids = np.array([r[key] for r in crows])
    maxp = max(nprobes)

    def _enc(batches, C2=C2, cids=cids, subC=subC, dsub=dsub, m=m):
        for pdf in batches:
            Q = np.vstack(pdf["_q"].to_numpy())
            out = pdf[[key]].copy()
            S = Q @ C2.T
            out["cell_id"] = cids[S.argmax(axis=1)]
            for j in range(m):
                Sj = Q[:, j * dsub:(j + 1) * dsub]
                d2 = ((Sj[:, None, :] - subC[j][None, :, :]) ** 2).sum(axis=2)
                out[f"code_{j}"] = d2.argmin(axis=1).astype(np.int64)
            yield out

    code_cols = ", ".join(f"code_{j} bigint" for j in range(m))
    enc = q_.mapInPandas(_enc, f"{key} {key_t}, cell_id {key_t}, {code_cols}")

    qrows = q_.orderBy(key).limit(n_queries).collect()
    Qm = np.array([r["_q"] for r in qrows], dtype=np.int64)
    qids = [r[key] for r in qrows]
    qd = Qm @ C2.T
    probe_rows = []
    for qi, qid in enumerate(qids):
        luts = [
            ((Qm[qi, j * dsub:(j + 1) * dsub][None, :] - subC[j]) ** 2)
            .sum(axis=1)
            .tolist()
            for j in range(m)
        ]
        order = np.lexsort((cids, -qd[qi]))[:maxp]
        for pr, ci in enumerate(order, start=1):
            probe_rows.append((qid, cids[ci].item(), pr, *luts))
    lut_cols = ", ".join(f"l{j} array<bigint>" for j in range(m))
    probes = emb.sparkSession.createDataFrame(
        probe_rows, f"query_id {key_t}, cell_id {key_t}, pr bigint, {lut_cols}"
    )
    j = enc.join(F.broadcast(probes), "cell_id")
    adc = None
    for jj in range(m):
        term = F.element_at(f"l{jj}", F.col(f"code_{jj}").cast("int") + 1)
        adc = term if adc is None else adc + term
    scored = j.select(
        "query_id", key, "pr", adc.cast("bigint").alias("adc")
    )
    spine = emb.sparkSession.range(1).select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(f"CAST({n} AS BIGINT)" for n in nprobes)
                + ")"
            )
        ).alias("nprobe")
    )
    cand = scored.crossJoin(F.broadcast(spine)).filter(F.col("pr") <= F.col("nprobe"))
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("adc").asc(), F.col(key).asc()
    )
    approx = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("nprobe", "query_id", F.col(key).alias("a_vec"))
    )
    ex = exact_l2_topk(
        emb, n_queries=n_queries, topk=topk, key=key, vec=vec, scale=scale
    ).select("query_id", key)
    exn = ex.crossJoin(F.broadcast(spine))
    jj2 = exn.join(
        approx,
        (exn.query_id == approx.query_id)
        & (exn.nprobe == approx.nprobe)
        & (exn[key] == approx.a_vec),
        "left",
    ).select(exn.nprobe, exn.query_id, exn[key], approx.a_vec)
    return jj2.groupBy("nprobe", "query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.expr(
            "CAST(SUM(CASE WHEN a_vec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_hits"),
        F.expr(
            "CAST(1000000 * SUM(CASE WHEN a_vec IS NOT NULL THEN 1 ELSE 0 END)"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("recall_ppm"),
    )
