"""Deduplication operators — exact and near-dup (MinHash LSH, SimHash).

Reference analog: varda's checksum duplicate-import guard (A7, SHA1 over
file content [P]); extended per the north star to document-level dedup for
training-data pipelines.

Scale design:
- exact dedup: hash → window keep-first. One shuffle on the digest; at
  100 TB the digest groupBy is near-uniform (no skew).
- MinHash LSH: shingle → k signatures → band buckets → candidate pairs by
  bucket equi-join. Fan-out is bounded by band count; NEVER a cross join.
  Signatures use md5 (available in both Spark and DuckDB, so the pure-DF
  variant is oracle-checkable; a production swap to xxhash64 is one line).
- SimHash: per-token md5 bit-vote → 64-bit fingerprint; near-dups =
  fingerprints within Hamming distance d, found by band equi-join on
  16-bit chunks (d<=3 guarantees one identical chunk of 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from varda_spark.operators.text import tokens


def dedup_exact(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Keep the lowest-key document per exact (md5-normalized) text.

    Window keep-first rather than dropDuplicates so the SURVIVOR is
    deterministic (dropDuplicates keeps an arbitrary row).
    """
    h = F.md5(F.lower(F.trim(F.col(text))).cast("binary"))
    w = Window.partitionBy("_h").orderBy(F.col(key))
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def shingles(df: DataFrame, n: int = 3, text: str = "text", out: str = "shingle") -> DataFrame:
    """Explode n-word shingles of the token stream.

    Documents shorter than n tokens yield NO shingles (empty array, not
    a truncated one) — matching the oracle's stop-exclusive range
    semantics. The explicit CASE matters: sequence(1, 0) DESCENDS in
    Spark, which would both fabricate rows and trip ANSI element_at
    out-of-bounds on short documents.

    The input is REPARTITIONED to 2×cores first: the tokenize+explode
    multiplies each doc into ~len(w) rows, so its CPU otherwise runs at
    the parquet FILE-COUNT's parallelism (8 tasks at sf5 — the
    dedup_substring_spans lesson; dedup_minhash 45.6→18 s,
    text_ngram_novelty 93.6→39 s at sf5). The repartition ships only
    the raw (key, text) bytes, two orders of magnitude less than the
    shingle stream it unlocks parallelism for.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism * 2)
    df = df.withColumn("_w", tokens(text))
    parts = ", ".join(f"element_at(_w, i + {j})" for j in range(n))
    return df.withColumn(
        out,
        F.explode(
            F.expr(
                f"CASE WHEN size(_w) >= {n}"
                f" THEN transform(sequence(1, size(_w) - {n - 1}),"
                f" i -> concat_ws(' ', {parts}))"
                f" ELSE array() END"
            )
        ),
    ).drop("_w")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 8,
    shingle_n: int = 3,
    key: str = "doc_id",
    text: str = "text",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = MIN(md5(i || shingle)).

    Lexicographic MIN over fixed-width lowercase hex == numeric MIN over
    the hash value, and md5 agrees across engines → oracle-exact.
    Output: key + sig_0..sig_{n-1} (strings).

    ``shingle_df`` lets a caller that already materialized the (key,
    shingle) stream (e.g. for an exact-Jaccard verify stage) share it:
    MIN is duplicate-insensitive, so a DISTINCT shingle set yields the
    identical signature as the raw stream.
    """
    # Deliberately explode + groupBy, NOT array_min(transform(...)) per
    # signature: higher-order-function lambdas are evaluated outside
    # whole-stage codegen and projection collapse re-inlines the shingle
    # array into every signature column — measured 7× SLOWER (18.7 s vs
    # 2.6 s at sf0.1). The explode stream never hits the wire anyway:
    # partial aggregation reduces map-side, so the shuffle carries one
    # 8-signature row per doc.
    sh = shingle_df if shingle_df is not None else shingles(df.select(key, text), n=shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i) + "|"), F.col("shingle")).cast("binary"))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(key).agg(*aggs)


def minhash_candidates(
    df: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    key: str = "doc_id",
    text: str = "text",
    shingle_df: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the MinHash signature.

    rows-per-band = num_hashes/bands; docs agreeing on ALL rows of ≥1 band
    become a candidate pair (a < b). Bucket equi-join per band — the scale
    path: shuffle keys are (band_id, band_value), bounded fan-out.
    ``shingle_df``: optional pre-materialized (key, shingle) stream —
    see minhash_signatures.

    The signature table is localCheckpoint'ed before the bucket
    self-join (r15, the simhash_pairs fix): the planner broadcast-joins
    the banded stream at bench scale, and a broadcast build side cannot
    reuse the probe side's plan — the ENTIRE shingle-explode +
    8-min-md5 signature DAG was evaluated twice (dedup_minhash plan:
    Generate×4 = both sides re-exploding). Checkpointing sigs (one
    narrow row per doc) computes it once; the band concat + explode
    above the checkpoint is trivial per side. DAG-replay control inside
    the timed query, not cross-run caching.
    """
    sigs = minhash_signatures(
        df, num_hashes, shingle_n, key, text, shingle_df=shingle_df
    ).localCheckpoint(eager=False)
    rows = num_hashes // bands
    band_cols = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"sig_{b * rows + r}") for r in range(rows)]).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sigs.select(F.col(key), *band_cols)
    stacked = banded.select(
        F.col(key),
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias("bucket"),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(F.col(f"a.{key}").alias("doc_a"), F.col(f"b.{key}").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, key: str = "doc_id", text: str = "text", out: str = "simhash") -> DataFrame:
    """64-bit SimHash fingerprint from per-token md5 bit votes.

    bit_j(doc) = 1 iff more tokens hash with bit j set than unset. Pure
    Column math: per token take md5 → first 16 hex chars → bigint via
    conv(); per bit aggregate the vote sign.

    (r14 note: a fan_out repartition before the token explode was tried
    and measured NEGATIVE here — 2.8 s → 3.2-3.7 s at sf0.1 — because the
    extra exchange defeats exchange reuse in simhash_pairs' downstream
    self-join; the vote stage itself is only ~1.1 s. Left alone.)
    """
    tok = df.select(key, F.explode(tokens(text)).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10).cast("bigint")
    tok = tok.withColumn("_h", h)
    # branch-free votes: sum the raw bit per token plus one total count;
    # "more set than unset" ⟺ 2·set_count > n. Same fingerprint as the
    # ±1-vote formulation, ~40% less per-token work in codegen.
    votes = [
        F.sum(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1))).alias(f"v{j}")
        for j in range(60)
    ]
    agg = tok.groupBy(key).agg(F.count(F.lit(1)).alias("_n"), *votes)
    # balanced add-tree, not a left-deep sum(): Catalyst walks a depth-60
    # Add chain per rule pass and the analysis alone cost ~0.5 s per run
    # (measured r14: 1.69 s → 1.18 s for this stage). Reassociating
    # integer adds of distinct powers of two is value-identical.
    terms = [
        F.when(F.col(f"v{j}") * 2 > F.col("_n"), F.lit(1 << j))
        .otherwise(F.lit(0))
        .cast("bigint")
        for j in range(60)
    ]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return agg.select(F.col(key), terms[0].alias(out))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 10,
    key: str = "doc_id",
    text: str = "text",
    chunks: int = 4,
    chunk_bits: int = 15,
) -> DataFrame:
    """SimHash near-dup candidate pairs by chunk banding + exact Hamming.

    The 60-bit fingerprint splits into 4×15-bit chunks; by pigeonhole any
    pair within Hamming distance 3 shares ≥1 identical chunk, so the
    equi-join on (chunk_id, chunk_value) finds them with bounded fan-out
    (the scale path — never an all-pairs join). Surviving candidates get
    their exact distance via bit_count(xor) and a ≤ max_hamming filter.

    The fingerprint table is localCheckpoint'ed before the self-join
    (r15, guide §2.4/§5): the planner broadcast-joins the chunk band at
    bench scale, and a broadcast build side cannot reuse the probe
    side's exchange — the ENTIRE scan→token-explode→61-agg fingerprint
    DAG was evaluated twice (r14 plan nodes 1–10 and 11–21 were
    identical subtrees). Checkpointing fp computes it once; both join
    sides then read executor-local blocks. This is DAG-replay control
    inside the timed query, not cross-run caching; the materialized
    blocks live until the DataFrame is GC'd (fine for a query-shaped
    call; long-lived reuse should unpersist).
    """
    fp = simhash(df, key=key, text=text).localCheckpoint(eager=False)
    mask = (1 << chunk_bits) - 1
    stacked = fp.select(
        F.col(key),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.concat_ws(
                    ":",
                    F.lit(str(c)),
                    F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask)).cast("string"),
                )
                for c in range(chunks)
            ])
        ).alias("chunk"),
    )
    a = stacked.select(F.col(key).alias("doc_a"), F.col("simhash").alias("fp_a"), "chunk")
    b = stacked.select(F.col(key).alias("doc_b"), F.col("simhash").alias("fp_b"), "chunk")
    return (
        a.join(b, ["chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard(
    df: DataFrame,
    candidate_pairs: DataFrame | None = None,
    shingle_n: int = 3,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard per candidate pair.

    candidate_pairs=None → candidates are all pairs sharing ≥1 shingle
    (inverted-index self-join: fan-out bounded by shingle frequency, the
    classic n-gram-Jaccard shape). Otherwise runs AFTER LSH blocking as a
    verification stage. Outputs integer intersection/union sizes plus
    jaccard_pct (bigint, oracle-exact).

    The distinct shingle stream feeds THREE consumers (sizes + both
    join sides); localCheckpoint materializes the tokenize/explode/
    distinct once (r15, the dedup_pipeline_v2 dsh precedent) instead of
    re-deriving it per consumer — exchange reuse does not cover
    consumers across a join tree, and a broadcast build side replays
    the full DAG.
    """
    sh = (
        shingles(df.select(key, text), n=shingle_n)
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy(key).agg(F.countDistinct("shingle").alias("n_sh"))
    if candidate_pairs is None:
        a_ = sh.select(F.col(key).alias("doc_a"), "shingle")
        b_ = sh.select(F.col(key).alias("doc_b"), "shingle")
        inter = (
            a_.join(b_, ["shingle"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = sh.withColumnRenamed(key, "doc_a").withColumnRenamed("shingle", "sh_a")
        b = sh.withColumnRenamed(key, "doc_b").withColumnRenamed("shingle", "sh_b")
        inter = (
            candidate_pairs.join(a, "doc_a")
            .join(b, "doc_b")
            .filter(F.col("sh_a") == F.col("sh_b"))  # pushed into the join cond
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(key, "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(key, "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .withColumn("jaccard_pct", F.floor(F.col("n_inter") * 100 / F.col("n_union")).cast("bigint"))
    )
    return out.select("doc_a", "doc_b", "n_inter", "n_union", "jaccard_pct")


def _union_find_local(uv: list) -> list:
    """Driver-side union-find over an already-bounded edge list.

    Union by MIN so every root label IS the component minimum — the same
    output contract as the distributed loops. Shared by the small-graph
    fast paths of connected_components and cc_stars; callers must have
    COUNTED the edges against a threshold before collecting."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in uv:
        ra, rb = find(u), find(v)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    verts = {u for u, _ in uv} | {v for _, v in uv}
    return [(x, find(x)) for x in verts]


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 30,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Near-dup pairs → cluster assignment: (id, component) with component =
    the minimum doc id reachable through the pair graph. The canonical
    survivor of each cluster is the row with id == component; everything
    else is a removable duplicate.

    Small-graph fast path: LSH candidate PAIRS are orders of magnitude
    sparser than the corpus (banding only emits near-certain duplicates),
    so the pair list routinely fits on the driver even when the corpus
    does not. When the materialized edge count is ≤ local_threshold
    (≈ a few MB), a driver-side union-find labels the graph in one pass —
    no per-round shuffle joins, no driver/executor round-trips per
    iteration. The threshold is a hard driver-memory bound, counted
    BEFORE collecting; above it (100 TB corpora can emit billions of
    pairs) the distributed loop below runs unchanged.

    Distributed path: min-label propagation WITH pointer jumping: each
    round every vertex takes the min of (its label, its neighbors'
    labels, its label's label — comp[comp[id]]). The shortcut term
    doubles label-path lengths each round, so convergence is
    O(log diameter) instead of O(diameter): a 10⁶-long chain needs ~20
    rounds, not 10⁶. Each round is two shuffle joins + one min-aggregate,
    with localCheckpoint() cutting the lineage so the plan does not grow
    per round. Raises if max_iter rounds did not reach a fixpoint — a
    silently-partial clustering must never ship. At 100 TB the same loop
    holds; large-star/small-star (cc_stars below) additionally bounds
    high-degree shuffle skew.
    """
    # Materialize the PROJECTED pair stream exactly once: the candidate
    # DAG feeding `pairs` is the expensive part (LSH + verify), and every
    # pre-r14 consumer — the union's two scans, the threshold count, the
    # collect — replayed it. One narrow localCheckpoint up front means
    # every later scan (either path) reads executor-local blocks.
    P = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).localCheckpoint()
    if local_threshold:
        # bounded decision + fetch in ONE cheap job (reads the checkpoint,
        # never more than threshold+1 rows on the driver)
        rows = P.limit(local_threshold + 1).collect()
        if len(rows) <= local_threshold:
            # raw pairs, not the distinct symmetric closure: union-find is
            # insensitive to duplicates, orientation and self-loops, and
            # _union_find_local derives the vertex set itself — identical
            # (id, comp) output with zero further Spark jobs.
            out = _union_find_local([(r.src, r.dst) for r in rows])
            return P.sparkSession.createDataFrame(
                out,
                schema=P.select(
                    F.col("src").alias("id"), F.col("src").alias("comp")
                ).schema,
            )
    edges = (
        P.union(P.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        # the loop joins edges every round — materialize ONCE, or each round
        # replays the whole candidate-generation lineage (measured 3× on
        # the minhash pipeline)
        .localCheckpoint()
    )
    comp = edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    for it in range(max_iter):
        cand = comp.union(
            edges.join(comp.withColumnRenamed("id", "src"), "src").select(
                F.col("dst").alias("id"), "comp"
            )
        )
        if it >= 2:
            # near-dup graphs are almost always shallow and converge in
            # 1–3 neighbor rounds; pay for the shortcut join only when the
            # graph has proven deeper than that
            jump = (
                comp.alias("a")
                .join(
                    comp.select(F.col("id").alias("comp"), F.col("comp").alias("cc")).alias("b"),
                    "comp",
                )
                .select(F.col("a.id").alias("id"), F.col("cc").alias("comp"))
            )
            cand = cand.union(jump)
        new = cand.groupBy("id").agg(F.min("comp").alias("comp")).localCheckpoint()
        changed = (
            new.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        comp = new
        if changed == 0:
            return comp
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        f"raise max_iter (log2(diameter) rounds suffice with pointer jumping)"
    )


def shingle_containment(
    df: DataFrame,
    threshold_pct: int = 40,
    shingle_n: int = 3,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Directed shingle containment |A∩B| / |A| per candidate pair — the
    asymmetric companion to Jaccard: catches a short doc EMBEDDED in a long
    one (quote farms, boilerplate wrappers, concatenated dumps), where
    Jaccard is diluted by the long side's size and misses.

    Same inverted-index join as ngram_jaccard (fan-out bounded by shingle
    frequency, never all-pairs); emits BOTH directions of a pair since
    containment(A,B) ≠ containment(B,A). Integer percent → oracle-exact.

    Same localCheckpoint discipline as ngram_jaccard: the distinct
    shingle stream feeds sizes + both join sides — materialize once.
    """
    sh = (
        shingles(df.select(key, text), n=shingle_n)
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy(key).agg(F.countDistinct("shingle").alias("n_sh"))
    a_ = sh.select(F.col(key).alias("doc_a"), "shingle")
    b_ = sh.select(F.col(key).alias("doc_b"), "shingle")
    inter = (
        a_.join(b_, ["shingle"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = inter.join(
        sizes.withColumnRenamed(key, "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a"
    ).withColumn(
        "containment_pct", F.floor(F.col("n_inter") * 100 / F.col("n_a")).cast("bigint")
    )
    return out.filter(F.col("containment_pct") >= threshold_pct).select(
        "doc_a", "doc_b", F.col("n_inter").cast("bigint").alias("n_inter"), "containment_pct"
    )


def cc_stars(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 20,
    local_threshold: int = 200_000,
) -> DataFrame:
    """Connected components via LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the degree-skew-safe alternative to plain label propagation: every
    round rewrites EDGES instead of labels, so a hub's fan-out shrinks
    geometrically rather than re-shuffling through one key each round.

    large-star: every neighbor v > u re-attaches to m(u) = min(N(u)∪{u});
    small-star: every neighbor v < u (plus u itself) re-attaches to m(u).
    At the fixpoint edges form disjoint stars rooted at each component's
    minimum id. Same output contract as connected_components: (id, comp),
    comp = min reachable id; raises on non-convergence. Each phase is one
    grouped min + one join on canonicalized (u < v) distinct edges, with
    localCheckpoint per round to cut lineage.

    Same small-graph fast path as connected_components: verified near-dup
    EDGES are orders of magnitude sparser than the corpus, so when the
    materialized edge count is ≤ local_threshold (counted BEFORE any
    collect) a driver-side union-find replaces the per-round shuffle
    alternation — at sf0.1 the verified graph is a few hundred edges and
    the star rounds were the pipeline's single largest cost.
    """
    # One materialization of the expensive candidate/verify DAG feeding
    # `pairs`: pre-r14 this checkpointed the canonicalized edges AND then
    # recomputed the whole pairs DAG a second time through `verts` inside
    # the returned plan (profiled as the single largest cost of
    # dedup_pipeline_v2's final stage at sf0.1 — ~4.7 s of replay).
    P = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).localCheckpoint()
    if local_threshold:
        rows = P.limit(local_threshold + 1).collect()
        if len(rows) <= local_threshold:
            # raw pairs: union-find ignores duplicates/orientation, keeps
            # self-loop-only vertices as singletons, and derives the
            # vertex set itself — identical (id, comp) output with zero
            # further Spark jobs (the old path paid a count, a collect
            # AND a verts join that replayed the pair DAG).
            out = _union_find_local([(r.u, r.v) for r in rows])
            return P.sparkSession.createDataFrame(
                out,
                schema=P.select(
                    F.col("u").alias("id"), F.col("u").alias("comp")
                ).schema,
            )
    E = (
        P.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    verts = (
        P.select(F.col("u").alias("id"))
        .union(P.select(F.col("v").alias("id")))
        .distinct()
    )

    def _sym(edges: DataFrame) -> DataFrame:
        return edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _mins(sym: DataFrame) -> DataFrame:
        return sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))

    for _ in range(max_iter):
        sym = _sym(E)
        # large-star: (v, m(u)) for v ∈ N(u), v > u  — result is canonical
        # (m ≤ u < v) by construction
        e_ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(_mins(sym), "u")
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: (v, m(u)) for v ∈ N(u) with v < u, plus u itself
        sym2 = _sym(e_ls)
        smaller = sym2.filter(F.col("v") < F.col("u"))
        self_rows = sym2.select("u").distinct().withColumn("v", F.col("u"))
        e_ss = (
            smaller.union(self_rows)
            .join(_mins(sym2), "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        same = (
            e_ss.count() == E.count()
            and e_ss.exceptAll(E).limit(1).count() == 0
        )
        E = e_ss
        if same:
            star = E.select(F.col("v").alias("id"), F.col("u").alias("comp"))
            return verts.join(star, "id", "left").select(
                "id", F.coalesce(F.col("comp"), F.col("id")).alias("comp")
            )
    raise RuntimeError(
        f"cc_stars did not converge in {max_iter} rounds; the alternation "
        f"converges in O(log n) rounds — raise max_iter"
    )
