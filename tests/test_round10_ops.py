"""Independent reference check for the single round-10 addition,
dedup_ccnet_sharding (the one spare driver-window slot — growth is
otherwise frozen per VERDICT r9 item 2).

Pure-python reference: hashlib.md5 + dict accounting — no SQL text
shared with the oracle twin (the check_oracle sweep proves cross-engine
equality; this proves the SEMANTICS against a third implementation).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def _reference_shards(docs: pd.DataFrame) -> pd.DataFrame:
    """CCNet sharding computed the naive way: canonical form -> md5 ->
    shard = first-60-bits mod 16; per-shard doc/distinct/dupe counts,
    chars in vs kept (keeper = min-doc_id copy), load in ppm (truncated)."""
    groups: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for doc_id, text, n_chars in zip(docs.doc_id, docs.text, docs.n_chars):
        if doc_id % 7 == 0:
            content = f"boilerplate page {doc_id % 5}"
        else:
            content = text.strip().lower()
        h = hashlib.md5(content.encode()).hexdigest()
        shard = int(h[:15], 16) % 16
        groups.setdefault((shard, h), []).append((int(doc_id), int(n_chars)))
    per_shard: dict[int, dict[str, int]] = {}
    for (shard, _h), members in groups.items():
        s = per_shard.setdefault(
            shard,
            {"n_docs": 0, "n_distinct": 0, "n_dupes": 0, "chars_in": 0, "chars_kept": 0},
        )
        s["n_docs"] += len(members)
        s["n_distinct"] += 1
        s["n_dupes"] += len(members) - 1
        s["chars_in"] += sum(c for _, c in members)
        s["chars_kept"] += min(members)[1]  # min by doc_id (first tuple slot)
    total = sum(s["n_docs"] for s in per_shard.values())
    rows = [
        {
            "shard": shard,
            **s,
            "load_ppm": (s["n_docs"] * 1_000_000) // total,
        }
        for shard, s in per_shard.items()
    ]
    return pd.DataFrame(rows).sort_values("shard").reset_index(drop=True)


def test_dedup_ccnet_sharding_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    want = _reference_shards(docs)
    got = (
        REGISTRY["dedup_ccnet_sharding"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(
        got[["shard", "n_docs", "n_distinct", "n_dupes", "chars_in",
             "chars_kept", "load_ppm"]],
        want[["shard", "n_docs", "n_distinct", "n_dupes", "chars_in",
              "chars_kept", "load_ppm"]].astype("int64"),
    )
    # invariants that make the shard plan VALID for distributed dedup:
    # every copy of a fingerprint is in exactly one shard, so summing
    # per-shard distinct counts equals the global distinct count
    assert got.n_docs.sum() == len(docs)
    assert got.n_dupes.sum() == got.n_docs.sum() - got.n_distinct.sum()
    # load is a partition of ~1e6 ppm (truncation loses < 16 ppm)
    assert 1_000_000 - 16 <= got.load_ppm.sum() <= 1_000_000
    # the fixture's boilerplate class actually produced duplicates
    assert got.n_dupes.sum() > 0


def test_dedup_ccnet_sharding_copies_colocate(spark):
    """The load-bearing property at 100 TB: shard is a function of the
    content hash, so duplicate groups never straddle shards. Verified by
    recomputing the grouping pure-python above; here additionally assert
    the Spark output's chars accounting is consistent (chars_kept <=
    chars_in, equality exactly on dupe-free shards)."""
    got = REGISTRY["dedup_ccnet_sharding"].fn(spark, SF_001).toPandas()
    assert (got.chars_kept <= got.chars_in).all()
    dupe_free = got[got.n_dupes == 0]
    assert (dupe_free.chars_kept == dupe_free.chars_in).all()


# ---------------------------------------------------------------------
# Round-10 batch B (staged for the R11 driver window)
# ---------------------------------------------------------------------


def _orders(spark):
    return spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()


def test_agg_bradley_terry_matches_pure_python(spark):
    """Integer minorization recomputed with plain Python ints (no SQL,
    no DataFrames): battles from orders, 8 rounds, ppm renormalization."""
    from decimal import Decimal

    o = _orders(spark)
    models, iters, K = 8, 8, 10**12
    wins: dict[int, int] = {}
    cells: dict[tuple[int, int], int] = {}
    for ck, price in zip(o.o_custkey, o.o_totalprice):
        a = int(ck) % models
        b = (a + 1 + (int(ck) // models) % (models - 1)) % models
        # cents via the same DECIMAL(18,4) hop both engines use
        cents = int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)
        w = a if cents % 2 == 0 else b
        wins[w] = wins.get(w, 0) + 1
        i, j = min(a, b), max(a, b)
        cells[(i, j)] = cells.get((i, j), 0) + 1
    battles = {m: 0 for m in range(models)}
    for (i, j), n in cells.items():
        battles[i] += n
        battles[j] += n
    p = {m: 10**6 for m in range(models)}
    for _ in range(iters):
        d = {m: 0 for m in range(models)}
        for (i, j), n in cells.items():
            d[i] += n * K // (p[i] + p[j])
            d[j] += n * K // (p[i] + p[j])
        raw = {m: wins.get(m, 0) * K // d[m] for m in range(models)}
        tot = sum(raw.values())
        p = {m: max(1, raw[m] * models * 10**6 // tot) for m in range(models)}
    got = (
        REGISTRY["agg_bradley_terry"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("model_id")
        .reset_index(drop=True)
    )
    assert list(got.model_id) == list(range(models))
    assert list(got.p_ppm) == [p[m] for m in range(models)]
    assert list(got.wins) == [wins.get(m, 0) for m in range(models)]
    assert list(got.battles) == [battles[m] for m in range(models)]
    # rank consistent with strength
    byrank = got.sort_values("rank")
    assert list(byrank.p_ppm) == sorted(got.p_ppm, reverse=True)
    # normalization: strengths sum to ~8e6 (truncation loses < models ppm)
    assert 8_000_000 - models <= got.p_ppm.sum() <= 8_000_000


def _hyperplanes(tables, bits, dim):
    # recomputed from hashlib directly — independent of the package helper
    return np.array(
        [
            [
                1
                if int(
                    __import__("hashlib")
                    .md5(f"{t}|{i}".encode())
                    .hexdigest()[:15],
                    16,
                )
                % 2
                == 0
                else -1
                for i in range(dim)
            ]
            for t in range(tables * bits)
        ],
        dtype=np.int64,
    )


def test_sim_lsh_multiprobe_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    q = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000).astype(
        np.int64
    )
    n2 = (q * q).sum(axis=1)
    hp = _hyperplanes(1, 8, 64)
    signs = (q @ hp.T) >= 0  # (n, 8)
    codes = (signs * (1 << np.arange(8))).sum(axis=1)
    panel_idx = [k for k, v in enumerate(ids) if v % 29 == 0][:64]
    # truth: exact quantized cosine >= 0.30
    truth = set()
    for k in panel_idx:
        dq = q @ q[k]
        with np.errstate(all="ignore"):
            cos = np.floor(100.0 * dq / np.sqrt((n2[k] * n2).astype(np.float64)))
        for m in np.nonzero((dq > 0) & (cos >= 30))[0]:
            if ids[m] != ids[k]:
                truth.add((ids[k], ids[m]))
    # candidates with min probe depth
    masks = [(0, 0)] + [(1 << i, 1) for i in range(8)] + [
        ((1 << i) | (1 << j), 2) for i in range(8) for j in range(i + 1, 8)
    ]
    cand: dict[tuple[int, int], int] = {}
    by_code: dict[int, list[int]] = {}
    for m, c in enumerate(codes):
        by_code.setdefault(int(c), []).append(m)
    for k in panel_idx:
        for mask, depth in masks:
            for m in by_code.get(int(codes[k]) ^ mask, []):
                if ids[m] == ids[k]:
                    continue
                key = (ids[k], ids[m])
                cand[key] = min(cand.get(key, 9), depth)
    got = (
        REGISTRY["sim_lsh_multiprobe"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    for D in (0, 1, 2):
        nc = sum(1 for d in cand.values() if d <= D)
        nf = sum(1 for k, d in cand.items() if d <= D and k in truth)
        row = got[got.depth == D].iloc[0]
        assert row.n_candidates == nc
        assert row.n_found == nf
        assert row.n_true == len(truth)
        assert row.recall_ppm == (0 if not truth else 10**6 * nf // len(truth))
    # recall must be monotone in depth
    assert list(got.recall_ppm) == sorted(got.recall_ppm)


def test_dedup_band_advisor_matches_pure_python(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    sigs = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        w = text.split(" ")
        shing = [
            " ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))
        ]
        sigs[int(doc_id)] = [
            min(hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in shing)
            for i in range(8)
        ]
    # pairs agreeing on >= 1 position, with match mask
    by_pos: dict[tuple[int, str], list[int]] = {}
    for d, sg in sigs.items():
        for i, s in enumerate(sg):
            by_pos.setdefault((i, s), []).append(d)
    masks: dict[tuple[int, int], int] = {}
    for (i, _s), ds in by_pos.items():
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                a, b = min(ds[x], ds[y]), max(ds[x], ds[y])
                masks[(a, b)] = masks.get((a, b), 0) | (1 << i)
    def scurve(k, r, b):
        s = k * 125000
        e = s
        for _ in range({1: 0, 2: 1, 4: 2, 8: 3}[r]):
            e = e * e // 10**6
        qv = 10**6 - e
        for _ in range({1: 0, 2: 1, 4: 2, 8: 3}[b]):
            qv = qv * qv // 10**6
        return 10**6 - qv
    def band_hit(m, r, b):
        for band in range(b):
            mb = sum(1 << (band * r + i) for i in range(r))
            if (m & mb) == mb:
                return True
        return False
    got = REGISTRY["dedup_band_advisor"].fn(spark, SF_001).toPandas()
    for r, b in [(1, 8), (2, 4), (4, 2), (8, 1)]:
        sub = got[(got.config_r == r) & (got.config_b == b)]
        for _, row in sub.iterrows():
            k = int(row.k_match)
            want_pairs = [m for m in masks.values() if bin(m).count("1") == k]
            assert row.n_pairs == len(want_pairs)
            assert row.n_detected == sum(band_hit(m, r, b) for m in want_pairs)
            assert row.p_detect_ppm == scurve(k, r, b)
            assert row.expected_milli == len(want_pairs) * scurve(k, r, b) // 1000
    # exactness invariants: (8,1) detects exactly the k=8 pairs; (1,8)
    # detects every pool pair
    d81 = got[(got.config_r == 8) & (got.config_b == 1)]
    assert (d81[d81.k_match < 8].n_detected == 0).all()
    d18 = got[(got.config_r == 1) & (got.config_b == 8)]
    assert (d18.n_detected == d18.n_pairs).all()


def test_dedup_bloom_prefilter_matches_pure_python(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    def fp(text):
        toks = text.strip().lower().split(" ")[:2]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()
    def positions(f):
        return [
            int(hashlib.md5(f"{j}|{f}".encode()).hexdigest()[:8], 16) % 4096
            for j in ("0", "1", "2")
        ]
    ref_fps, bloom = set(), set()
    inc = []
    for doc_id, text, source in zip(docs.doc_id, docs.text, docs.source):
        f = fp(text)
        if doc_id % 3 != 0:
            ref_fps.add(f)
            bloom.update(positions(f))
        else:
            inc.append((source, f))
    per: dict[str, list[int]] = {}
    for source, f in inc:
        claimed = all(p in bloom for p in positions(f))
        true = f in ref_fps
        s = per.setdefault(source, [0, 0, 0, 0])
        s[0] += 1
        s[1] += claimed
        s[2] += true
        s[3] += claimed and not true
        # bloom property: NO false negatives
        assert claimed or not true
    got = (
        REGISTRY["dedup_bloom_prefilter"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        nd, nc, nt, nf = per[row.source]
        assert (row.n_docs, row.n_claimed, row.n_true_dup, row.n_false_pos) == (
            nd, nc, nt, nf,
        )
        clean = nd - nt
        assert row.fpr_ppm == (0 if clean == 0 else 10**6 * nf // clean)
        assert row.bloom_fill_ppm == 10**6 * len(bloom) // 4096


# ---------------------------------------------------------------------
# Round-10 batch C (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_chinchilla_plan_matches_pure_python(spark):
    """Exact-integer isqrt plan recomputed with math.isqrt (arbitrary
    precision — the third implementation neither engine uses)."""
    import math

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    tokens = int(docs.n_chars.sum()) // 4
    got = (
        REGISTRY["agg_chinchilla_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values(["budget_exp", "budget_mant"])
        .reset_index(drop=True)
    )
    assert len(got) == 21
    for _, row in got.iterrows():
        c = int(row.budget_mant) * 10 ** int(row.budget_exp)
        n = math.isqrt(c // 120)  # TRUE integer sqrt
        assert row.n_params == n, (row.budget_mant, row.budget_exp)
        assert row.d_tokens == 20 * n
        assert row.epochs_milli == 20 * n * 1000 // tokens
        assert row.data_gap_tokens == max(20 * n - tokens, 0)


def test_agg_ndcg_eval_matches_numpy(spark):
    import math

    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 10000
    ).astype(np.int64)
    w = [int(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]
    prefix = [0]
    for x in w:
        prefix.append(prefix[-1] + x)
    label_cnt = {}
    for lb in labels:
        label_cnt[lb] = label_cnt.get(lb, 0) + 1
    panel = [k for k, v in enumerate(ids) if v % 23 == 0][:64]
    per_label: dict[str, list[int]] = {}
    for k in panel:
        dq = q @ q[k]
        order = sorted(
            (m for m in range(len(ids)) if ids[m] != ids[k]),
            key=lambda m: (-dq[m], ids[m]),
        )[:10]
        dcg = sum(
            w[r] for r, m in enumerate(order) if labels[m] == labels[k]
        )
        idcg = prefix[min(label_cnt[labels[k]] - 1, 10)]
        nd = 0 if idcg == 0 else 1000 * dcg // idcg
        per_label.setdefault(labels[k], []).append(nd)
    got = REGISTRY["agg_ndcg_eval"].fn(spark, SF_001).toPandas()
    assert set(got.label) == set(per_label)
    for _, row in got.iterrows():
        nds = per_label[row.label]
        assert row.n_queries == len(nds)
        assert row.sum_ndcg_milli == sum(nds)
        assert row.mean_ndcg_milli == sum(nds) // len(nds)


def test_sim_pq_distortion_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    cb = q[:8]  # 8 lowest vec_ids (already sorted)
    n = len(q)
    cells: dict[tuple[int, int], list[int]] = {}
    for m in range(4):
        sub = q[:, m * 16 : (m + 1) * 16]
        csub = cb[:, m * 16 : (m + 1) * 16]
        d = ((sub[:, None, :] - csub[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)  # argmin takes lowest index on ties
        for v in range(n):
            cells.setdefault((m, int(best[v])), []).append(int(d[v, best[v]]))
    got = REGISTRY["sim_pq_distortion"].fn(spark, SF_001).toPandas()
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        ds = cells[(int(row.subspace), int(row.code_id))]
        assert row.n_assigned == len(ds)
        assert row.share_ppm == 1_000_000 * len(ds) // n
        assert row.mean_sqerr_milli == sum(ds) * 1000 // len(ds)
        assert row.max_sqerr == max(ds)
    # occupancy partitions the corpus within every subspace
    for m in range(4):
        assert got[got.subspace == m].n_assigned.sum() == n


# ---------------------------------------------------------------------
# Round-10 batch D (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_emb_isotropy_audit_matches_numpy_pair_sum(spark):
    """The O(n^2)->O(n) identity verified against the NAIVE quadratic
    pair sum (numpy, all ordered pairs) — the whole point of the key."""
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    labels = emb.label.to_numpy()
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    got = REGISTRY["emb_isotropy_audit"].fn(spark, SF_001).toPandas()

    def tdiv(a, b):  # both engines truncate toward zero
        return int(a // b) if (a >= 0) == (b >= 0) else -int(abs(a) // abs(b))

    def check(mask, row):
        v = q[mask]
        n = len(v)
        g = v @ v.T
        pair_sum = int(g.sum() - np.trace(g))  # naive quadratic sum
        t = int(np.trace(g))
        assert row.n_vectors == n
        assert row.mean_norm2 == t // n
        assert row.mean_pair_dot_milli == tdiv(pair_sum * 1000, n * (n - 1))
        assert row.anisotropy_ppm == tdiv(10**6 * n * pair_sum, t * (n - 1))

    for _, row in got.iterrows():
        if row.label == -1:
            check(np.ones(len(q), dtype=bool), row)
        else:
            check(labels == row.label, row)


def test_agg_arena_winrate_matches_pure_python_and_bt(spark):
    import math
    from decimal import Decimal

    o = _orders(spark)
    cells: dict[tuple[int, int], list[int]] = {}
    for ck, price in zip(o.o_custkey, o.o_totalprice):
        a = int(ck) % 8
        b = (a + 1 + (int(ck) // 8) % 7) % 8
        cents = int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)
        w = a if cents % 2 == 0 else b
        i, j = min(a, b), max(a, b)
        s = cells.setdefault((i, j), [0, 0])
        s[0] += 1
        s[1] += w == i
    got = (
        REGISTRY["agg_arena_winrate"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values(["model_a", "model_b"])
        .reset_index(drop=True)
    )
    assert len(got) == 28  # every pair battled
    z2m = 3841
    for _, row in got.iterrows():
        n, k = cells[(int(row.model_a), int(row.model_b))]
        assert (row.battles, row.wins_a) == (n, k)
        assert row.winrate_a_ppm == 10**6 * k // n
        term = math.isqrt(4 * n * k * (n - k) * z2m * 1000 + z2m * z2m)
        lo = max(0, 10**6 * (2000 * n * k + n * z2m - term) // (2 * n * (1000 * n + z2m)))
        hi = min(10**6, 10**6 * (2000 * n * k + n * z2m + term) // (2 * n * (1000 * n + z2m)))
        assert (row.wilson_lo_ppm, row.wilson_hi_ppm) == (lo, hi)
        assert row.wilson_lo_ppm <= row.winrate_a_ppm <= row.wilson_hi_ppm
    # cross-check with Bradley-Terry's win vector (same fixture)
    bt = REGISTRY["agg_bradley_terry"].fn(spark, SF_001).toPandas()
    for m in range(8):
        w_sum = int(got[got.model_a == m].wins_a.sum()) + int(
            (got[got.model_b == m].battles - got[got.model_b == m].wins_a).sum()
        )
        assert w_sum == int(bt[bt.model_id == m].wins.iloc[0])


def test_agg_preference_cycles_matches_pure_python(spark):
    from decimal import Decimal

    o = _orders(spark)
    cells: dict[tuple[int, int], list[int]] = {}
    for ck, price in zip(o.o_custkey, o.o_totalprice):
        a = int(ck) % 8
        b = (a + 1 + (int(ck) // 8) % 7) % 8
        cents = int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)
        w = a if cents % 2 == 0 else b
        i, j = min(a, b), max(a, b)
        s = cells.setdefault((i, j), [0, 0])
        s[0] += 1
        s[1] += w == i
    beats = {
        (i, j): 1 if 2 * k >= n else 0 for (i, j), (n, k) in cells.items()
    }
    got = (
        REGISTRY["agg_preference_cycles"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values(["model_a", "model_b", "model_c"])
        .reset_index(drop=True)
    )
    assert len(got) == 56  # C(8,3)
    for _, row in got.iterrows():
        a, b, c = int(row.model_a), int(row.model_b), int(row.model_c)
        ab, bc, ac = beats[(a, b)], beats[(b, c)], beats[(a, c)]
        assert (row.a_beats_b, row.b_beats_c, row.a_beats_c) == (ab, bc, ac)
        want_cycle = int(
            (ab == 1 and bc == 1 and ac == 0)
            or (ab == 0 and bc == 0 and ac == 1)
        )
        assert row.is_cycle == want_cycle


def test_text_vocab_coverage_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    counts: dict[str, int] = {}
    for text in docs.text:
        for t in text.strip().lower().split(" "):
            counts[t] = counts.get(t, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = (
        REGISTRY["text_vocab_coverage"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("vocab_size")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        v = int(row.vocab_size)
        covered = sum(c for _, c in ordered[:v])
        assert row.n_distinct_tokens == len(counts)
        assert row.total_tokens == total
        assert row.covered_tokens == covered
        assert row.covered_ppm == 10**6 * covered // total
    # coverage is monotone in vocab size
    assert list(got.covered_ppm) == sorted(got.covered_ppm)


# ---------------------------------------------------------------------
# Round-10 batch E (staged for the R11 driver window)
# ---------------------------------------------------------------------


def _cents(price):
    from decimal import Decimal

    return int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)


def test_agg_krippendorff_alpha_matches_pure_python(spark):
    o = _orders(spark)
    units = []
    for ck, price in zip(o.o_custkey, o.o_totalprice):
        c = _cents(price)
        r1 = int(ck) % 4
        r2 = r1 if c % 5 < 4 else (r1 + 1) % 4
        r3 = r1 if (c // 5) % 3 < 2 else (r1 + 2) % 4
        units.append((r1, r2, r3))
    marg = {}
    p_disagree = 0
    for rs in units:
        for c in rs:
            marg[c] = marg.get(c, 0) + 1
        for x in range(3):
            for y in range(3):
                if x != y and rs[x] != rs[y]:
                    p_disagree += 1
    n = 3 * len(units)
    sum_sq = sum(v * v for v in marg.values())
    alpha = 10**6 - 10**6 * (n - 1) * p_disagree // (2 * (n * n - sum_sq))
    got = REGISTRY["agg_krippendorff_alpha"].fn(spark, SF_001).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row.n_units == len(units)
    assert row.n_ratings == n
    assert row.disagree_pairs == p_disagree // 2
    assert row.alpha_ppm == alpha
    # the synthetic raters agree well above chance but below perfection
    assert 200_000 < row.alpha_ppm < 990_000


def test_qa_length_drift_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    buckets = sorted({int(c) // 50 for c in docs.n_chars})
    per_src: dict[str, dict[int, int]] = {}
    for s, c in zip(docs.source, docs.n_chars):
        per_src.setdefault(s, {})[int(c) // 50] = (
            per_src.setdefault(s, {}).get(int(c) // 50, 0) + 1
        )
    n_all = len(docs)
    got = (
        REGISTRY["qa_length_drift"].fn(spark, SF_001).toPandas()
        .set_index("source")
    )
    for s, cnts in per_src.items():
        n_src = sum(cnts.values())
        n_rest = n_all - n_src
        ca = cb = dmax = 0
        rest = {
            b: sum(per_src[o].get(b, 0) for o in per_src if o != s)
            for b in buckets
        }
        for b in buckets:
            ca += cnts.get(b, 0)
            cb += rest[b]
            dmax = max(dmax, abs(ca * n_rest - cb * n_src))
        row = got.loc[s]
        assert row.n_src == n_src
        assert row.n_rest == n_rest
        assert row.ks_ppm == 10**6 * dmax // (n_src * n_rest)


def test_agg_position_bias_matches_pure_python(spark):
    import math

    o = _orders(spark)
    cells: dict[tuple[int, int], list[int]] = {}
    for ck, price in zip(o.o_custkey, o.o_totalprice):
        a = int(ck) % 8
        b = (a + 1 + (int(ck) // 8) % 7) % 8
        w = a if _cents(price) % 2 == 0 else b
        i, j = min(a, b), max(a, b)
        s = cells.setdefault((i, j), [0, 0])
        s[0] += 1
        s[1] += w == a  # FIRST-presented side, not lower id
    got = (
        REGISTRY["agg_position_bias"].fn(spark, SF_001).toPandas()
        .sort_values(["model_a", "model_b"]).reset_index(drop=True)
    )
    assert len(got) == 29
    z2m = 3841
    for _, row in got.iterrows():
        if row.model_a == -1:
            n = sum(v[0] for v in cells.values())
            k = sum(v[1] for v in cells.values())
        else:
            n, k = cells[(int(row.model_a), int(row.model_b))]
        assert (row.battles, row.first_wins) == (n, k)
        assert row.first_win_ppm == 10**6 * k // n
        term = math.isqrt(4 * n * k * (n - k) * z2m * 1000 + z2m * z2m)
        den = 2 * n * (1000 * n + z2m)
        assert row.wilson_lo_ppm == max(0, 10**6 * (2000 * n * k + n * z2m - term) // den)
        assert row.wilson_hi_ppm == min(10**6, 10**6 * (2000 * n * k + n * z2m + term) // den)
    # the fixture's winner is cents-parity => no true position effect:
    # the pooled interval must contain 50%
    pooled = got[got.model_a == -1].iloc[0]
    assert pooled.wilson_lo_ppm <= 500_000 <= pooled.wilson_hi_ppm


# ---------------------------------------------------------------------
# Round-10 batch F (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_emb_centroid_confusion_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    labels = emb.label.to_numpy()
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    uniq = sorted(set(int(x) for x in labels))
    cents = np.stack(
        [
            np.floor(
                q[labels == lb].sum(axis=0).astype(np.float64)
                / (labels == lb).sum()
            ).astype(np.int64)
            for lb in uniq
        ]
    )
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    pred = d2.argmin(axis=1)  # lowest index on ties == lowest label
    conf: dict[tuple[int, int], int] = {}
    for t, p in zip(labels, pred):
        key = (int(t), uniq[int(p)])
        conf[key] = conf.get(key, 0) + 1
    got = REGISTRY["emb_centroid_confusion"].fn(spark, SF_001).toPandas()
    assert len(got) == len(conf)
    rowtot = {}
    for (t, _p), n in conf.items():
        rowtot[t] = rowtot.get(t, 0) + n
    for _, row in got.iterrows():
        n = conf[(int(row.true_label), int(row.pred_label))]
        assert row.n == n
        assert row.n_true == rowtot[int(row.true_label)]
        assert row.share_ppm == 10**6 * n // rowtot[int(row.true_label)]
    # every vector lands somewhere: matrix total == corpus size
    assert got.n.sum() == len(q)


# ---------------------------------------------------------------------
# Round-10 batch G (staged for the R11 driver window)
# ---------------------------------------------------------------------


def _cents_series(spark) -> tuple[np.ndarray, pd.DataFrame]:
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    # the decimal hop: round-half-up at 4dp then truncate, matching
    # CAST(CAST(x AS DECIMAL(18,4)) * 100 AS BIGINT) in both engines
    return (
        np.floor(
            np.round(o.o_totalprice.to_numpy() * 10000) / 10000 * 100 + 0.5
        ).astype(np.int64),
        o,
    )


def test_agg_mcnemar_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    a = cents % 3 > 0
    b = (cents // 3) % 4 > 0
    n11 = int((a & b).sum())
    n10 = int((a & ~b).sum())
    n01 = int((~a & b).sum())
    n00 = int((~a & ~b).sum())
    n = len(cents)
    got = REGISTRY["agg_mcnemar"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n, got.both_ok, got.a_only, got.b_only, got.neither) == (
        n, n11, n10, n01, n00,
    )
    assert got.acc_a_ppm == 10**6 * (n11 + n10) // n
    assert got.acc_b_ppm == 10**6 * (n11 + n01) // n
    assert got.discordant == n10 + n01
    assert got.chi2_milli == 1000 * (n10 - n01) ** 2 // (n10 + n01)
    assert got.winner == ("A" if n10 > n01 else "B" if n01 > n10 else "tie")
    # the fixture is built so B (~3/4) beats A (~2/3) decisively
    assert got.winner == "B" and got.chi2_milli > 3840


def test_agg_fleiss_kappa_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    base = (o.o_custkey.to_numpy() % 4).astype(np.int64)
    cells: dict[tuple[int, int], int] = {}
    for i in range(len(cents)):
        for k in range(5):
            c = (
                int(base[i])
                if (cents[i] // (7 * (k + 1))) % 10 < 7
                else int((base[i] + k + 1) % 4)
            )
            cells[(i, c)] = cells.get((i, c), 0) + 1
    N, m = len(cents), 5
    s1 = sum(v * v for v in cells.values())
    marg: dict[int, int] = {}
    for (_i, c), v in cells.items():
        marg[c] = marg.get(c, 0) + v
    e = sum(v * v for v in marg.values())
    a_, d_, t_ = s1 - N * m, N * m * (m - 1), (N * m) ** 2
    got = REGISTRY["agg_fleiss_kappa"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n_items, got.m_raters) == (N, m)
    assert got.pbar_ppm == 10**6 * a_ // d_
    assert got.pe_ppm == 10**6 * e // t_
    assert got.kappa_ppm == 10**6 * (a_ * t_ - d_ * e) // (d_ * (t_ - e))
    # 70% per-rater agreement vs 25% chance => solidly positive kappa
    assert 200_000 < got.kappa_ppm < 800_000


def test_agg_conformal_coverage_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    keys = o.o_orderkey.to_numpy()
    score = cents % 100000
    cal = np.sort(score[keys % 2 == 0])
    test = np.sort(score[keys % 2 != 0])
    got = (
        REGISTRY["agg_conformal_coverage"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("alpha_ppm")
        .reset_index(drop=True)
    )
    assert list(got.alpha_ppm) == [50000, 100000, 200000]
    for _, row in got.iterrows():
        n_cal, n_test = len(cal), len(test)
        assert (row.n_cal, row.n_test) == (n_cal, n_test)
        k = min(
            ((n_cal + 1) * (10**6 - row.alpha_ppm) + 999999) // 10**6, n_cal
        )
        assert row.k_rank == k
        qhat = int(cal[k - 1])  # k-th smallest
        assert row.qhat == qhat
        covered = int((test <= qhat).sum())
        assert row.covered == covered
        assert row.coverage_ppm == 10**6 * covered // n_test
        assert row.target_ppm == 10**6 - row.alpha_ppm
        # split-conformal guarantee (finite-sample, exchangeable):
        # empirical coverage lands near the target on 7.5k points
        assert abs(row.coverage_ppm - row.target_ppm) < 25_000


def test_agg_brier_decomposition_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    bins = (cents // 7) % 10
    f_ppm = 100000 * bins + 50000
    outc = ((cents // 13) % 100 < 10 * bins + 5).astype(np.int64)
    N = len(cents)
    X = int(outc.sum())
    brier = int(((f_ppm - 10**6 * outc) ** 2).sum()) // N
    obar = 10**6 * X // N
    rel = res = 0
    n_bins = 0
    for k in sorted(set(int(b) for b in bins)):
        sel = bins == k
        nk, xk = int(sel.sum()), int(outc[sel].sum())
        fk = 100000 * k + 50000
        obark = 10**6 * xk // nk
        rel += nk * (fk - obark) ** 2
        res += nk * (obark - obar) ** 2
        n_bins += 1
    rel, res = rel // N, res // N
    unc = obar * (10**6 - obar)
    got = REGISTRY["agg_brier_decomposition"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n, got.n_bins, got.base_rate_ppm) == (N, n_bins, obar)
    assert got.brier_ppm2 == brier
    assert got.reliability_ppm2 == rel
    assert got.resolution_ppm2 == res
    assert got.uncertainty_ppm2 == unc
    assert got.decomp_gap_ppm2 == brier - (rel - res + unc)
    # the fixture is a calibrated-but-noisy forecaster: reliability is
    # a small correction while resolution carries real separation
    assert got.reliability_ppm2 < got.resolution_ppm2
    # the identity closes exactly in rationals (checked offline); the
    # integer gap is obar_k-truncation propagation only — sub-ppm of
    # the Brier total (59787 vs 1.7e11 ppm^2 at sf0.01)
    assert abs(got.decomp_gap_ppm2) * 10**6 < got.brier_ppm2


# ---------------------------------------------------------------------
# Round-10 batch H (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_moe_balance_matches_pure_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    h = (li.l_orderkey.to_numpy() * 8 + li.l_linenumber.to_numpy()).astype(
        np.int64
    )
    pk = li.l_partkey.to_numpy().astype(np.int64)
    raws = np.stack(
        [(h * (e + 3) + pk * (e + 1)) % 1000 + 1 for e in range(8)], axis=1
    )
    tot = raws.sum(axis=1)
    chosen = raws.argmax(axis=1)  # numpy argmax = first max = lowest e
    N = len(h)
    got = (
        REGISTRY["agg_moe_balance"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("expert")
        .reset_index(drop=True)
    )
    assert list(got.expert) == list(range(8))
    cap = N * 125 // 800
    for e in range(8):
        row = got.iloc[e]
        n_e = int((chosen == e).sum())
        pmass = int((10**6 * raws[:, e] // tot).sum())
        assert row.n_tokens == n_e
        assert row.share_ppm == 10**6 * n_e // N
        assert row.gate_mass_ppm == pmass // N
        assert row.aux_contrib_ppm == (
            8 * (10**6 * n_e // N) * (pmass // N) // 10**6
        )
        assert row.capacity == cap
        assert row.dropped == max(0, n_e - cap)
        assert row.drop_ppm == 10**6 * max(0, n_e - cap) // n_e
    assert got.n_tokens.sum() == N  # every token routed exactly once
    # gate mass is a ppm partition of ~1e6 per token (truncation only)
    assert 8 * 124_000 < got.gate_mass_ppm.sum() <= 8 * 125_000


def test_agg_sprt_boundary_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    keys = o.o_orderkey.to_numpy()
    order = np.argsort(keys)
    got = REGISTRY["agg_sprt_boundary"].fn(spark, SF_001).toPandas()
    assert len(got) == 16
    for arm in ("null", "effect"):
        for ex in range(8):
            sel = order[keys[order] % 8 == ex]
            wins = (
                cents[sel] % 2 == 1
                if arm == "null"
                else (cents[sel] // 13) % 100 < 55
            )
            llr = np.where(wins, 95310, -105361).astype(np.int64)
            cum = llr.cumsum()
            row = got[(got.arm == arm) & (got.experiment == ex)].iloc[0]
            assert row.n_obs == len(sel)
            assert row.llr_final_micro == int(llr.sum())
            hit = np.nonzero((cum >= 2944439) | (cum <= -2944439))[0]
            if len(hit) == 0:
                assert (row.n_at_decision, row.decision) == (0, "continue")
            else:
                i = int(hit[0])
                assert row.n_at_decision == i + 1
                assert row.decision == (
                    "accept_h1" if cum[i] >= 2944439 else "accept_h0"
                )
    # known drift structure: every experiment decides, and decides in
    # the planted direction (15k orders -> 1875 steps/experiment vs the
    # ~600-step expected decision time)
    assert (got[got.arm == "effect"].decision == "accept_h1").all()
    assert (got[got.arm == "null"].decision == "accept_h0").all()


def test_agg_permutation_test_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    keys = o.o_orderkey.to_numpy()
    grp = (o.o_custkey.to_numpy() % 2).astype(np.int64)
    v = cents + grp * 2000000
    def mean_micro(vals):
        return 10**6 * int(vals.sum()) // len(vals)
    m0o, m1o = mean_micro(v[grp == 0]), mean_micro(v[grp == 1])
    d_obs = abs(m1o - m0o)
    n_extreme = 0
    for r in range(1, 33):
        g = np.array(
            [
                int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:15], 16) % 2
                for k in keys
            ]
        )
        d_r = abs(mean_micro(v[g == 1]) - mean_micro(v[g == 0]))
        if d_r >= d_obs:
            n_extreme += 1
    got = REGISTRY["agg_permutation_test"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n0, got.n1) == (int((grp == 0).sum()), int((grp == 1).sum()))
    assert (got.mean0_micro, got.mean1_micro) == (m0o, m1o)
    assert got.absdelta_obs_micro == d_obs
    assert (got.r_total, got.n_extreme) == (32, n_extreme)
    assert got.p_milli == 1000 * (1 + n_extreme) // 33
    # the planted +2e6-cent (~8 sigma) effect dwarfs every replicate
    assert n_extreme == 0 and got.p_milli == 30


def test_pack_length_binning_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    lens = (docs.n_chars.to_numpy() // 4).astype(np.int64)
    ids = docs.doc_id.to_numpy().astype(np.int64)
    shard, bucket = ids % 32, lens // 64
    N, total, mx = len(lens), int(lens.sum()), int(lens.max())
    waste_global = N * mx - total
    waste_bucket = sum(
        int((bucket == b).sum()) * int(lens[bucket == b].max())
        - int(lens[bucket == b].sum())
        for b in set(bucket.tolist())
    )
    got = (
        REGISTRY["pack_length_binning"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("batch_size")
        .reset_index(drop=True)
    )
    assert list(got.batch_size) == [8, 16, 32]
    for _, row in got.iterrows():
        B = int(row.batch_size)
        waste = 0
        for s in range(32):
            for b in set(bucket.tolist()):
                sel = (shard == s) & (bucket == b)
                if not sel.any():
                    continue
                ordered = lens[sel][np.lexsort((ids[sel], lens[sel]))]
                for i in range(0, len(ordered), B):
                    batch = ordered[i : i + B]
                    waste += len(batch) * int(batch.max()) - int(batch.sum())
        assert (row.n_docs, row.total_tokens, row.max_token_len) == (
            N, total, mx,
        )
        assert row.waste_global == waste_global
        assert row.waste_bucket == waste_bucket
        assert row.waste_batched == waste
        assert row.padding_ppm == 10**6 * waste // (total + waste)
        # packing dominance: batch max <= bucket max <= global max
        assert row.waste_batched <= row.waste_bucket <= row.waste_global
    # finer batches pad less
    w = list(got.waste_batched)
    assert w[0] <= w[1] <= w[2]


# ---------------------------------------------------------------------
# Round-10 batch I (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_kv_cache_plan_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    lens = (docs.n_chars.to_numpy() // 4).astype(np.int64)
    N = len(lens)
    p95 = int(np.sort(lens)[(95 * N + 99) // 100 - 1])
    got = (
        REGISTRY["agg_kv_cache_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values(["batch_size", "ctx_len"])
        .reset_index(drop=True)
    )
    assert len(got) == 9
    for _, row in got.iterrows():
        B, L = int(row.batch_size), int(row.ctx_len)
        held = int(np.minimum(lens, L).sum())
        assert (row.n_docs, row.p95_len, row.kv_bytes_per_token) == (
            N, p95, 262144,
        )
        assert row.trunc_ppm == 10**6 * int((lens > L).sum()) // N
        assert row.util_ppm == 10**6 * held // (N * L)
        assert row.worst_batch_mib == B * L * 262144 // 2**20
        assert row.exp_batch_mib == B * 262144 * held // (N * 2**20)
        assert row.seqs_per_80gib == 80 * 2**30 // (L * 262144)
        # expectation never exceeds the reservation
        assert row.exp_batch_mib <= row.worst_batch_mib
    # utilization improves as the context shrinks toward the length mode
    by_l = got.groupby("ctx_len").util_ppm.first()
    assert by_l[32] > by_l[64] > by_l[128]


def test_agg_spec_decode_accept_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    a = [
        (cents // 11) % 100 < 80,
        (cents // 22) % 100 < 70,
        (cents // 33) % 100 < 60,
        (cents // 44) % 100 < 50,
    ]
    L = np.zeros(len(cents), dtype=np.int64)
    alive = np.ones(len(cents), dtype=bool)
    for bit in a:
        L += (alive & bit).astype(np.int64)
        alive &= bit
    n = len(cents)
    got = (
        REGISTRY["agg_spec_decode_accept"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    assert list(got.pos) == [-1, 0, 1, 2, 3]
    tps = 1000 * (int(L.sum()) + n) // n
    reach_all = acc_all = 0
    for i in range(4):
        reach, acc = int((L >= i).sum()), int((L >= i + 1).sum())
        reach_all += reach
        acc_all += acc
        row = got[got.pos == i].iloc[0]
        assert (row.n_reached, row.n_accepted) == (reach, acc)
        assert row.accept_ppm == 10**6 * acc // reach
        assert row.tokens_per_step_milli == tps
    pooled = got[got.pos == -1].iloc[0]
    assert (pooled.n_reached, pooled.n_accepted) == (reach_all, acc_all)
    assert pooled.accept_ppm == 10**6 * acc_all // reach_all
    # the funnel: acceptance decays with position (planted 80/70/60/50
    # marginals, and later positions are conditioned on earlier accepts)
    per_pos = got[got.pos >= 0].accept_ppm.to_list()
    assert per_pos[0] > per_pos[1] > per_pos[2] > per_pos[3]
    # tokens/step > 1000 milli: the draft pays for itself on this fixture
    assert pooled.tokens_per_step_milli > 1500


def test_agg_winrate_length_adjusted_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    len_a = (cents // 3) % 400 + 100
    len_b = (cents // 7) % 400
    gap = len_a - len_b
    # both engines' integer division truncates toward zero on negatives
    # (numpy // floors) — the Krippendorff-key finding, applies here too
    bucket = np.clip(np.sign(gap) * (np.abs(gap) // 100), -3, 4)
    a_win = (cents % 1000 < 500 + gap).astype(np.int64)
    got = REGISTRY["agg_winrate_length_adjusted"].fn(spark, SF_001).toPandas()
    per = got[(got.gap_bucket >= -3) & (got.gap_bucket <= 4)]
    ppms = {}
    for _, row in per.iterrows():
        b = int(row.gap_bucket)
        sel = bucket == b
        n, w = int(sel.sum()), int(a_win[sel].sum())
        assert (row.n, row.a_wins) == (n, w)
        assert row.win_ppm == 10**6 * w // n
        ppms[b] = row.win_ppm
    raw = got[got.gap_bucket == -99].iloc[0]
    N, W = len(cents), int(a_win.sum())
    assert (raw.n, raw.a_wins, raw.win_ppm) == (N, W, 10**6 * W // N)
    adj = got[got.gap_bucket == 99].iloc[0]
    assert adj.win_ppm == sum(ppms.values()) // len(ppms)
    # the planted length-loving judge makes pooled and macro-averaged
    # winrates diverge by stratum composition (the alert signal);
    # direction on this fixture: equal weights boost the rare extreme
    # positive-gap strata where the judge is near-certain
    assert abs(raw.win_ppm - adj.win_ppm) > 15_000
    # and the judge's monotone length preference shows per stratum
    # gap spans [-299, 499] => truncating buckets -2..4 (the -3 clamp
    # is headroom for longer fixtures)
    assert ppms[4] > ppms[0] > ppms[-2]


def test_agg_judge_self_consistency_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    truth = (o.o_custkey.to_numpy() % 2).astype(np.int64)
    votes = [
        np.where((cents // p) % 10 < 2, 1 - truth, truth)
        for p in (3, 11, 29)
    ]
    n = len(cents)
    accs = [int((v == truth).sum()) for v in votes]
    maj = (votes[0] + votes[1] + votes[2] >= 2).astype(np.int64)
    amaj = int((maj == truth).sum())
    unan = int(((votes[0] == votes[1]) & (votes[1] == votes[2])).sum())
    got = (
        REGISTRY["agg_judge_self_consistency"].fn(spark, SF_001)
        .toPandas().iloc[0]
    )
    assert got.n == n
    assert [got.acc1_ppm, got.acc2_ppm, got.acc3_ppm] == [
        10**6 * a // n for a in accs
    ]
    assert got.mean_single_ppm == 10**6 * sum(accs) // (3 * n)
    assert got.majority_ppm == 10**6 * amaj // n
    assert got.unanimous_ppm == 10**6 * unan // n
    assert got.gain_ppm == got.majority_ppm - got.mean_single_ppm
    # known structure: ~800k single-sample accuracy, majority vote
    # recovers the analytic ~896k (1 - 3p^2(1-p) - p^3 at p=0.2)
    assert 750_000 < got.mean_single_ppm < 850_000
    assert got.gain_ppm > 50_000


# ---------------------------------------------------------------------
# Round-10 batch J (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_needle_depth_recall_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    d = (cents // 17) % 100
    ctx = (cents // 23) % 3
    hit = ((cents // 41) % 1000 < 950 - 3 * (50 - np.abs(d - 50)) - 50 * ctx)
    got = REGISTRY["agg_needle_depth_recall"].fn(spark, SF_001).toPandas()
    assert len(got) == 40  # 30 cells + 10 depth marginals
    for _, row in got.iterrows():
        sel = d // 10 == row.depth_decile
        if row.ctx_bucket >= 0:
            sel = sel & (ctx == row.ctx_bucket)
        n, h = int(sel.sum()), int(hit[sel].sum())
        assert (row.n, row.hits) == (n, h)
        assert row.recall_ppm == 10**6 * h // n
    # the planted lost-in-the-middle dip: the mid-depth marginal is the
    # trough, both edges recover
    marg = got[got.ctx_bucket == -1].set_index("depth_decile").recall_ppm
    assert marg[5] < marg[0] and marg[5] < marg[9]
    # and the context-length penalty is monotone at fixed depth
    mid = got[(got.depth_decile == 5) & (got.ctx_bucket >= 0)]
    by_ctx = mid.set_index("ctx_bucket").recall_ppm
    assert by_ctx[0] > by_ctx[1] > by_ctx[2]


def test_agg_selective_accuracy_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    conf = (cents // 19) % 1000
    correct = ((cents // 53) % 1000 < 500 + conf // 2).astype(np.int64)
    n = len(cents)
    got = (
        REGISTRY["agg_selective_accuracy"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("threshold_milli")
        .reset_index(drop=True)
    )
    assert list(got.threshold_milli) == [0, 200, 400, 600, 800]
    for _, row in got.iterrows():
        sel = conf >= row.threshold_milli
        cov, corr = int(sel.sum()), int(correct[sel].sum())
        assert row.n_covered == cov
        assert row.coverage_ppm == 10**6 * cov // n
        assert row.sel_acc_ppm == 10**6 * corr // cov
        assert row.risk_ppm == 10**6 - row.sel_acc_ppm
    # the informative-confidence trade-off: coverage falls, accuracy
    # climbs, monotonically along the threshold grid
    assert list(got.coverage_ppm) == sorted(got.coverage_ppm, reverse=True)
    assert list(got.sel_acc_ppm) == sorted(got.sel_acc_ppm)
    assert got.sel_acc_ppm.iloc[-1] > got.sel_acc_ppm.iloc[0] + 100_000


def test_agg_rater_drift_time_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    yr = pd.to_datetime(o.o_orderdate).dt.year.to_numpy()
    r1 = (o.o_custkey.to_numpy() % 3).astype(np.int64)
    agree = (cents // 31) % 100 < 80 - 3 * (yr - 1992)
    r2 = np.where(agree, r1, (r1 + 1 + (cents // 37) % 2) % 3)
    got = (
        REGISTRY["agg_rater_drift_time"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("yr")
        .reset_index(drop=True)
    )
    kappas = {}
    for _, row in got.iterrows():
        sel = yr == row.yr
        n = int(sel.sum())
        a = int((r1[sel] == r2[sel]).sum())
        e = sum(
            int((r1[sel] == c).sum()) * int((r2[sel] == c).sum())
            for c in range(3)
        )
        assert row.n == n
        assert row.po_ppm == 10**6 * a // n
        assert row.pe_ppm == 10**6 * e // (n * n)
        assert row.kappa_ppm == 10**6 * (a * n - e) // (n * n - e)
        kappas[int(row.yr)] = row.kappa_ppm
    # the planted 3-points/year erosion shows as a monotone-ish kappa
    # decline: strictly lower at the end, first year the highest
    years = sorted(kappas)
    assert kappas[years[0]] == max(kappas.values())
    assert kappas[years[-1]] < kappas[years[0]] - 100_000


def test_dedup_source_venn_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    regions: dict[str, set] = {}
    for text, source in zip(docs.text, docs.source):
        h = hashlib.md5(text.strip().lower().encode()).hexdigest()
        grp = int(hashlib.md5(source.encode()).hexdigest()[:15], 16) % 3
        regions.setdefault(h, set()).add(grp)
    masks: dict[int, int] = {}
    for h, grps in regions.items():
        m = (4 if 0 in grps else 0) | (2 if 1 in grps else 0) | (
            1 if 2 in grps else 0
        )
        masks[m] = masks.get(m, 0) + 1
    tot = sum(masks.values())
    got = REGISTRY["dedup_source_venn"].fn(spark, SF_001).toPandas()
    assert len(got) == len(masks)
    names = {4: "A", 2: "B", 1: "C", 6: "AB", 5: "AC", 3: "BC", 7: "ABC"}
    for _, row in got.iterrows():
        m = int(row["mask"])  # attr access hits pandas' .mask METHOD
        assert row.n_hashes == masks[m]
        assert row.region == names[m]
        assert row.share_ppm == 10**6 * masks[m] // tot
    # regions partition the distinct fingerprints
    assert got.n_hashes.sum() == tot == len(regions)


# ---------------------------------------------------------------------
# Round-10 batch K (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_best_of_n_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    r = (cents // 7) % 1000
    n = len(r)
    hist: dict[int, int] = {}
    for v in r:
        hist[int(v)] = hist.get(int(v), 0) + 1
    vals = sorted(hist)
    mean_milli = 1000 * int(r.sum()) // n
    # per-mille truncated CDF, then exact integer powers
    cum = 0
    p_milli = {}
    for v in vals:
        cum += hist[v]
        p_milli[v] = 1000 * cum // n
    got = (
        REGISTRY["agg_best_of_n"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("n_samples")
        .reset_index(drop=True)
    )
    assert list(got.n_samples) == [1, 2, 4, 8]
    prev_emax = -1
    for _, row in got.iterrows():
        N = int(row.n_samples)
        wsum = 0
        q = 0
        for v in vals:
            p = p_milli[v]
            wsum += v * (p**N - q**N)
            q = p
        emax = 1000 * wsum // (1000**N)
        assert row.n_scores == n
        assert row.mean_milli == mean_milli
        assert row.emax_milli == emax
        assert row.gain_milli == emax - mean_milli
        assert emax >= prev_emax  # BoN never hurts expected max
        prev_emax = emax
    # N=1 recovers the mean up to the per-mille CDF truncation
    assert abs(got.emax_milli.iloc[0] - mean_milli) < 2000
    # and the curve has real lift on a spread distribution
    assert got.emax_milli.iloc[-1] > mean_milli + 100_000


def test_agg_fairness_gaps_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    grp = (o.o_custkey.to_numpy() % 5).astype(np.int64)
    y = (cents % 2 == 0).astype(np.int64)
    flip = (cents // 3) % 100 < 10 + 3 * grp
    yhat = np.where(flip, 1 - y, y)
    got = REGISTRY["agg_fairness_gaps"].fn(spark, SF_001).toPandas()
    accs, fprs, fnrs = {}, {}, {}
    for g in range(5):
        sel = grp == g
        n, pos = int(sel.sum()), int(y[sel].sum())
        ok = int((y[sel] == yhat[sel]).sum())
        fp = int(((y[sel] == 0) & (yhat[sel] == 1)).sum())
        fn_ = int(((y[sel] == 1) & (yhat[sel] == 0)).sum())
        row = got[got.grp == g].iloc[0]
        assert (row.n, row.base_ppm) == (n, 10**6 * pos // n)
        assert row.acc_ppm == 10**6 * ok // n
        assert row.fpr_ppm == 10**6 * fp // (n - pos)
        assert row.fnr_ppm == 10**6 * fn_ // pos
        accs[g], fprs[g], fnrs[g] = row.acc_ppm, row.fpr_ppm, row.fnr_ppm
    pooled = got[got.grp == -1].iloc[0]
    assert pooled.n == len(cents)
    assert pooled.acc_ppm == 10**6 * int((y == yhat).sum()) // len(cents)
    # gap columns = max - min over groups, identical on every row
    assert (got.acc_gap_ppm == max(accs.values()) - min(accs.values())).all()
    assert (got.fpr_gap_ppm == max(fprs.values()) - min(fprs.values())).all()
    assert (got.fnr_gap_ppm == max(fnrs.values()) - min(fnrs.values())).all()
    # the planted ladder: error monotone in group id
    assert accs[0] > accs[4] and fprs[0] < fprs[4] and fnrs[0] < fnrs[4]
    assert got.acc_gap_ppm.iloc[0] > 80_000


def test_multimodal_resolution_plan_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    ids = docs.doc_id.to_numpy().astype(np.int64)
    w = 224 + (ids % 8) * 112
    h = 224 + ((ids // 8) % 6) * 112
    mp = (w * h) // 250000
    toks = {
        "native": ((w + 13) // 14) * ((h + 13) // 14),
        "tile336": 576 * (1 + ((w + 335) // 336) * ((h + 335) // 336)),
        "resize224": np.full(len(ids), 256, dtype=np.int64),
    }
    got = REGISTRY["multimodal_resolution_plan"].fn(spark, SF_001).toPandas()
    for strat, tk in toks.items():
        sub = got[got.strategy == strat]
        stot = int(tk.sum())
        for _, row in sub.iterrows():
            sel = mp == row.mp_bucket
            n, t = int(sel.sum()), int(tk[sel].sum())
            assert (row.n_images, row.total_tokens) == (n, t)
            assert row.tokens_per_image == t // n
            assert row.cost_share_ppm == 10**6 * t // stot
        # shares partition the strategy bill
        assert abs(sub.cost_share_ppm.sum() - 10**6) < len(sub) + 1
    # the plan's point: native cost grows with bucket, resize is flat
    nat = got[got.strategy == "native"].sort_values("mp_bucket")
    assert list(nat.tokens_per_image) == sorted(nat.tokens_per_image)
    rs = got[got.strategy == "resize224"]
    assert (rs.tokens_per_image == 256).all()


def test_text_rag_budget_pack_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    cand: dict[int, list] = {}
    for doc_id, n_chars in zip(docs.doc_id, docs.n_chars):
        q = int(doc_id) % 50
        score = (
            int(hashlib.md5(f"{doc_id}:rel".encode()).hexdigest()[:15], 16)
            % 1000
        )
        cand.setdefault(q, []).append((score, int(doc_id), int(n_chars) // 4))
    got = REGISTRY["text_rag_budget_pack"].fn(spark, SF_001).toPandas()
    assert len(got) == 50
    for _, row in got.iterrows():
        lst = sorted(cand[int(row.query_id)], key=lambda t: (-t[0], t[1]))
        cum = packed = toks = sc = 0
        total_sc = sum(s for s, _, _ in lst)
        for score, _id, ln in lst:
            cum += ln
            if cum <= 512:
                packed += 1
                toks += ln
                sc += score
        assert row.n_candidates == len(lst)
        assert (row.n_packed, row.tokens_packed) == (packed, toks)
        assert row.fill_ppm == 10**6 * toks // 512
        assert row.score_recall_ppm == 10**6 * sc // total_sc
    # the budget binds: contexts are nearly full but never over
    assert (got.tokens_packed <= 512).all()
    assert got.fill_ppm.median() > 800_000
    # and packing keeps the relevance mass concentration visible
    assert got.score_recall_ppm.median() > got.n_packed.median() * 10**6 // got.n_candidates.median()


# ---------------------------------------------------------------------
# Round-10 batch L (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_win_burn_rate_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    # events parquet is TIMESTAMP(NANOS); read_table divides to micros
    # and unix_timestamp truncates to seconds — mimic with floor
    secs = (ev.ts.astype("int64") // 10**9).to_numpy()
    hour = secs // 3600
    err = (ev.event_type == "error").to_numpy()
    hours = np.unique(hour)
    n = {h: int((hour == h).sum()) for h in hours}
    e = {h: int(err[hour == h].sum()) for h in hours}
    got = (
        REGISTRY["win_burn_rate"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("hour_id")
        .reset_index(drop=True)
    )
    assert list(got.hour_id) == list(hours)
    alerts = 0
    for _, row in got.iterrows():
        hh = int(row.hour_id)
        n6 = sum(n.get(hh - k, 0) for k in range(6))
        e6 = sum(e.get(hh - k, 0) for k in range(6))
        assert (row.n, row.errs) == (n[hh], e[hh])
        assert row.short_burn_milli == 5000 * e[hh] // n[hh]
        assert row.long_burn_milli == 5000 * e6 // n6
        want_alert = int(
            row.short_burn_milli >= 2000 and row.long_burn_milli >= 1000
        )
        assert row.alert == want_alert
        alerts += want_alert
    # ~20% base error rate vs a 20% budget: burn hovers near 1000 milli,
    # the 2x short-window condition gates alerts to rare noisy hours
    assert 900 < got.long_burn_milli.median() < 1100
    assert alerts < len(got) // 10


def test_agg_prefix_cache_plan_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    got = (
        REGISTRY["agg_prefix_cache_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("prefix_chars")
        .reset_index(drop=True)
    )
    assert list(got.prefix_chars) == [8, 16, 32]
    for _, row in got.iterrows():
        L = int(row.prefix_chars)
        counts: dict[str, int] = {}
        for t in docs.text:
            p = t[:L]
            counts[p] = counts.get(p, 0) + 1
        hits = sum(c - 1 for c in counts.values())
        assert row.n_requests == len(docs)
        assert row.distinct_prefixes == len(counts)
        assert row.cache_hits == hits
        assert row.hit_ppm == 10**6 * hits // len(docs)
        assert row.tokens_saved == hits * (L // 4)
    # longer prefixes: monotonically fewer hits, larger working set
    assert list(got.cache_hits) == sorted(got.cache_hits, reverse=True)
    assert list(got.distinct_prefixes) == sorted(got.distinct_prefixes)


def test_agg_rater_gold_qc_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    keys = o.o_orderkey.to_numpy()
    custs = o.o_custkey.to_numpy()
    sel = keys % 10 == 0
    rater = (custs[sel] % 20).astype(np.int64)
    truth = ((keys[sel] // 10) % 2).astype(np.int64)
    c = cents[sel]
    got = (
        REGISTRY["agg_rater_gold_qc"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("rater")
        .reset_index(drop=True)
    )
    assert list(got.rater) == list(range(20))
    for _, row in got.iterrows():
        rs = rater == row.rater
        thr = 40 if row.rater < 3 else 10
        flip = (c[rs] // (7 + int(row.rater))) % 100 < thr
        vote = np.where(flip, 1 - truth[rs], truth[rs])
        n_gold, n_ok = int(rs.sum()), int((vote == truth[rs]).sum())
        assert (row.n_gold, row.n_correct) == (n_gold, n_ok)
        assert row.acc_ppm == 10**6 * n_ok // n_gold
        assert row.flagged == int(row.acc_ppm < 700_000)
    # the planted structure: exactly raters 0-2 flagged
    assert list(got[got.flagged == 1].rater) == [0, 1, 2]


def test_stream_quality_monitor_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    got = REGISTRY["stream_quality_monitor"].fn(spark, SF_001).toPandas()
    for _, row in got.iterrows():
        sub = docs[docs.source == row.source]
        ok = int(((sub.n_chars >= 100) & (sub.doc_id % 7 != 0)).sum())
        assert (row.docs_in, row.docs_pass) == (len(sub), ok)
        assert row.pass_ppm == 10**6 * ok // len(sub)
    assert got.docs_in.sum() == len(docs)
    # the boilerplate class alone caps pass_ppm below ~857k everywhere
    assert (got.pass_ppm < 900_000).all()


# ---------------------------------------------------------------------
# Round-10 batch M (staged for the R11 driver window)
# ---------------------------------------------------------------------


def _isqrt_exact(x: int) -> int:
    import math

    return math.isqrt(x)


def test_agg_dp_composition_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    views = ev[ev.event_type == "view"]
    day = (views.ts.astype("int64") // 10**9 // 86400).to_numpy()
    got = (
        REGISTRY["agg_dp_composition"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("day_id")
        .reset_index(drop=True)
    )
    days = sorted(set(day.tolist()))
    assert list(got.day_id) == days
    for _, row in got.iterrows():
        k = int((day == row.day_id).sum())
        basic = k * 100000
        adv = (100000 * _isqrt_exact(2 * k * 11512925 * 10**6)) // 10**6 + (
            k * 100000 * 105171
        ) // 10**6
        assert row.n_queries == k
        assert row.basic_eps_micro == basic
        assert row.advanced_eps_micro == adv
        assert row.best_eps_micro == min(basic, adv)
        assert row.over_budget == int(min(basic, adv) > 3_000_000)
    # at ~60 queries/day advanced (~sqrt k) must beat basic (~k)
    assert (got.advanced_eps_micro < got.basic_eps_micro).all()
    # and this traffic still blows a 3-eps/day budget every day
    assert (got.over_budget == 1).all()


def test_agg_checkpoint_plan_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    errs = ev[ev.event_type == "error"]
    secs = (errs.ts.astype("int64") // 10**9).to_numpy()
    mtbf = (int(secs.max()) - int(secs.min())) // (len(secs) - 1)
    got = (
        REGISTRY["agg_checkpoint_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("ckpt_cost_s")
        .reset_index(drop=True)
    )
    assert list(got.ckpt_cost_s) == [30, 60, 300]
    for _, row in got.iterrows():
        c = int(row.ckpt_cost_s)
        tau = _isqrt_exact(2 * c * mtbf)
        assert row.mtbf_s == mtbf
        assert row.n_failures == len(secs)
        assert row.tau_opt_s == tau
        assert row.overhead_ppm == 10**6 * c // tau + 10**6 * tau // (
            2 * mtbf
        )
        assert row.ckpts_per_day == 86400 // tau
    # Daly: costlier checkpoints -> longer intervals, higher overhead
    assert list(got.tau_opt_s) == sorted(got.tau_opt_s)
    assert list(got.overhead_ppm) == sorted(got.overhead_ppm)


def test_dedup_split_leakage_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    pres: dict[str, list] = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        content = (
            f"boilerplate page {doc_id % 5}"
            if doc_id % 7 == 0
            else text.strip().lower()
        )
        h = hashlib.md5(content.encode()).hexdigest()
        is_test = (
            int(hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:15], 16)
            % 10
            == 0
        )
        tr, te = pres.get(h, [0, 0])
        pres[h] = [tr + (0 if is_test else 1), te + (1 if is_test else 0)]
    train_docs = sum(v[0] for v in pres.values())
    test_docs = sum(v[1] for v in pres.values())
    leaked_hashes = sum(1 for v in pres.values() if v[0] > 0 and v[1] > 0)
    leaked_test = sum(v[1] for v in pres.values() if v[0] > 0)
    got = REGISTRY["dedup_split_leakage"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.train_docs, got.test_docs) == (train_docs, test_docs)
    assert got.train_distinct == sum(1 for v in pres.values() if v[0] > 0)
    assert got.test_distinct == sum(1 for v in pres.values() if v[1] > 0)
    assert got.leaked_hashes == leaked_hashes
    assert got.leaked_test_docs == leaked_test
    assert got.leakage_ppm == 10**6 * leaked_test // test_docs
    # the boilerplate duplicate class guarantees real leakage
    assert got.leaked_test_docs > 0


def test_agg_quantile_treatment_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    treated = (o.o_custkey.to_numpy() % 2).astype(np.int64)
    base = cents % 100000
    v = np.where(treated == 1, base + 5000 + base // 10, base)
    got = (
        REGISTRY["agg_quantile_treatment"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("q_pct")
        .reset_index(drop=True)
    )
    assert list(got.q_pct) == [10, 25, 50, 75, 90]
    for _, row in got.iterrows():
        q = int(row.q_pct)
        for grp, col in ((0, "q_control"), (1, "q_treated")):
            vals = np.sort(v[treated == grp])
            k = (q * len(vals) + 99) // 100
            assert row[col] == int(vals[k - 1])
        assert row.qte == row.q_treated - row.q_control
    # the planted heterogeneous effect: QTE grows along the quantiles
    assert list(got.qte) == sorted(got.qte)
    assert got.qte.iloc[-1] > got.qte.iloc[0] + 4000


# ---------------------------------------------------------------------
# Round-10 batch N (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_wilcoxon_signed_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    d = 30 + (cents // 13) % 200 - 100
    d = d[d != 0]
    ad = np.abs(d)
    vals = sorted(set(ad.tolist()))
    cum = 0
    w2p = w2m = var4 = 0
    for v in vals:
        sel = ad == v
        c = int(sel.sum())
        p = int((d[sel] > 0).sum())
        avg2 = 2 * cum + c + 1
        w2p += p * avg2
        w2m += (c - p) * avg2
        var4 += c * avg2 * avg2
        cum += c
    n = len(d)
    got = REGISTRY["agg_wilcoxon_signed"].fn(spark, SF_001).toPandas().iloc[0]
    assert got.n == n
    assert (got.w2_plus, got.w2_minus) == (w2p, w2m)
    # doubled-rank identity: the two signed sums partition n(n+1)
    assert w2p + w2m == n * (n + 1)
    z = 1000 * (w2p - w2m) // _isqrt_exact(var4)
    assert got.z_milli == z
    assert got.significant == int(z >= 1960)
    # the planted +30 mean shift is decisively significant
    assert got.significant == 1 and got.z_milli > 10_000


def test_sim_prefilter_vs_postfilter_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    panel = [i for i, v in enumerate(ids) if v % 53 == 1][:32]
    got = (
        REGISTRY["sim_prefilter_vs_postfilter"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    assert list(got.query_id) == [int(ids[i]) for i in panel]
    for row_i, i in enumerate(panel):
        dots = q @ q[i]
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-int(dots[j]), int(ids[j])),
        )
        top10 = order[:10]
        found = sum(1 for j in top10 if labels[j] % 2 == 0)
        row = got.iloc[row_i]
        assert row.k == 10
        assert row.post_found == found
        assert row.recall_ppm == 10**6 * found // 10
    # coverage varies by query — the audit's reason to exist: at least
    # one query must lose candidates to the filter
    assert (got.post_found < 10).any()
    assert (got.post_found > 0).all()


def test_sample_raking_weights_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    cells: dict[tuple, int] = {}
    for lang, source in zip(docs.lang, docs.source):
        g = int(hashlib.md5(source.encode()).hexdigest()[:15], 16) % 4
        cells[(lang, g)] = cells.get((lang, g), 0) + 1
    w = {k: 10**6 for k in cells}
    for _ in range(4):
        tot = sum(cells[k] * w[k] for k in cells)
        rm: dict[str, int] = {}
        for (lang, g), n in cells.items():
            rm[lang] = rm.get(lang, 0) + n * w[(lang, g)]
        w = {
            (lang, g): w[(lang, g)] * ((200000 * tot) // rm[lang]) // 10**6
            for (lang, g) in cells
        }
        tot = sum(cells[k] * w[k] for k in cells)
        cm: dict[int, int] = {}
        for (lang, g), n in cells.items():
            cm[g] = cm.get(g, 0) + n * w[(lang, g)]
        w = {
            (lang, g): w[(lang, g)] * ((250000 * tot) // cm[g]) // 10**6
            for (lang, g) in cells
        }
    tot = sum(cells[k] * w[k] for k in cells)
    rm = {}
    cm = {}
    for (lang, g), n in cells.items():
        rm[lang] = rm.get(lang, 0) + n * w[(lang, g)]
        cm[g] = cm.get(g, 0) + n * w[(lang, g)]
    got = REGISTRY["sample_raking_weights"].fn(spark, SF_001).toPandas()
    assert len(got) == len(cells)
    for _, row in got.iterrows():
        key = (row.lang, int(row.src_grp))
        assert row.n_docs == cells[key]
        assert row.weight_ppm == w[key]
        assert row.row_share_ppm == 10**6 * rm[row.lang] // tot
        assert row.col_share_ppm == 10**6 * cm[int(row.src_grp)] // tot
    # 4 IPF rounds converge the margins to uniform within 1%
    for _, row in got.iterrows():
        assert abs(row.row_share_ppm - 200_000) < 10_000
        assert abs(row.col_share_ppm - 250_000) < 10_000


def test_agg_refusal_matrix_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    cat = (o.o_custkey.to_numpy() % 6).astype(np.int64)
    harmful = ((cents // 17) % 10 < 3).astype(np.int64)
    refused = np.where(
        harmful == 1,
        ((cents // 29) % 100 >= 10).astype(np.int64),
        ((cents // 23) % 100 < 5 + 2 * cat).astype(np.int64),
    )
    got = (
        REGISTRY["agg_refusal_matrix"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("cat")
        .reset_index(drop=True)
    )
    assert list(got.cat) == list(range(6))
    overs = []
    for _, row in got.iterrows():
        sel = cat == int(row["cat"])  # attr access hits pandas' .cat
        n, h = int(sel.sum()), int(harmful[sel].sum())
        rh = int((harmful[sel] & refused[sel]).sum())
        rb = int(((1 - harmful[sel]) & refused[sel]).sum())
        assert (row.n, row.harmful) == (n, h)
        assert (row.refused_harmful, row.refused_benign) == (rh, rb)
        assert row.answered_harmful == h - rh
        assert row.benign == n - h
        assert row.under_refusal_ppm == 10**6 * (h - rh) // h
        assert row.over_refusal_ppm == 10**6 * rb // (n - h)
        overs.append(row.over_refusal_ppm)
    # the planted over-refusal ladder climbs with category
    assert overs == sorted(overs)
    # flat ~10% under-refusal everywhere
    assert all(50_000 < u < 150_000 for u in got.under_refusal_ppm)


# ---------------------------------------------------------------------
# Round-10 batch O (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_emb_bitdepth_recall_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    qf = np.floor(x * 1000).astype(np.int64)
    levels = {
        8: np.clip(np.floor(x * 128), -128, 127).astype(np.int64),
        4: np.clip(np.floor(x * 8), -8, 7).astype(np.int64),
        2: np.clip(np.floor(x * 2), -2, 1).astype(np.int64),
    }
    panel = [i for i, v in enumerate(ids) if v % 41 == 2][:32]

    def top1(mat, i):
        dots = mat @ mat[i]
        return min(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-int(dots[j]), int(ids[j])),
        )

    got = (
        REGISTRY["emb_bitdepth_recall"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("bits")
        .reset_index(drop=True)
    )
    assert list(got.bits) == [2, 4, 8]
    for _, row in got.iterrows():
        agree = sum(
            1
            for i in panel
            if top1(levels[int(row.bits)], i) == top1(qf, i)
        )
        assert row.n_queries == len(panel)
        assert row.n_agree == agree
        assert row.recall_ppm == 10**6 * agree // len(panel)
    # monotone decay along the bit-depth ladder, int8 near-lossless
    r = dict(zip(got.bits, got.recall_ppm))
    assert r[8] >= r[4] >= r[2]
    assert r[8] > 900_000


def test_agg_cascade_cost_curve_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    conf = (cents // 19) % 1000
    ok_small = ((cents // 53) % 1000 < 500 + conf // 2).astype(np.int64)
    ok_big = ((cents // 59) % 100 < 95).astype(np.int64)
    n = len(cents)
    got = (
        REGISTRY["agg_cascade_cost_curve"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("threshold_milli")
        .reset_index(drop=True)
    )
    assert list(got.threshold_milli) == [0, 200, 400, 600, 800, 1000]
    for _, row in got.iterrows():
        routed = conf < row.threshold_milli
        nr = int(routed.sum())
        correct = int(np.where(routed, ok_big, ok_small).sum())
        assert row.routed == nr
        assert row.routed_ppm == 10**6 * nr // n
        assert row.acc_ppm == 10**6 * correct // n
        assert row.cost_milli_per_req == 1000 * (n + 9 * nr) // n
    # cost rises monotonically with the threshold; accuracy rises
    # through t=800 — and the t=800 cascade BEATS big-only (the kept
    # top-confidence slice is >95% accurate on this fixture), which is
    # the cascade's entire selling point: better than 10x-cost
    # big-only, at a fraction of the price
    assert list(got.cost_milli_per_req) == sorted(got.cost_milli_per_req)
    assert list(got.acc_ppm[:5]) == sorted(got.acc_ppm[:5])
    assert got.acc_ppm.iloc[4] > got.acc_ppm.iloc[5]
    assert got.cost_milli_per_req.iloc[4] < got.cost_milli_per_req.iloc[5]
    # endpoints: small-only 1x cost, big-only 10x cost and ~95% acc
    assert got.cost_milli_per_req.iloc[0] == 1000
    assert got.cost_milli_per_req.iloc[-1] == 10000
    assert abs(got.acc_ppm.iloc[-1] - 950_000) < 20_000


def test_agg_moe_capacity_sweep_matches_pure_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    h = (li.l_orderkey.to_numpy() * 8 + li.l_linenumber.to_numpy()).astype(
        np.int64
    )
    pk = li.l_partkey.to_numpy().astype(np.int64)
    raws = np.stack(
        [(h * (e + 3) + pk * (e + 1)) % 1000 + 1 for e in range(8)], axis=1
    )
    chosen = raws.argmax(axis=1)
    n = len(h)
    counts = [int((chosen == e).sum()) for e in range(8)]
    got = (
        REGISTRY["agg_moe_capacity_sweep"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("capacity_milli")
        .reset_index(drop=True)
    )
    assert list(got.capacity_milli) == [1000, 1250, 1500, 2000]
    for _, row in got.iterrows():
        cap = n * int(row.capacity_milli) // 8000
        dropped = sum(max(0, c - cap) for c in counts)
        over = sum(1 for c in counts if c > cap)
        assert row.capacity_tokens == cap
        assert (row.dropped, row.experts_over) == (dropped, over)
        assert row.drop_ppm == 10**6 * dropped // n
    # drops shrink monotonically with headroom and hit zero by f=2.0
    assert list(got.dropped) == sorted(got.dropped, reverse=True)
    assert got.dropped.iloc[-1] == 0
    # cross-check against agg_moe_balance's fixture at f=1.25
    bal = REGISTRY["agg_moe_balance"].fn(spark, SF_001).toPandas()
    assert got[got.capacity_milli == 1250].dropped.iloc[0] == bal.dropped.sum()


def test_agg_winrate_sample_size_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    w = (cents % 2 == 0).astype(np.int64)
    n = len(cents)
    p = 10**6 * int(w.sum()) // n
    got = (
        REGISTRY["agg_winrate_sample_size"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("target_halfwidth_ppm")
        .reset_index(drop=True)
    )
    assert list(got.target_halfwidth_ppm) == [10000, 25000, 50000]
    for _, row in got.iterrows():
        t = int(row.target_halfwidth_ppm)
        need = (3841 * p * (10**6 - p) + 1000 * t * t - 1) // (1000 * t * t)
        assert (row.p_ppm, row.n_have) == (p, n)
        assert row.n_needed == need
        assert row.enough == int(n >= need)
    # near p=0.5 the classic numbers: ~9.6k for +/-1%, ~384 for +/-5%
    assert 9_000 < got.n_needed.iloc[0] < 10_000
    assert 350 < got.n_needed.iloc[-1] < 400
    # 15k battles clear every target on this grid (9.6k is the bar)
    assert list(got.enough) == [1, 1, 1]


# ---------------------------------------------------------------------
# Round-10 batch P (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_leaderboard_churn_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    model = (o.o_custkey.to_numpy() % 20).astype(np.int64)
    snap = (o.o_orderkey.to_numpy() % 2).astype(np.int64)
    ok = ((cents // 7) % 100 < 40 + 3 * model).astype(np.int64)
    ranks = {}
    for s in (0, 1):
        accs = []
        for m in range(20):
            sel = (model == m) & (snap == s)
            accs.append((-(10**6 * int(ok[sel].sum()) // int(sel.sum())), m))
        order = sorted(accs)
        ranks[s] = {m: i + 1 for i, (_a, m) in enumerate(order)}
    conc = disc = 0
    for a in range(20):
        for b in range(a + 1, 20):
            s = (ranks[0][a] - ranks[0][b]) * (ranks[1][a] - ranks[1][b])
            conc += s > 0
            disc += s < 0
    tau = 1000 * (conc - disc) // (conc + disc)
    got = (
        REGISTRY["agg_leaderboard_churn"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got.k) == [1, 5, 10]
    for _, row in got.iterrows():
        k = int(row.k)
        ov = sum(
            1 for m in range(20) if ranks[0][m] <= k and ranks[1][m] <= k
        )
        assert row.topk_overlap == ov
        assert row.jaccard_ppm == 10**6 * ov // (2 * k - ov)
        assert row.tau_milli == tau
    # the planted 3-points/model ladder dominates the split noise:
    # the board is highly stable across snapshots
    assert got.tau_milli.iloc[0] > 800
    assert got[got.k == 10].topk_overlap.iloc[0] >= 9


def test_agg_group_sequential_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    bucket = (o.o_orderkey.to_numpy() % 5).astype(np.int64)
    t = (o.o_custkey.to_numpy() % 2).astype(np.int64)
    y = ((cents // 31) % 100 < 50 + 5 * t).astype(np.int64)
    bounds = {1: 4877, 2: 3357, 3: 2680, 4: 2290, 5: 2031}
    got = (
        REGISTRY["agg_group_sequential"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("look")
        .reset_index(drop=True)
    )
    assert list(got.look) == [1, 2, 3, 4, 5]
    crossed_looks = []
    for _, row in got.iterrows():
        sel = bucket < row.look
        nt, nc = int(t[sel].sum()), int((1 - t[sel]).sum())
        xt = int((t[sel] * y[sel]).sum())
        xc = int(((1 - t[sel]) * y[sel]).sum())
        num = xt * nc - xc * nt
        den = nt * nc * (xt + xc) * (nt + nc - xt - xc)
        z2i = num * num * (nt + nc) // den
        z2f = 10**6 * (num * num * (nt + nc) % den) // den
        z = _isqrt_exact(10**6 * z2i + z2f)
        assert row.n_total == nt + nc
        assert row.z_milli == z
        assert row.boundary_milli == bounds[int(row.look)]
        assert row.crossed == int(z >= bounds[int(row.look)])
        if row.crossed:
            crossed_looks.append(int(row.look))
    # OBF shape: look 1's 4.877 boundary holds, the planted +5-point
    # effect crosses by the later looks
    assert 1 not in crossed_looks
    assert len(crossed_looks) >= 2
    # z grows with information on a real effect
    assert got.z_milli.iloc[-1] > got.z_milli.iloc[0]


def test_qa_split_balance_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    is_test = np.array(
        [
            int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:15], 16) % 10
            == 0
            for i in docs.doc_id
        ]
    )
    src_grp = np.array(
        [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 4
            for s in docs.source
        ]
    )
    dims = {
        "lang": docs.lang.to_numpy(),
        "src_grp": src_grp.astype(str),
        "len_bkt": (docs.n_chars.to_numpy() // 50).astype(str),
    }
    got = REGISTRY["qa_split_balance"].fn(spark, SF_001).toPandas()
    assert set(got.dimension) == set(dims)
    n_tr, n_te = int((~is_test).sum()), int(is_test.sum())
    for _, row in got.iterrows():
        vals = dims[row.dimension]
        l1 = 0
        max_gap = 0
        nv = 0
        for v in set(vals.tolist()):
            sel = vals == v
            c_tr = int((sel & ~is_test).sum())
            c_te = int((sel & is_test).sum())
            diff = abs(c_tr * n_te - c_te * n_tr)
            l1 += diff
            max_gap = max(max_gap, 10**6 * diff // (n_tr * n_te))
            nv += 1
        assert row.n_values == nv
        assert row.tvd_ppm == 10**6 * l1 // (2 * n_tr * n_te)
        assert row.max_gap_ppm == max_gap
    # an id-hash split with only ~54 test docs: the marginals are
    # NOISY (TVD ~ sqrt(k/n_te) lands near 25% on the 12-value length
    # dimension) — which is exactly the warning this audit raises for
    # small holdouts; nonzero everywhere, bounded below 40%
    assert (got.tvd_ppm > 0).all()
    assert (got.tvd_ppm < 400_000).all()
    # per-value gaps can never exceed the full TVD doubled
    assert (got.max_gap_ppm <= 2 * got.tvd_ppm).all()


# ---------------------------------------------------------------------
# Round-10 batch Q (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_friedman_test_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    s = np.stack(
        [
            (cents // 7) % 1000 + 0,
            (cents // 8) % 1000 + 50,
            (cents // 9) % 1000 + 100,
            (cents // 10) % 1000 + 150,
        ],
        axis=1,
    )
    b = len(cents)
    t = [0, 0, 0, 0]
    for row in s:
        for j in range(4):
            cl = int((row < row[j]).sum())
            ties = int((row == row[j]).sum())  # includes self
            t[j] += 2 * cl + ties + 1  # doubled midrank
    got = REGISTRY["agg_friedman_test"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n_blocks, got.k_treatments, got.df) == (b, 4, 3)
    assert [got.r2_t0, got.r2_t1, got.r2_t2, got.r2_t3] == t
    chi = 3000 * sum(x * x for x in t) // (b * 20) - 3000 * b * 5
    assert got.chi2_milli == chi
    assert got.significant == int(chi >= 7815)
    # per-block doubled ranks sum to k(k+1): the global identity
    assert sum(t) == b * 20
    # the planted +50/treatment ladder is decisive
    assert got.significant == 1 and got.chi2_milli > 100_000
    # and rank mass is monotone in the planted ladder
    assert t[0] < t[1] < t[2] < t[3]


def test_dedup_hash_collision_audit_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    hashes = set()
    for doc_id, text in zip(docs.doc_id, docs.text):
        content = (
            f"boilerplate page {doc_id % 5}"
            if doc_id % 7 == 0
            else text.strip().lower()
        )
        hashes.add(hashlib.md5(content.encode()).hexdigest())
    n = len(hashes)
    got = (
        REGISTRY["dedup_hash_collision_audit"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("bits")
        .reset_index(drop=True)
    )
    assert list(got.bits) == [16, 24, 32]
    for _, row in got.iterrows():
        chars = int(row.bits) // 4
        buckets = len({h[:chars] for h in hashes})
        assert row.n_texts == n
        assert row.n_buckets == buckets
        assert row.collisions == n - buckets
        assert row.expected_milli == 1000 * n * (n - 1) // 2 ** (
            int(row.bits) + 1
        )
    # birthday structure: collisions vanish as width grows, and the
    # 16-bit observation is within ~4x of the exact expectation
    assert list(got.collisions) == sorted(got.collisions, reverse=True)
    assert got[got.bits == 32].collisions.iloc[0] == 0
    e16 = got[got.bits == 16].iloc[0]
    if e16.expected_milli > 500:
        assert e16.collisions * 1000 <= 4 * e16.expected_milli + 4000


def test_agg_rbo_overlap_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    model = (o.o_custkey.to_numpy() % 20).astype(np.int64)
    snap = (o.o_orderkey.to_numpy() % 2).astype(np.int64)
    ok = ((cents // 7) % 100 < 40 + 3 * model).astype(np.int64)
    ranks = {}
    for s_ in (0, 1):
        accs = []
        for m in range(20):
            sel = (model == m) & (snap == s_)
            accs.append((-(10**6 * int(ok[sel].sum()) // int(sel.sum())), m))
        order = sorted(accs)
        ranks[s_] = {m: i + 1 for i, (_a, m) in enumerate(order)}
    weights = [
        1000000, 900000, 810000, 729000, 656100, 590490, 531441, 478296,
        430467, 387420,
    ]
    got = (
        REGISTRY["agg_rbo_overlap"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    assert list(got.depth) == list(range(1, 11))
    total = 0
    for _, row in got.iterrows():
        d = int(row.depth)
        ov = sum(
            1 for m in range(20) if ranks[0][m] <= d and ranks[1][m] <= d
        )
        assert row.overlap == ov
        assert row.agreement_ppm == 10**6 * ov // d
        assert row.weight_ppm == weights[d - 1]
        total += weights[d - 1] * ov // d
    assert (got.rbo_ppm == total // 10).all()
    # overlap grows with depth; the stable planted board keeps RBO high
    assert list(got.overlap) == sorted(got.overlap)
    assert got.rbo_ppm.iloc[0] > 500_000
    # exact floored weights: 0.9^7 * 1e6 floors to 478296 (not 478297)
    assert got[got.depth == 8].weight_ppm.iloc[0] == 478296


# ---------------------------------------------------------------------
# Round-10 batch R (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_design_effect_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    c = o.o_custkey.to_numpy().astype(np.int64)
    v = (c % 100) * 5 + (cents // 7) % 500
    clusters = {}
    for ci, vi in zip(c, v):
        m, s = clusters.get(int(ci), (0, 0))
        clusters[int(ci)] = (m + 1, s + int(vi))
    N = len(v)
    K = len(clusters)
    S = int(v.sum())
    Q = int((v.astype(object) ** 2).sum())
    sum_m2 = sum(m * m for m, _s in clusters.values())
    bterm = sum(N * s * s // m for m, s in clusters.values())
    A = bterm - S * S
    B = Q * N - bterm
    m0 = 1000 * (N * N - sum_m2) // (N * (K - 1))
    icc = (
        10**6 * (A * (N - K) - B * (K - 1))
        // (1000 * A * (N - K) + (m0 - 1000) * B * (K - 1))
    )
    deff = 1000 + (m0 - 1000) * icc // 1000
    got = REGISTRY["agg_design_effect"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n, got.k_clusters) == (N, K)
    assert got.m0_milli == m0
    assert got.icc_milli == icc
    assert got.deff_milli == deff
    assert got.n_eff == 1000 * N // deff
    # the planted cluster effect: positive ICC, a real DEFF penalty
    assert got.icc_milli > 100
    assert got.deff_milli > 1100
    assert got.n_eff < N


def test_agg_freshness_halflife_matches_pure_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    dates = pd.to_datetime(o.o_orderdate)
    age = (dates.max() - dates).dt.days.to_numpy()
    got = (
        REGISTRY["agg_freshness_halflife"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("halflife_days")
        .reset_index(drop=True)
    )
    assert list(got.halflife_days) == [30, 90, 365]
    for _, row in got.iterrows():
        h = int(row.halflife_days)
        w = np.where(age // h >= 20, 0, 1000000 >> np.minimum(age // h, 19))
        mass = int(w.sum())
        assert row.n == len(age)
        assert row.effective_docs == mass // 10**6
        assert row.mean_weight_ppm == mass // len(age)
        assert row.recent_ppm == 10**6 * int((age <= h).sum()) // len(age)
    # longer half-life keeps more of the corpus alive, monotonically
    assert list(got.effective_docs) == sorted(got.effective_docs)
    # TPC-H spans ~7 years: the 30-day economy is nearly all decayed
    assert got.mean_weight_ppm.iloc[0] < 50_000
    assert got.mean_weight_ppm.iloc[-1] > 100_000


def test_graph_attack_tolerance_matches_pure_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    lp = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in lp.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp.l_partkey))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda n_: (-deg[n_], n_))
    rank = {n_: i + 1 for i, n_ in enumerate(order)}
    got = (
        REGISTRY["graph_attack_tolerance"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("k_ppm")
        .reset_index(drop=True)
    )
    assert list(got.k_ppm) == [10000, 50000, 100000]
    for _, row in got.iterrows():
        cut = len(deg) * int(row.k_ppm) // 10**6
        left = sum(1 for a, b in edges if rank[a] > cut and rank[b] > cut)
        assert (row.n_nodes, row.n_edges) == (len(deg), len(edges))
        assert row.n_removed == cut
        assert row.edges_left == left
        assert row.edge_survival_ppm == 10**6 * left // len(edges)
    # hub attack: removing k% of nodes kills MORE than k% of edges
    for _, row in got.iterrows():
        assert 10**6 - row.edge_survival_ppm > row.k_ppm
    assert list(got.edge_survival_ppm) == sorted(
        got.edge_survival_ppm, reverse=True
    )


# ---------------------------------------------------------------------
# Round-10 batch S (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_auc_delong_ci_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    s = (cents // 7) % 1000
    y = ((cents // 13) % 1000 < 300 + s // 2).astype(np.int64)
    vals = sorted(set(s.tolist()))
    p = {v: int(((s == v) & (y == 1)).sum()) for v in vals}
    q = {v: int(((s == v) & (y == 0)).sum()) for v in vals}
    m = sum(p.values())
    n = sum(q.values())
    qlt = plt = 0
    s10 = s10sq = s01 = s01sq = 0
    for v in vals:
        v10 = 10**6 * (2 * qlt + q[v]) // (2 * n)
        v01 = 10**6 * (2 * (m - plt - p[v]) + p[v]) // (2 * m)
        s10 += p[v] * v10
        s10sq += p[v] * v10 * v10
        s01 += q[v] * v01
        s01sq += q[v] * v01 * v01
        qlt += q[v]
        plt += p[v]
    auc = s10 // m
    var10 = (m * s10sq - s10 * s10) // (m * m * (m - 1))
    var01 = (n * s01sq - s01 * s01) // (n * n * (n - 1))
    se = _isqrt_exact(var10 + var01)
    got = REGISTRY["agg_auc_delong_ci"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n_pos, got.n_neg) == (m, n)
    assert got.auc_ppm == auc
    assert got.se_ppm == se
    assert got.lo_ppm == max(0, auc - 1960 * se // 1000)
    assert got.hi_ppm == min(10**6, auc + 1960 * se // 1000)
    # the planted score-correlated labels: AUC well above chance and
    # a tight interval at 15k rows that excludes 0.5
    assert got.auc_ppm > 650_000
    assert got.se_ppm < 10_000
    assert got.lo_ppm > 500_000


def test_agg_iv_wald_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    z = (o.o_custkey.to_numpy() % 2).astype(np.int64)
    t = ((cents // 11) % 100 < np.where(z == 1, 60, 10)).astype(np.int64)
    y = (cents // 11) % 1000 + 100 * t
    n1, n0 = int(z.sum()), int((1 - z).sum())
    sy1, sy0 = int(y[z == 1].sum()), int(y[z == 0].sum())
    st1, st0 = int(t[z == 1].sum()), int(t[z == 0].sum())
    nt, nc = int(t.sum()), int((1 - t).sum())
    syt, syc = int(y[t == 1].sum()), int(y[t == 0].sum())
    got = REGISTRY["agg_iv_wald"].fn(spark, SF_001).toPandas().iloc[0]
    assert (got.n_encouraged, got.n_control) == (n1, n0)
    assert got.takeup_gap_ppm == 10**6 * (st1 * n0 - st0 * n1) // (n1 * n0)
    assert got.itt_y_micro == 10**6 * (sy1 * n0 - sy0 * n1) // (n1 * n0)
    wald = 10**6 * (sy1 * n0 - sy0 * n1) // (st1 * n0 - st0 * n1)
    assert got.wald_micro == wald
    assert got.naive_ols_micro == 10**6 * (syt * nc - syc * nt) // (nt * nc)
    # the planted +100 effect: Wald recovers it within sampling noise
    # (measured 90.8), the naive uptake contrast is biased ~45% low by
    # the shared compliance/baseline plane (measured 55.2)
    assert abs(got.wald_micro - 100_000_000) < 15_000_000
    assert abs(got.naive_ols_micro - 100_000_000) > 30_000_000
    # and the bias direction is the planted one: compliers sit on the
    # LOW end of the baseline plane
    assert got.naive_ols_micro < got.wald_micro


def test_agg_switchback_est_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    secs = (ev.ts.astype("int64") // 10**9).to_numpy()
    day = secs // 86400
    hod = (secs // 3600) % 24
    import decimal

    v = np.array(
        [
            int(
                decimal.Decimal(repr(float(x))).quantize(
                    decimal.Decimal("0.0001")
                )
                * 10000
            )
            for x in ev.value
        ],
        dtype=np.int64,
    )
    treat_day = {
        int(d): int(hashlib.md5(f"{d}:sb".encode()).hexdigest()[:15], 16) % 2
        for d in set(day.tolist())
    }
    treat = np.array([treat_day[int(d)] for d in day])
    y = v + 500000 * treat
    got = REGISTRY["agg_switchback_est"].fn(spark, SF_001).toPandas()
    for _, row in got.iterrows():
        sel = np.ones(len(y), dtype=bool)
        if row.estimator == "boundary_excluded":
            sel = hod >= 4
        n1 = int(treat[sel].sum())
        n0 = int((1 - treat[sel]).sum())
        s1 = int(y[sel][treat[sel] == 1].sum())
        s0 = int(y[sel][treat[sel] == 0].sum())
        assert (row.n_treated, row.n_control) == (n1, n0)
        assert row.effect_em4 == (s1 * n0 - s0 * n1) // (n1 * n0)
    # carryover-free fixture: both estimators see the planted +500000
    # e-4 block effect (value noise is zero-mean across the day coin)
    for _, row in got.iterrows():
        assert abs(row.effect_em4 - 500_000) < 50_000


# ---------------------------------------------------------------------
# Round-10 batch T (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_mm1_queue_plan_matches_pure_python(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    secs = (ev.ts.astype("int64") // 10**9).to_numpy()
    h = secs // 3600
    n = len(h)
    hours = int(h.max()) - int(h.min()) + 1
    got = (
        REGISTRY["agg_mm1_queue_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("mu_per_hour")
        .reset_index(drop=True)
    )
    assert list(got.mu_per_hour) == [15, 20, 30]
    for _, row in got.iterrows():
        mu = int(row.mu_per_hour)
        rho = 10**6 * n // (hours * mu)
        assert row.lambda_milli == 1000 * n // hours
        assert row.rho_ppm == rho
        assert row.stable == int(rho < 10**6)
        if rho < 10**6:
            lq = rho * rho // (1000 * (10**6 - rho))
            assert row.lq_milli == lq
            assert row.wait_s_milli == lq * 3600 * hours // n + (
                3600000 // mu
            )
    # the queueing knee: near saturation the queue explodes nonlinearly
    lqs = dict(zip(got.mu_per_hour, got.lq_milli))
    assert lqs[15] > 8 * lqs[30]
    assert (got.stable == 1).all()


def test_text_self_bleu_sampled_matches_pure_python(spark):
    import re as _re

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    got = REGISTRY["text_self_bleu_sampled"].fn(spark, SF_001).toPandas()
    assert len(got) == docs.source.nunique()
    for _, row in got.iterrows():
        sub = (
            docs[docs.source == row.source]
            .sort_values("doc_id")
            .head(4)
        )
        toks = [
            _re.split(r"\s+", t.strip()) for t in sub.text
        ]
        counts = []
        for ts in toks:
            c: dict[str, int] = {}
            for t in ts:
                c[t] = c.get(t, 0) + 1
            counts.append(c)
        ppms = []
        for i in range(len(counts)):
            for j in range(i + 1, len(counts)):
                hits = sum(
                    min(ci, counts[j].get(t, 0))
                    for t, ci in counts[i].items()
                )
                total = sum(counts[i].values())
                ppms.append(10**6 * hits // total)
        assert row.n_pairs == len(ppms)
        assert row.self_bleu1_ppm == sum(ppms) // len(ppms)
    # the synthetic shared-vocabulary corpus has HIGH self-overlap --
    # which is exactly what this audit flags
    assert got.self_bleu1_ppm.median() > 300_000


def test_emb_silhouette_centroids_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    labels = emb.label.to_numpy()
    q = np.floor(
        np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1000
    ).astype(np.int64)
    uniq = sorted(set(int(x) for x in labels))
    cents = {
        lb: np.floor(
            q[labels == lb].sum(axis=0).astype(np.float64)
            / (labels == lb).sum()
        ).astype(np.int64)
        for lb in uniq
    }
    got = (
        REGISTRY["emb_silhouette_centroids"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("label")
        .reset_index(drop=True)
    )
    assert list(got.label) == uniq
    for _, row in got.iterrows():
        lb = int(row.label)
        sel = labels == lb
        d2 = ((q[sel] - cents[lb]) ** 2).sum(axis=1)
        mean_own = int(d2.sum()) // int(sel.sum())
        d2o = min(
            int(((cents[lb] - cents[o]) ** 2).sum())
            for o in uniq
            if o != lb
        )
        assert row.n == int(sel.sum())
        assert row.mean_d2_own == mean_own
        assert row.d2_nearest_centroid == d2o
        assert row.separation_ratio_ppm == 10**6 * d2o // mean_own
    # consistency with emb_centroid_confusion: labels with the LOWEST
    # separation ratio are where confusion concentrates; at minimum the
    # ratio column must vary (uniform would mean no geometry signal)
    assert got.separation_ratio_ppm.max() > got.separation_ratio_ppm.min()


# ---------------------------------------------------------------------
# Round-10 batch U (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_sample_ess_audit_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    p = (cents // 7) % 100
    w = 100000 + p * 1000 + np.where(p == 99, 5000000, 0)
    n = len(w)
    s1 = int(w.sum())
    got = (
        REGISTRY["sample_ess_audit"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("clip_x_mean")
        .reset_index(drop=True)
    )
    assert list(got.clip_x_mean) == [-1, 2, 5, 10]
    ess = {}
    for _, row in got.iterrows():
        c = int(row.clip_x_mean)
        cap = (10**6 if c == -1 else c) * s1 // n
        wc = np.minimum(w, cap)
        c1 = int(wc.sum())
        c2 = int((wc.astype(object) * wc).sum())
        assert row.n == n
        assert row.n_clipped == int((w > cap).sum())
        assert row.ess_ppm == 10**6 * c1 * c1 // (n * c2)
        assert row.mean_w_ppm == c1 // n
        ess[c] = row.ess_ppm
    # the trade: tighter clips recover ESS monotonically while the
    # mean weight (the bias knob) falls
    assert ess[2] > ess[5] > ess[10] > ess[-1]
    means = dict(zip(got.clip_x_mean, got.mean_w_ppm))
    assert means[2] < means[5] < means[10] <= means[-1]
    # the planted 1%-jackpot tail makes unclipped ESS genuinely poor
    # (measured 133k ppm) and a 2x-mean cap recovers ~94% efficiency
    assert ess[-1] < 200_000
    assert ess[2] > 900_000


def test_agg_jackknife_ratio_se_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    keys = o.o_orderkey.to_numpy()
    fold = np.array(
        [
            int(hashlib.md5(f"{k}:jk".encode()).hexdigest()[:15], 16) % 10
            for k in keys
        ]
    )
    num = (cents % 3 == 0).astype(np.int64)
    den = (cents % 2 == 0).astype(np.int64)
    tn, td = int(num.sum()), int(den.sum())
    thetas = []
    for g in range(10):
        sel = fold != g
        thetas.append(
            10**6 * int(num[sel].sum()) // int(den[sel].sum())
        )
    g = 10
    st = sum(thetas)
    st2 = sum(t * t for t in thetas)
    rad = (st2 - st * st // g) * (g - 1) // g
    got = (
        REGISTRY["agg_jackknife_ratio_se"].fn(spark, SF_001)
        .toPandas().iloc[0]
    )
    assert got.n_folds == 10
    assert got.ratio_ppm == 10**6 * tn // td
    assert got.se_ppm == _isqrt_exact(rad)
    # the ratio of two ~50% indicators at 15k rows: a real but small SE
    assert 0 < got.se_ppm < 30_000


def test_store_manifest_diff_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    part = o.o_orderdate.astype(str).str[:7].to_numpy()
    d = pd.to_datetime(o.o_orderdate)
    in_a = (d <= pd.Timestamp("1997-12-31")).to_numpy()
    parts = sorted(set(part.tolist()))
    manifest = {}
    for pt in parts:
        sel = part == pt
        manifest[pt] = (
            int((sel & in_a).sum()),
            int(sel.sum()),
            int(cents[sel & in_a].sum()),
            int(cents[sel].sum()),
        )
    got = REGISTRY["store_manifest_diff"].fn(spark, SF_001).toPandas()
    summ = got[got.grain == "summary"].iloc[0]
    added = sum(1 for ra, _rb, _ca, _cb in manifest.values() if ra == 0)
    changed = sum(
        1 for ra, rb, _ca, _cb in manifest.values() if ra > 0 and rb != ra
    )
    unchanged = sum(
        1
        for ra, rb, ca, cb in manifest.values()
        if rb == ra and cb == ca
    )
    assert summ.n == len(parts)
    assert (summ.added, summ.changed, summ.unchanged) == (
        added, changed, unchanged,
    )
    assert summ.row_delta == sum(
        rb - ra for ra, rb, _ca, _cb in manifest.values()
    )
    # the immutable-fact structure: no partition is 'changed', every
    # delta row is a pure addition (1998 months)
    assert changed == 0 and added > 0
    per = got[got.grain == "partition"]
    assert len(per) == added
    assert (per.part.str[:4] >= "1998").all()
    assert (per.added == 1).all()


# ---------------------------------------------------------------------
# Round-10 batch V (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_text_watermark_detect_matches_pure_python(spark):
    import re as _re

    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    per_source: dict[str, list] = {}
    for doc_id, text, source in zip(docs.doc_id, docs.text, docs.source):
        m = (
            1
            if int(hashlib.md5(source.encode()).hexdigest()[:15], 16) % 4
            == 0
            else 0
        )
        toks = _re.split(r"\s+", text.strip())
        n = len(toks)
        g = sum(
            1
            for i, t in enumerate(toks, start=1)
            if int(
                hashlib.md5(f"{t}:{doc_id}:{i}".encode()).hexdigest()[:15],
                16,
            )
            % 100
            < 50 + 40 * m
        )
        flagged = int(2 * g - n > 0 and (2 * g - n) ** 2 >= 9 * n)
        s = per_source.setdefault(source, [m, 0, 0, 0, 0])
        s[1] += 1
        s[2] += flagged
        s[3] += g
        s[4] += n
    got = REGISTRY["text_watermark_detect"].fn(spark, SF_001).toPandas()
    assert len(got) == len(per_source)
    for _, row in got.iterrows():
        m, nd, nf, gg, nn = per_source[row.source]
        assert (row.marked_source, row.n_docs, row.n_flagged) == (m, nd, nf)
        assert row.flag_ppm == 10**6 * nf // nd
        assert row.green_rate_ppm == 10**6 * gg // nn
    # the planted watermark separates cleanly: marked sources flag the
    # bulk of their documents, clean sources essentially never do
    marked = got[got.marked_source == 1]
    clean = got[got.marked_source == 0]
    assert len(marked) >= 3 and len(clean) >= 10
    assert marked.flag_ppm.min() > 600_000
    assert clean.flag_ppm.max() < 50_000
    # and clean sources sit at the fair-coin green rate
    assert abs(clean.green_rate_ppm.mean() - 500_000) < 20_000


def test_agg_ljung_box_matches_pure_python(spark):
    cents, o = _cents_series(spark)
    day = pd.to_datetime(o.o_orderdate).dt.floor("D")
    rev = pd.Series(cents).groupby(day.values).sum().sort_index()
    x = rev.to_numpy().astype(object)
    D = len(x)
    S = int(sum(x))
    e = [int(v) * D - S for v in x]
    c0 = sum(v * v for v in e)
    got = (
        REGISTRY["agg_ljung_box"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("lag")
        .reset_index(drop=True)
    )
    assert list(got.lag) == [1, 2, 3, 4, 5]
    lb = 0
    for _, row in got.iterrows():
        k = int(row.lag)
        c = sum(e[i] * e[i - k] for i in range(k, D))
        num = 10**6 * c
        # both engines truncate toward zero (dividend-sign remainder);
        # python's % floors, so emulate trunc explicitly
        r = num // c0 if num >= 0 else -((-num) // c0)
        assert row.r_ppm == r
        assert row.r2_ppm == r * r // 10**6
        lb += (1000 * D * (D + 2) * r * r) // ((D - k) * 10**12)
        assert row.lb_cum_milli == lb
        if k == 5:
            assert row.significant_at_5 == int(lb >= 11070)
        else:
            assert row.significant_at_5 == -1
    # TPC-H order dates are iid uniform: daily revenue is white noise,
    # the test must NOT reject (that's the calibration check)
    assert got[got.lag == 5].significant_at_5.iloc[0] == 0
    assert (got.r_ppm.abs() < 100_000).all()


# ---------------------------------------------------------------------
# Round-10 batch W (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_ops_snips_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    a_log = (cents // 7) % 4
    a_tgt = (cents // 13) % 4
    r = ((a_log == a_tgt) & ((cents // 17) % 10 < 8)).astype(np.int64)
    match = (a_log == a_tgt).astype(np.int64)
    n = len(cents)
    sw = 4 * int(match.sum())
    swr = 4 * int((match * r).sum())
    sw2 = 16 * int(match.sum())
    got = REGISTRY["agg_ops_snips"].fn(spark, SF_001).toPandas().iloc[0]
    assert got.n == n
    assert got.n_matched == int(match.sum())
    assert got.logged_value_ppm == 10**6 * int(r.sum()) // n
    assert got.ips_ppm == 10**6 * swr // n
    assert got.snips_ppm == 10**6 * swr // sw
    assert got.weight_ess_ppm == 10**6 * sw * sw // (n * sw2)
    # the planted structure: target policy ~800k ppm on both
    # estimators, logged policy ~200k - the launch gap
    assert abs(got.snips_ppm - 800_000) < 30_000
    assert abs(got.ips_ppm - 800_000) < 60_000
    assert got.logged_value_ppm < 250_000
    # ESS of {0,4} weights at a 1-in-4 match rate is the match rate
    assert abs(got.weight_ess_ppm - 250_000) < 30_000


def test_graph_random_failure_vs_attack(spark):
    """Pure-python recomputation + the Albert-Barabasi contrast against
    graph_attack_tolerance on the same graph and sweep."""
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    lp = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in lp.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp.l_partkey))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    nodes = {n_ for e_ in edges for n_ in e_}
    u = {
        n_: int(hashlib.md5(f"{n_}:rf".encode()).hexdigest()[:15], 16)
        % 10**6
        for n_ in nodes
    }
    got = (
        REGISTRY["graph_random_failure"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("k_ppm")
        .reset_index(drop=True)
    )
    attack = (
        REGISTRY["graph_attack_tolerance"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("k_ppm")
        .reset_index(drop=True)
    )
    assert list(got.k_ppm) == [10000, 50000, 100000]
    for _, row in got.iterrows():
        k = int(row.k_ppm)
        removed = sum(1 for n_ in nodes if u[n_] < k)
        left = sum(1 for a, b in edges if u[a] >= k and u[b] >= k)
        assert (row.n_nodes, row.n_edges) == (len(nodes), len(edges))
        assert row.n_removed == removed
        assert row.edges_left == left
        assert row.edge_survival_ppm == 10**6 * left // len(edges)
    # the Albert-Barabasi contrast: random failure keeps more of the
    # graph than a same-k hub attack at every sweep point, and the gap
    # WIDENS with k (measured 14k/30k/63k ppm at 1/5/10% — this
    # co-purchase graph's skew is modest, order size caps the degree)
    gaps = []
    for k in (10000, 50000, 100000):
        rnd = got[got.k_ppm == k].edge_survival_ppm.iloc[0]
        atk = attack[attack.k_ppm == k].edge_survival_ppm.iloc[0]
        assert rnd > atk
        gaps.append(rnd - atk)
    assert gaps[0] < gaps[1] < gaps[2]
    assert gaps[2] > 50_000
    # and random survival tracks the (1-k)^2 expectation loosely
    r10 = got[got.k_ppm == 10000].edge_survival_ppm.iloc[0]
    assert abs(r10 - 980_100) < 15_000


# ---------------------------------------------------------------------
# Round-10 batch X (staged for the R11 driver window)
# ---------------------------------------------------------------------


def test_agg_mde_floor_matches_pure_python(spark):
    cents, _o = _cents_series(spark)
    n = len(cents)
    p = 10**6 * int((cents % 2 == 0).sum()) // n
    got = (
        REGISTRY["agg_mde_floor"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("n_multiple")
        .reset_index(drop=True)
    )
    assert list(got.n_multiple) == [1, 4, 16]
    for _, row in got.iterrows():
        na = n * int(row.n_multiple)
        se = _isqrt_exact(2 * p * (10**6 - p) // na)
        assert (row.n_assumed, row.p_ppm) == (na, p)
        assert row.se_ppm == se
        assert row.mde_alpha_ppm == 1960 * se // 1000
        assert row.mde_power80_ppm == 2800 * se // 1000
    # MDE halves per 4x data (the planning identity, up to isqrt floor)
    m = list(got.mde_power80_ppm)
    assert abs(m[0] - 2 * m[1]) <= 6 and abs(m[1] - 2 * m[2]) <= 6
    # at 15k rows the 80%-power floor sits near 2.3 points
    assert 15_000 < m[0] < 35_000


def test_agg_capture_recapture_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    hashes = set()
    for doc_id, text in zip(docs.doc_id, docs.text):
        content = (
            f"boilerplate page {doc_id % 5}"
            if doc_id % 7 == 0
            else text.strip().lower()
        )
        hashes.add(hashlib.md5(content.encode()).hexdigest())
    n_a = n_b = overlap = 0
    for h in hashes:
        a = int(hashlib.md5(f"{h}:A".encode()).hexdigest()[:15], 16) % 4 == 0
        b = int(hashlib.md5(f"{h}:B".encode()).hexdigest()[:15], 16) % 4 == 0
        n_a += a
        n_b += b
        overlap += a and b
    true_n = len(hashes)
    got = (
        REGISTRY["agg_capture_recapture"].fn(spark, SF_001)
        .toPandas().iloc[0]
    )
    assert (got.true_n, got.n_a, got.n_b, got.overlap) == (
        true_n, n_a, n_b, overlap,
    )
    lincoln = -1 if overlap == 0 else n_a * n_b // overlap
    chapman = (n_a + 1) * (n_b + 1) // (overlap + 1) - 1
    assert got.est_lincoln == lincoln
    assert got.est_chapman == chapman
    assert got.chapman_abs_err_ppm == 10**6 * abs(chapman - true_n) // true_n
    # the estimator works: Chapman lands within 35% of the known truth
    # at ~28 expected overlap (error ~ 1/sqrt(m), the documented knob)
    assert got.chapman_abs_err_ppm < 350_000
    assert got.overlap > 5
