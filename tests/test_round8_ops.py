"""Independent reference checks for the round-8 additions.

Pure numpy / pure-python references — no SQL text shared with the
oracle twins (the check_oracle sweep proves cross-engine equality;
these prove the SEMANTICS against a third implementation).
"""

from __future__ import annotations

import numpy as np

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark DIV / DuckDB // semantics);
    Python // floors, which differs on negative quotients."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _lev(a: str, b: str) -> int:
    """Classic unit-cost Wagner–Fischer DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_dedup_levenshtein_matches_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    docs["blk"] = docs.n_chars // 16
    docs["pfx"] = docs.text.str[:12]
    expect = {}
    for _, grp in docs.groupby(["blk", "lang", "pfx"]):
        rows = list(grp.itertuples())
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                lo, hi = min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id)
                d = _lev(a.text, b.text)
                if d <= 24:
                    expect[(lo, hi)] = (d, a.blk)
    got = run(spark, "dedup_levenshtein")
    assert {
        (int(r.doc_a), int(r.doc_b)): (int(r.dist), int(r.blk))
        for r in got.itertuples()
    } == expect
    assert len(expect) > 0  # the fixture must actually exercise the DP


def _encode(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor(X * 10000).astype(np.int64)
    bits = (X >= 0).astype(np.int64)
    W = np.array([1 << (31 - i) for i in range(32)], dtype=np.int64)
    w1 = bits[:, :32] @ W
    w2 = bits[:, 32:64] @ W
    ids = emb.vec_id.to_numpy()
    return ids, Q, w1, w2


def _hamming(w1, w2, i, j):
    return int(w1[i] ^ w1[j]).bit_count() + int(w2[i] ^ w2[j]).bit_count()


def test_sim_cascade_rerank_matches_numpy(spark):
    ids, Q, w1, w2 = _encode(spark)
    got = run(spark, "sim_cascade_rerank")
    for qi in range(5):
        ham = np.array(
            [_hamming(w1, w2, i, qi) for i in range(len(ids))], dtype=np.int64
        )
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], ham[mask]))[:20]
        pool = ids[mask][order]
        ham_rank = {int(v): r + 1 for r, v in enumerate(pool)}
        dots = {int(v): int(Q[list(ids).index(v)] @ Q[qi]) for v in pool}
        final = sorted(pool, key=lambda v: (-dots[int(v)], v))[:3]
        g = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(g.vec_id) == [int(v) for v in final]
        for r in g.itertuples():
            assert int(r.dot_q) == dots[int(r.vec_id)]
            assert int(r.ham_rank) == ham_rank[int(r.vec_id)]
            assert int(r.hamming) == int(
                ham[list(ids).index(r.vec_id)]
            )


def test_agg_mrr_eval_matches_numpy(spark):
    ids, Q, w1, w2 = _encode(spark)
    got = run(spark, "agg_mrr_eval").set_index("query_id")
    for qi in range(5):
        dots = Q @ Q[qi]
        ham = np.array(
            [_hamming(w1, w2, i, qi) for i in range(len(ids))], dtype=np.int64
        )
        mask = ids != ids[qi]
        nn_pos = np.lexsort((ids[mask], -dots[mask]))[0]
        nn = int(ids[mask][nn_pos])
        nn_ham = int(ham[mask][nn_pos])
        better = sum(
            1
            for i in np.nonzero(mask)[0]
            if (ham[i], ids[i]) < (nn_ham, nn)
        )
        rank = 1 + better
        row = got.loc[ids[qi]]
        assert int(row.true_nn) == nn
        assert int(row.bin_rank) == rank
        assert int(row.rr_ppm) == 10**6 // rank
        assert int(row.hit_at3) == int(rank <= 3)
        assert int(row.hit_at10) == int(rank <= 10)


def test_emb_dim_profile_matches_numpy(spark):
    ids, Q, _, _ = _encode(spark)
    got = run(spark, "emb_dim_profile").set_index("dim").sort_index()
    assert list(got.index) == list(range(1, 65))
    n = len(ids)
    for d in range(64):
        v = Q[:, d]
        s, qq = int(v.sum()), int((v.astype(object) ** 2).sum())
        row = got.loc[d + 1]
        assert int(row.n) == n
        assert int(row.mean_q) == tdiv(s, n)
        assert int(row.var_q) == (n * qq - s * s) // (n * n)  # numer >= 0
        assert int(row.min_q) == int(v.min())
        assert int(row.max_q) == int(v.max())
        assert int(row.zero_ppm) == (10**6 * int((v == 0).sum())) // n


def test_sample_neyman_alloc_matches_python(spark):
    import math

    cust = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    cents = (cust.c_acctbal * 10000).round().astype("int64") * 100 // 10000
    cust = cust.assign(cents=cents)
    rows = {}
    for seg, grp in cust.groupby("c_mktsegment"):
        n = len(grp)
        s, q = int(grp.cents.sum()), int((grp.cents.astype(object) ** 2).sum())
        var = (n * q - s * s) // (n * n)
        rows[seg] = (n, math.isqrt(var))
    tot = sum(n * sq for n, sq in rows.values())
    fl = {k: 1000 * n * sq // tot for k, (n, sq) in rows.items()}
    rem = {k: 1000 * n * sq % tot for k, (n, sq) in rows.items()}
    short = 1000 - sum(fl.values())
    order = sorted(rows, key=lambda k: (-rem[k], k))
    alloc = {k: fl[k] + (1 if order.index(k) < short else 0) for k in rows}
    got = run(spark, "sample_neyman_alloc").set_index("stratum")
    assert int(got.n_alloc.sum()) == 1000  # the budget, exactly
    for seg, (n, sq) in rows.items():
        row = got.loc[seg]
        assert int(row.n_h) == n
        assert int(row.s_q) == sq
        assert int(row.share_ppm) == 10**6 * n * sq // tot
        assert int(row.n_alloc) == alloc[seg]


def test_sample_pps_systematic_matches_python(spark):
    docs = (
        spark.read.parquet(f"{SF_001}/documents.parquet")
        .toPandas()
        .sort_values("doc_id")
    )
    sizes = docs.n_chars.astype(int).to_numpy()
    tot = int(sizes.sum())
    cum = 0
    expect = {}
    for did, sz in zip(docs.doc_id, sizes):
        prev, cum = cum, cum + int(sz)
        hits = (cum * 100) // tot - (prev * 100) // tot
        if hits > 0:
            expect[int(did)] = (int(sz), cum, hits, min(10**6, 10**6 * int(sz) * 100 // tot))
    assert sum(h for _, _, h, _ in expect.values()) == 100  # telescoping
    got = run(spark, "sample_pps_systematic")
    assert {
        int(r.doc_id): (int(r.sz), int(r.cum), int(r.n_hits), int(r.incl_ppm))
        for r in got.itertuples()
    } == expect


def test_win_theil_sen_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    li["ym"] = (
        li.l_shipdate.astype("datetime64[us]").dt.year * 12
        + li.l_shipdate.astype("datetime64[us]").dt.month
    )
    li["cents"] = (li.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    got = run(spark, "win_theil_sen").set_index("flag")
    for flag, grp in li.groupby("l_returnflag"):
        mth = grp.groupby("ym").cents.sum().sort_index()
        yms, revs = list(mth.index), list(mth.values)
        slopes = []
        for i in range(len(yms)):
            for j in range(i + 1, len(yms)):
                dy, dx = int(revs[j] - revs[i]) * 1000, int(yms[j] - yms[i])
                slopes.append((tdiv(dy, dx), yms[i], yms[j]))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        row = got.loc[flag]
        assert int(row.n_months) == len(yms)
        assert int(row.n_pairs) == len(slopes)
        assert int(row.median_slope_milli) == med


def test_agg_cpk_capability_matches_python(spark):
    import math

    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    qm = (li.l_quantity * 10000).round().astype("int64") * 1000 // 10000
    li = li.assign(qm=qm)
    got = run(spark, "agg_cpk_capability").set_index("flag")
    for flag, grp in li.groupby("l_returnflag"):
        n = len(grp)
        s, q = int(grp.qm.sum()), int((grp.qm.astype(object) ** 2).sum())
        mean = s // n
        sigma = math.isqrt((n * q - s * s) // (n * n))
        row = got.loc[flag]
        assert int(row.n) == n
        assert int(row.mean_milli) == mean
        assert int(row.sigma_milli) == sigma
        assert int(row.cp_milli) == (50000 - 1000) * 1000 // (6 * sigma)
        assert int(row.cpk_milli) == min(50000 - mean, mean - 1000) * 1000 // (
            3 * sigma
        )


def test_sim_knn_graph_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor(X * 10000).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    topk = {}
    for lab in np.unique(labels):
        idx = np.nonzero(labels == lab)[0]
        G = Q[idx] @ Q[idx].T
        for r, i in enumerate(idx):
            others = [j for j in range(len(idx)) if idx[j] != i]
            order = sorted(
                others, key=lambda j: (-int(G[r][j]), int(ids[idx[j]]))
            )[:3]
            topk[int(ids[i])] = {
                int(ids[idx[j]]): (rank + 1, int(G[r][j]))
                for rank, j in enumerate(order)
            }
    expect = {}
    for a, nbrs in topk.items():
        for b, (rab, dot) in nbrs.items():
            if a < b and a in topk.get(b, {}):
                expect[(a, b)] = (dot, rab, topk[b][a][0])
    got = run(spark, "sim_knn_graph")
    assert {
        (int(r.a), int(r.b)): (int(r.dot_q), int(r.rank_ab), int(r.rank_ba))
        for r in got.itertuples()
    } == expect
    assert len(expect) > 0


def test_agg_strata_effects_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF_001}/customer.parquet").toPandas()
    j = o.merge(
        c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey"
    )
    j["treat"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    j["cents"] = (j.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    nt = len(j)
    got = run(spark, "agg_strata_effects").set_index("stratum")
    pooled_sign_differs = False
    for seg, grp in j.groupby("c_mktsegment"):
        n, n1 = len(grp), int(grp.treat.sum())
        s1 = int(grp[grp.treat == 1].cents.sum())
        s0 = int(grp[grp.treat == 0].cents.sum())
        row = got.loc[seg]
        assert (int(row.n_s), int(row.n1), int(row.n0)) == (n, n1, n - n1)
        assert int(row.mean1_c) == s1 // n1
        assert int(row.mean0_c) == s0 // (n - n1)
        assert int(row.diff_c) == s1 // n1 - s0 // (n - n1)
        assert int(row.weight_ppm) == 10**6 * n // nt
    assert int(got.weight_ppm.sum()) <= 10**6  # truncating shares


def test_sim_ivf_balance_matches_numpy(spark):
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor(X * 1000).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    C = Q[:8]  # centroids = 8 lowest vec_ids, cell_id = vec_id
    cid = ids[:8]
    assign = cid[(Q @ C.T).argmax(axis=1)]  # first max = lowest cell_id
    import collections

    occ = collections.Counter(int(c) for c in assign)
    n, k, mx = sum(occ.values()), len(occ), max(occ.values())
    got = run(spark, "sim_ivf_balance").set_index("cell_id")
    assert set(got.index) == set(occ)
    for cell, cnt in occ.items():
        row = got.loc[cell]
        assert int(row.n_vec) == cnt
        assert int(row.share_ppm) == 10**6 * cnt // n
        assert int(row.load_milli) == 1000 * cnt * k // n
        assert int(row.skew_milli) == 1000 * mx * k // n
    # the audit's invariant: loads average to ~1000 (balanced = 1000 each)
    assert sum(int(r.n_vec) for _, r in got.iterrows()) == n


def test_win_hampel_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    li["d"] = li.l_shipdate.astype("datetime64[us]").dt.date
    li["cents"] = (li.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    day = li.groupby("d").cents.sum().sort_index()
    revs = [int(v) for v in day.values]
    days = list(day.index)
    got = run(spark, "win_hampel")
    got["day"] = got.day.astype("datetime64[us]").dt.date
    got = got.set_index("day").sort_index()
    assert len(got) == len(revs) - 14
    for i in range(7, len(revs) - 7):
        win = sorted(revs[i - 7 : i + 8])
        med = win[7]
        mad = sorted(abs(v - med) for v in revs[i - 7 : i + 8])[7]
        row = got.loc[days[i]]
        assert int(row.rev_c) == revs[i]
        assert int(row.med_c) == med
        assert int(row.mad_c) == mad
        assert int(row.is_spike) == int(abs(revs[i] - med) > 3 * mad)


def test_text_filter_attrition_matches_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    toks = docs.text.str.strip().str.split(" ").map(len)
    utoks = docs.text.str.strip().str.split(" ").map(lambda w: len(set(w)))
    p1 = docs.n_chars >= 120
    p2 = (toks >= 25) & (toks <= 85)
    p3 = (100 * utoks // toks) >= 35
    mlen = 100 * docs.n_chars // toks
    p4 = (mlen >= 520) & (mlen <= 575)
    n0 = len(docs)
    k1 = int((~p1).sum())
    k2 = int((p1 & ~p2).sum())
    k3 = int((p1 & p2 & ~p3).sum())
    k4 = int((p1 & p2 & p3 & ~p4).sum())
    rows = [
        (1, "min_chars", n0, k1),
        (2, "token_band", n0 - k1, k2),
        (3, "diversity", n0 - k1 - k2, k3),
        (4, "mean_tok_len", n0 - k1 - k2 - k3, k4),
    ]
    got = run(spark, "text_filter_attrition").set_index("stage").sort_index()
    for stage, rule, n_in, killed in rows:
        r = got.loc[stage]
        assert r.rule == rule
        assert (int(r.n_in), int(r.n_killed), int(r.n_out)) == (
            n_in, killed, n_in - killed,
        )
        assert int(r.kill_ppm) == 10**6 * killed // max(n_in, 1)
        assert int(r.cum_kept_ppm) == 10**6 * (n_in - killed) // n0
    # waterfall invariant: each stage's n_in equals the prior n_out
    outs = [int(got.loc[s].n_out) for s in (1, 2, 3)]
    ins = [int(got.loc[s].n_in) for s in (2, 3, 4)]
    assert outs == ins


def test_freq_gwas_assoc_matches_python(spark):
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    li["is_case"] = (li.l_suppkey % 2).astype(int)
    li["n_ref"] = li.l_orderkey.mod(3).map({0: 2, 1: 1, 2: 0})
    got = run(spark, "freq_gwas_assoc").set_index("site_id")
    checked = 0
    for site, grp in li.groupby("l_partkey"):
        a = int((2 - grp[grp.is_case == 1].n_ref).sum())  # alt case
        b = int(grp[grp.is_case == 1].n_ref.sum())        # ref case
        c = int((2 - grp[grp.is_case == 0].n_ref).sum())  # alt ctrl
        d = int(grp[grp.is_case == 0].n_ref.sum())        # ref ctrl
        if min(a, b, c, d) == 0:
            assert site not in got.index
            continue
        row = got.loc[site]
        n = a + b + c + d
        det = a * d - b * c
        chi2 = 1000 * n * det * det // ((a + b) * (c + d) * (a + c) * (b + d))
        assert (
            int(row.alt_case), int(row.ref_case),
            int(row.alt_ctrl), int(row.ref_ctrl),
        ) == (a, b, c, d)
        assert int(row.chi2_milli) == chi2
        assert int(row.or_milli) == 1000 * a * d // (b * c)
        checked += 1
    assert checked == len(got)


def test_sample_walk_forward_matches_python(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    d = o.o_orderdate.astype("datetime64[us]").dt.date
    lo, hi = d.min(), d.max()
    span = (hi - lo).days
    off = d.map(lambda x: (x - lo).days)
    got = run(spark, "sample_walk_forward").set_index("fold").sort_index()
    prev_train = -1
    for fold in range(1, 6):
        t0 = (4 + fold) * span // 10
        t1 = (5 + fold) * span // 10
        row = got.loc[fold]
        n_train = int((off < t0 - 7).sum())
        n_test = int(((off >= t0) & (off < t1)).sum())
        assert int(row.train_end_off) == t0 - 7
        assert (int(row.test_start_off), int(row.test_end_off)) == (t0, t1)
        assert (int(row.n_train), int(row.n_test)) == (n_train, n_test)
        assert n_train > prev_train  # expanding window
        prev_train = n_train
        assert n_test > 0


def test_agg_uplift_ci_matches_python(spark):
    import math

    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    treat = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    y = (o.o_orderstatus == "F").astype(int)
    n1, x1 = int(treat.sum()), int(y[treat].sum())
    n2, x2 = int((~treat).sum()), int(y[~treat].sum())
    v = (10**12 * x1 * (n1 - x1)) // (n1**3) + (10**12 * x2 * (n2 - x2)) // (
        n2**3
    )
    se = math.isqrt(v)
    p1, p2 = 10**6 * x1 // n1, 10**6 * x2 // n2
    row = run(spark, "agg_uplift_ci").iloc[0]
    assert (int(row.n1), int(row.x1), int(row.n2), int(row.x2)) == (
        n1, x1, n2, x2,
    )
    assert (int(row.p1_ppm), int(row.p2_ppm)) == (p1, p2)
    assert int(row.uplift_ppm) == p1 - p2
    assert int(row.se_ppm) == se
    assert int(row.ci_lo_ppm) == p1 - p2 - 196 * se // 100
    assert int(row.ci_hi_ppm) == p1 - p2 + 196 * se // 100
    assert int(row.significant) == int(abs(p1 - p2) * 100 > 196 * se)
    # sanity: the CI straddles the uplift and is symmetric around it
    assert int(row.ci_lo_ppm) <= int(row.uplift_ppm) <= int(row.ci_hi_ppm)
