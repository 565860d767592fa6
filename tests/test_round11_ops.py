"""Independent reference checks for the round-11 additions.

Pure-python / numpy references — no SQL text shared with the oracle
twins (the check_oracle sweep proves cross-engine equality; these prove
the SEMANTICS against a third implementation), same discipline as
tests/test_round10_ops.py.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def _orders(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()


def _cents(price) -> int:
    # the same DECIMAL(18,4) hop both engines use
    return int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)


def _isqrt(n: int) -> int:
    import math

    return math.isqrt(n)


# ---------------------------------------------------------------- batch Y


def _bt_solve(cells, wins, models=8, iters=8, K=10**12):
    p = {m: 10**6 for m in range(models)}
    for _ in range(iters):
        d = {m: 0 for m in range(models)}
        for (i, j), n in cells.items():
            d[i] += n * K // (p[i] + p[j])
            d[j] += n * K // (p[i] + p[j])
        raw = {m: wins.get(m, 0) * K // d[m] for m in range(models)}
        tot = sum(raw.values())
        p = {m: max(1, raw[m] * models * 10**6 // tot) for m in range(models)}
    return p


def test_agg_arena_pipeline_matches_pure_python(spark):
    """Battles -> per-snapshot BT solve -> churn/RBO/tau recomputed with
    plain Python ints; also wires the family: the snapshot-0 BT ranking
    must be consistent with the planted index ladder's head."""
    o = _orders(spark)
    models, iters, K = 8, 8, 10**12
    cells = {0: {}, 1: {}}
    wins = {0: {}, 1: {}}
    for ok_, ck, price in zip(o.o_orderkey, o.o_custkey, o.o_totalprice):
        snap = int(ok_) % 2
        a = int(ck) % models
        b = (a + 1 + (int(ck) // models) % (models - 1)) % models
        w = b if (_cents(price) // 7) % 16 < 8 + b - a else a
        wins[snap][w] = wins[snap].get(w, 0) + 1
        i, j = min(a, b), max(a, b)
        cells[snap][(i, j)] = cells[snap].get((i, j), 0) + 1
    ranks = {}
    for snap in (0, 1):
        p = _bt_solve(cells[snap], wins[snap], models, iters, K)
        order = sorted(range(models), key=lambda m: (-p[m], m))
        ranks[snap] = {m: r + 1 for r, m in enumerate(order)}
    weights = [1000000, 900000, 810000, 729000, 656100, 590490, 531441, 478296]
    per = []
    for d in range(1, 9):
        ov = sum(
            1 for m in range(models) if ranks[0][m] <= d and ranks[1][m] <= d
        )
        per.append((d, ov, weights[d - 1]))
    rbo = sum((w * ov) // d for d, ov, w in per) // 10
    conc = disc = 0
    for m1 in range(models):
        for m2 in range(m1 + 1, models):
            s = (ranks[0][m1] - ranks[0][m2]) * (ranks[1][m1] - ranks[1][m2])
            conc += s > 0
            disc += s < 0
    tau = (1000 * (conc - disc)) // (conc + disc)
    got = (
        REGISTRY["agg_arena_pipeline"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("depth")
        .reset_index(drop=True)
    )
    assert list(got.depth) == [d for d, _, _ in per]
    assert list(got.overlap) == [ov for _, ov, _ in per]
    assert list(got.weight_ppm) == [w for _, _, w in per]
    assert list(got.agreement_ppm) == [
        (1000000 * ov) // d for d, ov, _ in per
    ]
    assert set(got.rbo_ppm) == {rbo}
    assert set(got.tau_milli) == {tau}
    # planted index ladder: the two snapshots agree on the board's head
    # (model 7 is the strongest in both) and the composed report reads
    # high-stability: tau and RBO both well above the noise floor.
    assert got.overlap.iloc[0] == 1  # top-1 identical across snapshots
    assert tau >= 500 and rbo >= 500_000


def test_agg_mantel_haenszel_matches_pure_python(spark):
    o = _orders(spark)
    cells = {}
    for ok_, ck, price in zip(o.o_orderkey, o.o_custkey, o.o_totalprice):
        s = int(ck) % 5
        t = 1 if (int(ok_) // 7) % 10 < 2 + s else 0
        y = 1 if (_cents(price) // 11) % 100 < 20 + 10 * s + 8 * t else 0
        c = cells.setdefault(s, [0, 0, 0, 0])
        c[(1 - t) * 2 + (1 - y)] += 1  # [a, b, c, d] = [t1y1, t1y0, t0y1, t0y0]
    num = sum(
        (c[0] * c[3] * 1000000) // sum(c) for c in cells.values()
    )
    den = sum(
        (c[1] * c[2] * 1000000) // sum(c) for c in cells.values()
    )
    ta = sum(c[0] for c in cells.values())
    tb = sum(c[1] for c in cells.values())
    tc = sum(c[2] for c in cells.values())
    td = sum(c[3] for c in cells.values())
    mh = (1000 * num) // den
    crude = (1000 * ta * td) // (tb * tc)
    got = (
        REGISTRY["agg_mantel_haenszel"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("stratum")
        .reset_index(drop=True)
    )
    for s in range(5):
        a, b, c, d = cells[s]
        row = got.iloc[s]
        assert (row.n11, row.n10, row.n01, row.n00) == (a, b, c, d)
        want_or = -1 if b * c == 0 else (1000 * a * d) // (b * c)
        assert row.or_milli == want_or
    assert set(got.mh_or_milli) == {mh}
    assert set(got.crude_or_milli) == {crude}
    assert set(got.confounding_gap_milli) == {crude - mh}
    # planted confounding: treated share rises with the stratum base
    # rate, so the crude OR overstates the pooled within-stratum OR
    assert crude > mh > 1000  # real positive effect, inflated crude read


def test_agg_spearman_rho_matches_pure_python(spark):
    o = _orders(spark)
    xs, ys = [], []
    for price in o.o_totalprice:
        c = _cents(price)
        x = (c // 7) % 50
        xs.append(x)
        ys.append(x * 2 + (c // 13) % 30)
    n = len(xs)

    def norm_ranks(vals):
        from collections import Counter

        cnt = Counter(vals)
        out, below = {}, 0
        for v in sorted(cnt):
            dr = 2 * below + cnt[v] + 1
            out[v] = (1000000 * dr) // (2 * n)
            below += cnt[v]
        return out

    rx = norm_ranks(xs)
    ry = norm_ranks(ys)
    sx = sum(rx[v] for v in xs)
    sy = sum(ry[v] for v in ys)
    sxx = sum(rx[v] ** 2 for v in xs)
    syy = sum(ry[v] ** 2 for v in ys)
    sxy = sum(rx[a] * ry[b] for a, b in zip(xs, ys))
    num = n * sxy - sx * sy
    s1 = _isqrt(n * sxx - sx * sx)
    s2 = _isqrt(n * syy - sy * sy)
    rho = (1000 * num) // (s1 * s2)
    got = REGISTRY["agg_spearman_rho"].fn(spark, SF_001).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row.n_rows == n
    assert row.n_distinct_x == len(rx)
    assert row.n_distinct_y == len(ry)
    assert row.rho_milli == rho
    # planted y = 2x + bounded noise: strongly positive rank correlation
    assert rho >= 800

# ---------------------------------------------------------------- batch Z


def test_agg_roofline_plan_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    tokens = int(docs.n_chars.sum()) // 4
    BW, FL = 3_350_000_000_000, 990_000_000_000_000
    want = {}
    for p in (1, 8, 70):
        for b in (2, 1):
            for bt in (1, 16, 256):
                comp = FL // (2 * p * 10**9)
                mem = (BW * bt) // (p * 10**9 * b)
                bound = min(comp, mem)
                want[(p, b, bt)] = (
                    comp, mem, bound,
                    "memory" if mem < comp else "compute",
                    tokens // bound if bound else -1,
                )
    got = REGISTRY["agg_roofline_plan"].fn(spark, SF_001).toPandas()
    assert len(got) == 18
    for _, r in got.iterrows():
        comp, mem, bound, regime, sec = want[
            (r.params_b, r.bytes_per_param, r.batch)
        ]
        assert (r.compute_tps, r.mem_tps, r.bound_tps) == (comp, mem, bound)
        assert r.regime == regime and r.corpus_scan_sec == sec
    # the roofline punchline: batch-1 decode is ALWAYS memory-bound;
    # batching flips small models to compute-bound (1B int8 at 256)
    # while 70B fp16 stays memory-bound even at batch 256 — the flip
    # point depends on size x precision, which is what the grid shows
    assert set(got[got.batch == 1].regime) == {"memory"}
    b256 = got[got.batch == 256]
    assert (
        b256[(b256.params_b == 1) & (b256.bytes_per_param == 1)].regime.iloc[0]
        == "compute"
    )
    assert (
        b256[(b256.params_b == 70) & (b256.bytes_per_param == 2)].regime.iloc[0]
        == "memory"
    )


def test_agg_grad_noise_scale_matches_pure_python(spark):
    o = _orders(spark)
    S = [0] * 8
    Q = [0] * 8
    n = len(o)
    for price in o.o_totalprice:
        c = _cents(price)
        for j in range(8):
            g = 5 + 3 * j + (c // (7 + j)) % 201 - 100
            S[j] += g
            Q[j] += g * g
    sq = sum(Q)
    sss = sum(s * s for s in S)
    got = REGISTRY["agg_grad_noise_scale"].fn(spark, SF_001).toPandas()
    row = got.iloc[0]
    assert row.n_examples == n and row.n_dims == 8
    assert row.gnorm2_milli == (1000 * sss) // (n * n)
    assert row.trace_milli == (1000 * (n * sq - sss)) // (n * (n - 1))
    assert row.bcrit_milli == (1000 * n * (n * sq - sss)) // ((n - 1) * sss)
    # planted signal: mu_j = 5+3j plus a small modular drift ->
    # |G|^2 ~ 2300; noise var ~ 201^2/12 per dim -> trace ~ 8 * 3360;
    # B_crit ~ trace/|G|^2 lands in the 8-15x band (measured 11.57)
    assert 2_000_000 <= row.gnorm2_milli <= 3_600_000
    assert 7_000 <= row.bcrit_milli <= 16_000


def test_pack_kv_paging_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    lens = [max(int(c) // 4, 1) for c in docs.n_chars]
    got = (
        REGISTRY["pack_kv_paging"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("block_size")
        .reset_index(drop=True)
    )
    frag = {}
    for bs, row in zip((16, 64, 256), got.itertuples()):
        blocks = sum((x + bs - 1) // bs for x in lens)
        alloc = sum(((x + bs - 1) // bs) * bs for x in lens)
        tot = sum(lens)
        assert row.block_size == bs
        assert row.n_seqs == len(lens)
        assert row.total_tokens == tot
        assert row.total_blocks == blocks
        assert row.alloc_tokens == alloc
        assert row.frag_ppm == (1_000_000 * (alloc - tot)) // alloc
        avg = alloc // len(lens)
        assert row.avg_alloc_per_seq == avg
        assert row.cap_seqs == (25_769_803_776 // 131_072) // avg
        frag[bs] = row.frag_ppm
    # fragmentation strictly grows with block size on a real length mix
    assert frag[16] < frag[64] < frag[256]

# --------------------------------------------------------------- batch AA


def _events(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_001}/events.parquet").toPandas()


def test_agg_apdex_score_matches_pure_python(spark):
    e = _events(spark)
    cents = [_cents(v) for v in e.value]
    got = REGISTRY["agg_apdex_score"].fn(spark, SF_001).toPandas()
    assert len(got) == 15  # 5 endpoints x 3 thresholds
    for _, r in got.iterrows():
        sub = [
            c for c, t in zip(cents, e.event_type) if t == r.event_type
        ]
        sat = sum(c <= r.t_cents for c in sub)
        tol = sum(r.t_cents < c <= 4 * r.t_cents for c in sub)
        assert r.n == len(sub) and r.sat == sat and r.tol == tol
        assert r.frus == len(sub) - sat - tol
        assert r.apdex_milli == (1000 * (2 * sat + tol)) // (2 * len(sub))
    # monotone in T: a looser threshold can only raise the score
    for et in got.event_type.unique():
        sub = got[got.event_type == et].sort_values("t_cents")
        assert list(sub.apdex_milli) == sorted(sub.apdex_milli)


def test_agg_hedging_plan_matches_pure_python(spark):
    e = _events(spark)
    buckets = [_cents(v) // 100 for v in e.value]
    n = len(buckets)
    maxb = max(buckets)
    from collections import Counter

    cnt = Counter(buckets)
    s_ppm, cum = {}, 0
    for x in range(maxb + 1):
        cum += cnt.get(x, 0)
        s_ppm[x] = (1_000_000 * (n - cum)) // n
    p99_before = min(x for x in range(maxb + 1) if s_ppm[x] <= 10_000)
    got = (
        REGISTRY["agg_hedging_plan"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("hedge_at")
        .reset_index(drop=True)
    )
    assert list(got.hedge_at) == [50, 120, 220]
    for _, r in got.iterrows():
        th = r.hedge_at
        tail = {
            x: (s_ppm[x] * (s_ppm.get(x - th, 1_000_000) if x - th >= 0
                            else 1_000_000)) // 1_000_000
            for x in range(maxb + 1)
        }
        p99_after = min(x for x in range(maxb + 1) if tail[x] <= 10_000)
        assert r.hedge_rate_ppm == s_ppm[th]
        assert r.p99_before == p99_before
        assert r.p99_after == p99_after
        assert r.p99_saved == p99_before - p99_after
    # the tail-at-scale punchline: every hedge point improves p99, and
    # the load price (hedge rate) falls sharply with a later hedge point
    assert (got.p99_saved > 0).all()
    rates = dict(zip(got.hedge_at, got.hedge_rate_ppm))
    assert rates[50] > 3 * rates[120] > 9 * rates[220]


def test_agg_quota_fair_share_matches_pure_python(spark):
    e = _events(spark)
    from collections import Counter

    dem = Counter(int(u) % 20 for u in e.user_id)
    n = len(dem)
    total = sum(dem.values())
    budget = total // 2
    order = sorted(dem.items(), key=lambda kv: (kv[1], kv[0]))
    pfx, k, pk = 0, 0, 0
    for r, (ten, d) in enumerate(order, 1):
        pfx += d
        if pfx + d * (n - r) <= budget:
            k, pk = r, pfx
    level = -1 if k == n else (budget - pk) // (n - k)
    got = (
        REGISTRY["agg_quota_fair_share"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("fill_rank")
        .reset_index(drop=True)
    )
    assert len(got) == n
    for r, (ten, d) in enumerate(order, 1):
        row = got.iloc[r - 1]
        assert row.tenant == ten and row.demand == d
        assert row.alloc == (d if r <= k else level)
        assert row.capped == (0 if r <= k else 1)
    assert set(got.water_level) == {level}
    assert set(got.budget) == {budget}
    # allocation feasible and nearly exhausts the budget (trunc < n-k)
    assert got.alloc.sum() <= budget < got.alloc.sum() + (n - k)
    # someone is capped (budget is half of demand) and nobody capped
    # gets more than the water level
    assert got.capped.sum() >= 1
    assert (got[got.capped == 0].demand <= level).all()

# --------------------------------------------------------------- batch AB


def test_agg_noninferiority_matches_pure_python(spark):
    o = _orders(spark)
    nc = kc = np_ = kp = 0
    for ok_, price in zip(o.o_orderkey, o.o_totalprice):
        y = 1 if (_cents(price) // 7) % 1000 < 520 else 0
        if int(ok_) % 2 == 1:
            nc += 1
            kc += y
        else:
            np_ += 1
            kp += y
    pc = (1_000_000 * kc) // nc
    pp = (1_000_000 * kp) // np_
    diff = pc - pp
    se = _isqrt(
        (pc * (1_000_000 - pc)) // nc + (pp * (1_000_000 - pp)) // np_
    )
    lo = diff - (1645 * se) // 1000
    got = (
        REGISTRY["agg_noninferiority"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("margin_ppm")
        .reset_index(drop=True)
    )
    assert list(got.margin_ppm) == [10000, 20000, 50000]
    for _, r in got.iterrows():
        assert (r.n_candidate, r.n_prod) == (nc, np_)
        assert (r.p_candidate_ppm, r.p_prod_ppm) == (pc, pp)
        assert r.diff_ppm == diff and r.se_ppm == se and r.lo_ppm == lo
        assert r.noninferior == (1 if lo > -r.margin_ppm else 0)
    # planted truly-equivalent arms at this n: wide margin passes,
    # the tight 1% margin is underpowered and must NOT pass
    assert got[got.margin_ppm == 50000].noninferior.iloc[0] == 1
    assert got[got.margin_ppm == 10000].noninferior.iloc[0] == 0


def test_agg_judge_ensemble_matches_pure_python(spark):
    o = _orders(spark)
    n = c0 = c1 = c2 = cm = 0
    for price in o.o_totalprice:
        c = _cents(price)
        gold = (c // 7) % 2
        v0 = 1 - gold if (c // 11) % 100 < 30 else gold
        v1 = 1 - gold if (c // 13) % 100 < 35 else gold
        v2 = 1 - gold if (c // 15) % 100 < 40 else gold
        n += 1
        c0 += v0 == gold
        c1 += v1 == gold
        c2 += v2 == gold
        cm += (1 if v0 + v1 + v2 >= 2 else 0) == gold
    lift = (1_000_000 * cm) // n - max(
        (1_000_000 * c0) // n, (1_000_000 * c1) // n, (1_000_000 * c2) // n
    )
    got = (
        REGISTRY["agg_judge_ensemble"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("judge_id")
        .reset_index(drop=True)
    )
    assert list(got.judge_id) == [-1, 0, 1, 2]
    assert list(got.correct) == [cm, c0, c1, c2]
    assert list(got.acc_ppm) == [
        (1_000_000 * k) // n for k in (cm, c0, c1, c2)
    ]
    assert set(got.ensemble_lift_ppm) == {lift}
    # Condorcet jury: independent 70/65/60 judges majority-vote above
    # the best individual
    assert lift > 0


def test_agg_interleaving_pref_matches_pure_python(spark):
    o = _orders(spark)
    ca = cb = none = 0
    for price in o.o_totalprice:
        c = _cents(price)
        first = (c // 3) % 2
        if (c // 17) % 10 < 5 + (1 - first):
            t = first
        elif (c // 20) % 10 < 4 + first:
            t = 1 - first
        elif (c // 23) % 10 < 3 + (1 - first):
            t = first
        elif (c // 26) % 10 < 2 + first:
            t = 1 - first
        else:
            t = -1
        ca += t == 0
        cb += t == 1
        none += t == -1
    n = ca + cb
    rad = 4 * n * ca * cb * 3841 * 1000 + 3841 * 3841
    term = _isqrt(rad)
    lo = max(
        0,
        (1_000_000 * (2000 * n * ca + n * 3841 - term))
        // (2 * n * (n * 1000 + 3841)),
    )
    got = REGISTRY["agg_interleaving_pref"].fn(spark, SF_001).toPandas()
    r = got.iloc[0]
    assert (r.clicks_a, r.clicks_b, r.no_click) == (ca, cb, none)
    assert r.n_impressions == ca + cb + none
    assert r.pref_a_ppm == (1_000_000 * ca) // n
    assert r.wilson_lo_ppm == lo
    assert r.a_better == (1 if lo > 500_000 else 0)
    # planted +1 relevance for ranker A: preference is significant
    assert r.a_better == 1 and r.pref_a_ppm > 520_000

# --------------------------------------------------------------- batch AC


def test_agg_successive_halving_matches_pure_python(spark):
    o = _orders(spark)
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])  # (rnd, arm) -> [n, k]
    for ok_, ck, price in zip(o.o_orderkey, o.o_custkey, o.o_totalprice):
        arm = int(ck) % 16
        rnd = (int(ok_) // 16) % 4
        y = 1 if (_cents(price) // 7) % 100 < 40 + 2 * arm else 0
        cells[(rnd, arm)][0] += 1
        cells[(rnd, arm)][1] += y
    acc = {
        k: (1_000_000 * v[1]) // v[0] for k, v in cells.items()
    }
    surv = list(range(16))
    survivors = []
    for rnd, keep in [(0, 8), (1, 4), (2, 2), (3, 1)]:
        surv = sorted(surv, key=lambda a: (-acc[(rnd, a)], a))[:keep]
        survivors.append(set(surv))
    s1, s2, s3, s4 = survivors
    got = (
        REGISTRY["agg_successive_halving"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("arm")
        .reset_index(drop=True)
    )
    spent = full = 0
    for arm in range(16):
        row = got.iloc[arm]
        want_elim = (
            0 if arm in s4 else 4 if arm in s3 else 3 if arm in s2
            else 2 if arm in s1 else 1
        )
        assert row.eliminated_round == want_elim
        used = cells[(0, arm)][0]
        if arm in s1:
            used += cells[(1, arm)][0]
        if arm in s2:
            used += cells[(2, arm)][0]
        if arm in s3:
            used += cells[(3, arm)][0]
        assert row.evals_used == used
        assert row.evals_full == sum(cells[(r, arm)][0] for r in range(4))
        spent += used
        full += row.evals_full
    assert set(got.budget_spent) == {spent}
    assert set(got.budget_full_grid) == {full}
    # planted 2-pt/arm ladder: the best arm wins and SHA spends < half
    # the full grid
    assert set(got.winner_arm) == {15}
    assert spent * 2 < full


def test_agg_strong_scaling_matches_pure_python(spark):
    o = _orders(spark)
    from collections import Counter

    got = (
        REGISTRY["agg_strong_scaling"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("workers")
        .reset_index(drop=True)
    )
    effs = {}
    for w in (8, 32, 128, 512):
        cnt = Counter(int(k) % w for k in o.o_orderkey)
        total, mx = sum(cnt.values()), max(cnt.values())
        row = got[got.workers == w].iloc[0]
        assert row.total == total and row.max_part == mx
        assert row.parts_used == len(cnt)
        assert row.ideal_per_worker == total // w
        assert row.straggler_ratio_milli == (1000 * mx * w) // total
        assert row.efficiency_ppm == (1_000_000 * total) // (w * mx)
        effs[w] = row.efficiency_ppm
    # the balls-in-bins law: efficiency decays monotonically in workers
    assert effs[8] > effs[32] > effs[128] > effs[512]


def test_agg_speculative_tasks_matches_pure_python(spark):
    o = _orders(spark)
    ds = sorted(_cents(p) // 100 for p in o.o_totalprice)
    n = len(ds)
    from collections import Counter

    cnt = Counter(ds)
    cum, med, p99 = 0, None, None
    for d in sorted(cnt):
        cum += cnt[d]
        if med is None and 2 * cum >= n:
            med = d
        if p99 is None and 100 * cum >= 99 * n:
            p99 = d
    maxd = ds[-1]
    before = sum(ds)
    got = (
        REGISTRY["agg_speculative_tasks"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("multiplier_milli")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        thresh = (r.multiplier_milli * med) // 1000
        relaunched = sum(1 for d in ds if d > thresh)
        after = sum(min(d, thresh + med) for d in ds)
        assert r.median_d == med and r.spec_threshold == thresh
        assert r.n_relaunched == relaunched
        assert r.relaunch_ppm == (1_000_000 * relaunched) // n
        assert r.wall_before == maxd
        assert r.wall_after == min(maxd, thresh + med)
        assert r.p99_before == p99
        assert r.p99_after == min(p99, thresh + med)
        assert r.mean_work_ratio_milli == (1000 * after) // before
    # heavy-ish tail: the 2x-median hedge cuts the wall hard while
    # relaunching a small fraction of tasks
    r2 = got[got.multiplier_milli == 2000].iloc[0]
    assert r2.wall_after * 2 < r2.wall_before * 3  # >= 1/3 cut is generous
    assert r2.relaunch_ppm < 300_000

# --------------------------------------------------------------- batch AD


def _docs(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()


def test_dedup_survivorship_matches_pure_python(spark):
    import hashlib

    docs = _docs(spark)
    groups = {}
    rows = []
    for doc_id, text, src, n_chars in zip(
        docs.doc_id, docs.text, docs.source, docs.n_chars
    ):
        if doc_id % 7 == 0 or (src == "src0" and doc_id % 3 == 0):
            content = f"boilerplate page {doc_id % 5}"
        else:
            content = text.strip().lower()
        h = hashlib.md5(content.encode()).hexdigest()
        rows.append((int(doc_id), src, int(n_chars), h))
        groups[h] = min(groups.get(h, 1 << 60), int(doc_id))
    per = {}
    for doc_id, src, n_chars, h in rows:
        p = per.setdefault(src, [0, 0, 0, 0])  # db, da, cb, ca
        kept = groups[h] == doc_id
        p[0] += 1
        p[1] += kept
        p[2] += n_chars
        p[3] += n_chars if kept else 0
    tb = sum(p[0] for p in per.values())
    ta = sum(p[1] for p in per.values())
    got = (
        REGISTRY["dedup_survivorship"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        db, da, cb, ca = per[r.source]
        assert (r.docs_before, r.docs_after) == (db, da)
        assert (r.chars_before, r.chars_after) == (cb, ca)
        assert r.keep_rate_ppm == (1_000_000 * da) // db
        assert r.share_before_ppm == (1_000_000 * db) // tb
        assert r.share_after_ppm == (1_000_000 * da) // ta
        assert r.share_delta_ppm == (
            (1_000_000 * da) // ta - (1_000_000 * db) // tb
        )
    # planted skew: src0 carries extra boilerplate, so it loses share
    src0 = got[got.source == "src0"].iloc[0]
    assert src0.share_delta_ppm < 0
    assert src0.keep_rate_ppm == got.keep_rate_ppm.min()


def test_qa_license_mix_matches_pure_python(spark):
    docs = _docs(spark)
    per = {}
    for doc_id, n_chars in zip(docs.doc_id, docs.n_chars):
        k = (int(doc_id) // 7) % 10
        s = 0 if k < 5 else 1 if k < 8 else 2 if k < 9 else 3
        p = per.setdefault(s, [0, 0])
        p[0] += 1
        p[1] += int(n_chars) // 4
    total = sum(p[1] for p in per.values())
    names = {0: "permissive", 1: "attribution", 2: "noncommercial", 3: "unknown"}
    got = (
        REGISTRY["qa_license_mix"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("strictness")
        .reset_index(drop=True)
    )
    for s in range(4):
        row = got.iloc[s]
        assert row.license_class == names[s]
        assert row.docs == per[s][0] and row.tokens == per[s][1]
        assert row.share_ppm == (1_000_000 * per[s][1]) // total
        usable = sum(per[t][1] for t in range(s + 1))
        assert row.usable_tokens_at_policy == usable
        assert row.usable_share_ppm == (1_000_000 * usable) // total
    # ~10% of tokens live in the unknown class: ungovernable until fixed
    unk = got[got.license_class == "unknown"].iloc[0]
    assert 50_000 <= unk.share_ppm <= 150_000


def test_agg_pareto_skyline_matches_pure_python(spark):
    parts = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    from collections import defaultdict

    cells = defaultdict(int)
    for price in parts.p_retailprice:
        cents = _cents(price)
        pd_ = cents // 100
        score = pd_ // 2 + (cents // 7) % 500
        cells[(pd_, score)] += 1
    sky = []
    items = sorted(cells.items())
    for (p1, s1), n1 in items:
        dominated = any(
            (p2 < p1 and s2 >= s1) or (p2 <= p1 and s2 > s1)
            for (p2, s2) in cells
        )
        if not dominated:
            sky.append((p1, s1, n1))
    got = (
        REGISTRY["agg_pareto_skyline"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values(["price_d", "size"])
        .reset_index(drop=True)
    )
    # row["size"], not row.size: the attribute is the Series length
    assert [
        (r["price_d"], r["size"], r["n_parts"]) for _, r in got.iterrows()
    ] == sky
    assert set(got.n_cells) == {len(cells)}
    assert set(got.n_skyline) == {len(sky)}
    # a real staircase: multiple frontier steps, price and score both
    # strictly increasing along the skyline
    assert len(sky) >= 5
    ps = [p for p, _, _ in sky]
    ss = [s for _, s, _ in sky]
    assert ps == sorted(ps) and ss == sorted(ss)
    assert len(set(ps)) == len(ps) and len(set(ss)) == len(ss)

# --------------------------------------------------------------- batch AE


def test_emb_hubness_audit_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF_001}/embeddings.parquet").toPandas()
    vecs = {
        int(v): np.floor(np.asarray(e, dtype=np.float64) * 10000).astype(
            np.int64
        )
        for v, e in zip(emb.vec_id, emb.embedding)
    }
    from collections import Counter, defaultdict

    bylabel = defaultdict(list)
    for v, l in zip(emb.vec_id, emb.label):
        bylabel[int(l)].append(int(v))
    indeg = Counter()
    for ids in bylabel.values():
        M = np.stack([vecs[v] for v in ids])
        G = M @ M.T
        for qi, q in enumerate(ids):
            dots = [
                (int(G[qi, ni]), n) for ni, n in enumerate(ids) if n != q
            ]
            top = sorted(dots, key=lambda t: (-t[0], t[1]))[:3]
            for _, n in top:
                indeg[n] += 1
    degs = [indeg.get(int(v), 0) for v in emb.vec_id]
    n = len(degs)
    m2 = sum((d - 3) ** 2 for d in degs)
    m3 = sum((d - 3) ** 3 for d in degs)
    den = m2 * _isqrt(m2)
    num = 1000 * m3 * _isqrt(n)
    # trunc-toward-zero on a possibly-negative numerator (python floors)
    q, r = divmod(num, den)
    skew = q if r == 0 or num >= 0 else q + 1
    hist = Counter(degs)
    got = (
        REGISTRY["emb_hubness_audit"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("indeg")
        .reset_index(drop=True)
    )
    assert dict(zip(got.indeg, got.n_vectors)) == dict(hist)
    assert set(got.n_total) == {n}
    assert set(got.max_indeg) == {max(degs)}
    assert set(got.skew_milli) == {skew}
    # hubness symptom: orphans exist and someone collects >2x the mean
    assert hist.get(0, 0) > 0 and max(degs) > 6 and skew > 0


def test_agg_offered_load_matches_pure_python(spark):
    e = _events(spark)
    got = (
        REGISTRY["agg_offered_load"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    import math

    for _, r in got.iterrows():
        sub = e[e.event_type == r.event_type]
        svc = [_cents(v) for v in sub.value]
        es = [int(math.floor(t.timestamp())) for t in sub.ts]
        n, ssum, span = len(svc), sum(svc), max(es) - min(es)
        assert r.n_events == n and r.span_sec == span
        assert r.rate_per_hour_milli == (3_600_000 * n) // span
        assert r.mean_service_cents == ssum // n
        assert r.offered_load_erlang == (n * ssum) // (n * span * 100)
        assert r.servers_needed == (
            (n * ssum + n * span * 100 - 1) // (n * span * 100) + 1
        )
    # sanity: sub-erlang toy traffic still demands >= 1 server
    assert (got.servers_needed >= 1).all()


def test_store_partition_advisor_matches_pure_python(spark):
    o = _orders(spark)
    import datetime as dt
    from collections import Counter

    dates = [
        d.date() if hasattr(d, "date") else d for d in pd.to_datetime(o.o_orderdate)
    ]
    specs = {}
    specs["day"] = Counter(dates)
    specs["week"] = Counter(d - dt.timedelta(days=d.weekday()) for d in dates)
    specs["month"] = Counter(d.replace(day=1) for d in dates)
    got = REGISTRY["store_partition_advisor"].fn(spark, SF_001).toPandas()
    for _, r in got.iterrows():
        cnt = specs[r.spec]
        total = sum(cnt.values())
        assert r.n_parts == len(cnt) and r.total_rows == total
        assert r.max_rows == max(cnt.values())
        assert r.min_rows == min(cnt.values())
        assert r.small_parts == sum(1 for v in cnt.values() if v < 1000)
        assert r.avg_rows == total // len(cnt)
        assert r.meets_target == (1 if total // len(cnt) >= 5000 else 0)
    # the advisor story at sf0.01: every spec is below the 5000-row
    # floor (the honest 'this volume does not want time partitions yet'
    # reading); avg rows per partition grows strictly with coarseness
    # and day partitions are pure small-file overhead
    g = {r.spec: r for _, r in got.iterrows()}
    assert g["day"].avg_rows < g["week"].avg_rows < g["month"].avg_rows
    assert g["day"].meets_target == 0
    assert g["day"].small_parts == g["day"].n_parts

# --------------------------------------------------------------- batch AF


def test_stream_srm_monitor_matches_pure_python(spark):
    e = _events(spark)
    import math
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])  # day -> [n, n_a]
    for t, u, et in zip(e.ts, e.user_id, e.event_type):
        arm = int(u) % 2
        if arm == 1 and et in ("error", "view"):
            continue  # the planted one-sided instrumentation drop
        h = int(math.floor(t.timestamp())) // 86400
        cells[h][0] += 1
        cells[h][1] += 1 - arm
    got = (
        REGISTRY["stream_srm_monitor"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("day_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(cells)
    alarms = 0
    for _, r in got.iterrows():
        n, na = cells[r.day_id]
        chi2 = (1000 * (2 * na - n) ** 2) // n
        assert (r.n, r.n_a) == (n, na)
        assert r.chi2_milli == chi2
        assert r.srm_alarm == (1 if chi2 > 3841 else 0)
        alarms += r.srm_alarm
    # the planted drop removes ~40% of arm-1 traffic: at daily power
    # essentially every day alarms
    assert alarms >= (9 * len(cells)) // 10


def test_agg_cliffs_delta_matches_pure_python(spark):
    o = _orders(spark)
    from collections import Counter

    ht, hc = Counter(), Counter()
    for ok_, price in zip(o.o_orderkey, o.o_totalprice):
        t = int(ok_) % 2
        s = (_cents(price) // 7) % 200 + 10 * t
        (ht if t == 1 else hc)[s] += 1
    gt = sum(
        ct * cc for st, ct in ht.items() for sc, cc in hc.items() if st > sc
    )
    lt = sum(
        ct * cc for st, ct in ht.items() for sc, cc in hc.items() if st < sc
    )
    ties = sum(ct * hc.get(st, 0) for st, ct in ht.items())
    nt, nc = sum(ht.values()), sum(hc.values())
    num = 1000 * (gt - lt)
    den = nt * nc
    q, r = divmod(num, den)
    delta = q if r == 0 or num >= 0 else q + 1  # trunc toward zero
    got = REGISTRY["agg_cliffs_delta"].fn(spark, SF_001).toPandas()
    row = got.iloc[0]
    assert (row.n_treat, row.n_control) == (nt, nc)
    assert (row.n_greater, row.n_less, row.n_ties) == (gt, lt, ties)
    assert row.delta_milli == delta
    band = (
        "negligible" if abs(delta) < 147 else "small" if abs(delta) < 330
        else "medium" if abs(delta) < 474 else "large"
    )
    assert row.magnitude == band
    # planted +10 on a 200-spread plane: delta ~ 2*10/200 = 0.1 ->
    # positive but NEGLIGIBLE by the Romano bands — the 'significant
    # but immaterial' reading this key exists to surface
    assert 0 < delta < 147 and band == "negligible"


def test_store_cache_tiering_matches_pure_python(spark):
    e = _events(spark)
    import math
    from collections import defaultdict

    acc = defaultdict(lambda: [0, -1])
    for t, u in zip(e.ts, e.user_id):
        d = int(math.floor(t.timestamp())) // 86400
        a = acc[int(u)]
        a[0] += 1
        a[1] = max(a[1], d)
    maxd = max(a[1] for a in acc.values())
    mean = sum(a[0] for a in acc.values()) // len(acc)
    per = defaultdict(lambda: [0, 0])
    for cnt, last in acc.values():
        rec = maxd - last
        if 10 * cnt >= 12 * mean and rec <= 1:
            tr = 0
        elif 10 * cnt >= 9 * mean and rec <= 7:
            tr = 1
        else:
            tr = 2
        per[tr][0] += 1
        per[tr][1] += cnt
    ta = sum(v[1] for v in per.values())
    got = (
        REGISTRY["store_cache_tiering"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("tier_rank")
        .reset_index(drop=True)
    )
    names = {0: "hot", 1: "warm", 2: "cold"}
    assert list(got.tier) == [names[r] for r in sorted(per)]
    cum = 0
    for i, tr in enumerate(sorted(per)):
        row = got.iloc[i]
        cum += per[tr][1]
        assert row.n_keys == per[tr][0]
        assert row.accesses == per[tr][1]
        assert row.access_share_ppm == (1_000_000 * per[tr][1]) // ta
        assert row.hit_rate_if_cached_ppm == (1_000_000 * cum) // ta
    # all three tiers materialize and the ladder ends at 100%
    assert len(got) == 3
    assert got.hit_rate_if_cached_ppm.iloc[-1] == 1_000_000
