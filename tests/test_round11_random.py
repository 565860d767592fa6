"""Property-based tests for the round-11 kernel ALGEBRA.

The reference tests in test_round11_ops.py pin each key to the driver
testdata; these re-prove the underlying algorithms on RANDOM inputs
(hypothesis) against brute force, pure python only — catching anything
that held only by accident of the fixture distribution (tie patterns,
degenerate frontiers, empty tiers, budget edges). No SparkSession: the
properties target the integer algebra both twins share, so they run in
milliseconds per example.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------- skyline


def _skyline_windows(cells):
    """The agg_pareto_skyline reduction: per-price max score, two
    running maxes over the sorted price spine, then the two dominance
    tests per cell."""
    pm = {}
    for (p, s) in cells:
        pm[p] = max(pm.get(p, -1), s)
    prices = sorted(pm)
    max_cheaper, max_le, run = {}, {}, -1
    for p in prices:
        max_cheaper[p] = run
        run = max(run, pm[p])
        max_le[p] = run
    return {
        (p, s)
        for (p, s) in cells
        if not (max_cheaper[p] >= s or max_le[p] > s)
    }


def _skyline_brute(cells):
    return {
        (p1, s1)
        for (p1, s1) in cells
        if not any(
            (p2 < p1 and s2 >= s1) or (p2 <= p1 and s2 > s1)
            for (p2, s2) in cells
        )
    }


@settings(max_examples=200, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_skyline_windows_equals_brute_force(cells):
    assert _skyline_windows(cells) == _skyline_brute(cells)


# -------------------------------------------------------- water-filling


def _water_fill(demands, budget):
    """The agg_quota_fair_share closed form."""
    order = sorted(range(len(demands)), key=lambda i: (demands[i], i))
    n = len(order)
    pfx, k, pk = 0, 0, 0
    for r, i in enumerate(order, 1):
        pfx += demands[i]
        if pfx + demands[i] * (n - r) <= budget:
            k, pk = r, pfx
    level = -1 if k == n else (budget - pk) // (n - k)
    alloc = {}
    for r, i in enumerate(order, 1):
        alloc[i] = demands[i] if r <= k else level
    return alloc, level, k


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=20),
    st.integers(min_value=0, max_value=100),
)
def test_water_filling_invariants(demands, pct):
    total = sum(demands)
    budget = (total * pct) // 100
    alloc, level, k = _water_fill(demands, budget)
    n = len(demands)
    if k == n:
        # everyone fits: full allocation, within budget
        assert all(alloc[i] == demands[i] for i in range(n))
        assert total <= budget
        return
    # feasible: never exceeds the budget
    assert sum(alloc.values()) <= budget
    # near-exhaustion: truncation leaves < (n - k) units on the table,
    # unless some capped tenant's demand is BELOW the water level (then
    # max-min fairness itself, not truncation, leaves budget unused)
    capped = [i for i in range(n) if alloc[i] == level and demands[i] > level]
    if all(alloc[i] == demands[i] or demands[i] > level for i in range(n)):
        assert sum(min(demands[i], max(level, 0)) for i in range(n)) >= min(
            sum(alloc.values()), budget
        )
    # max-min: an uncapped tenant never gets more than the level + its
    # own demand bound; a capped tenant gets exactly the level
    for i in capped:
        assert alloc[i] == level
    # monotone in demand: sorting by demand, allocations are
    # non-decreasing up to the cap
    order = sorted(range(n), key=lambda i: (demands[i], i))
    allocs = [alloc[i] for i in order]
    capped_flags = [demands[i] > level and alloc[i] == level for i in order]
    for a, b in zip(allocs, allocs[1:]):
        assert a <= b or b == level
    # once capped, always capped (suffix property on the sorted spine)
    first_cap = next((j for j, f in enumerate(capped_flags) if f), len(order))
    assert all(
        capped_flags[j] or demands[order[j]] <= level
        for j in range(first_cap, len(order))
    )


# ----------------------------------------------------------- hedging


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=40),
)
def test_hedging_survival_product_equals_enumeration(hist, th):
    """P(min(L1, th + L2) > x) == S(x) * S(x - th) under independence —
    the agg_hedging_plan identity, checked against full enumeration of
    the joint (L1, L2) distribution."""
    n = sum(hist.values())
    maxb = max(hist)

    def S(x):  # strict survival in ppm
        above = sum(c for b, c in hist.items() if b > x)
        return (1_000_000 * above) // n

    for x in range(maxb + 1):
        formula = (S(x) * (S(x - th) if x - th >= 0 else 1_000_000)) // 1_000_000
        # enumeration: weight each (l1, l2) pair by cnt1*cnt2
        num = sum(
            c1 * c2
            for b1, c1 in hist.items()
            for b2, c2 in hist.items()
            if min(b1, th + b2) > x
        )
        exact_ppm = (1_000_000 * num) // (n * n)
        # the formula composes two already-truncated ppm factors, so it
        # may sit below the jointly-computed value by at most the two
        # truncation losses (< 2 ppm of mass each, scaled)
        assert formula <= exact_ppm + 1
        assert exact_ppm - formula <= 2_000  # <= ~0.2% composition loss


# ------------------------------------------------- rank-overlap algebra


@settings(max_examples=200, deadline=None)
@given(st.permutations(list(range(8))), st.permutations(list(range(8))))
def test_tau_and_rbo_on_permutations(p1, p2):
    """agg_arena_pipeline's churn algebra on arbitrary 8-rankings:
    tau from the pair-sign formula equals the classic concordance
    count; RBO weights are exactly floor(0.9^(d-1) * 1e6); overlap is
    monotone and ends at 8."""
    r1 = {m: i + 1 for i, m in enumerate(p1)}
    r2 = {m: i + 1 for i, m in enumerate(p2)}
    conc = disc = 0
    for a in range(8):
        for b in range(a + 1, 8):
            s = (r1[a] - r1[b]) * (r2[a] - r2[b])
            conc += s > 0
            disc += s < 0
    assert conc + disc == 28  # strict permutations: no zero products
    tau = (1000 * (conc - disc)) // 28
    assert -1000 <= tau <= 1000
    weights = [1000000]
    for _ in range(7):
        weights.append(weights[-1] * 9 // 10)
    assert weights == [1000000, 900000, 810000, 729000,
                       656100, 590490, 531441, 478296]
    overlaps = []
    for d in range(1, 9):
        ov = sum(1 for m in range(8) if r1[m] <= d and r2[m] <= d)
        overlaps.append(ov)
        assert max(0, 2 * d - 8) <= ov <= d
    assert overlaps[-1] == 8
    assert all(a <= b for a, b in zip(overlaps, overlaps[1:]))
    rbo = sum((w * ov) // d for (d, ov), w in
              zip(enumerate(overlaps, 1), weights)) // 10
    assert 0 <= rbo <= 1_000_000
    if list(p1) == list(p2):
        # identity ranking: truncated RBO_min at cutoff 8 is exactly
        # (sum of the 8 weights) // 10 = 5695327 // 10
        assert tau == 1000 and rbo == 569_532


# -------------------------------------------------- successive halving


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(*[st.integers(min_value=0, max_value=1_000_000)] * 4),
        min_size=16,
        max_size=16,
    )
)
def test_successive_halving_partition_structure(accs):
    """Elimination rounds partition the 16 arms 8/4/2/1/1 and the
    winner beats every surviving rival in the round that cut them."""
    surv = list(range(16))
    survivors = []
    for rnd, keep in [(0, 8), (1, 4), (2, 2), (3, 1)]:
        surv = sorted(surv, key=lambda a: (-accs[a][rnd], a))[:keep]
        survivors.append(set(surv))
    s1, s2, s3, s4 = survivors
    elim = {
        a: (0 if a in s4 else 4 if a in s3 else 3 if a in s2
            else 2 if a in s1 else 1)
        for a in range(16)
    }
    cnt = Counter(elim.values())
    assert cnt == {1: 8, 2: 4, 3: 2, 4: 1, 0: 1}
    (winner,) = s4
    # the winner weakly beats (with id tiebreak) every arm cut at each
    # round, in that round's scores
    for rnd, cut_set, pool in [(1, s1 - s2, s1), (2, s2 - s3, s2),
                               (3, s3 - s4, s3)]:
        for loser in cut_set:
            assert (-accs[winner][rnd], winner) <= (-accs[loser][rnd], loser)


# ------------------------------------------------------- Cliff's delta


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=40),
)
def test_cliffs_delta_histogram_equals_pairs(xs, ys):
    """The histogram-cell composition equals the raw pair count, and
    delta respects its [-1000, 1000] bounds with gt+lt+ties = nt*nc."""
    ht, hc = Counter(xs), Counter(ys)
    gt = sum(ct * cc for s1, ct in ht.items() for s2, cc in hc.items()
             if s1 > s2)
    lt = sum(ct * cc for s1, ct in ht.items() for s2, cc in hc.items()
             if s1 < s2)
    ties = sum(ct * hc.get(s1, 0) for s1, ct in ht.items())
    gt2 = sum(1 for a in xs for b in ys if a > b)
    lt2 = sum(1 for a in xs for b in ys if a < b)
    assert (gt, lt) == (gt2, lt2)
    assert gt + lt + ties == len(xs) * len(ys)
    num, den = 1000 * (gt - lt), len(xs) * len(ys)
    q, r = divmod(num, den)
    delta = q if r == 0 or num >= 0 else q + 1
    assert -1000 <= delta <= 1000


# ------------------------------------------------------ strong scaling


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=8,
             max_size=200),
    st.sampled_from([2, 4, 8, 16]),
)
def test_strong_scaling_efficiency_bounds(keys, w):
    cnt = Counter(k % w for k in keys)
    total, mx = sum(cnt.values()), max(cnt.values())
    eff = (1_000_000 * total) // (w * mx)
    # efficiency is at most 1 and at least 1/w (one partition holds all)
    assert (1_000_000 // w) - 1 <= eff <= 1_000_000
    # straggler ratio and efficiency are exact inverses up to truncation
    straggler = (1000 * mx * w) // total
    assert straggler >= 1000 or len(cnt) < w  # max >= mean when all used
