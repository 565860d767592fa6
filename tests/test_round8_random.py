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
