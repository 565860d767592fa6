"""Property test: the binned interval join ≡ the naive theta join.

This is the correctness proof of the engine's core optimization (C1,
SURVEY.md §4) — including bin-boundary edges (128 kb multiples ±1) which
is exactly where a wrong shift/offset would show.
"""

import random

from pyspark.sql import Row

from varda_spark.operators.binning import MAX_POSITION, assign_bin, point_bins
from varda_spark.operators.interval import interval_join, interval_join_naive


def _random_case(seed: int, n_points: int = 120, n_ivals: int = 80):
    rng = random.Random(seed)
    edges = [1, 2, (1 << 17), (1 << 17) + 1, (1 << 17) - 1, (1 << 20), (1 << 23) + 5]
    pts = []
    for i in range(n_points):
        pos = rng.choice(edges) if rng.random() < 0.3 else rng.randint(1, 1 << 24)
        pts.append(Row(pid=i, chromosome=str(rng.randint(1, 3)), position=pos))
    ivs = []
    for i in range(n_ivals):
        if rng.random() < 0.3:
            b = rng.choice(edges)
        else:
            b = rng.randint(1, 1 << 24)
        e = b + rng.choice([0, 1, 10, 1000, 1 << 17, 1 << 20])
        ivs.append(Row(rid=i, chromosome=str(rng.randint(1, 3)), begin=b, end=e))
    return pts, ivs


def test_binned_equals_naive(spark):
    for seed in (1, 2, 3):
        pts, ivs = _random_case(seed)
        pdf = spark.createDataFrame(pts)
        idf = spark.createDataFrame(ivs)
        binned = {
            (r.pid, r.rid)
            for r in interval_join(pdf, idf, ival_chrom="chromosome").select("pid", "rid").collect()
        }
        naive = {
            (r.pid, r.rid)
            for r in interval_join_naive(pdf, idf).select("pid", "rid").collect()
        }
        assert binned == naive, f"seed={seed}: binned≠naive ({len(binned)} vs {len(naive)})"


def test_assign_bin_contains_point_bins(spark):
    """Every interval's assigned bin appears in point_bins of its members."""
    rows = [
        Row(begin=b, end=e)
        for b, e in [(1, 1), (1, 128 * 1024), (128 * 1024, 128 * 1024 + 1), (5_000_000, 5_000_100)]
    ]
    df = spark.createDataFrame(rows).select(
        "begin", "end", assign_bin("begin", "end").alias("bin"), point_bins("begin").alias("pb")
    )
    for r in df.collect():
        assert r.bin in r.pb, r
        assert 0 <= r.bin < 585 + (MAX_POSITION >> 17)


def test_merge_intervals_islands(spark):
    """bedtools-merge semantics: touching intervals merge (closed
    intervals), disjoint ones don't, per chromosome."""
    from varda_spark.operators.interval import merge_intervals

    ivs = spark.createDataFrame(
        [
            ("1", 10, 20), ("1", 15, 30), ("1", 30, 40),   # one run 10-40
            ("1", 42, 50),                                  # gap of 1 → new run
            ("2", 10, 20),
        ],
        ["chromosome", "begin", "end"],
    )
    got = {(r.chromosome, r.begin, r.end): r.n_merged for r in merge_intervals(ivs).collect()}
    assert got == {("1", 10, 40): 3, ("1", 42, 50): 1, ("2", 10, 20): 1}
