"""UCSC hierarchical genome binning — the reference's one real optimization.

Public varda carries `varda/region_binning.py` (assign_bin /
overlapping_bins — public-knowledge citation, SURVEY.md §0/§4), an
implementation of the Kent/UCSC binning scheme: the genome is covered by a
5-level hierarchy of bins (128 kb leaves up to a single 512 Mb root); every
interval is stored with its smallest fully-enclosing bin; a point (or range)
query enumerates the ≤ 1 + 8 + 64 + 512 + 4096 candidate bins that could
contain an overlapping interval — in practice ~5 for a point.

Spark translation: OSS Catalyst has no range-join optimization, so a naive
point-in-interval join is a BroadcastNestedLoopJoin (O(n·m) — fatal at
100 TB). We port the TRICK, not the code: precompute ``bin`` on the interval
side (pure Column math, codegen'd), explode the ~5 candidate bins on the
point side, and equi-join on (chromosome, bin) with the range predicate as a
residual filter. That turns the theta join into a shuffled/broadcast hash
join that scales linearly and partitions cleanly.

Coordinates: 1-based, fully-closed intervals [begin, end] (varda/BED-as-
imported convention; FIXTURES.md §B). Max supported position 2^29 (512 Mb),
same as UCSC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (shift, offset) per level, smallest bins first: 128kb, 1Mb, 8Mb, 64Mb, 512Mb
_LEVELS = [(17, 585), (20, 73), (23, 9), (26, 1), (29, 0)]
MAX_POSITION = 1 << 29


def assign_bin(begin: Column | str, end: Column | str) -> Column:
    """Smallest bin fully containing the 1-based closed interval [begin,end].

    Pure Column expression (no UDF). Mirrors UCSC binFromRange on the
    0-based half-open [begin-1, end).
    """
    b = F.col(begin) if isinstance(begin, str) else begin
    e = F.col(end) if isinstance(end, str) else end
    # clamp to the 0-based origin: begin=0 (or a 0-based caller) would
    # otherwise shift a NEGATIVE start (arithmetic shiftright(-1) = -1),
    # land in a bogus bin, and SILENTLY drop every match (found by the
    # round-9 knn_intervals randomized test). Identity for all in-domain
    # (1-based, begin >= 1) inputs, so existing bins are unchanged.
    start0 = F.greatest(b - 1, F.lit(0))  # 0-based inclusive start
    stop0 = F.greatest(e - 1, F.lit(0))  # 0-based inclusive last base
    expr = F.lit(None).cast("int")
    # build from coarsest to finest so the finest matching level wins
    for shift, offset in reversed(_LEVELS):
        same = F.shiftright(start0, shift) == F.shiftright(stop0, shift)
        expr = F.when(same, F.lit(offset) + F.shiftright(start0, shift).cast("int")).otherwise(expr)
    return expr


def point_bins(pos: Column | str) -> Column:
    """Array of the 5 bins whose intervals could contain 1-based point pos."""
    p = F.col(pos) if isinstance(pos, str) else pos
    p0 = F.greatest(p - 1, F.lit(0))  # same origin clamp as assign_bin
    return F.array(
        *[(F.lit(offset) + F.shiftright(p0, shift).cast("int")) for shift, offset in _LEVELS]
    )


def range_bins(begin: Column | str, end: Column | str) -> Column:
    """Array of all bins overlapping closed interval [begin,end] (flattened)."""
    b = F.col(begin) if isinstance(begin, str) else begin
    e = F.col(end) if isinstance(end, str) else end
    # same origin clamp as assign_bin
    b0 = F.greatest(b - 1, F.lit(0))
    e0 = F.greatest(e - 1, F.lit(0))
    per_level = [
        F.sequence(
            F.lit(offset) + F.shiftright(b0, shift).cast("int"),
            F.lit(offset) + F.shiftright(e0, shift).cast("int"),
        )
        for shift, offset in _LEVELS
    ]
    return F.flatten(F.array(*per_level))


def with_bin(df: DataFrame, begin: str = "begin", end: str = "end", out: str = "bin") -> DataFrame:
    """Attach the enclosing-bin column to an interval DataFrame (write path)."""
    return df.withColumn(out, assign_bin(begin, end))
