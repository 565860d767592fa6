"""Golden tests for variant normalization — the engine's identity function.

Edge cases mirror the reference's test intent (FIXTURES.md §B must-cover
scenarios; varda tests/test_utils.py [P]): indel trimming order, empty
alleles, chr prefixes, M/MT.
"""

import pytest
from pyspark.sql import Row, functions as F

from varda_spark.functions.variant import (
    normalize_chromosome,
    normalize_variant_cols,
    normalize_variant_py,
)

CASES = [
    # (pos, ref, obs) -> (pos, ref, obs)
    ((10, "CAG", "CTG"), (11, "A", "T")),  # SNV inside shared affixes
    ((10, "A", "A"), (10, "", "")),  # no-op variant trims to nothing
    ((10, "AT", "T"), (10, "A", "")),  # deletion, shared suffix
    ((10, "T", "CAT"), (10, "", "CA")),  # pure insertion (suffix first!)
    ((10, "TC", "TCA"), (12, "", "A")),  # insertion via prefix advance
    ((10, "ACGT", "ACGT"), (10, "", "")),
    ((10, "G", "C"), (10, "G", "C")),  # nothing shared
    ((10, "", "A"), (10, "", "A")),  # already-canonical insertion
    ((10, "GGGCA", "GGCA"), (10, "G", "")),  # homopolymer deletion (suffix-first ⇒ left-anchored)
    ((1, "AAA", "AA"), (1, "A", "")),  # left-anchored after suffix trim
]


@pytest.mark.parametrize("inp,expected", CASES)
def test_normalize_py(inp, expected):
    assert normalize_variant_py(*inp) == expected


def test_normalize_spark_matches_py(spark):
    rows = [Row(id=i, position=p, reference=r, observed=o) for i, ((p, r, o), _) in enumerate(CASES)]
    df = normalize_variant_cols(spark.createDataFrame(rows)).orderBy("id")
    got = [(r.position, r.reference, r.observed) for r in df.collect()]
    assert got == [e for _, e in CASES]


def test_normalize_chromosome(spark):
    rows = [Row(raw=x) for x in ["chr1", "CHR2", "M", "chrM", "MT", "X", "chrX", "17"]]
    df = spark.createDataFrame(rows).select(normalize_chromosome("raw"))
    got = [r.chromosome for r in df.collect()]
    assert got == ["1", "2", "MT", "MT", "MT", "X", "X", "17"]


def test_normalize_random_corpus_matches_py(spark):
    """200 seeded random allele pairs: batch Columns ≡ plain-Python twin."""
    import random

    from pyspark.sql import Row

    rng = random.Random(7)
    cases = []
    for i in range(200):
        ref = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 6)))
        obs = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 6)))
        cases.append((i, rng.randint(1, 10**6), ref, obs))
    df = spark.createDataFrame([Row(id=i, position=p, reference=r, observed=o) for i, p, r, o in cases])
    got = {
        r.id: (r.position, r.reference, r.observed)
        for r in normalize_variant_cols(df).collect()
    }
    for i, p, ref, obs in cases:
        assert got[i] == normalize_variant_py(p, ref, obs), (p, ref, obs)
