"""Frequency-core golden tests on handcrafted genomic micro-fixtures.

Implements FIXTURES.md §B's must-cover scenarios with hand-computed
VN/VC/VF (the reference's test pattern: tiny fixtures, exact expected
values — varda tests/test_api.py [P]).

Fixture design:
  samples: s1 (individual, covered via regions), s2 (pooled 10, covered),
           s3 (no coverage profile → counted everywhere), s4 (inactive),
           s5 (individual, NO covering region at locus B)
  regions: s1 covers 1:[100,200] twice (overlapping → count once),
           s2 covers 1:[150,300], s5 covers 1:[100,120] only
  observations:
    locus A = 1:160 A>G : s1 het support 1; s2 pooled support 3;
              s4 (inactive) support 1 → must NOT count
    locus B = 1:400 C>T : s5 support 1 (no covering region at 400!)
Expected (selection=*, actives only):
  VN(A) = pool(s1)+pool(s2) [covered] + pool(s3) [unconditional] = 1+10+1 = 12
  VC(A) = 1 + 3 = 4 ; VF = 4/12
  VN(B) = pool(s3) = 1 (s5 covers only [100,120])
  VC(B) = 1 ; VF = 1.0  — numerator-without-denominator-membership is
  KEPT (we count the observation even though its sample isn't in VN;
  documented engine decision, matching varda's independent num/denom
  queries [P]).
"""

import pytest
from pyspark.sql import Row, functions as F

from varda_spark.expressions import compile_selection
from varda_spark.frequency import frequency


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    samples = spark.createDataFrame(
        [
            Row(sample_id=1, name="s1", pool_size=1, coverage_profile=True, public=True, active=True),
            Row(sample_id=2, name="s2", pool_size=10, coverage_profile=True, public=False, active=True),
            Row(sample_id=3, name="s3", pool_size=1, coverage_profile=False, public=True, active=True),
            Row(sample_id=4, name="s4", pool_size=1, coverage_profile=True, public=True, active=False),
            Row(sample_id=5, name="s5", pool_size=1, coverage_profile=True, public=True, active=True),
        ]
    )
    regions = spark.createDataFrame(
        [
            Row(region_id=1, sample_id=1, chromosome="1", begin=100, end=200),
            Row(region_id=2, sample_id=1, chromosome="1", begin=150, end=250),  # overlap, same sample
            Row(region_id=3, sample_id=2, chromosome="1", begin=150, end=300),
            Row(region_id=4, sample_id=4, chromosome="1", begin=1, end=1000),  # inactive sample
            Row(region_id=5, sample_id=5, chromosome="1", begin=100, end=120),
        ]
    )
    observations = spark.createDataFrame(
        [
            Row(obs_id=1, sample_id=1, chromosome="1", position=160, reference="A", observed="G",
                zygosity="heterozygous", support=1),
            Row(obs_id=2, sample_id=2, chromosome="1", position=160, reference="A", observed="G",
                zygosity=None, support=3),
            Row(obs_id=3, sample_id=4, chromosome="1", position=160, reference="A", observed="G",
                zygosity="homozygous", support=1),  # inactive → ignored
            Row(obs_id=4, sample_id=5, chromosome="1", position=400, reference="C", observed="T",
                zygosity="heterozygous", support=1),
        ]
    )
    keys = spark.createDataFrame(
        [
            Row(chromosome="1", position=160, reference="A", observed="G"),
            Row(chromosome="1", position=400, reference="C", observed="T"),
            Row(chromosome="1", position=999, reference="G", observed="A"),  # never observed
        ]
    )
    return samples, regions, observations, keys


def _freq_map(df):
    return {(r.chromosome, r.position): (r.vn, r.vc, round(r.vf, 9)) for r in df.collect()}


def test_frequency_core(spark, fixture_dfs):
    samples, regions, observations, keys = fixture_dfs
    out = frequency(keys, observations, regions, samples)
    m = _freq_map(out)
    assert m[("1", 160)] == (12, 4, round(4 / 12, 9))
    assert m[("1", 400)] == (1, 1, 1.0)
    # never-observed key still gets a row (C5 left-join semantics): VC=0
    assert m[("1", 999)] == (1, 0, 0.0)


def test_frequency_selection_dsl(spark, fixture_dfs):
    samples, regions, observations, keys = fixture_dfs
    # only public samples: s1 (cov), s3 (uncond); s2 excluded
    out = frequency(keys, observations, regions, samples, compile_selection("public"))
    m = _freq_map(out)
    assert m[("1", 160)] == (2, 1, 0.5)  # VN = s1 + s3, VC = s1's 1


def test_frequency_zygosity_split(spark, fixture_dfs):
    samples, regions, observations, keys = fixture_dfs
    out = frequency(keys, observations, regions, samples, split_zygosity=True)
    r = {(x.chromosome, x.position): x for x in out.collect()}[("1", 160)]
    assert r.vc_het == 1 and r.vc_hom == 0


def test_trio_mendel_rule_matches_transmission_enumeration(spark):
    """The interval rule (child dosage in [#hom parents, #parents with an
    alt]) must equal the exhaustive transmission model for all 27
    genotype combinations, and the operator's per-trio output must be
    internally consistent on the shipped data."""
    def possible(p):
        return {0} if p == 0 else ({0, 1} if p == 1 else {1})

    for f in (0, 1, 2):
        for m in (0, 1, 2):
            for c in (0, 1, 2):
                legal = c in {a + b for a in possible(f) for b in possible(m)}
                mn = (f == 2) + (m == 2)
                mx = (f >= 1) + (m >= 1)
                rule_viol = c < mn or c > mx
                assert rule_viol == (not legal), (f, m, c)

    from varda_spark import catalog

    rows = catalog.freq_trio_mendel(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_violations <= r.n_sites
        assert 0 <= r.violation_ppm <= 1000000
