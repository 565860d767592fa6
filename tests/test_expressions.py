"""Sample-selection DSL parser tests (B3)."""

import pytest
from pyspark.sql import Row

from varda_spark.expressions import ExpressionError, compile_selection

SAMPLES = [
    Row(sample_id=1, name="gonl", pool_size=500, coverage_profile=True, public=True, active=True),
    Row(sample_id=2, name="indiv1", pool_size=1, coverage_profile=False, public=False, active=True),
    Row(sample_id=3, name="indiv2", pool_size=1, coverage_profile=True, public=True, active=True),
]


@pytest.mark.parametrize(
    "expr,expected_ids",
    [
        ("*", {1, 2, 3}),
        ("sample:gonl", {1}),
        ("public", {1, 3}),
        ("pooled", {1}),
        ("not pooled", {2, 3}),
        ("public and covered", {1, 3}),
        ("sample:gonl or sample:indiv1", {1, 2}),
        ("not (public or pooled)", {2}),
        ("PUBLIC AND NOT pooled", {3}),
    ],
)
def test_selection(spark, expr, expected_ids):
    df = spark.createDataFrame(SAMPLES)
    got = {r.sample_id for r in df.filter(compile_selection(expr)).collect()}
    assert got == expected_ids


@pytest.mark.parametrize("bad", ["and", "sample:", "(public", "public extra!", "%%%"])
def test_bad_expressions(bad):
    with pytest.raises(ExpressionError):
        compile_selection(bad)
