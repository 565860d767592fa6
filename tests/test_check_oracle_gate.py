"""The local gate must be at least as strict as the driver's hash.

Round 7 proved a failure class: DuckDB window ``SUM`` yields HUGEINT,
which pandas materializes as float64, while the Spark twin emits int64.
Every VALUE is identical, but the driver hashes ``20028`` vs ``20028.0``
and fails — and tools/check_oracle.py's float coercion used to mask it
(agg_winsorized_mean read EXACT locally, red on the driver). These tests
pin the hardened gate: int-vs-float dtype skew is a FAIL, not EXACT.

No Spark session needed — ``compare`` is pure pandas, and the
HUGEINT-leak reproduction runs on DuckDB alone.
"""

import duckdb
import pandas as pd

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import compare  # noqa: E402


def test_int_vs_float_skew_is_flagged():
    spark_side = pd.DataFrame({"flag": ["A", "N"], "n": pd.array([20028, 39971], dtype="int64")})
    duck_side = pd.DataFrame({"flag": ["A", "N"], "n": pd.array([20028.0, 39971.0], dtype="float64")})
    verdict = compare("skew", spark_side, duck_side)
    assert verdict.startswith("DTYPE"), verdict
    assert "n" in verdict


def test_matching_int_dtypes_stay_exact():
    a = pd.DataFrame({"flag": ["A", "N"], "n": pd.array([20028, 39971], dtype="int64")})
    b = pd.DataFrame({"flag": ["A", "N"], "n": pd.array([39971, 20028], dtype="int64")})
    b["flag"] = ["N", "A"]
    assert compare("ok", a, b) == "EXACT"


def test_matching_float_dtypes_stay_exact():
    a = pd.DataFrame({"x": [1.5, 2.5]})
    b = pd.DataFrame({"x": [2.5, 1.5]})
    assert compare("okf", a, b) == "EXACT"


def test_duckdb_window_sum_leaks_hugeint_as_float():
    """The real reproduction: a windowed SUM aggregated by MIN comes back
    from DuckDB as float64 (HUGEINT has no numpy dtype), so an oracle
    whose final SELECT omits CAST(... AS BIGINT) skews against Spark's
    int64 — and the hardened gate must catch exactly that."""
    con = duckdb.connect()
    leaked = con.sql(
        """WITH v AS (SELECT * FROM (VALUES ('A', 3), ('A', 5), ('B', 7)) t(g, c)),
           cum AS (SELECT g, SUM(c) OVER (PARTITION BY g) AS n FROM v)
           SELECT g, MIN(n) AS n FROM cum GROUP BY g"""
    ).df()
    assert leaked["n"].dtype == "float64", leaked.dtypes
    spark_like = pd.DataFrame({"g": ["A", "B"], "n": pd.array([8, 7], dtype="int64")})
    assert compare("leak", spark_like, leaked).startswith("DTYPE")
    # and the one-line fix restores EXACT
    fixed = con.sql(
        """WITH v AS (SELECT * FROM (VALUES ('A', 3), ('A', 5), ('B', 7)) t(g, c)),
           cum AS (SELECT g, SUM(c) OVER (PARTITION BY g) AS n FROM v)
           SELECT g, CAST(MIN(n) AS BIGINT) AS n FROM cum GROUP BY g"""
    ).df()
    assert compare("fixed", spark_like, fixed) == "EXACT"


def test_dtype_skew_with_value_diff_reports_both():
    """A column with dtype skew AND genuinely different values must say
    DTYPE+MISMATCH, not plain DTYPE (which reads as values-identical)."""
    a = pd.DataFrame({"n": pd.array([20028, 39971], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([20028.0, 40000.0], dtype="float64")})
    verdict = compare("skewdiff", a, b)
    assert verdict.startswith("DTYPE+MISMATCH"), verdict


def test_dtype_skew_identical_values_reports_plain_dtype():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
    verdict = compare("skewsame", a, b)
    assert verdict.startswith("DTYPE") and "MISMATCH" not in verdict, verdict
