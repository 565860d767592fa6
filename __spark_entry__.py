"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship varda-shaped frequency query at sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2),
                 defined in varda_spark/catalog.py next to its oracle SQL.
oracle_sql()   — DuckDB twins, column-name-aligned (driver hash-compares).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from varda_spark.catalog import REGISTRY
from varda_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the varda core end-to-end (SURVEY.md §3).

    Variant-frequency computation — numerator support sums over selected
    active samples, denominator covered-pool via the UCSC-binned
    point-in-interval join plus unconditional no-coverage-profile samples,
    left-join completeness — on genomic-shaped tables synthesized from the
    driver testdata. Same oracle-checked path as queries()['freq_variant'].
    """
    configure(spark)
    return REGISTRY["freq_variant"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: entry_.fn for name, entry_ in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (omitted → rows-only check)."""
    return {name: entry_.sql for name, entry_ in REGISTRY.items() if entry_.sql is not None}
