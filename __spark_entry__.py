"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship varda-shaped frequency query at sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2),
                 defined in varda_spark/catalog.py next to its oracle SQL.
oracle_sql()   — DuckDB twins, column-name-aligned (driver hash-compares).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from varda_spark.catalog import REGISTRY, dsum
from varda_spark.session import configure
from varda_spark.sources.tables import read_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: event-type "frequency".

    The varda frequency shape (SURVEY.md §3) transposed to the events
    table: per event_type ("variant"), VC = number of carrying users
    ("support"), VN = all users observed in the window ("covered pool"),
    VF = VC / VN — filter → aggregate → broadcast-join ratio, all
    Catalyst-optimized.
    """
    configure(spark)
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("vc_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        dsum("value", 4).alias("sum_value"),
    )
    total = ev.agg(F.countDistinct("user_id").cast("bigint").alias("vn_users"))
    return (
        per_type.crossJoin(F.broadcast(total))
        .withColumn("vf", F.col("vc_users").cast("double") / F.col("vn_users").cast("double"))
        .select("event_type", "vc_users", "vn_users", "vf", "n_events", "sum_value")
        .orderBy("event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: entry_.fn for name, entry_ in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (omitted → rows-only check)."""
    return {name: entry_.sql for name, entry_ in REGISTRY.items() if entry_.sql is not None}
