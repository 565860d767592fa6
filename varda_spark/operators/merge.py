"""Warehouse upsert (A5+): MERGE-INTO keep-latest semantics as one plan.

A mutable-table engine (the reference's PostgreSQL layer) updates rows in
place; an immutable-parquet warehouse expresses the same contract as
union + per-key latest-version selection. This is exactly the data motion
of a Delta/Iceberg MERGE shuffle: one hash shuffle on the merge keys,
map-side partial nothing (row_number needs the full key group, which is
one shuffle partition). At 100 TB: partition the warehouse by a key prefix
so the merge shuffles only touched partitions (dynamic partition
overwrite), never the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str = "version",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Rows from `updates` replace same-key rows of `base`; highest
    `order_col` wins. If the key may repeat WITHIN a version (dirty
    input), pass `tiebreak` columns to make the survivor deterministic.
    Schema of both inputs must match."""
    merged = base.unionByName(updates)
    order = [F.col(order_col).desc()] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
