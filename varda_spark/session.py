"""SparkSession builder with scale-appropriate defaults.

At 100 TB on a real cluster the same knobs apply — AQE coalesces /
re-splits shuffle partitions at runtime, so ``spark.sql.shuffle.partitions``
is an upper bound, not a hand-tuned constant; skew-join handling and
broadcast selection are delegated to AQE rather than hard-coded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level confs that must also be applied to an externally provided
# session (e.g. the verify driver's) before reading our tables.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as long and convert (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # dynamic broadcast — all essential at multi-TB shuffle sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE rewrite a sort-merge join to a shuffled-hash join when every
    # post-shuffle partition's build side is under 64 MB (guide §3.1): the
    # rewrite is runtime-size-guarded, so it is safe at any scale — a
    # 100 TB join whose partitions exceed the bound keeps sort-merge, and
    # a 64 MB per-partition hash map is trivially within executor memory.
    # Default is 0 (off). Interleaved min-of-3 A/B on the SMJ-heavy bench
    # keys (r14): 20.7 s → 16.0 s across 6 keys in one run, ~parity in a
    # second (co-tenant noise); skips both sort passes when it fires.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024),
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-owned)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; builder path sets it
    return spark


def get_spark(app_name: str = "varda_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: ~2x cores is a good static upper bound; AQE coalesces.
        shuffle_partitions = max(2 * cpus, 32)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return configure(b.getOrCreate())
