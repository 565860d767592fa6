"""BED source (A2): coverage intervals → Region rows.

Reference semantics (varda `tasks.py import_coverage` [P]): BED intervals
define where a sample has sufficient sequencing coverage. BED is 0-based
half-open [start, end); the engine's canonical Region is 1-based CLOSED
[begin, end] (operators/binning.py convention), so begin = start+1,
end = end (a [10,20) BED row covers 1-based bases 11..20).

The enclosing UCSC bin is attached at ingest — at 100 TB this is the
write-once cost that makes every later interval join an equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from varda_spark.functions.variant import normalize_chromosome
from varda_spark.operators.binning import with_bin

BED_SCHEMA = StructType(
    [
        StructField("chrom", StringType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
    ]
)


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    """BED → regions (chromosome, begin, end, bin); comment/track lines skipped."""
    df = (
        spark.read.option("sep", "\t").option("comment", "#").schema(BED_SCHEMA).csv(path)
        .filter(F.col("chrom").isNotNull() & ~F.col("chrom").startswith("track"))
        .filter(F.col("end") > F.col("start"))
    )
    out = df.select(
        normalize_chromosome("chrom"),
        (F.col("start") + 1).alias("begin"),
        F.col("end").alias("end"),
    )
    return with_bin(out)
