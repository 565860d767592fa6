"""The reference's annotation workflow (§3.2) as one call.

Public varda shape (`tasks.py write_annotation` [P]): given an input VCF
and one or more named sample-selection queries, emit the same VCF with
``{QUERY}_VN`` / ``{QUERY}_VF`` INFO fields per variant. The reference
runs a correlated per-record subquery loop against PostgreSQL; here the
whole annotation is ONE Spark plan per query: the input's variant keys
left-join the pre-aggregated frequency table (C5 completeness — every
input variant gets a row, zero-observation variants get VN/VF of the
covered pool and 0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from varda_spark.expressions import compile_selection
from varda_spark.frequency import VARIANT_KEY, frequency
from varda_spark.sources.sinks import format_annotated_vcf_lines, write_annotated_vcf
from varda_spark.sources.vcf import read_vcf


def annotate_keys(
    keys: DataFrame,
    observations: DataFrame,
    regions: DataFrame,
    samples: DataFrame,
    queries: dict[str, str],
) -> DataFrame:
    """Annotate distinct variant keys with per-query VN/VF columns.

    queries: name → selection-DSL expression (expressions.py). Output has
    the key columns plus ``{name}_vn`` / ``{name}_vf`` per query —
    the columnar equivalent of the reference's INFO fields.
    """
    out = keys.select(*VARIANT_KEY).distinct()
    for name, expr_text in queries.items():
        sel = compile_selection(expr_text)
        f = frequency(out, observations, regions, samples, sel).select(
            *VARIANT_KEY,
            F.col("vn").alias(f"{name}_vn"),
            F.col("vf").alias(f"{name}_vf"),
        )
        out = out.join(f, VARIANT_KEY, "left")
    return out


def annotate_vcf(
    spark: SparkSession,
    vcf_path: str,
    observations: DataFrame,
    regions: DataFrame,
    samples: DataFrame,
    queries: dict[str, str],
    out_path: str,
) -> DataFrame:
    """Full §3.2: read VCF → annotate its keys → write annotated VCF.

    Returns the annotated keys DataFrame (also written to ``out_path``).
    """
    keys = read_vcf(spark, vcf_path).select(*VARIANT_KEY).distinct()
    ann = annotate_keys(keys, observations, regions, samples, queries)
    lines = format_annotated_vcf_lines(ann, list(queries))
    write_annotated_vcf(lines, out_path, list(queries))
    return ann
