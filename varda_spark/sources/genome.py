"""FASTA reference-genome access (A4): allele validation at ingest.

Reference semantics (varda `utils.py ReferenceMismatch` + pyfaidx usage
[P]): imported variants whose REF allele disagrees with the reference
genome are rejected. Our Spark translation: the genome (or just the
chromosomes present in the batch) is loaded driver-side and broadcast;
validation is a join-free Column check via a broadcast map of slices.

For real genomes (3 GB) you broadcast per-chromosome byte arrays or use
a faidx-indexed local file per executor via mapInPandas; this module keeps
the contract small: validate(df) → df + ref_ok boolean, quarantine split.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def read_fasta(path: str) -> dict[str, str]:
    """Tiny-FASTA loader (test genomes); returns {chromosome: sequence}."""
    opener = gzip.open if path.endswith(".gz") else open
    out: dict[str, str] = {}
    name, chunks = None, []
    with opener(path, "rt") as f:  # type: ignore[operator]
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    out[name] = "".join(chunks)
                name, chunks = line[1:].split()[0], []
            elif line:
                chunks.append(line.upper())
    if name is not None:
        out[name] = "".join(chunks)
    return out


def validate_reference(df: DataFrame, genome: dict[str, str]) -> DataFrame:
    """Add ``ref_ok``: does reference allele match the genome at position?

    Uses a broadcast map literal (chromosome → sequence) and substring —
    fine for test genomes; swap the map for per-executor faidx at scale.
    Empty reference alleles (pure insertions) validate trivially.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(genome)

    @F.pandas_udf("boolean")
    def _ok(chrom: pd.Series, pos: pd.Series, ref: pd.Series) -> pd.Series:
        g = bc.value

        def check(c, p, r):
            if r is None or r == "":
                return True
            seq = g.get(c)
            if seq is None:
                return False
            start = int(p) - 1
            return seq[start : start + len(r)] == r.upper()

        return pd.Series([check(c, p, r) for c, p, r in zip(chrom, pos, ref)])

    return df.withColumn("ref_ok", _ok(F.col("chromosome"), F.col("position"), F.col("reference")))


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — ingest-time validation as filters (SURVEY §1.3)."""
    return df.filter(F.col("ref_ok")).drop("ref_ok"), df.filter(~F.col("ref_ok")).drop("ref_ok")
