"""The reference's user lifecycle as one façade: a varda user's REST
workflow (SURVEY §3 — create sample, import variation/coverage, activate,
annotate) becomes method calls over a parquet warehouse. Every method
delegates to the oracle-/pytest-verified building blocks; this module adds
only the lifecycle glue: directory layout, the duplicate-import checksum
guard (A7), sample-dimension upserts, and activation gating.

Warehouse layout under ``root/``:
  samples/        dimension (sample_id, name, pool_size, coverage_profile,
                  public, active)
  observations/   fact, partitioned by chromosome (A5)
  regions/        fact, partitioned by chromosome
  manifest/       (checksum, kind, sample_id) — duplicate-import guard

Scale notes: facts are append-only per import (one atomic parquet write
each); the tiny dimensions rewrite via merge_upsert. Frequency/annotation
read whatever imports have landed — the same decoupling varda gets from
PostgreSQL MVCC, without row-level updates.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from varda_spark.annotate import annotate_keys
from varda_spark.expressions import compile_selection
from varda_spark.frequency import frequency
from varda_spark.operators.merge import merge_upsert
from varda_spark.sources.bed import read_bed
from varda_spark.sources.vcf import read_vcf

_SAMPLE_SCHEMA = (
    "sample_id bigint, name string, pool_size int, coverage_profile boolean, "
    "public boolean, active boolean, version int"
)
_MANIFEST_SCHEMA = "checksum string, kind string, sample_id bigint"
_OBS_SCHEMA = (
    "chromosome string, position long, reference string, observed string, "
    "sample_name string, zygosity string, support int, sample_id long"
)
_REGION_SCHEMA = "chromosome string, begin long, end long, bin int, sample_id long"


class DuplicateImportError(ValueError):
    """Same content imported twice (A7 checksum guard)."""


class VardaWarehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # ---- storage helpers -------------------------------------------------
    def _path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _read(self, name: str, schema: str) -> DataFrame:
        path = self._path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(path)

    def _overwrite_dim(self, name: str, df: DataFrame) -> None:
        """Directory-swap rewrite of a (tiny) dimension.

        Write ``__new``, move the live dir aside to ``__old``, move
        ``__new`` in, then drop ``__old`` — a crash at any step leaves
        either the old or the new complete directory on disk (the renames
        are atomic on a local/posix filesystem; on object stores swap in a
        manifest-pointer commit instead). Single-writer, like the rest of
        the lifecycle (see class docstring)."""
        import shutil

        final = self._path(name)
        tmp, old = final + "__new", final + "__old"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)

    # ---- lifecycle (varda REST §3) --------------------------------------
    def samples(self) -> DataFrame:
        return self._read("samples", _SAMPLE_SCHEMA)

    def create_sample(
        self, name: str, *, pool_size: int = 1, public: bool = False
    ) -> int:
        """Register a sample; returns its id.

        The id is a content hash of the sample name (top 62 bits of
        sha1) — no max()+1 read-modify-write, so two writers creating
        DIFFERENT samples can never mint the same id. Creating the same
        name twice raises (names are the user-facing key, as in the
        reference's one-task-per-sample REST lifecycle)."""
        cur = self.samples()
        if cur.filter(F.col("name") == name).limit(1).count() > 0:
            raise ValueError(f"sample name {name!r} already exists")
        sample_id = int.from_bytes(hashlib.sha1(name.encode()).digest()[:8], "big") >> 2
        row = self.spark.createDataFrame(
            [Row(sample_id=sample_id, name=name, pool_size=pool_size,
                 coverage_profile=False, public=public, active=False, version=0)],
            _SAMPLE_SCHEMA,
        )
        self._overwrite_dim("samples", cur.unionByName(row))
        return sample_id

    def _check_duplicate(self, path: str, kind: str) -> str:
        # stream the digest in 1 MiB chunks — a multi-GB VCF must not be
        # slurped into driver memory for a checksum
        h = hashlib.sha1()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        digest = h.hexdigest()
        manifest = self._read("manifest", _MANIFEST_SCHEMA)
        if manifest.filter(F.col("checksum") == digest).limit(1).count() > 0:
            raise DuplicateImportError(f"{kind} content {digest} already imported")
        return digest

    def _record_import(self, digest: str, kind: str, sample_id: int) -> None:
        # recorded only AFTER the fact write lands — a failed import must
        # not burn its checksum (the re-import would be rejected forever)
        entry = self.spark.createDataFrame(
            [Row(checksum=digest, kind=kind, sample_id=sample_id)], _MANIFEST_SCHEMA
        )
        entry.write.mode("append").parquet(self._path("manifest"))

    def import_variation(self, sample_id: int, vcf_path: str) -> int:
        """VCF → observations for this sample (per-ALT/per-sample decompose,
        normalization, ref==alt guard all inside read_vcf). Returns the
        number of observation rows this import added."""
        digest = self._check_duplicate(vcf_path, "vcf")
        obs = read_vcf(self.spark, vcf_path).withColumn("sample_id", F.lit(sample_id).cast("long"))
        obs.write.mode("append").partitionBy("chromosome").parquet(self._path("observations"))
        self._record_import(digest, "vcf", sample_id)
        return obs.count()

    def import_coverage(self, sample_id: int, bed_path: str) -> int:
        """BED → regions; flips the sample's coverage_profile flag."""
        digest = self._check_duplicate(bed_path, "bed")
        reg = read_bed(self.spark, bed_path).withColumn("sample_id", F.lit(sample_id).cast("long"))
        reg.write.mode("append").partitionBy("chromosome").parquet(self._path("regions"))
        self._record_import(digest, "bed", sample_id)
        self._set_sample_flag(sample_id, "coverage_profile", True)
        return reg.count()

    def activate_sample(self, sample_id: int) -> None:
        """Only activated samples count in any frequency (varda semantics)."""
        self._set_sample_flag(sample_id, "active", True)

    def _set_sample_flag(self, sample_id: int, flag: str, value: bool) -> None:
        cur = self.samples()
        upd = cur.filter(F.col("sample_id") == sample_id).withColumn(
            flag, F.lit(value)
        ).withColumn("version", F.col("version") + 1)
        merged = merge_upsert(cur, upd, ["sample_id"])
        self._overwrite_dim("samples", merged)

    # ---- queries ---------------------------------------------------------
    def observations(self) -> DataFrame:
        return self._read("observations", _OBS_SCHEMA)

    def regions(self) -> DataFrame:
        return self._read("regions", _REGION_SCHEMA)

    def frequency(self, selection: str | None = None, keys: DataFrame | None = None) -> DataFrame:
        sel = compile_selection(selection) if selection else None
        return frequency(keys, self.observations(), self.regions(), self.samples(), sel)

    def annotate(self, vcf_path: str, queries: dict[str, str]) -> DataFrame:
        """Annotate a VCF's variant keys with per-query VN/VF columns."""
        keys = read_vcf(self.spark, vcf_path).select(
            "chromosome", "position", "reference", "observed"
        ).distinct()
        return annotate_keys(keys, self.observations(), self.regions(), self.samples(), queries)
