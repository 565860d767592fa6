"""The varda core: variant-frequency computation as one DataFrame function.

Reference semantics (public varda, SURVEY.md §3.2–3.3): for each variant key
(chromosome, position, reference, observed) and a sample-selection
expression, compute

  VN ("looked at") = SUM(pool_size) over selected ACTIVE samples that have
      coverage at the locus — i.e. samples with coverage_profile=True and a
      Region containing (chromosome, position), counted ONCE each (semi-join)
      — PLUS all selected active samples with coverage_profile=False, which
      are assumed covered genome-wide and count unconditionally;
  VC (support) = SUM(observation.support) over those selected active samples'
      observations of the exact variant key;
  VF = VC / VN  (0 when VN = 0 gives NULL → caller decides; varda emits 0).

In the reference this runs as a correlated per-VCF-record subquery loop
against PostgreSQL; here it is ONE plan: binned interval join (C1) for the
denominator + equi-join/aggregate for the numerator + a left join so every
requested key yields a row (C5).

Scale: observations/regions are the 100 TB fact tables, partitioned by
chromosome; `samples` is a tiny dimension — always broadcast. The interval
join shuffles on (chromosome, bin); the numerator aggregates map-side first
(partial aggregation is automatic for sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from varda_spark.operators.interval import interval_join

VARIANT_KEY = ["chromosome", "position", "reference", "observed"]


def frequency(
    variant_keys: DataFrame | None,
    observations: DataFrame,
    regions: DataFrame,
    samples: DataFrame,
    selection: Column | None = None,
    *,
    split_zygosity: bool = False,
) -> DataFrame:
    """Per variant key: VN (covered pool), VC (support sum), VF (=VC/VN).

    variant_keys: distinct (chromosome, position, reference, observed);
    None = annotate every key present in `observations` (the database-wide
    frequency table), which skips the numerator's semi-join — one fewer
    shuffle on the widest data.
    selection: extra boolean Column over `samples` (the B3 expression DSL
    compiles to this); None = all samples. Inactive samples never count.
    """
    sel = samples.filter(F.col("active"))
    if selection is not None:
        sel = sel.filter(selection)
    sel = F.broadcast(sel.select("sample_id", "pool_size", "coverage_profile"))

    if variant_keys is None:
        # annotate-everything path (r14, guide §2.4): the key set IS the
        # numerator's group-key set, so the keys-distinct + left join
        # collapse into ONE aggregation over observations with a flagged
        # broadcast left join against the selection — the selected-sample
        # restriction moves from an inner join + outer re-join into the
        # aggregate's conditions (vc for a key with no selected rows is a
        # sum of zeros, identical to the old coalesce(NULL, 0); NULL
        # sample_ids match nothing in either shape). Removes the
        # keys-distinct exchange, the join re-exchange on the folded key
        # prefix, and a whole SortMergeJoin from the flagship plan.
        flagged = observations.join(
            sel.select("sample_id").withColumn("_sel", F.lit(True)),
            "sample_id",
            "left",
        )
        num = flagged.groupBy(*VARIANT_KEY).agg(
            F.coalesce(
                F.sum(F.when(F.col("_sel"), F.col("support"))), F.lit(0)
            ).alias("vc"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_sel") & (F.col("zygosity") == "homozygous"),
                        F.col("support"),
                    )
                ),
                F.lit(0),
            ).alias("vc_hom"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_sel") & (F.col("zygosity") == "heterozygous"),
                        F.col("support"),
                    )
                ),
                F.lit(0),
            ).alias("vc_het"),
        )
        keyed_num = num
    else:
        keys = variant_keys.select(*VARIANT_KEY).distinct()
        restricted = observations.join(sel.select("sample_id"), "sample_id").join(
            keys, VARIANT_KEY, "left_semi"
        )
        num = restricted.groupBy(*VARIANT_KEY).agg(
            F.sum("support").alias("vc"),
            F.sum(F.when(F.col("zygosity") == "homozygous", F.col("support")).otherwise(F.lit(0))).alias("vc_hom"),
            F.sum(F.when(F.col("zygosity") == "heterozygous", F.col("support")).otherwise(F.lit(0))).alias("vc_het"),
        )
        keyed_num = keys.join(num, VARIANT_KEY, "left")

    # ---- denominator part 1: covered samples via binned interval join ----
    loci = keyed_num.select("chromosome", "position").distinct()
    covered = (
        interval_join(
            loci,
            regions.join(sel.filter(F.col("coverage_profile")).select("sample_id"), "sample_id")
            .select("sample_id", "chromosome", "begin", "end"),
            strategy="binned",  # pinned: regions scale with samples×genome
        )
        # overlapping regions of one sample count once (C3 semi-join shape)
        .select("chromosome", "position", "sample_id")
        .distinct()
        .join(sel, "sample_id")
        .groupBy("chromosome", "position")
        .agg(F.sum("pool_size").alias("vn_covered"))
    )

    # ---- denominator part 2: no-coverage-profile samples count everywhere --
    uncond = sel.filter(~F.col("coverage_profile")).agg(
        F.coalesce(F.sum("pool_size"), F.lit(0)).alias("vn_uncond")
    )

    out = (
        keyed_num
        .join(covered, ["chromosome", "position"], "left")
        .crossJoin(F.broadcast(uncond))
        .withColumn("vn", F.coalesce(F.col("vn_covered"), F.lit(0)) + F.col("vn_uncond"))
        .withColumn("vc", F.coalesce(F.col("vc"), F.lit(0)))
        .withColumn("vc_hom", F.coalesce(F.col("vc_hom"), F.lit(0)))
        .withColumn("vc_het", F.coalesce(F.col("vc_het"), F.lit(0)))
        .withColumn(
            "vf",
            F.when(F.col("vn") > 0, F.col("vc") / F.col("vn")).otherwise(F.lit(0.0)),
        )
    )
    cols = [*VARIANT_KEY, "vn", "vc", "vf"]
    if split_zygosity:
        cols += ["vc_hom", "vc_het"]
    return out.select(*cols)
