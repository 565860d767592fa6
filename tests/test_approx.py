"""Bounded-error evidence for the rows-only sketch keys: the driver can't
hash-compare an estimate, but the estimate must still sit within its
advertised error of the exact answer — asserted here."""

from pyspark.sql import functions as F

from varda_spark.catalog import REGISTRY
from varda_spark.sources.tables import read_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    got = {r.event_type: r.approx_users for r in REGISTRY["agg_approx_cd"].fn(spark, SF).collect()}
    exact = {
        r.event_type: r.n
        for r in read_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in got.items():
        rel = abs(est - exact[k]) / exact[k]
        assert rel < 0.10, f"{k}: HLL {est} vs exact {exact[k]} ({rel:.1%}) — rsd=0.02 budget blown"


def test_approx_percentile_within_rank_error(spark):
    got = {r.l_returnflag: r.med_qty for r in REGISTRY["agg_approx_pct"].fn(spark, SF).collect()}
    li = read_table(spark, SF, "lineitem")
    for flag, est in got.items():
        vals = sorted(
            r.q for r in li.filter(F.col("l_returnflag") == flag)
            .select(F.col("l_quantity").cast("double").alias("q")).collect()
        )
        # accuracy=10000 → rank error ≤ 1/10000; allow 10× slack
        n = len(vals)
        lo, hi = vals[max(0, int(n * 0.499))], vals[min(n - 1, int(n * 0.501))]
        assert lo <= est <= hi, f"{flag}: approx median {est} outside [{lo}, {hi}]"


def test_grouped_map_zscore_properties(spark):
    out = REGISTRY["udf_grouped_map"].fn(spark, SF)
    stats = out.groupBy("c_mktsegment").agg(
        F.avg("zscore").alias("mu"), F.stddev_pop("zscore").alias("sd")
    ).collect()
    for r in stats:
        assert abs(r.mu) < 1e-9, f"{r.c_mktsegment}: z-score mean {r.mu}"
        assert abs(r.sd - 1.0) < 1e-6, f"{r.c_mktsegment}: z-score std {r.sd}"
