"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the noop sink (no driver
collect overhead, no count() shortcuts). A warm-up query runs first so JVM
/ codegen startup isn't charged to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from varda_spark.catalog import REGISTRY  # noqa: E402
from varda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family, weighted toward the scale-critical
# paths (binned interval join, LSH dedup, blocked similarity, sessionization).
HEADLINE = [
    "freq_variant",     # THE varda core: frequency via binned interval join
    "agg_sum",          # TPC-H Q1 skeleton: full lineitem scan + grouped sums
    "join_equi",        # orders⋈customer shuffle join + agg
    "join_broadcast",   # dim broadcast join
    "join_range",       # range predicate join
    "join_interval",    # UCSC-binned point-in-interval join
    "win_topk",         # window top-k per group
    "agg_rollup",       # grouping sets
    "stream_tumbling",  # event-time tumbling window
    "stream_session",   # gaps-and-islands sessionization
    "dedup_exact",      # content-hash dedup
    "dedup_minhash",    # MinHash LSH candidate pairs
    "sim_topk",         # label-blocked quantized top-k similarity
    "text_ngrams",      # shingle explode + count
    "json_extract",     # JSON field extraction
    "tpch_q1",          # full-scan decimal agg (pricing summary)
    "tpch_q5",          # 6-way join with broadcast dims
    "dedup_simhash",    # simhash band join + hamming verify
    "sim_ivf",          # IVF coarse-quantized ANN
    "join_asof",        # as-of join via carry-forward window
    # round-2 additions (no round-1 record; baselines recorded in BASELINE.md)
    "freq_zygosity",    # zygosity-split frequency (flagship variant)
    "dedup_pipeline",   # exact dedup -> minhash -> components -> survivors
    "sim_lsh",          # hyperplane-LSH ANN candidate + exact verify
    "sim_kmeans",       # Lloyd's k-means coarse quantizer (3 rounds)
    "join_nearest",     # bedtools-closest sweep join
    "merge_upsert",     # warehouse MERGE keep-latest
    # round-3 additions (baselines recorded in BASELINE.md on first run)
    "tpch_q9",          # 5-way join incl. synthesized partsupp (profit rollup)
    "tpch_q21",         # EXISTS/NOT-EXISTS double correlated semi/anti join
    "graph_jaccard",    # bipartite co-purchase item-item similarity top-k
    "join_bloom",       # explicit broadcast bloom runtime pre-filter
    "agg_kmv",          # k-minimum-values distinct sketch (hash-checkable)
    "text_span_mask",   # deterministic span-corruption training transform
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    # warm-up: JVM, codegen, parquet footer caches — touch every table once
    from varda_spark.sources.tables import read_table

    for t in ("lineitem", "orders", "customer", "supplier", "events", "documents", "embeddings"):
        read_table(spark, SF_DIR, t).count()
    materialize(REGISTRY["agg_count"].fn(spark, SF_DIR))

    # best-of-2 per query: the container is co-tenant and single runs
    # show ~2x noise; min-of-2 reports the achievable time
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            materialize(REGISTRY[name].fn(spark, SF_DIR))
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
