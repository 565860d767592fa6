"""Full-catalog scale smoke: EVERY registry key at sf0.1 and sf1, min-of-2.

The per-batch ritual (tools/smoke_scale.py) covers each round's additions at
sf0.1/1/5; this runs the WHOLE catalog across a 10x step so pre-ritual keys
(rounds 1-4) get scale evidence too. Normalized ratio = wall(sf1)/wall(sf0.1)
divided by the 10x data ratio; > 2.0 is flagged super-linear. Small-sf fixed
overhead pushes ratios well below 1 — the detector is for outliers, not the
absolute value. Prints one JSON line at the end; intended for the round-10
close-out verification story (LEDGER.md cites the artifact).

Usage: python tools/smoke_catalog.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

# Anchor on the repo root like the sibling tools (ledger.py,
# make_bench_records.py) so the tool works from any cwd (ADVICE r9 low).
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from varda_spark.catalog import REGISTRY  # noqa: E402
from varda_spark.session import get_spark  # noqa: E402

DIRS = {"0.1": "/root/testdata/sf0.1", "1": os.path.join(ROOT, "scaledata", "sf1")}


def main() -> None:
    spark = get_spark("smoke-catalog")
    walls: dict[str, dict[str, float]] = {}
    for sf, d in DIRS.items():
        for i, (k, spec) in enumerate(REGISTRY.items(), 1):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                spec.fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            walls.setdefault(k, {})[sf] = round(best, 2)
            print(f"sf{sf:<4} {i:3d}/{len(REGISTRY)} {k:<30} {best:7.2f}s",
                  flush=True)
    ratios = {
        k: round(w["1"] / max(w["0.1"], 1e-9) / 10.0, 2)
        for k, w in walls.items()
    }
    flagged = sorted(k for k, r in ratios.items() if r > 2.0)
    out = {
        "metric": "catalog_sf_scaling_ratio",
        "n_keys": len(ratios),
        "worst": max(ratios.values()),
        "superlinear": flagged,
        "ratios": ratios,
        "sf": [0.1, 1],
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        json.dump(out, open(sys.argv[1], "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
