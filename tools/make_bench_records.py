"""Build BENCH_RECORDS.json: per-query best-ever wall time at sf0.1.

Sources: every committed BENCH_r*.json (the driver wraps bench.py's JSON
line inside a {"tail": ...} envelope — parse the embedded line) plus any
local bench runs passed as extra file args. bench.py uses these records
as a co-tenancy noise guard: a query whose best-of-2 reads worse than
RERUN_FACTOR x its record is re-run up to MAX_RERUNS more times and the
min kept, so one noisy neighbour can't inflate the committed artifact
(BENCH_r08 read 1.93x the record on byte-identical plans — VERDICT r8
item 2).

Usage: python tools/make_bench_records.py [extra_bench.json ...]
Writes BENCH_RECORDS.json at the repo root. Re-run at round close after
a clean bench so genuinely-improved queries ratchet the records down.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def extract_queries(path: str) -> tuple[float | None, dict[str, float]]:
    """Return (sf, per-query times) from a bench artifact.

    Accepts bench.py's own one-line JSON or the driver envelope whose
    `tail` field embeds that line.
    """
    data = json.load(open(path))
    if "queries" in data and data["queries"]:
        return data.get("sf"), data["queries"]
    tail = data.get("tail", "")
    # Parse line-wise: a greedy '.*\}' used to capture to the LAST '}' in
    # the tail, so any trailing text containing '}' crashed the whole
    # records build (ADVICE r9 low). Skip unparseable lines instead.
    for line in tail.splitlines():
        line = line.strip()
        if not line.startswith('{"metric"'):
            continue
        try:
            inner = json.loads(line)
        except json.JSONDecodeError:
            continue
        if inner.get("metric") == "headline_suite_wall":
            return inner.get("sf"), inner.get("queries", {})
    return None, {}


def main() -> int:
    records: dict[str, float] = {}
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    paths += sys.argv[1:]
    used = []
    for p in paths:
        sf, queries = extract_queries(p)
        if sf != 0.1 or not queries:
            continue
        used.append(os.path.basename(p))
        for k, v in queries.items():
            if isinstance(v, (int, float)) and v > 0:
                records[k] = min(records.get(k, float("inf")), float(v))
    out = os.path.join(ROOT, "BENCH_RECORDS.json")
    json.dump(
        {"sf": 0.1, "sources": used, "records": dict(sorted(records.items()))},
        open(out, "w"),
        indent=1,
    )
    print(f"wrote {out}: {len(records)} query records from {len(used)} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
