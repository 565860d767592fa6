"""Assert the driver's first-50 REGISTRY window contains only never-sampled keys.

The correctness driver certifies only ``list(REGISTRY)[:50]`` per round
(CORRECTNESS_r{N}.json). This script fails if the current window overlaps
the union of keys already certified in prior rounds' CORRECTNESS files, so
each round's driver run certifies NEW operators instead of re-proving old
ones. Run before round close; also lists remaining never-sampled keys so
the next rotation can be staged.
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, ".")

from varda_spark.catalog import REGISTRY  # noqa: E402

try:
    from varda_spark.catalog import _DRIVER_RECERT  # noqa: E402
except ImportError:  # pre-r7 checkouts
    _DRIVER_RECERT = []


def sampled_rounds() -> dict[str, int]:
    """Latest round each key was CERTIFIED by a driver run.

    A key that ERR'd at the driver (e.g. the four r4 array-output keys)
    is NOT certified — it stays eligible for the next window so it can
    be re-proved after the fix. Neither is a key whose hash FAILED
    (hash_match false, e.g. agg_winsorized_mean in r7): re-sampling it
    after the fix is certification, not waste, so it must not trip the
    overlap gate.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        data = json.load(open(path))
        results = data.get("results", data)
        if isinstance(results, dict):
            rows = [
                k for k, row in results.items()
                if not (isinstance(row, dict) and (
                    row.get("err") or row.get("hash_match") is False
                ))
            ]
        else:
            rows = [row["key"] for row in results]
        for k in rows:
            latest[k] = max(latest.get(k, -1), rnd)
    return latest


def active_recerts(latest: dict[str, int], recert_list=None) -> set[str]:
    """Recert keys still awaiting their re-proof.

    A recert listing is NOT a permanent pass (ADVICE r12): the key is
    excused only while its newest driver hash predates the latest
    landed round — once the recert round's CORRECTNESS file records
    it, re-windowing it again is a wasted slot and trips the gate.
    """
    if recert_list is None:
        recert_list = _DRIVER_RECERT
    max_round = max(latest.values(), default=0)
    return {k for k in recert_list if latest.get(k, -1) < max_round}


def main() -> int:
    latest = sampled_rounds()
    prior = set(latest)
    recert = active_recerts(latest)
    window = list(REGISTRY)[:50]
    overlap = [k for k in window if k in prior and k not in recert]
    recert_in = [k for k in window if k in recert]
    rows_only = [k for k in window if REGISTRY[k].sql is None]
    never = [k for k in REGISTRY if k not in prior and k not in set(window)]
    print(f"prior driver-certified keys: {len(prior)}")
    print(f"window overlap with prior rounds: {len(overlap)} {overlap or ''}")
    if recert_in:
        print(f"re-certification keys in window (stale prior hashes, allowed): "
              f"{len(recert_in)} {recert_in}")
    print(f"rows-only keys in window (weak check): {len(rows_only)} {rows_only or ''}")
    print(f"never-sampled keys left outside this window: {len(never)}")
    if never:
        print("  " + ", ".join(never))
    if overlap:
        print("FAIL: rotate _DRIVER_PRIORITY — window re-proves certified keys")
        return 1
    if rows_only:
        print("WARN: rows-only keys occupy full-hash slots")
    print("OK: all 50 window slots are never-driver-sampled (or re-cert) "
          "oracle-twinned keys")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
