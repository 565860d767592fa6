"""tools/ledger.py is the round-10 close-out artifact generator — pin its
invariants so the verification round can trust it: every REGISTRY key gets
exactly one row, placement buckets are disjoint-and-exhaustive, and the
driver history honors the certified-vs-red distinction check_rotation uses.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import ledger  # noqa: E402

from varda_spark.catalog import REGISTRY  # noqa: E402


def test_ledger_rows_cover_registry_exactly():
    rows, hist, sweep_name, sweep = ledger.build_rows()
    assert [r["key"] for r in rows] == list(REGISTRY)
    for r in rows:
        assert r["twin"] in ("oracle", "rows-only")
        assert r["driver"]  # never empty


def test_ledger_placement_buckets_are_sound():
    rows, hist, *_ = ledger.build_rows()
    s = ledger.summary(rows, hist, "x.log", {})
    # certified + live + staged + rows-only + unstaged == total
    assert (
        s["driver_certified"]
        + s["live_window"]
        + s["staged_r10"]
        + s["rows_only"]
        + len(s["unstaged"])
        + len(s["driver_red_latest"])
        == s["total"]
    )
    # the round-9 state: nothing unstaged, nothing red
    assert s["unstaged"] == []
    assert s["driver_red_latest"] == []


def test_driver_history_redness_rules():
    hist = ledger.driver_history()
    # every certified key must still exist in the registry (stale
    # CORRECTNESS keys would silently misalign the close-out table)
    missing = [k for k in hist if k not in REGISTRY]
    assert missing == []
    # statuses are from the closed vocabulary
    assert {s for _, s in hist.values()} <= {"green", "hash-fail", "err"}
