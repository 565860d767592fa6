"""Independent reference check for the single round-10 addition,
dedup_ccnet_sharding (the one spare driver-window slot — growth is
otherwise frozen per VERDICT r9 item 2).

Pure-python reference: hashlib.md5 + dict accounting — no SQL text
shared with the oracle twin (the check_oracle sweep proves cross-engine
equality; this proves the SEMANTICS against a third implementation).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def _reference_shards(docs: pd.DataFrame) -> pd.DataFrame:
    """CCNet sharding computed the naive way: canonical form -> md5 ->
    shard = first-60-bits mod 16; per-shard doc/distinct/dupe counts,
    chars in vs kept (keeper = min-doc_id copy), load in ppm (truncated)."""
    groups: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for doc_id, text, n_chars in zip(docs.doc_id, docs.text, docs.n_chars):
        if doc_id % 7 == 0:
            content = f"boilerplate page {doc_id % 5}"
        else:
            content = text.strip().lower()
        h = hashlib.md5(content.encode()).hexdigest()
        shard = int(h[:15], 16) % 16
        groups.setdefault((shard, h), []).append((int(doc_id), int(n_chars)))
    per_shard: dict[int, dict[str, int]] = {}
    for (shard, _h), members in groups.items():
        s = per_shard.setdefault(
            shard,
            {"n_docs": 0, "n_distinct": 0, "n_dupes": 0, "chars_in": 0, "chars_kept": 0},
        )
        s["n_docs"] += len(members)
        s["n_distinct"] += 1
        s["n_dupes"] += len(members) - 1
        s["chars_in"] += sum(c for _, c in members)
        s["chars_kept"] += min(members)[1]  # min by doc_id (first tuple slot)
    total = sum(s["n_docs"] for s in per_shard.values())
    rows = [
        {
            "shard": shard,
            **s,
            "load_ppm": (s["n_docs"] * 1_000_000) // total,
        }
        for shard, s in per_shard.items()
    ]
    return pd.DataFrame(rows).sort_values("shard").reset_index(drop=True)


def test_dedup_ccnet_sharding_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    want = _reference_shards(docs)
    got = (
        REGISTRY["dedup_ccnet_sharding"]
        .fn(spark, SF_001)
        .toPandas()
        .sort_values("shard")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(
        got[["shard", "n_docs", "n_distinct", "n_dupes", "chars_in",
             "chars_kept", "load_ppm"]],
        want[["shard", "n_docs", "n_distinct", "n_dupes", "chars_in",
              "chars_kept", "load_ppm"]].astype("int64"),
    )
    # invariants that make the shard plan VALID for distributed dedup:
    # every copy of a fingerprint is in exactly one shard, so summing
    # per-shard distinct counts equals the global distinct count
    assert got.n_docs.sum() == len(docs)
    assert got.n_dupes.sum() == got.n_docs.sum() - got.n_distinct.sum()
    # load is a partition of ~1e6 ppm (truncation loses < 16 ppm)
    assert 1_000_000 - 16 <= got.load_ppm.sum() <= 1_000_000
    # the fixture's boilerplate class actually produced duplicates
    assert got.n_dupes.sum() > 0


def test_dedup_ccnet_sharding_copies_colocate(spark):
    """The load-bearing property at 100 TB: shard is a function of the
    content hash, so duplicate groups never straddle shards. Verified by
    recomputing the grouping pure-python above; here additionally assert
    the Spark output's chars accounting is consistent (chars_kept <=
    chars_in, equality exactly on dupe-free shards)."""
    got = REGISTRY["dedup_ccnet_sharding"].fn(spark, SF_001).toPandas()
    assert (got.chars_kept <= got.chars_in).all()
    dupe_free = got[got.n_dupes == 0]
    assert (dupe_free.chars_kept == dupe_free.chars_in).all()
