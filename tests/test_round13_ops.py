"""Independent reference checks for the round-13 batch-AH additions.

Pure-python references — no SQL text shared with the oracle twins (the
check_oracle sweep proves cross-engine equality; these prove the
SEMANTICS against a third implementation), same discipline as
tests/test_round10_ops.py .. test_round12_ops.py. Hypothesis properties
pin the algebraic identities FIRST (the CUPED units-bug lesson: a bug
shared by both twins survives cross-engine EXACT checks; only an
independent property catches it).
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

import pandas as pd
from hypothesis import given, settings, strategies as st

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _md5mod(key: str, nhex: int, mod: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:nhex], 16) % mod


def _cents(bal: float) -> int:
    return int(Decimal(repr(float(bal))).quantize(Decimal("0.0001")) * 100)


# ------------------------------------------------- Cochran's Q (AH)


def _cochran_q_milli(matrix: list[list[int]]) -> int:
    k = len(matrix[0])
    G = [sum(col) for col in zip(*matrix)]
    L = [sum(row) for row in matrix]
    T = sum(L)
    den = k * T - sum(v * v for v in L)
    if den == 0:
        return -1
    num = (k - 1) * (k * sum(g * g for g in G) - T * T)
    return _tdiv(1000 * num, den)


_bin_matrix = st.lists(
    st.lists(st.integers(0, 1), min_size=4, max_size=4),
    min_size=2,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(_bin_matrix)
def test_cochran_q_invariant_to_concordant_rows(matrix):
    """All-0 and all-1 rows shift T, G, L together and cancel exactly in
    both the numerator and denominator — Q must not move."""
    base = _cochran_q_milli(matrix)
    assert _cochran_q_milli(matrix + [[0, 0, 0, 0]]) == base
    assert _cochran_q_milli(matrix + [[1, 1, 1, 1]]) == base


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 1), min_size=2, max_size=30))
def test_cochran_q_zero_when_variants_identical(col):
    """k identical variants: G_j all equal makes k*sum(G^2) == T^2, so
    Q == 0 (or the -1 sentinel when every row is concordant)."""
    matrix = [[v, v, v, v] for v in col]
    assert _cochran_q_milli(matrix) in (-1, 0)
    # rows are all-concordant by construction, so the denominator is 0
    assert _cochran_q_milli(matrix) == -1


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 1)),
        min_size=2,
        max_size=40,
    )
)
def test_cochran_q_k2_reduces_to_mcnemar(rows):
    """For k = 2, Q collapses to McNemar's (b-c)^2/(b+c) over the
    discordant counts (no continuity correction)."""
    b = sum(1 for x, y in rows if x == 0 and y == 1)
    c = sum(1 for x, y in rows if x == 1 and y == 0)
    k2 = [[x, y] for x, y in rows]
    # adapt the reference to k=2
    G = [sum(col) for col in zip(*k2)]
    L = [x + y for x, y in rows]
    T = sum(L)
    den = 2 * T - sum(v * v for v in L)
    if b + c == 0:
        assert den == 0
        return
    num = 1 * (2 * sum(g * g for g in G) - T * T)
    assert den == b + c
    assert num == (b - c) * (b - c)
    assert _tdiv(1000 * num, den) == _tdiv(1000 * (b - c) ** 2, b + c)


def test_agg_cochran_q_matches_pure_python(spark):
    o = pd.read_parquet(f"{SF_001}/orders.parquet")
    matrix = []
    for oid in o.o_orderkey:
        row = []
        for m in range(4):
            thr = 700 + (40 if m == 2 else -30 if m == 3 else 0)
            row.append(1 if _md5mod(f"{oid}:{m}", 6, 1000) < thr else 0)
        matrix.append(row)
    got = REGISTRY["agg_cochran_q"].fn(spark, SF_001).toPandas().iloc[0]
    G = [sum(col) for col in zip(*matrix)]
    assert [got.g0, got.g1, got.g2, got.g3] == G
    assert got.n_items == len(matrix)
    assert got.q_milli == _cochran_q_milli(matrix)
    assert got.q_significant == (1 if got.q_milli > 7815 else 0)
    # the planted ordering: variant 2 boosted, variant 3 degraded
    assert G[2] > max(G[0], G[1]) > min(G[0], G[1]) > G[3]


# ---------------------------------------------- canary leakage (AH)


def _canary(j: int) -> str:
    return "cnry" + hashlib.md5(str(j).encode()).hexdigest()


def test_qa_canary_leakage_matches_pure_python(spark):
    d = pd.read_parquet(f"{SF_001}/documents.parquet")
    per: dict[str, dict] = {}
    for _, r in d.iterrows():
        s = per.setdefault(
            r.source, {"docs": 0, "hits": 0, "docset": set(), "cans": set()}
        )
        s["docs"] += 1
        text = r.text
        if r.doc_id % 53 == 7 or (r.doc_id % 11 == 5 and r.source == "src1"):
            text = text + " " + _canary(r.doc_id % 8)
        for j in range(8):
            if _canary(j) in text:
                s["hits"] += 1
                s["docset"].add(r.doc_id)
                s["cans"].add(j)
    got = REGISTRY["qa_canary_leakage"].fn(spark, SF_001).toPandas()
    assert len(got) == len(per)
    alerts = []
    for _, r in got.iterrows():
        w = per[r.source]
        assert r.docs == w["docs"]
        assert r.canary_hits == w["hits"]
        assert r.leaked_docs == len(w["docset"])
        assert r.canaries_seen == len(w["cans"])
        assert r.leak_ppm == _tdiv(1000000 * len(w["docset"]), w["docs"])
        if r.leak_alert:
            alerts.append(r.source)
    # the punchline: exactly src1 crosses the 5% alert line
    assert alerts == ["src1"]


# -------------------------------------------- Fellegi-Sunter (AH)


def _ilog2(a: int, b: int) -> int:
    """The engine-portable signed integer log2 of a ratio: bin-length of
    the truncating quotient (floor(log2(a/b)) for a >= b; the symmetric
    negative for a < b)."""
    if a >= b:
        return (a // b).bit_length() - 1
    return 1 - (b // a).bit_length()


def test_ilog2_identities():
    assert _ilog2(8, 1) == 3
    assert _ilog2(1, 8) == -3
    for v in (1, 7, 999999):
        assert _ilog2(v, v) == 0
    assert _ilog2(999999, 1) == 19
    assert _ilog2(1, 999999) == -19


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 10**6), st.integers(1, 10**6))
def test_ilog2_sign_and_bounds(a, b):
    w = _ilog2(a, b)
    if a >= b:
        assert 2**w <= a // b < 2 ** (w + 1) or a // b == 0
        assert w >= 0
    else:
        assert w <= 0


def _fs_reference(cust: pd.DataFrame) -> dict[str, tuple[int, int]]:
    """Full pure-python Fellegi-Sunter pipeline; returns
    tier -> (pairs, planted)."""
    cust = (
        cust.sort_values(["c_name", "c_custkey"])
        .drop_duplicates("c_name", keep="first")
    )
    recs = []
    for _, r in cust.iterrows():
        recs.append(
            (int(r.c_custkey), r.c_name, int(r.c_nationkey),
             r.c_mktsegment, _cents(r.c_acctbal))
        )
        if r.c_custkey % 97 == 3:
            h = int(
                hashlib.md5(f"{int(r.c_custkey)}:fs".encode())
                .hexdigest()[:6], 16
            )
            recs.append(
                (
                    int(r.c_custkey) + 10_000_000,
                    r.c_name + "~" if h % 3 == 0 else r.c_name,
                    (int(r.c_nationkey) + 7) % 25
                    if h % 2 == 0 else int(r.c_nationkey),
                    r.c_mktsegment,
                    _cents(r.c_acctbal) + h % 101 - 50,
                )
            )
    blocks: dict[int, list] = {}
    for rec in recs:
        blocks.setdefault(_tdiv(rec[4], 1000), []).append(rec)
    pairs = []
    for blk in blocks.values():
        blk = sorted(blk)
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                a, b = blk[i], blk[j]
                pairs.append(
                    (
                        int(a[1] == b[1]),
                        int(a[2] == b[2]),
                        int(a[3] == b[3]),
                        int(abs(a[4] - b[4]) <= 100),
                        int(b[0] == a[0] + 10_000_000),
                    )
                )
    def est(sel):
        n = len(sel)
        out = []
        for f in range(4):
            ppm = _tdiv(1000000 * sum(p[f] for p in sel), n)
            out.append(max(1, min(999999, ppm)))
        return out

    mm = est([p for p in pairs if p[4] == 1])
    uu = est([p for p in pairs if p[4] == 0])
    wa = [_ilog2(mm[f], uu[f]) for f in range(4)]
    wd = [_ilog2(1000000 - mm[f], 1000000 - uu[f]) for f in range(4)]
    tiers: dict[str, list[int]] = {}
    for p in pairs:
        score = sum(wa[f] if p[f] else wd[f] for f in range(4))
        t = "link" if score >= 10 else "possible" if score >= 0 else "non_link"
        tiers.setdefault(t, [0, 0])
        tiers[t][0] += 1
        tiers[t][1] += p[4]
    return {t: tuple(v) for t, v in tiers.items()}


def test_dedup_fellegi_sunter_matches_pure_python(spark):
    cust = pd.read_parquet(f"{SF_001}/customer.parquet")
    want = _fs_reference(cust)
    got = REGISTRY["dedup_fellegi_sunter"].fn(spark, SF_001).toPandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        pairs, planted = want[r.tier]
        assert r.pairs == pairs, r.tier
        assert r.planted_pairs == planted, r.tier
        assert r.precision_ppm == _tdiv(1000000 * planted, pairs)
    by = {r.tier: r for _, r in got.iterrows()}
    # punchlines: link is pure planted; possible holds the typo'd copies
    assert by["link"].precision_ppm == 1000000
    assert by["possible"].planted_pairs > 0
    assert by["non_link"].planted_pairs == 0
    # every planted copy co-blocked at this sf is captured at >= 0 score
    total_planted = by["link"].planted_pairs + by["possible"].planted_pairs
    assert total_planted >= int(
        0.8 * len([1 for k in cust.c_custkey if k % 97 == 3])
    )
