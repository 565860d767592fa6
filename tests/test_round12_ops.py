"""Independent reference checks for the round-12 additions.

Pure-python references — no SQL text shared with the oracle twins (the
check_oracle sweep proves cross-engine equality; these prove the
SEMANTICS against a third implementation), same discipline as
tests/test_round10_ops.py / test_round11_ops.py.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def _docs(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()


def _events(spark) -> pd.DataFrame:
    return spark.read.parquet(f"{SF_001}/events.parquet").toPandas()


def _cents(price) -> int:
    return int(Decimal(repr(float(price))).quantize(Decimal("0.0001")) * 100)


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _trigrams(text: str) -> set[str]:
    w = text.strip().split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def test_qa_contamination_ngram_matches_pure_python(spark):
    d = _docs(spark)
    by_id = dict(zip(d.doc_id, d.text))
    panel = {int(i): _trigrams(by_id[i]) for i in range(20)}
    rows = {}
    for doc_id, text, source in zip(d.doc_id, d.text, d.source):
        doc_id = int(doc_id)
        if doc_id < 20:
            continue
        t = text + " " + by_id[doc_id % 20] if doc_id % 41 == 3 else text
        grams = _trigrams(t)
        cont = max(
            (1000000 * len(grams & pg)) // len(pg) for pg in panel.values()
        )
        rows.setdefault(source, []).append(cont)
    got = REGISTRY["qa_contamination_ngram"].fn(spark, SF_001).toPandas()
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        scores = rows[r.source]
        assert r.docs == len(scores)
        assert r.leaked_docs == sum(s >= 900000 for s in scores)
        assert r.partial_docs == sum(s >= 500000 for s in scores)
        assert r.suspect_docs == sum(s >= 100000 for s in scores)
        assert r.max_cont_ppm == max(scores)
    # the fixture punchline: every planted doc (doc_id % 41 == 3) sits at
    # exactly 1e6 ppm, and the detector also catches ONE organic
    # near-duplicate above the 90% line
    planted = sum(
        1 for i in d.doc_id if int(i) >= 20 and int(i) % 41 == 3
    )
    total_leaked = int(got.leaked_docs.sum())
    assert total_leaked == planted + 1


def test_agg_cuped_adjust_matches_pure_python(spark):
    e = _events(spark)
    day = e.ts.astype("int64") // 10**9 // 86400
    per = {}
    for uid, dday, val in zip(e.user_id, day, e.value):
        uid = int(uid)
        x, y = per.setdefault(uid, [0, 0])
        u = _cents(val) // 100
        if int(dday) % 2 == 0:
            per[uid][0] = x + u
        else:
            per[uid][1] = y + u
    xs, ys, arms = [], [], []
    for uid, (x, y) in sorted(per.items()):
        fe = (uid % 13) * 500
        arm = uid % 2
        xs.append(x + fe)
        ys.append(y + fe + (400 if arm == 1 else 0))
        arms.append(arm)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    n0 = arms.count(0)
    n1 = arms.count(1)
    sx0 = sum(v for v, a in zip(xs, arms) if a == 0)
    sx1 = sum(v for v, a in zip(xs, arms) if a == 1)
    sy0 = sum(v for v, a in zip(ys, arms) if a == 0)
    sy1 = sum(v for v, a in zip(ys, arms) if a == 1)
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    dy = _tdiv(1000 * sy1, n1) - _tdiv(1000 * sy0, n0)
    dx = _tdiv(1000 * sx1, n1) - _tdiv(1000 * sx0, n0)
    theta = _tdiv(1000 * cov, varx)
    # theta_milli * dx_milli is in micro-units; one DIV 1000 lands in
    # milli (a DIV 1e6 here would under-adjust by 1000x — caught by the
    # y==x property in test_round12_random.py)
    dyc = dy - _tdiv(theta * dx, 1000)
    resid = vary - _tdiv(cov * cov, varx)
    got = REGISTRY["agg_cuped_adjust"].fn(spark, SF_001).toPandas()
    r = got.iloc[0]
    assert (r.n_users, r.n_control, r.n_treat) == (n, n0, n1)
    assert r.theta_milli == theta
    assert r.dx_milli == dx
    assert r.effect_raw_milli == dy
    assert r.effect_cuped_milli == dyc
    assert r.var_reduction_ppm == _tdiv(_tdiv(1000000 * cov, varx) * cov, vary)
    assert r.tsq_raw_milli == _tdiv(
        dy * dy * n * n * n0 * n1, 1000 * vary * (n0 + n1)
    )
    assert r.tsq_cuped_milli == _tdiv(
        dyc * dyc * n * n * n0 * n1, 1000 * resid * (n0 + n1)
    )
    # fixture punchline: the planted user fixed effect makes >90% of the
    # metric variance pre-period-predictable, and the SAME +400 lift is
    # invisible raw but crosses the chi2_1 95% line (3841 milli) after
    # CUPED
    assert r.var_reduction_ppm > 900000
    assert r.tsq_raw_milli < 3841 < r.tsq_cuped_milli
    # the adjustment itself must be material: theta ~ 1, so the planted
    # arm imbalance in X (dx) is subtracted nearly 1:1 from the raw
    # effect (the DIV-1e6 units bug made this correction ~0)
    assert abs((r.effect_raw_milli - r.effect_cuped_milli) - dx) < abs(dx) // 10 + 1000


def test_text_unigram_drift_matches_pure_python(spark):
    d = _docs(spark)
    from collections import Counter

    all_words = Counter()
    for text in d.text:
        all_words.update(text.strip().split())
    top = min(all_words.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    per_src: dict[str, Counter] = {}
    for text, source in zip(d.text, d.source):
        ws = [
            w
            for w in text.strip().split()
            if not (source == "src0" and w == top)
        ]
        per_src.setdefault(source, Counter()).update(ws)
    vocab = Counter()
    for c in per_src.values():
        vocab.update(c)
    n = sum(vocab.values())
    got = REGISTRY["text_unigram_drift"].fn(spark, SF_001).toPandas()
    assert len(got) == len(per_src)
    for _, r in got.iterrows():
        c = per_src[r.source]
        s = sum(c.values())
        chi = sum(
            _tdiv(
                1000 * (c.get(w, 0) * n - cnt * s) ** 2, n * cnt * s
            )
            for w, cnt in vocab.items()
        )
        assert r.tokens == s
        assert r.vocab_cells == len(vocab)
        assert r.chi2_milli == chi
        assert r.drifted == (1 if chi > 59700 else 0)
    # fixture punchline: ONLY the source with the planted top-word
    # dropout crosses the chi2_30 99.9% line
    assert set(got[got.drifted == 1].source) == {"src0"}
