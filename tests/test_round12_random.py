"""Property-based tests for the round-12 kernel ALGEBRA.

The reference tests in test_round12_ops.py pin each key to the driver
testdata; these re-prove the underlying algorithms on RANDOM inputs
(hypothesis) against brute force / closed-form identities, pure python
only — catching anything that holds only by accident of the fixture
distribution. No SparkSession. The CUPED y==x identity here is the test
that CAUGHT the theta*dx units bug (DIV 1e6 instead of DIV 1000) before
the key shipped.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) division — Spark DIV / DuckDB int //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --------------------------------------------------- containment (AG)


def _containment_grouped(corpus: dict[int, set], panel: dict[int, set]):
    """The qa_contamination_ngram reduction: gram-join hits grouped per
    (doc, panel doc), max over panel docs, zero-hit docs kept at 0."""
    out = {}
    for d, grams in corpus.items():
        best = 0
        for p, pg in panel.items():
            if not pg:
                continue
            hits = len(grams & pg)
            if hits:
                best = max(best, (1000000 * hits) // len(pg))
        out[d] = best
    return out


def _grams3(words: list[str]) -> set[str]:
    return {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}


_words = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f"]), min_size=3, max_size=12
)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(_words, min_size=1, max_size=8),
    st.lists(_words, min_size=1, max_size=4),
)
def test_containment_full_item_leak_scores_exactly_1e6(corpus, panel):
    """A corpus doc that verbatim-contains a panel doc (concatenated
    with arbitrary other text, the planted-leak construction) must
    score exactly 1e6 ppm — the panel-side denominator is invariant to
    how large the host doc is."""
    pg = {i: _grams3(w) for i, w in enumerate(panel)}
    host = corpus[0] + panel[0]  # leak: panel doc 0 glued onto host
    cg = {0: _grams3(host)}
    got = _containment_grouped(cg, pg)
    # the host contains every trigram of panel[0] *as a substring run*
    # only when the glue point doesn't matter for set containment —
    # grams of panel[0] are a subset of grams of host by construction
    assert pg[0] <= cg[0]
    assert got[0] == 1000000


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 5),
        st.sets(st.integers(0, 40), max_size=15),
        min_size=1,
        max_size=6,
    ),
    st.dictionaries(
        st.integers(0, 3),
        st.sets(st.integers(0, 40), min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    ),
)
def test_containment_grouped_equals_brute_force(corpus, panel):
    got = _containment_grouped(corpus, panel)
    for d, grams in corpus.items():
        brute = max(
            (1000000 * len(grams & pg)) // len(pg) for pg in panel.values()
        )
        assert got[d] == brute
        assert 0 <= got[d] <= 1000000


# --------------------------------------------------------- CUPED (AG)


def _cuped(xs, ys, arms):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    n0, n1 = arms.count(0), arms.count(1)
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
    dyc = dy - _tdiv(theta * dx, 1000)
    resid = vary - _tdiv(cov * cov, varx)
    return dict(
        theta=theta, dy=dy, dx=dx, dyc=dyc, vary=vary, varx=varx,
        cov=cov, resid=resid,
        vr=_tdiv(_tdiv(1000000 * cov, varx) * cov, vary) if vary else None,
    )


_panel_data = st.lists(
    st.tuples(
        st.integers(0, 10_000),  # x
        st.integers(0, 1),  # arm
    ),
    min_size=4,
    max_size=40,
).filter(
    lambda rows: len({a for _, a in rows}) == 2
    and len({x for x, _ in rows}) > 1
)


@settings(max_examples=200, deadline=None)
@given(_panel_data)
def test_cuped_y_equals_x_identity(rows):
    """When Y == X exactly: theta_milli == 1000 (cov == varx), the
    adjusted effect collapses to dy - dx up to the one milli
    truncation, the Schur residual is exactly 0, and rho^2 == 1e6 ppm.
    The DIV-1e6 units bug made dyc ~= dy here — this test fails loudly
    under it."""
    xs = [x for x, _ in rows]
    arms = [a for _, a in rows]
    r = _cuped(xs, xs, arms)
    assert r["theta"] == 1000
    assert r["resid"] == 0
    assert r["vr"] == 1000000
    assert abs(r["dyc"]) <= 1  # dy - trunc(1000*dx/1000) = dy - dx = 0

@settings(max_examples=200, deadline=None)
@given(_panel_data, st.integers(-5000, 5000))
def test_cuped_shift_invariance_of_residual(rows, shift):
    """Adding a constant to every Y shifts dy but leaves the variance
    machinery (cov, vary, resid, theta) unchanged — the n-scaled moment
    forms are location-free."""
    xs = [x for x, _ in rows]
    arms = [a for _, a in rows]
    ys = [x + 17 for x in xs]
    base = _cuped(xs, ys, arms)
    shifted = _cuped(xs, [y + shift for y in ys], arms)
    assert shifted["cov"] == base["cov"]
    assert shifted["vary"] == base["vary"]
    assert shifted["theta"] == base["theta"]
    assert shifted["resid"] == base["resid"]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3_000),
            st.integers(0, 3_000),
            st.integers(0, 1),
        ),
        min_size=4,
        max_size=40,
    ).filter(
        lambda rows: len({a for _, _, a in rows}) == 2
        and len({x for x, _, _ in rows}) > 1
    )
)
def test_cuped_schur_residual_nonnegative(rows):
    """vary - trunc(cov^2/varx) >= 0 for ANY integer data
    (Cauchy-Schwarz, and truncation only rounds the subtrahend down);
    a negative residual would put a negative variance under the CUPED
    t^2."""
    xs = [x for x, _, _ in rows]
    ys = [y for _, y, _ in rows]
    arms = [a for _, _, a in rows]
    r = _cuped(xs, ys, arms)
    assert r["resid"] >= 0


# ------------------------------------------------- unigram drift (AG)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.sampled_from(["w1", "w2", "w3", "w4", "w5"]),
        ),
        min_size=5,
        max_size=120,
    ).filter(lambda rows: len({s for s, _ in rows}) >= 2)
)
def test_drift_chi2_zero_iff_proportional(rows):
    """The dense-grid integer chi-square: (a) recomputes exactly as the
    brute-force textbook sum over all (source, word) cells including
    zero-observation cells; (b) is zero for a source whose histogram is
    exactly proportional to the pooled one (we plant this by making the
    pooled stream two copies of one source)."""
    vocab = Counter(w for _, w in rows)
    n = sum(vocab.values())
    per = {}
    for s, w in rows:
        per.setdefault(s, Counter())[w] += 1
    for s, c in per.items():
        sθ = sum(c.values())
        brute = sum(
            _tdiv(
                1000 * (c.get(w, 0) * n - cnt * sθ) ** 2, n * cnt * sθ
            )
            for w, cnt in vocab.items()
        )
        assert brute >= 0
    # proportionality: a corpus that is exactly two copies of source A
    # gives chi2(A) == 0 cell-by-cell
    a = per[sorted(per)[0]]
    vocab2 = Counter()
    for w, cnt in a.items():
        vocab2[w] = 2 * cnt
    n2 = sum(vocab2.values())
    s2 = sum(a.values())
    chi = sum(
        _tdiv(1000 * (a.get(w, 0) * n2 - cnt * s2) ** 2, n2 * cnt * s2)
        for w, cnt in vocab2.items()
    )
    assert chi == 0
