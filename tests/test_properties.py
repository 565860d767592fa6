"""Property-based tests (hypothesis) for the engine's pure-Python twins.

The Column implementations are proven equal to these twins by seeded-corpus
tests (test_variant.py, test_binning.py); hypothesis then explores the
semantic space cheaply without a Spark roundtrip per example.
"""

from hypothesis import assume, given, settings, strategies as st

from varda_spark.expressions import ExpressionError, compile_selection
from varda_spark.functions.variant import normalize_variant_py

alleles = st.text(alphabet="ACGT", min_size=0, max_size=12)


@given(pos=st.integers(1, 10**9), ref=alleles, obs=alleles)
@settings(max_examples=300, deadline=None)
def test_normalize_fixpoint_and_anchoring(pos, ref, obs):
    p2, r2, o2 = normalize_variant_py(pos, ref, obs)
    # canonical: no shared first or last character remains (unless empty)
    if r2 and o2:
        assert r2[0] != o2[0] and r2[-1] != o2[-1]
    # idempotent
    assert normalize_variant_py(p2, r2, o2) == (p2, r2, o2)
    # position advances by exactly the trimmed prefix length
    assert p2 >= pos and p2 - pos <= min(len(ref), len(obs))
    # trimming only removes characters, never adds
    assert len(r2) <= len(ref) and len(o2) <= len(obs)


@given(pos=st.integers(1, 10**6), core_r=alleles, core_o=alleles,
       prefix=alleles, suffix=alleles)
@settings(max_examples=300, deadline=None)
def test_normalize_invariant_under_shared_affixes(pos, core_r, core_o, prefix, suffix):
    """Adding the same prefix+suffix to both alleles must not change the
    normalized variant (up to the position shift of the prefix).

    This invariant only holds on the algorithm's meaningful domain: cores
    whose canonical form has BOTH alleles non-empty (substitution-like,
    differing at both ends). Outside it the property is false by nature,
    not by bug: ref==obs is not a variant (rejected at VCF ingest,
    sources/vcf.py), and an indel core can merge with the padding into a
    repeat run whose canonical anchor shifts — e.g. core ('C','') with
    prefix 'C' becomes 'CC'>'C', the same single-base deletion anchored
    leftmost. Both engines (Column + Python twins) agree on every input;
    see test_normalize_fixpoint_and_anchoring for the unconditional laws.
    """
    base = normalize_variant_py(pos + len(prefix), core_r, core_o)
    assume(base[1] != "" and base[2] != "")
    padded = normalize_variant_py(pos, prefix + core_r + suffix, prefix + core_o + suffix)
    assert padded == base


@st.composite
def dsl_expr(draw, depth=0):
    if depth > 3 or draw(st.booleans()):
        return draw(st.sampled_from(["*", "public", "pooled", "covered", "sample:GONL"]))
    kind = draw(st.sampled_from(["and", "or", "not", "paren"]))
    if kind == "not":
        return f"not {draw(dsl_expr(depth + 1))}"
    if kind == "paren":
        return f"({draw(dsl_expr(depth + 1))})"
    return f"{draw(dsl_expr(depth + 1))} {kind} {draw(dsl_expr(depth + 1))}"


# compile_selection builds Column objects, which needs an active SparkSession
# (pyspark 4 dispatches classic/connect on it) — hence the spark fixture.
@given(expr=dsl_expr())
@settings(max_examples=200, deadline=None)
def test_dsl_always_compiles(spark, expr):
    compile_selection(expr)  # must not raise for grammatical input


def test_dsl_rejects_garbage(spark):
    for bad in ["and", "sample:", "((*)", "* or", "frobnicate", ""]:
        try:
            compile_selection(bad)
            assert False, f"accepted {bad!r}"
        except ExpressionError:
            pass


# ---- interval-algebra properties (SURVEY §5: bedtools semantics) ----

from pyspark.sql import functions as F  # noqa: E402

iv_list = st.lists(
    st.tuples(st.integers(0, 150), st.integers(1, 40)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
)


def _union_mass(ivs):
    pts = set()
    for b, e in ivs:
        pts.update(range(b, e))
    return len(pts)


@given(ivs=iv_list)
@settings(max_examples=15, deadline=None)
def test_merge_intervals_disjoint_and_mass_preserving(spark, ivs):
    from varda_spark.operators.interval import merge_intervals

    df = spark.createDataFrame(
        [("c", b, e) for b, e in ivs], "chromosome string, begin long, end long"
    )
    out = sorted(
        (r.begin, r.end) for r in merge_intervals(df).collect()
    )
    # disjoint and ordered (touching intervals merge)
    for (b1, e1), (b2, e2) in zip(out, out[1:]):
        assert b2 > e1
    # union mass preserved
    assert sum(e - b for b, e in out) == _union_mass(ivs)


@given(ivs=iv_list)
@settings(max_examples=15, deadline=None)
def test_complement_covers_exactly_the_gaps(spark, ivs):
    """complement uses the module's CLOSED-interval (VCF 1-based)
    convention: gaps are [end+1, next_begin-1] between merged runs —
    compare point sets against a brute-force closed-coverage model."""
    from varda_spark.operators.interval import complement_intervals

    df = spark.createDataFrame(
        [("c", b, e) for b, e in ivs], "chromosome string, begin long, end long"
    )
    comp = sorted(
        (r.begin, r.end) for r in complement_intervals(df).collect()
    )
    covered = set()
    for b, e in ivs:
        covered.update(range(b, e + 1))  # closed
    lo, hi = min(covered), max(covered)
    expected_gap_points = set(range(lo, hi + 1)) - covered
    got_points = set()
    for b, e in comp:
        assert b <= e
        got_points.update(range(b, e + 1))
    assert got_points == expected_gap_points
