"""Independent reference checks for the round-7 batch-F additions.

Same discipline as test_round5_ops..test_round7d_ops: a numpy / plain-
Python reference that shares no SQL text with either engine, so a bug
replicated into both oracle twins still gets caught.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_fdr_bh_matches_math_comb(spark):
    """Exact sign-test p-values via math.comb (arbitrary-precision ints,
    no stepwise recurrence) + the textbook BH step-up procedure."""
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    s = li[(li.l_orderkey % 97 == 1) & (li.l_linenumber == 1)].merge(
        p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey"
    )
    # decimal(18,4) cast rounds half-up; values are exact multiples of
    # 0.01 so a plain round() agrees
    d4 = (s.l_discount * 10000).round().astype(int)
    s = s.assign(sgn=np.sign(d4 - 500)).sort_values("l_orderkey")
    rows = {}
    for brand, grp in s.groupby("p_brand"):
        g = grp.head(40)
        n = int((g.sgn != 0).sum())
        if n == 0:
            continue
        pos = int((g.sgn == 1).sum())
        k = min(pos, n - pos)
        tail = sum(math.comb(n, i) for i in range(k + 1))
        p_ppm = min(10**6, 2 * tail * 10**6 // 2**n)
        rows[brand] = (n, pos, p_ppm)
    ref = pd.DataFrame(
        [(b, *v) for b, v in rows.items()],
        columns=["brand", "n", "pos", "p_ppm"],
    ).sort_values(["p_ppm", "brand"], ignore_index=True)
    m = len(ref)
    ref["rnk"] = np.arange(1, m + 1)
    ok = ref.index[ref.p_ppm * m <= ref.rnk * 50000]
    thr = int(ref.rnk[ok].max()) if len(ok) else 0
    ref["reject"] = ref.rnk <= thr

    got = run(spark, "agg_fdr_bh").sort_values("rnk", ignore_index=True)
    assert len(got) == m and (got.m == m).all()
    pd.testing.assert_frame_equal(
        got[["brand", "n_obs", "n_pos", "p_ppm", "reject"]].reset_index(drop=True),
        ref[["brand", "n", "pos", "p_ppm", "reject"]].rename(
            columns={"n": "n_obs", "pos": "n_pos"}
        ),
        check_dtype=False,
    )


def test_pvm_bridge_reconciles_and_matches(spark):
    """Bridge effects recomputed from raw pandas groupbys; the three
    effects must reconcile to the revenue delta exactly (the mix
    residual is DEFINED as the closer)."""
    li = spark.read.parquet(f"{SF_001}/lineitem.parquet").toPandas()
    p = spark.read.parquet(f"{SF_001}/part.parquet").toPandas()
    j = li.merge(p[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    j["yr"] = pd.to_datetime(j.l_shipdate).dt.year
    j = j[j.yr.isin([1996, 1997])]
    j["cents"] = (j.l_extendedprice * 10000).round().astype("int64") * 100 // 10000
    j["units"] = j.l_quantity.round().astype("int64")
    g = j.groupby(["p_brand", "yr"]).agg(q=("units", "sum"), r=("cents", "sum"))

    got = run(spark, "agg_pvm_bridge").set_index("brand")
    for brand in got.index:
        q0, r0 = int(g.loc[(brand, 1996), "q"]), int(g.loc[(brand, 1996), "r"])
        q1, r1 = int(g.loc[(brand, 1997), "q"]), int(g.loc[(brand, 1997), "r"])
        p0, p1 = r0 * 1000 // q0, r1 * 1000 // q1
        row = got.loc[brand]
        assert (int(row.q0), int(row.q1)) == (q0, q1)
        assert (int(row.r0_cents), int(row.r1_cents)) == (r0, r1)
        # engines truncate DIV toward zero; python // floors
        def tdiv(a, b):
            return abs(a) // b * (1 if a >= 0 else -1)

        price = tdiv((p1 - p0) * q1, 1000)
        vol = tdiv((q1 - q0) * p0, 1000)
        assert int(row.price_eff_cents) == price
        assert int(row.volume_eff_cents) == vol
        assert int(row.delta_cents) == r1 - r0
        # exact reconciliation
        assert (
            int(row.price_eff_cents)
            + int(row.volume_eff_cents)
            + int(row.mix_resid_cents)
            == r1 - r0
        )


def test_adstock_matches_numpy(spark):
    """Decayed carryover recomputed with an explicit numpy loop."""
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    day = (
        o.groupby(["o_orderpriority", "d"]).cents.sum().rename("cents").reset_index()
    )
    got = run(spark, "win_adstock")
    got["d"] = pd.to_datetime(got.d).dt.date
    got = got.set_index(["prio", "d"])
    for prio, grp in day.groupby("o_orderpriority"):
        grp = grp.sort_values("d").reset_index(drop=True)
        c = grp.cents.to_numpy()
        for t in [0, 1, 5, len(grp) - 1]:
            tail = sum(
                int(c[t - j]) // (1 << j) for j in range(1, 11) if t - j >= 0
            )
            ad = int(c[t]) + tail
            row = got.loc[(prio, grp.d[t])]
            assert int(row.adstock_cents) == ad
            assert int(row.carryover_ppm) == (tail * 10**6 // ad if ad else 0)


def test_rrf_fusion_matches_numpy(spark):
    """Brute-force numpy dense + binary rankings fused by the RRF
    formula, no salting, no SQL."""
    emb = (
        spark.read.parquet(f"{SF_001}/embeddings.parquet")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    Q = np.floor(X * 1000).astype(np.int64)
    B = (X >= 0).astype(np.int64)
    got = run(spark, "sim_rrf_fusion")
    for qi in range(5):
        dots = Q @ Q[qi]
        ham = np.sum(B != B[qi], axis=1)
        mask = ids != ids[qi]
        # rank orders with vec_id tiebreak
        dorder = np.lexsort((ids[mask], -dots[mask]))
        horder = np.lexsort((ids[mask], ham[mask]))
        ra = {ids[mask][v]: r + 1 for r, v in enumerate(dorder[:10])}
        rb = {ids[mask][v]: r + 1 for r, v in enumerate(horder[:10])}
        fused = {
            v: (10**6 // (60 + ra[v]) if v in ra else 0)
            + (10**6 // (60 + rb[v]) if v in rb else 0)
            for v in set(ra) | set(rb)
        }
        top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        g = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(g.vec_id) == [v for v, _ in top]
        assert list(g.rrf_ppm) == [s for _, s in top]
        for _, r in g.iterrows():
            assert int(r.rank_dense) == ra.get(r.vec_id, 0)
            assert int(r.rank_binary) == rb.get(r.vec_id, 0)


def test_bloom_advisor_matches_float_formula(spark):
    """Integer sizing vs the real-number bloom formulas (ceil tolerance
    1 bit from the rational 9585/1000 ~ ln(1/fpp)/ln^2 2)."""
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    ym = pd.to_datetime(o.o_orderdate)
    key = ym.dt.year * 100 + ym.dt.month
    ref = o.groupby(key).o_custkey.agg(["size", "nunique"])
    got = run(spark, "store_bloom_advisor").set_index("part_ym")
    assert len(got) == len(ref)
    for part_ym, row in ref.iterrows():
        g = got.loc[part_ym]
        assert int(g.n_rows) == row["size"]
        ndv = int(row["nunique"])
        assert int(g.ndv) == ndv
        m_real = ndv * math.log(1 / 0.01) / math.log(2) ** 2
        assert abs(int(g.bloom_bits) - math.ceil(m_real)) <= max(1, ndv // 1000)
        k_real = g.bloom_bits / ndv * math.log(2)
        assert int(g.k_hashes) == round(k_real) == 7
        assert int(g.bloom_bytes) == (int(g.bloom_bits) + 7) // 8
