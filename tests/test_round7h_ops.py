"""Independent reference checks for the round-7 batch-I additions.

Plain-Python references sharing no SQL text with either engine twin.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_cusum_reset_matches_loop(spark):
    ev = spark.read.parquet(f"{SF_001}/events.parquet").toPandas()
    # nanos -> micros truncation, then date (matches read_table/DuckDB)
    ts = pd.to_datetime(ev.ts // 1000, unit="us") if ev.ts.dtype.kind == "i" \
        else pd.to_datetime(ev.ts)
    ev = ev.assign(day=ts.dt.date)
    got = run(spark, "win_cusum_reset")
    got["day"] = pd.to_datetime(got.day).dt.date
    got = got.set_index(["event_type", "day"]).sort_index()
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        ndays, total = len(daily), int(daily.sum())
        h = 3 * total
        s = 0
        for day, cnt in daily.items():
            s = max(0, s + int(cnt) * ndays - total)
            row = got.loc[(et, day)]
            assert int(row.cnt) == int(cnt)
            assert int(row.cusum_s) == s
            assert bool(row.alarm) == (s > h)
            if s > h:
                s = 0


def test_mann_kendall_matches_pairs(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    got = run(spark, "agg_mann_kendall").set_index("prio")
    for prio, grp in o.groupby("o_orderpriority"):
        x = grp.groupby("d").cents.sum().sort_index().to_numpy()
        n = len(x)
        s = int(sum(np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)))
        tie_counts = Counter(x).values()
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in tie_counts
        )
        row = got.loc[prio]
        assert int(row.n_days) == n
        assert int(row.s_stat) == s
        assert int(row.var_s_x18) == var18
        assert row.trend == (
            "increasing" if s > 0 else "decreasing" if s < 0 else "none"
        )


def test_langid_kappa_matches_sklearn_formula(spark):
    """Kappa recomputed from the operator's own confusion matrix with
    float arithmetic (formula cross-check), plus exact ppm floors."""
    from varda_spark.operators.text import language_id

    d = spark.read.parquet(f"{SF_001}/documents.parquet")
    pred = language_id(d).select("lang", "lang_pred").toPandas()
    n = len(pred)
    diag = int((pred.lang == pred.lang_pred).sum())
    rc = pred.lang.value_counts()
    cc = pred.lang_pred.value_counts()
    chance = sum(int(rc.get(c, 0)) * int(cc.get(c, 0)) for c in set(rc.index) | set(cc.index))
    got = run(spark, "text_langid_kappa").iloc[0]
    assert int(got.n) == n and int(got.n_agree) == diag
    assert int(got.po_ppm) == 10**6 * diag // n
    assert int(got.pe_ppm) == 10**6 * chance // n**2
    # engines truncate DIV toward zero (kappa is negative here);
    # python // floors, so truncate explicitly
    num = 10**6 * (diag * n - chance)
    den = n * n - chance
    assert int(got.kappa_ppm) == abs(num) // den * (1 if num >= 0 else -1)
    # sanity vs the float formula
    po, pe = diag / n, chance / n**2
    assert abs(int(got.kappa_ppm) / 1e6 - (po - pe) / (1 - pe)) < 1e-5
