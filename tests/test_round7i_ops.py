"""Independent reference checks for the round-7 batch-J additions."""

from __future__ import annotations

import numpy as np
import pandas as pd

from varda_spark.catalog import REGISTRY

SF_001 = "/root/testdata/sf0.01"


def run(spark, key, sf=SF_001):
    return REGISTRY[key].fn(spark, sf).toPandas()


def test_rowgroup_stats_matches_data(spark):
    """Footer stats cross-checked against the DATA itself: min/max/count
    recomputed from the rows each row group contains."""
    import pyarrow.parquet as pqt

    f = pqt.ParquetFile(f"{SF_001}/orders.parquet")
    got = run(spark, "store_rowgroup_stats")
    assert set(got.column_name) == {"o_orderkey", "o_custkey"}
    assert len(got) == 2 * f.metadata.num_row_groups
    offset = 0
    for rg in range(f.metadata.num_row_groups):
        tbl = f.read_row_group(rg, columns=["o_orderkey", "o_custkey"]).to_pandas()
        for col in ("o_orderkey", "o_custkey"):
            row = got[(got.row_group == rg) & (got.column_name == col)].iloc[0]
            assert int(row.num_values) == len(tbl)
            assert int(row.min_v) == int(tbl[col].min())
            assert int(row.max_v) == int(tbl[col].max())
            assert bool(row.prunable_lt_7500) == (int(tbl[col].min()) > 7500)
        offset += len(tbl)


def test_pinball_eval_matches_loop(spark):
    o = spark.read.parquet(f"{SF_001}/orders.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 10000).round().astype("int64") * 100 // 10000
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    got = run(spark, "win_pinball_eval").set_index("prio")
    for prio, grp in o.groupby("o_orderpriority"):
        daily = grp.groupby("d").cents.sum().sort_index().to_numpy()
        abs_err = pin90 = n = 0
        for t in range(len(daily)):
            hist = daily[max(0, t - 28) : t]
            if len(hist) != 28:
                continue
            f = int(np.sort(hist)[(len(hist) + 1) // 2 - 1])  # lower median
            y = int(daily[t])
            n += 1
            abs_err += abs(y - f)
            pin90 += 9 * max(y - f, 0) + max(f - y, 0)
        row = got.loc[prio]
        assert int(row.n_days) == n
        assert int(row.abs_err_cents) == abs_err
        assert int(row.mae_cents) == abs_err // n
        assert int(row.pinball90_x10) == pin90


def test_instruct_detect_matches_pandas(spark):
    d = spark.read.parquet(f"{SF_001}/documents.parquet").toPandas()
    verbs = {"write", "list", "explain", "describe", "give",
             "create", "make", "find", "show", "tell"}
    d["has_q"] = d.text.str.contains(r"\?", regex=True).astype(int)
    d["imp"] = d.text.str.strip().str.split().str[0].str.lower().isin(verbs).astype(int)
    d["colon"] = d.text.str.contains(":").astype(int)
    d["n_toks"] = d.text.str.strip().str.split().str.len()
    got = run(spark, "text_instruct_detect").set_index("source")
    for src, grp in d.groupby("source"):
        row = got.loc[src]
        assert int(row.n_docs) == len(grp)
        assert int(row.n_question) == int(grp.has_q.sum())
        assert int(row.n_imperative) == int(grp.imp.sum())
        assert int(row.n_colon) == int(grp.colon.sum())
        score = 10**6 * int(
            (grp.has_q * 400 + grp.imp * 400 + grp.colon * 200).sum()
        ) // (1000 * len(grp))
        assert int(row.instruct_score_ppm) == score
        assert int(row.avg_tokens) == int(grp.n_toks.sum()) // len(grp)
