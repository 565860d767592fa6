"""Round-13 degenerate-data guards (ADVICE r12 items 1-2).

Cross-engine tests: each builds a crafted parquet fixture that lands in
the guard branch (constant covariate, perfectly-correlated Y, sub-n-word
documents), then runs the Spark catalog fn AND the DuckDB oracle twin on
the SAME directory and asserts frame equality — the exact divergence
class the guards exist to close (DuckDB raises div-by-zero where Spark
DIV yields NULL; Spark element_at(_w, 0) raises where DuckDB's empty
range() yields zero grams).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd

from varda_spark.catalog import REGISTRY


def _oracle(sql: str, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _compare(key: str, spark, sf_dir: str, tables: list[str]) -> pd.DataFrame:
    got = REGISTRY[key].fn(spark, sf_dir).toPandas()
    want = _oracle(REGISTRY[key].sql, sf_dir, tables)
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    assert len(g) == len(w)
    for c in cols:
        assert [*g[c].astype(object)] == [*w[c].astype(object)], c
    return g


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, day_index, user_id, value). Single-file parquet
    (pyarrow) so DuckDB's read_parquet('<dir>/events.parquet') sees the
    same layout as /root/testdata."""
    pd.DataFrame(
        {
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "ts": [
                dt.datetime(1970, 1, 1) + dt.timedelta(days=r[1], hours=1)
                for r in rows
            ],
            "user_id": pd.array([r[2] for r in rows], dtype="int64"),
            "event_type": "click",
            "value": [float(r[3]) for r in rows],
            "props": "{}",
        }
    ).to_parquet(f"{tmp_path}/events.parquet", index=False)


def test_cuped_constant_x_sentinels_cross_engine(spark, tmp_path):
    """Constant covariate (varx_num = 0): users 13 and 26 share
    user_id % 13 == 0 and have NO even-day events, so X == 0 for both.
    Pre-guard, DuckDB raised division-by-zero while Spark DIV returned
    NULL; post-guard both emit theta/var_reduction = -1, dyc = dy,
    resid = vary."""
    # day 1 (1970-01-02, epoch day 1) is ODD -> contributes to Y only
    _write_events(
        spark,
        tmp_path,
        [(1, 1, 13, 100), (2, 1, 26, 100)],
    )
    g = _compare("agg_cuped_adjust", spark, str(tmp_path), ["events"])
    r = g.iloc[0]
    assert r.theta_milli == -1
    assert r.var_reduction_ppm == -1
    assert r.dx_milli == 0
    # dyc falls back to dy: arm1 (user 13) carries the +400 plant
    assert r.effect_cuped_milli == r.effect_raw_milli == 400000


def test_cuped_perfect_correlation_resid_zero_cross_engine(spark, tmp_path):
    """y == x in the moment sense (resid_num = 0, the hypothesis
    identity case): user 2 spends 100 on an even and an odd day; user 1
    spends 500 even / 100 odd so the fixed effect + 400 plant make
    y == x per user. theta == 1000, tsq_cuped == -1 in BOTH engines."""
    _write_events(
        spark,
        tmp_path,
        [
            (1, 2, 2, 100), (2, 1, 2, 100),   # user 2: x=1100, y=1100
            (3, 2, 1, 500), (4, 1, 1, 100),   # user 1: x=1000, y=1000
        ],
    )
    g = _compare("agg_cuped_adjust", spark, str(tmp_path), ["events"])
    r = g.iloc[0]
    assert r.theta_milli == 1000
    assert r.var_reduction_ppm == 1000000
    assert r.tsq_cuped_milli == -1
    assert r.effect_cuped_milli == 0


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source)."""
    pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": [r[2] for r in rows],
            "n_chars": pd.array([len(r[1]) for r in rows], dtype="int64"),
        }
    ).to_parquet(f"{tmp_path}/documents.parquet", index=False)


def test_contamination_short_docs_cross_engine(spark, tmp_path):
    """Documents with fewer than 3 words yield ZERO trigrams instead of
    crashing Spark (pre-guard: sequence(1,0) descends to element_at 0 and
    raises 'array indices start at 1' — ADVICE r12). Doc 21 has 2 words,
    doc 22 exactly repeats panel doc 2 (a 100% leak); panel doc 1 itself
    is short, so it contributes no grams in either engine."""
    panel2 = "the quick brown fox jumps over the lazy dog"
    _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma delta", "src0"),
            (1, "tiny doc", "src0"),  # short PANEL doc
            (2, panel2, "src0"),
            (20, "nothing in common with any panel text here", "srcA"),
            (21, "two words", "srcA"),  # short CORPUS doc
            (22, panel2, "srcB"),  # full leak of panel doc 2
        ],
    )
    g = _compare(
        "qa_contamination_ngram", spark, str(tmp_path), ["documents"]
    )
    by_src = {r.source: r for _, r in g.iterrows()}
    assert by_src["srcB"].leaked_docs == 1
    assert by_src["srcB"].max_cont_ppm == 1000000
    assert by_src["srcA"].docs == 2
    assert by_src["srcA"].leaked_docs == 0


def test_ngrams_short_inputs_yield_zero_grams(spark):
    """Unit check on the shared operator: 0/1/2-word docs drop at the
    explode for n=3; a 3-word doc yields exactly one trigram."""
    from varda_spark.operators.text import ngrams

    df = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "two words"), (3, "three word doc")],
        "doc_id bigint, text string",
    )
    out = ngrams(df, n=3, out="g").select("doc_id", "g").collect()
    assert len(out) == 1
    assert out[0].doc_id == 3 and out[0].g == "three word doc"
    out2 = {r.doc_id for r in ngrams(df, n=2, out="g").collect()}
    assert out2 == {2, 3}
