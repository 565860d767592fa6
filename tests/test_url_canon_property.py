"""Property + seeded-corpus tests for the shared URL canonicalizer.

operators/text.py keeps ONE step list (_URL_STEPS) with two emitters —
canonical_url (Spark Column) and canonical_url_duckdb (oracle SQL). These
tests prove both against an independent urllib-style PYTHON MODEL that
parses components instead of chaining regexes:

- hypothesis drives model == DuckDB over randomized URL shapes (leading /
  trailing / only-utm queries, every www case combo, odd ports, empty
  paths, bare '?') — cheap, no Spark roundtrip per example;
- one seeded 400-URL corpus proves Spark == DuckDB == model three-way.

Generator constraint (documented in the key's docstring): path segments
and param values avoid '&', '?', '#' — the step chain operates on the
whole string, so a '&utm_x=' sequence INSIDE a path would be eaten where
a component-wise parser keeps it. Real-world canonicalizers make the same
assumption (RFC 3986 reserves those characters as delimiters).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from varda_spark.operators.text import canonical_url, canonical_url_duckdb


def _is_utm(param: str) -> bool:
    """Matches the step chain's utm_[a-z]+=[^&#]* shape exactly."""
    if "=" not in param:
        return False
    name = param.split("=", 1)[0]
    return (
        name.startswith("utm_")
        and len(name) > 4
        and name[4:].isalpha()
        and name[4:].islower()
    )


def canonical_url_model(url: str) -> str:
    """Component-wise (urllib-style) model of the canonicalization."""
    u = url.split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
        if scheme.isalpha():
            u = "https://" + rest
    assert u.startswith("https://")
    rest = u[len("https://"):]
    cut = min([i for i in (rest.find("/"), rest.find("?")) if i >= 0],
              default=len(rest))
    host, tail = rest[:cut], rest[cut:]
    if host[:4].lower() == "www.":
        host = host[4:]
    if host.endswith(":80"):
        host = host[:-3]
    elif host.endswith(":443"):
        host = host[:-4]
    host = host.lower()
    if "?" in tail:
        path, query = tail.split("?", 1)
        kept = [p for p in query.split("&") if not _is_utm(p)]
        # the chain collapses an all-utm query to nothing; a bare '?'
        # (empty query) also vanishes via the dangling-? step
        tail = path + ("?" + "&".join(kept) if any(kept) else "")
    # trailing cleanup is ONE anchored application: '/?' (both), then
    # a lone '?' or '/'
    if tail.endswith("/?"):
        tail = tail[:-2]
    elif tail.endswith(("?", "/")):
        tail = tail[:-1]
    return "https://" + host + tail


SAFE = "abcdefghijklmnopqrstuvwxyz0123456789"


def _mk_url(rng: random.Random) -> str:
    scheme = rng.choice(["http", "https", "HTTP", "Http", "ftp", "HtTpS"])
    www = rng.choice(["", "www.", "WWW.", "Www.", "wWw."])
    labels = [
        "".join(rng.choices(SAFE, k=rng.randint(1, 8)))
        for _ in range(rng.randint(1, 3))
    ]
    host = ".".join(labels)
    if rng.random() < 0.3:
        host = host.upper()
    port = rng.choice(["", ":80", ":443", ":8080", ":8443"])
    segs = [
        "".join(rng.choices(SAFE + "-.", k=rng.randint(1, 6)))
        for _ in range(rng.randint(0, 3))
    ]
    path = "".join("/" + s for s in segs)
    if segs and rng.random() < 0.4:
        path += "/"
    params = []
    for _ in range(rng.randint(0, 4)):
        if rng.random() < 0.5:
            name = "utm_" + "".join(rng.choices("abcdefgh", k=rng.randint(1, 6)))
        else:
            name = "".join(rng.choices("abcde", k=rng.randint(1, 5)))
        val = "".join(rng.choices(SAFE, k=rng.randint(0, 4)))
        params.append(f"{name}={val}" if rng.random() < 0.9 else name)
    query = ""
    if params:
        query = "?" + "&".join(params)
    elif rng.random() < 0.1:
        query = "?"  # bare '?', must vanish
    frag = "#" + "".join(rng.choices(SAFE, k=rng.randint(0, 5))) \
        if rng.random() < 0.3 else ""
    return f"{scheme}://{www}{host}{port}{path}{query}{frag}"


def _duck_canon(urls: list[str]) -> list[str]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS url)", [urls]
    )
    expr = canonical_url_duckdb("url")
    return [r[0] for r in con.sql(f"SELECT {expr} FROM t").fetchall()]


@given(seed=st.integers(0, 10**9))
@settings(max_examples=60, deadline=None)
def test_model_equals_duckdb_on_random_urls(seed):
    rng = random.Random(seed)
    urls = [_mk_url(rng) for _ in range(25)]
    assert _duck_canon(urls) == [canonical_url_model(u) for u in urls]


def test_model_pins_edge_cases():
    cases = {
        "HTTP://WWW.A.COM:80/x/?utm_a=1": "https://a.com/x",
        "http://a.com?utm_a=1&utm_b=&k=2": "https://a.com?k=2",
        "http://a.com?utm_a=1&utm_b=2": "https://a.com",
        "http://a.com:8080/p#frag": "https://a.com:8080/p",
        "ftp://Www.B.org:443": "https://b.org",
        "http://a.com?": "https://a.com",
        "http://a.com/?": "https://a.com",
        "http://a.com?UTM_A=1": "https://a.com?UTM_A=1",  # [a-z]+ only
        "http://a.com?utm_=1": "https://a.com?utm_=1",    # needs a name
    }
    for raw, want in cases.items():
        assert canonical_url_model(raw) == want, raw
    assert _duck_canon(list(cases)) == list(cases.values())


def test_spark_duckdb_model_threeway_seeded_corpus(spark):
    rng = random.Random(0)
    urls = [_mk_url(rng) for _ in range(400)]
    model = [canonical_url_model(u) for u in urls]
    assert _duck_canon(urls) == model
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == model
