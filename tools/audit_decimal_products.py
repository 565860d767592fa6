"""Decimal-overflow audit (VERDICT r12 item 7 — the tpch_q1 class).

Spark's DECIMAL multiply widens precision to p1+p2+1: one
(18,4) x (18,4) product fits precision 38 (37,8), but a THIRD decimal
factor pushes past 38 and Spark reconciles by scale-truncation while
DuckDB's HUGEINT-backed arithmetic keeps exact digits — a silent 1-ULP
divergence that only appears once the values are large enough (tpch_q1
diverged from sf~0.3, invisible at sf0.01; fixed in commit 5f0b48f with
a lossless DECIMAL(18,8) interior anchor).

This tool greps every registry key's DuckDB oracle SQL AND its Spark
function source for chained multiplications with >= 3 factors where at
least one factor is decimal-typed (dec()/DECIMAL casts/price-discount
columns), skipping chains already protected by an interior anchor cast.
Findings are candidates, not verdicts — each must be value-checked at
sf1/sf5 via tools/check_oracle.py --sf-dir (the committed sweeps) or
justified in its docstring.

Integer DECIMAL(38,0)/HUGEINT moment products (e.g. agg_cuped_adjust's
t^2 numerator) are a DIFFERENT class: both engines compute them exactly
until saturation, and their headroom bounds are documented per-key.
This audit targets fractional-scale chains where the two engines
RECONCILE the result scale differently below any saturation point.
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, ".")

from varda_spark.catalog import REGISTRY  # noqa: E402

# A "decimal factor" in this codebase: dec(col[, scale]) helper, an
# explicit DECIMAL(p,s>0) cast, or the TPC-H price/discount/tax columns
# (always routed through dec() in this repo's idiom).
DEC_TOKEN = re.compile(
    r"dec\(|DECIMAL\(\s*\d+\s*,\s*[1-9]|decimal\(\s*\d+\s*,\s*[1-9]"
    r"|l_extendedprice|l_discount|l_tax|ps_supplycost|o_totalprice"
    r"|p_retailprice|s_acctbal|c_acctbal|value",
    re.IGNORECASE,
)

# An interior anchor: an explicit decimal cast BETWEEN multiplies
# (CAST(a * b AS DECIMAL(p,s)) * c is safe — the anchor re-bases
# precision before the third factor).
ANCHOR = re.compile(
    r"CAST\([^()]*\*[^()]*AS\s+DECIMAL\(\s*1?\d\s*,", re.IGNORECASE
)


def chained_factors(expr: str) -> int:
    """Max run of top-level '*' factors inside one parenthesis depth.

    Cheap lexical proxy: count '*' that are multiplication between
    non-space tokens on a single physical expression line; '**' and
    'SELECT *' are excluded by requiring both neighbors alnum/paren.
    """
    best, run = 1, 1
    i = 0
    depth_at_run = None
    depth = 0
    while i < len(expr):
        ch = expr[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth_at_run is not None and depth < depth_at_run:
                run, depth_at_run = 1, None
        elif ch in "+-,/%" and depth_at_run is not None and depth == depth_at_run:
            # additive/divisive operator at the run's own depth ends the
            # multiplicative chain (a*b + c*d is two 2-factor products)
            run, depth_at_run = 1, None
        elif ch == "*":
            prev = expr[:i].rstrip()[-1:] if expr[:i].rstrip() else ""
            nxt = expr[i + 1:].lstrip()[:1] if expr[i + 1:].lstrip() else ""
            if prev in ")" or prev.isalnum():
                if nxt == "(" or nxt.isalnum():
                    if depth_at_run is None:
                        depth_at_run = depth
                    run += 1
                    best = max(best, run)
        i += 1
    return best


def scan_text(name: str, kind: str, text: str) -> list[str]:
    finds = []
    for ln, line in enumerate(text.splitlines(), 1):
        if "*" not in line or not DEC_TOKEN.search(line):
            continue
        if chained_factors(line) >= 3 and not ANCHOR.search(line):
            finds.append(f"{name} [{kind}:{ln}] {line.strip()[:120]}")
    return finds


def main() -> int:
    hits: list[str] = []
    for name, entry in REGISTRY.items():
        if entry.sql:
            hits += scan_text(name, "oracle", entry.sql)
        try:
            hits += scan_text(name, "spark", inspect.getsource(entry.fn))
        except OSError:
            pass
    print(f"candidates with >=3 chained decimal factors: {len(hits)}")
    for h in hits:
        print("  " + h)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
