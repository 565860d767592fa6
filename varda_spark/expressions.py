"""Sample-selection expression DSL → Spark Column (SURVEY.md §2.B3).

Public varda (`varda/expressions.py` [P]) exposes a tiny boolean language
(pyparsing-based) for annotation queries: select the set of samples whose
observations feed a frequency computation, e.g. ``sample:GONL and not
public`` or ``*`` for everything. We re-implement the same capability as an
~80-line recursive-descent parser producing a pyspark Column predicate over
the `samples` dimension — which Catalyst then folds into the plan like any
hand-written filter (so at scale the selection prunes the broadcast dim,
never the fact table directly).

Grammar:
    expr    := term (('or'|'OR') term)*
    term    := factor (('and'|'AND') factor)*
    factor  := 'not' factor | '(' expr ')' | atom
    atom    := '*' | 'sample:' NAME | 'public' | 'pooled' | 'covered'
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_TOKEN = re.compile(r"\s*(\(|\)|\*|and\b|or\b|not\b|sample:[^\s()]+|public\b|pooled\b|covered\b)", re.I)


class ExpressionError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise ExpressionError(f"bad token at: {text[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ExpressionError("unexpected end of expression")
        self.i += 1
        return t

    def expr(self) -> Column:
        c = self.term()
        while (p := self.peek()) and p.lower() == "or":
            self.next()
            c = c | self.term()
        return c

    def term(self) -> Column:
        c = self.factor()
        while (p := self.peek()) and p.lower() == "and":
            self.next()
            c = c & self.factor()
        return c

    def factor(self) -> Column:
        t = self.peek()
        if t is None:
            raise ExpressionError("unexpected end of expression")
        if t.lower() == "not":
            self.next()
            return ~self.factor()
        if t == "(":
            self.next()
            c = self.expr()
            if self.next() != ")":
                raise ExpressionError("expected ')'")
            return c
        return self.atom()

    def atom(self) -> Column:
        t = self.next()
        tl = t.lower()
        if t == "*":
            return F.lit(True)
        if tl.startswith("sample:"):
            return F.col("name") == F.lit(t[len("sample:"):])
        if tl == "public":
            return F.col("public")
        if tl == "pooled":
            return F.col("pool_size") > 1
        if tl == "covered":
            return F.col("coverage_profile")
        raise ExpressionError(f"unknown atom {t!r}")


def compile_selection(text: str) -> Column:
    """Compile a selection expression to a boolean Column over `samples`."""
    p = _Parser(_tokenize(text))
    c = p.expr()
    if p.peek() is not None:
        raise ExpressionError(f"trailing tokens: {p.toks[p.i:]}")
    return c
