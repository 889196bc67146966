"""Compile the reference's dict-based query language to Catalyst predicates.

The reference expresses queries as ``list[dict]`` — one dict per query,
with three predicate forms (lcc/db_tier/TAP_query.py:116-171,
README.md:238-241):

- ``{"col": value}``          → equality
- ``{"col": (lo, hi)}``       → BETWEEN (inclusive)
- ``{"col": "<5"}`` / ``">…"`` / ``"=…"`` → raw comparison
- ``{"ra": .., "dec": .., "delta": ..[, "nearest": True]}`` → cone search
  (handled by ``operators/cone_search.py``, not here)

Compiling these to ``Column`` expressions makes every predicate visible
to Catalyst — pushed into the parquet scan, used for partition pruning —
instead of being applied per-object in Python like the reference.
A query *list* is a disjunction of its per-dict conjunctions.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

CONE_KEYS = {"ra", "dec", "delta", "nearest"}


def compile_condition(col: str, value: Any) -> Column:
    """One predicate: the three forms of TAP_query.py:116-171, plus the
    Kepler connector's ``"lo..hi"`` range token (kepler.py:111-146)."""
    c = F.col(col)
    if isinstance(value, (tuple, list)) and len(value) == 2:
        return c.between(F.lit(value[0]), F.lit(value[1]))
    if isinstance(value, str) and ".." in value:
        lo, _, hi = value.partition("..")
        try:
            return c.between(F.lit(float(lo)), F.lit(float(hi)))
        except ValueError:
            pass  # not numeric — fall through to the comparison forms
    if isinstance(value, str) and value[:1] in ("<", ">", "=", "!"):
        # two-char operators first: '>=5' must not parse as '>' '=5'
        # (a string literal that ANSI mode fails to cast at runtime)
        if value[:2] in (">=", "<=", "!="):
            op, raw = value[:2], value[2:].strip()
        elif value[:1] == "!":
            return c == F.lit(value)  # bare '!' is not an operator
        else:
            op, raw = value[0], value[1:].strip()
        try:
            lit: Any = float(raw) if "." in raw or "e" in raw.lower() else int(raw)
        except ValueError:
            lit = raw
        if op == "<":
            return c < F.lit(lit)
        if op == ">":
            return c > F.lit(lit)
        if op == "<=":
            return c <= F.lit(lit)
        if op == ">=":
            return c >= F.lit(lit)
        if op == "!=":
            return c != F.lit(lit)
        return c == F.lit(lit)
    return c == F.lit(value)


def compile_query(query: Mapping[str, Any]) -> Column | None:
    """Conjunction of one query dict's predicates (cone keys excluded)."""
    cond: Column | None = None
    for col, value in query.items():
        if col in CONE_KEYS:
            continue
        p = compile_condition(col, value)
        cond = p if cond is None else (cond & p)
    return cond


def apply_queries(df: DataFrame, queries: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Disjunction across query dicts — the reference's per-query loop
    (lcc/db_tier/base_query.py:33-36) collapsed into a single scan with an
    OR-of-ANDs predicate Catalyst can push down."""
    if not queries:
        # an empty DISJUNCTION matches nothing (the reference's loop
        # over zero queries yields zero results) — returning the full
        # table here silently processed the entire corpus
        return df.filter(F.lit(False))
    disj: Column | None = None
    for q in queries:
        c = compile_query(q)
        if c is None:
            return df  # an unconstrained query matches everything
        disj = c if disj is None else (disj | c)
    return df if disj is None else df.filter(disj)


def range_predicate(ranges: Mapping[str, tuple[float | None, float | None]]) -> Column:
    """CustomDecider's boundary filter
    (lcc/stars_processing/deciders/custom_decider.py:43-78): conjunction of
    per-column open/half-open ranges; ``None`` bound = unbounded side."""
    cond: Column | None = None
    for col, (lo, hi) in ranges.items():
        c = F.col(col)
        if lo is not None and hi is not None:
            p = (c > F.lit(lo)) & (c < F.lit(hi))
        elif lo is not None:
            p = c > F.lit(lo)
        elif hi is not None:
            p = c < F.lit(hi)
        else:
            continue
        cond = p if cond is None else (cond & p)
    if cond is None:
        return F.lit(True)
    return cond
