"""Generation-expression registry for GENERATED columns.

A generated column (``operators/txlog.py`` ``TxTable.create(...,
generated=...)``) is defined by an arbitrary SQL expression — the
engine computes it at write time and enforces ``col <=> (expr)`` on
every staged file. PRUNING, however, only fires for the registered
monotone shapes below: when a query (or a keyed DML planner) carries a
predicate on the BASE column, the planner derives an implied predicate
on the GENERATED column and prunes files/partitions with it — the
public Delta "partition pruning using generated column expressions"
design (delta-io OptimizeGeneratedColumn lists the same fixed shape
registry; Iceberg's hidden-partitioning transforms are the same idea).

Shapes and the scalar transform each one implies:

========================  =======================  ==================
expression                transform of a base      derivation scope
                          value ``v``
========================  =======================  ==================
``year(b)``               ``v.year`` (int)         monotone (ranges)
``month(b)``              ``v.month`` (int)        equality/IN only
``day(b)``/``dayofmonth`` ``v.day`` (int)          equality/IN only
``hour(b)``               ``v.hour`` (int)         equality/IN only
``to_date(b)``            date part, isoformat     monotone
``cast(b as date)``       date part, isoformat     monotone
``date(b)``               date part, isoformat     monotone
``date_trunc('U', b)``    truncate to U, isoformat monotone
``trunc(b, 'U')``         truncate to U, isoformat monotone
``substring(b, 1, n)``    ``v[:n]``                monotone
``substr(b, 1, n)``       ``v[:n]``                monotone
========================  =======================  ==================

Monotone (non-decreasing) transforms map every comparator:
``b >/>= x`` implies ``g >= f(x)``, ``b </<= x`` implies
``g <= f(x)``, equality maps to equality (bounds WEAKEN — strict
comparators become inclusive on the generated side — which is exactly
the one-sided pruning contract: never skip a possible match).
Non-monotone calendar fields (month/day/hour) derive only from
equality/IN predicates.

Transforms emit values in the log's stat/partitionValue JSON domain
(ints stay ints; dates/timestamps become isoformat strings, whose
lexicographic order IS chronological order — ``txproto
.partition_scalar`` stores them the same way), so derived values
compare against recorded stats with no casts.

Stdlib-only on purpose: the plain-IO batch DataSource derives inside
the pushdown worker (``sources/txlog_batch.py``), where a pyspark
import chain would be dead weight.
"""

from __future__ import annotations

import re
from datetime import date, datetime

__all__ = ["parse_generation_expr", "GenTransform"]

_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"

_UNITS = {
    "year": "year", "yyyy": "year", "yy": "year",
    "quarter": "quarter",
    "month": "month", "mon": "month", "mm": "month",
    "week": "week",
    "day": "day", "dd": "day",
    "hour": "hour",
}


class GenTransform:
    """A recognized generation expression: ``base_col`` is the single
    column the expression reads, ``fn`` maps one base scalar into the
    generated column's stat domain (returns None when the value cannot
    be interpreted — derivation for that predicate is skipped, sound),
    ``monotone`` says whether range comparators may derive (False =
    equality/IN only). For non-monotone calendar fields ``enclosing``
    truncates a base value to the field's ENCLOSING unit (month →
    year+month, day → date, hour → date+hour): a [lo, hi] window may
    derive an equality bound only when ``enclosing(lo) == enclosing(hi)``
    — ``fn(lo) == fn(hi)`` alone admits e.g. 2023-03-05..2024-03-10
    (both month 3) and would prune partitions holding in-range rows."""

    __slots__ = ("base_col", "fn", "monotone", "enclosing")

    def __init__(self, base_col: str, fn, monotone: bool, enclosing=None):
        self.base_col = base_col
        self.fn = fn
        self.monotone = monotone
        self.enclosing = enclosing


def _temporal(v):
    """Best-effort coercion of a predicate literal to datetime; None =
    uninterpretable (derivation opts out for that predicate)."""
    if isinstance(v, datetime):
        return v
    if isinstance(v, date):
        return datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        try:
            return datetime.fromisoformat(v)
        except ValueError:
            return None
    return None


def _field(attr):
    def fn(v):
        t = _temporal(v)
        return getattr(t, attr) if t is not None else None
    return fn


def _to_date(v):
    t = _temporal(v)
    return t.date().isoformat() if t is not None else None


def _trunc(unit: str):
    def fn(v):
        t = _temporal(v)
        if t is None:
            return None
        if unit == "year":
            t = t.replace(month=1, day=1, hour=0, minute=0, second=0,
                          microsecond=0)
        elif unit == "quarter":
            t = t.replace(month=t.month - (t.month - 1) % 3, day=1,
                          hour=0, minute=0, second=0, microsecond=0)
        elif unit == "month":
            t = t.replace(day=1, hour=0, minute=0, second=0,
                          microsecond=0)
        elif unit == "week":
            t = (t.replace(hour=0, minute=0, second=0, microsecond=0)
                 .fromordinal(t.toordinal() - t.weekday()))
        elif unit == "day":
            t = t.replace(hour=0, minute=0, second=0, microsecond=0)
        elif unit == "hour":
            t = t.replace(minute=0, second=0, microsecond=0)
        return t.isoformat(sep=" ")
    return fn


def _prefix(n: int):
    def fn(v):
        return v[:n] if isinstance(v, str) else None
    return fn


def parse_generation_expr(expr: str) -> GenTransform | None:
    """Recognize one of the registered prunable shapes of a generation
    expression; None means "generation still works, derivation opts
    out" (arbitrary expressions are legal generation exprs — they just
    don't prune through the base column)."""
    s = expr.strip().rstrip(";").strip()
    # unwrap one redundant outer paren layer: (expr)
    while s.startswith("(") and s.endswith(")"):
        inner = s[1:-1].strip()
        if inner.count("(") != inner.count(")"):
            break
        s = inner

    m = re.fullmatch(
        rf"(year|month|day|dayofmonth|hour|to_date|date)\s*\(\s*"
        rf"({_IDENT})\s*\)", s, re.I)
    if m:
        fname, base = m.group(1).lower(), m.group(2)
        if fname == "year":
            return GenTransform(base, _field("year"), True)
        if fname in ("to_date", "date"):
            return GenTransform(base, _to_date, True)
        attr = {"dayofmonth": "day"}.get(fname, fname)
        return GenTransform(base, _field(attr), False,
                            enclosing=_trunc(attr))

    m = re.fullmatch(
        rf"cast\s*\(\s*({_IDENT})\s+as\s+date\s*\)", s, re.I)
    if m:
        return GenTransform(m.group(1), _to_date, True)

    m = re.fullmatch(
        rf"date_trunc\s*\(\s*'([A-Za-z]+)'\s*,\s*({_IDENT})\s*\)", s,
        re.I)
    if m:
        unit = _UNITS.get(m.group(1).lower())
        return (GenTransform(m.group(2), _trunc(unit), True)
                if unit else None)

    m = re.fullmatch(
        rf"trunc\s*\(\s*({_IDENT})\s*,\s*'([A-Za-z]+)'\s*\)", s, re.I)
    if m:
        unit = _UNITS.get(m.group(2).lower())
        # Spark's trunc() returns DATE: truncate then take the date part
        if unit is None:
            return None
        tr = _trunc(unit)

        def fn(v, _tr=tr):
            out = _tr(v)
            return out[:10] if isinstance(out, str) else None
        return GenTransform(m.group(1), fn, True)

    m = re.fullmatch(
        rf"substr(?:ing)?\s*\(\s*({_IDENT})\s*,\s*1\s*,\s*(\d+)\s*\)",
        s, re.I)
    if m:
        return GenTransform(m.group(1), _prefix(int(m.group(2))), True)
    return None
