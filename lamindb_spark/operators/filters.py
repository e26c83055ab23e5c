"""Django-lookup → Spark Column compiler and Q-object algebra.

The reference exposes filtering as keyword lookups
(``field__lookup=value``) and boolean Q trees (reference
``query_set.py:1520-1584``, lookups imported at
``query_manager.py:16-25``; Q exposed at ``lamindb/__init__.py:195``).
Here every lookup compiles to a native Column expression, so the whole
predicate stays inside Catalyst — pushdown-able into the parquet scan,
no Python in the hot path.

Relation traversal (``run__transform__key="x"``) is handled one level
up by the query layer (see ``operators.joins``): the compiler receives a
``resolver`` mapping a dotted field path to a Column.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import and_, or_
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Resolver = Callable[[str], Column]


def _ci(col: Column) -> Column:
    return F.lower(col)


def _as_lit_list(value: Any) -> list:
    if isinstance(value, (list, tuple, set)):
        return list(value)
    raise TypeError(f"__in lookup requires list/tuple/set, got {type(value).__name__}")


# lookup name → (column, value) → boolean Column
# Set mirrors what the reference actually uses (SURVEY §2.2 F1).
_LOOKUPS: dict[str, Callable[[Column, Any], Column]] = {
    "exact": lambda c, v: c.isNull() if v is None else c == F.lit(v),
    "iexact": lambda c, v: _ci(c) == F.lit(str(v).lower()),
    "contains": lambda c, v: c.contains(str(v)),
    "icontains": lambda c, v: _ci(c).contains(str(v).lower()),
    "startswith": lambda c, v: c.startswith(str(v)),
    "istartswith": lambda c, v: _ci(c).startswith(str(v).lower()),
    "endswith": lambda c, v: c.endswith(str(v)),
    "iendswith": lambda c, v: _ci(c).endswith(str(v).lower()),
    "in": lambda c, v: c.isin(_as_lit_list(v)),
    "gt": lambda c, v: c > F.lit(v),
    "gte": lambda c, v: c >= F.lit(v),
    "lt": lambda c, v: c < F.lit(v),
    "lte": lambda c, v: c <= F.lit(v),
    "isnull": lambda c, v: c.isNull() if v else c.isNotNull(),
    "regex": lambda c, v: c.rlike(str(v)),
    "iregex": lambda c, v: c.rlike("(?i)" + str(v)),
    "range": lambda c, v: (c >= F.lit(v[0])) & (c <= F.lit(v[1])),
}

LOOKUP_NAMES = frozenset(_LOOKUPS)


def split_lookup(key: str) -> tuple[str, str]:
    """``"price__gte" -> ("price", "gte")``; bare key means exact.

    Only the LAST ``__`` segment may be a lookup; earlier segments are
    relation/field path (resolved by the caller).
    """
    if "__" in key:
        path, _, last = key.rpartition("__")
        if last in _LOOKUPS:
            return path, last
    return key, "exact"


def compile_lookup(key: str, value: Any, resolver: Resolver | None = None) -> Column:
    path, op = split_lookup(key)
    col = resolver(path) if resolver else F.col(path)
    return _LOOKUPS[op](col, value)


class Q:
    """Boolean predicate tree, combinable with ``& | ~`` like the
    reference's Q objects (used e.g. ``artifact_set.py:398-420``)."""

    AND = "AND"
    OR = "OR"

    def __init__(self, **kwargs: Any) -> None:
        self.children: list[Any] = list(kwargs.items())
        self.connector = self.AND
        self.negated = False

    @classmethod
    def _combine(cls, lhs: "Q", rhs: "Q", conn: str) -> "Q":
        q = cls()
        q.connector = conn
        q.children = [lhs, rhs]
        return q

    def __and__(self, other: "Q") -> "Q":
        return self._combine(self, other, self.AND)

    def __or__(self, other: "Q") -> "Q":
        return self._combine(self, other, self.OR)

    def __invert__(self) -> "Q":
        q = Q()
        q.children = [self]
        q.negated = True
        return q

    def to_column(self, resolver: Resolver | None = None) -> Column:
        parts: list[Column] = []
        for child in self.children:
            if isinstance(child, Q):
                parts.append(child.to_column(resolver))
            else:
                k, v = child
                parts.append(compile_lookup(k, v, resolver))
        if not parts:
            out = F.lit(True)
        else:
            out = reduce(and_ if self.connector == self.AND else or_, parts)
        return ~out if self.negated else out


def compile_filters(
    *qs: Q, resolver: Resolver | None = None, **kwargs: Any
) -> Column:
    """AND of positional Q objects and keyword lookups → one Column."""
    conds = [q.to_column(resolver) for q in qs]
    conds += [compile_lookup(k, v, resolver) for k, v in kwargs.items()]
    if not conds:
        return F.lit(True)
    return reduce(and_, conds)


def escape_regex(value: str) -> str:
    """Literal-escape user input before rlike (reference escapes search
    strings the same way, ``query_manager.py:106``)."""
    return re.escape(value)
