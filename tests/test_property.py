"""Property-based tests (hypothesis): the filter compiler agrees with a
reference Python evaluation, and base62 versioning is order-preserving.

The reference repo has no property testing (SURVEY §5); these pin the
engine's two hand-written "language" layers — lookup compilation and
uid arithmetic — against independent models.
"""

import re

from hypothesis import given, settings, strategies as st

from lamindb_spark.functions.ids import decode_base62, encode_base62, increment_suffix
from lamindb_spark.operators.filters import Q, compile_filters

# --- base62 ------------------------------------------------------------


@given(st.integers(min_value=0, max_value=62**6 - 1))
def test_base62_round_trip(n):
    assert decode_base62(encode_base62(n, pad=6)) == n


@given(st.integers(min_value=0, max_value=62**4 - 2))
def test_increment_is_successor_and_ordered(n):
    s = encode_base62(n, pad=4)
    nxt = increment_suffix(s)
    assert decode_base62(nxt) == n + 1
    assert len(nxt) == 4


# --- lookup compiler vs python model -----------------------------------

_WORDS = st.text(alphabet="abcXYZ ", min_size=0, max_size=8)


def _python_lookup(op, cell, val):
    if cell is None:
        return op == "isnull" and val is True
    if op == "exact":
        return cell == val
    if op == "iexact":
        return cell.lower() == val.lower()
    if op == "contains":
        return val in cell
    if op == "icontains":
        return val.lower() in cell.lower()
    if op == "startswith":
        return cell.startswith(val)
    if op == "in":
        return cell in val
    if op == "isnull":
        return (cell is None) == val
    if op == "regex":
        return re.search(val, cell) is not None
    raise AssertionError(op)


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(st.one_of(st.none(), _WORDS), min_size=1, max_size=8),
    needle=_WORDS.filter(lambda s: s != ""),
    op=st.sampled_from(["exact", "iexact", "contains", "icontains", "startswith"]),
)
def test_compiled_lookup_matches_python(spark, rows, needle, op):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    got = sorted(
        r["s"] for r in df.filter(compile_filters(**{f"s__{op}": needle})).collect()
    )
    want = sorted(r for r in rows if r is not None and _python_lookup(op, r, needle))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=10),
    a=st.integers(min_value=-50, max_value=50),
    b=st.integers(min_value=-50, max_value=50),
)
def test_q_algebra_matches_python(spark, rows, a, b):
    df = spark.createDataFrame([(r,) for r in rows], "x long")
    pred = (Q(x__gt=a) | Q(x__lte=b)) & ~Q(x=a)
    got = sorted(r["x"] for r in df.filter(compile_filters(pred)).collect())
    want = sorted(r for r in rows if ((r > a or r <= b) and not r == a))
    assert got == want
