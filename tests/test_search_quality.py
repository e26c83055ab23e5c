"""Search-quality parity: top-1 exactness for realistic lookups.

The reference asserts top-1 exact matches for a list of queries over
the bionty CellType ontology (``docs/faq/search.md:24-63``). Same
assertion style here over a small cell-type registry with synonyms —
the rank formula is the reference's (exact=200, synonym=200,
sub-phrase=10, startswith-token=8, anchors=2, contains=1).
"""

import pytest

from lamindb_spark.operators.search import search
from lamindb_spark.sources.literals import literal_table

_REGISTRY = [
    (1, "T cell", "T-cell|T lymphocyte"),
    (2, "B cell", "B-cell|B lymphocyte"),
    (3, "T cell receptor alpha chain", None),
    (4, "regulatory T cell", "Treg"),
    (5, "natural killer cell", "NK cell|NK-cell"),
    (6, "monocyte", None),
    (7, "dendritic cell", "DC"),
    (8, "plasma cell", None),
    (9, "memory B cell", None),
    (10, "hematopoietic stem cell", "HSC"),
]

_CASES = [
    ("t cell", "T cell"),               # exact (case-insensitive)
    ("T lymphocyte", "T cell"),         # synonym exact
    ("Treg", "regulatory T cell"),      # synonym exact
    ("NK cell", "natural killer cell"), # synonym beats substring matches
    ("monocyte", "monocyte"),
    ("memory b", "memory B cell"),      # prefix phrase
    ("stem cell", "hematopoietic stem cell"),
    ("receptor", "T cell receptor alpha chain"),
]


@pytest.mark.parametrize("query,expected_top1", _CASES)
def test_search_top1(spark, query, expected_top1):
    reg = literal_table(spark, _REGISTRY, ["id", "name", "synonyms"])
    got = search(reg, query, fields=["name"], synonyms_field="synonyms", limit=1).collect()
    assert got and got[0]["name"] == expected_top1, f"{query!r} → {[r['name'] for r in got]}"


# Round 10 (VERDICT r9 #6): truncate_string parity — the reference
# trims queries >5 chars to 80% length before ranking
# (query_manager.py:99-102) and adds a name-startswith bonus
# (:155-166), so long queries with noisy tails still find their row.


def test_truncate_query_lengths():
    from lamindb_spark.operators.search import truncate_query

    assert truncate_query("abcde") == "abcde"          # <=5: untouched
    assert truncate_query("abcdef") == "abcd"          # 6 -> 4 (80%)
    assert truncate_query("hematopoietic") == "hematopoie"  # 13 -> 10


def test_search_truncate_string_recovers_noisy_tail(spark):
    df = literal_table(
        spark, _REGISTRY, ["id", "name", "synonyms"]
    )
    # 'hematopoietic stem cellXYZ' (26 chars) truncates to 20 chars ->
    # 'hematopoietic stem c' which prefix-matches; untruncated finds nothing
    noisy = "hematopoietic stem cellXYZ"
    plain = search(df, noisy, fields=["name"], synonyms_field="synonyms")
    assert plain.count() == 0
    trunc = search(
        df, noisy, fields=["name"], synonyms_field="synonyms",
        truncate_string=True,
    )
    rows = trunc.collect()
    assert rows and rows[0]["name"] == "hematopoietic stem cell"
