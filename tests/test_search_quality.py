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
