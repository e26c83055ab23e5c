"""Empty-input edges: a fresh instance must answer every query shape
without rows present — the first thing a new deployment does."""

from pyspark.sql import functions as F

from lamindb_spark.catalog.query import Feature, QuerySet
from lamindb_spark.operators.graph import closure
from lamindb_spark.pipeline.dedup import exact_dedup, ngram_jaccard_pairs
from lamindb_spark.sources.literals import literal_table


def test_fresh_registry_queries(lakehouse):
    qs = QuerySet(lakehouse, "artifact")
    assert qs.count() == 0
    assert qs.filter(key__startswith="x").count() == 0
    assert qs.filter(Feature("missing") > 1).count() == 0
    assert qs.first() is None
    assert qs.one_or_none() is None
    assert len(qs.lookup()) == 0
    assert qs.search("anything").count() == 0


def test_closure_empty_seeds_and_edges(spark):
    edges = spark.createDataFrame([], "child_id long, parent_id long")
    seeds = spark.createDataFrame([], "id long")
    assert closure(edges, seeds).count() == 0
    seeds2 = spark.createDataFrame([(1,)], "id long")
    assert closure(edges, seeds2).count() == 0


def test_dedup_empty_and_single_doc(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty).count() == 0
    one = literal_table(spark, [(1, "just one doc")], ["doc_id", "text"])
    assert ngram_jaccard_pairs(one).count() == 0  # no pairs from one doc


def test_empty_save_and_union(lakehouse):
    assert lakehouse.save("ulabel", []) == []
    assert lakehouse.read("ulabel").count() == 0
