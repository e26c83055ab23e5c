"""Executable quickstart — the reference's user journey end-to-end.

Mirrors lamindb's quickstart flow (docs executed as tests, SURVEY §5):
track a run, ingest a DataFrame as an artifact, re-open it lazily,
annotate with validated labels, query it back with lookups, export
wide, and inspect lineage — all through this engine's API.
"""

import json

from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.curation.validate import from_values, validate_values
from lamindb_spark.lineage.context import artifact_ancestors, track


def test_quickstart(lakehouse, spark):
    lh = lakehouse

    # 1. start a tracked run (ln.track)
    ctx = track(lh, "analysis/quickstart.py", source_code="spark quickstart",
                params={"seed": 42})

    # 2. ingest a dataframe as an artifact (Artifact.from_dataframe)
    df = spark.createDataFrame(
        [("s1", "T cell", 7.1), ("s2", "B cell", 5.5), ("s3", "T cell", 6.3)],
        "sample string, cell_type string, score double",
    )
    art = lh.save_dataframe(df, "datasets/quickstart.parquet",
                            description="quickstart dataset")
    assert art["otype"] == "DataFrame" and art["n_observations"] == 3

    # 3. same content → dedup returns the SAME artifact (hash dedup)
    again = lh.save_dataframe(df, "datasets/quickstart.parquet")
    assert again["id"] == art["id"]

    # 4. labels: get-or-create against the registry, then validate
    from_values(lh, "ulabel", ["T cell", "B cell"])
    vals = spark.createDataFrame([("T cell",), ("NK cell",)], "value string")
    flagged = {r["value"]: r["validated"]
               for r in validate_values(vals, lh.read("ulabel"), "value", "name").collect()}
    assert flagged == {"T cell": True, "NK cell": False}

    # 5. annotate the artifact with a feature value, then query via EAV
    lh.annotate("artifact", art["id"], {"species": "human"})

    # 6. lazy re-open through the catalog (records run-input lineage)
    opened = lh.open_artifact("datasets/quickstart.parquet")
    assert opened.filter(F.col("cell_type") == "T cell").count() == 2

    # 7. registry queries: filter / lookup / search / get
    qs = QuerySet(lh, "artifact")
    assert qs.filter(key__startswith="datasets/").count() == 1
    hit = qs.get(art["uid"][:8])  # uid-prefix get with latest fallback
    assert hit["id"] == art["id"]

    # 8. finish the run; lineage now links artifact → run → transform
    ctx.finish()
    doc = json.loads(lh.describe_artifact("datasets/quickstart.parquet"))
    assert doc["transform"]["key"] == "analysis/quickstart.py"
    assert doc["features"] == {"species": "human"}

    # 9. derive a second artifact in a new run → ancestor walk finds the first
    ctx2 = track(lh, "analysis/derive.py", source_code="derive")
    parent = lh.open_artifact("datasets/quickstart.parquet")  # records input
    derived = parent.groupBy("cell_type").agg(F.avg("score").alias("mean_score"))
    art2 = lh.save_dataframe(derived, "datasets/derived.parquet")
    ctx2.finish()
    anc = artifact_ancestors(lh, art2["id"])
    assert art["id"] in {r["id"] for r in anc.collect()}
