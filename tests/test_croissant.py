"""Croissant ingest (reference ``integrations/_croissant.py:17-148``)."""

import json

import pytest

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.integrations import curate_from_croissant
from tests.conftest import SF_DIR


def _doc(**over):
    d = {
        "@type": "Dataset",
        "name": "tpch-mini",
        "description": "two tiny tables",
        "version": "1.0.0",
        "license": "cc-by-4.0",
        "cr:projectName": "warehouse-bench",
        "distribution": [
            {"@id": f"{SF_DIR}/nation.parquet"},
            {"@id": f"{SF_DIR}/region.parquet"},
        ],
    }
    d.update(over)
    return d


def test_multi_distribution_creates_collection(lakehouse):
    res = curate_from_croissant(lakehouse, _doc())
    assert res["_kind"] == "collection"
    assert res["key"] == "tpch-mini"
    assert res["version_tag"] == "1.0.0"
    # members registered + linked
    arts = QuerySet(lakehouse, "artifact").filter(ulabels__name="cc-by-4.0")
    assert arts.count() == 2
    # license label is typed under the License type label
    lic = QuerySet(lakehouse, "ulabel").get(name="cc-by-4.0")
    typ = QuerySet(lakehouse, "ulabel").get(name="License")
    assert typ["is_type"] is True and lic["type_id"] == typ["id"]
    # project created and linked on artifacts AND the collection
    assert QuerySet(lakehouse, "artifact").filter(
        projects__name="warehouse-bench"
    ).count() == 2
    assert QuerySet(lakehouse, "collection").filter(
        projects__name="warehouse-bench"
    ).count() == 1
    assert QuerySet(lakehouse, "collection").filter(
        ulabels__name="cc-by-4.0"
    ).count() == 1


def test_single_distribution_returns_artifact(lakehouse):
    doc = _doc(distribution=[{"@id": f"{SF_DIR}/nation.parquet"}])
    res = curate_from_croissant(lakehouse, doc)
    assert res["_kind"] == "artifact"
    assert res["description"] == "tpch-mini - two tiny tables"
    assert res["version_tag"] == "1.0.0"


def test_idempotent_relink(lakehouse):
    curate_from_croissant(lakehouse, _doc())
    curate_from_croissant(lakehouse, _doc())
    from pyspark.sql import functions as F

    links = lakehouse.read_raw("artifact_ulabels").count()
    assert links == 2  # one per artifact, not duplicated on re-ingest
    assert QuerySet(lakehouse, "ulabel").filter(name="cc-by-4.0").count() == 1
    assert QuerySet(lakehouse, "project").filter(name="warehouse-bench").count() == 1


def test_license_type_ignores_plain_label_collision(lakehouse):
    # a pre-existing NON-type label named "License" must not be reused
    # as the License type (reference filters is_type=True)
    lakehouse.save("ulabel", [{"name": "License", "is_type": False}])
    curate_from_croissant(
        lakehouse, _doc(distribution=[{"@id": f"{SF_DIR}/nation.parquet"}])
    )
    types = QuerySet(lakehouse, "ulabel").filter(name="License", is_type=True)
    assert types.count() == 1
    lic = QuerySet(lakehouse, "ulabel").get(name="cc-by-4.0")
    assert lic["type_id"] == types.one()["id"]


def test_document_from_path(lakehouse, tmp_path):
    p = tmp_path / "meta.json"
    p.write_text(json.dumps(_doc(distribution=[{"@id": f"{SF_DIR}/region.parquet"}])))
    res = curate_from_croissant(lakehouse, p)
    assert res["_kind"] == "artifact"


def test_validation_errors(lakehouse):
    with pytest.raises(ValueError, match="@type"):
        curate_from_croissant(lakehouse, {"@type": "Model", "name": "x"})
    with pytest.raises(ValueError, match="name"):
        curate_from_croissant(lakehouse, {"@type": "Dataset"})
    with pytest.raises(ValueError, match="No file distributions"):
        curate_from_croissant(lakehouse, {"@type": "Dataset", "name": "x"})
    # an @id that is not an existing path falls back to contentUrl/url
    # (reference :90-98): absent → "No file path found"
    with pytest.raises(ValueError, match="No file path resolvable"):
        curate_from_croissant(
            lakehouse,
            {
                "@type": "Dataset",
                "name": "x",
                "distribution": [{"@id": "/nope/missing.parquet"}],
            },
        )
    with pytest.raises(ValueError, match="does not exist"):
        curate_from_croissant(
            lakehouse,
            {
                "@type": "Dataset",
                "name": "x",
                "distribution": [
                    {"@id": "/nope/missing.parquet",
                     "contentUrl": "/nope/also-missing.parquet"}
                ],
            },
        )
    with pytest.raises(FileNotFoundError):
        curate_from_croissant(lakehouse, "/nope/meta.json")
