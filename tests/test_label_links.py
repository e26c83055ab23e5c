"""M2M label surface (VERDICT r01 #3/#4/#7): artifact↔ulabel link
table, ``ulabels__name`` relation path, ``to_dataframe(include=...)``
related-path columns, and the project/reference/user registries."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from tests.conftest import SF_DIR


@pytest.fixture()
def lake(lakehouse):
    labels = lakehouse.save(
        "ulabel",
        [
            {"name": "perturbed"},
            {"name": "control"},
            {"name": "batch-1"},
        ],
    )
    by_name = {r["name"]: r["id"] for r in labels}
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="x/nation.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="x/region.parquet")
    a3 = lakehouse.register_artifact(f"{SF_DIR}/part.parquet", key="x/part.parquet")
    lakehouse.link_labels(a1["id"], [by_name["perturbed"], by_name["batch-1"]])
    lakehouse.link_labels(a2["id"], [by_name["control"], by_name["batch-1"]])
    # a3 unlabeled
    return lakehouse, {"a1": a1, "a2": a2, "a3": a3, "labels": by_name}


def test_ulabels_name_filter(lake):
    lh, d = lake
    qs = QuerySet(lh, "artifact")
    hit = qs.filter(ulabels__name="perturbed")
    assert [r["id"] for r in hit.df().collect()] == [d["a1"]["id"]]
    both = qs.filter(ulabels__name="batch-1")
    assert both.count() == 2
    # no fanout: two labels on a1 must not duplicate its row
    multi = qs.filter(ulabels__name__in=["perturbed", "batch-1"])
    assert multi.count() == 2
    none = qs.filter(ulabels__name="missing")
    assert none.count() == 0
    # reverse path: ulabels by artifact key
    rq = QuerySet(lh, "ulabel").filter(artifacts__key__contains="nation")
    assert sorted(r["name"] for r in rq.df().collect()) == ["batch-1", "perturbed"]


def test_exclude_ulabels(lake):
    lh, d = lake
    qs = QuerySet(lh, "artifact")
    ex = qs.exclude(ulabels__name="batch-1")
    assert {r["id"] for r in ex.df().collect()} == {d["a3"]["id"]}


def test_link_labels_idempotent(lake):
    lh, d = lake
    n = lh.link_labels(d["a1"]["id"], [d["labels"]["perturbed"]])
    assert n == 0  # already linked (feature_id=None unique constraint)
    n2 = lh.link_labels(d["a1"]["id"], [d["labels"]["perturbed"]], feature_id=7)
    assert n2 == 1  # same label under a feature dimension is a new link
    names = sorted(r["name"] for r in lh.labels_for(d["a1"]["id"]).collect())
    assert names == ["batch-1", "perturbed"]


def test_to_dataframe_include(lake):
    lh, d = lake
    from lamindb_spark.lineage.context import Context

    ctx = Context(lh).track("pipe/lbl.py", source_code="s")
    a4 = lh.register_artifact(f"{SF_DIR}/supplier.parquet", key="x/supplier.parquet")
    ctx.finish()
    lh.annotate("artifact", d["a1"]["id"], {"species": "human"})
    pdf = QuerySet(lh, "artifact").to_dataframe(
        features=["species"],
        include=["ulabels__name", "run__transform__key"],
    )
    row = pdf[pdf["id"] == d["a1"]["id"]].iloc[0]
    assert list(row["ulabels__name"]) == ["batch-1", "perturbed"]
    assert row["species"] == '"human"' or row["species"] == "human"
    r4 = pdf[pdf["id"] == a4["id"]].iloc[0]
    assert r4["run__transform__key"] == "pipe/lbl.py"
    # unlabeled artifact: empty/None list, single row per entity
    assert len(pdf) == QuerySet(lh, "artifact").count()


def test_org_registries_roundtrip(lakehouse):
    proj = lakehouse.save("project", [{"name": "Atlas", "abbr": "ATL"}])[0]
    ref = lakehouse.save(
        "reference",
        [{"name": "Spark paper", "doi": "10.1145/2934664", "url": "https://example.org"}],
    )[0]
    usr = lakehouse.save("user", [{"handle": "testuser1", "name": "Test User"}])[0]
    assert len(proj["uid"]) == 12 and len(ref["uid"]) == 12 and len(usr["uid"]) == 8
    assert QuerySet(lakehouse, "project").filter(name="Atlas").count() == 1
    assert QuerySet(lakehouse, "reference").filter(doi__contains="2934664").count() == 1
    assert QuerySet(lakehouse, "user").get(handle="testuser1")["id"] == usr["id"]
    # artifact↔project link path
    a = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="p/nation.parquet")
    lakehouse._append(
        "artifact_projects",
        [{"artifact_id": a["id"], "project_id": proj["id"]}],
    )
    hit = QuerySet(lakehouse, "artifact").filter(projects__name="Atlas")
    assert [r["id"] for r in hit.df().collect()] == [a["id"]]
