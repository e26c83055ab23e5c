"""Vitessce config integration (reference ``integrations/_vitessce.py``)
and the errors module surface."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.integrations import actions_for, save_vitessce_config
from tests.conftest import SF_DIR

CFG = {"version": "1.0.16", "name": "demo", "datasets": []}


def test_single_dataset_attaches_action(lakehouse):
    art = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="v/n.parquet")
    cfg = save_vitessce_config(lakehouse, CFG, dataset_uids=[art["uid"]])
    assert cfg["kind"] == "__lamindb_config__"
    assert cfg["key"].endswith(".vitessce.json")
    acts = actions_for(lakehouse, "artifact", art["id"]).collect()
    assert [a["id"] for a in acts] == [cfg["id"]]
    # the config round-trips as a dict through the loader path
    assert lakehouse.load_artifact(cfg["key"], is_run_input=False)["name"] == "demo"
    # dataset recorded as input of the save_vitessce_config run
    run_inputs = (
        lakehouse.read_raw("run_input_artifacts")
        .filter(F.col("artifact_id") == art["id"])
        .count()
    )
    assert run_inputs == 1


def test_multi_dataset_wraps_collection(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="v/n.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="v/r.parquet")
    cfg = save_vitessce_config(
        lakehouse, CFG, dataset_uids=[a1["uid"], a2["uid"]], description="two tables"
    )
    coll = (
        lakehouse.read_raw("collection").filter(F.col("key") == "two tables").first()
    )
    assert coll is not None
    acts = actions_for(lakehouse, "collection", coll["id"]).collect()
    assert [a["id"] for a in acts] == [cfg["id"]]


def test_duplicate_uids_deduped_no_collection(lakehouse):
    # one store cited by several views must NOT wrap a degenerate
    # duplicate-member collection
    art = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="v/n.parquet")
    cfg = save_vitessce_config(
        lakehouse, CFG, dataset_uids=[art["uid"], art["uid"]]
    )
    assert lakehouse.read_raw("collection").count() == 0
    assert actions_for(lakehouse, "artifact", art["id"]).count() == 1
    # action link rows are timestamped
    row = lakehouse.read_raw("actions").first()
    assert row["created_at"] is not None


def test_validation(lakehouse):
    with pytest.raises(ValueError, match="dataset_uids"):
        save_vitessce_config(lakehouse, CFG)
    with pytest.raises(ValueError, match="no dataset artifacts"):
        save_vitessce_config(lakehouse, CFG, dataset_uids=[])
    with pytest.raises(KeyError):
        save_vitessce_config(lakehouse, CFG, dataset_uids=["missing-uid"])
    with pytest.raises(TypeError, match="VitessceConfig or a plain"):
        save_vitessce_config(lakehouse, "not-a-config", dataset_uids=["x"])


def test_errors_module():
    from lamindb_spark import errors

    assert errors.ValidationError is errors.CurationError
    for name in errors.__all__:
        assert isinstance(getattr(errors, name), type)
