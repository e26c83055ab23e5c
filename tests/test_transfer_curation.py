"""Cross-instance label/feature transfer (VERDICT r13 #2 — the
``LabelManager.add_from`` analogue, reference
``models/_label_manager.py:227-310`` + ``FeatureManager._add_from``,
``models/_feature_manager.py:2138-2210``): labels and feature
annotations follow an artifact across instances, matched on uid, and
stay queryable through the label/EAV filter surface."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.lakehouse import Lakehouse
from lamindb_spark.catalog.query import QuerySet


@pytest.fixture()
def other(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "src-lake"))


def _src_artifact(other, tmp_path, name="payload.txt"):
    p = tmp_path / name
    p.write_text("hello transfer")
    return other.register_artifact(str(p), key=f"transfer/{name}")


def test_add_labels_from_copies_typed_labels_and_feature_links(
    lakehouse, other, tmp_path
):
    art = _src_artifact(other, tmp_path)
    # typed label: 'perturbation' type -> 'DMSO' member, grouped under
    # a feature — the reference's canonical add_from fixture shape
    ltype = other.save("ulabel", [{"name": "perturbation", "is_type": True}])[0]
    dmso = other.save("ulabel", [{"name": "DMSO", "type_id": ltype["id"]}])[0]
    plain = other.save("ulabel", [{"name": "candidate"}])[0]
    feat = other.save("feature", [{"name": "treatment", "dtype_str": "cat"}])[0]
    other.link_labels(art["id"], [dmso["id"]], feature_id=feat["id"])
    other.link_labels(art["id"], [plain["id"]])

    lakehouse.transfer_from(other, "artifact", [art["uid"]])
    label_map = lakehouse.add_labels_from(other, art["uid"])
    # the map covers the linked labels AND their type-chain parents
    assert {dmso["id"], plain["id"], ltype["id"]} == set(label_map)

    # labels queryable locally through the M2M filter surface
    hits = QuerySet(lakehouse, "artifact").filter(ulabels__name="DMSO")
    assert [r["uid"] for r in hits.to_dataframe().to_dict("records")] == [art["uid"]]
    # the type parent came along, matched by uid, and type_id remapped
    local_type = (
        lakehouse.read("ulabel").filter(F.col("uid") == ltype["uid"]).first()
    )
    local_dmso = (
        lakehouse.read("ulabel").filter(F.col("uid") == dmso["uid"]).first()
    )
    assert local_type is not None and local_type["is_type"]
    assert local_dmso["type_id"] == local_type["id"]
    # the grouping feature transferred by uid and the link points at it
    local_feat = (
        lakehouse.read("feature").filter(F.col("uid") == feat["uid"]).first()
    )
    local_art = (
        lakehouse.read("artifact").filter(F.col("uid") == art["uid"]).first()
    )
    links = {
        (r["ulabel_id"], r["feature_id"])
        for r in lakehouse.read_raw("artifact_ulabels")
        .filter(F.col("artifact_id") == local_art["id"])
        .collect()
    }
    assert (local_dmso["id"], local_feat["id"]) in links

    # idempotent: a second add_from writes no new links or labels
    n_links = lakehouse.read_raw("artifact_ulabels").count()
    n_labels = lakehouse.read("ulabel").count()
    lakehouse.add_labels_from(other, art["uid"])
    assert lakehouse.read_raw("artifact_ulabels").count() == n_links
    assert lakehouse.read("ulabel").count() == n_labels


def test_add_features_from_copies_eav_annotations(lakehouse, other, tmp_path):
    art = _src_artifact(other, tmp_path)
    feat = other.save(
        "feature", [{"name": "temperature", "dtype_str": "float"}]
    )[0]
    other.annotate(
        "artifact",
        art["id"],
        {"temperature": 21.5, "assay": "scRNA-seq"},
        feature_ids={"temperature": feat["id"]},
    )

    lakehouse.transfer_from(other, "artifact", [art["uid"]])
    n = lakehouse.add_features_from(other, art["uid"])
    assert n == 2

    hits = QuerySet(lakehouse, "artifact").filter(features__temperature=21.5)
    assert [r["uid"] for r in hits.to_dataframe().to_dict("records")] == [art["uid"]]
    # feature row followed by uid; the copied row points at the LOCAL id
    local_feat = (
        lakehouse.read("feature").filter(F.col("uid") == feat["uid"]).first()
    )
    local_art = (
        lakehouse.read("artifact").filter(F.col("uid") == art["uid"]).first()
    )
    row = (
        lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_id") == local_art["id"])
            & (F.col("feature_name") == "temperature")
        )
        .first()
    )
    assert row["feature_id"] == local_feat["id"]

    # idempotent on (feature_name, value)
    assert lakehouse.add_features_from(other, art["uid"]) == 0


def test_add_features_from_remaps_label_valued_rows(lakehouse, other, tmp_path):
    """A label-valued EAV row's label_id is a SOURCE-instance id; the
    pointed-at ulabel must follow by uid and the copied row point at
    the LOCAL id."""
    art = _src_artifact(other, tmp_path, name="labeled.txt")
    lbl = other.save("ulabel", [{"name": "grade-A"}])[0]
    other._append(
        "annotation",
        [{
            "entity_kind": "artifact",
            "entity_id": art["id"],
            "feature_id": -1,
            "feature_name": "grade",
            "value_json": '"grade-A"',
            "label_kind": "ulabel",
            "label_id": lbl["id"],
            "branch_id": other.current_branch_id,
        }],
    )
    lakehouse.transfer_from(other, "artifact", [art["uid"]])
    assert lakehouse.add_features_from(other, art["uid"]) == 1
    local_lbl = (
        lakehouse.read("ulabel").filter(F.col("uid") == lbl["uid"]).first()
    )
    assert local_lbl is not None
    row = (
        lakehouse.read_raw("annotation")
        .filter(F.col("feature_name") == "grade")
        .first()
    )
    assert row["label_kind"] == "ulabel"
    assert row["label_id"] == local_lbl["id"]


def test_transfer_artifact_from_one_call(lakehouse, other, tmp_path):
    art = _src_artifact(other, tmp_path, name="combo.txt")
    lbl = other.save("ulabel", [{"name": "validated"}])[0]
    other.link_labels(art["id"], [lbl["id"]])
    other.annotate("artifact", art["id"], {"split": "train"})

    row = lakehouse.transfer_artifact_from(other, art["uid"])
    assert row["uid"] == art["uid"]
    qs = QuerySet(lakehouse, "artifact").filter(
        ulabels__name="validated", features__split="train"
    )
    assert [r["uid"] for r in qs.to_dataframe().to_dict("records")] == [art["uid"]]


def test_add_from_requires_local_row(lakehouse, other, tmp_path):
    art = _src_artifact(other, tmp_path, name="orphan.txt")
    with pytest.raises(KeyError, match="transfer the row first"):
        lakehouse.add_labels_from(other, art["uid"])
    with pytest.raises(KeyError, match="transfer the row first"):
        lakehouse.add_features_from(other, art["uid"])
    with pytest.raises(KeyError, match="no artifact with uid"):
        lakehouse.add_labels_from(other, "no-such-uid")


def test_transfer_reuses_local_row_without_overwriting(lakehouse, other):
    """Advice r14 overwrite policy: a uid already present locally is
    reused untouched — transferring the 'same' label again never
    clobbers local edits (reference add_from reuses target records)."""
    src = other.save("ulabel", [{"name": "celltype:T", "description": "src"}])[0]
    lakehouse.save(
        "ulabel",
        [{"uid": src["uid"], "name": "celltype:T (edited)", "description": "local"}],
    )
    got = lakehouse.transfer_from(other, "ulabel", [src["uid"]])
    assert len(got) == 1 and got[0]["uid"] == src["uid"]
    local = lakehouse.read("ulabel").filter(F.col("uid") == src["uid"]).first()
    assert local["name"] == "celltype:T (edited)"
    assert local["description"] == "local"
    # same policy through the typed-registry path
    id_map = lakehouse._transfer_typed_registry(other, "ulabel", [src["id"]])
    assert id_map[src["id"]] == local["id"]
    again = lakehouse.read("ulabel").filter(F.col("uid") == src["uid"]).first()
    assert again["name"] == "celltype:T (edited)"


def test_transfer_pops_instance_local_fks(lakehouse, other):
    """created_by_id/space_id index the SOURCE instance's user/space
    tables — a transferred row must not carry them verbatim."""
    src = other.save(
        "ulabel", [{"name": "fk-probe", "created_by_id": 42, "space_id": 7}]
    )[0]
    id_map = lakehouse._transfer_typed_registry(other, "ulabel", [src["id"]])
    local = (
        lakehouse.read("ulabel").filter(F.col("id") == id_map[src["id"]]).first()
    )
    assert local["created_by_id"] is None
    assert local["space_id"] is None


def test_transfer_artifact_remaps_storage_by_uid(lakehouse, other, tmp_path):
    """A transferred artifact's storage_id must resolve locally: the
    source storage row follows by uid so the payload path keeps
    working (reference registers the source storage location)."""
    art = _src_artifact(other, tmp_path, name="stor.txt")
    row = lakehouse.transfer_from(other, "artifact", [art["uid"]])[0]
    assert row["storage_id"] is not None
    src_storage = (
        other.read_raw("storage").filter(F.col("id") == art["storage_id"]).first()
    )
    local_storage = (
        lakehouse.read_raw("storage").filter(F.col("id") == row["storage_id"]).first()
    )
    assert local_storage is not None
    assert local_storage["uid"] == src_storage["uid"]
    assert local_storage["root"] == src_storage["root"]
    # the payload path resolves through the transferred storage row
    assert lakehouse.load_artifact(art["uid"]) == "hello transfer"
    # idempotent: a second transfer adds no second storage row
    n = lakehouse.read_raw("storage").count()
    lakehouse.transfer_from(other, "artifact", [art["uid"]])
    assert lakehouse.read_raw("storage").count() == n


def test_transfer_typed_registry_cycle_guard(lakehouse, other):
    """A malformed type_id cycle in the source must raise, not hang."""
    a = other.save("ulabel", [{"name": "cyc-a", "is_type": True}])[0]
    b = other.save("ulabel", [{"name": "cyc-b", "type_id": a["id"], "is_type": True}])[0]
    other.save("ulabel", [{"uid": a["uid"], "type_id": b["id"]}])  # a -> b -> a
    with pytest.raises(ValueError, match="type_id cycle"):
        lakehouse._transfer_typed_registry(other, "ulabel", [a["id"]])


def test_transfer_links_initiating_run(lakehouse, other, tmp_path):
    """docs/transfer.md: 'the run that initiated the sync is linked'
    — a transfer under an active run stamps the LOCAL artifact row
    with that run (the source run id indexes the source instance and
    is popped)."""
    from lamindb_spark.lineage.context import track

    art = _src_artifact(other, tmp_path, name="runlink.txt")
    ctx = track(lakehouse, "sync-script.py")
    try:
        row = lakehouse.transfer_from(other, "artifact", [art["uid"]])[0]
        assert row["run_id"] == lakehouse.current_run_id
    finally:
        ctx.finish()
    # without an active run the field stays unset (no phantom lineage)
    # — distinct payload: identical content would hash-dedup in the
    # source to the SAME artifact uid and reuse the row above
    p = tmp_path / "runless.txt"
    p.write_text("different payload, fresh artifact")
    art2 = other.register_artifact(str(p), key="transfer/runless.txt")
    lakehouse.transfer_from(other, "artifact", [art2["uid"]])
    stored = (
        lakehouse.read("artifact").filter(F.col("uid") == art2["uid"]).first()
    )
    assert stored["run_id"] is None


def test_transfer_restores_trashed_local_row(lakehouse, other, tmp_path):
    """Review finding r15: a uid match on a locally TRASHED row must
    not be 'reused' invisibly — the transfer restores it to the
    current branch (values untouched) so the record is queryable and
    follow-up label copies find it."""
    art = _src_artifact(other, tmp_path, name="trashme.txt")
    lbl = other.save("ulabel", [{"name": "after-restore"}])[0]
    other.link_labels(art["id"], [lbl["id"]])

    local = lakehouse.transfer_from(other, "artifact", [art["uid"]])[0]
    lakehouse.delete_artifact(local["id"])  # -> trash (branch -1)
    assert lakehouse.read("artifact").filter(
        F.col("uid") == art["uid"]
    ).count() == 0

    row = lakehouse.transfer_from(other, "artifact", [art["uid"]])[0]
    assert row["branch_id"] == lakehouse.current_branch_id
    visible = (
        lakehouse.read("artifact").filter(F.col("uid") == art["uid"]).first()
    )
    assert visible is not None and visible["id"] == local["id"]  # same row, restored
    # follow-up curation copy works against the restored row
    label_map = lakehouse.add_labels_from(other, art["uid"])
    assert lbl["id"] in label_map
