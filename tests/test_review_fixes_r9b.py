"""Regression pins for the round-9 targeted review of the registry
layer (`catalog/lakehouse.py`) and streaming sink — the second
review batch (the first covered the commit protocol; see
`test_review_fixes_r9.py`). One test per finding, each reproducing
the exact reported scenario."""

import os
import time

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.lakehouse import Lakehouse, hash_file


@pytest.fixture()
def lake(spark, tmp_path):
    return Lakehouse(spark, str(tmp_path / "lake"))


def test_reregister_modified_file_lands_new_bytes(lake, tmp_path):
    """Same key, changed bytes: the new version's payload must LAND —
    the old skip-if-target-exists registered a row whose hash described
    bytes that were never copied (silent stale payload)."""
    src = tmp_path / "d.csv"
    src.write_text("a,b\n1,2\n")
    r1 = lake.register_artifact(str(src))
    src.write_text("a,b\n9,9\n")
    r2 = lake.register_artifact(str(src))
    assert r2["hash"] != r1["hash"]
    target = lake.artifact_path(r2)
    # the bytes at the key path are the NEW content
    assert hash_file(target) == r2["hash"]
    assert open(target).read() == "a,b\n9,9\n"


def test_reregister_same_bytes_is_idempotent(lake, tmp_path):
    src = tmp_path / "d.csv"
    src.write_text("a,b\n1,2\n")
    r1 = lake.register_artifact(str(src))
    r2 = lake.register_artifact(str(src))
    assert r2["uid"] == r1["uid"]  # content-hash dedup, no new version


def test_hash_dedup_scope_matches_reference(spark, tmp_path):
    """Reference parity (artifact.py:454, ``~Q(branch_id=-1)``): a hash
    hit on ANY non-trash branch satisfies dedup — the same bytes on a
    sibling work branch resolve to the existing row instead of a
    duplicate row + payload copy. A visible-scope (caller branch/main)
    hit is preferred when one exists. (Round 10 replaced the earlier
    visible-only scope this test used to pin; see
    test_lakehouse.py::test_hash_dedup_across_sibling_branches.)"""
    root = str(tmp_path / "lake")
    src = tmp_path / "d.csv"
    src.write_text("a,b\n1,2\n")
    other = Lakehouse(spark, root, current_branch_id=3)
    theirs = other.register_artifact(str(src), key="theirs.csv")
    mine = Lakehouse(spark, root, current_branch_id=2)
    row = mine.register_artifact(str(src), key="mine.csv")
    # sibling-branch hit IS returned: no duplicate row, no payload copy
    assert row["id"] == theirs["id"]
    assert row["branch_id"] == 3
    assert mine.read_raw("artifact").filter(
        F.col("hash") == theirs["hash"]
    ).count() == 1
    # once a VISIBLE row with the hash exists, it wins over the sibling
    main = Lakehouse(spark, root)  # main branch (visible to everyone)
    vis = dict(theirs)
    vis["id"] = theirs["id"] + 1000
    vis["uid"] = theirs["uid"][:-4] + "zzzz"
    vis["branch_id"] = 1
    vis["key"] = "main.csv"
    main.save("artifact", [vis])
    again = mine.register_artifact(str(src), key="mine2.csv")
    assert again["branch_id"] == 1  # visible-scope hit preferred


def test_empty_file_skips_hash_dedup(spark, tmp_path):
    """Empty files all share one content hash; the reference skips the
    hash lookup for them (artifact.py:421-424) so each new empty path
    registers a NEW artifact instead of deduping to an unrelated one."""
    root = str(tmp_path / "lake")
    a = tmp_path / "empty_a.txt"
    b = tmp_path / "empty_b.txt"
    a.write_text("")
    b.write_text("")
    lake = Lakehouse(spark, root)
    ra = lake.register_artifact(str(a), key="ea.txt")
    rb = lake.register_artifact(str(b), key="eb.txt")
    assert ra["hash"] == rb["hash"]  # same content hash...
    assert ra["uid"] != rb["uid"]  # ...but distinct artifacts
    # re-registering the same empty path creates a NEW VERSION in the
    # key family (reference: with the hash lookup skipped, the key
    # lookup finds only a previous version to revise)
    ra2 = lake.register_artifact(str(a), key="ea.txt")
    assert ra2["uid"][:16] == ra["uid"][:16]  # same version family
    assert ra2["uid"] != ra["uid"]  # revised, not deduped
    assert ra2["is_latest"]


def test_relative_root_recognizes_managed_paths(spark, tmp_path):
    """A Lakehouse built with a RELATIVE root must still classify its
    own storage paths as managed (no re-copy, key keeps subdirs).
    (Relative to the driver CWD — NOT chdir'd, because the Spark
    session resolves relative paths against its launch directory.)"""
    rel = os.path.relpath(str(tmp_path / "lake"))
    lake = Lakehouse(spark, rel)  # relative root
    sub = tmp_path / "lake" / "storage" / "sub"
    sub.mkdir(parents=True)
    f = sub / "x.csv"
    f.write_text("a\n1\n")
    row = lake.register_artifact(str(f))
    assert row["key"] == os.path.join("sub", "x.csv")  # not flattened
    # managed in place: nothing copied to storage/x.csv
    assert not os.path.exists(tmp_path / "lake" / "storage" / "x.csv")


def test_open_artifact_exact_key_beats_uid_prefix(lake, tmp_path, spark):
    """A short key must not be hijacked by an unrelated artifact whose
    random uid happens to start with the key string."""
    src = tmp_path / "a.csv"
    src.write_text("c\n1\n")
    keyed = lake.register_artifact(str(src), key="a")
    # plant a LATER artifact whose uid starts with 'a'
    lake.save(
        "artifact",
        [
            {
                "uid": "a" + "Z" * 19,
                "key": "other",
                "storage_id": keyed["storage_id"],
                "suffix": ".csv",
                "kind": "dataset",
                "size": 1,
                "hash": "deadbeef",
                "is_latest": True,
            }
        ],
    )
    hit = lake.read("artifact").filter(F.col("key") == "a").first()
    assert hit is not None
    got = lake.open_artifact("a", is_run_input=False)
    # resolution picked the key='a' artifact (its payload parses)
    assert got.count() == 1 and got.columns == ["c"]


def test_view_survives_idless_registries(lake, tmp_path):
    """annotation/artifact_ulabels have created_at but no id column —
    view() previously raised UNRESOLVED_COLUMN once any existed."""
    src = tmp_path / "d.csv"
    src.write_text("a\n1\n")
    row = lake.register_artifact(str(src))
    label_id = lake.save("ulabel", [{"name": "keep"}])[0]["id"]
    lake.link_labels(row["id"], [label_id])
    out = lake.view()
    assert "artifact_ulabels" in out or "artifact" in out  # no crash


def test_save_partial_update_preserves_unsent_fields(lake, tmp_path):
    """save() with a matched uid and a PARTIAL row must merge: omitted
    columns keep stored values, created_at is not reset."""
    src = tmp_path / "d.csv"
    src.write_text("a\n1\n")
    row = lake.register_artifact(str(src), description="orig")
    time.sleep(0.01)
    lake.save("artifact", [{"uid": row["uid"], "description": "edited"}])
    got = (
        lake.read_raw("artifact").filter(F.col("uid") == row["uid"]).first().asDict()
    )
    assert got["description"] == "edited"
    assert got["key"] == row["key"]  # NOT nulled
    assert got["hash"] == row["hash"]  # NOT nulled
    assert got["created_at"] == row["created_at"]  # NOT reset


def test_persisted_registry_sees_post_write_rows(lake, tmp_path):
    """persist_registries() then a write: reads must serve the NEW
    rows (writes invalidate via refreshByPath), not the stale cache."""
    src1 = tmp_path / "one.csv"
    src1.write_text("a\n1\n")
    lake.register_artifact(str(src1))
    lake.persist_registries(["artifact"])
    assert lake.read("artifact").count() == 1
    src2 = tmp_path / "two.csv"
    src2.write_text("a\n2\n")
    row2 = lake.register_artifact(str(src2))
    assert lake.read("artifact").count() == 2  # stale cache would say 1
    assert lake.open_artifact(row2["uid"], is_run_input=False).count() == 1


def test_scoped_reconcile_keeps_version_heads_correct(lake, tmp_path):
    """The family-scoped reconcile must maintain exactly one head per
    family without touching other families."""
    a1 = tmp_path / "a.csv"
    a1.write_text("a\n1\n")
    b1 = tmp_path / "b.csv"
    b1.write_text("b\n1\n")
    ra = lake.register_artifact(str(a1), key="a.csv")
    rb = lake.register_artifact(str(b1), key="b.csv")
    time.sleep(0.01)
    a1.write_text("a\n2\n")  # new bytes, same key -> new version of A
    ra2 = lake.register_artifact(str(a1), key="a.csv")
    arts = {r["uid"]: r.asDict() for r in lake.read_raw("artifact").collect()}
    assert arts[ra2["uid"]]["is_latest"] is True
    assert arts[ra["uid"]]["is_latest"] is False  # old head demoted
    assert arts[rb["uid"]]["is_latest"] is True  # other family untouched
    assert ra2["uid"][:16] == ra["uid"][:16]  # same family stem
