"""Notes blocks (reference ``models/block.py``): standalone +
attached, readme versioning vs append-only comments."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_readme_versions_per_entity(lakehouse):
    art = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="t/n.parquet")
    b1 = lakehouse.add_block(
        "# Nations\nraw table", entity_kind="artifact", entity_id=art["id"]
    )
    b2 = lakehouse.add_block(
        "# Nations\nnow documented", entity_kind="artifact", entity_id=art["id"]
    )
    # same uid family, version bumped, exactly one latest head
    assert b2["uid"][:16] == b1["uid"][:16]
    assert b2["uid"] != b1["uid"]
    heads = lakehouse.blocks_for(entity_kind="artifact", entity_id=art["id"])
    rows = heads.collect()
    assert len(rows) == 1 and rows[0]["content"].endswith("now documented")
    full = lakehouse.blocks_for(
        entity_kind="artifact", entity_id=art["id"], latest_only=False
    )
    assert full.count() == 2


def test_blank_placeholder_head_is_reused(lakehouse):
    art = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="t/r.parquet")
    b1 = lakehouse.add_block("", entity_kind="artifact", entity_id=art["id"])
    b2 = lakehouse.add_block("real content", entity_kind="artifact", entity_id=art["id"])
    # reference :137-146 — a blank head is returned as-is, no new version
    assert b2["uid"] == b1["uid"]
    assert (
        lakehouse.blocks_for(
            entity_kind="artifact", entity_id=art["id"], latest_only=False
        ).count()
        == 1
    )


def test_comments_append_unversioned(lakehouse):
    run_blocks = [
        lakehouse.add_block(f"comment {i}", kind="comment", key="issue-7")
        for i in range(3)
    ]
    stems = {b["uid"][:16] for b in run_blocks}
    assert len(stems) == 3  # each comment is its own family
    assert lakehouse.blocks_for(key="issue-7", kind="comment").count() == 3


def test_anchor_threading(lakehouse):
    issue = lakehouse.add_block("# bug: nulls in keys", key="issues/12")
    c1 = lakehouse.add_block("repro attached", kind="comment", anchor_id=issue["id"])
    lakehouse.add_block("fixed in v2", kind="comment", anchor_id=issue["id"])
    thread = lakehouse.blocks_for(anchor_id=issue["id"]).collect()
    assert [r["content"] for r in thread] == ["repro attached", "fixed in v2"]
    assert c1["hash"] is not None


def test_standalone_key_readme_family(lakehouse):
    p1 = lakehouse.add_block("v1", key="pages/home")
    p2 = lakehouse.add_block("v2", key="pages/home")
    assert p2["uid"][:16] == p1["uid"][:16]
    assert lakehouse.blocks_for(key="pages/home").first()["content"] == "v2"


def test_blocks_for_kind_without_id_lists_all(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="b/n.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="b/r.parquet")
    lakehouse.add_block("n1", entity_kind="artifact", entity_id=a1["id"])
    lakehouse.add_block("n2", entity_kind="artifact", entity_id=a2["id"])
    assert lakehouse.blocks_for(entity_kind="artifact").count() == 2
    with pytest.raises(ValueError, match="requires entity_kind"):
        lakehouse.blocks_for(entity_id=a1["id"])


def test_validation(lakehouse):
    with pytest.raises(ValueError, match="kind must be"):
        lakehouse.add_block("x", kind="note")
    with pytest.raises(ValueError, match="together"):
        lakehouse.add_block("x", entity_kind="artifact")
    with pytest.raises(KeyError, match="unknown registry"):
        lakehouse.add_block("x", entity_kind="nope", entity_id=1)


def test_transform_line_anchor(lakehouse):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("p/doc.py", source_code="a=1\nb=2\n")
    tf_id = ctx.transform["id"]
    ctx.finish()
    b = lakehouse.add_block(
        "this line sets b",
        kind="comment",
        entity_kind="transform",
        entity_id=tf_id,
        line_number=2,
    )
    got = lakehouse.blocks_for(entity_kind="transform", entity_id=tf_id).first()
    assert got["line_number"] == 2
