"""describe_run / describe_collection (reference models/_describe.py
:340 / :306): single-JSON describes mirroring describe_artifact."""

import json

import pytest


def test_describe_run_inputs_outputs(lakehouse, tmp_path):
    from lamindb_spark.lineage.context import Context

    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    src = tmp_path / "in.csv"
    src.write_text("a\n1\n")
    inp = lakehouse.register_artifact(str(src), key="d/in.csv")

    ctx = Context(lakehouse).track("p/train.py", source_code="v1")
    run_uid = ctx.run["uid"]
    lakehouse.open_artifact("d/in.csv")  # records the input edge
    out = tmp_path / "out.csv"
    out.write_text("b\n2\n")
    outp = lakehouse.register_artifact(str(out), key="d/out.csv")
    ctx.finish()

    doc = json.loads(lakehouse.describe_run(run_uid))
    assert doc["run"]["uid"] == run_uid
    assert doc["transform"]["key"] == "p/train.py"
    assert doc["inputs"] == [inp["uid"]]
    assert doc["outputs"] == [outp["uid"]]
    assert "finished_at" in doc["run"]
    with pytest.raises(KeyError):
        lakehouse.describe_run("nope")


def test_describe_collection_members(lakehouse, tmp_path):
    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    rows = []
    for i in range(2):
        p = tmp_path / f"m{i}.csv"
        p.write_text(f"x\n{i}\n")
        rows.append(lakehouse.register_artifact(str(p), key=f"c/m{i}.csv"))
    coll = lakehouse.create_collection(
        "pair", [r["id"] for r in rows], description="two members"
    )
    doc = json.loads(lakehouse.describe_collection(coll["key"]))
    assert doc["n_members"] == 2
    assert sorted(m["key"] for m in doc["members"]) == ["c/m0.csv", "c/m1.csv"]
    assert doc["collection"]["description"] == "two members"
    with pytest.raises(KeyError):
        lakehouse.describe_collection("ghost")
