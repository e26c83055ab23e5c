"""Lineage: track/finish, auto run-input edges, ancestor closure
(reference core/_context.py, artifact.py:3783, has_parents.py:527)."""

from pyspark.sql import functions as F

from lamindb_spark.lineage.context import Context, artifact_ancestors
from tests.conftest import SF_DIR


def test_track_creates_transform_and_run(lakehouse):
    ctx = Context(lakehouse).track("p/one.py", source_code="code-v1", params={"lr": 0.1})
    assert ctx.transform["key"] == "p/one.py"
    run = lakehouse.read_raw("run").first()
    assert run["status_code"] == 1 and run["params"] == '{"lr": 0.1}'
    ctx.finish()
    run = lakehouse.read_raw("run").first()
    assert run["status_code"] == 0 and run["finished_at"] is not None
    assert lakehouse.current_run_id is None


def test_same_source_reuses_transform(lakehouse):
    c1 = Context(lakehouse).track("p/a.py", source_code="same")
    c1.finish()
    c2 = Context(lakehouse).track("p/a.py", source_code="same")
    c2.finish()
    assert lakehouse.read_raw("transform").count() == 1
    # changed source on the same key → new version in the same family
    c3 = Context(lakehouse).track("p/a.py", source_code="changed")
    c3.finish()
    tfs = lakehouse.read_raw("transform").orderBy("id").collect()
    assert len(tfs) == 2
    assert tfs[0]["uid"][:12] == tfs[1]["uid"][:12]


def test_run_input_tracking_and_ancestors(lakehouse, spark):
    # run 1: ingest raw → out1
    ctx1 = Context(lakehouse).track("p/step1.py", source_code="s1")
    raw = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="raw.parquet")
    df = lakehouse.open_artifact(raw["uid"])  # records run input
    out1 = lakehouse.save_dataframe(df.limit(5), key="out1.parquet")
    ctx1.finish()
    # run 2: out1 → out2
    ctx2 = Context(lakehouse).track("p/step2.py", source_code="s2")
    df2 = lakehouse.open_artifact(out1["uid"])
    out2 = lakehouse.save_dataframe(df2.limit(2), key="out2.parquet")
    ctx2.finish()

    bridges = lakehouse.read_raw("run_input_artifacts").collect()
    assert len(bridges) >= 2
    anc = {r["id"]: r["depth"] for r in artifact_ancestors(lakehouse, out2["id"]).collect()}
    assert anc.get(out1["id"]) == 1
    assert anc.get(raw["id"]) == 2  # three-hop chain resolved by closure


def test_tracked_decorator_records_run_and_params(lakehouse):
    from pyspark.sql import functions as F

    from lamindb_spark.lineage.context import tracked

    @tracked(lakehouse, key="pipeline/step1")
    def step(x, threshold=0.5):
        return x * 2

    assert step(3, threshold=0.9) == 6
    run = lakehouse.read("run").orderBy(F.desc("id")).first()
    assert run["status_code"] == 0 and run["finished_at"] is not None
    import json as _json

    assert _json.loads(run["params"]) == {"threshold": 0.9}
    tf = (
        lakehouse.read("transform")
        .filter(F.col("id") == run["transform_id"])
        .first()
    )
    assert tf["key"] == "pipeline/step1"

    @tracked(lakehouse, key="pipeline/fails")
    def boom():
        raise ValueError("x")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        boom()
    run2 = lakehouse.read("run").orderBy(F.desc("id")).first()
    assert run2["status_code"] == -1


def test_view_lineage_renders_dot(lakehouse, spark):
    """VERDICT r10 gap #2 — reference view_lineage
    (has_parents.py:254-321): DOT source with white artifact boxes,
    violet run boxes, and input→run→output edges over the walked
    closure."""
    from lamindb_spark.lineage.context import view_lineage

    ctx1 = Context(lakehouse).track("p/a.py", source_code="sa")
    raw = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="vr.parquet")
    df = lakehouse.open_artifact(raw["uid"])
    out1 = lakehouse.save_dataframe(df.limit(3), key="vo1.parquet")
    ctx1.finish()
    ctx2 = Context(lakehouse).track("p/b.py", source_code="sb")
    df2 = lakehouse.open_artifact(out1["uid"])
    out2 = lakehouse.save_dataframe(df2.limit(1), key="vo2.parquet")
    ctx2.finish()

    dot = view_lineage(lakehouse, out2["id"])
    assert dot.startswith("digraph")
    # all three artifacts and both runs appear as nodes
    for a in (raw, out1, out2):
        assert f'"artifact_{a["uid"]}"' in dot
    assert dot.count("#eff2ff") == 2  # two violet run nodes
    assert "p/a.py" in dot and "p/b.py" in dot
    # input -> run -> output chain: raw feeds run1, run1 emits out1
    assert f'"artifact_{raw["uid"]}" -> "run_' in dot
    assert f'" -> "artifact_{out1["uid"]}"' in dot
    # with_children=False from the MIDDLE artifact drops out2
    up_only = view_lineage(lakehouse, out1["id"], with_children=False)
    assert f'"artifact_{out2["uid"]}"' not in up_only
    assert f'"artifact_{raw["uid"]}"' in up_only


def test_transform_from_path_and_latest_run(lakehouse, tmp_path):
    """Reference Transform.from_path (transform.py:756-805) +
    latest_run (:926): file registration with suffix-inferred kind, no
    run opened; same source reuses, changed source bumps the family;
    latest_run returns the newest run of the latest version."""
    from lamindb_spark.lineage.context import (
        latest_run,
        transform_from_path,
    )

    script = tmp_path / "etl.py"
    script.write_text("print('v1')\n")
    t1 = transform_from_path(lakehouse, str(script))
    assert t1["key"] == "etl.py" and t1["kind"] == "script"
    assert lakehouse.read_raw("run").count() == 0  # no run opened
    # same bytes -> same transform
    assert transform_from_path(lakehouse, str(script))["uid"] == t1["uid"]
    # changed source -> new version in the family
    script.write_text("print('v2')\n")
    t2 = transform_from_path(lakehouse, str(script))
    assert t2["uid"][:12] == t1["uid"][:12] and t2["uid"] != t1["uid"]
    # notebook kind inferred
    nb = tmp_path / "analysis.ipynb"
    nb.write_text("{}")
    assert transform_from_path(lakehouse, str(nb))["kind"] == "notebook"

    # latest_run: none yet, then the run we open
    assert latest_run(lakehouse, "etl.py") is None
    ctx = Context(lakehouse).track("etl.py", source_code="print('v2')\n")
    ctx.finish()
    lr = latest_run(lakehouse, "etl.py")
    assert lr is not None
    assert lr["transform_id"] == t2["id"]  # newest version's run
    assert lr["status_code"] == 0  # finished
    assert latest_run(lakehouse, "missing.py") is None
