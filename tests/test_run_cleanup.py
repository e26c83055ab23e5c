"""Dangling-run cleanup (lineage/environment.py — VERDICT r12 #5;
reference ``models/_run_cleanup.py``): crashed runs older than the
horizon are trashed with their internal report/environment artifacts,
sparing environments still shared with live runs."""

import datetime

from pyspark.sql import functions as F

from lamindb_spark.lineage.context import Context
from lamindb_spark.lineage.environment import (
    attach_report,
    cleanup_dangling_runs,
)


def _later(hours=48):
    return datetime.datetime.now(datetime.timezone.utc).replace(
        tzinfo=None
    ) + datetime.timedelta(hours=hours)


def _crashed_run(lakehouse, key, tmp_path, report_name=None, env_art=None):
    ctx = Context(lakehouse).track(key, source_code=key)
    run = dict(ctx.run)
    if report_name:
        p = tmp_path / report_name
        p.write_text(f"<html>{report_name}</html>")
        attach_report(lakehouse, run, str(p))
        run = (
            lakehouse.read_raw("run").filter(F.col("id") == run["id"]).first().asDict()
        )
    if env_art is not None:
        lakehouse.save("run", [{**run, "environment_id": env_art["id"]}])
        run["environment_id"] = env_art["id"]
    # crash: never call ctx.finish()
    lakehouse.current_run_id = None
    return run


def _env_artifact(lakehouse, tmp_path, name):
    p = tmp_path / name
    # content must differ per fixture or register_artifact hash-dedups
    # the two "different" environments into one artifact
    p.write_text(f"numpy==1.0\n# {name}\n")
    saved = lakehouse.current_run_id
    lakehouse.current_run_id = None
    try:
        return lakehouse.register_artifact(
            str(p), key=f"environments/{name}", kind="__lamindb_run__"
        )
    finally:
        lakehouse.current_run_id = saved


def test_cleanup_trashes_crashed_runs_and_their_artifacts(lakehouse, tmp_path):
    env_shared = _env_artifact(lakehouse, tmp_path, "shared_env.txt")
    env_orphan = _env_artifact(lakehouse, tmp_path, "orphan_env.txt")

    crashed1 = _crashed_run(
        lakehouse, "c1.py", tmp_path, report_name="r1.html", env_art=env_orphan
    )
    crashed2 = _crashed_run(lakehouse, "c2.py", tmp_path, env_art=env_shared)

    # a FINISHED run sharing crashed2's environment
    ctx = Context(lakehouse).track("ok.py", source_code="ok")
    ok_run = dict(ctx.run)
    lakehouse.save("run", [{**ok_run, "environment_id": env_shared["id"]}])
    ctx.finish()

    out = cleanup_dangling_runs(lakehouse, older_than_hours=24, now=_later())
    assert out == {"runs": 2, "artifacts": 2}  # report + orphan env

    live_runs = {r["id"] for r in lakehouse.read("run").collect()}
    assert ok_run["id"] in live_runs
    assert crashed1["id"] not in live_runs and crashed2["id"] not in live_runs

    live_arts = {r["id"] for r in lakehouse.read("artifact").collect()}
    assert env_shared["id"] in live_arts  # still referenced by ok_run
    assert env_orphan["id"] not in live_arts
    assert crashed1["report_id"] not in live_arts


def test_cleanup_respects_horizon_and_running_now(lakehouse, tmp_path):
    _crashed_run(lakehouse, "young.py", tmp_path)
    # a fresh unfinished run inside the horizon must survive (it may
    # simply still be running)
    out = cleanup_dangling_runs(lakehouse, older_than_hours=24)
    assert out == {"runs": 0, "artifacts": 0}
    assert lakehouse.read("run").count() == 1


def test_cleanup_spares_non_run_kind_artifacts(lakehouse, tmp_path):
    # a data artifact wrongly sitting in report_id is left alone
    # (the reference asserts kind == '__lamindb_run__' before deleting)
    p = tmp_path / "data.csv"
    p.write_text("a,b\n1,2\n")
    data_art = lakehouse.register_artifact(str(p), key="d/data.csv")
    run = _crashed_run(lakehouse, "odd.py", tmp_path)
    lakehouse.save("run", [{**run, "report_id": data_art["id"]}])
    out = cleanup_dangling_runs(lakehouse, older_than_hours=24, now=_later())
    assert out == {"runs": 1, "artifacts": 0}
    assert (
        lakehouse.read("artifact").filter(F.col("id") == data_art["id"]).count() == 1
    )


def test_cleanup_permanent_removes_rows(lakehouse, tmp_path):
    run = _crashed_run(lakehouse, "gone.py", tmp_path, report_name="rep.html")
    out = cleanup_dangling_runs(
        lakehouse, older_than_hours=24, now=_later(), permanent=True
    )
    assert out == {"runs": 1, "artifacts": 1}
    assert (
        lakehouse.read_raw("run").filter(F.col("id") == run["id"]).count() == 0
    )
    assert (
        lakehouse.read_raw("artifact")
        .filter(F.col("id") == run["report_id"])
        .count()
        == 0
    )
