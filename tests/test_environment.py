"""Run environment/report artifacts + git transform provenance
(reference ``core/_track_environment.py``, ``_finish.py:97-106,
403-450``, ``core/_sync_git.py:175-192``)."""

import shutil
import subprocess

import pytest
from pyspark.sql import functions as F

from lamindb_spark.lineage.context import Context
from lamindb_spark.lineage.environment import transform_reference_from_git

HAS_GIT = shutil.which("git") is not None


def _run_row(lake, run_id):
    return lake.read_raw("run").filter(F.col("id") == run_id).first().asDict()


def test_track_environment_attaches_pip_freeze(lakehouse):
    ctx = Context(lakehouse).track(
        "pipelines/env.py", source_code="x=1", track_environment=True
    )
    run_id = lakehouse.current_run_id
    ctx.finish()
    row = _run_row(lakehouse, run_id)
    assert row["environment_id"] is not None
    env = (
        lakehouse.read_raw("artifact")
        .filter(F.col("id") == row["environment_id"])
        .first()
    )
    assert env["description"] == "requirements.txt"
    # the env artifact DESCRIBES the run — it is not a run output
    # (reference creates it with run=None, _finish.py:396)
    assert env["run_id"] is None
    # the frozen file is a real pip freeze of this interpreter
    body = open(lakehouse.artifact_path(env)).read().lower()
    assert "pyspark" in body


def test_same_environment_dedups_across_runs(lakehouse):
    c1 = Context(lakehouse).track("p/a.py", source_code="a", track_environment=True)
    r1 = lakehouse.current_run_id
    c1.finish()
    c2 = Context(lakehouse).track("p/b.py", source_code="b", track_environment=True)
    r2 = lakehouse.current_run_id
    c2.finish()
    e1 = _run_row(lakehouse, r1)["environment_id"]
    e2 = _run_row(lakehouse, r2)["environment_id"]
    assert e1 is not None and e1 == e2  # content-hash dedup reuses the artifact


def test_finish_report(lakehouse, tmp_path):
    rep = tmp_path / "report.html"
    rep.write_text("<html>done</html>")
    ctx = Context(lakehouse).track("pipelines/rep.py", source_code="x=2")
    run_id = lakehouse.current_run_id
    ctx.finish(report_path=str(rep))
    row = _run_row(lakehouse, run_id)
    assert row["report_id"] is not None
    assert row["status_code"] == 0
    art = (
        lakehouse.read_raw("artifact")
        .filter(F.col("id") == row["report_id"])
        .first()
    )
    assert art["suffix"] == ".html"


@pytest.fixture()
def git_repo(tmp_path):
    if not HAS_GIT:
        pytest.skip("git binary unavailable")
    repo = tmp_path / "repo"
    repo.mkdir()

    def g(*args):
        subprocess.run(["git", *args], cwd=repo, check=True, capture_output=True)

    g("init", "-q")
    g("config", "user.email", "t@example.com")
    g("config", "user.name", "t")
    g("remote", "add", "origin", "git@example.com:org/proj.git")
    (repo / "train.py").write_text("print('train')\n")
    g("add", "train.py")
    g("commit", "-qm", "add train script")
    return repo


def test_git_reference_format(git_repo):
    ref = transform_reference_from_git(str(git_repo / "train.py"))
    assert ref is not None
    url, rtype = ref
    assert rtype == "url"
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=git_repo, capture_output=True, text=True
    ).stdout.strip()
    assert url == f"https://example.com/org/proj/blob/{commit}/train.py"


def test_git_reference_untracked_and_outside(git_repo, tmp_path):
    (git_repo / "scratch.py").write_text("tmp")
    assert transform_reference_from_git(str(git_repo / "scratch.py")) is None
    out = tmp_path / "plain" / "f.py"
    out.parent.mkdir()
    out.write_text("x")
    assert transform_reference_from_git(str(out)) is None


def test_track_sync_git_stamps_transform(lakehouse, git_repo):
    ctx = Context(lakehouse).track(
        "repo/train.py", source_path=str(git_repo / "train.py"), sync_git=True
    )
    ctx.finish()
    tf = (
        lakehouse.read_raw("transform")
        .filter(F.col("key") == "repo/train.py")
        .first()
    )
    assert tf["reference_type"] == "url"
    assert "/blob/" in tf["reference"]
    assert tf["source_code"] == "print('train')\n"
    # re-track of the same source reuses the transform, reference kept
    ctx2 = Context(lakehouse).track(
        "repo/train.py", source_path=str(git_repo / "train.py"), sync_git=True
    )
    ctx2.finish()
    n = (
        lakehouse.read_raw("transform")
        .filter(F.col("key") == "repo/train.py")
        .count()
    )
    assert n == 1
