"""Compute-environment capture + git provenance for runs/transforms.

Reference:

- ``core/_track_environment.py:14-31`` ``track_python_environment`` —
  ``pip freeze`` into ``environments/run_{uid}/run_env_pip.txt``;
- ``_finish.py:403-450`` — the frozen file is registered as an
  Artifact (hash-deduped across runs with identical environments,
  description ``requirements.txt``) and linked as ``run.environment``;
- ``core/_sync_git.py:175-192`` — a transform whose source lives in a
  git repo gets ``transform.reference =
  "{repo_url}/blob/{commit}/{path}"`` with ``reference_type="url"``.

Engine mapping: the pip-freeze file goes through the standard ingest
path (``register_artifact`` already provides the reference's
same-hash-reuses-artifact semantics), and the run row records
``environment_id`` / ``report_id``. Git capture shells out to the
local ``git`` binary, best-effort: the reference resolves the commit
that CONTAINS the source blob (possibly cloning the remote); network
access is out of scope here, so the engine pins the repository HEAD —
honest provenance for committed code, and a documented divergence for
dirty trees (the reference refuses those with BlobHashNotFound).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
from typing import Any


def track_python_environment(lh, run: dict[str, Any]) -> dict[str, Any] | None:
    """Freeze the Python environment and attach it to the run.

    Returns the environment artifact row, or None when ``pip freeze``
    is unavailable (reference logs a warning and moves on,
    ``_track_environment.py:27-29``)."""
    try:
        result = subprocess.run(
            [sys.executable, "-m", "pip", "freeze"],
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if result.returncode != 0 or not result.stdout:
        return None
    with tempfile.NamedTemporaryFile(
        "wb", suffix=".txt", prefix="run_env_pip_", delete=False
    ) as fh:
        fh.write(result.stdout)
        tmp = fh.name
    try:
        art = _register_without_run(
            lh,
            tmp,
            key=f"environments/run_{run['uid']}/run_env_pip.txt",
            description="requirements.txt",
        )
    finally:
        os.unlink(tmp)
    lh.save("run", [{**run, "environment_id": art["id"]}])
    return art


def _register_without_run(lh, path: str, **kwargs: Any) -> dict[str, Any]:
    """Environment/report artifacts DESCRIBE a run; they are not its
    data outputs, so the producing-run stamp is suppressed (the
    reference creates them with run=None and
    ``artifact_silence_missing_run_warning``, ``_finish.py:396``)."""
    saved_run = lh.current_run_id
    saved_silence = lh.settings.creation.artifact_silence_missing_run_warning
    lh.current_run_id = None
    # runless-by-design: the missing-run warning would be noise here
    lh.settings.creation.artifact_silence_missing_run_warning = True
    try:
        return lh.register_artifact(path, kind="__lamindb_run__", **kwargs)
    finally:
        lh.current_run_id = saved_run
        lh.settings.creation.artifact_silence_missing_run_warning = saved_silence


def attach_report(lh, run: dict[str, Any], report_path: str) -> dict[str, Any]:
    """Register a report file and link it as ``run.report`` (reference
    ``_finish.py:97-106`` — an existing report is overwritten)."""
    suffix = os.path.splitext(report_path)[1] or ".html"
    art = _register_without_run(
        lh,
        report_path,
        key=f"environments/run_{run['uid']}/report{suffix}",
        description=f"Report of run {run['uid']}",
    )
    lh.save("run", [{**run, "report_id": art["id"]}])
    return art


def _git(args: list[str], cwd: str) -> str | None:
    try:
        out = subprocess.run(
            ["git", *args], cwd=cwd, capture_output=True, timeout=10
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    return out.stdout.decode().strip() or None


def transform_reference_from_git(path: str) -> tuple[str, str] | None:
    """Best-effort ``(reference, reference_type)`` for a source file in
    a git checkout (reference ``get_transform_reference_from_git_repo``,
    ``_sync_git.py:175-192``): ``{remote_url}/blob/{HEAD}/{repo_path}``
    with type ``"url"``. Returns None when the file is not in a git
    repo, git is unavailable, or the repo has no remote (a local-only
    repo has no resolvable URL to cite)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    commit = _git(["rev-parse", "HEAD"], d)
    if commit is None:
        return None
    relpath = _git(["ls-files", "--full-name", "--", os.path.abspath(path)], d)
    if not relpath:
        return None  # untracked file: no commit contains it
    url = _git(["config", "--get", "remote.origin.url"], d)
    if url is None:
        return None
    url = url.removesuffix(".git")
    if url.startswith("git@"):  # git@host:org/repo → https://host/org/repo
        url = "https://" + url[4:].replace(":", "/", 1)
    return f"{url}/blob/{commit}/{relpath}", "url"


def cleanup_dangling_runs(
    lh,
    older_than_hours: float = 24.0,
    now=None,
    permanent: bool = False,
) -> dict[str, int]:
    """Trash (or permanently delete) DANGLING runs — started but never
    finished, older than the horizon — together with their internal
    ``__lamindb_run__``-kind report/environment artifacts.

    The reference ships this as a cleanup entry point
    (``models/_run_cleanup.py:14`` ``main``: deletes the orphaned
    run-internal artifacts after a Run bulk delete, asserting each is
    ``kind == "__lamindb_run__"``); the engine composes it from
    ``delete_where`` + ``delete_artifact``. Two safety properties:

    - environment artifacts are HASH-DEDUPED across runs with
      identical environments (``run.environment_id`` may be shared),
      so one is removed only when NO surviving run still references
      it — deleting a crashed run must never orphan a live run's
      environment link;
    - only ``__lamindb_run__``-kind artifacts are touched, mirroring
      the reference's assert — a data artifact that somehow landed in
      a run's report_id is left alone.

    ``now`` is injectable for tests; ``permanent=True`` removes rows
    and payloads instead of trashing. Returns
    ``{"runs": n, "artifacts": n}``. Driver state is crashed-run-
    count-sized (one collect of (id, report_id, environment_id)
    triples), never table-sized.
    """
    import datetime as _dt

    from pyspark.sql import functions as F

    now = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    horizon = now - _dt.timedelta(hours=older_than_hours)
    runs = lh.read("run")
    dangling = runs.filter(
        F.col("finished_at").isNull() & (F.col("started_at") < F.lit(horizon))
    )
    rows = dangling.select("id", "report_id", "environment_id").collect()
    if not rows:
        return {"runs": 0, "artifacts": 0}
    dang_ids = [r["id"] for r in rows]
    # live references scan ALL non-trash branches (read_raw), not just
    # the caller's visible scope: register_artifact hash-dedups across
    # branches, so a sibling-branch run may share the environment — or
    # even a byte-identical report — with a crashed run here, and a
    # branch-scoped scan would delete an artifact that run still links
    # (review finding). Both link columns are checked.
    from ..catalog.lakehouse import TRASH_BRANCH_ID

    all_runs = lh.read_raw("run").filter(F.col("branch_id") != TRASH_BRANCH_ID)
    survivors = all_runs.filter(~F.col("id").isin(dang_ids))
    live_refs = {
        r["ref"]
        for col in ("environment_id", "report_id")
        for r in survivors.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("ref"))
        .distinct()
        .collect()
    }
    candidates: set[int] = set()
    for r in rows:
        for ref in (r["report_id"], r["environment_id"]):
            if ref is not None and ref not in live_refs:
                candidates.add(ref)
    art_ids = [
        r["id"]
        for r in lh.read("artifact")
        .filter(
            F.col("id").isin(list(candidates))
            & (F.col("kind") == "__lamindb_run__")
        )
        .select("id")
        .collect()
    ]
    for aid in art_ids:
        lh.delete_artifact(aid, permanent=permanent, storage=permanent)
    lh.delete_where("run", dangling, permanent=permanent)
    return {"runs": len(dang_ids), "artifacts": len(art_ids)}
