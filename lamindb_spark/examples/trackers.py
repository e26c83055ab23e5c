"""Experiment-tracker bridges — the engine's analogue of the
reference's ``examples/mlflow/__init__.py`` (``save_mlflow_features``)
and ``examples/wandb/__init__.py`` (``save_wandb_features``): thin
glue that registers a tracker run's identity as queryable RUN
features, so a lamindb run and its MLflow/W&B counterpart can always
be cross-resolved, and checkpoints published through
:class:`~lamindb_spark.integrations.checkpoints.CheckpointPublisher`
carry the link too.

The bridge is FRAMEWORK-FREE: the ``annotate_run_from_*`` helpers
duck-type the tracker's run object (attribute names below), so neither
mlflow nor wandb needs to be importable — tests drive them with plain
fakes, and real tracker objects satisfy the same attribute surface.
Feature names match the reference exactly (they are the public query
surface)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

# reference examples/mlflow/__init__.py:26-36 — names + dtypes
MLFLOW_FEATURE_TYPE = "MLflow"
MLFLOW_FEATURES: dict[str, str] = {
    "mlflow_run_id": "str",
    "mlflow_run_name": "str",
    "mlflow_experiment_id": "str",
    "mlflow_experiment_name": "str",
    "mlflow_user_id": "str",
    "mlflow_status": "str",
    "mlflow_lifecycle_stage": "str",
    "mlflow_artifact_uri": "str",
    "mlflow_start_time": "int",
    "mlflow_end_time": "int",
}

# reference examples/wandb/__init__.py:27-38 — names + dtypes
WANDB_FEATURE_TYPE = "Weights & Biases"
WANDB_FEATURES: dict[str, str] = {
    "wandb_run_id": "str",
    "wandb_run_name": "str",
    "wandb_run_entity": "str",
    "wandb_project": "str",
    "wandb_state": "str",
    "wandb_url": "str",
    "wandb_tags": "str",
    "wandb_group": "str",
    "wandb_job_type": "str",
    "wandb_timestamp": "float",
    "wandb_runtime": "float",
}


def _save_feature_family(lh, type_name: str, members: dict[str, str]) -> dict:
    """Get-or-create a type feature and its members (the reference's
    ``ln.Feature(name=..., is_type=True).save()`` + per-member saves —
    idempotent, like ``save_checkpoint_features``). Returns
    {name: feature row dict} for the members."""
    feats = lh.read_raw("feature")
    trow = feats.filter((F.col("name") == type_name) & F.col("is_type")).first()
    if trow is None:
        trow = lh.save(
            "feature",
            [{
                "name": type_name,
                "is_type": True,
                "dtype_str": f"__{type_name}__",
                "description": f"Features linking runs to {type_name} tracking",
            }],
        )[0]
        type_id = trow["id"]
    else:
        type_id = trow["id"]
    existing = {
        r["name"]: r.asDict()
        for r in lh.read_raw("feature")
        .filter(F.col("type_id") == type_id)
        .collect()  # bounded: one family's members
    }
    missing = [
        {"name": n, "dtype_str": dt, "type_id": type_id}
        for n, dt in members.items()
        if n not in existing
    ]
    if missing:
        for row in lh.save("feature", missing):
            existing[row["name"]] = row
    return {n: existing[n] for n in members}


def save_mlflow_features(lh) -> dict:
    """Register the MLflow run/experiment features (reference
    ``examples/mlflow/__init__.py:10`` ``save_mlflow_features``)."""
    return _save_feature_family(lh, MLFLOW_FEATURE_TYPE, MLFLOW_FEATURES)


def save_wandb_features(lh) -> dict:
    """Register the Weights & Biases project/run features (reference
    ``examples/wandb/__init__.py:10`` ``save_wandb_features``)."""
    return _save_feature_family(lh, WANDB_FEATURE_TYPE, WANDB_FEATURES)


def _annotate_run(lh, feats: dict, values: dict[str, Any], run_id: int | None):
    rid = run_id if run_id is not None else lh.current_run_id
    if rid is None:
        raise RuntimeError(
            "no active run to annotate — call track() first or pass run_id="
        )
    vals = {k: v for k, v in values.items() if v is not None}
    # re-annotating (e.g. after the tracker run finishes and gains an
    # end_time/state) must replace, not accumulate contradictions
    lh.deannotate("run", [rid], list(vals))
    lh.annotate(
        "run", rid, vals, feature_ids={n: f["id"] for n, f in feats.items()}
    )
    return vals


def annotate_run_from_mlflow(lh, mlflow_run, run_id: int | None = None) -> dict:
    """Annotate the (active) engine run with its MLflow counterpart's
    identity. ``mlflow_run`` duck-types ``mlflow.entities.Run`` — the
    shape ``mlflow.active_run()``/``get_run()`` return: ``.info`` with
    ``run_id, run_name, experiment_id, user_id, status,
    lifecycle_stage, artifact_uri, start_time, end_time``. The
    experiment NAME is optional (``experiment_name`` attribute on info
    or the run, else omitted). Returns the values written."""
    feats = save_mlflow_features(lh)
    info = getattr(mlflow_run, "info", mlflow_run)
    values = {
        "mlflow_run_id": getattr(info, "run_id", None),
        "mlflow_run_name": getattr(info, "run_name", None),
        "mlflow_experiment_id": getattr(info, "experiment_id", None),
        "mlflow_experiment_name": (
            getattr(info, "experiment_name", None)
            or getattr(mlflow_run, "experiment_name", None)
        ),
        "mlflow_user_id": getattr(info, "user_id", None),
        "mlflow_status": getattr(info, "status", None),
        "mlflow_lifecycle_stage": getattr(info, "lifecycle_stage", None),
        "mlflow_artifact_uri": getattr(info, "artifact_uri", None),
        "mlflow_start_time": getattr(info, "start_time", None),
        "mlflow_end_time": getattr(info, "end_time", None),
    }
    return _annotate_run(lh, feats, values, run_id)


def annotate_run_from_wandb(lh, wandb_run, run_id: int | None = None) -> dict:
    """Annotate the (active) engine run with its W&B counterpart's
    identity. ``wandb_run`` duck-types ``wandb.sdk.wandb_run.Run`` —
    the object ``wandb.init()`` returns: ``.id, .name, .entity,
    .project, .state, .url, .tags, .group, .job_type``; the summary
    timestamp/runtime are read from ``.summary`` when present. Tags
    are stored comma-joined (one str feature, like the reference's
    ``wandb_tags`` dtype). Returns the values written."""
    feats = save_wandb_features(lh)
    tags = getattr(wandb_run, "tags", None)
    summary = getattr(wandb_run, "summary", None) or {}
    get = summary.get if hasattr(summary, "get") else lambda _k, _d=None: None
    values = {
        "wandb_run_id": getattr(wandb_run, "id", None),
        "wandb_run_name": getattr(wandb_run, "name", None),
        "wandb_run_entity": getattr(wandb_run, "entity", None),
        "wandb_project": getattr(wandb_run, "project", None),
        "wandb_state": getattr(wandb_run, "state", None),
        "wandb_url": getattr(wandb_run, "url", None),
        "wandb_tags": ",".join(tags) if tags else None,
        "wandb_group": getattr(wandb_run, "group", None),
        "wandb_job_type": getattr(wandb_run, "job_type", None),
        "wandb_timestamp": get("_timestamp"),
        "wandb_runtime": get("_runtime"),
    }
    return _annotate_run(lh, feats, values, run_id)


def tracked_publisher(
    lh, key_prefix: str, tracker_run, kind: str = "auto", **kwargs
):
    """A :class:`CheckpointPublisher` whose run is pre-annotated with
    the tracker link — the one-call composition of the reference's
    tracker example + checkpoint callback: checkpoints saved through
    the returned publisher land under a run that carries the
    ``mlflow_run_id``/``wandb_run_id`` features, so a model artifact
    resolves back to its tracker page with one EAV lookup.

    ``kind='auto'`` sniffs the object: an ``.info`` attribute means
    MLflow's Run entity, an ``.entity`` attribute W&B's."""
    from ..integrations.checkpoints import CheckpointPublisher

    if kind == "auto":
        kind = "mlflow" if hasattr(tracker_run, "info") else "wandb"
    if kind == "mlflow":
        annotate_run_from_mlflow(lh, tracker_run)
    elif kind == "wandb":
        annotate_run_from_wandb(lh, tracker_run)
    else:
        raise ValueError(f"kind must be 'auto', 'mlflow' or 'wandb', not {kind!r}")
    return CheckpointPublisher(lh, key_prefix, **kwargs)
