"""Experiment-tracker bridges (VERDICT r13 #3 — reference
``examples/mlflow/__init__.py`` + ``examples/wandb/__init__.py``):
tracker run identity lands as queryable RUN features, composing with
``CheckpointPublisher``; driven by plain fake tracker objects, no
mlflow/wandb dependency."""

import json
from types import SimpleNamespace

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.examples.trackers import (
    MLFLOW_FEATURES,
    WANDB_FEATURES,
    annotate_run_from_mlflow,
    annotate_run_from_wandb,
    save_mlflow_features,
    save_wandb_features,
    tracked_publisher,
)


def _fake_mlflow_run(status="RUNNING", end_time=None):
    return SimpleNamespace(
        info=SimpleNamespace(
            run_id="abc123",
            run_name="bright-finch-7",
            experiment_id="42",
            experiment_name="llm-ablations",
            user_id="casey",
            status=status,
            lifecycle_stage="active",
            artifact_uri="mlflow-artifacts:/42/abc123/artifacts",
            start_time=1700000000000,
            end_time=end_time,
        )
    )


def _fake_wandb_run():
    return SimpleNamespace(
        id="w1",
        name="giddy-sun-3",
        entity="team",
        project="llm",
        state="running",
        url="https://wandb.test/team/llm/runs/w1",
        tags=("ablation", "small"),
        group="sweep-1",
        job_type="train",
        summary={"_timestamp": 1700000123.5, "_runtime": 321.0},
    )


def _run_features(lh, run_id):
    out = {}
    for r in (
        lh.read_raw("annotation")
        .filter((F.col("entity_kind") == "run") & (F.col("entity_id") == run_id))
        .collect()
    ):
        out[r["feature_name"]] = json.loads(r["value_json"])
    return out


def test_save_features_idempotent_and_typed(lakehouse):
    f1 = save_mlflow_features(lakehouse)
    f2 = save_mlflow_features(lakehouse)
    assert set(f1) == set(MLFLOW_FEATURES)
    assert {n: f["id"] for n, f in f1.items()} == {n: f["id"] for n, f in f2.items()}
    w = save_wandb_features(lakehouse)
    assert set(w) == set(WANDB_FEATURES)
    # members hang off one type feature each
    types = lakehouse.read_raw("feature").filter(F.col("is_type")).collect()
    assert {"MLflow", "Weights & Biases"} <= {r["name"] for r in types}


def test_annotate_run_from_mlflow_replaces_on_update(lakehouse):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("train.py", source_code="v1")
    run_id = ctx.run["id"]
    annotate_run_from_mlflow(lakehouse, _fake_mlflow_run())
    feats = _run_features(lakehouse, run_id)
    assert feats["mlflow_run_id"] == "abc123"
    assert feats["mlflow_experiment_name"] == "llm-ablations"
    assert "mlflow_end_time" not in feats  # None values omitted
    # finishing the tracker run re-annotates: REPLACED, not duplicated
    annotate_run_from_mlflow(lakehouse, _fake_mlflow_run("FINISHED", 1700000999000))
    feats = _run_features(lakehouse, run_id)
    assert feats["mlflow_status"] == "FINISHED"
    assert feats["mlflow_end_time"] == 1700000999000
    n = (
        lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_id") == run_id)
            & (F.col("feature_name") == "mlflow_status")
        )
        .count()
    )
    assert n == 1
    # run queryable by tracker id through the EAV surface
    hits = QuerySet(lakehouse, "run").filter(features__mlflow_run_id="abc123")
    assert [r["id"] for r in hits._df.collect()] == [run_id]
    ctx.finish()


def test_annotate_run_from_wandb(lakehouse):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("train.py", source_code="v2")
    run_id = ctx.run["id"]
    vals = annotate_run_from_wandb(lakehouse, _fake_wandb_run())
    assert vals["wandb_tags"] == "ablation,small"
    feats = _run_features(lakehouse, run_id)
    assert feats["wandb_run_id"] == "w1"
    assert feats["wandb_runtime"] == 321.0
    hits = QuerySet(lakehouse, "run").filter(features__wandb_project="llm")
    assert [r["id"] for r in hits._df.collect()] == [run_id]
    ctx.finish()


def test_annotate_requires_run(lakehouse):
    with pytest.raises(RuntimeError, match="no active run"):
        annotate_run_from_mlflow(lakehouse, _fake_mlflow_run())


def test_tracked_publisher_links_checkpoints(lakehouse, tmp_path):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("train.py", source_code="v3")
    run_id = ctx.run["id"]
    pub = tracked_publisher(lakehouse, "models/tp", _fake_mlflow_run())
    p = tmp_path / "e1.ckpt"
    p.write_bytes(b"w")
    art = pub.save_checkpoint(str(p), score=0.5)
    assert art["run_id"] == run_id
    # the model artifact's run resolves back to the tracker id
    feats = _run_features(lakehouse, run_id)
    assert feats["mlflow_run_id"] == "abc123"
    # auto-sniff picks wandb for the other shape
    pub2 = tracked_publisher(lakehouse, "models/tp2", _fake_wandb_run())
    assert pub2.key_prefix == "models/tp2"
    assert _run_features(lakehouse, run_id)["wandb_run_id"] == "w1"
    with pytest.raises(ValueError, match="kind"):
        tracked_publisher(lakehouse, "m", _fake_mlflow_run(), kind="neptune")
    ctx.finish()
