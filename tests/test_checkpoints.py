"""Training checkpoint publishing (integrations/checkpoints.py —
VERDICT r12 #3; reference ``integrations/lightning.py:77-450``):
a simulated training loop emits checkpoints; artifacts land versioned
under the active run with metric features queryable via the EAV
filter surface."""

import json

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.integrations.checkpoints import (
    ARTIFACT_AUTO_FEATURES,
    RUN_AUTO_FEATURES,
    ArtifactRemovedEvent,
    ArtifactSavedEvent,
    CheckpointPublisher,
    save_checkpoint_features,
)


class RecordingObserver:
    def __init__(self):
        self.saved = []
        self.removed = []

    def on_artifact_saved(self, event):
        self.saved.append(event)

    def on_artifact_removed(self, event):
        self.removed.append(event)


def _ckpt(tmp_path, name, payload):
    p = tmp_path / name
    p.write_bytes(payload)
    return str(p)


def test_save_checkpoint_features_idempotent(lakehouse):
    feats1 = save_checkpoint_features(lakehouse)
    feats2 = save_checkpoint_features(lakehouse)
    wanted = set(RUN_AUTO_FEATURES) | set(ARTIFACT_AUTO_FEATURES)
    assert set(feats1) == wanted
    assert {n: f["id"] for n, f in feats1.items()} == {
        n: f["id"] for n, f in feats2.items()
    }
    # all members hang off the one type feature
    rows = lakehouse.read_raw("feature").filter(
        F.col("name") == "training.checkpoint"
    ).collect()
    assert len(rows) == 1 and rows[0]["is_type"]


def test_training_loop_flags_ranks_and_lineage(spark, lakehouse, tmp_path):
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("train.py", source_code="loop-v1")
    run_id = ctx.run["id"]
    obs = RecordingObserver()
    pub = CheckpointPublisher(
        lakehouse, "models/demo", monitor="val_loss", mode="min", observers=[obs]
    )
    pub.save_run_features({"max_epochs": 3, "precision": "32", "ignored_key": 1})

    # epoch 1: first checkpoint is best and last
    a1 = pub.save_checkpoint(
        _ckpt(tmp_path, "epoch1.ckpt", b"w1"), score=0.9
    )
    # epoch 2: improves (min mode) -> takes best
    a2 = pub.save_checkpoint(
        _ckpt(tmp_path, "epoch2.ckpt", b"w2"), score=0.5
    )
    # epoch 3: regresses -> last but not best
    a3 = pub.save_checkpoint(
        _ckpt(tmp_path, "epoch3.ckpt", b"w3"), score=0.7
    )
    ctx.finish()

    # versioned model artifacts under the run
    arts = {r["id"]: r for r in lakehouse.read("artifact").collect()}
    for a in (a1, a2, a3):
        assert arts[a["id"]]["kind"] == "model"
        assert arts[a["id"]]["run_id"] == run_id

    def feat(art_id):
        rows = lakehouse.read_raw("annotation").filter(
            (F.col("entity_kind") == "artifact") & (F.col("entity_id") == art_id)
        ).collect()
        out = {}
        for r in rows:
            out.setdefault(r["feature_name"], []).append(json.loads(r["value_json"]))
        return out

    f1, f2, f3 = feat(a1["id"]), feat(a2["id"]), feat(a3["id"])
    # exactly one value per flag feature (deannotate removed the old)
    assert f1["is_best_model"] == [False] and f1["is_last_model"] == [False]
    assert f2["is_best_model"] == [True] and f2["is_last_model"] == [False]
    assert f3["is_best_model"] == [False] and f3["is_last_model"] == [True]
    # ranks: 0 = best under min mode
    assert f2["model_rank"] == [0] and f3["model_rank"] == [1] and f1["model_rank"] == [2]
    assert f1["monitor"] == ["val_loss"] and f2["mode"] == ["min"]

    # queryable via the EAV filter surface
    best = QuerySet(lakehouse, "artifact").filter(features__is_best_model=True)
    assert [r["id"] for r in best._df.collect()] == [a2["id"]]
    good = QuerySet(lakehouse, "artifact").filter(
        features__score__lt=0.8, kind="model"
    )
    assert {r["id"] for r in good._df.collect()} == {a2["id"], a3["id"]}
    rank0 = QuerySet(lakehouse, "artifact").filter(features__model_rank=0)
    assert [r["id"] for r in rank0._df.collect()] == [a2["id"]]

    # run-level features on the run entity (only known keys kept)
    run_feats = {
        r["feature_name"]: json.loads(r["value_json"])
        for r in lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_kind") == "run")
            & (F.col("entity_id") == run_id)
        )
        .collect()
    }
    assert run_feats["max_epochs"] == 3
    assert run_feats["monitor"] == "val_loss"
    assert "ignored_key" not in run_feats

    # observer saw every save, in order, with storage URIs
    assert [e.key for e in obs.saved] == [
        "models/demo/epoch1.ckpt",
        "models/demo/epoch2.ckpt",
        "models/demo/epoch3.ckpt",
    ]
    assert all(isinstance(e, ArtifactSavedEvent) and e.storage_uri for e in obs.saved)
    assert pub.get_last_artifact()["id"] == a3["id"]


def test_checkpoint_versioning_same_key(lakehouse, tmp_path):
    pub = CheckpointPublisher(lakehouse, "models/v", mode="max")
    a1 = pub.save_checkpoint(_ckpt(tmp_path, "best.ckpt", b"gen1"), score=0.1)
    a2 = pub.save_checkpoint(_ckpt(tmp_path, "best.ckpt", b"gen2"), score=0.2)
    assert a1["uid"] != a2["uid"]
    rows = lakehouse.read_raw("artifact").filter(
        F.col("key") == "models/v/best.ckpt"
    ).collect()
    assert len(rows) == 2
    latest = {r["uid"]: r["is_latest"] for r in rows}
    assert latest[a2["uid"]] and not latest[a1["uid"]]


def test_remove_checkpoint_trashes_and_notifies(lakehouse, tmp_path):
    obs = RecordingObserver()
    pub = CheckpointPublisher(lakehouse, "models/rm", observers=[obs])
    path = _ckpt(tmp_path, "e1.ckpt", b"x")
    art = pub.save_checkpoint(path, score=1.0)
    pub.remove_checkpoint(path)
    assert len(obs.removed) == 1
    ev = obs.removed[0]
    assert isinstance(ev, ArtifactRemovedEvent)
    assert ev.artifact["id"] == art["id"] and ev.storage_uri
    # trashed, not visible
    assert (
        lakehouse.read("artifact").filter(F.col("id") == art["id"]).count() == 0
    )
    assert pub.get_last_artifact() is None
    # removing an unknown file still emits an event with artifact=None
    pub.remove_checkpoint(str(tmp_path / "ghost.ckpt"))
    assert obs.removed[1].artifact is None


def test_remove_checkpoint_drops_rank_and_flag_bookkeeping(lakehouse, tmp_path):
    """A removed (save_top_k-pruned) checkpoint must vanish from rank/
    flag bookkeeping: its feature rows are stripped and the survivors
    re-ranked, so ``features__model_rank=0`` always resolves to a
    VISIBLE artifact (ADVICE r13: the trashed best kept rank 0)."""
    pub = CheckpointPublisher(lakehouse, "models/prune", mode="min")
    p1 = _ckpt(tmp_path, "e1.ckpt", b"a")
    p2 = _ckpt(tmp_path, "e2.ckpt", b"b")
    p3 = _ckpt(tmp_path, "e3.ckpt", b"c")
    a1 = pub.save_checkpoint(p1, score=0.9)
    a2 = pub.save_checkpoint(p2, score=0.2)  # best under min
    a3 = pub.save_checkpoint(p3, score=0.5)
    pub.remove_checkpoint(p2)  # prune the best

    # the trashed artifact carries NO checkpoint features anymore
    gone = (
        lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_id") == a2["id"])
            & F.col("feature_name").isin(
                ["score", "is_best_model", "is_last_model", "model_rank"]
            )
        )
        .count()
    )
    assert gone == 0
    # survivors re-ranked over live checkpoints only: a3 is now rank 0
    ranks = {
        r["entity_id"]: json.loads(r["value_json"])
        for r in lakehouse.read_raw("annotation")
        .filter(F.col("feature_name") == "model_rank")
        .collect()
    }
    assert ranks == {a3["id"]: 0, a1["id"]: 1}
    # rank 0 resolves to a visible artifact
    rank0 = QuerySet(lakehouse, "artifact").filter(features__model_rank=0)
    assert [r["id"] for r in rank0._df.collect()] == [a3["id"]]


def test_config_and_hparams_save_only(lakehouse, tmp_path):
    pub = CheckpointPublisher(lakehouse, "models/cfg")
    cfg = pub.save_config(_ckpt(tmp_path, "config.yaml", b"lr: 1e-3"))
    hp = pub.save_hparams(_ckpt(tmp_path, "hparams.yaml", b"d: 8"))
    assert pub.get_last_artifact("config")["id"] == cfg["id"]
    assert pub.get_last_artifact("hparams")["id"] == hp["id"]
    # no model kind, no flags
    assert cfg["kind"] != "model"
    assert (
        lakehouse.read_raw("annotation")
        .filter(F.col("entity_id").isin([cfg["id"], hp["id"]]))
        .count()
        == 0
    )


def test_user_feature_validation(lakehouse):
    with pytest.raises(ValueError, match="invalid feature keys"):
        CheckpointPublisher(lakehouse, "m", features={"epoch": {}})
    with pytest.raises(ValueError, match="missing from the feature registry"):
        CheckpointPublisher(
            lakehouse, "m", features={"artifact": {"no_such_feature": 1}}
        )
    with pytest.raises(ValueError, match="mode"):
        CheckpointPublisher(lakehouse, "m", mode="best")
