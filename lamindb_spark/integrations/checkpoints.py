"""Training checkpoint publishing — the engine analogue of the
reference's lightning integration (``integrations/lightning.py``):
checkpoints emitted by a training loop land as VERSIONED artifacts
under the active run, annotated with metric features (score, best/last
flags, model rank) that the EAV filter surface can query
(``features__score__gt=0.9``).

The reference keeps its integration framework-decoupled through
Protocols (``ArtifactObserver`` ``lightning.py:113-124``,
``ArtifactPublisher`` ``:127-147``) precisely so downstream code needs
no lightning import; this module takes that decoupling to its
conclusion — there is no trainer type anywhere. A training loop (any
framework, or none) calls :meth:`CheckpointPublisher.save_checkpoint`
with the file it just wrote plus the monitored score; the publisher
handles the artifact lifecycle and the feature bookkeeping that the
reference's ``FeatureAnnotator`` (``lightning.py:256-553``) performs:

- ``is_last_model`` moves to the new checkpoint (previous holders are
  de-flagged via :meth:`~lamindb_spark.catalog.lakehouse.Lakehouse.
  deannotate` — the analogue of ``features.remove_values``);
- ``is_best_model`` moves when the monitored score improves under the
  configured mode (the decision the reference delegates to lightning's
  ``ModelCheckpoint`` state);
- ``model_rank`` is recomputed over every scored checkpoint under the
  key prefix (``FeatureAnnotator.update_model_ranks``, ``:518-539``);
- config / hparams files are save-only artifacts (``:1190-1244``).

Scale shape: everything here is REGISTRY-sized — a training run emits
checkpoints at epoch cadence, so flag queries collect tens of
(id, value) pairs, never data rows; payloads move through the ordinary
hash-dedup ingest.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Protocol

from pyspark.sql import functions as F

# reference ``_RUN_AUTO_FEATURES`` / ``_ARTIFACT_AUTO_FEATURES``
# (``lightning.py:48-73``) with their dtypes; the names are the public
# query surface, so they match the reference exactly.
RUN_AUTO_FEATURES: dict[str, str] = {
    "logger_name": "str",
    "logger_version": "str",
    "max_epochs": "int",
    "max_steps": "int",
    "precision": "str",
    "accumulate_grad_batches": "int",
    "gradient_clip_val": "float",
    "monitor": "str",
    "mode": "str",
}
ARTIFACT_AUTO_FEATURES: dict[str, str] = {
    "is_best_model": "bool",
    "is_last_model": "bool",
    "score": "float",
    "model_rank": "int",
    "save_weights_only": "bool",
    "monitor": "str",
    "mode": "str",
}
CHECKPOINT_FEATURE_TYPE = "training.checkpoint"


@dataclass(frozen=True)
class ArtifactSavedEvent:
    """Emitted after a checkpoint-related artifact is persisted
    (reference ``ArtifactSavedEvent``, ``lightning.py:93-103``).
    ``artifact`` is the registry row dict; ``storage_uri`` the stable
    hand-off location for external registries."""

    kind: str  # "checkpoint" | "config" | "hparams"
    key: str
    local_path: str
    artifact: dict
    storage_uri: str


@dataclass(frozen=True)
class ArtifactRemovedEvent:
    """Emitted after a checkpoint artifact is removed (reference
    ``ArtifactRemovedEvent``, ``lightning.py:105-110``; removal applies
    to checkpoints — config/hparams are save-only)."""

    kind: str
    key: str
    local_path: str
    artifact: dict | None = None
    storage_uri: str | None = None


class ArtifactObserver(Protocol):
    """Observer notified about artifact lifecycle events (reference
    ``ArtifactObserver`` Protocol, ``lightning.py:113-124``) — the
    composition hook for registering checkpoints elsewhere after
    engine persistence completes."""

    def on_artifact_saved(self, event: ArtifactSavedEvent) -> None: ...

    def on_artifact_removed(self, event: ArtifactRemovedEvent) -> None: ...


def save_checkpoint_features(lh) -> dict[str, dict]:
    """Get-or-create the auto-features under the
    ``training.checkpoint`` type feature (reference
    ``save_lightning_features``, ``lightning.py:184-253``, whose type
    is named ``lamindb.lightning`` — renamed here because the engine
    integration is framework-free). Idempotent. Returns
    {name: feature row} for the members."""
    feats = lh.read_raw("feature")
    trow = feats.filter(
        (F.col("name") == CHECKPOINT_FEATURE_TYPE) & F.col("is_type")
    ).first()
    if trow is None:
        trow = lh.save(
            "feature",
            [{
                "name": CHECKPOINT_FEATURE_TYPE,
                "is_type": True,
                "dtype_str": "__training_checkpoint__",
                "description": "Auto features tracking training checkpoint metrics",
            }],
        )[0]
        type_id = trow["id"]
    else:
        type_id = trow["id"]
    wanted = {**RUN_AUTO_FEATURES, **ARTIFACT_AUTO_FEATURES}
    existing = {
        r["name"]: r.asDict()
        for r in lh.read_raw("feature")
        .filter(F.col("type_id") == type_id)
        .collect()
    }
    missing = [
        {"name": n, "dtype_str": dt, "type_id": type_id}
        for n, dt in wanted.items()
        if n not in existing
    ]
    if missing:
        for row in lh.save("feature", missing):
            existing[row["name"]] = row
    return {n: existing[n] for n in wanted}


class CheckpointPublisher:
    """Artifact lifecycle manager for a training loop's checkpoints
    (the engine's ``ArtifactPublishingModelCheckpoint`` + ``Checkpoint``
    + ``LaminArtifactPublisher`` collapsed into one framework-free
    object; reference ``lightning.py:580-1406``).

    Args:
        lh: the Lakehouse (artifacts land under its storage root and
            the currently active run).
        key_prefix: logical directory for this run's checkpoint
            artifacts (the reference derives it from the logger name/
            version; here it is explicit).
        monitor: metric name being monitored (annotation only).
        mode: ``"min"`` or ``"max"`` — how scores rank (reference
            ``ModelCheckpoint.mode``).
        observers: :class:`ArtifactObserver` instances.
        features: optional ``{"run": {...}, "artifact": {...}}`` USER
            feature values (reference ``FeatureAnnotator`` user
            features); names must already exist in the feature
            registry — unknown names raise at construction, like the
            reference's ``_validate_user_features``.
    """

    def __init__(
        self,
        lh,
        key_prefix: str,
        monitor: str | None = None,
        mode: str = "min",
        observers: list[ArtifactObserver] | None = None,
        features: dict[str, dict[str, Any]] | None = None,
    ) -> None:
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', not {mode!r}")
        user = features or {}
        if invalid := set(user) - {"run", "artifact"}:
            raise ValueError(
                f"invalid feature keys: {sorted(invalid)} — use 'run' and/or 'artifact'"
            )
        self.lh = lh
        self.key_prefix = key_prefix.strip("/")
        self.monitor = monitor
        self.mode = mode
        self._observers: list[ArtifactObserver] = list(observers or [])
        self._run_features: dict[str, Any] = dict(user.get("run", {}))
        self._artifact_features: dict[str, Any] = dict(user.get("artifact", {}))
        self._auto = save_checkpoint_features(lh)
        self._validate_user_features()
        self._run_features_saved = False
        self._best_score: float | None = None
        self._published_ids: set[int] = set()
        self._latest: dict[str, dict | None] = {
            "checkpoint": None, "config": None, "hparams": None,
        }
        self.last_event: ArtifactSavedEvent | ArtifactRemovedEvent | None = None

    # ------------------------------------------------------------ observers

    def add_artifact_observer(self, observer: ArtifactObserver) -> None:
        self._observers.append(observer)

    def remove_artifact_observer(self, observer: ArtifactObserver) -> None:
        self._observers.remove(observer)

    def _notify(self, method: str, event) -> None:
        self.last_event = event
        for obs in tuple(self._observers):
            fn = getattr(obs, method, None)
            if callable(fn):
                fn(event)

    # ------------------------------------------------------------- features

    def _validate_user_features(self) -> None:
        names = set(self._run_features) | set(self._artifact_features)
        if not names:
            return
        known = {
            r["name"]
            for r in self.lh.read_raw("feature")
            .filter(F.col("name").isin(list(names)))
            .select("name")
            .collect()
        }
        if missing := sorted(names - known):
            raise ValueError(
                f"features {missing} missing from the feature registry — "
                "create them first (save_feature_schema / from_values)"
            )

    def _feature_ids(self, names) -> dict[str, int]:
        return {n: self._auto[n]["id"] for n in names if n in self._auto}

    def save_run_features(self, config: dict[str, Any] | None = None) -> None:
        """Attach run-level features to the ACTIVE run, once
        (idempotent — reference ``FeatureAnnotator.save_run_features``,
        ``lightning.py:363-380``). ``config`` supplies trainer-config
        values; only keys that are auto run features are kept, plus
        the user run features, plus monitor/mode."""
        if self.lh.current_run_id is None or self._run_features_saved:
            return
        vals: dict[str, Any] = {}
        for k, v in (config or {}).items():
            if k in RUN_AUTO_FEATURES and v is not None:
                vals[k] = v
        if self.monitor is not None:
            vals["monitor"] = self.monitor
        vals["mode"] = self.mode
        vals.update(self._run_features)
        if vals:
            self.lh.annotate(
                "run", self.lh.current_run_id, vals,
                feature_ids=self._feature_ids(vals),
            )
        self._run_features_saved = True

    # ------------------------------------------------------------ lifecycle

    def _key_for(self, local_path: str) -> str:
        return f"{self.key_prefix}/{os.path.basename(str(local_path))}"

    def save_checkpoint(
        self,
        local_path: str,
        score: float | None = None,
        save_weights_only: bool = False,
        is_best: bool | None = None,
        extra_features: dict[str, Any] | None = None,
    ) -> dict:
        """Persist one checkpoint file as a versioned model artifact
        under the active run and annotate it (reference
        ``Checkpoint._save_checkpoint`` → ``_publish_checkpoint``,
        ``lightning.py:1159-1188``).

        ``is_best`` defaults to "score improved under mode" — the
        decision lightning's ModelCheckpoint state supplies in the
        reference. Flags move: previous ``is_last_model`` holders are
        de-flagged always, ``is_best_model`` holders only when this
        checkpoint takes the title; ranks recompute when a score is
        present."""
        key = self._key_for(local_path)
        if score is not None:
            score = float(score)
        if is_best is None:
            is_best = score is not None and (
                self._best_score is None
                or (self.mode == "max" and score > self._best_score)
                or (self.mode == "min" and score < self._best_score)
            )
        if is_best and score is not None:
            self._best_score = score
        art = self.lh.register_artifact(str(local_path), key=key, kind="model")
        # hash-dedup can return an EXISTING artifact (unchanged weights
        # re-saved, or the same bytes published under another key) —
        # track its id so flag/rank bookkeeping still reaches it even
        # when its key escapes the prefix (review finding)
        self._published_ids.add(art["id"])
        self._clear_flag("is_last_model")
        if is_best:
            self._clear_flag("is_best_model")
        vals: dict[str, Any] = {
            "is_best_model": bool(is_best),
            "is_last_model": True,
            "save_weights_only": bool(save_weights_only),
            "mode": self.mode,
        }
        if score is not None:
            vals["score"] = score
        if self.monitor is not None:
            vals["monitor"] = self.monitor
        vals.update(self._artifact_features)
        vals.update(extra_features or {})
        # re-saving a deduped artifact must REPLACE its previous values,
        # not accumulate a second contradictory row per feature (review
        # finding: true+false both matched the EAV filters); one rewrite
        # covers every feature name
        self.lh.deannotate("artifact", [art["id"]], list(vals))
        self.lh.annotate(
            "artifact", art["id"], vals, feature_ids=self._feature_ids(vals)
        )
        if score is not None:
            self.update_model_ranks()
        self._latest["checkpoint"] = art
        event = ArtifactSavedEvent(
            kind="checkpoint",
            key=key,
            local_path=str(local_path),
            artifact=art,
            storage_uri=self.lh.artifact_path(art),
        )
        self._notify("on_artifact_saved", event)
        return art

    def remove_checkpoint(self, local_path: str) -> None:
        """Trash the artifact for a checkpoint file the training loop
        deleted (reference ``Checkpoint._remove_checkpoint``,
        ``lightning.py:1190-1215``; config/hparams are save-only)."""
        key = self._key_for(local_path)
        row = (
            self.lh.read_raw("artifact")
            .filter((F.col("key") == key) & F.col("is_latest"))
            .first()
        )
        art = row.asDict() if row is not None else None
        uri = None
        if art is not None:
            uri = self.lh.artifact_path(art)
            self.lh.delete_artifact(art["id"])
            # the trashed artifact must drop out of rank/flag
            # bookkeeping entirely: forget its id and strip its
            # checkpoint features so features__model_rank=0 can never
            # resolve to an invisible artifact (the reference deletes
            # the artifact outright, lightning.py _remove_checkpoint)
            self._published_ids.discard(art["id"])
            self.lh.deannotate(
                "artifact",
                [art["id"]],
                ["score", "is_best_model", "is_last_model", "model_rank"],
            )
            self.update_model_ranks()
            if self._latest["checkpoint"] is not None and (
                self._latest["checkpoint"]["id"] == art["id"]
            ):
                self._latest["checkpoint"] = None
        event = ArtifactRemovedEvent(
            kind="checkpoint",
            key=key,
            local_path=str(local_path),
            artifact=art,
            storage_uri=uri,
        )
        self._notify("on_artifact_removed", event)

    def _save_aux(self, kind: str, local_path: str) -> dict:
        key = self._key_for(local_path)
        art = self.lh.register_artifact(str(local_path), key=key)
        self._latest[kind] = art
        event = ArtifactSavedEvent(
            kind=kind,
            key=key,
            local_path=str(local_path),
            artifact=art,
            storage_uri=self.lh.artifact_path(art),
        )
        self._notify("on_artifact_saved", event)
        return art

    def save_config(self, local_path: str) -> dict:
        """Persist a trainer/CLI config file (reference
        ``save_config_artifact`` via ``SaveConfigCallback``)."""
        return self._save_aux("config", local_path)

    def save_hparams(self, local_path: str) -> dict:
        """Persist an ``hparams.yaml``-style file (reference
        ``save_hparams_artifact``)."""
        return self._save_aux("hparams", local_path)

    def get_last_artifact(self, kind: str = "checkpoint") -> dict | None:
        return self._latest[kind]

    # ----------------------------------------------------- flag bookkeeping

    def _checkpoint_ids(self) -> list[int]:
        """ids of live checkpoint artifacts under the prefix, plus any
        this publisher touched whose dedup hit landed outside it —
        checkpoint-count-sized by construction."""
        ids = {
            r["id"]
            for r in self.lh.read("artifact")
            .filter(
                F.col("key").startswith(self.key_prefix + "/")
                & (F.col("kind") == "model")
            )
            .select("id")
            .collect()
        }
        return sorted(ids | self._published_ids)

    def _clear_flag(self, feature_name: str) -> None:
        """Flip ``feature_name`` from true to false on every previous
        holder under the prefix (reference
        ``FeatureAnnotator._clear_flagged_model_feature``,
        ``lightning.py:489-516``)."""
        ids = self._checkpoint_ids()
        if not ids:
            return
        holders = [
            r["entity_id"]
            for r in self.lh.read_raw("annotation")
            .filter(
                (F.col("entity_kind") == "artifact")
                & (F.col("feature_name") == feature_name)
                & (F.col("value_json") == "true")
                & F.col("entity_id").isin(ids)
            )
            .select("entity_id")
            .distinct()
            .collect()
        ]
        if not holders:
            return
        self.lh.deannotate("artifact", holders, feature_name, value=True)
        self.lh.annotate_many(
            "artifact",
            [(a, {feature_name: False}) for a in holders],
            feature_ids=self._feature_ids([feature_name]),
        )

    def update_model_ranks(self) -> None:
        """Re-rank every scored checkpoint under the prefix: rank 0 =
        best under mode (reference
        ``FeatureAnnotator.update_model_ranks``,
        ``lightning.py:518-539``). Old ranks are removed first so each
        artifact carries exactly one ``model_rank`` value."""
        ids = self._checkpoint_ids()
        if not ids:
            return
        scored = [
            (json.loads(r["value_json"]), r["entity_id"])
            for r in self.lh.read_raw("annotation")
            .filter(
                (F.col("entity_kind") == "artifact")
                & (F.col("feature_name") == "score")
                & F.col("entity_id").isin(ids)
            )
            .select("value_json", "entity_id")
            .collect()
        ]
        if not scored:
            return
        # tiebreak stays id-ASC in BOTH modes — a bare reverse= would
        # flip it for mode="max" (review finding)
        if self.mode == "max":
            scored.sort(key=lambda t: (-t[0], t[1]))
        else:
            scored.sort(key=lambda t: (t[0], t[1]))
        self.lh.deannotate("artifact", [a for _, a in scored], "model_rank")
        self.lh.annotate_many(
            "artifact",
            [(art_id, {"model_rank": rank}) for rank, (_s, art_id) in enumerate(scored)],
            feature_ids=self._feature_ids(["model_rank"]),
        )
