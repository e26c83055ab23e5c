"""Third-party format integrations (reference ``lamindb/integrations``)."""

from .checkpoints import (
    ArtifactObserver,
    ArtifactRemovedEvent,
    ArtifactSavedEvent,
    CheckpointPublisher,
    save_checkpoint_features,
)
from .croissant import curate_from_croissant
from .vitessce import actions_for, save_vitessce_config

__all__ = [
    "ArtifactObserver",
    "ArtifactRemovedEvent",
    "ArtifactSavedEvent",
    "CheckpointPublisher",
    "actions_for",
    "curate_from_croissant",
    "save_checkpoint_features",
    "save_vitessce_config",
]
