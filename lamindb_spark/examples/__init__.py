"""Schema/curation examples — the engine's ``lamindb.examples``
analogue (reference ``examples/``). Only the bionty-free surface is
carried; see ``cellxgene.py`` for the boundary."""

from . import datasets, mini_immuno, schemas
from .cellxgene import create_cellxgene_schema, save_cellxgene_defaults
from .trackers import (
    annotate_run_from_mlflow,
    annotate_run_from_wandb,
    save_mlflow_features,
    save_wandb_features,
    tracked_publisher,
)

__all__ = [
    "datasets",
    "mini_immuno",
    "schemas",
    "create_cellxgene_schema",
    "save_cellxgene_defaults",
    "annotate_run_from_mlflow",
    "annotate_run_from_wandb",
    "save_mlflow_features",
    "save_wandb_features",
    "tracked_publisher",
]
