"""Third-party format integrations (reference ``lamindb/integrations``)."""

from .croissant import curate_from_croissant
from .vitessce import actions_for, save_vitessce_config

__all__ = ["actions_for", "curate_from_croissant", "save_vitessce_config"]
