"""Third-party format integrations (reference ``lamindb/integrations``)."""

from .croissant import curate_from_croissant

__all__ = ["curate_from_croissant"]
