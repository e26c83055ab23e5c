"""Schema/curation examples — the engine's ``lamindb.examples``
analogue (reference ``examples/``). Only the bionty-free surface is
carried; see ``cellxgene.py`` for the boundary."""

from .cellxgene import create_cellxgene_schema, save_cellxgene_defaults

__all__ = ["create_cellxgene_schema", "save_cellxgene_defaults"]
