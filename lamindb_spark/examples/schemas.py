"""Example schemas — the engine analogue of the reference's
``examples/schemas`` package (``_simple.py`` ``valid_features``,
``_anndata.py`` ``anndata_ensembl_gene_ids_and_valid_features_in_obs``
and their ``define_*`` scripts). Both are get-or-create by schema
name, exactly the reference's ``Schema.get(name=...)``-or-run-script
dance, minus the importlib reload tricks a script-based definition
needs."""

from __future__ import annotations

from pyspark.sql import functions as F


def valid_features(lh) -> dict:
    """A DataFrame schema validating that columns map on existing
    features (reference ``schemas/_simple.py:10`` — ``Schema(
    name="valid_features", itype=ln.Feature)``): no fixed member
    list, ``flexible`` — any column is accepted iff a feature of that
    name exists. Idempotent."""
    hit = lh.read("schema").filter(F.col("name") == "valid_features").first()
    if hit is not None:
        return hit.asDict()
    return lh.save(
        "schema",
        [{
            "name": "valid_features",
            "itype": "Feature",
            "n_members": 0,
            "flexible": True,
            "minimal_set": False,
            "maximal_set": False,
            "ordered_set": False,
        }],
    )[0]


def anndata_ensembl_gene_ids_and_valid_features_in_obs(lh) -> dict:
    """An AnnData schema validating Ensembl gene ids in var and valid
    features in obs (reference ``schemas/_anndata.py:10`` + its define
    script: composite ``Schema(otype="AnnData", slots={"obs":
    valid_features, "var.T": valid_ensembl_gene_ids})``).

    The var-slot itype is declared as ``bionty.Gene.ensembl_gene_id``
    verbatim — the identifier CONTRACT is public string data; the
    ontology MEMBERS that would populate its domain come from bionty
    and stay caller-supplied at curation time (the repo's declared
    boundary, same as ``examples/cellxgene.py``). Idempotent."""
    hit = lh.read("schema").filter(
        F.col("name") == "anndata_ensembl_gene_ids_and_valid_features_in_obs"
    ).first()
    if hit is not None:
        return hit.asDict()
    from ..curation.slots import save_composite_schema

    obs_schema = valid_features(lh)
    var_schema = lh.read("schema").filter(
        F.col("name") == "valid_ensembl_gene_ids"
    ).first()
    if var_schema is None:
        var_schema = lh.save(
            "schema",
            [{
                "name": "valid_ensembl_gene_ids",
                "itype": "bionty.Gene.ensembl_gene_id",
                "n_members": 0,
                "flexible": False,
            }],
        )[0]
    else:
        var_schema = var_schema.asDict()
    return save_composite_schema(
        lh,
        "anndata_ensembl_gene_ids_and_valid_features_in_obs",
        # reference slots {"obs": ..., "var.T": ...}; the engine's
        # long-form var needs no transpose marker (slots.py contract)
        {"obs": obs_schema["id"], "var": var_schema["id"]},
        otype="AnnData",
    )
