"""CELLxGENE schema curation example — the engine analogue of the
reference's ``examples/cellxgene/_cellxgene.py``.

The reference module has two halves with very different dependency
profiles:

- the CONTROL VALUES (``save_cellxgene_defaults``, reference ``:21-97``)
  are hard-coded in its source: the ``TissueType`` /
  ``SuspensionType`` ULabel types with their members, plus
  ``unknown`` / ``na`` / ``normal`` control entries for the ontology
  columns. Fully reproducible here — the engine stores each ontology
  column's controls as members of a typed ULabel family (one type per
  column), which the curators' CategoricalSpec can point at directly.
- the ONTOLOGY MEMBERS come from bionty sources (CellType, Disease,
  NCBITaxon, …) fetched from public ontology servers. Bionty is out of
  scope under this repo's constraints (declared in SURVEY §2 since r1),
  so the full ontology domains must be SUPPLIED by the caller as
  registry DataFrames — ``create_cellxgene_schema`` wires whatever the
  caller provides and leaves the rest as presence-only columns.

Column inventory and the field-type selection logic
(``ontology_id`` / ``name`` / both) follow reference ``:117-190``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# reference ``categoricals_to_spec`` (``_cellxgene.py:122-152``):
# column → (ULabel family for controls, default control value).
# name-form columns; the *_ontology_term_id twins derive from them.
_NAME_COLUMNS: dict[str, tuple[str, str | None]] = {
    "assay": ("Assay", None),
    "cell_type": ("CellType", "unknown"),
    "development_stage": ("DevelopmentalStage", "unknown"),
    "disease": ("Disease", "normal"),
    "self_reported_ethnicity": ("Ethnicity", "unknown"),
    "sex": ("Phenotype", "unknown"),
    "suspension_type": ("SuspensionType", "cell"),
    "tissue": ("Tissue", None),
    "tissue_type": ("TissueType", "tissue"),
    "organism": ("Organism", None),
}
_CONTROL_MEMBERS: dict[str, list[str]] = {
    # hard-coded in the reference source (not ontology-derived)
    "TissueType": ["tissue", "organoid", "primary cell culture", "cell line"],
    "SuspensionType": ["cell", "nucleus", "na"],
    "CellType": ["unknown"],
    "DevelopmentalStage": ["unknown"],
    "Disease": ["normal"],
    "Ethnicity": ["na", "unknown"],
    "Phenotype": ["unknown"],
}


def save_cellxgene_defaults(lh) -> dict[str, list[dict]]:
    """Save the CELLxGENE control values (reference
    ``save_cellxgene_defaults``, ``_cellxgene.py:21-97``): one typed
    ULabel family per controlled column, members = the schema's control
    entries. Idempotent (name get-or-create). Returns
    {family: member rows}. The ontology members themselves (bionty)
    are out of scope — callers append their own domains."""
    out: dict[str, list[dict]] = {}
    for family, members in _CONTROL_MEMBERS.items():
        trow = (
            lh.read("ulabel")
            .filter((F.col("name") == family) & F.col("is_type"))
            .first()
        )
        if trow is None:
            trow = lh.save(
                "ulabel",
                [{
                    "name": family,
                    "is_type": True,
                    "description": "From the CELLxGENE schema.",
                }],
            )[0]
        # get-or-create per (name, type_id) — NOT by name alone:
        # "unknown"/"na" repeat across families (Ethnicity vs
        # SuspensionType), and a name-global match would type the row
        # to whichever family ran first, silently shrinking the other
        # family's closed vocabulary
        scoped = lh.read("ulabel").filter(F.col("type_id") == trow["id"])
        present = {
            r["name"]
            for r in scoped.filter(F.col("name").isin(members))
            .select("name")
            .collect()
        }
        missing = [m for m in members if m not in present]
        if missing:
            lh.save(
                "ulabel",
                [
                    {
                        "name": m,
                        "type_id": trow["id"],
                        "description": "From the CELLxGENE schema.",
                    }
                    for m in missing
                ],
            )
        out[family] = [
            r.asDict()
            for r in lh.read("ulabel")
            .filter(
                (F.col("type_id") == trow["id"]) & F.col("name").isin(members)
            )
            .collect()
        ]
    return out


def create_cellxgene_schema(
    lh,
    field_types: str | set[str] = "ontology_id",
    organism: str = "human",
    registries: dict | None = None,
    include_var: bool = True,
) -> dict:
    """Build the CELLxGENE composite schema (reference
    ``create_cellxgene_schema``, ``_cellxgene.py:99-280``): an ``obs``
    component with the controlled columns for the chosen field form(s)
    plus ``donor_id``, optionally a ``var`` component validating the
    gene index, linked under one composite.

    ``registries`` maps column name → a registry DataFrame whose
    ``name`` column is the valid domain (the engine's stand-in for the
    bionty field attr). Columns without a registry are schema-present
    but categorical-unchecked — the caller supplies domains where they
    have them. Returns ``{"schema": composite row, "categoricals":
    {column: CategoricalSpec}, "slots": slot-spec dict}`` — exactly
    what :func:`~lamindb_spark.curation.slots.curator_from_schema` and
    ``AnnDataCurator`` consume.
    """
    from ..curation.curator import CategoricalSpec
    from ..curation.slots import (
        SlotSpec,
        save_composite_schema,
        save_feature_schema,
    )
    from ..curation.schema_check import SchemaSpec

    fts = {field_types} if isinstance(field_types, str) else set(field_types)
    if not fts or fts - {"ontology_id", "name"}:
        raise ValueError(
            f"field_types must be 'ontology_id', 'name', or both, not {field_types!r}"
        )
    columns: list[str] = []
    if "name" in fts:
        columns += list(_NAME_COLUMNS)
    if "ontology_id" in fts:
        # tissue_type and suspension_type exist ONLY in name form — the
        # CELLxGENE schema defines no *_ontology_term_id twin for them
        # (they are closed ULabel vocabularies, reference
        # categoricals_to_spec), so the twin list must exclude both
        # (review finding: a generated suspension_type_ontology_term_id
        # column would fail every compliant dataset)
        columns += [
            f"{c}_ontology_term_id"
            for c in _NAME_COLUMNS
            if c not in ("tissue_type", "suspension_type")
        ]
    columns.append("donor_id")

    obs_row = save_feature_schema(
        lh,
        name=f"obs of CELLxGENE ({organism})",
        features={c: "str" for c in columns},
        maximal_set=False,
    )
    slots = {"obs": obs_row["id"]}
    if include_var:
        var_row = save_feature_schema(
            lh,
            name="var of CELLxGENE",
            features={"var_id": "str"},
            maximal_set=False,
        )
        slots["var"] = var_row["id"]
    comp = save_composite_schema(
        lh, name=f"CELLxGENE ({organism})", slots=slots, otype="AnnData"
    )

    # categorical domains: caller registries first, control families as
    # the fallback for columns whose controls ARE a meaningful domain
    registries = registries or {}
    categoricals: dict[str, CategoricalSpec] = {}
    controls = lh.read("ulabel")
    types = {
        r["name"]: r["id"]
        for r in controls.filter(F.col("is_type")).select("name", "id").collect()
    }
    for col in columns:
        if col in registries:
            categoricals[col] = CategoricalSpec(registries[col], "name")
            continue
        family = _NAME_COLUMNS.get(col, (None, None))[0]
        if family in ("TissueType", "SuspensionType") and family in types:
            # closed vocabularies — the controls are the WHOLE domain
            categoricals[col] = CategoricalSpec(
                controls.filter(F.col("type_id") == types[family]), "name"
            )
    spec = SlotSpec(
        spec=SchemaSpec(features={c: "string" for c in columns}, maximal_set=False),
        categoricals=categoricals,
    )
    slot_specs = {"obs": spec}
    if include_var:
        var_cats = (
            {"var_id": CategoricalSpec(registries["var_id"], "name")}
            if "var_id" in registries
            else {}
        )
        slot_specs["var"] = SlotSpec(
            spec=SchemaSpec(features={"var_id": "string"}, maximal_set=False),
            categoricals=var_cats,
        )
    return {"schema": comp, "categoricals": categoricals, "slots": slot_specs}
