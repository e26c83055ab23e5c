"""CELLxGENE example schema (examples/cellxgene.py — reference
``examples/cellxgene/_cellxgene.py``): control-value defaults +
composite schema, curated end-to-end; ontology domains are
caller-supplied (bionty declared out of scope)."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.curation.slots import AnnDataCurator
from lamindb_spark.examples import (
    create_cellxgene_schema,
    save_cellxgene_defaults,
)
from lamindb_spark.sources.anndata_long import AnnDataLong
from lamindb_spark.sources.literals import literal_table


def test_defaults_idempotent_and_typed(lakehouse):
    out1 = save_cellxgene_defaults(lakehouse)
    out2 = save_cellxgene_defaults(lakehouse)
    assert sorted(r["name"] for r in out1["SuspensionType"]) == ["cell", "na", "nucleus"]
    assert sorted(r["name"] for r in out1["TissueType"]) == [
        "cell line", "organoid", "primary cell culture", "tissue",
    ]
    # second call creates nothing new: every (family, member) pair is
    # one typed row — "unknown"/"na" exist ONCE PER FAMILY, so closed
    # vocabularies never lose members to cross-family name collisions
    expected = len(out2) + sum(len(v) for v in out2.values())
    assert lakehouse.read("ulabel").count() == expected
    # and the repeats are scoped: Ethnicity's 'na' != SuspensionType's
    na_rows = [r for r in out1["Ethnicity"] if r["name"] == "na"] + [
        r for r in out1["SuspensionType"] if r["name"] == "na"
    ]
    assert len(na_rows) == 2 and na_rows[0]["type_id"] != na_rows[1]["type_id"]


def test_schema_field_type_selection(lakehouse):
    save_cellxgene_defaults(lakehouse)
    built = create_cellxgene_schema(lakehouse, field_types="ontology_id")
    obs_cols = set(built["slots"]["obs"].spec.features)
    assert "cell_type_ontology_term_id" in obs_cols
    assert "cell_type" not in obs_cols
    assert "donor_id" in obs_cols
    both = create_cellxgene_schema(lakehouse, field_types={"name", "ontology_id"})
    cols = set(both["slots"]["obs"].spec.features)
    assert {"cell_type", "cell_type_ontology_term_id"} <= cols
    with pytest.raises(ValueError, match="field_types"):
        create_cellxgene_schema(lakehouse, field_types="ensembl")


def test_curate_against_cellxgene_schema(spark, lakehouse):
    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    save_cellxgene_defaults(lakehouse)
    cell_registry = literal_table(
        spark, [("T cell",), ("B cell",), ("unknown",)], ["name"]
    )
    built = create_cellxgene_schema(
        lakehouse,
        field_types="name",
        registries={"cell_type": cell_registry},
        include_var=False,
    )
    # the CELLxGENE schema requires EVERY controlled column (the
    # reference schema is minimal-set too); unchecked columns accept
    # any string, suspension_type is a CLOSED control vocabulary
    cols = [
        "obs_id", "assay", "cell_type", "development_stage", "disease",
        "self_reported_ethnicity", "sex", "suspension_type", "tissue",
        "tissue_type", "organism", "donor_id",
    ]

    def _obs(cell_type, suspension):
        row = ("o1", "10x", cell_type, "adult", "normal", "na", "unknown",
               suspension, "blood", "tissue", "human", "d1")
        return literal_table(spark, [row], cols)

    var = literal_table(spark, [("g1",)], ["var_id"])
    x = literal_table(spark, [("o1", "g1", 1.0)], ["obs_id", "var_id", "value"])
    cur = AnnDataCurator(
        AnnDataLong(obs=_obs("T cell", "cell"), var=var, x=x), built["slots"]
    )
    assert cur.validate()["is_valid"]

    cur_bad = AnnDataCurator(
        AnnDataLong(obs=_obs("T cell", "droplet"), var=var, x=x), built["slots"]
    )
    rep = cur_bad.validate()
    assert not rep["is_valid"]
    assert rep["slots"]["obs"]["categoricals"]["suspension_type"] == ["droplet"]


def test_composite_schema_persisted(lakehouse):
    save_cellxgene_defaults(lakehouse)
    built = create_cellxgene_schema(lakehouse, field_types="name")
    comp = built["schema"]
    links = (
        lakehouse.read_raw("schema_components")
        .filter(F.col("composite_id") == comp["id"])
        .collect()
    )
    assert sorted(r["slot"] for r in links) == ["obs", "var"]
