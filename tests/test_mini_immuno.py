"""Mini immuno tutorial surface (reference
``examples/datasets/mini_immuno.py`` + feature/schema define scripts +
``save_mini_immuno_datasets.py``): datasets with curation-defect
toggles, the feature family, the flexible schema, and the two-artifact
ingest with queryable dataset-level metadata."""

import json

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.curation.curator import (
    CategoricalSpec,
    DataFrameCurator,
)
from lamindb_spark.curation.schema_check import SchemaSpec
from lamindb_spark.examples import mini_immuno, schemas


def test_dataset1_shape_and_toggles(spark):
    df, meta = mini_immuno.get_dataset1(spark)
    assert df.count() == 3
    assert "ENSG00000153563" in df.columns and "perturbation" in df.columns
    assert meta["experiment"] == "Experiment 1"
    p = {r["perturbation"] for r in df.collect()}
    assert p == {"DMSO", "IFNG"}
    # toggles inject exactly the reference's defects
    bad, _ = mini_immuno.get_dataset1(spark, with_typo=True)
    assert "IFNJ" in {r["perturbation"] for r in bad.collect()}
    syn, _ = mini_immuno.get_dataset1(spark, with_cell_type_synonym=True)
    assert "B-cell" in {r["cell_type_by_expert"] for r in syn.collect()}
    sym, _ = mini_immuno.get_dataset1(spark, gene_symbols_in_index=True)
    assert "CD8A" in sym.columns
    typo, _ = mini_immuno.get_dataset1(spark, with_gene_typo=True)
    assert "GeneTypo" in typo.columns


def test_dataset1_anndata_long(spark):
    ad, meta = mini_immuno.get_dataset1(spark, otype="AnnData")
    assert ad.obs.count() == 3 and ad.var.count() == 3
    assert ad.x.count() == 9
    # list-typed donor_ethnicity dropped, like the reference's AnnData
    assert "donor_ethnicity" not in ad.obs.columns
    got = {
        (r["obs_id"], r["var_id"]): r["value"] for r in ad.x.collect()
    }
    assert got[("sample1", "ENSG00000153563")] == 1.0
    assert got[("sample3", "ENSG00000170458")] == 7.0


def test_dataset2(spark):
    df, meta = mini_immuno.get_dataset2(spark)
    assert df.count() == 3
    assert "ENSG00000004468" in df.columns
    assert meta["experiment"] == "Experiment 2"


def test_define_features_labels_idempotent(lakehouse):
    f1 = mini_immuno.define_features_labels(lakehouse)
    f2 = mini_immuno.define_features_labels(lakehouse)
    assert {n: f["id"] for n, f in f1.items()} == {n: f["id"] for n, f in f2.items()}
    assert f1["perturbation"]["dtype_str"] == "cat[Record[Perturbation]]"
    # typed record family for perturbation labels
    ptype = (
        lakehouse.read("record")
        .filter((F.col("name") == "Perturbation") & F.col("is_type"))
        .first()
    )
    members = {
        r["name"]
        for r in lakehouse.read("record")
        .filter(F.col("type_id") == ptype["id"])
        .collect()
    }
    assert members == {"DMSO", "IFNG"}
    # cell-type family carries the synonyms the datasets exercise
    b = lakehouse.read("ulabel").filter(F.col("name") == "B cell").first()
    assert "B-cell" in b["synonyms"]


def test_flexible_schema_validates_and_standardizes(spark, lakehouse):
    schema = mini_immuno.define_mini_immuno_schema_flexible(lakehouse)
    assert schema["flexible"]
    assert (
        mini_immuno.define_mini_immuno_schema_flexible(lakehouse)["id"]
        == schema["id"]
    )
    ctype = (
        lakehouse.read("ulabel")
        .filter((F.col("name") == "CellType") & F.col("is_type"))
        .first()
    )
    cells = lakehouse.read("ulabel").filter(F.col("type_id") == ctype["id"])
    ptype = (
        lakehouse.read("record")
        .filter((F.col("name") == "Perturbation") & F.col("is_type"))
        .first()
    )
    perts = lakehouse.read("record").filter(F.col("type_id") == ptype["id"])
    spec = SchemaSpec(
        features={
            "perturbation": "string",
            "cell_type_by_expert": "string",
            "cell_type_by_model": "string",
            "assay_oid": "string",
            "donor": "string",
        },
        maximal_set=False,
    )
    cats = {
        "perturbation": CategoricalSpec(perts, "name"),
        "cell_type_by_expert": CategoricalSpec(cells, "name", "synonyms"),
        "cell_type_by_model": CategoricalSpec(cells, "name", "synonyms"),
    }
    ok, _ = mini_immuno.get_dataset1(spark)
    assert DataFrameCurator(ok, spec, cats).validate()["is_valid"]
    # perturbation typo fails in the right place
    bad, _ = mini_immuno.get_dataset1(spark, with_typo=True)
    rep = DataFrameCurator(bad, spec, cats).validate()
    assert not rep["is_valid"]
    assert rep["categoricals"].get("perturbation") == ["IFNJ"]
    # the synonym form is valid and standardizes to the canonical name
    syn, _ = mini_immuno.get_dataset1(spark, with_cell_type_synonym=True)
    cur = DataFrameCurator(syn, spec, cats)
    assert cur.validate()["is_valid"]
    std = cur.standardize().df
    assert "B-cell" not in {r["cell_type_by_expert"] for r in std.collect()}


def test_save_mini_immuno_datasets(spark, lakehouse):
    a1, a2 = mini_immuno.save_mini_immuno_datasets(lakehouse, spark)
    assert a1["key"].endswith("dataset1.parquet")
    assert a1["schema_id"] is not None and a1["schema_id"] == a2["schema_id"]
    # dataset-level metadata queryable through the EAV surface
    hits = QuerySet(lakehouse, "artifact").filter(
        features__experiment="Experiment 1"
    )
    assert [r["id"] for r in hits._df.collect()] == [a1["id"]]
    # the ad-hoc study_metadata dict landed as one JSON value
    row = (
        lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_id") == a2["id"])
            & (F.col("feature_name") == "study_metadata")
        )
        .first()
    )
    assert json.loads(row["value_json"]) == {"detail1": "456", "detail2": 2}
    # payload opens back as the dataset
    got = lakehouse.open_artifact("examples/dataset1.parquet", is_run_input=False)
    assert got.count() == 3


def test_example_schemas_get_or_create(lakehouse):
    s1 = schemas.valid_features(lakehouse)
    assert s1["itype"] == "Feature" and s1["flexible"]
    assert schemas.valid_features(lakehouse)["id"] == s1["id"]
    comp = schemas.anndata_ensembl_gene_ids_and_valid_features_in_obs(lakehouse)
    assert comp["itype"] == "AnnData"
    assert (
        schemas.anndata_ensembl_gene_ids_and_valid_features_in_obs(lakehouse)["id"]
        == comp["id"]
    )
    slots = {
        r["slot"]: r["component_id"]
        for r in lakehouse.read_raw("schema_components")
        .filter(F.col("composite_id") == comp["id"])
        .collect()
    }
    assert slots["obs"] == s1["id"]
    var = (
        lakehouse.read("schema")
        .filter(F.col("id") == slots["var"])
        .first()
    )
    assert var["itype"] == "bionty.Gene.ensembl_gene_id"


def test_local_fixture_generators(lakehouse, tmp_path):
    """The locally-generatable examples/datasets subset (reference
    _core.py file_mini_csv / dir_scrnaseq_cellranger /
    dict_cellxgene_uns): the cellranger mock drives S7 directory
    ingest end-to-end."""
    from lamindb_spark.examples import datasets

    p = datasets.file_mini_csv(tmp_path)
    assert p.read_text().splitlines() == ["test", "1", "2", "3"]

    sampledir = datasets.dir_scrnaseq_cellranger(
        "sampleA", tmp_path, output_only=False
    )
    assert (sampledir / "filtered_feature_bc_matrix/matrix.mtx.gz").exists()
    assert (tmp_path / "fastq/sampleA_R1_001.fastq.gz").exists()
    arts = lakehouse.register_dir(str(sampledir))
    keys = {a["key"] for a in arts}
    assert len(arts) == 15
    assert any(k.endswith("metrics_summary.csv") for k in keys)
    assert any("raw_feature_bc_matrix/barcodes.tsv.gz" in k for k in keys)

    uns = datasets.dict_cellxgene_uns()
    assert uns["spatial"]["library_2"]["scalefactors"]["tissue_hires_scalef"] == 0.355
