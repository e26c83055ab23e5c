"""Slot-based array curation (curation/slots.py — VERDICT r11 #1;
reference ``curators/core.py:487-1434``): AnnData/MuData/SpatialData
curated per-slot end-to-end — validate → fail → standardize → pass →
save → annotate — over the long-form sources."""

import json

import pytest
from pyspark.sql import functions as F

from lamindb_spark.curation.curator import CategoricalSpec, CurationError
from lamindb_spark.curation.schema_check import SchemaSpec
from lamindb_spark.curation.slots import (
    AnnDataCurator,
    MuDataCurator,
    SlotSpec,
    SpatialDataCurator,
)
from lamindb_spark.sources.anndata_long import AnnDataLong
from lamindb_spark.sources.literals import literal_table
from lamindb_spark.sources.mudata_io import MuDataLong


@pytest.fixture(scope="module")
def cell_registry(spark):
    return literal_table(
        spark,
        [("T cell", "T-cell|T lymphocyte"), ("B cell", "B-cell"), ("monocyte", None)],
        ["name", "synonyms"],
    )


@pytest.fixture(scope="module")
def gene_registry(spark):
    return literal_table(
        spark, [("ENSG01", None), ("ENSG02", None), ("ENSG03", None)], ["ensembl", "synonyms"]
    )


def _adata(spark, cell_types=("T-cell", "B cell"), var_ids=("ENSG01", "ENSG02")):
    obs = literal_table(
        spark,
        [(f"c{i}", ct) for i, ct in enumerate(cell_types)],
        ["obs_id", "cell_type"],
    )
    var = literal_table(spark, [(v,) for v in var_ids], ["var_id"])
    x = literal_table(
        spark,
        [(f"c{i}", v, 1.0 + i) for i, _ in enumerate(cell_types) for v in var_ids],
        ["obs_id", "var_id", "value"],
    )
    return AnnDataLong(obs=obs, var=var, x=x)


def _slots(cell_registry, gene_registry):
    return {
        "obs": SlotSpec(
            spec=SchemaSpec(features={"obs_id": "string", "cell_type": "string"}),
            categoricals={
                "cell_type": CategoricalSpec(cell_registry, "name", "synonyms")
            },
        ),
        # long-form var index check = categorical on var_id (the
        # reference's itype=Gene.ensembl_gene_id on the var index)
        "var": SlotSpec(
            spec=SchemaSpec(features={"var_id": "string"}),
            categoricals={"var_id": CategoricalSpec(gene_registry, "ensembl")},
        ),
    }


def test_anndata_validate_fail_standardize_pass_annotate(
    spark, lakehouse, cell_registry, gene_registry
):
    ad = _adata(spark, cell_types=("T-cell", "NK cell"))
    cur = AnnDataCurator(ad, _slots(cell_registry, gene_registry))
    rep = cur.validate()
    assert not rep["is_valid"]
    # the failure sits in the RIGHT slot ('T-cell' is a synonym -> valid)
    assert rep["slots"]["obs"]["categoricals"] == {"cell_type": ["NK cell"]}
    assert rep["slots"]["var"]["is_valid"]
    with pytest.raises(CurationError):
        cur.save_artifact(lakehouse, "arrays/bad.anndata")

    # fixable frame: only a synonym violation -> standardize cures it
    ad2 = _adata(spark, cell_types=("T-cell", "B-cell"))
    cur2 = AnnDataCurator(ad2, _slots(cell_registry, gene_registry)).standardize()
    assert cur2.validate()["is_valid"]
    assert {r["cell_type"] for r in cur2._dataset.obs.collect()} == {
        "T cell", "B cell",
    }
    art = cur2.save_artifact(lakehouse, "arrays/pbmc.anndata")
    assert art["otype"] == "AnnDataLong"
    # annotations carry CANONICAL names from the obs slot + var ids
    feats = json.loads(lakehouse.describe_artifact("arrays/pbmc.anndata"))["features"]
    assert sorted(feats["cell_type"]) == ["B cell", "T cell"]
    assert sorted(feats["var_id"]) == ["ENSG01", "ENSG02"]
    # the saved long store round-trips through open_artifact
    back = lakehouse.open_artifact("arrays/pbmc.anndata")
    assert isinstance(back, AnnDataLong)
    assert back.x.count() == 4
    assert {r["cell_type"] for r in back.obs.collect()} == {"T cell", "B cell"}


def test_verdict_frame_is_distributed_and_complete(
    spark, cell_registry, gene_registry
):
    ad = _adata(
        spark, cell_types=("NK cell", "stromal"), var_ids=("ENSG01", "ENSGXX")
    )
    cur = AnnDataCurator(ad, _slots(cell_registry, gene_registry))
    verdict = cur.verdict_frame()
    assert verdict.columns == ["slot", "column", "invalid_value"]
    rows = {
        (r["slot"], r["column"], r["invalid_value"]) for r in verdict.collect()
    }
    assert rows == {
        ("obs", "cell_type", "NK cell"),
        ("obs", "cell_type", "stromal"),
        ("var", "var_id", "ENSGXX"),
    }


def test_uns_slot_validation(spark, cell_registry, gene_registry):
    ad = _adata(spark)
    slots = {
        "uns": SlotSpec(
            spec=SchemaSpec(features={"assay": "string", "organism": "string"})
        )
    }
    cur = AnnDataCurator(ad, slots, uns={"assay": "10x"})
    rep = cur.validate()
    assert not rep["is_valid"]
    assert rep["slots"]["uns"]["columns"]["missing"] == ["organism"]
    ok = AnnDataCurator(
        ad, slots, uns={"assay": "10x", "organism": "human"}
    )
    assert ok.validate()["is_valid"]
    # nested dict slot path
    nested = AnnDataCurator(
        ad,
        {"uns:qc": SlotSpec(spec=SchemaSpec(features={"doublet_rate": "double"}))},
        uns={"qc": {"doublet_rate": 0.05}},
    )
    assert nested.validate()["is_valid"]


def test_anndata_rejects_unknown_slots(spark, cell_registry, gene_registry):
    ad = _adata(spark)
    with pytest.raises(ValueError, match="var.T"):
        AnnDataCurator(
            ad, {"var.T": SlotSpec(spec=SchemaSpec(features={"var_id": "string"}))}
        )


def test_mudata_modality_slots_end_to_end(
    spark, lakehouse, cell_registry, gene_registry
):
    rna = _adata(spark, cell_types=("T-cell",), var_ids=("ENSG01",))
    adt = _adata(spark, cell_types=("B-cell",), var_ids=("ENSG02",))
    md = MuDataLong(modalities={"rna": rna, "adt": adt})
    slots = {
        "rna:obs": SlotSpec(
            spec=SchemaSpec(features={"obs_id": "string", "cell_type": "string"}),
            categoricals={
                "cell_type": CategoricalSpec(cell_registry, "name", "synonyms")
            },
        ),
        "adt:var": SlotSpec(
            spec=SchemaSpec(features={"var_id": "string"}),
            categoricals={"var_id": CategoricalSpec(gene_registry, "ensembl")},
        ),
    }
    cur = MuDataCurator(md, slots).standardize()
    assert cur.validate()["is_valid"]
    art = cur.save_artifact(lakehouse, "arrays/cite.mudata")
    assert art["otype"] == "MuDataLong"
    back = lakehouse.open_artifact("arrays/cite.mudata")
    assert isinstance(back, MuDataLong)
    assert back.mod_names == ["rna", "adt"]
    assert {r["cell_type"] for r in back["rna"].obs.collect()} == {"T cell"}

    with pytest.raises(KeyError, match="modality"):
        MuDataCurator(
            md,
            {"dna:obs": SlotSpec(spec=SchemaSpec(features={"obs_id": "string"}))},
        )


def test_spatialdata_table_and_points_slots(spark, cell_registry, gene_registry):
    from lamindb_spark.sources.spatialdata_io import SpatialDataLong

    table = _adata(spark, cell_types=("T-cell", "NK cell"))
    points = literal_table(
        spark, [(1.0, 2.0, "nucleus"), (3.0, 4.0, "membrane")], ["x", "y", "kind"]
    )
    sd = SpatialDataLong(path="/nonexistent", tables={"t0": table}, points={"p0": points})
    slots = {
        "tables:t0:obs": SlotSpec(
            spec=SchemaSpec(features={"obs_id": "string", "cell_type": "string"}),
            categoricals={
                "cell_type": CategoricalSpec(cell_registry, "name", "synonyms")
            },
        ),
        "points:p0": SlotSpec(
            spec=SchemaSpec(
                features={"x": "double", "y": "double", "kind": "string"}
            )
        ),
    }
    cur = SpatialDataCurator(sd, slots)
    rep = cur.validate()
    assert not rep["is_valid"]  # NK cell
    assert rep["slots"]["points:p0"]["is_valid"]
    assert rep["slots"]["tables:t0:obs"]["categoricals"] == {
        "cell_type": ["NK cell"]
    }


def test_external_features_slot(spark, lakehouse, cell_registry, gene_registry):
    """Reference core.py:528-544: the '__external__' slot validates a
    caller-supplied dict; declaring it without the dict raises; on
    save the values land as artifact annotations."""
    import json

    ad = _adata(spark, cell_types=("T-cell",))
    slots = {
        "obs": SlotSpec(
            spec=SchemaSpec(features={"obs_id": "string", "cell_type": "string"}),
            categoricals={
                "cell_type": CategoricalSpec(cell_registry, "name", "synonyms")
            },
        ),
        "__external__": SlotSpec(
            spec=SchemaSpec(features={"assay": "string", "organism": "string"})
        ),
    }
    with pytest.raises(Exception, match="external"):
        AnnDataCurator(ad, slots)  # declared but not provided

    bad = AnnDataCurator(ad, slots, external_features={"assay": "10x"})
    rep = bad.validate()
    assert not rep["is_valid"]
    assert rep["slots"]["__external__"]["columns"]["missing"] == ["organism"]

    ok = AnnDataCurator(
        ad, slots, external_features={"assay": "10x", "organism": "human"}
    ).standardize()
    assert ok.validate()["is_valid"]
    art = ok.save_artifact(lakehouse, "arrays/ext.anndata")
    feats = json.loads(lakehouse.describe_artifact("arrays/ext.anndata"))["features"]
    assert feats["assay"] == "10x" and feats["organism"] == "human"
    assert feats["cell_type"] == "T cell"


def test_saved_composite_schema_drives_curation(spark, lakehouse, cell_registry):
    """Reference flow: Schema(slots={'obs': obs_schema, 'var':
    var_schema}, otype='AnnData').save() then SlotsCurator(dataset,
    schema) — the engine persists flat schemas (schema +
    schema_features), composites (schema_components), and rehydrates
    them into a working AnnDataCurator."""
    from lamindb_spark.curation.slots import (
        curator_from_schema,
        save_composite_schema,
        save_feature_schema,
    )

    obs_schema = save_feature_schema(
        lakehouse, "obs-schema", {"obs_id": "str", "cell_type": "str"}
    )
    var_schema = save_feature_schema(
        lakehouse, "var-schema", {"var_id": "str"}
    )
    comp = save_composite_schema(
        lakehouse,
        "anndata-schema",
        {"obs": obs_schema["id"], "var": var_schema["id"]},
        otype="AnnData",
    )

    ad = _adata(spark, cell_types=("T-cell", "NK cell"))
    cur = curator_from_schema(
        lakehouse,
        ad,
        comp["id"],
        categoricals={
            "obs": {"cell_type": CategoricalSpec(cell_registry, "name", "synonyms")}
        },
    )
    assert isinstance(cur, AnnDataCurator)
    assert set(cur.slots) == {"obs", "var"}
    rep = cur.validate()
    assert not rep["is_valid"]
    assert rep["slots"]["obs"]["categoricals"] == {"cell_type": ["NK cell"]}
    assert rep["slots"]["var"]["is_valid"]

    # a frame missing a declared column fails the rehydrated flags
    from lamindb_spark.sources.anndata_long import AnnDataLong

    bad = AnnDataLong(
        obs=ad.obs.drop("cell_type"), var=ad.var, x=ad.x
    )
    rep2 = curator_from_schema(lakehouse, bad, comp["id"]).validate()
    assert rep2["slots"]["obs"]["columns"]["missing"] == ["cell_type"]

    # flat schema id -> error with guidance; unknown id -> KeyError
    with pytest.raises(ValueError, match="no slot components"):
        curator_from_schema(lakehouse, ad, obs_schema["id"])
    with pytest.raises(KeyError):
        curator_from_schema(lakehouse, ad, 99999)


def test_dict_curator(spark, cell_registry):
    """DictCurator (reference ExperimentalDictCurator): a plain dict
    validated/standardized like a one-row frame."""
    from lamindb_spark.curation.slots import DictCurator

    spec = SchemaSpec(
        features={"assay": "string", "n_cells": "bigint"}, maximal_set=False
    )
    cats = {"assay": CategoricalSpec(cell_registry, "name", "synonyms")}
    ok = DictCurator({"assay": "T cell", "n_cells": 100}, spec, cats)
    assert ok.validate()["is_valid"]
    # synonyms are VALID and standardize maps them to canonical
    syn = DictCurator({"assay": "T-cell", "n_cells": 5}, spec, cats)
    assert syn.validate()["is_valid"]
    assert syn.standardize().df.collect()[0]["assay"] == "T cell"
    # a value outside domain+synonyms fails in the right place
    bad = DictCurator({"assay": "NK cell", "n_cells": 5}, spec, cats)
    rep = bad.validate()
    assert not rep["is_valid"]
    assert rep["categoricals"] == {"assay": ["NK cell"]}
    # non-dict rejected, like the reference's InvalidArgument
    import pytest as _pytest

    with _pytest.raises(TypeError, match="dict"):
        DictCurator([("a", 1)], spec)
    # no active session -> descriptive error, not an AttributeError
    # deep inside _dict_frame (ADVICE r13); an explicit spark= works
    from pyspark.sql import SparkSession

    orig = SparkSession.getActiveSession
    try:
        SparkSession.getActiveSession = staticmethod(lambda: None)
        with _pytest.raises(RuntimeError, match="active SparkSession"):
            DictCurator({"assay": "T cell", "n_cells": 1}, spec, cats)
        explicit = DictCurator(
            {"assay": "T cell", "n_cells": 1}, spec, cats, spark=spark
        )
        assert explicit.validate()["is_valid"]
    finally:
        SparkSession.getActiveSession = orig
