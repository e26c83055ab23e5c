"""TiledbsomaExperimentCurator (curation/slots.py — VERDICT r12 #2;
reference ``curators/core.py:1434-1503``): a SOMA-shaped experiment
curated end-to-end — validate → fail → standardize → pass → save →
annotate — over the library-free Arrow-to-long bridge
(``sources/soma_io.py``)."""

import json

import pyarrow as pa
import pytest

from lamindb_spark.curation.curator import CategoricalSpec, CurationError
from lamindb_spark.curation.schema_check import SchemaSpec
from lamindb_spark.curation.slots import SlotSpec, TiledbsomaExperimentCurator
from lamindb_spark.sources.literals import literal_table
from lamindb_spark.sources.soma_io import (
    SomaExperimentLong,
    is_soma_long_store,
    read_soma_long_parquet,
    soma_experiment_to_long,
    write_soma_long_parquet,
)


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
        spark,
        [("ENSG01", None), ("ENSG02", None), ("PROT9", None)],
        ["ensembl", "synonyms"],
    )


def _experiment(spark, cell_types=("T-cell", "B cell")):
    """SOMA-schema Arrow tables: obs with soma_joinid + obs_id, two
    measurements (RNA, protein) each with var + COO X on joinids."""
    obs = pa.table(
        {
            "soma_joinid": list(range(len(cell_types))),
            "obs_id": [f"c{i}" for i in range(len(cell_types))],
            "cell_type": list(cell_types),
        }
    )
    rna_var = pa.table(
        {"soma_joinid": [0, 1], "var_id": ["ENSG01", "ENSG02"]}
    )
    rna_x = pa.table(
        {
            "soma_dim_0": [0, 0, 1],
            "soma_dim_1": [0, 1, 0],
            "soma_data": [1.0, 2.0, 3.0],
        }
    )
    prot_var = pa.table({"soma_joinid": [0], "var_id": ["PROT9"]})
    prot_x = pa.table(
        {"soma_dim_0": [0, 1], "soma_dim_1": [0, 0], "soma_data": [5.0, 6.0]}
    )
    return soma_experiment_to_long(
        spark, obs, {"RNA": (rna_var, rna_x), "protein": (prot_var, prot_x)}
    )


def _slots(cell_registry, gene_registry):
    return {
        "obs": SlotSpec(
            spec=SchemaSpec(
                features={"obs_id": "string", "cell_type": "string"},
                # the long bridge keeps soma_joinid; it is not validated
                maximal_set=False,
            ),
            categoricals={
                "cell_type": CategoricalSpec(cell_registry, "name", "synonyms")
            },
        ),
        # reference shorthand: ms:RNA validates the RNA var frame
        "ms:RNA": SlotSpec(
            spec=SchemaSpec(features={"var_id": "string"}, maximal_set=False),
            categoricals={"var_id": CategoricalSpec(gene_registry, "ensembl")},
        ),
        # explicit spelling for the second measurement
        "ms:protein:var": SlotSpec(
            spec=SchemaSpec(features={"var_id": "string"}, maximal_set=False),
            categoricals={"var_id": CategoricalSpec(gene_registry, "ensembl")},
        ),
    }


def test_arrow_bridge_shares_global_obs(spark):
    se = _experiment(spark)
    assert se.ms_names == ["RNA", "protein"]
    # obs is experiment-global and shared by reference into measurements
    assert se.measurements["RNA"].obs is se.obs
    assert se.measurements["protein"].obs is se.obs
    # COO joinids mapped onto the axis ids
    x = {(r["obs_id"], r["var_id"]): r["value"] for r in se["RNA"].x.collect()}
    assert x == {("c0", "ENSG01"): 1.0, ("c0", "ENSG02"): 2.0, ("c1", "ENSG01"): 3.0}


def test_validate_fail_standardize_pass_annotate(
    spark, lakehouse, cell_registry, gene_registry
):
    se = _experiment(spark, cell_types=("T-cell", "NK cell"))
    cur = TiledbsomaExperimentCurator(se, _slots(cell_registry, gene_registry))
    rep = cur.validate()
    assert not rep["is_valid"]
    # failure in the RIGHT slot: 'T-cell' is a synonym -> valid
    assert rep["slots"]["obs"]["categoricals"] == {"cell_type": ["NK cell"]}
    assert rep["slots"]["ms:RNA"]["is_valid"]
    assert rep["slots"]["ms:protein:var"]["is_valid"]
    with pytest.raises(CurationError):
        cur.save_artifact(lakehouse, "arrays/bad.soma")

    # fixable: synonym violations only -> standardize cures them
    se2 = _experiment(spark, cell_types=("T-cell", "B-cell"))
    cur2 = TiledbsomaExperimentCurator(
        se2, _slots(cell_registry, gene_registry)
    ).standardize()
    assert cur2.validate()["is_valid"]
    assert {r["cell_type"] for r in cur2._dataset.obs.collect()} == {
        "T cell",
        "B cell",
    }
    # standardized global obs propagated into EVERY measurement
    assert cur2._dataset.measurements["RNA"].obs is cur2._dataset.obs
    art = cur2.save_artifact(lakehouse, "arrays/pbmc.soma")
    assert art["otype"] == "SomaExperimentLong"
    feats = json.loads(lakehouse.describe_artifact("arrays/pbmc.soma"))["features"]
    assert sorted(feats["cell_type"]) == ["B cell", "T cell"]
    # var_id merged LAST-WINS across slots (protein slot wins; a
    # single value unwraps to a scalar, annotate's list semantics)
    assert feats["var_id"] == "PROT9"
    # round-trips through open_artifact as the typed long object
    back = lakehouse.open_artifact("arrays/pbmc.soma")
    assert isinstance(back, SomaExperimentLong)
    assert back.ms_names == ["RNA", "protein"]
    assert back.obs.count() == 2
    # load returns the object too (not a single-frame toPandas)
    loaded = lakehouse.load_artifact("arrays/pbmc.soma", is_run_input=False)
    assert isinstance(loaded, SomaExperimentLong)


def test_slot_resolution_errors(spark, cell_registry, gene_registry):
    se = _experiment(spark)
    with pytest.raises(ValueError, match="experiment-global"):
        TiledbsomaExperimentCurator(
            se,
            {"ms:RNA:obs": SlotSpec(spec=SchemaSpec(features={"obs_id": "string"}))},
        )
    with pytest.raises(KeyError, match="measurement 'ATAC'"):
        TiledbsomaExperimentCurator(
            se,
            {"ms:ATAC": SlotSpec(spec=SchemaSpec(features={"var_id": "string"}))},
        )
    with pytest.raises(ValueError, match="slots are"):
        TiledbsomaExperimentCurator(
            se, {"uns": SlotSpec(spec=SchemaSpec(features={"k": "string"}))}
        )
    with pytest.raises(TypeError, match="SomaExperimentLong"):
        TiledbsomaExperimentCurator(
            se.obs, {"obs": SlotSpec(spec=SchemaSpec(features={}))}
        )


def test_parquet_store_roundtrip(spark, tmp_path):
    se = _experiment(spark)
    path = str(tmp_path / "exp.somalong")
    write_soma_long_parquet(se, path)
    assert is_soma_long_store(path)
    back = read_soma_long_parquet(spark, path)
    assert back.ms_names == ["RNA", "protein"]
    assert back.obs.count() == 2
    assert back["protein"].x.count() == 2


def test_curator_from_schema_dispatch(spark, lakehouse, cell_registry):
    from lamindb_spark.curation.slots import (
        curator_from_schema,
        save_composite_schema,
        save_feature_schema,
    )

    obs_schema = save_feature_schema(
        lh=lakehouse, name="soma_obs", features={"obs_id": "str", "cell_type": "str"}
    )
    comp = save_composite_schema(
        lakehouse, "soma_exp", {"obs": obs_schema["id"]}, otype="tiledbsoma"
    )
    se = _experiment(spark, cell_types=("T cell", "B cell"))
    cur = curator_from_schema(
        lakehouse,
        se,
        comp["id"],
        categoricals={
            "obs": {"cell_type": CategoricalSpec(cell_registry, "name", "synonyms")}
        },
    )
    assert isinstance(cur, TiledbsomaExperimentCurator)
    assert cur.validate()["is_valid"]


def test_from_store_is_import_gated(spark):
    try:
        import tiledbsoma  # noqa: F401

        pytest.skip("tiledbsoma installed; gate n/a")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="tiledbsoma"):
        TiledbsomaExperimentCurator.from_store(
            spark, "/nonexistent/x.tiledbsoma", slots={}
        )
