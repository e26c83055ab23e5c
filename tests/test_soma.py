"""tiledbsoma ingest bridge: the Arrow→long-form mapping is tested
library-free (SOMA's COO layout reproduced with plain pyarrow); only
the Experiment.open plumbing is import-gated."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from lamindb_spark.sources.soma_io import (
    SOMA_SUFFIX,
    is_tiledbsoma_store,
    read_tiledbsoma,
    soma_tables_to_long,
)


def test_store_detection(tmp_path):
    d = tmp_path / f"exp{SOMA_SUFFIX}"
    d.mkdir()
    assert is_tiledbsoma_store(str(d))
    assert not is_tiledbsoma_store(str(tmp_path / "plain.zarr"))
    assert not is_tiledbsoma_store(str(d) + ".missing")


def test_soma_tables_to_long_joinid_axes(spark):
    """Axis id = soma_joinid (the default SOMA layout): coordinates
    pass through unchanged."""
    obs = pa.table({"soma_joinid": [0, 1, 2], "cell_type": ["a", "b", "a"]})
    var = pa.table({"soma_joinid": [0, 1], "gene": ["g0", "g1"]})
    x = pa.table(
        {
            "soma_dim_0": [0, 0, 1, 2],
            "soma_dim_1": [0, 1, 0, 1],
            "soma_data": [1.0, 2.0, 4.0, 3.0],
        }
    )
    adata = soma_tables_to_long(spark, obs, var, x)
    assert adata.obs.count() == 3 and adata.var.count() == 2
    got = {(r["obs_id"], r["var_id"]): r["value"] for r in adata.x.collect()}
    assert got == {(0, 0): 1.0, (0, 1): 2.0, (1, 0): 4.0, (2, 1): 3.0}
    # the long form composes with AnnDataLong ops
    pb = adata.pseudobulk("cell_type")
    assert {r["cell_type"] for r in pb.collect()} == {"a", "b"}


def test_soma_tables_to_long_named_axes(spark):
    """Axis tables carrying explicit obs_id/var_id columns: COO
    coordinates remap through soma_joinid."""
    obs = pa.table({"soma_joinid": [0, 1], "obs_id": ["cellA", "cellB"]})
    var = pa.table({"soma_joinid": [0, 1], "var_id": ["geneX", "geneY"]})
    x = pa.table(
        {"soma_dim_0": [0, 1], "soma_dim_1": [1, 0], "soma_data": [5.0, 7.0]}
    )
    adata = soma_tables_to_long(spark, obs, var, x)
    got = {(r["obs_id"], r["var_id"]): r["value"] for r in adata.x.collect()}
    assert got == {("cellA", "geneY"): 5.0, ("cellB", "geneX"): 7.0}
    sliced = adata.slice(obs_filter=F.col("obs_id") == "cellA")
    assert sliced.x.count() == 1


def test_read_without_library_raises_clear_error(spark, tmp_path):
    try:
        import tiledbsoma  # noqa: F401

        pytest.skip("tiledbsoma installed; the real read path applies")
    except ImportError:
        pass
    d = tmp_path / f"exp{SOMA_SUFFIX}"
    d.mkdir()
    with pytest.raises(ImportError, match="tiledbsoma"):
        read_tiledbsoma(spark, str(d))


def test_registration_metadata_without_library(lakehouse, tmp_path):
    """A .tiledbsoma artifact registers (uid/suffix/size metadata) even
    without the reader library; only open_array needs it."""
    d = tmp_path / f"exp{SOMA_SUFFIX}"
    d.mkdir()
    (d / "obs").mkdir()
    (d / "obs" / "part.bin").write_bytes(b"\x00" * 64)
    art = lakehouse.register_artifact(str(d), key="soma/exp.tiledbsoma")
    assert art["suffix"] == SOMA_SUFFIX
