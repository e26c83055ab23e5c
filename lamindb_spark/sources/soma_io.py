"""tiledbsoma payload ingest → the shared long-form tables.

The reference registers SOMA experiments with ``otype="tiledbsoma"``
(``Artifact.from_tiledbsoma``, ``lamindb/models/artifact.py:2642`` and
the ``.tiledbsoma`` suffix dispatch at ``artifact.py:791-795``) and
opens them through the tiledbsoma package. The TileDB fragment format
itself (R-tree indexed, filter-pipeline compressed) is a library-level
binary format, so this bridge is IMPORT-GATED: when ``tiledbsoma`` is
installed, a SOMA Experiment streams out as Arrow tables and lands in
the same :class:`~lamindb_spark.sources.anndata_long.AnnDataLong`
relational long form every other array payload uses — obs/var
dataframes plus COO X — after which slicing/pseudobulk/densification
are the stock distributed ops. Without the library, reads raise a
clear ImportError (the Spark-side contract, schemas, and registration
metadata still work and are tested).

SOMA's native layout is ALREADY the long form: ``X`` is a sparse
``SOMASparseNDArray`` of ``(soma_dim_0, soma_dim_1, soma_data)``
coordinates, which maps 1:1 onto our ``(obs_id, var_id, value)``
relation via each axis dataframe's ``soma_joinid``. At scale the
right pattern is the same as the other bridges: materialize the long
form to parquet partitioned on obs_id-hash once at registration, then
every downstream op is a pruned distributed scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .anndata_long import AnnDataLong

SOMA_SUFFIX = ".tiledbsoma"


def is_tiledbsoma_store(path: str) -> bool:
    """Reference parity (``artifact.py:791-795``): a directory whose
    suffix is ``.tiledbsoma``."""
    return path.rstrip("/").endswith(SOMA_SUFFIX) and os.path.isdir(path)


def _require_tiledbsoma():
    try:
        import tiledbsoma  # noqa: F401

        return tiledbsoma
    except ImportError as e:  # pragma: no cover - exercised via raises test
        raise ImportError(
            "reading .tiledbsoma stores requires the `tiledbsoma` package "
            "(TileDB's fragment format needs the library; there is no "
            "pure-python fallback). The registration/metadata path works "
            "without it."
        ) from e


def soma_tables_to_long(spark: SparkSession, obs_tbl, var_tbl, x_tbl) -> AnnDataLong:
    """SOMA-schema Arrow tables → :class:`AnnDataLong`.

    ``obs_tbl``/``var_tbl`` are axis dataframes carrying
    ``soma_joinid`` (plus optional ``obs_id``/``var_id`` id columns);
    ``x_tbl`` is the COO relation ``(soma_dim_0, soma_dim_1,
    soma_data)``. Pure Arrow/pandas → Spark mapping, so the bridge's
    data logic is testable without the tiledbsoma library itself.
    """
    obs_pdf = obs_tbl.to_pandas()
    var_pdf = var_tbl.to_pandas()
    x_pdf = x_tbl.to_pandas()

    obs_id_col = "obs_id" if "obs_id" in obs_pdf.columns else "soma_joinid"
    var_id_col = "var_id" if "var_id" in var_pdf.columns else "soma_joinid"
    # map COO joinid coordinates onto the axis ids (identity when the
    # axis id IS soma_joinid; a dict lookup otherwise)
    if obs_id_col != "soma_joinid":
        omap = dict(zip(obs_pdf["soma_joinid"], obs_pdf[obs_id_col]))
        x_pdf["soma_dim_0"] = x_pdf["soma_dim_0"].map(omap)
    if var_id_col != "soma_joinid":
        vmap = dict(zip(var_pdf["soma_joinid"], var_pdf[var_id_col]))
        x_pdf["soma_dim_1"] = x_pdf["soma_dim_1"].map(vmap)
    obs_pdf = obs_pdf.rename(columns={obs_id_col: "obs_id"})
    var_pdf = var_pdf.rename(columns={var_id_col: "var_id"})
    x_pdf = x_pdf.rename(
        columns={"soma_dim_0": "obs_id", "soma_dim_1": "var_id", "soma_data": "value"}
    )
    return AnnDataLong(
        obs=spark.createDataFrame(obs_pdf),
        var=spark.createDataFrame(var_pdf),
        x=spark.createDataFrame(x_pdf[["obs_id", "var_id", "value"]]),
    )


def read_tiledbsoma(
    spark: SparkSession,
    path: str,
    measurement: str | None = None,
    x_layer: str = "data",
) -> AnnDataLong:
    """SOMA Experiment → :class:`AnnDataLong` (obs, var, COO X).

    ``measurement`` defaults to the experiment's first measurement
    (usually ``"RNA"``); ``x_layer`` picks the X layer (``"data"`` by
    convention). Tables stream out of tiledbsoma as Arrow and enter
    Spark via :func:`soma_tables_to_long` — a driver-side eager read
    used at REGISTRATION time, same contract as the zarr/h5 bridges.
    """
    soma = _require_tiledbsoma()
    with soma.Experiment.open(path) as exp:
        obs_tbl = exp.obs.read().concat()
        ms_name = measurement or next(iter(exp.ms.keys()))
        ms = exp.ms[ms_name]
        var_tbl = ms.var.read().concat()
        x_tbl = ms.X[x_layer].read().tables().concat()
    return soma_tables_to_long(spark, obs_tbl, var_tbl, x_tbl)
