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
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

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


def _obs_to_pandas(obs_tbl):
    """obs Arrow table → (pandas frame with the id column renamed to
    obs_id, the joinid→id map for COO coordinate mapping, or None when
    the axis id IS soma_joinid)."""
    obs_pdf = obs_tbl.to_pandas()
    obs_id_col = "obs_id" if "obs_id" in obs_pdf.columns else "soma_joinid"
    omap = (
        dict(zip(obs_pdf["soma_joinid"], obs_pdf[obs_id_col]))
        if obs_id_col != "soma_joinid"
        else None
    )
    return obs_pdf.rename(columns={obs_id_col: "obs_id"}), omap


def _measurement_to_long(spark, obs_df, omap, var_tbl, x_tbl) -> AnnDataLong:
    """(var, X) Arrow tables + an ALREADY-CONVERTED obs DataFrame →
    :class:`AnnDataLong` — the obs conversion happens once per
    experiment, not once per measurement (review finding: the shared
    global obs was converted N times and N−1 discarded)."""
    var_pdf = var_tbl.to_pandas()
    x_pdf = x_tbl.to_pandas()
    var_id_col = "var_id" if "var_id" in var_pdf.columns else "soma_joinid"
    # map COO joinid coordinates onto the axis ids (identity when the
    # axis id IS soma_joinid; a dict lookup otherwise)
    if omap is not None:
        x_pdf["soma_dim_0"] = x_pdf["soma_dim_0"].map(omap)
    if var_id_col != "soma_joinid":
        vmap = dict(zip(var_pdf["soma_joinid"], var_pdf[var_id_col]))
        x_pdf["soma_dim_1"] = x_pdf["soma_dim_1"].map(vmap)
    var_pdf = var_pdf.rename(columns={var_id_col: "var_id"})
    x_pdf = x_pdf.rename(
        columns={"soma_dim_0": "obs_id", "soma_dim_1": "var_id", "soma_data": "value"}
    )
    return AnnDataLong(
        obs=obs_df,
        var=spark.createDataFrame(var_pdf),
        x=spark.createDataFrame(x_pdf[["obs_id", "var_id", "value"]]),
    )


def soma_tables_to_long(spark: SparkSession, obs_tbl, var_tbl, x_tbl) -> AnnDataLong:
    """SOMA-schema Arrow tables → :class:`AnnDataLong`.

    ``obs_tbl``/``var_tbl`` are axis dataframes carrying
    ``soma_joinid`` (plus optional ``obs_id``/``var_id`` id columns);
    ``x_tbl`` is the COO relation ``(soma_dim_0, soma_dim_1,
    soma_data)``. Pure Arrow/pandas → Spark mapping, so the bridge's
    data logic is testable without the tiledbsoma library itself.
    """
    obs_pdf, omap = _obs_to_pandas(obs_tbl)
    return _measurement_to_long(
        spark, spark.createDataFrame(obs_pdf), omap, var_tbl, x_tbl
    )


@dataclass
class SomaExperimentLong:
    """A SOMA Experiment in relational long form: the experiment-GLOBAL
    observation table plus one (var, X) pair per measurement — SOMA's
    own layout (``obs`` lives on the Experiment, ``var``/``X`` under
    ``ms/<name>``), so the mapping adds nothing.

    Measurements are :class:`AnnDataLong` values whose ``obs`` IS the
    shared global table — per-measurement slicing/pseudobulk work
    unchanged, and a curator standardizing ``obs`` standardizes it once
    for every measurement.
    """

    obs: DataFrame
    measurements: dict[str, AnnDataLong]

    def __getitem__(self, name: str) -> AnnDataLong:
        return self.measurements[name]

    @property
    def ms_names(self) -> list[str]:
        return list(self.measurements)


def soma_experiment_to_long(
    spark: SparkSession, obs_tbl, measurements: dict[str, tuple]
) -> SomaExperimentLong:
    """SOMA-schema Arrow tables → :class:`SomaExperimentLong`.

    ``measurements`` maps name → ``(var_tbl, x_tbl)``. Pure
    Arrow/pandas → Spark mapping, testable without the tiledbsoma
    library; the shared global obs converts ONCE and every measurement
    references the same DataFrame.
    """
    if not measurements:
        raise ValueError("a SOMA experiment needs at least one measurement")
    obs_pdf, omap = _obs_to_pandas(obs_tbl)
    obs = spark.createDataFrame(obs_pdf)
    return SomaExperimentLong(
        obs=obs,
        measurements={
            name: _measurement_to_long(spark, obs, omap, var_tbl, x_tbl)
            for name, (var_tbl, x_tbl) in measurements.items()
        },
    )


def read_tiledbsoma_experiment(
    spark: SparkSession, path: str, x_layer: str = "data"
) -> SomaExperimentLong:
    """SOMA Experiment → :class:`SomaExperimentLong` with EVERY
    measurement (the multi-measurement sibling of
    :func:`read_tiledbsoma`, which picks one). Import-gated like all
    tiledbsoma reads; used by the experiment curator's ``from_store``.
    """
    soma = _require_tiledbsoma()
    with soma.Experiment.open(path) as exp:
        obs_tbl = exp.obs.read().concat()
        ms = {
            name: (
                exp.ms[name].var.read().concat(),
                exp.ms[name].X[x_layer].read().tables().concat(),
            )
            for name in exp.ms.keys()
        }
    return soma_experiment_to_long(spark, obs_tbl, ms)


def write_soma_long_parquet(se: SomaExperimentLong, path: str) -> None:
    """Persist a :class:`SomaExperimentLong` as a parquet directory
    store: root ``obs/`` (written once — it is shared) plus
    ``ms/<name>/{var,X}`` per measurement; measurement order rides a
    '.'-prefixed marker invisible to ingest walks (same conventions as
    ``write_mudata_long_parquet``)."""
    import json as _json
    import os

    se.obs.write.mode("overwrite").parquet(f"{path}/obs")
    os.makedirs(f"{path}/ms", exist_ok=True)
    for name, ad in se.measurements.items():
        ad.var.write.mode("overwrite").parquet(f"{path}/ms/{name}/var")
        ad.x.write.mode("overwrite").parquet(f"{path}/ms/{name}/X")
    with open(f"{path}/ms/.ms-order.json", "w") as fh:
        _json.dump(list(se.measurements), fh)


def read_soma_long_parquet(spark: SparkSession, path: str) -> SomaExperimentLong:
    """Open a long-form SOMA experiment store written by
    :func:`write_soma_long_parquet`."""
    import json as _json
    import os

    try:
        with open(f"{path}/ms/.ms-order.json") as fh:
            names = _json.load(fh)
    except OSError:
        names = sorted(
            d for d in os.listdir(f"{path}/ms") if not d.startswith((".", "_"))
        )
    obs = spark.read.parquet(f"{path}/obs")
    ms = {
        n: AnnDataLong(
            obs=obs,
            var=spark.read.parquet(f"{path}/ms/{n}/var"),
            x=spark.read.parquet(f"{path}/ms/{n}/X"),
        )
        for n in names
    }
    return SomaExperimentLong(obs=obs, measurements=ms)


def is_soma_long_store(path: str) -> bool:
    """Sniff: a directory with root obs/ parquet and an ms/ of
    (var, X) parquet pairs."""
    ms = os.path.join(path, "ms")
    if not os.path.isdir(os.path.join(path, "obs")) or not os.path.isdir(ms):
        return False
    subs = [d for d in os.listdir(ms) if not d.startswith((".", "_"))]
    return bool(subs) and all(
        os.path.isdir(os.path.join(ms, d, "var"))
        and os.path.isdir(os.path.join(ms, d, "X"))
        for d in subs
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
