"""MuData payload ingest: multimodal ``.zarr`` / ``.h5mu`` stores →
one :class:`AnnDataLong` per modality (VERDICT r04 #5, SURVEY §2.1 S6).

The reference registers MuData artifacts with ``otype="MuData"``
(``Artifact.from_mudata``, ``lamindb/models/artifact.py:2502-2559``)
and opens them through the mudata package. Structurally a MuData store
is "a dict of AnnData": a root group (``encoding-type: MuData``) whose
``mod/`` subgroup holds one complete AnnData tree per modality (the
``mod-order`` attribute fixes modality order), plus optional global
``obs``/``var`` annotation dataframes.

Spark-native mapping: every modality goes through the SAME zarr/h5
AnnData decoding path (:mod:`anndata_io`) to long form; the multimodal
view is then a plain relational union with a ``modality`` column and
mudata-style ``modality:var_id`` namespacing — after which all of
:class:`AnnDataLong`'s ops (slice/pseudobulk/pivot) compose per
modality, and cross-modality queries are ordinary joins on ``obs_id``.

Like the AnnData readers, these are driver-side eager reads used at
REGISTRATION time; at scale you persist the union as parquet
partitioned on (modality, obs_id-hash) once and every downstream op is
a distributed scan with modality partition pruning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .anndata_io import (
    _decode_dataframe,
    _store_to_long,
    _zarr_write_group,
    _ZarrStore,
    write_anndata_zarr,
)
from .anndata_long import AnnDataLong


@dataclass
class MuDataLong:
    """A multimodal annotated matrix: named :class:`AnnDataLong` parts.

    ``obs`` is the optional GLOBAL observation table (mudata's root
    ``obs``); per-modality obs live on each part.
    """

    modalities: dict[str, AnnDataLong]
    obs: DataFrame | None = None

    def __getitem__(self, name: str) -> AnnDataLong:
        return self.modalities[name]

    @property
    def mod_names(self) -> list[str]:
        return list(self.modalities)

    def n_obs_per_modality(self) -> dict[str, int]:
        return {m: ad.obs.count() for m, ad in self.modalities.items()}

    def union_x(self) -> DataFrame:
        """All modalities' X as one long table
        ``(modality, obs_id, var_id, value)`` with mudata-style
        ``modality:var_id`` namespacing — lazy unions of the per-
        modality scans, no shuffle (union is not an exchange)."""
        parts = [
            ad.x.select(
                F.lit(m).alias("modality"),
                "obs_id",
                F.concat(F.lit(m + ":"), F.col("var_id")).alias("var_id"),
                "value",
            )
            for m, ad in self.modalities.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def union_var(self) -> DataFrame:
        """Global var table: per-modality var rows tagged and
        namespaced (mudata's outer-join global var, minus the
        modality-specific metadata columns, which stay per part)."""
        parts = [
            ad.var.select(
                F.lit(m).alias("modality"),
                F.concat(F.lit(m + ":"), F.col("var_id")).alias("var_id"),
            )
            for m, ad in self.modalities.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def paired_obs(self, how: str = "inner") -> DataFrame:
        """Observations present in ALL modalities (inner — mudata's
        ``intersect_obs``) or ANY (outer): the obs_id sets joined
        across parts."""
        out = None
        for ad in self.modalities.values():
            ids = ad.obs.select("obs_id")
            out = ids if out is None else out.join(ids, "obs_id", how)
        return out.distinct()


def read_mudata_zarr(spark: SparkSession, path: str) -> MuDataLong:
    """Open a MuData ``.zarr`` store: every ``mod/<name>`` subtree is
    decoded by the SAME AnnData path as :func:`read_anndata_zarr`;
    modality order follows the ``mod-order`` attribute when present.
    """
    root = _ZarrStore(path)
    if "mod" not in root:
        raise ValueError(f"{path!r} has no mod/ group — not a MuData store")
    mod = root["mod"]
    names = mod.attrs().get("mod-order") or mod.keys()
    modalities = {m: _store_to_long(spark, mod[m]) for m in names}
    obs = None
    if "obs" in root:
        obs_pdf = _decode_dataframe(root["obs"])
        obs_pdf = obs_pdf.rename(columns={obs_pdf.columns[0]: "obs_id"})
        obs = spark.createDataFrame(obs_pdf)
    return MuDataLong(modalities=modalities, obs=obs)


def _h5_root_to_mudata(spark: SparkSession, root, path: str) -> MuDataLong:
    if "mod" not in root:
        raise ValueError(f"{path!r} has no mod/ group — not a MuData file")
    mod = root["mod"]
    names = mod.attrs().get("mod-order") or mod.keys()
    modalities = {m: _store_to_long(spark, mod[m]) for m in names}
    obs = None
    if "obs" in root:
        obs_pdf = _decode_dataframe(root["obs"])
        obs_pdf = obs_pdf.rename(columns={obs_pdf.columns[0]: "obs_id"})
        obs = spark.createDataFrame(obs_pdf)
    return MuDataLong(modalities=modalities, obs=obs)


def read_h5mu(spark: SparkSession, path: str) -> MuDataLong:
    """Open an ``.h5mu`` file (HDF5 MuData flavor). Uses ``h5py`` when
    installed; otherwise falls back to the vendored pure-python HDF5
    reader (``sources/hdf5.py``) like :func:`anndata_io.read_h5ad`.
    The decoding below the store adapter is shared with (and tested
    via) :func:`read_mudata_zarr`."""
    try:
        import h5py
    except ImportError:
        from .hdf5 import open_h5

        return _h5_root_to_mudata(spark, open_h5(path), path)
    from .anndata_io import _H5Store

    with h5py.File(path, "r") as f:
        return _h5_root_to_mudata(spark, _H5Store(f), path)


def write_mudata_zarr(
    path: str,
    modalities: dict[str, tuple],
    x_format: str = "csr",
    global_obs=None,
) -> None:
    """Write a MuData zarr v2 store — root ``encoding-type: MuData``,
    ``mod/`` with ``mod-order``, one AnnData tree per modality (each
    written by :func:`write_anndata_zarr`). Export sink + round-trip
    oracle for :func:`read_mudata_zarr`.

    ``modalities`` maps name → ``(obs_pdf, var_pdf, dense_x)``.
    """
    import os

    _zarr_write_group(
        path, {"encoding-type": "MuData", "encoding-version": "0.1.0"}
    )
    _zarr_write_group(
        os.path.join(path, "mod"),
        {"mod-order": list(modalities)},
    )
    for name, (obs, var, x) in modalities.items():
        write_anndata_zarr(
            os.path.join(path, "mod", name), obs, var, x, x_format=x_format
        )
    if global_obs is not None:
        from .anndata_io import _zarr_write_dataframe

        _zarr_write_dataframe(
            os.path.join(path, "obs"), global_obs, global_obs.columns[0]
        )


def write_mudata_long_parquet(md: MuDataLong, path: str) -> None:
    """Persist a :class:`MuDataLong` as a parquet directory store:
    ``mod/<name>/{obs,var,X}`` per modality (each a
    :func:`~.anndata_long.write_anndata_long_parquet` store) plus an
    optional root ``obs/`` for the global observation table — the
    distributed counterpart of :func:`write_mudata_zarr` (see the
    long-store rationale in ``anndata_long.py``)."""
    import json as _json
    import os

    from .anndata_long import write_anndata_long_parquet

    os.makedirs(f"{path}/mod", exist_ok=True)
    for name, ad in md.modalities.items():
        write_anndata_long_parquet(ad, f"{path}/mod/{name}")
    # mod-order marker ('.'-prefixed: invisible to ingest walks)
    with open(f"{path}/mod/.mod-order.json", "w") as fh:
        _json.dump(list(md.modalities), fh)
    if md.obs is not None:
        md.obs.write.mode("overwrite").parquet(f"{path}/obs")


def read_mudata_long_parquet(spark: SparkSession, path: str) -> MuDataLong:
    """Open a long-form MuData parquet store written by
    :func:`write_mudata_long_parquet`."""
    import json as _json
    import os

    from .anndata_long import read_anndata_long_parquet

    try:
        with open(f"{path}/mod/.mod-order.json") as fh:
            names = _json.load(fh)
    except OSError:
        names = sorted(
            d for d in os.listdir(f"{path}/mod") if not d.startswith((".", "_"))
        )
    mods = {n: read_anndata_long_parquet(spark, f"{path}/mod/{n}") for n in names}
    obs = (
        spark.read.parquet(f"{path}/obs")
        if os.path.isdir(f"{path}/obs")
        else None
    )
    return MuDataLong(modalities=mods, obs=obs)


def is_mudata_long_store(path: str) -> bool:
    """Sniff: a directory with a mod/ of long-form AnnData stores."""
    import os

    from .anndata_long import is_anndata_long_store

    mod = os.path.join(path, "mod")
    if not os.path.isdir(mod):
        return False
    subs = [d for d in os.listdir(mod) if not d.startswith((".", "_"))]
    return bool(subs) and all(
        is_anndata_long_store(os.path.join(mod, d)) for d in subs
    )


def is_mudata_store(path: str) -> bool:
    """Suffix-blind sniff used by artifact open dispatch: a zarr dir
    whose root attrs say MuData (or that has a mod/ group)."""
    import os

    store = _ZarrStore(path)
    attrs = store.attrs()
    enc = str(attrs.get("encoding-type", ""))
    return enc.lower() == "mudata" or (
        "mod" in store and os.path.isdir(os.path.join(path, "mod"))
    )
