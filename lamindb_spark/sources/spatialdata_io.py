"""SpatialData payload ingest: spatial-omics ``.zarr`` stores →
relational long form (reference ``Artifact.from_spatialdata``,
``lamindb/models/artifact.py:2562-2641``, ``otype="SpatialData"``).

A SpatialData zarr store is a fixed top-level layout of element
groups:

- ``tables/<name>``  — AnnData trees (the molecular measurements) —
  decoded by the SAME shared path as :mod:`anndata_io`/:mod:`mudata_io`
  into :class:`AnnDataLong`.
- ``points/<name>``  — transcript/cell coordinates written as parquet
  under the element dir — read DIRECTLY by ``spark.read.parquet``
  (this is the one element kind that is already distributed-native;
  at scale points dominate row counts and Spark scans them in place).
- ``images/<name>`` / ``labels/<name>`` — NGFF multiscale arrays:
  metadata (axes, scale levels, per-level shape/dtype) is surfaced
  relationally; pixel payloads stay opaque zarr arrays readable
  per-level via :func:`read_image_level` (driver-side numpy, same
  contract as the reference's lazy image accessors) — raster pixels
  are not a relational object, and pretending otherwise would just
  materialize TBs of image into rows.
- ``shapes/<name>`` — polygons/circles; geometry parquet read like
  points when present.

At scale the same registration pattern as AnnData/MuData applies:
the bridge runs once at ingest, tables/points persist as parquet
partitioned on their natural keys, and every downstream op is a
distributed scan.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .anndata_io import _store_to_long, _zarr_meta, _zarr_read_array, _ZarrStore
from .anndata_long import AnnDataLong


@dataclass
class SpatialDataLong:
    """A SpatialData store bridged to Spark: AnnData tables in long
    form, points/shapes as DataFrames, raster elements as metadata."""

    path: str
    tables: dict[str, AnnDataLong] = field(default_factory=dict)
    points: dict[str, DataFrame] = field(default_factory=dict)
    shapes: dict[str, DataFrame] = field(default_factory=dict)
    images: dict[str, dict] = field(default_factory=dict)
    labels: dict[str, dict] = field(default_factory=dict)

    @property
    def element_names(self) -> dict[str, list[str]]:
        return {
            "tables": list(self.tables),
            "points": list(self.points),
            "shapes": list(self.shapes),
            "images": list(self.images),
            "labels": list(self.labels),
        }


def _ngff_meta(path: str) -> dict:
    """Image/label element → axes + per-level (path, shape, dtype)
    from the NGFF multiscales attrs and each level's .zarray."""
    store = _ZarrStore(path)
    attrs = store.attrs()
    ms = (attrs.get("multiscales") or [{}])[0]
    axes = [
        a["name"] if isinstance(a, dict) else a for a in ms.get("axes", [])
    ]
    levels = []
    for ds in ms.get("datasets", []) or (
        [{"path": k} for k in store.keys()] or [{"path": "."}]
    ):
        lp = os.path.join(path, ds["path"]) if ds["path"] != "." else path
        try:
            zmeta = _zarr_meta(lp, ".zarray")
        except OSError:
            continue
        levels.append(
            {
                "path": ds["path"],
                "shape": zmeta["shape"],
                "dtype": zmeta["dtype"],
                "transform": ds.get("coordinateTransformations"),
            }
        )
    return {"axes": axes, "levels": levels}


def _read_element_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """points/shapes elements store their frame as parquet file(s)
    somewhere under the element dir (spatialdata writes
    ``points.parquet``/``shapes.parquet``); glob them."""
    hits = []
    for dp, dirs, files in os.walk(path):
        hits += [os.path.join(dp, f) for f in files if f.endswith(".parquet")]
        pq_dirs = [d for d in dirs if d.endswith(".parquet")]
        hits += [os.path.join(dp, d) for d in pq_dirs]
        # a *.parquet dir is one dataset — don't descend into its parts
        for d in pq_dirs:
            dirs.remove(d)
    if not hits:
        return None
    return spark.read.parquet(*sorted(hits))


def read_spatialdata_zarr(spark: SparkSession, path: str) -> SpatialDataLong:
    """Open a SpatialData ``.zarr`` store. Tables decode through the
    shared AnnData path; points/shapes become parquet scans; raster
    elements surface NGFF metadata."""
    root = _ZarrStore(path)
    out = SpatialDataLong(path=path)
    if "tables" in root:
        for name in root["tables"].keys():
            out.tables[name] = _store_to_long(spark, root["tables"][name])
    elif "table" in root:  # pre-0.1 single-table layout
        for name in root["table"].keys():
            out.tables[name] = _store_to_long(spark, root["table"][name])
    for kind, sink in (("points", out.points), ("shapes", out.shapes)):
        if kind in root:
            for name in root[kind].keys():
                df = _read_element_parquet(
                    spark, os.path.join(path, kind, name)
                )
                if df is not None:
                    sink[name] = df
    for kind, sink in (("images", out.images), ("labels", out.labels)):
        if kind in root:
            for name in root[kind].keys():
                sink[name] = _ngff_meta(os.path.join(path, kind, name))
    if not any(
        (out.tables, out.points, out.shapes, out.images, out.labels)
    ):
        raise ValueError(
            f"{path!r} has none of tables/points/shapes/images/labels — "
            "not a SpatialData store"
        )
    return out


def read_image_level(path: str, element: str, level: str = "0"):
    """Raster pixels for one scale level of an image/label element —
    driver-side numpy via the vendored zarr reader (the reference's
    lazy accessor analogue; use the smallest level that answers the
    question)."""
    lp = os.path.join(path, element, level)
    return _zarr_read_array(lp if os.path.isdir(lp) else os.path.join(path, element))


def is_spatialdata_store(path: str) -> bool:
    """Suffix-blind sniff for artifact open dispatch: SpatialData
    stores have the fixed element-group layout (and, unlike MuData,
    no ``mod/``)."""
    store = _ZarrStore(path)
    if "mod" in store:
        return False
    return any(
        k in store for k in ("tables", "table", "points", "shapes", "images", "labels")
    )


def write_spatialdata_zarr(
    path: str,
    tables: dict[str, tuple] | None = None,
    points: dict[str, DataFrame] | None = None,
    images: dict[str, "object"] | None = None,
) -> None:
    """Write a minimal SpatialData zarr store — round-trip oracle for
    :func:`read_spatialdata_zarr` and an export sink for registered
    artifacts. ``tables`` maps name → (obs_pdf, var_pdf, dense_x);
    ``points`` maps name → Spark DataFrame (written as parquet inside
    the element); ``images`` maps name → numpy array (single-level
    NGFF layout with c/y/x axes)."""
    import numpy as np

    from .anndata_io import _zarr_write_array, _zarr_write_group, write_anndata_zarr

    _zarr_write_group(path, {"spatialdata_attrs": {"version": "0.1"}})
    for name, (obs, var, x) in (tables or {}).items():
        write_anndata_zarr(os.path.join(path, "tables", name), obs, var, x)
    if tables:
        _zarr_write_group(os.path.join(path, "tables"), {})
    for name, df in (points or {}).items():
        el = os.path.join(path, "points", name)
        _zarr_write_group(el, {"encoding-type": "ngff:points"})
        df.write.mode("overwrite").parquet(os.path.join(el, "points.parquet"))
    if points:
        _zarr_write_group(os.path.join(path, "points"), {})
    for name, arr in (images or {}).items():
        el = os.path.join(path, "images", name)
        arr = np.asarray(arr)
        _zarr_write_group(
            el,
            {
                "multiscales": [
                    {
                        "axes": [
                            {"name": n, "type": t}
                            for n, t in zip("cyx"[-arr.ndim:], ["channel", "space", "space"][-arr.ndim:])
                        ],
                        "datasets": [{"path": "0"}],
                    }
                ]
            },
        )
        _zarr_write_array(os.path.join(el, "0"), arr)
    if images:
        _zarr_write_group(os.path.join(path, "images"), {})
    with open(os.path.join(path, ".zattrs"), "w") as fh:
        json.dump({"spatialdata_attrs": {"version": "0.1"}}, fh)
