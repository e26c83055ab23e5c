"""AnnData payload ingest: ``.h5ad`` / ``.zarr`` → :class:`AnnDataLong`.

The reference opens stored AnnData through lazy accessors
(``lamindb/core/storage/_anndata_accessor.py:727`` registry-dispatched
h5py/zarr readers; suffix dispatch ``artifact.py:2920-3115``). The
Spark-native mapping is the long/coordinate form (``anndata_long.py``):
``obs`` / ``var`` metadata tables + sparse ``X`` triples.

Two storage flavors, one shared conversion:

- ``read_h5ad`` — the HDF5 flavor, via the public ``h5py`` API.
  Import-gated: this container does not ship h5py, so the adapter is
  thin and the conversion logic it feeds is the SAME code path the
  fully-tested zarr flavor uses.
- ``read_anndata_zarr`` — the zarr flavor, implemented directly
  against the public zarr v2 on-disk spec (JSON metadata + raw/zlib
  chunk files) with numpy + stdlib only, so it is real and tested
  in-container. Supports the anndata element encodings: dataframe
  groups, numeric/string/boolean arrays, categoricals, dense X, and
  csr/csc groups. Compressors: none, zlib, gzip (blosc needs the
  numcodecs wheel — raise with guidance).

Both readers are driver-side eager reads (like the reference's
loaders): the bridge is for REGISTERING an array payload into the
lakehouse — at scale you run it once per file in an ingest job and
persist the long form as parquet partitioned on ``obs_id``; every
downstream op is then a distributed scan.

``write_anndata_zarr`` is the matching export sink (and the test
oracle): it writes the same layout anndata produces with
``compressor=zlib``.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

from pyspark.sql import SparkSession

from .anndata_long import AnnDataLong

# --------------------------------------------------------------- zarr v2 io


def _zarr_meta(path: str, name: str) -> dict:
    with open(os.path.join(path, name)) as fh:
        return json.load(fh)


def _zarr_attrs(path: str) -> dict:
    try:
        return _zarr_meta(path, ".zattrs")
    except OSError:
        return {}


def _decompress(buf: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(buf)
    if cid == "gzip":
        import gzip

        return gzip.decompress(buf)
    raise NotImplementedError(
        f"zarr compressor {cid!r} needs the numcodecs package; re-write the "
        "store with compressor=None or zlib (anndata supports both)"
    )


def _zarr_read_array(path: str) -> np.ndarray:
    """One zarr v2 array: .zarray metadata + chunk grid files."""
    meta = _zarr_meta(path, ".zarray")
    if meta.get("filters"):
        raise NotImplementedError(
            "zarr filters (e.g. vlen-utf8) need numcodecs; write string "
            "columns as fixed-width unicode instead"
        )
    order = meta.get("order", "C")
    if order not in ("C", "F"):
        raise NotImplementedError(f"unsupported zarr chunk order {order!r}")
    dtype = np.dtype(meta["dtype"])
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"]) if meta["chunks"] else shape
    fill = meta.get("fill_value")
    if fill is None or (isinstance(fill, str) and dtype.kind not in ("U", "S")):
        fill = 0
    out = np.full(shape, fill, dtype=dtype) if shape else np.zeros((), dtype=dtype)
    if not shape:  # 0-d scalar
        return out
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    import itertools

    for idx in itertools.product(*grid):
        fname = ".".join(str(i) for i in idx)
        fpath = os.path.join(path, fname)
        if not os.path.exists(fpath):
            continue  # missing chunk = fill_value
        with open(fpath, "rb") as fh:
            raw = _decompress(fh.read(), meta.get("compressor"))
        # F-order chunks (written by column-major producers, e.g. R/
        # Julia anndata exporters) differ only in the buffer layout
        chunk = np.frombuffer(raw, dtype=dtype).reshape(chunks, order=order)
        sel_out, sel_chunk = [], []
        for i, (ci, c, s) in enumerate(zip(idx, chunks, shape)):
            start = ci * c
            stop = min(start + c, s)
            sel_out.append(slice(start, stop))
            sel_chunk.append(slice(0, stop - start))
        out[tuple(sel_out)] = chunk[tuple(sel_chunk)]
    return out


class _ZarrStore:
    """Minimal tree adapter over a zarr v2 directory store."""

    def __init__(self, path: str):
        self.path = path

    def attrs(self) -> dict:
        return _zarr_attrs(self.path)

    def is_array(self) -> bool:
        return os.path.exists(os.path.join(self.path, ".zarray"))

    def array(self) -> np.ndarray:
        return _zarr_read_array(self.path)

    def keys(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.path)
            if not d.startswith(".")
            and os.path.isdir(os.path.join(self.path, d))
        )

    def __getitem__(self, name: str) -> "_ZarrStore":
        return _ZarrStore(os.path.join(self.path, name))

    def __contains__(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.path, name))


class _H5Store:
    """Same adapter over an open h5py group (untested in-container —
    h5py is not shipped here; the conversion below is shared with and
    covered by the zarr tests)."""

    def __init__(self, h5obj):
        self.h5 = h5obj

    def attrs(self) -> dict:
        out = {}
        for k, v in self.h5.attrs.items():
            if isinstance(v, bytes):
                v = v.decode()
            elif isinstance(v, np.ndarray):
                v = [x.decode() if isinstance(x, bytes) else x for x in v.tolist()]
            elif isinstance(v, np.generic):
                v = v.item()
            out[k] = v
        return out

    def is_array(self) -> bool:
        import h5py

        return isinstance(self.h5, h5py.Dataset)

    def array(self) -> np.ndarray:
        ds = self.h5
        if ds.dtype.kind == "O":  # vlen str
            return ds.asstr()[...]
        return ds[...]

    def keys(self) -> list[str]:
        return sorted(self.h5.keys())

    def __getitem__(self, name: str):
        return _H5Store(self.h5[name])

    def __contains__(self, name: str) -> bool:
        return name in self.h5


# ------------------------------------------------- shared element decoding


def _decode_column(node) -> np.ndarray:
    """One obs/var column: plain array or categorical group."""
    if node.is_array():
        arr = node.array()
        if arr.dtype.kind == "S":
            arr = arr.astype(str)
        return arr
    attrs = node.attrs()
    enc = attrs.get("encoding-type", "")
    if enc == "categorical" or ("codes" in node and "categories" in node):
        codes = node["codes"].array().astype(np.int64)
        cats = node["categories"].array()
        if cats.dtype.kind == "S":
            cats = cats.astype(str)
        out = np.empty(len(codes), dtype=object)
        mask = codes >= 0
        out[mask] = cats[codes[mask]]
        out[~mask] = None
        return out
    raise NotImplementedError(f"unsupported column encoding {enc!r}")


def _decode_dataframe(node) -> "object":
    """An anndata dataframe group → pandas DataFrame with the stored
    ``_index`` as the first column."""
    import pandas as pd

    attrs = node.attrs()
    index_name = attrs.get("_index", "_index")
    order = attrs.get("column-order")
    cols = [c for c in (order if order is not None else node.keys()) if c != index_name]
    data = {index_name: _decode_column(node[index_name])}
    for c in cols:
        data[c] = _decode_column(node[c])
    return pd.DataFrame(data)


def _decode_x_long(node) -> "object":
    """X (dense array or csr/csc group) → pandas (row, col, value) of
    the non-zero entries."""
    import pandas as pd

    if node.is_array():
        mat = node.array()
        rows, cols = np.nonzero(mat)
        return pd.DataFrame(
            {"__row": rows, "__col": cols, "value": mat[rows, cols].astype(np.float64)}
        )
    attrs = node.attrs()
    enc = attrs.get("encoding-type", "")
    data = node["data"].array().astype(np.float64)
    indices = node["indices"].array().astype(np.int64)
    indptr = node["indptr"].array().astype(np.int64)
    counts = np.diff(indptr)
    major = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if enc == "csc_matrix":
        rows, cols = indices, major
    else:  # csr (anndata default for sparse)
        rows, cols = major, indices
    return pd.DataFrame({"__row": rows, "__col": cols, "value": data})


def _store_to_long(spark: SparkSession, root) -> AnnDataLong:
    """Shared conversion: AnnData tree → long-form Spark tables.

    ``obs_id`` / ``var_id`` are the stored dataframe indices; X joins
    them positionally (CSR/CSC coordinates are positional by spec)."""
    import pandas as pd

    obs_pdf = _decode_dataframe(root["obs"])
    var_pdf = _decode_dataframe(root["var"])
    obs_index = obs_pdf.columns[0]
    var_index = var_pdf.columns[0]
    obs_pdf = obs_pdf.rename(columns={obs_index: "obs_id"})
    var_pdf = var_pdf.rename(columns={var_index: "var_id"})
    x_pdf = _decode_x_long(root["X"])
    x_pdf = pd.DataFrame(
        {
            "obs_id": obs_pdf["obs_id"].to_numpy()[x_pdf["__row"].to_numpy()],
            "var_id": var_pdf["var_id"].to_numpy()[x_pdf["__col"].to_numpy()],
            "value": x_pdf["value"].to_numpy(),
        }
    )
    return AnnDataLong(
        obs=spark.createDataFrame(obs_pdf),
        var=spark.createDataFrame(var_pdf),
        x=spark.createDataFrame(x_pdf),
    )


# ------------------------------------------------------------- public api


def read_anndata_zarr(spark: SparkSession, path: str) -> AnnDataLong:
    """Open an AnnData ``.zarr`` store (anndata's zarr flavor) as long
    form. Pure python/numpy — see module docstring for the supported
    encoding subset."""
    return _store_to_long(spark, _ZarrStore(path))


def read_h5ad(spark: SparkSession, path: str) -> AnnDataLong:
    """Open an ``.h5ad`` file as long form (reference
    ``_anndata_accessor.py:727``). Uses ``h5py`` when installed;
    otherwise falls back to the VENDORED pure-python HDF5 reader
    (``sources/hdf5.py`` — superblock v0/v2/v3, symbol-table groups,
    contiguous/chunked layouts with gzip/shuffle/fletcher32, vlen
    strings), so the h5ad flavor works and is tested in environments
    without libhdf5. The decoding pipeline below the store adapter is
    shared with :func:`read_anndata_zarr`."""
    try:
        import h5py
    except ImportError:
        from .hdf5 import open_h5

        return _store_to_long(spark, open_h5(path))
    with h5py.File(path, "r") as f:
        return _store_to_long(spark, _H5Store(f))


def write_h5ad(
    path: str,
    obs,
    var,
    x: "np.ndarray",
    x_format: str = "dense",
    obs_index: str = "obs_id",
    var_index: str = "var_id",
    chunks: tuple | None = None,
) -> None:
    """Write an AnnData ``.h5ad`` (HDF5) file via the vendored writer
    (``sources/hdf5.py``) — no libhdf5 needed. Mirrors
    :func:`write_anndata_zarr`: dataframe groups with ``_index``/
    ``column-order`` attrs, categorical groups for nullable string
    columns, dense or CSR ``X`` (optionally chunked+gzip). Export sink
    + in-container round-trip oracle for :func:`read_h5ad`."""
    from .hdf5 import H5Writer

    w = H5Writer()
    w.group("/", {"encoding-type": "anndata", "encoding-version": "0.1.0"})
    for name, pdf, idx in (("obs", obs, obs_index), ("var", var, var_index)):
        cols = [c for c in pdf.columns if c != idx]
        w.group(
            name,
            {
                "encoding-type": "dataframe",
                "encoding-version": "0.2.0",
                "_index": idx,
                "column-order": cols,
            },
        )
        w.dataset(f"{name}/{idx}", pdf[idx].to_numpy())
        for c in cols:
            arr = pdf[c].to_numpy()
            if arr.dtype.kind == "O" and pdf[c].isna().any():
                cats = sorted({v for v in arr if v is not None})
                cat_idx = {v: i for i, v in enumerate(cats)}
                codes = np.array([cat_idx.get(v, -1) for v in arr], dtype=np.int64)
                w.group(
                    f"{name}/{c}",
                    {"encoding-type": "categorical", "encoding-version": "0.2.0"},
                )
                w.dataset(f"{name}/{c}/codes", codes)
                w.dataset(f"{name}/{c}/categories", np.array(cats, dtype=str))
            else:
                w.dataset(f"{name}/{c}", arr)
    x = np.asarray(x, dtype=np.float64)
    if x_format == "dense":
        w.dataset(
            "X", x,
            attrs={"encoding-type": "array", "encoding-version": "0.2.0"},
            chunks=chunks, gzip_level=4 if chunks else None,
        )
    elif x_format == "csr":
        rows, cols_nz = np.nonzero(x)
        data = x[rows, cols_nz]
        indptr = np.zeros(x.shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        indptr = np.cumsum(indptr)
        w.group(
            "X",
            {"encoding-type": "csr_matrix", "encoding-version": "0.1.0",
             "shape": [int(x.shape[0]), int(x.shape[1])]},
        )
        w.dataset("X/data", data)
        w.dataset("X/indices", cols_nz.astype(np.int64))
        w.dataset("X/indptr", indptr)
    else:
        raise ValueError("x_format must be 'dense' or 'csr'")
    w.save(path)


# ------------------------------------------------------------ zarr writer


def _zarr_write_array(path: str, arr: np.ndarray, chunks: tuple | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    arr = np.ascontiguousarray(arr)
    if arr.dtype.kind == "O":
        arr = arr.astype(str)
    chunks = tuple(chunks or arr.shape) or (1,)
    shape = arr.shape or (0,)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "compressor": {"id": "zlib", "level": 5},
        "fill_value": 0 if arr.dtype.kind not in ("U", "S") else "",
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as fh:
        json.dump(meta, fh)
    import itertools

    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    for idx in itertools.product(*grid):
        sel = tuple(
            slice(ci * c, min(ci * c + c, s)) for ci, c, s in zip(idx, chunks, shape)
        )
        chunk = arr[sel]
        # pad edge chunks to full chunk shape (zarr chunks are full-size)
        if chunk.shape != chunks:
            pad = np.zeros(chunks, dtype=arr.dtype)
            pad[tuple(slice(0, d) for d in chunk.shape)] = chunk
            chunk = pad
        buf = zlib.compress(np.ascontiguousarray(chunk).tobytes(), 5)
        with open(os.path.join(path, ".".join(str(i) for i in idx)), "wb") as fh:
            fh.write(buf)


def _zarr_write_group(path: str, attrs: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as fh:
        json.dump({"zarr_format": 2}, fh)
    with open(os.path.join(path, ".zattrs"), "w") as fh:
        json.dump(attrs, fh)


def _zarr_write_dataframe(path: str, pdf, index_col: str) -> None:
    cols = [c for c in pdf.columns if c != index_col]
    _zarr_write_group(
        path,
        {
            "encoding-type": "dataframe",
            "encoding-version": "0.2.0",
            "_index": index_col,
            "column-order": cols,
        },
    )
    _zarr_write_array(os.path.join(path, index_col), pdf[index_col].to_numpy())
    for c in cols:
        arr = pdf[c].to_numpy()
        if arr.dtype.kind == "O" and pdf[c].isna().any():
            # nullable string → categorical (codes/categories), the
            # anndata encoding for nullable category columns
            cats = sorted({v for v in arr if v is not None})
            cat_idx = {v: i for i, v in enumerate(cats)}
            codes = np.array([cat_idx.get(v, -1) for v in arr], dtype=np.int64)
            gpath = os.path.join(path, c)
            _zarr_write_group(
                gpath,
                {"encoding-type": "categorical", "encoding-version": "0.2.0",
                 "ordered": False},
            )
            _zarr_write_array(os.path.join(gpath, "codes"), codes)
            _zarr_write_array(
                os.path.join(gpath, "categories"), np.array(cats, dtype=str)
            )
        else:
            _zarr_write_array(os.path.join(path, c), arr)


def write_anndata_zarr(
    path: str,
    obs,
    var,
    x: np.ndarray,
    x_format: str = "csr",
    obs_index: str = "obs_id",
    var_index: str = "var_id",
) -> None:
    """Write an AnnData zarr v2 store (dense or CSR ``X``) — the layout
    anndata itself writes with ``compressor=zlib`` — from pandas
    obs/var and a dense numpy matrix. Export sink + round-trip oracle
    for :func:`read_anndata_zarr`."""
    _zarr_write_group(
        path, {"encoding-type": "anndata", "encoding-version": "0.1.0"}
    )
    _zarr_write_dataframe(os.path.join(path, "obs"), obs, obs_index)
    _zarr_write_dataframe(os.path.join(path, "var"), var, var_index)
    xpath = os.path.join(path, "X")
    x = np.asarray(x, dtype=np.float64)
    if x_format == "dense":
        # row-chunked so the multi-chunk read path is exercised/real
        _zarr_write_array(xpath, x, chunks=(max(1, min(2, x.shape[0])), x.shape[1]))
        with open(os.path.join(xpath, ".zattrs"), "w") as fh:
            json.dump({"encoding-type": "array", "encoding-version": "0.2.0"}, fh)
        return
    if x_format != "csr":
        raise ValueError("x_format must be 'dense' or 'csr'")
    # CSR from dense without scipy: pure numpy
    rows, cols = np.nonzero(x)
    data = x[rows, cols]
    indptr = np.zeros(x.shape[0] + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr)
    _zarr_write_group(
        xpath,
        {"encoding-type": "csr_matrix", "encoding-version": "0.1.0",
         "shape": [int(x.shape[0]), int(x.shape[1])]},
    )
    _zarr_write_array(os.path.join(xpath, "data"), data)
    _zarr_write_array(os.path.join(xpath, "indices"), cols.astype(np.int64))
    _zarr_write_array(os.path.join(xpath, "indptr"), indptr)
