"""Suffix-dispatched in-memory artifact loaders.

Reference ``core/loaders.py:43-232`` ``FILE_LOADERS``/``load_to_memory``
— ``Artifact.load()`` dispatches on the payload suffix: tabular files
become DataFrames, ``.json``/``.yaml`` become dicts/lists, ``.txt``/
``.fasta`` become strings, display formats (``.html``/``.svg``/images)
return the local path (the reference returns a notebook display object
in IPython; an engine has no notebook, so the path — the reference's
own non-interactive fallback — is the contract here), and unknown
suffixes raise NotImplementedError pointing at the raw-path API.

Engine split: DISTRIBUTED suffixes (.parquet/.csv/.tsv/.orc/.json
lines and the array stores) stay on the Spark path in
``Lakehouse.open_artifact`` — a 100 TB payload must never be "loaded
to memory". This module covers the driver-sized tail: config files,
reports, small documents. ``load_to_memory`` therefore refuses files
above ``max_bytes`` (default 256 MiB) instead of OOM-ing the driver.
"""

from __future__ import annotations

import gzip
import json
import os
from typing import Any

# multi-part suffixes checked before the plain splitext suffix
# (reference CanonicalSuffix.extract_from_path)
_COMPOUND = (".csv.gz", ".tsv.gz", ".txt.gz", ".json.gz", ".vitessce.json")

_PATH_SUFFIXES = (".html", ".svg", ".png", ".jpg", ".jpeg", ".gif", ".pdf")
_TEXT_SUFFIXES = (".txt", ".fasta", ".md", ".log")

MAX_DRIVER_BYTES = 256 * 1024 * 1024


def canonical_suffix(path: str) -> str:
    name = os.path.basename(path).lower()
    for sfx in _COMPOUND:
        if name.endswith(sfx):
            return sfx
    return os.path.splitext(name)[1]


def _read_bytes(path: str, suffix: str) -> bytes:
    if suffix.endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            return fh.read()
    with open(path, "rb") as fh:
        return fh.read()


def load_to_memory(path: str, max_bytes: int = MAX_DRIVER_BYTES) -> Any:
    """Load a driver-sized file into memory by suffix (reference
    ``load_to_memory``, ``loaders.py:217-232``)."""
    suffix = canonical_suffix(path)
    size = os.path.getsize(path) if os.path.isfile(path) else None
    if size is not None and size > max_bytes:
        raise ValueError(
            f"{path} is {size} bytes — too large to load to driver memory "
            f"(max {max_bytes}); use the Spark path (open_artifact) instead"
        )
    if suffix in _PATH_SUFFIXES:
        return path  # display formats: the non-interactive contract is the path
    if suffix in (".csv.gz", ".tsv.gz"):
        # reference FILE_LOADERS maps compressed csv/tsv to load_csv
        # (pandas handles the decompression); the UNcompressed forms
        # load distributed via open_artifact and never reach here
        import io

        import pandas as pd

        return pd.read_csv(
            io.BytesIO(_read_bytes(path, suffix)),
            sep="\t" if suffix.startswith(".tsv") else ",",
        )
    if suffix in _TEXT_SUFFIXES or suffix == ".txt.gz":
        return _read_bytes(path, suffix).decode()
    if suffix in (".json", ".json.gz", ".vitessce.json"):
        return json.loads(_read_bytes(path, suffix).decode())
    if suffix in (".yaml", ".yml"):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover
            raise ImportError(".yaml loading requires pyyaml") from e
        return yaml.safe_load(_read_bytes(path, suffix).decode())
    raise NotImplementedError(
        f"There is no driver loader for {suffix!r} files. Tabular and array "
        "payloads load distributed via open_artifact; use artifact_path for "
        "the raw path."
    )
