"""Locally-generatable example fixtures — the engine analogue of the
reproducible subset of the reference's ``examples/datasets/_core.py``.
The reference module mixes two dependency profiles:

- LOCAL generators (``file_mini_csv``, ``dir_scrnaseq_cellranger``,
  ``dict_cellxgene_uns``) that synthesize fixtures on disk — fully
  carried here;
- REMOTE fetchers (``file_tiff_suo22``, ``anndata_pbmc68k_reduced``,
  ``df_iris`` …) that ``urlretrieve`` from lamin-hosted buckets or
  import sklearn/scanpy — out of scope under this repo's
  public-knowledge constraint (declared boundary, same class as
  bionty), so callers supply their own payloads for those shapes.

The mini-immuno tutorial datasets live in
:mod:`lamindb_spark.examples.mini_immuno`."""

from __future__ import annotations

from pathlib import Path
from typing import Any

from ..functions.ids import generate_uid


def file_mini_csv(basedir: str | Path = ".") -> Path:
    """Mini csv artifact (reference ``_core.py:122`` — a one-column
    ``test`` frame with rows 1,2,3)."""
    filepath = Path(basedir) / "mini.csv"
    filepath.write_text("test\n1\n2\n3\n")
    return filepath


def dir_scrnaseq_cellranger(
    sample_name: str, basedir: str | Path = "./", output_only: bool = True
) -> Path:
    """Mock Cell Ranger outputs (reference ``_core.py:510``): the
    standard per-sample output tree (raw/filtered matrix dirs +
    analysis + summary files), each file holding a short random
    payload so hash-dedup sees distinct content. With
    ``output_only=False`` a sibling ``fastq/`` pair is generated too.
    Returns the sample directory — the natural
    :meth:`Lakehouse.register_dir` input."""
    basedir = Path(basedir)
    if not output_only:
        fastqdir = basedir / "fastq"
        fastqdir.mkdir(parents=True, exist_ok=True)
        for read in ("R1", "R2"):
            (fastqdir / f"{sample_name}_{read}_001.fastq.gz").write_text(
                generate_uid(6)
            )
    sampledir = basedir / sample_name
    for folder in (
        "raw_feature_bc_matrix", "filtered_feature_bc_matrix", "analysis"
    ):
        (sampledir / folder).mkdir(parents=True, exist_ok=True)
    for filename in (
        "web_summary.html",
        "metrics_summary.csv",
        "possorted_genome_bam.bam",
        "possorted_genome_bam.bam.bai",
        "molecule_info.h5",
        "cloupe.cloupe",
        "raw_feature_bc_matrix.h5",
        "raw_feature_bc_matrix/barcodes.tsv.gz",
        "raw_feature_bc_matrix/features.tsv.gz",
        "raw_feature_bc_matrix/matrix.mtx.gz",
        "filtered_feature_bc_matrix.h5",
        "filtered_feature_bc_matrix/barcodes.tsv.gz",
        "filtered_feature_bc_matrix/features.tsv.gz",
        "filtered_feature_bc_matrix/matrix.mtx.gz",
        "analysis/analysis.csv",
    ):
        (sampledir / filename).write_text(generate_uid(6))
    return sampledir


def dict_cellxgene_uns() -> dict[str, Any]:
    """An example CELLxGENE AnnData ``.uns`` dictionary (reference
    ``_core.py:434``) — the spatial shape with dynamic ``library_*``
    keys that dict/slot curation must traverse."""
    return {
        "organism_ontology_term_id": "NCBITaxon:9606",
        "spatial": {
            "is_single": True,
            "library_1": {
                "images": {
                    "fullres": "path/to/fullres.jpg",
                    "hires": "path/to/hires.jpg",
                },
                "scalefactors": {
                    "spot_diameter_fullres": 89.43,
                    "tissue_hires_scalef": 0.177,
                },
            },
            "library_2": {
                "images": {
                    "fullres": "path/to/fullres_2.jpg",
                    "hires": "path/to/hires_2.jpg",
                },
                "scalefactors": {
                    "spot_diameter_fullres": 120.34,
                    "tissue_hires_scalef": 0.355,
                },
            },
        },
    }
