"""Croissant (MLCommons CroissantML) dataset ingest.

Reference: ``lamindb/integrations/_croissant.py:17-148``
``curate_from_croissant`` — create annotated artifacts from a
Croissant JSON-LD document: one artifact per file distribution, a
``License`` ULabel (typed, get-or-create) from the ``license`` field,
a Project (get-or-create) from ``cr:projectName``, and a collection
wrapping the artifacts when the document lists more than one
distribution. The Croissant format itself is public
(https://mlcommons.org/croissant).

Engine mapping: registration goes through the lakehouse ingest path
(content-hash dedup, version families), label/project links land in
the ``artifact_ulabels``/``artifact_projects`` bridge tables — and,
for collections, ``collection_ulabels``/``collection_projects`` — so
the standard relation filters (``filter(ulabels__name="cc-by-4.0")``,
``filter(projects__name=...)``) reach croissant-ingested data with no
special casing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


def _get_or_create(
    lh, registry: str, name: str, match: dict | None = None, **extra: Any
) -> dict:
    """Get-or-create a row by name (reference's filter().first() or
    save() idiom, ``_croissant.py:69-83``). ``match`` adds lookup
    predicates beyond the name — e.g. the License TYPE label must match
    ``is_type=True`` (reference :69), not any label that happens to be
    named "License"."""
    from ..catalog.query import QuerySet

    hit = QuerySet(lh, registry).filter(name=name, **(match or {})).first()
    if hit is not None:
        return dict(hit.asDict()) if hasattr(hit, "asDict") else dict(hit)
    return lh.save(registry, [{"name": name, **(match or {}), **extra}])[0]


def _link(lh, bridge: str, left_col: str, left_id: int, right_col: str, right_id: int) -> None:
    """Idempotent bridge-row append (unique on the pair, like the
    reference link models)."""
    link_rows(lh, bridge, {left_col: left_id, right_col: right_id})


def link_rows(lh, bridge: str, match: dict[str, Any]) -> None:
    """Idempotent, timestamped append to any bridge table: the row is
    written once per unique ``match`` combination (the reference link
    models' unique-together constraint), with ``created_at`` stamped
    when the table carries it."""
    from functools import reduce

    from pyspark.sql import functions as F

    pred = reduce(
        lambda a, b: a & b, [F.col(k) == v for k, v in match.items()]
    )
    if lh.read_raw(bridge).filter(pred).limit(1).count():
        return
    row = dict(match)
    if "created_at" in {f.name for f in lh.read_raw(bridge).schema.fields}:
        from ..catalog.lakehouse import _now

        row["created_at"] = _now()
    lh._append(bridge, [row])


def _parse_document(source) -> dict:
    """Accept a parsed dict or a path to the croissant JSON file, and
    reject documents that are not named Datasets."""
    data = source
    if not isinstance(source, dict):
        if not isinstance(source, (str, Path)):
            raise ValueError(
                f"cannot ingest a {type(source).__name__} — pass the "
                "croissant document as a path to its JSON file or as an "
                "already-parsed dict"
            )
        doc = Path(source)
        if not doc.exists():
            raise FileNotFoundError(f"no croissant document at {source!r}")
        data = json.loads(doc.read_text(encoding="utf-8"))
    typ = data.get("@type")
    if typ != "Dataset":
        raise ValueError(
            f"expected @type 'Dataset' in the croissant document, got {typ!r}"
        )
    if "name" not in data:
        raise ValueError("the croissant document lacks the required 'name' field")
    return data


def curate_from_croissant(
    lakehouse,
    croissant_data: str | Path | dict[str, Any],
    run_id: int | None = None,
) -> dict[str, Any]:
    """Create annotated artifacts from a CroissantML document
    (reference ``_croissant.py:17-148``).

    Returns the registered collection row if the document lists
    multiple file distributions, otherwise the single artifact row.
    The returned dict carries ``"_kind"`` (``"artifact"`` |
    ``"collection"``) so callers need not re-query.
    """
    from ..catalog.query import QuerySet

    data = _parse_document(croissant_data)

    ds_name = data["name"]
    description = data.get("description")
    version = data.get("version")
    license_value = data.get("license")
    project_name = data.get("cr:projectName")

    # License → typed ULabel, get-or-create (reference :66-78)
    license_row = None
    if license_value:
        license_type = _get_or_create(
            lakehouse, "ulabel", "License", match={"is_type": True}
        )
        license_row = _get_or_create(
            lakehouse,
            "ulabel",
            license_value,
            description="Dataset license",
            type_id=license_type["id"],
        )
    project_row = None
    if project_name:
        project_row = _get_or_create(lakehouse, "project", project_name)

    distributions = data.get("distribution", [])
    if not distributions:
        raise ValueError(
            "No file distributions in the croissant document — nothing to ingest"
        )

    registered_rows: list[dict[str, Any]] = []
    for dist in distributions:
        dist_id = dist.get("@id", "")
        if dist_id and Path(dist_id).exists():
            payload_path = dist_id
        else:
            payload_path = dist.get("contentUrl", "") or data.get("url", "")
        if not payload_path:
            raise ValueError(
                f"No file path resolvable from distribution entry {dist!r} "
                "(tried @id, contentUrl, and the dataset url)"
            )
        if not Path(payload_path).exists():
            raise ValueError(
                f"distribution points at {payload_path!r}, which does not exist locally"
            )
        if len(distributions) == 1:
            # dataset-level naming belongs on the artifact only when it
            # IS the dataset (reference :116-123)
            art_description = ds_name + (
                f" - {description}" if description is not None else ""
            )
        else:
            art_description = None
        key = (dist_id or payload_path).lstrip("/")
        art = lakehouse.register_artifact(
            payload_path,
            key=key,
            description=art_description,
            kind="dataset",
            run_id=run_id,
        )
        if version:
            art["version_tag"] = version
        if license_row:
            _link(lakehouse, "artifact_ulabels", "artifact_id", art["id"],
                  "ulabel_id", license_row["id"])
        if project_row:
            _link(lakehouse, "artifact_projects", "artifact_id", art["id"],
                  "project_id", project_row["id"])
        registered_rows.append(art)

    if version:
        # ONE bulk registry rewrite for all distributions (a per-artifact
        # update would rewrite the artifact table once per file)
        QuerySet(lakehouse, "artifact").filter(
            id__in=[a["id"] for a in registered_rows]
        ).update(version_tag=version)

    if len(registered_rows) == 1:
        out = dict(registered_rows[0])
        out["_kind"] = "artifact"
        return out

    coll = lakehouse.create_collection(
        ds_name, [a["id"] for a in registered_rows], description=description
    )
    if version:
        QuerySet(lakehouse, "collection").filter(id=coll["id"]).update(
            version_tag=version
        )
        coll["version_tag"] = version
    if license_row:
        _link(lakehouse, "collection_ulabels", "collection_id", coll["id"],
              "ulabel_id", license_row["id"])
    if project_row:
        _link(lakehouse, "collection_projects", "collection_id", coll["id"],
              "project_id", project_row["id"])
    out = dict(coll)
    out["_kind"] = "collection"
    return out
