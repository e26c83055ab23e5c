"""Vitessce visualization-config integration.

Reference ``integrations/_vitessce.py:21-106`` ``save_vitessce_config``:
validate a VitessceConfig, save its JSON export as an artifact
(``.vitessce.json``, ``kind="__lamindb_config__"``) under a
``save_vitessce_config`` function run whose inputs are the dataset
artifacts the config references; with more than one dataset, wrap them
in a collection; finally attach the config artifact as an ACTION on
the dataset (or collection) so UIs can surface the "visualize" button.

The vitessce package is not a dependency here (same as the reference):
a ``vitessce.VitessceConfig`` is accepted when installed (its
``to_dict``/``get_artifacts`` drive everything), and a plain dict plus
explicit ``dataset_uids`` works without it — the engine-side contract
is identical either way.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def save_vitessce_config(
    lakehouse,
    vitessce_config: Any,
    key: str | None = None,
    description: str | None = None,
    dataset_uids: list[str] | None = None,
) -> dict[str, Any]:
    """Save a Vitessce config as a linked artifact (reference
    ``_vitessce.py:21-106``). Returns the config artifact row."""
    from pyspark.sql import functions as F

    from ..lineage.context import Context

    if isinstance(vitessce_config, dict):
        vc_dict = vitessce_config
        if dataset_uids is None:
            raise ValueError(
                "a plain-dict config needs dataset_uids=[...] — the artifact "
                "uids the config visualizes (a vitessce.VitessceConfig "
                "carries them itself via get_artifacts())"
            )
        uids = list(dataset_uids)
    elif hasattr(vitessce_config, "to_dict"):
        vc_dict = vitessce_config.to_dict()
        try:
            url_to_artifact = vitessce_config.get_artifacts()
        except AttributeError as e:
            raise RuntimeError(
                "save_vitessce_config() requires vitessce>=3.4.0"
            ) from e
        uids = [a.uid for a in url_to_artifact.values()]
    else:
        raise TypeError(
            "vitessce_config must be a vitessce.VitessceConfig or a plain "
            f"dict, got {type(vitessce_config).__name__}"
        )
    # a config commonly cites the same store from several views —
    # dedup (order-preserving) or a one-artifact config would wrap a
    # degenerate duplicate-member collection
    uids = list(dict.fromkeys(uids))
    if not uids:
        raise ValueError("the config references no dataset artifacts")

    # ONE scan resolves every uid (per-uid resolution would be N
    # registry jobs); config must not cite missing data
    hits = {
        r["uid"]: r.asDict()
        for r in lakehouse.read("artifact")
        .filter(F.col("is_latest") & (F.col("uid").isin(uids) | F.col("key").isin(uids)))
        .collect()
    }
    by_key = {r["key"]: r for r in hits.values()}
    datasets = []
    for u in uids:
        row = hits.get(u) or by_key.get(u)
        if row is None:
            raise KeyError(f"no artifact with uid/key {u!r}")
        datasets.append(row)

    # function run, dataset artifacts as inputs (reference :62-69)
    ctx = Context(lakehouse).track(
        "save_vitessce_config", kind="function", source_code="save_vitessce_config"
    )
    try:
        lakehouse._append(
            "run_input_artifacts",
            [
                {"run_id": lakehouse.current_run_id, "artifact_id": d["id"]}
                for d in datasets
            ],
        )
        collection = None
        if len(datasets) > 1:
            # conscious use of description for the collection key
            # (reference :71-76)
            collection = lakehouse.create_collection(
                description or "vitessce datasets", [d["id"] for d in datasets]
            )
        fd, tmp = tempfile.mkstemp(suffix=".vitessce.json")
        with os.fdopen(fd, "w") as fh:
            json.dump(vc_dict, fh)
        try:
            config_art = lakehouse.register_artifact(
                tmp,
                key=key or "configs/config.vitessce.json",
                description=description,
                kind="__lamindb_config__",
            )
        finally:
            os.unlink(tmp)
        # attach as an ACTION on the dataset or the collection (:93-100)
        target_kind, target_id = (
            ("collection", collection["id"])
            if collection is not None
            else ("artifact", datasets[0]["id"])
        )
        from .croissant import link_rows

        link_rows(
            lakehouse,
            "actions",
            {
                "entity_kind": target_kind,
                "entity_id": target_id,
                "action_artifact_id": config_art["id"],
            },
        )
    except Exception:
        ctx.finish(status_code=-1)
        raise
    # finish OUTSIDE the try: if the close itself fails (e.g. a commit
    # conflict), the work above already committed — a second
    # finish(-1) would mislabel a successful save as failed
    ctx.finish()
    return config_art


def actions_for(lh, entity_kind: str, entity_id: int):
    """Action artifacts attached to an entity (reference ``_actions``
    related manager)."""
    from pyspark.sql import functions as F

    links = lh.read_raw("actions").filter(
        (F.col("entity_kind") == entity_kind) & (F.col("entity_id") == entity_id)
    )
    arts = lh.read_raw("artifact")
    return arts.join(
        links, arts["id"] == links["action_artifact_id"], "left_semi"
    )
