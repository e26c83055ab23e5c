"""Registry StructTypes — the engine's fixed metadata schemas.

Mirrors the reference's registry models (SURVEY §1.1 table; reference
``lamindb/models/artifact.py:1492-1640``, ``transform.py:168-192``,
``run.py:251-327``, ``feature.py:744``, ``schema.py:321``,
``ulabel.py``, ``record.py:533``, ``collection.py:98``,
``sqlrecord.py:1702/1803``) as explicit Spark StructTypes. The
reference manages these with Django migrations; here they are declared
constants — every registry is one Parquet table with this schema.

Branch semantics (reference ``query_set.py:71-90``): branch_id 1=main,
0=archive, −1=trash; default scans see {current branch, main} and
never trash.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MAIN_BRANCH_ID = 1
ARCHIVE_BRANCH_ID = 0
TRASH_BRANCH_ID = -1


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


_COMMON = [
    _f("id", LongType(), False),
    _f("uid", StringType(), False),
    _f("branch_id", LongType(), False),
    _f("space_id", LongType()),
    _f("created_at", TimestampType(), False),
    _f("created_by_id", LongType()),
]

_VERSIONED = [
    _f("is_latest", BooleanType(), False),
    _f("version_tag", StringType()),
]

REGISTRY_SCHEMAS: dict[str, StructType] = {
    "artifact": StructType(
        _COMMON
        + _VERSIONED
        + [
            _f("key", StringType()),
            _f("description", StringType()),
            _f("storage_id", LongType()),
            _f("suffix", StringType()),
            _f("kind", StringType()),
            _f("otype", StringType()),
            _f("size", LongType()),
            _f("hash", StringType()),
            _f("n_files", LongType()),
            _f("n_observations", LongType()),
            _f("run_id", LongType()),
            _f("schema_id", LongType()),
            _f("updated_at", TimestampType()),
        ]
    ),
    "storage": StructType(
        _COMMON + [_f("root", StringType(), False), _f("type", StringType())]
    ),
    "transform": StructType(
        _COMMON
        + _VERSIONED
        + [
            _f("key", StringType()),
            _f("kind", StringType()),
            _f("source_code", StringType()),
            _f("hash", StringType()),
            # git provenance (reference ``transform.py`` reference/
            # reference_type, filled by ``core/_sync_git.py:175-192``:
            # "{repo_url}/blob/{commit}/{path}" with type "url")
            _f("reference", StringType()),
            _f("reference_type", StringType()),
        ]
    ),
    "run": StructType(
        _COMMON
        + [
            _f("transform_id", LongType(), False),
            _f("started_at", TimestampType()),
            _f("finished_at", TimestampType()),
            _f("status_code", LongType()),
            _f("params", StringType()),  # JSON
            _f("initiated_by_run_id", LongType()),
            # compute-environment + report artifacts (reference
            # ``run.py:283`` Run.environment, ``:268`` Run.report)
            _f("environment_id", LongType()),
            _f("report_id", LongType()),
            # external link/ID pair (docs/faq/reference-field.md —
            # the same pair transform carries)
            _f("reference", StringType()),
            _f("reference_type", StringType()),
        ]
    ),
    "feature": StructType(
        _COMMON
        + [
            _f("name", StringType(), False),
            _f("dtype_str", StringType()),
            _f("nullable", BooleanType()),
            _f("coerce", BooleanType()),
            _f("default_value", StringType()),
            _f("is_type", BooleanType()),
            _f("type_id", LongType()),
            _f("description", StringType()),
        ]
    ),
    "schema": StructType(
        _COMMON
        + [
            _f("name", StringType()),
            _f("itype", StringType()),
            _f("hash", StringType()),
            _f("n_members", LongType()),
            _f("flexible", BooleanType()),
            _f("minimal_set", BooleanType()),
            _f("maximal_set", BooleanType()),
            _f("ordered_set", BooleanType()),
            _f("coerce", BooleanType()),
            _f("index_feature_uid", StringType()),
        ]
    ),
    "ulabel": StructType(
        _COMMON
        + [
            _f("name", StringType(), False),
            _f("type_id", LongType()),
            _f("is_type", BooleanType()),
            _f("synonyms", StringType()),
            _f("description", StringType()),
        ]
    ),
    "record": StructType(
        _COMMON
        + [
            _f("name", StringType()),
            _f("type_id", LongType()),
            _f("is_type", BooleanType()),
            _f("schema_id", LongType()),
            _f("description", StringType()),
            # external link/ID pair (docs/faq/reference-field.md:
            # "reference link or ID to indicate the source")
            _f("reference", StringType()),
            _f("reference_type", StringType()),
        ]
    ),
    "collection": StructType(
        _COMMON
        + _VERSIONED
        + [
            _f("key", StringType()),
            _f("description", StringType()),
            _f("hash", StringType()),
            # external link/ID pair (docs/faq/reference-field.md)
            _f("reference", StringType()),
            _f("reference_type", StringType()),
        ]
    ),
    "branch": StructType(
        _COMMON + [_f("name", StringType(), False), _f("status_code", LongType())]
    ),
    "space": StructType(_COMMON + [_f("name", StringType(), False)]),
    # org entities (reference models/project.py:45/251, models/run.py:107)
    "project": StructType(
        _COMMON
        + [
            _f("name", StringType(), False),
            _f("type_id", LongType()),
            _f("is_type", BooleanType()),
            _f("abbr", StringType()),
            _f("url", StringType()),
            _f("start_date", StringType()),   # ISO date
            _f("end_date", StringType()),
            _f("description", StringType()),
        ]
    ),
    "reference": StructType(
        _COMMON
        + [
            _f("name", StringType(), False),
            _f("type_id", LongType()),
            _f("is_type", BooleanType()),
            _f("abbr", StringType()),
            _f("url", StringType()),
            _f("doi", StringType()),
            _f("text", StringType()),
            _f("date", StringType()),          # ISO date
            _f("description", StringType()),
        ]
    ),
    "user": StructType(
        [
            _f("id", LongType(), False),
            _f("uid", StringType(), False),
            _f("handle", StringType(), False),
            _f("name", StringType()),
            _f("created_at", TimestampType(), False),
        ]
    ),
    # bridges
    "run_input_artifacts": StructType(
        [_f("run_id", LongType(), False), _f("artifact_id", LongType(), False)]
    ),
    "collection_artifacts": StructType(
        [
            _f("collection_id", LongType(), False),
            _f("artifact_id", LongType(), False),
            _f("position", LongType()),
        ]
    ),
    "record_parents": StructType(
        [_f("record_id", LongType(), False), _f("parent_id", LongType(), False)]
    ),
    # artifact↔ulabel link table WITH an optional feature dimension —
    # the reference's most-used annotation idiom (``ulabel.py:286``
    # ArtifactULabel: unique on (artifact, ulabel, feature))
    "artifact_ulabels": StructType(
        [
            _f("artifact_id", LongType(), False),
            _f("ulabel_id", LongType(), False),
            _f("feature_id", LongType()),
            _f("run_id", LongType()),
            _f("created_at", TimestampType()),
        ]
    ),
    "artifact_projects": StructType(
        [
            _f("artifact_id", LongType(), False),
            _f("project_id", LongType(), False),
            _f("feature_id", LongType()),
            _f("created_at", TimestampType()),
        ]
    ),
    # collection-level label/project links (reference
    # ``ulabel.py`` CollectionULabel / ``project.py:563``
    # CollectionProject — e.g. croissant license + project labels land
    # on the collection as well as its member artifacts)
    "collection_ulabels": StructType(
        [
            _f("collection_id", LongType(), False),
            _f("ulabel_id", LongType(), False),
            _f("feature_id", LongType()),
            _f("created_at", TimestampType()),
        ]
    ),
    "collection_projects": StructType(
        [
            _f("collection_id", LongType(), False),
            _f("project_id", LongType(), False),
            _f("feature_id", LongType()),
            _f("created_at", TimestampType()),
        ]
    ),
    "schema_features": StructType(
        [
            _f("schema_id", LongType(), False),
            _f("feature_id", LongType(), False),
            _f("optional", BooleanType()),
        ]
    ),
    # composite Schema → per-slot component Schema (reference
    # ``SchemaComponent``, ``models/schema.py:1573-1581``: unique on
    # (composite, slot) — a composite AnnData/MuData schema names one
    # flat component schema per slot)
    "schema_components": StructType(
        [
            _f("composite_id", LongType(), False),
            _f("component_id", LongType(), False),
            _f("slot", StringType(), False),
            _f("created_at", TimestampType()),
        ]
    ),
    # EAV annotation long table (unifies the reference's JsonValue /
    # ArtifactJsonValue / RecordJson / ArtifactULabel link tables)
    "annotation": StructType(
        [
            _f("entity_kind", StringType(), False),  # artifact|run|record
            _f("entity_id", LongType(), False),
            _f("feature_id", LongType(), False),
            _f("feature_name", StringType(), False),
            _f("value_json", StringType()),  # scalar/list/dict JSON
            _f("label_kind", StringType()),  # ulabel|record
            _f("label_id", LongType()),
            _f("branch_id", LongType(), False),
            _f("created_at", TimestampType()),
        ]
    ),
    # action attachments (reference ``_actions`` M2M on Artifact/
    # Collection, used by e.g. ``integrations/_vitessce.py:95-100`` to
    # hang a config artifact off the dataset it visualizes) — same
    # entity-discriminator collapse as ``block``
    "actions": StructType(
        [
            _f("entity_kind", StringType(), False),
            _f("entity_id", LongType(), False),
            _f("action_artifact_id", LongType(), False),
            _f("created_at", TimestampType()),
        ]
    ),
    # markdown notes blocks (reference ``models/block.py``: Block
    # ``:206-262`` — standalone, with key + anchor threading — and the
    # per-entity attached models ArtifactBlock/TransformBlock/RunBlock/
    # CollectionBlock/RecordBlock/SchemaBlock ``:396-470``). The engine
    # collapses the reference's per-entity Django tables into ONE
    # registry with an (entity_kind, entity_id) discriminator — a
    # DataFrame scan filters by entity the same way ten tables would,
    # without ten schemas. kind: 'readme' (versioned per anchor entity)
    # | 'comment' (append-only). uid = 16-char stem + 4-char version.
    "block": StructType(
        _COMMON
        + _VERSIONED
        + [
            _f("content", StringType(), False),
            _f("hash", StringType()),
            _f("kind", StringType(), False),
            _f("key", StringType()),
            _f("entity_kind", StringType()),
            _f("entity_id", LongType()),
            _f("anchor_id", LongType()),
            _f("line_number", LongType()),
        ]
    ),
}

# uid lengths per registry (reference base/uids.py + model defs)
UID_LENGTHS: dict[str, int] = {
    "artifact": 20,
    "storage": 12,
    "transform": 16,
    "run": 20,
    "feature": 12,
    "schema": 20,
    "ulabel": 8,
    "record": 16,
    "collection": 20,
    "branch": 12,
    "space": 12,
    "project": 12,
    "reference": 12,
    "user": 8,
    "block": 20,  # reference block.py:172-173 — 16-char stem + version
}

VERSIONED_REGISTRIES = frozenset({"artifact", "transform", "collection", "block"})


# ---------------------------------------------------------------------
# Django-style field validation (docs/faq/validate-fields.md; reference
# ``project.py:178-187`` RegexValidator on Reference.doi, URLField on
# Reference.url / Project.url — models inheriting ``ValidateFields``
# run these in full_clean). ``Lakehouse.save`` applies them to
# caller-supplied values and raises :class:`FieldValidationError`
# naming every offending field, like Django's per-field error dict.

class FieldValidationError(ValueError):
    """A saved row's field value failed its registry's validator."""


_DOI_REGEX = r"^(?:https?://(?:dx\.)?doi\.org/|doi:|DOI:)?10\.\d+/.*$"
_URL_REGEX = r"^(?:https?|ftp)://[^\s/$.?#][^\s]*$"

FIELD_VALIDATORS: dict[str, dict[str, tuple[str, str]]] = {
    "reference": {
        "doi": (
            _DOI_REGEX,
            "Must be a DOI (e.g., 10.1000/xyz123 or "
            "https://doi.org/10.1000/xyz123)",
        ),
        "url": (_URL_REGEX, "Enter a valid URL."),
    },
    "project": {"url": (_URL_REGEX, "Enter a valid URL.")},
}


def validate_fields(registry: str, row: dict) -> list[str]:
    """Messages for every validator the row's supplied values fail
    (None passes: the fields are nullable, like the reference's)."""
    import re as _re

    out = []
    for field, (regex, message) in FIELD_VALIDATORS.get(registry, {}).items():
        v = row.get(field)
        if v is not None and not _re.match(regex, str(v)):
            out.append(f"{field}: {message} (got {v!r})")
    return out
