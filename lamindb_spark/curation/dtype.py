"""Composite feature-dtype parser (VERDICT r9 #3).

Re-expresses the reference's dtype-string grammar (reference
``models/feature.py:90`` ``parse_dtype``, ``:251`` ``parse_cat_dtype``,
``:321-445`` ``parse_nested_brackets``) for the Spark engine:

- scalar dtypes — ``int``, ``str``, ``datetime`` … (``base/types.py:
  132-146`` ``SimpleDtypeStr``), validated against the allowed set;
- ``list[T]`` — recursive, marks every component ``"list": True``;
- ``cat[Registry.field]`` with union support ``cat[A|B]`` — each
  member resolved to a catalog registry + field;
- typed refs ``Record[uid]`` / ``ULabel[uid]`` — a categorical
  restricted to a dynamic subtype (rows whose ``type`` points at the
  record with that uid), optionally with embedded relation filters
  ``Record[uid, is_type='True']``.

Where the reference resolves names to Django model classes, this
module resolves them to catalog registry names (``REGISTRY_SCHEMAS``)
and can turn a parsed categorical into the curator's
:class:`~lamindb_spark.curation.curator.CategoricalSpec` — the
validation join stays the curator's broadcast left-anti check, so the
parser adds NO new scan shapes.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import functions as F

from ..catalog.schemas import REGISTRY_SCHEMAS

#: reference ``base/types.py:132-146`` SimpleDtypeStr
FEATURE_DTYPES: set[str] = {
    "num",
    "int",
    "float",
    "str",
    "bool",
    "datetime",
    "datetime64[ns, UTC]",
    "date",
    "dict",
    "path",
    "url",
    "object",
}

#: PascalCase registry name (the reference's model-class spelling) →
#: catalog registry. Module-qualified spellings (``bionty.CellType``)
#: belong to ontology plugins that are out of scope under the
#: public-knowledge constraint — they parse but do not resolve.
_REGISTRY_NAMES: dict[str, str] = {
    "".join(p.title() for p in name.split("_")): name for name in REGISTRY_SCHEMAS
}
_REGISTRY_NAMES["ULabel"] = "ulabel"  # reference capitalization


class DtypeError(ValueError):
    pass


def parse_nested_brackets(dtype_str: str) -> dict[str, Any]:
    """One categorical component string → raw parts (reference
    ``feature.py:321-445``):

    ``"A"`` → registry A, default field; ``"A.field"``;
    ``"mod.A.field[filter]"`` (module-qualified, filter payload);
    ``"Record[uid]"`` / ``"Record[uid, k='v']"`` (typed subtype ref,
    '='-bearing payloads are relation filters).
    """
    if "[" not in dtype_str:
        if "." in dtype_str:
            parts = dtype_str.split(".")
            if len(parts) == 2 and parts[1][:1].isupper():
                return {"registry": dtype_str, "filter_str": "", "field": ""}
            if len(parts) == 3:
                return {
                    "registry": f"{parts[0]}.{parts[1]}",
                    "filter_str": "",
                    "field": parts[2],
                }
            return {"registry": parts[0], "filter_str": "", "field": parts[1]}
        return {"registry": dtype_str, "filter_str": "", "field": ""}

    first = dtype_str.index("[")
    registry_and_field = dtype_str[:first]
    pre_bracket_field = ""
    if "." in registry_and_field:
        parts = registry_and_field.split(".")
        if len(parts) == 3:
            registry_part = f"{parts[0]}.{parts[1]}"
            pre_bracket_field = parts[2]
        else:
            registry_part = registry_and_field
    else:
        registry_part = registry_and_field

    depth = 0
    close = -1
    for i in range(first, len(dtype_str)):
        if dtype_str[i] == "[":
            depth += 1
        elif dtype_str[i] == "]":
            depth -= 1
            if depth == 0:
                close = i
                break
    if close == -1:
        raise DtypeError(f"unmatched brackets in dtype string: {dtype_str!r}")

    content = dtype_str[first + 1 : close]
    remainder = dtype_str[close + 1 :]
    field_part = remainder[1:] if remainder.startswith(".") else ""
    if not field_part and pre_bracket_field:
        field_part = pre_bracket_field

    type_uid = None
    filter_str = ""
    if registry_part in ("Record", "ULabel"):
        # bracket payload: a bare type uid, relation filters, or the
        # shorthand "uid, k='v'" mix — disambiguated by '='
        if content:
            if "=" in content:
                head, sep, rest = content.partition(",")
                head = head.strip()
                if head and "=" not in head:
                    type_uid = head
                    filter_str = rest.strip() if sep else ""
                else:
                    filter_str = content
            else:
                type_uid = content
    else:
        filter_str = content or ""

    out = {"registry": registry_part, "filter_str": filter_str, "field": field_part}
    if type_uid:
        out["type_uid"] = type_uid
    return out


def parse_cat_dtype(dtype_str: str) -> dict[str, Any]:
    """One categorical component → resolved parts (reference
    ``parse_cat_dtype``, ``feature.py:251-318``): catalog registry
    name, terminal field (default ``name``), filter string, optional
    subtype uid."""
    parsed = parse_nested_brackets(dtype_str)
    registry_str = parsed["registry"]
    registry = _REGISTRY_NAMES.get(registry_str)
    if registry is None:
        raise DtypeError(
            f"{registry_str!r} is an invalid dtype, has to be a registry, "
            f"e.g. ULabel (known: {sorted(_REGISTRY_NAMES)})"
        )
    field = parsed["field"] or "name"
    if field not in {f.name for f in REGISTRY_SCHEMAS[registry].fields}:
        raise DtypeError(f"registry {registry!r} has no field {field!r}")
    out = {
        "registry": registry,
        "registry_str": registry_str,
        "field_str": field,
        "filter_str": parsed["filter_str"],
    }
    if "type_uid" in parsed:
        out["type_uid"] = parsed["type_uid"]
    return out


def parse_dtype(dtype_str: str) -> list[dict[str, Any]]:
    """Feature dtype string → structured component list (reference
    ``parse_dtype``, ``feature.py:90-128``). Scalars return ``[]``
    after validation; ``cat[...]`` unions return one dict per member;
    ``list[T]`` marks members ``"list": True``."""
    if dtype_str.startswith("list[") and dtype_str.endswith("]"):
        inner = parse_dtype(dtype_str[5:-1])
        for comp in inner:
            comp["list"] = True
        return inner
    if dtype_str == "cat":  # bare cat: deprecated, unconstrained
        return []
    if dtype_str.startswith("cat[") and dtype_str.endswith("]"):
        body = dtype_str[4:-1]
        if body == "":
            return []
        return [parse_cat_dtype(m) for m in _split_top_level(body, "|")]
    if dtype_str.startswith(("Record", "ULabel")) and "[" in dtype_str:
        # typed refs are categorical without the cat[...] wrapper
        return [parse_cat_dtype(dtype_str)]
    if dtype_str not in FEATURE_DTYPES:
        raise DtypeError(
            f"dtype is {dtype_str!r} but has to be one of {sorted(FEATURE_DTYPES)}!"
        )
    return []


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside brackets — ``cat[Record[a]|Record[b]]``
    must not split inside a member's own payload."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p for p in (x.strip() for x in out) if p]


_SIMPLE_TO_SPARK = {
    "num": "double",
    "int": "long",
    "float": "double",
    "str": "string",
    "bool": "boolean",
    "datetime": "timestamp_ntz",
    "datetime64[ns, UTC]": "timestamp",
    "date": "date",
    "dict": "string",
    "path": "string",
    "url": "string",
    "object": "string",
}


def spark_type(dtype_str: str | None) -> str:
    """Spark SQL type string for any dtype the grammar accepts —
    categoricals (and typed refs) are string columns; ``list[T]`` maps
    to ``array<T>`` including ``list[cat[...]]`` → ``array<string>``."""
    if not dtype_str:
        return "string"
    if dtype_str.startswith("list[") and dtype_str.endswith("]"):
        return f"array<{spark_type(dtype_str[5:-1])}>"
    if dtype_str == "cat" or dtype_str.startswith(("cat[", "Record", "ULabel")):
        return "string"
    return _SIMPLE_TO_SPARK.get(dtype_str, "string")


_FILTER_ITEM = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*'([^']*)'\s*$")


def _parse_filter_str(filter_str: str) -> dict[str, str]:
    """``"k='v', k2='v2'"`` → {k: v}. The reference leaves filter
    payload processing open (``feature.py:306`` TODO); here the simple
    equality form — the only form the reference serializes from
    ``cat_filters`` — is applied, and anything else raises instead of
    silently widening the domain."""
    out: dict[str, str] = {}
    for item in _split_top_level(filter_str, ","):
        m = _FILTER_ITEM.match(item)
        if m is None:
            raise DtypeError(f"unsupported dtype filter item: {item!r}")
        out[m.group(1)] = m.group(2)
    return out


def domain_for_component(lh, comp: dict[str, Any]):
    """Registry-domain DataFrame for one parsed categorical component —
    the frame a validation join checks values against.

    Subtype scoping (``type_uid``): keep rows whose ``type_id`` points
    at the record with that uid (the reference's dynamic sub-registry
    semantics, ``sqlrecord.py:195`` HasType). Equality filters from the
    bracket payload apply as plain predicates. The result is registry-
    sized (broadcastable) — never the data frame being curated."""
    df = lh.read_raw(comp["registry"])
    if comp.get("type_uid"):
        parent = df.filter(F.col("uid") == comp["type_uid"]).select(
            F.col("id").alias("__type_pk")
        )
        df = df.join(
            F.broadcast(parent), df["type_id"] == F.col("__type_pk")
        ).drop("__type_pk")
    for k, v in _parse_filter_str(comp["filter_str"] or "").items():
        if k.endswith("__uid") and k[:-5] in ("type", "schema"):
            # relation filter on a FK's uid: `type` is a SELF-
            # referential FK in the reference (ULabel.type -> ULabel,
            # Feature.type -> Feature; sqlrecord.py HasType), so it
            # resolves through the component's OWN registry — per-
            # registry id sequences collide, so routing it through
            # 'record' matched wrong (or no) rows (ADVICE r10).
            target = comp["registry"] if k.startswith("type") else "schema"
            tgt = lh.read_raw(target).filter(F.col("uid") == v).select(
                F.col("id").alias("__fk_pk")
            )
            df = df.join(
                F.broadcast(tgt), df[f"{k[:-5]}_id"] == F.col("__fk_pk")
            ).drop("__fk_pk")
        elif k in df.columns:
            col = F.col(k)
            # booleans serialize as 'True'/'False' in the reference's
            # cat_filters payloads
            if dict(df.dtypes).get(k) == "boolean":
                df = df.filter(col == (v == "True"))
            else:
                df = df.filter(col == v)
        else:
            raise DtypeError(
                f"filter field {k!r} not on registry {comp['registry']!r}"
            )
    return df


def categorical_specs_for_feature(lh, dtype_str: str) -> list:
    """Parsed dtype → curator :class:`CategoricalSpec` list (one per
    union member; empty for scalar dtypes). The curator validates a
    column against EACH spec's domain; a value is valid if ANY member
    accepts it — union semantics are resolved by
    :func:`union_domain`."""
    from .curator import CategoricalSpec

    specs = []
    for comp in parse_dtype(dtype_str):
        reg = domain_for_component(lh, comp)
        syn = "synonyms" if "synonyms" in reg.columns else None
        specs.append(
            CategoricalSpec(registry=reg, field=comp["field_str"], synonyms_field=syn)
        )
    return specs


def union_domain(lh, dtype_str: str):
    """One (value) domain DataFrame for a possibly-union categorical
    dtype: the unionByName of every member's field column. ``None``
    for scalar dtypes."""
    frames = []
    for comp in parse_dtype(dtype_str):
        reg = domain_for_component(lh, comp)
        frames.append(reg.select(F.col(comp["field_str"]).alias("__v")))
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()
