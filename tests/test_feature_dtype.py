"""Composite dtype parser (curation/dtype.py) — mirrors reference
``feature.py:90-445`` grammar cases (and the reference test surface of
``test_feature_dtype``-style cases): scalars, list[T], cat unions,
module-qualified names, Record[uid] typed refs with embedded filters —
plus the Spark-side wiring: domain frames, curator validation/
standardization of a ``cat[ulabel.name]``-typed sheet column."""

import pytest

from lamindb_spark.curation.dtype import (
    DtypeError,
    categorical_specs_for_feature,
    parse_cat_dtype,
    parse_dtype,
    parse_nested_brackets,
    spark_type,
    union_domain,
)


# ------------------------------------------------------------ grammar


def test_scalar_dtypes_parse_empty():
    for s in ("int", "float", "str", "bool", "datetime", "date", "dict"):
        assert parse_dtype(s) == []
    with pytest.raises(DtypeError, match="has to be one of"):
        parse_dtype("integer")


def test_bare_cat_and_empty_cat():
    assert parse_dtype("cat") == []
    assert parse_dtype("cat[]") == []


def test_cat_registry_default_field():
    (c,) = parse_dtype("cat[ULabel]")
    assert c["registry"] == "ulabel"
    assert c["field_str"] == "name"
    assert c["filter_str"] == ""


def test_cat_registry_explicit_field():
    (c,) = parse_dtype("cat[ULabel.description]")
    assert c["registry"] == "ulabel"
    assert c["field_str"] == "description"


def test_cat_union():
    a, b = parse_dtype("cat[ULabel|Record]")
    assert a["registry"] == "ulabel"
    assert b["registry"] == "record"


def test_list_of_scalar_and_cat():
    assert parse_dtype("list[int]") == []
    (c,) = parse_dtype("list[cat[ULabel]]")
    assert c["registry"] == "ulabel" and c["list"] is True


def test_record_type_uid():
    (c,) = parse_dtype("cat[Record[Ab12Cd34Ef56Gh78]]")
    assert c["registry"] == "record"
    assert c["type_uid"] == "Ab12Cd34Ef56Gh78"
    # typed ref also accepted without the cat[...] wrapper
    (c2,) = parse_dtype("Record[Ab12Cd34Ef56Gh78]")
    assert c2["type_uid"] == "Ab12Cd34Ef56Gh78"


def test_record_uid_with_filters_shorthand():
    p = parse_nested_brackets("Record[Ab12Cd34Ef56Gh78, is_type='True']")
    assert p["type_uid"] == "Ab12Cd34Ef56Gh78"
    assert p["filter_str"] == "is_type='True'"
    # pure filter payload (no leading uid)
    p2 = parse_nested_brackets("Record[type__uid='X', is_type='True']")
    assert "type_uid" not in p2
    assert p2["filter_str"] == "type__uid='X', is_type='True'"


def test_module_qualified_names_parse_but_dont_resolve():
    p = parse_nested_brackets("bionty.Gene.ensembl_gene_id[source__id='abcd']")
    assert p["registry"] == "bionty.Gene"
    assert p["field"] == "ensembl_gene_id"
    assert p["filter_str"] == "source__id='abcd'"
    with pytest.raises(DtypeError, match="invalid dtype"):
        parse_cat_dtype("bionty.Gene")


def test_unknown_field_raises():
    with pytest.raises(DtypeError, match="no field"):
        parse_cat_dtype("ULabel.nonexistent")


def test_unmatched_bracket_raises():
    with pytest.raises(DtypeError, match="unmatched"):
        parse_nested_brackets("Record[abc")


def test_spark_type_mapping():
    assert spark_type("int") == "long"
    assert spark_type("datetime") == "timestamp_ntz"
    assert spark_type("cat[ULabel]") == "string"
    assert spark_type("list[float]") == "array<double>"
    assert spark_type("list[cat[ULabel.name]]") == "array<string>"
    assert spark_type(None) == "string"


# ------------------------------------------------------ domain frames


@pytest.fixture()
def curation_lake(lakehouse):
    lakehouse.save(
        "ulabel",
        [
            {"name": "T cell", "synonyms": "T-cell|T lymphocyte"},
            {"name": "B cell", "synonyms": "B-cell"},
        ],
    )
    # a Record subtype 'CellLine' with two member records
    t = lakehouse.save("record", [{"name": "CellLine", "is_type": True}])[0]
    lakehouse.save(
        "record",
        [
            {"name": "HEK293", "type_id": t["id"]},
            {"name": "K562", "type_id": t["id"]},
            {"name": "unrelated", "type_id": None},
        ],
    )
    return lakehouse, t


def test_union_domain_cat_union(curation_lake):
    lh, _t = curation_lake
    dom = union_domain(lh, "cat[ULabel|Record]")
    vals = {r["__v"] for r in dom.collect()}
    assert {"T cell", "B cell", "HEK293", "K562"} <= vals


def test_typed_ref_domain_scoped_to_subtype(curation_lake):
    lh, t = curation_lake
    dom = union_domain(lh, f"cat[Record[{t['uid']}]]")
    vals = sorted(r["__v"] for r in dom.collect())
    assert vals == ["HEK293", "K562"]  # 'unrelated' and the type row excluded


def test_filter_payload_applies(curation_lake):
    lh, _t = curation_lake
    dom = union_domain(lh, "cat[Record[is_type='True']]")
    # note: bracket payload with '=' on Record is a FILTER, not a uid
    assert sorted(r["__v"] for r in dom.collect()) == ["CellLine"]


def test_scalar_dtype_has_no_domain(curation_lake):
    lh, _t = curation_lake
    assert union_domain(lh, "int") is None


def test_type_uid_filter_resolves_through_own_registry(curation_lake):
    """ADVICE r10: `type` is a SELF-referential FK (ULabel.type ->
    ULabel, sqlrecord.py HasType), so a `type__uid` filter on ULabel
    must resolve through the ULABEL registry — routing it through
    'record' matched colliding per-registry ids (or nothing) and
    validated against a silently wrong domain."""
    lh, _t = curation_lake
    ut = lh.save("ulabel", [{"name": "Stage", "is_type": True}])[0]
    lh.save(
        "ulabel",
        [
            {"name": "train", "type_id": ut["id"]},
            {"name": "test", "type_id": ut["id"]},
        ],
    )
    dom = union_domain(lh, f"cat[ULabel[type__uid='{ut['uid']}']]")
    # pre-fix: the uid lookup ran against 'record' (no such uid there,
    # or a colliding id) -> empty/wrong domain; now: the two members
    assert sorted(r["__v"] for r in dom.collect()) == ["test", "train"]


# ------------------------------------------------ curator integration


def test_sheet_with_cat_feature_validates_and_standardizes(curation_lake, spark):
    """A sheet column typed cat[ULabel.name] validates through the
    curator: bad values reported; synonyms standardize to canonical
    names (reference DataFrameCurator flow over a parsed dtype)."""
    from lamindb_spark.curation.curator import DataFrameCurator
    from lamindb_spark.curation.schema_check import SchemaSpec

    lh, _t = curation_lake
    (spec,) = categorical_specs_for_feature(lh, "cat[ULabel.name]")
    assert spec.synonyms_field == "synonyms"
    df = spark.createDataFrame(
        [("s1", "T cell"), ("s2", "T-cell"), ("s3", "NK cell")],
        ["sample", "cell_type"],
    )
    cur = DataFrameCurator(
        df,
        SchemaSpec(features={"sample": "string", "cell_type": "string"}),
        categoricals={"cell_type": spec},
    )
    report = cur.validate()
    assert report["is_valid"] is False
    assert report["categoricals"]["cell_type"] == ["NK cell"]
    # standardize maps the synonym; NK cell stays invalid
    fixed = cur.standardize()
    report2 = fixed.validate()
    assert report2["categoricals"]["cell_type"] == ["NK cell"]
    vals = {r["cell_type"] for r in fixed.df.collect()}
    assert "T-cell" not in vals and "T cell" in vals
