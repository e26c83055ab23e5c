"""Record sheets: schema-ordered, typed wide export of dynamic records."""

from lamindb_spark.catalog.sheets import record_sheet, spark_dtype


def test_spark_dtype_mapping():
    assert spark_dtype("int") == "long"
    assert spark_dtype("cat[ULabel]") == "string"
    assert spark_dtype("list[float]") == "array<double>"
    assert spark_dtype(None) == "string"


def test_record_sheet_export(lakehouse):
    lh = lakehouse
    feats = lh.save(
        "feature",
        [
            {"name": "gc_content", "dtype_str": "float"},
            {"name": "plasmid", "dtype_str": "str"},
            {"name": "passed_qc", "dtype_str": "bool"},
        ],
    )
    sch = lh.save("schema", [{"name": "sample-sheet", "itype": "Feature"}])[0]
    lh._append(
        "schema_features",
        [{"schema_id": sch["id"], "feature_id": f["id"], "optional": False} for f in feats],
    )
    trow = lh.save("record", [{"name": "Sample", "is_type": True, "schema_id": sch["id"]}])[0]
    recs = lh.save(
        "record",
        [
            {"name": "S1", "type_id": trow["id"]},
            {"name": "S2", "type_id": trow["id"]},
        ],
    )
    lh.annotate("record", recs[0]["id"], {"gc_content": 0.52, "passed_qc": True})
    lh.annotate("record", recs[1]["id"], {"gc_content": 0.61, "plasmid": "pUC19"})

    sheet = record_sheet(lh, "Sample")
    assert sheet.columns == ["id", "name", "gc_content", "plasmid", "passed_qc"]
    rows = {r["name"]: r for r in sheet.collect()}
    assert rows["S1"]["gc_content"] == 0.52 and rows["S1"]["passed_qc"] is True
    assert rows["S1"]["plasmid"] is None          # typed-empty missing value
    assert rows["S2"]["plasmid"] == "pUC19" and rows["S2"]["passed_qc"] is None
    assert dict(sheet.dtypes)["gc_content"] == "double"
    assert dict(sheet.dtypes)["passed_qc"] == "boolean"
