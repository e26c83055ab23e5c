"""Instance settings (settings.py — reference ``ln.settings``,
``core/_settings.py`` + subsettings): the knobs with real engine
semantics, wired into from_values / register_artifact / slot
curation."""

import logging

import pytest
from pyspark.sql import functions as F

from lamindb_spark.curation.validate import from_values


def test_search_names_off_skips_lookup_and_duplicates(lakehouse):
    from_values(lakehouse, "ulabel", ["a", "b"])
    assert lakehouse.read("ulabel").count() == 2
    # default: get-or-create — no duplicates
    from_values(lakehouse, "ulabel", ["a", "c"])
    assert lakehouse.read("ulabel").count() == 3
    # off: raw create — the duplicate is the caller's problem,
    # exactly the reference's documented trade for bulk speed
    lakehouse.settings.creation.search_names = False
    from_values(lakehouse, "ulabel", ["a"])
    assert (
        lakehouse.read("ulabel").filter(F.col("name") == "a").count() == 2
    )


def test_artifact_skip_size_hash(lakehouse, tmp_path):
    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    p = tmp_path / "w.bin"
    p.write_bytes(b"payload-bytes")
    lakehouse.settings.creation.artifact_skip_size_hash = True
    a1 = lakehouse.register_artifact(str(p), key="m/w1.bin")
    assert a1["hash"] is None and a1["size"] == len(b"payload-bytes")
    # no hash -> no dedup: same content at another key is a NEW row
    p2 = tmp_path / "w2.bin"
    p2.write_bytes(b"payload-bytes")
    a2 = lakehouse.register_artifact(str(p2), key="m/w2.bin")
    assert a2["id"] != a1["id"]
    # directories: sizes from the listing, no per-file md5
    d = tmp_path / "store.dir"
    d.mkdir()
    (d / "x.txt").write_text("xx")
    (d / "y.txt").write_text("yyy")
    a3 = lakehouse.register_artifact(str(d), key="m/store.dir")
    assert a3["hash"] is None and a3["size"] == 5 and a3["n_files"] == 2
    # back on: hashing and dedup resume
    lakehouse.settings.creation.artifact_skip_size_hash = False
    a4 = lakehouse.register_artifact(str(p), key="m/w3.bin")
    assert a4["hash"] is not None
    assert lakehouse.register_artifact(str(p2), key="m/w4.bin")["id"] == a4["id"]


def test_missing_run_warning_and_silencer(lakehouse, tmp_path, caplog):
    p = tmp_path / "x.txt"
    p.write_text("x")
    with caplog.at_level(logging.WARNING, logger="lamindb_spark"):
        lakehouse.register_artifact(str(p), key="w/x.txt")
    assert any("no producing run" in r.message for r in caplog.records)
    caplog.clear()
    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    p2 = tmp_path / "y.txt"
    p2.write_text("y")
    with caplog.at_level(logging.WARNING, logger="lamindb_spark"):
        lakehouse.register_artifact(str(p2), key="w/y.txt")
    assert not any("no producing run" in r.message for r in caplog.records)
    # an active run also silences it
    caplog.clear()
    lakehouse.settings.creation.artifact_silence_missing_run_warning = False
    from lamindb_spark.lineage.context import Context

    ctx = Context(lakehouse).track("t.py", source_code="t")
    p3 = tmp_path / "z.txt"
    p3.write_text("z")
    with caplog.at_level(logging.WARNING, logger="lamindb_spark"):
        lakehouse.register_artifact(str(p3), key="w/z.txt")
    ctx.finish()
    assert not any("no producing run" in r.message for r in caplog.records)


def test_annotation_n_max_records_caps_slot_annotation(
    spark, lakehouse, tmp_path, caplog
):
    from lamindb_spark.curation.curator import CategoricalSpec
    from lamindb_spark.curation.schema_check import SchemaSpec
    from lamindb_spark.curation.slots import AnnDataCurator, SlotSpec
    from lamindb_spark.sources.anndata_long import AnnDataLong
    from lamindb_spark.sources.literals import literal_table

    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    n = 8
    registry = literal_table(
        spark, [(f"c{i}", None) for i in range(n)], ["name", "synonyms"]
    )
    obs = literal_table(
        spark, [(f"o{i}", f"c{i}") for i in range(n)], ["obs_id", "cell_type"]
    )
    var = literal_table(spark, [("g1",)], ["var_id"])
    x = literal_table(spark, [("o0", "g1", 1.0)], ["obs_id", "var_id", "value"])
    slots = {
        "obs": SlotSpec(
            spec=SchemaSpec(
                features={"obs_id": "string", "cell_type": "string"},
                maximal_set=False,
            ),
            categoricals={"cell_type": CategoricalSpec(registry, "name")},
        )
    }
    lakehouse.settings.annotation.n_max_records = 5
    cur = AnnDataCurator(AnnDataLong(obs=obs, var=var, x=x), slots)
    with caplog.at_level(logging.WARNING, logger="lamindb_spark"):
        art = cur.save_artifact(lakehouse, "arrays/capped.anndata")
    assert any("n_max_records" in r.message for r in caplog.records)
    ann = lakehouse.read_raw("annotation").filter(
        (F.col("entity_id") == art["id"]) & (F.col("feature_name") == "cell_type")
    )
    assert ann.count() == 0  # capped column not annotated


def test_verbosity_maps_to_logger_level(lakehouse):
    lg = logging.getLogger("lamindb_spark")
    lakehouse.settings.verbosity = "debug"
    assert lg.level == logging.DEBUG
    lakehouse.settings.verbosity = "warning"
    assert lg.level == logging.WARNING
    with pytest.raises(ValueError, match="verbosity"):
        lakehouse.settings.verbosity = "loud"


def test_track_run_inputs_mirror(lakehouse):
    assert lakehouse.settings.track_run_inputs is True
    lakehouse.settings.track_run_inputs = False
    assert lakehouse.track_run_inputs is False
    lakehouse.track_run_inputs = True
    assert lakehouse.settings.track_run_inputs is True
