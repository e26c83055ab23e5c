"""Suffix-dispatched artifact loading (reference ``core/loaders.py``)."""

import json

import pandas as pd
import pytest

from lamindb_spark.sources.loaders import canonical_suffix, load_to_memory
from tests.conftest import SF_DIR


def test_canonical_suffix():
    assert canonical_suffix("a/b/conf.json") == ".json"
    assert canonical_suffix("x.csv.gz") == ".csv.gz"
    assert canonical_suffix("v.vitessce.json") == ".vitessce.json"
    assert canonical_suffix("UP.TXT") == ".txt"


def test_load_json_yaml_txt(tmp_path):
    j = tmp_path / "c.json"
    j.write_text(json.dumps({"lr": 0.1, "layers": [1, 2]}))
    assert load_to_memory(str(j)) == {"lr": 0.1, "layers": [1, 2]}
    y = tmp_path / "c.yaml"
    y.write_text("lr: 0.1\nname: run\n")
    assert load_to_memory(str(y)) == {"lr": 0.1, "name": "run"}
    t = tmp_path / "notes.txt"
    t.write_text("hello")
    assert load_to_memory(str(t)) == "hello"
    h = tmp_path / "report.html"
    h.write_text("<html/>")
    assert load_to_memory(str(h)) == str(h)  # display format → path


def test_load_compressed_csv(tmp_path):
    import gzip

    p = tmp_path / "t.csv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("a,b\n1,x\n2,y\n")
    out = load_to_memory(str(p))
    assert isinstance(out, pd.DataFrame) and list(out["a"]) == [1, 2]


def test_size_guard_and_unknown_suffix(tmp_path):
    big = tmp_path / "big.txt"
    big.write_text("x" * 1000)
    with pytest.raises(ValueError, match="too large"):
        load_to_memory(str(big), max_bytes=100)
    weird = tmp_path / "model.bin"
    weird.write_bytes(b"\x00")
    with pytest.raises(NotImplementedError, match="no driver loader"):
        load_to_memory(str(weird))


def test_lakehouse_load_artifact_dispatch(lakehouse, tmp_path):
    # tabular → Spark scan materialized to pandas (reference load_parquet)
    lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="t/n.parquet")
    out = lakehouse.load_artifact("t/n.parquet", is_run_input=False)
    assert isinstance(out, pd.DataFrame) and len(out) == 25
    # config json → dict on the driver
    cfg = tmp_path / "train.json"
    cfg.write_text(json.dumps({"epochs": 3}))
    lakehouse.register_artifact(str(cfg), key="configs/train.json")
    got = lakehouse.load_artifact("configs/train.json", is_run_input=False)
    assert got == {"epochs": 3}


def test_load_artifact_tracks_run_input(lakehouse, tmp_path):
    from pyspark.sql import functions as F

    from lamindb_spark.lineage.context import Context

    cfg = tmp_path / "c.yaml"
    cfg.write_text("k: v\n")
    lakehouse.register_artifact(str(cfg), key="configs/c.yaml")
    ctx = Context(lakehouse).track("p/load.py", source_code="z=1")
    lakehouse.load_artifact("configs/c.yaml")
    run_id = lakehouse.current_run_id
    ctx.finish()
    assert (
        lakehouse.read_raw("run_input_artifacts")
        .filter(F.col("run_id") == run_id)
        .count()
        == 1
    )
