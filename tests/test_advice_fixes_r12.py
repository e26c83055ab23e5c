"""Round-12 ADVICE fixes (all in catalog/lakehouse.py).

1. register_dir's dedup/family probes switch from literal isin lists
   to a broadcast semi-join above 256 values (plan-bloat guard).
2. register_dir called on the managed storage root itself composes
   root-relative keys with no leading slash.
3. empty-file semantics divergence between register_artifact (version
   per re-ingest, reference single-file path) and register_dir
   (key-dedup no-op, idempotent bulk contract) — pinned both ways.
4. replace_artifact swap temporaries carry '.'-prefixed basenames so
   crash orphans are invisible to hash_dir / register_dir walks.
"""

import os

from pyspark.sql import functions as F


def test_filter_in_small_uses_isin_large_uses_broadcast(lakehouse, spark):
    df = spark.range(1000).withColumn("k", F.concat(F.lit("v"), F.col("id")))
    # small: literal isin shows up as an In predicate in the plan
    small = lakehouse._filter_in(df, F.col("k"), [f"v{i}" for i in range(5)])
    assert small.count() == 5
    assert " IN " in small._jdf.queryExecution().optimizedPlan().toString() or \
        "isin" in small._jdf.queryExecution().optimizedPlan().toString().lower() or \
        "In(" in small._jdf.queryExecution().optimizedPlan().toString()
    # large: broadcast join, no giant literal list in the plan
    big_vals = [f"v{i}" for i in range(400)]
    big = lakehouse._filter_in(df, F.col("k"), big_vals)
    assert big.count() == 400
    plan = big._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    # result columns unchanged (probe column dropped)
    assert big.columns == df.columns


def test_filter_in_empty_values(lakehouse, spark):
    df = spark.range(10)
    assert lakehouse._filter_in(df, F.col("id"), []).count() == 0


def test_register_dir_on_storage_root_has_clean_keys(lakehouse):
    """ADVICE r11 #2: ingesting the storage root itself must yield
    root-relative keys ('a.txt', 'sub/b.txt'), never '/a.txt'."""
    _sid, root = lakehouse._resolve_storage_root()
    os.makedirs(f"{root}/sub", exist_ok=True)
    with open(f"{root}/a.txt", "w") as fh:
        fh.write("alpha")
    with open(f"{root}/sub/b.txt", "w") as fh:
        fh.write("beta")
    rows = lakehouse.register_dir(root)
    keys = sorted(r["key"] for r in rows)
    assert keys == ["a.txt", "sub/b.txt"]
    for r in rows:
        assert not r["key"].startswith("/")
        # the key must resolve back to the payload it describes
        p = lakehouse.artifact_path(r)
        assert os.path.exists(p)
        assert "//" not in p.replace("://", ":__")


def test_empty_file_semantics_divergence_pinned(lakehouse, tmp_path):
    """#3: single-file API appends a version per empty re-ingest
    (reference artifact.py:421-424); bulk API no-ops by key."""
    src = tmp_path / "empty.txt"
    src.write_text("")
    a1 = lakehouse.register_artifact(str(src), key="e/empty.txt")
    a2 = lakehouse.register_artifact(str(src), key="e/empty.txt")
    assert a1["id"] != a2["id"]  # new version each call
    assert a2["uid"][:16] == a1["uid"][:16]  # same family

    d = tmp_path / "bulk"
    d.mkdir()
    (d / "empty2.txt").write_text("")
    r1 = lakehouse.register_dir(str(d), key="bulkdir")
    r2 = lakehouse.register_dir(str(d), key="bulkdir")
    assert [r["id"] for r in r1] == [r["id"] for r in r2]  # no-op re-run


def test_replace_artifact_temporaries_hidden_from_walks(
    lakehouse, tmp_path, monkeypatch
):
    """#4: a crash mid-swap leaves only '.'-prefixed orphans, which
    hash_dir and register_dir walks already skip."""
    src = tmp_path / "v1.csv"
    src.write_text("a,b\n1,2\n")
    art = lakehouse.register_artifact(str(src), key="r/v1.csv")

    # make the swap crash right after the copy landed on the temp
    store = lakehouse._store_for(str(src))
    real_rename = type(store).rename

    def boom(self, a, b):  # first rename in the swap sequence
        raise RuntimeError("crash mid-swap")

    monkeypatch.setattr(type(store), "rename", boom)
    src2 = tmp_path / "v2.csv"
    src2.write_text("a,b\n3,4\n")
    try:
        lakehouse.replace_artifact(art["id"], str(src2))
    except RuntimeError:
        pass
    monkeypatch.setattr(type(store), "rename", real_rename)

    _sid, root = lakehouse._resolve_storage_root()
    # the orphan temp exists...
    orphans = [
        f for f in os.listdir(f"{root}/r") if ".tmp-" in f or ".old-" in f
    ]
    assert orphans, "expected a crash orphan for this test to be meaningful"
    assert all(f.startswith(".") for f in orphans)
    # ...and a bulk re-ingest over the directory does NOT register it
    rows = lakehouse.register_dir(f"{root}/r")
    assert sorted(r["key"] for r in rows) == ["r/v1.csv"]
