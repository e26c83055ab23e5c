"""Catalog: ingest, content-hash dedup, versioning, branches, upsert.

Mirrors reference behaviors: dedup (``artifact.py:384-505``),
is_latest heads (``_is_versioned.py:271-373``), soft delete / restore
(branch semantics ``query_set.py:71-90``), bulk save (``save.py``).
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bootstrap_rows(lakehouse):
    assert lakehouse.read_raw("branch").count() == 3
    assert lakehouse.read_raw("storage").count() == 1


def test_register_and_dedup(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="dims/nation.parquet")
    assert a1["suffix"] == ".parquet"
    assert a1["size"] > 0 and a1["hash"]
    # same content → same row back, registry unchanged (S10)
    a2 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="dims/nation2.parquet")
    assert a2["uid"] == a1["uid"]
    assert lakehouse.read_raw("artifact").count() == 1


def test_versioning_same_key(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="v/data.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="v/data.parquet")
    assert a2["uid"][:16] == a1["uid"][:16]          # same family stem
    assert a2["uid"][16:] != a1["uid"][16:]          # bumped suffix
    arts = lakehouse.read_raw("artifact").orderBy("id").collect()
    assert [r["is_latest"] for r in arts] == [False, True]


def test_save_dataframe_roundtrip(lakehouse, spark):
    df = spark.range(5).withColumn("x", F.col("id") * 2)
    row = lakehouse.save_dataframe(df, key="tables/t1.parquet")
    assert row["n_observations"] == 5
    assert row["otype"] == "DataFrame"
    back = lakehouse.open_artifact(row["uid"])
    assert back.count() == 5
    assert sorted(back.columns) == ["id", "x"]


def test_soft_delete_restore(lakehouse):
    row = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="d/r.parquet")
    lakehouse.delete("artifact", [row["id"]])
    # default read hides trash
    assert lakehouse.read("artifact").filter(F.col("id") == row["id"]).count() == 0
    # raw read still sees it, on the trash branch
    raw = lakehouse.read_raw("artifact").filter(F.col("id") == row["id"]).first()
    assert raw["branch_id"] == -1
    lakehouse.restore("artifact", [row["id"]])
    assert lakehouse.read("artifact").filter(F.col("id") == row["id"]).count() == 1


def test_delete_reassigns_latest_head(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="w/d.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="w/d.parquet")
    lakehouse.delete("artifact", [a2["id"]])
    heads = (
        lakehouse.read("artifact")
        .filter(F.col("is_latest") & (F.col("key") == "w/d.parquet"))
        .collect()
    )
    assert [h["id"] for h in heads] == [a1["id"]]  # head fell back to v1 (W1)


def test_bulk_save_upsert(lakehouse):
    saved = lakehouse.save("ulabel", [{"name": "benchmark"}, {"name": "test-set"}])
    assert len(saved) == 2 and all(r["id"] for r in saved)
    uid = saved[0]["uid"]
    lakehouse.save("ulabel", [{"uid": uid, "name": "benchmark-renamed"}])
    rows = lakehouse.read_raw("ulabel").orderBy("id").collect()
    assert len(rows) == 2
    assert rows[0]["name"] == "benchmark-renamed"


def test_unknown_registry_raises(lakehouse):
    with pytest.raises(KeyError):
        lakehouse.read_raw("nope")


def test_register_sql_views_branch_semantics(lakehouse):
    lakehouse.save("ulabel", [{"name": "visible"}])
    saved = lakehouse.save("ulabel", [{"name": "trashed"}])
    lakehouse.delete("ulabel", [saved[0]["id"]])  # soft-delete → trash branch
    views = lakehouse.register_sql_views(prefix="v_")
    assert "v_ulabel" in views
    names = {
        r["name"]
        for r in lakehouse.spark.sql("SELECT name FROM v_ulabel").collect()
    }
    assert "visible" in names and "trashed" not in names


def test_sql_views_resolve_is_latest_per_branch(lakehouse, spark):
    """VERDICT r5 #10: raw SQL gets version semantics — the main view
    shows ONE latest row per version family per branch; full history
    lives in the companion _versions view."""
    df1 = spark.range(3).withColumnRenamed("id", "x")
    df2 = spark.range(7).withColumnRenamed("id", "x")
    a1 = lakehouse.save_dataframe(df1, "versioned/a.parquet")
    a2 = lakehouse.save_dataframe(df2, "versioned/a.parquet")  # revision
    assert a2["uid"][:16] == a1["uid"][:16] and a2["uid"] != a1["uid"]
    lakehouse.register_sql_views(prefix="w_")
    rows = spark.sql(
        "SELECT uid FROM w_artifact WHERE key = 'versioned/a.parquet'"
    ).collect()
    assert [r["uid"] for r in rows] == [a2["uid"]], "one latest head per family"
    hist = {
        r["uid"]
        for r in spark.sql(
            "SELECT uid FROM w_artifact_versions WHERE key = 'versioned/a.parquet'"
        ).collect()
    }
    assert hist == {a1["uid"], a2["uid"]}, "full family history in _versions"
    # latest_only=False keeps the historical all-versions main view
    lakehouse.register_sql_views(prefix="x_", latest_only=False)
    assert (
        spark.sql("SELECT count(*) AS n FROM x_artifact WHERE key = 'versioned/a.parquet'")
        .collect()[0]["n"]
        == 2
    )


def test_collections_lifecycle(lakehouse, spark, tmp_path):
    df1 = spark.range(5).withColumnRenamed("id", "x")
    df2 = spark.range(5, 8).withColumnRenamed("id", "x")
    a1 = lakehouse.save_dataframe(df1, "shards/a.parquet")
    a2 = lakehouse.save_dataframe(df2, "shards/b.parquet")
    col = lakehouse.create_collection("all-shards", [a1["id"], a2["id"]])
    # union scan sees every member row
    assert lakehouse.open_collection("all-shards").count() == 8
    # identical member set dedups to the same collection (hash)
    again = lakehouse.create_collection("other-key", [a1["id"], a2["id"]])
    assert again["id"] == col["id"]
    # append → new version, same family, old head demoted
    df3 = spark.range(100, 102).withColumnRenamed("id", "x")
    a3 = lakehouse.save_dataframe(df3, "shards/c.parquet")
    v2 = lakehouse.append_to_collection("all-shards", a3["id"])
    assert v2["uid"][:16] == col["uid"][:16] and v2["uid"] != col["uid"]
    assert lakehouse.open_collection("all-shards").count() == 10
    from pyspark.sql import functions as F
    heads = (
        lakehouse.read("collection")
        .filter((F.col("key") == "all-shards") & F.col("is_latest"))
        .collect()
    )
    assert len(heads) == 1 and heads[0]["id"] == v2["id"]


def test_lookup_namespace(lakehouse):
    lakehouse.save("ulabel", [{"name": "Benchmark Set"}, {"name": "train-v2"}])
    from lamindb_spark.catalog.query import QuerySet

    lk = QuerySet(lakehouse, "ulabel").lookup()
    assert lk.benchmark_set["name"] == "Benchmark Set"
    assert lk.train_v2["name"] == "train-v2"
    assert len(lk) >= 2


def test_describe_artifact_json(lakehouse, spark):
    import json

    from lamindb_spark.lineage.context import track

    ctx = track(lakehouse, "pipe/describe", source_code="x=1", params={"p": 1})
    df = spark.range(3).withColumnRenamed("id", "x")
    art = lakehouse.save_dataframe(df, "desc/a.parquet")
    ctx.finish()
    doc = json.loads(lakehouse.describe_artifact("desc/a.parquet"))
    assert doc["artifact"]["uid"] == art["uid"]
    assert doc["transform"]["key"] == "pipe/describe"
    assert doc["storage"]


def test_read_payload_formats(lakehouse, spark, tmp_path):
    from lamindb_spark.sources.readers import read_payload

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    base = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(f"{base}/t.csv")
    df.coalesce(1).write.mode("overwrite").json(f"{base}/t.json")
    df.coalesce(1).write.mode("overwrite").orc(f"{base}/t.orc")
    for suffix in (".csv", ".json", ".orc"):
        got = read_payload(spark, f"{base}/t{suffix}", suffix)
        rows = sorted((int(r["id"]), r["s"]) for r in got.collect())
        assert rows == [(1, "a"), (2, "b")], suffix


def test_transfer_from_by_uid(lakehouse, spark, tmp_path):
    from lamindb_spark.catalog.lakehouse import Lakehouse

    other = Lakehouse(spark, str(tmp_path / "other-lake"))
    src = other.save("ulabel", [{"name": "celltype:T"}, {"name": "celltype:B"}])
    uids = [r["uid"] for r in src]
    got = lakehouse.transfer_from(other, "ulabel", uids)
    assert {r["uid"] for r in got} == set(uids)
    # idempotent: same uids update, not duplicate
    n = lakehouse.read("ulabel").count()
    lakehouse.transfer_from(other, "ulabel", uids)
    assert lakehouse.read("ulabel").count() == n
    names = {r["name"] for r in lakehouse.read("ulabel").collect()}
    assert {"celltype:T", "celltype:B"} <= names


def test_partitioned_payload_prunes(lakehouse, spark):
    from lamindb_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    e = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    lakehouse.save_dataframe(e, "parts/events", partition_by=["event_type"])
    opened = lakehouse.open_artifact("parts/events", is_run_input=False)
    q = opened.filter(F.col("event_type") == "error")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must actually appear in PartitionFilters
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf
    n_exact = e.filter(F.col("event_type") == "error").count()
    assert q.count() == n_exact


def test_persist_registries(lakehouse):
    lakehouse.save("ulabel", [{"name": "hot"}])
    done = lakehouse.persist_registries(["ulabel", "feature"])
    assert "ulabel" in done and "feature" not in done  # feature not materialized yet
    assert lakehouse.read("ulabel").count() == 1


def test_export_artifact_suffix_round_trip(lakehouse, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    for key in ("exports/t.csv", "exports/t.json", "exports/t.orc"):
        art = lakehouse.export_artifact(df, key)
        assert art["n_observations"] == 2 and art["suffix"] == "." + key.rsplit(".", 1)[-1]
        got = lakehouse.open_artifact(key, is_run_input=False)
        rows = sorted((int(r["id"]), r["s"]) for r in got.collect())
        assert rows == [(1, "a"), (2, "b")], key


def test_load_artifact_and_view(lakehouse, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    lakehouse.save_dataframe(df, "eager/t.parquet")
    pdf = lakehouse.load_artifact("eager/t.parquet", is_run_input=False)
    assert sorted(pdf["s"]) == ["a", "b"] and len(pdf) == 2
    v = lakehouse.view(n=3)
    assert "artifact" in v and "storage" in v
    assert v["artifact"][0]["key"] == "eager/t.parquet"  # newest first


def test_read_payload_arrow_ipc(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.feather as feather

    from lamindb_spark.sources.readers import read_payload

    t = pa.table({"id": [1, 2], "s": ["a", "b"]})
    p = str(tmp_path / "t.feather")
    feather.write_feather(t, p)
    got = sorted((int(r["id"]), r["s"]) for r in read_payload(spark, p, ".feather").collect())
    assert got == [(1, "a"), (2, "b")]


def test_release_checkpoints_sweeps_blocks(spark):
    from lamindb_spark.session import release_checkpoints

    df = spark.range(100).localCheckpoint(eager=True)
    assert df.count() == 100
    n = release_checkpoints(spark)
    assert n >= 1
    # nothing persistent remains; fresh work is unaffected
    assert release_checkpoints(spark) == 0
    assert spark.range(10).count() == 10


# Round 10 (ADVICE r9): hash-dedup across sibling branches + the
# mode='ignore' Observation hang.


def test_hash_dedup_across_sibling_branches(spark, tmp_path):
    """Reference get_stat_or_artifact dedups across ALL non-trash
    branches (~Q(branch_id=-1), artifact.py:454): the same bytes
    registered on two sibling work branches must resolve to ONE
    artifact row, not duplicate rows + payload copies."""
    from lamindb_spark.catalog.lakehouse import Lakehouse

    root = str(tmp_path / "lake")
    lh_a = Lakehouse(spark, root, current_branch_id=7)
    a = lh_a.register_artifact(f"{SF_DIR}/nation.parquet", key="b/nation.parquet")
    lh_b = Lakehouse(spark, root, current_branch_id=8)
    b = lh_b.register_artifact(f"{SF_DIR}/nation.parquet", key="b2/nation.parquet")
    assert b["id"] == a["id"]  # dedup hit across sibling branches
    assert lh_b.read_raw("artifact").filter("hash = '%s'" % a["hash"]).count() == 1


def test_hash_dedup_prefers_visible_branch(spark, tmp_path):
    """When BOTH a sibling-branch row and a visible (main) row carry
    the hash, the visible one wins so the caller can open it."""
    from lamindb_spark.catalog.lakehouse import Lakehouse

    root = str(tmp_path / "lake")
    lh_sib = Lakehouse(spark, root, current_branch_id=9)
    lh_sib.register_artifact(f"{SF_DIR}/region.parquet", key="s/region.parquet")
    lh_main = Lakehouse(spark, root)  # main branch
    # force a second row with the same hash on main: register via a
    # fresh content copy under a different key on the main lakehouse
    import shutil

    src = f"{SF_DIR}/region.parquet"
    cp = str(tmp_path / "region_copy.parquet")
    shutil.copy(src, cp)
    # sibling row exists -> dedup returns it even for main (non-trash
    # scope), so simulate the two-row state via save()
    sib_row = lh_main.read_raw("artifact").first().asDict()
    main_row = dict(sib_row)
    main_row["id"] = sib_row["id"] + 1000
    main_row["uid"] = sib_row["uid"][:-4] + "zzzz"
    main_row["branch_id"] = 1
    main_row["key"] = "m/region.parquet"
    lh_main.save("artifact", [main_row])
    got = lh_main.register_artifact(cp, key="x/region.parquet")
    assert got["branch_id"] == 1  # visible-scope hit preferred
    assert got["key"] == "m/region.parquet"


def test_save_dataframe_mode_ignore_existing_target_no_hang(lakehouse, spark):
    """SaveMode.Ignore with an existing target runs NO job, so the
    observed row-count metric never fires — the sink must not block on
    obs.get (ADVICE r9) and must return the existing artifact row."""
    df = spark.range(5).withColumnRenamed("id", "x")
    first = lakehouse.save_dataframe(df, "ig/t.parquet")
    assert first["n_observations"] == 5
    # pre-fix this call hung forever; now it returns the deduped row
    again = lakehouse.save_dataframe(
        spark.range(9).withColumnRenamed("id", "x"), "ig/t.parquet", mode="ignore"
    )
    assert again["id"] == first["id"]
    assert again["n_observations"] == 5  # existing payload untouched


def test_export_artifact_mode_ignore_existing_target_no_hang(lakehouse, spark):
    df = spark.range(3).withColumnRenamed("id", "x")
    first = lakehouse.export_artifact(df, "ig/t.csv")
    again = lakehouse.export_artifact(
        spark.range(8).withColumnRenamed("id", "x"), "ig/t.csv", mode="ignore"
    )
    assert again["id"] == first["id"]


def test_mode_ignore_guard_is_object_store_safe(lakehouse, spark, monkeypatch):
    """ADVICE r10: the hang guard checked ``os.path.exists(target)``,
    which is ALWAYS False for a non-posix storage-root URI — Ignore
    then short-circuits with the Observation attached and obs.get
    blocks forever. Pin the fix with a ``file:``-schemed root: the
    posix check is False for it, the Hadoop-FS check is True, and the
    second call must return (not hang) with the existing row."""
    import os as _os

    from lamindb_spark.catalog.lakehouse import _fs_exists

    sid, posix_root = lakehouse._resolve_storage_root()
    schemed = f"file:{posix_root}"
    monkeypatch.setattr(
        lakehouse, "_resolve_storage_root", lambda: (sid, schemed)
    )
    df = spark.range(4).withColumnRenamed("id", "x")
    first = lakehouse.save_dataframe(df, "os/t.parquet")
    target = f"{schemed}/os/t.parquet"
    assert not _os.path.exists(target)  # the old guard saw False here…
    assert _fs_exists(spark, target)  # …the Hadoop FS sees the payload
    # pre-fix this call hung forever on obs.get; now it skips the job
    # and registers against the existing payload
    again = lakehouse.save_dataframe(
        spark.range(9).withColumnRenamed("id", "x"), "os/t.parquet", mode="ignore"
    )
    assert again["id"] == first["id"]
    assert again["n_observations"] == 4  # existing payload untouched


def test_register_dir_one_artifact_per_file(lakehouse, tmp_path):
    """VERDICT r9 #4 — reference Artifact.from_dir semantics
    (artifact.py:2698-2808): count == n_files, keys mirror the
    hierarchy, re-ingest is a no-op, intra-dir duplicate bytes
    consolidate to one row."""
    d = tmp_path / "bundle"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("alpha")
    (d / "sub" / "b.txt").write_text("beta")
    (d / "sub" / "a_copy.txt").write_text("alpha")  # duplicate bytes

    arts = lakehouse.register_dir(str(d), run_id=None)
    assert len(arts) == 3
    keys = sorted(a["key"] for a in arts)
    # duplicate bytes -> the EXISTING a.txt row returns for a_copy.txt
    # (reference duplicate-hash consolidation), so its key appears twice
    assert keys == ["bundle/a.txt", "bundle/a.txt", "bundle/sub/b.txt"]
    assert len({a["id"] for a in arts}) == 2
    n_rows = lakehouse.read_raw("artifact").count()
    assert n_rows == 2  # 3 files, 2 distinct contents

    # re-ingest: same rows come back, registry unchanged
    again = lakehouse.register_dir(str(d))
    assert sorted(a["id"] for a in again) == sorted(a["id"] for a in arts)
    assert lakehouse.read_raw("artifact").count() == n_rows


def test_register_dir_constant_spark_jobs(lakehouse, spark, tmp_path):
    """VERDICT r10 #3 — register_dir must pay a CONSTANT number of
    Spark jobs, not O(n_files): the old per-file register_artifact
    loop launched ~4 jobs + a 1-row parquet write per file (~300k jobs
    for the reference's several-100k-files case; the reference bulk-
    inserts 10k-row batches, save.py:29-126). Measured via job groups:
    ingesting 4× the files must launch no more jobs."""

    def ingest(name, n_files):
        d = tmp_path / name
        d.mkdir()
        for i in range(n_files):
            (d / f"f{i:03}.txt").write_text(f"{name}-{i}")
        sc = spark.sparkContext
        sc.setJobGroup(name, "register_dir job count")
        try:
            rows = lakehouse.register_dir(str(d))
        finally:
            sc.setJobGroup(None, None)
        assert len(rows) == n_files
        assert len({r["uid"] for r in rows}) == n_files
        return len(spark.sparkContext.statusTracker().getJobIdsForGroup(name))

    jobs_small = ingest("small", 3)
    jobs_large = ingest("large", 12)
    assert jobs_large <= jobs_small  # O(1) in the file count
    # and the registry really holds every row, ingested in one append
    assert (
        lakehouse.read_raw("artifact")
        .filter(F.col("key").startswith("large/"))
        .count()
        == 12
    )


def test_register_dir_version_bump_on_changed_bytes(lakehouse, tmp_path):
    """Re-ingesting a directory after a file changed creates a NEW
    VERSION in that file's key family (batched path must preserve
    register_artifact's versioning semantics)."""
    d = tmp_path / "vdir"
    d.mkdir()
    (d / "x.txt").write_text("one")
    (d / "y.txt").write_text("two")
    first = {r["key"]: r for r in lakehouse.register_dir(str(d))}
    (d / "x.txt").write_text("one-changed")
    second = {r["key"]: r for r in lakehouse.register_dir(str(d))}
    # y unchanged -> deduped to the same row
    assert second["vdir/y.txt"]["uid"] == first["vdir/y.txt"]["uid"]
    # x changed -> same family (16-char stem), bumped suffix, latest
    old, new = first["vdir/x.txt"], second["vdir/x.txt"]
    assert new["uid"][:16] == old["uid"][:16]
    assert new["uid"] != old["uid"]
    assert new["is_latest"]
    heads = (
        lakehouse.read_raw("artifact")
        .filter((F.col("key") == "vdir/x.txt") & F.col("is_latest"))
        .collect()
    )
    assert [h["uid"] for h in heads] == [new["uid"]]  # old head demoted


def test_register_dir_managed_keys_resolve_to_payload(lakehouse, spark):
    """Review finding: a managed nested directory must be keyed ROOT-
    relative so artifact_path(key) points at the in-place payload —
    basename keys registered rows whose payload location didn't
    exist."""
    import os

    _sid, root = lakehouse._resolve_storage_root()
    d = os.path.join(root, "proj", "batchA")
    os.makedirs(d)
    with open(os.path.join(d, "x.csv"), "w") as fh:
        fh.write("a\n1\n")
    rows = lakehouse.register_dir(d)
    assert [r["key"] for r in rows] == ["proj/batchA/x.csv"]
    p = lakehouse.artifact_path(rows[0])
    assert os.path.exists(p)  # key resolves to the in-place payload
    assert open(p).read() == "a\n1\n"


def test_register_dir_skips_marker_files_and_empty_reingest_noop(
    lakehouse, tmp_path
):
    """Review findings: (1) _SUCCESS/.crc marker files are skipped —
    same rule as hash_dir, so the per-file and one-artifact views
    agree; (2) an unchanged EMPTY file re-ingests as the same row
    (hash dedup is skipped for empty files, so the no-op contract
    needs key dedup)."""
    d = tmp_path / "sparkout"
    d.mkdir()
    (d / "_SUCCESS").write_text("")
    (d / ".part-0.crc").write_bytes(b"\x00")
    (d / "part-0.txt").write_text("data")
    (d / "empty.txt").write_text("")

    rows = lakehouse.register_dir(str(d))
    assert sorted(r["key"] for r in rows) == [
        "sparkout/empty.txt",
        "sparkout/part-0.txt",
    ]
    n0 = lakehouse.read_raw("artifact").count()
    again = lakehouse.register_dir(str(d))
    assert sorted(r["uid"] for r in again) == sorted(r["uid"] for r in rows)
    assert lakehouse.read_raw("artifact").count() == n0  # true no-op


def test_delete_artifact_trash_then_permanent_with_storage(lakehouse, spark, tmp_path):
    """Reference Artifact.delete parity (artifact.py:3229-3267 +
    delete_permanently): trash first, then permanent; storage=True
    removes the payload only with the key's LAST row (version families
    share root/key)."""
    import os

    src = tmp_path / "p.csv"
    src.write_text("a\n1\n")
    v1 = lakehouse.register_artifact(str(src), key="del/p.csv")
    src.write_text("a\n2\n")
    v2 = lakehouse.register_artifact(str(src), key="del/p.csv")  # new version
    payload = lakehouse.artifact_path(v2)
    assert os.path.exists(payload)

    # soft: trash branch, payload untouched
    lakehouse.delete_artifact(v1["id"])
    raw = lakehouse.read_raw("artifact").filter(F.col("id") == v1["id"]).first()
    assert raw["branch_id"] == -1
    assert os.path.exists(payload)

    # permanent of the OLD version with storage=True: v2 still holds
    # the key -> payload must survive
    lakehouse.delete_artifact(v1["id"], permanent=True, storage=True)
    assert lakehouse.read_raw("artifact").filter(F.col("id") == v1["id"]).count() == 0
    assert os.path.exists(payload)

    # permanent of the LAST row with storage=True: payload removed
    lakehouse.delete_artifact(v2["id"], permanent=True, storage=True)
    assert not os.path.exists(payload)

    # unknown id raises
    import pytest as _pytest

    with _pytest.raises(KeyError):
        lakehouse.delete_artifact(99999)


def test_replace_artifact_in_place_no_new_version(lakehouse, spark, tmp_path):
    """Reference Artifact.replace (artifact.py:2809-2919): content
    overwritten in storage, SAME row/uid (no version bump), hash/size
    updated; identical bytes no-op; managed paths and file<->dir shape
    changes rejected."""
    src = tmp_path / "r.csv"
    src.write_text("a\n1\n")
    art = lakehouse.register_artifact(str(src), key="rep/r.csv")
    n0 = lakehouse.read_raw("artifact").count()

    new = tmp_path / "r2.csv"
    new.write_text("a\n999\n")
    upd = lakehouse.replace_artifact(art["id"], str(new))
    assert upd["uid"] == art["uid"]  # same identity, no new version
    assert upd["hash"] != art["hash"]
    assert lakehouse.read_raw("artifact").count() == n0
    # storage holds the NEW bytes at the same key path
    assert open(lakehouse.artifact_path(upd)).read() == "a\n999\n"
    # registry row reflects the update
    row = lakehouse.read_raw("artifact").filter(F.col("id") == art["id"]).first()
    assert row["hash"] == upd["hash"] and row["size"] == upd["size"]

    # identical bytes: no-op
    again = lakehouse.replace_artifact(art["id"], str(new))
    assert again["hash"] == upd["hash"]

    # a managed path is rejected (replace is for external content)
    import pytest as _pytest

    managed = lakehouse.artifact_path(upd)
    with _pytest.raises(ValueError, match="managed storage"):
        lakehouse.replace_artifact(art["id"], managed)
    # file -> folder shape change rejected
    d = tmp_path / "dirpayload"
    d.mkdir()
    (d / "x.txt").write_text("x")
    with _pytest.raises(ValueError, match="cannot replace"):
        lakehouse.replace_artifact(art["id"], str(d))


def test_lazy_artifact_stream_then_save(lakehouse, spark):
    """Reference Artifact.from_lazy (artifact.py:2199-2243): reserve a
    managed path, write into it with Spark, save registers IN PLACE
    (no copy) under the reserved key."""
    import os

    lazy = lakehouse.lazy_artifact(suffix=".parquet", key="lz/data")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="lazy path"):
        lazy.save()  # nothing written yet
    spark.range(7).withColumnRenamed("id", "x").write.parquet(lazy.path)
    art = lazy.save()
    assert art["key"] == "lz/data.parquet"
    assert art["n_files"] >= 1  # directory payload, markers skipped
    back = lakehouse.open_artifact(art["uid"], is_run_input=False)
    assert back.count() == 7
    # auto-generated internal path when key is omitted
    lazy2 = lakehouse.lazy_artifact(suffix=".parquet")
    assert "/.lamindb/" in lazy2.path and lazy2.key.startswith(".lamindb/")
    spark.range(2).write.parquet(lazy2.path)
    a2 = lazy2.save()
    assert os.path.isdir(lakehouse.artifact_path(a2))


def test_verify_collection_schema(lakehouse, spark):
    """Reference Collection.verify_schema (collection.py:601-612):
    member payload schemas must agree; the error names the offender
    and its column diff."""
    a = lakehouse.save_dataframe(spark.range(3).withColumnRenamed("id", "x"), "vs/a.parquet")
    b = lakehouse.save_dataframe(spark.range(2).withColumnRenamed("id", "x"), "vs/b.parquet")
    lakehouse.create_collection("vs-ok", [a["id"], b["id"]])
    lakehouse.verify_collection_schema("vs-ok")  # no raise

    from pyspark.sql import functions as F2

    c = lakehouse.save_dataframe(
        spark.range(2).select(F2.col("id").cast("string").alias("x"), F2.lit(1).alias("y")),
        "vs/c.parquet",
    )
    lakehouse.create_collection("vs-bad", [a["id"], c["id"]])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vs/c.parquet.*extra=\\['y'\\]"):
        lakehouse.verify_collection_schema("vs-bad")


def test_replace_artifact_rejects_non_latest_version(lakehouse, tmp_path):
    """Review finding: all versions share root/key (the newest bytes);
    replacing a NON-latest row would silently clobber the latest
    version's payload — rejected instead."""
    src = tmp_path / "nl.csv"
    src.write_text("a\n1\n")
    v1 = lakehouse.register_artifact(str(src), key="nl/d.csv")
    src.write_text("a\n2\n")
    v2 = lakehouse.register_artifact(str(src), key="nl/d.csv")
    ext = tmp_path / "other.csv"
    ext.write_text("a\n3\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="LATEST version"):
        lakehouse.replace_artifact(v1["id"], str(ext))
    # the latest's payload is untouched
    assert open(lakehouse.artifact_path(v2)).read() == "a\n2\n"


def test_lazy_artifact_dedup_hit_cleans_orphan(lakehouse, spark, tmp_path):
    """Review finding: when the streamed bytes content-hash-match an
    EXISTING artifact, save() returns that row and must remove the
    freshly written payload (no untracked orphan in managed storage)."""
    import os

    src = tmp_path / "seed.csv"
    src.write_text("x\n42\n")
    seed = lakehouse.register_artifact(str(src), key="lzc/seed.csv")
    lazy = lakehouse.lazy_artifact(key="lzc/dup.csv")
    with open(lazy.path, "w") as fh:
        fh.write("x\n42\n")  # same bytes as the seed
    got = lazy.save()
    assert got["id"] == seed["id"]  # dedup hit, canonical row returned
    assert not os.path.exists(lazy.path)  # orphan removed


def test_reference_field_pair_on_provenance_registries(lakehouse):
    """docs/faq/reference-field.md: reference/reference_type store an
    external link or ID on Record, Collection, Run (and Transform,
    which carries git provenance in the same pair). Round-trips
    through save and is queryable."""
    from pyspark.sql import functions as F

    row = lakehouse.save(
        "record",
        [{
            "name": "donor 001",
            "reference": "VX984545",
            "reference_type": "Donor ID from Vendor X",
        }],
    )[0]
    got = lakehouse.read("record").filter(F.col("id") == row["id"]).first()
    assert got["reference"] == "VX984545"
    assert got["reference_type"] == "Donor ID from Vendor X"
    for registry in ("collection", "run", "transform"):
        from lamindb_spark.catalog.schemas import REGISTRY_SCHEMAS

        cols = {f.name for f in REGISTRY_SCHEMAS[registry].fields}
        assert {"reference", "reference_type"} <= cols, registry


def test_field_validation_on_save(lakehouse):
    """docs/faq/validate-fields.md: models carrying Django validators
    reject malformed values at save (reference Reference.doi
    RegexValidator, URLField on url) — every offending field named,
    None passes (nullable)."""
    import pytest

    from lamindb_spark.errors import FieldValidationError

    with pytest.raises(FieldValidationError) as exc:
        lakehouse.save(
            "reference", [{"name": "my ref", "doi": "abc.ef", "url": "myurl.com"}]
        )
    assert "doi" in str(exc.value) and "url" in str(exc.value)
    # valid forms save; doi accepts the bare / doi: / resolver spellings
    rows = lakehouse.save(
        "reference",
        [
            {"name": "bare", "doi": "10.1000/xyz123"},
            {"name": "prefixed", "doi": "doi:10.1000/xyz123"},
            {"name": "resolver", "doi": "https://doi.org/10.1000/xyz123",
             "url": "https://example.com/paper"},
            {"name": "nulls"},
        ],
    )
    assert len(rows) == 4
    with pytest.raises(FieldValidationError):
        lakehouse.save("project", [{"name": "p", "url": "not a url"}])
