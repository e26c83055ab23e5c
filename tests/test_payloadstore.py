"""Payload-store seam (catalog/payloadstore.py, VERDICT r10 #4): the
posix and Hadoop-FS implementations must agree on every contract
operation — hashes byte-identical to hashlib.md5, relative sorted
walks, parent-creating copies — and the Lakehouse ingest path must
produce identical registry rows through either store."""

import hashlib
import os

import pytest

from lamindb_spark.catalog.payloadstore import (
    HadoopPayloadStore,
    PosixPayloadStore,
    has_scheme,
    store_for_root,
)


def test_has_scheme():
    assert has_scheme("s3a://bucket/x")
    assert has_scheme("file:/tmp/x")
    assert has_scheme("hdfs://nn/x")
    assert not has_scheme("/tmp/x")
    assert not has_scheme("relative/path")
    assert not has_scheme("x")


def test_store_for_root_selection(spark):
    assert isinstance(store_for_root(spark, "/tmp/lake"), PosixPayloadStore)
    assert isinstance(store_for_root(spark, "rel/lake"), PosixPayloadStore)
    assert isinstance(
        store_for_root(spark, "s3a://bucket/lake"), HadoopPayloadStore
    )
    # file: roots are local — served posix via _local_path normalization
    assert isinstance(store_for_root(spark, "file:/tmp/lake"), PosixPayloadStore)


@pytest.fixture()
def tree(tmp_path):
    d = tmp_path / "tree"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(b"alpha" * 1000)
    (d / "sub" / "b.bin").write_bytes(bytes(range(256)) * 10)
    (d / "sub" / "c.txt").write_text("gamma")
    return d


def test_posix_and_hadoop_stores_agree(spark, tree, tmp_path):
    posix = PosixPayloadStore()
    hadoop = HadoopPayloadStore(spark)
    root = str(tree)
    # walks: same relative sorted listing
    assert list(posix.walk_files(root)) == list(hadoop.walk_files(root))
    assert list(posix.walk_files(root)) == ["a.txt", "sub/b.bin", "sub/c.txt"]
    for rel in posix.walk_files(root):
        fp = f"{root}/{rel}"
        raw = open(fp, "rb").read()
        want = hashlib.md5(raw).hexdigest()
        assert posix.md5(fp) == want
        assert hadoop.md5(fp) == want  # JVM-side DigestUtils matches
        assert posix.size(fp) == hadoop.size(fp) == len(raw)
    for st in (posix, hadoop):
        assert st.exists(root) and st.is_dir(root)
        assert st.exists(f"{root}/a.txt") and not st.is_dir(f"{root}/a.txt")
        assert not st.exists(f"{root}/nope")
    # copy_file creates parents; copy_tree mirrors; remove deletes both
    for name, st in (("p", posix), ("h", hadoop)):
        dst = str(tmp_path / f"copy_{name}" / "deep" / "a.txt")
        st.copy_file(f"{root}/a.txt", dst)
        assert st.md5(dst) == posix.md5(f"{root}/a.txt")
        tdst = str(tmp_path / f"tree_{name}")
        st.copy_tree(root, tdst)
        assert list(st.walk_files(tdst)) == list(posix.walk_files(root))
        st.remove(dst)
        st.remove(tdst)
        assert not st.exists(dst) and not st.exists(tdst)


def test_hadoop_store_resolves_schemed_paths(spark, tree):
    hadoop = HadoopPayloadStore(spark)
    schemed = f"file:{tree}"
    assert hadoop.exists(schemed) and hadoop.is_dir(schemed)
    assert list(hadoop.walk_files(schemed)) == ["a.txt", "sub/b.bin", "sub/c.txt"]
    assert hadoop.md5(f"{schemed}/a.txt") == PosixPayloadStore().md5(
        f"{tree}/a.txt"
    )


def test_lakehouse_ingest_identical_through_either_store(spark, tmp_path, tree):
    """register_artifact and register_dir produce the same rows (key,
    hash, size, n_files) whichever store carries the payload I/O."""
    from lamindb_spark.catalog.lakehouse import Lakehouse

    rows = {}
    for name in ("posix", "hadoop"):
        store = (
            PosixPayloadStore() if name == "posix" else HadoopPayloadStore(spark)
        )
        lh = Lakehouse(
            spark, str(tmp_path / f"lake_{name}"), payload_store=store
        )
        a = lh.register_artifact(str(tree / "a.txt"), key="k/a.txt")
        d = lh.register_artifact(str(tree), key="k/tree")
        per = lh.register_dir(str(tree), key="files")
        rows[name] = (
            (a["hash"], a["size"]),
            (d["hash"], d["size"], d["n_files"]),
            sorted((r["key"], r["hash"], r["size"]) for r in per),
        )
        # dedup intact through this store: re-register returns same row
        assert lh.register_artifact(str(tree / "a.txt"), key="k2/a.txt")[
            "uid"
        ] == a["uid"]
    assert rows["posix"] == rows["hadoop"]
