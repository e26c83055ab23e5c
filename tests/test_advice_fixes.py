"""Regression tests for advisor findings.

Round 1 (ADVICE.md r01):
1. per-registry uid stem length in is_latest reconciliation + reconcile
   after transform version bumps;
2. values()/values_list() apply the default branch predicate;
3. track() scopes transform reuse to (key, hash), not hash alone;
4. exclude() over join paths is NOT(A AND B), not NOT(A) AND NOT(B);
5. version bump uses the MAX base62 suffix in the family.

Round 2 (ADVICE.md r02):
6. exclude() with a join lookup on a projected QuerySet (no id column)
   raises instead of silently dropping rows;
7. take_ids re-reads the counters sidecar so two live Lakehouse
   instances on one root never double-allocate ids;
8. to_dataframe(include=<to-many path>) yields EMPTY lists, not NULL,
   for entities with no links.
"""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.catalog.query import QuerySet
from lamindb_spark.lineage.context import Context
from tests.conftest import SF_DIR


def test_transform_versions_single_latest(lakehouse):
    """Same key, changing source → versions in one uid family with
    exactly one is_latest head (ADVICE #1)."""
    c1 = Context(lakehouse).track("pipe/a.py", source_code="v1")
    c1.finish()
    c2 = Context(lakehouse).track("pipe/a.py", source_code="v2")
    c2.finish()
    c3 = Context(lakehouse).track("pipe/a.py", source_code="v3")
    c3.finish()
    tf = lakehouse.read_raw("transform")
    rows = tf.filter(F.col("key") == "pipe/a.py").collect()
    assert len(rows) == 3
    stems = {r["uid"][:12] for r in rows}
    assert len(stems) == 1, "versions must share the 12-char stem"
    assert sorted(r["uid"][12:] for r in rows) == ["0000", "0001", "0002"]
    assert sum(r["is_latest"] for r in rows) == 1
    head = next(r for r in rows if r["is_latest"])
    assert head["hash"] == c3.transform["hash"]
    # get(key=...) must resolve to the single head, not raise Multiple
    got = QuerySet(lakehouse, "transform").get(key="pipe/a.py")
    assert got["uid"] == head["uid"]


def test_track_reuse_scoped_to_key(lakehouse):
    """Two pipelines with identical (default) source must NOT collapse
    onto one transform (ADVICE #3)."""
    c1 = Context(lakehouse).track("pipe/x.py")
    c1.finish()
    c2 = Context(lakehouse).track("pipe/y.py")
    c2.finish()
    assert c1.transform["id"] != c2.transform["id"]
    assert c1.transform["key"] == "pipe/x.py"
    assert c2.transform["key"] == "pipe/y.py"
    # same key + same source → reuse
    c3 = Context(lakehouse).track("pipe/x.py")
    c3.finish()
    assert c3.transform["id"] == c1.transform["id"]


def test_values_respect_branch_filter(lakehouse):
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="k/nation.parquet")
    lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="k/region.parquet")
    lakehouse.delete("artifact", [a1["id"]])  # → trash branch
    qs = QuerySet(lakehouse, "artifact")
    assert qs.count() == 1
    # values_list / values / to_list must not leak trash rows (ADVICE #2)
    assert len(qs.values_list("uid")) == 1
    assert qs.values("uid").count() == 1
    assert len(qs.to_list("key")) == 1
    # projection that drops branch_id still branch-filtered
    assert qs.values("key").count() == 1


def test_exclude_conjunction_semantics(lakehouse):
    """exclude(relation_path=..., plain=...) removes rows matching the
    CONJUNCTION only (ADVICE #4)."""
    ctx = Context(lakehouse).track("pipe/ingest.py", source_code="s")
    lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="t/nation.parquet")
    ctx.finish()
    # second artifact with no run
    lakehouse.current_run_id = None
    lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="t/region.parquet")
    qs = QuerySet(lakehouse, "artifact")
    assert qs.count() == 2
    # A = produced by that pipeline (join path), B = key contains nation
    both = qs.filter(run__transform__key="pipe/ingest.py", key__contains="nation")
    assert both.count() == 1
    # NOT(A AND B): only the row matching BOTH is removed → 1 remains...
    ex = qs.exclude(run__transform__key="pipe/ingest.py", key__contains="nation")
    assert ex.count() == 1
    # ...whereas NOT(A) AND NOT(B) would remove the nation row AND the
    # pipeline row, leaving 0. Also check with a non-matching conjunct:
    ex2 = qs.exclude(run__transform__key="pipe/ingest.py", key__contains="region")
    assert ex2.count() == 2  # conjunction matches nothing → nothing removed


def test_version_bump_uses_max_suffix(lakehouse, tmp_path):
    """After out-of-order family history the next uid increments the MAX
    suffix, never colliding (ADVICE #5)."""
    p = tmp_path / "doc.txt"
    uids = []
    for i in range(3):
        p.write_text(f"content-{i}")
        row = lakehouse.register_artifact(str(p), key="docs/doc.txt")
        uids.append(row["uid"])
    assert len(set(uids)) == 3
    stem = uids[0][:16]
    assert all(u[:16] == stem for u in uids)
    assert [u[16:] for u in uids] == ["0000", "0001", "0002"]
    # simulate out-of-order: trash the newest head, then ingest again —
    # suffix must still advance past the max ever used (0003), not
    # re-increment the surviving head (which would collide with 0002)
    arts = lakehouse.read_raw("artifact")
    newest = arts.filter(F.col("uid") == uids[2]).first()
    lakehouse.delete("artifact", [newest["id"]], permanent=True)
    p.write_text("content-3")
    row = lakehouse.register_artifact(str(p), key="docs/doc.txt")
    assert row["uid"] == stem + "0002" or row["uid"][16:] not in {"0000", "0001"}
    all_uids = [r["uid"] for r in lakehouse.read_raw("artifact")
                .filter(F.col("uid").startswith(stem)).collect()]
    assert len(all_uids) == len(set(all_uids)), "uid collision after restore"


def test_exclude_join_lookup_after_projection_raises(lakehouse):
    """r02 #2: exclude(relation path) on values(...) output has no id to
    anti-join on — must raise clearly, never emit a None condition."""
    lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="e/nation.parquet")
    qs = QuerySet(lakehouse, "artifact").values("key")
    with pytest.raises(ValueError, match="id"):
        qs.exclude(run__transform__key="pipe/whatever.py")
    # plain column exclude on a projection still works
    assert qs.exclude(key__contains="region").count() == 1


def test_take_ids_two_instances_disjoint(lakehouse, spark):
    """r02 #3: a second live Lakehouse on the same root must see the
    first instance's allocations (merge-max re-read in take_ids)."""
    from lamindb_spark.catalog.lakehouse import Lakehouse

    lh2 = Lakehouse(spark, lakehouse.root)
    ranges = []
    for lh in (lakehouse, lh2, lakehouse, lh2):
        start = lh.take_ids("ulabel", 5)
        ranges.append(set(range(start, start + 5)))
    allocated = set().union(*ranges)
    assert len(allocated) == 20, f"overlapping id ranges: {ranges}"


def test_include_to_many_empty_list_not_null(lakehouse):
    """r02 #4: include= to-many columns are always iterable lists."""
    labels = lakehouse.save("ulabel", [{"name": "tagged"}])
    a1 = lakehouse.register_artifact(f"{SF_DIR}/nation.parquet", key="i/nation.parquet")
    a2 = lakehouse.register_artifact(f"{SF_DIR}/region.parquet", key="i/region.parquet")
    lakehouse.link_labels(a1["id"], [labels[0]["id"]])
    pdf = QuerySet(lakehouse, "artifact").to_dataframe(include=["ulabels__name"])
    by_id = {r["id"]: r for _, r in pdf.iterrows()}
    assert list(by_id[a1["id"]]["ulabels__name"]) == ["tagged"]
    unlinked = by_id[a2["id"]]["ulabels__name"]
    assert unlinked is not None and list(unlinked) == []


# Round 4 (ADVICE.md r04): explicit NULL-text semantics in the dedup
# kernels (independent of size(NULL) / ansi settings), bench frames
# without an id column in contamination_overlap, and a single Catalyst
# size estimate feeding both ngram_jaccard gates.


@pytest.fixture()
def null_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, None),
            (3, None),
            (4, ""),
            (5, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )


def test_null_text_pairs_as_exact_dups_in_ngram_jaccard(spark, null_docs):
    """NULL text normalizes to '' → null/empty docs share the whole-doc
    shingle and pair with jaccard 1.0 (never silently dropped), under
    BOTH ansi settings (ADVICE r4 #1)."""
    from lamindb_spark.pipeline.dedup import ngram_jaccard_pairs

    for ansi in ("true", "false"):
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        try:
            pairs = {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(null_docs, threshold=0.5).collect()
            }
        finally:
            spark.conf.unset("spark.sql.ansi.enabled")
        assert pairs[(2, 3)] == 1.0, "null-null must pair as exact dups"
        assert pairs[(2, 4)] == 1.0, "null-empty must pair as exact dups"
        assert pairs[(1, 5)] == 1.0


def test_null_text_rows_survive_fingerprint_and_signatures(spark, null_docs):
    """winnow_fingerprint / portable minhash / simhash emit a row for
    every doc including null text — no silent drops (ADVICE r4 #1)."""
    from lamindb_spark.pipeline.dedup import (
        minhash_signatures,
        minhash_signatures_portable,
        simhash_signatures,
        winnow_fingerprint,
    )

    fp = winnow_fingerprint(null_docs).collect()
    assert {r["doc_id"] for r in fp} == {1, 2, 3, 4, 5}
    by_id = {r["doc_id"]: r["fingerprint"] for r in fp}
    assert by_id[2] == by_id[3] == by_id[4], "null == null == empty"
    assert by_id[2] is not None

    sig = minhash_signatures_portable(null_docs, n_hashes=4)
    assert sig.groupBy("doc_id").count().count() == 5

    assert minhash_signatures(null_docs).count() == 5
    assert simhash_signatures(null_docs).count() == 5


def test_contamination_bench_without_id_column(spark, null_docs):
    """The bench side needs only text_col; frames lacking doc_id work
    (ADVICE r4 #2)."""
    from lamindb_spark.pipeline.dedup import contamination_overlap

    bench = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_overlap(null_docs, bench).collect()
    }
    assert out[1] and out[5]
    assert not out[2] and not out[4]
