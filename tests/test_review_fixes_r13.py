"""Pins for the r13 code-review fixes (behavioral ones)."""

import datetime

from pyspark.sql import functions as F

from lamindb_spark.sources.literals import literal_table


def test_curate_corpus_keeps_null_text_rows(spark):
    """NULL-text rows must stay in the output with a verdict — the
    equi-join formulation silently dropped them (review finding)."""
    from lamindb_spark.pipeline.corpus import curate_corpus

    rows = [(1, "the quick brown fox jumps over the dog"), (2, None), (3, None)]
    df = literal_table(spark, rows, ["doc_id", "text"])
    out = curate_corpus(df).collect()
    assert len(out) == 3  # kept + dropped == input, always
    by_id = {r["doc_id"]: r for r in out}
    # the two NULL-text rows form ONE family (null fingerprint) with
    # the lowest id as keeper — exactly the old window semantics
    assert by_id[2]["n_copies"] == 2 and by_id[3]["n_copies"] == 2
    assert by_id[2]["is_keeper"] and not by_id[3]["is_keeper"]
    assert not by_id[2]["keep"]  # fails the quality/token gates anyway


def test_checkpoint_dedup_resave_replaces_flags(lakehouse, tmp_path):
    """Re-saving byte-identical weights hash-dedups to the SAME
    artifact; its feature rows must be REPLACED, not accumulated
    (review finding: true+false both matched the EAV filters)."""
    import json

    from lamindb_spark.integrations.checkpoints import CheckpointPublisher

    pub = CheckpointPublisher(lakehouse, "models/dd", mode="min")
    p1 = tmp_path / "e1.ckpt"
    p1.write_bytes(b"same-weights")
    a1 = pub.save_checkpoint(str(p1), score=0.5)
    # same bytes under a different filename -> dedup hit, same artifact
    p2 = tmp_path / "e2.ckpt"
    p2.write_bytes(b"same-weights")
    a2 = pub.save_checkpoint(str(p2), score=0.5)
    assert a2["id"] == a1["id"]
    rows = (
        lakehouse.read_raw("annotation")
        .filter(
            (F.col("entity_id") == a1["id"])
            & (F.col("feature_name") == "is_last_model")
        )
        .collect()
    )
    vals = sorted(json.loads(r["value_json"]) for r in rows)
    assert vals == [True], vals  # exactly one value, not [False, True]


def test_checkpoint_max_mode_tiebreak_id_asc(lakehouse, tmp_path):
    """Equal scores in max mode must rank the LOWER id first, same as
    min mode (review finding: reverse= flipped the id tiebreak)."""
    import json

    from lamindb_spark.integrations.checkpoints import CheckpointPublisher

    pub = CheckpointPublisher(lakehouse, "models/tb", mode="max")
    arts = []
    for i in range(2):
        p = tmp_path / f"t{i}.ckpt"
        p.write_bytes(f"w{i}".encode())
        arts.append(pub.save_checkpoint(str(p), score=0.7))
    ranks = {
        r["entity_id"]: json.loads(r["value_json"])
        for r in lakehouse.read_raw("annotation")
        .filter(F.col("feature_name") == "model_rank")
        .collect()
    }
    first, second = sorted(a["id"] for a in arts)
    assert ranks[first] == 0 and ranks[second] == 1


def test_cleanup_spares_cross_branch_shared_environment(lakehouse, tmp_path):
    """An environment artifact shared (by hash-dedup) with a live run
    on ANOTHER branch must survive cleanup (review finding: the live
    scan was branch-scoped)."""
    from lamindb_spark.lineage.context import Context
    from lamindb_spark.lineage.environment import cleanup_dangling_runs

    lakehouse.settings.creation.artifact_silence_missing_run_warning = True
    env = tmp_path / "env.txt"
    env.write_text("numpy==1.0\n")
    art = lakehouse.register_artifact(
        str(env), key="environments/env.txt", kind="__lamindb_run__"
    )
    # crashed run on the current branch referencing the environment
    ctx = Context(lakehouse).track("crash.py", source_code="x")
    crashed = dict(ctx.run)
    lakehouse.save("run", [{**crashed, "environment_id": art["id"]}])
    lakehouse.current_run_id = None
    # live (finished) run on a SIBLING branch sharing the same artifact
    sibling = lakehouse.save("branch", [{"name": "wip"}])[0]
    saved_branch = lakehouse.current_branch_id
    lakehouse.current_branch_id = sibling["id"]
    ctx2 = Context(lakehouse).track("live.py", source_code="y")
    live = dict(ctx2.run)
    lakehouse.save("run", [{**live, "environment_id": art["id"]}])
    ctx2.finish()
    lakehouse.current_branch_id = saved_branch

    later = datetime.datetime.now(datetime.timezone.utc).replace(
        tzinfo=None
    ) + datetime.timedelta(hours=48)
    out = cleanup_dangling_runs(lakehouse, older_than_hours=24, now=later)
    assert out["runs"] >= 1 and out["artifacts"] == 0
    assert (
        lakehouse.read_raw("artifact").filter(F.col("id") == art["id"]).count() == 1
    )


def test_cellxgene_ontology_mode_has_no_suspension_twin(lakehouse):
    from lamindb_spark.examples import (
        create_cellxgene_schema,
        save_cellxgene_defaults,
    )

    save_cellxgene_defaults(lakehouse)
    built = create_cellxgene_schema(lakehouse, field_types="ontology_id")
    cols = set(built["slots"]["obs"].spec.features)
    assert "suspension_type_ontology_term_id" not in cols
    assert "tissue_type_ontology_term_id" not in cols
