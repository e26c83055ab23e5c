"""flow/step decorators with nested-run linkage (VERDICT r11 #3;
reference ``core/_functions.py:137-230``): a @step run inside a @flow
run records ``initiated_by_run_id``, outputs land on the innermost
run, and the guards match the reference (@flow under an active run
raises, @step without one raises)."""

import pytest
from pyspark.sql import functions as F

from lamindb_spark.lineage import flow, step


def _runs(lh):
    return {r["id"]: r.asDict() for r in lh.read_raw("run").collect()}


def test_flow_with_nested_step_links_runs(lakehouse, spark, tmp_path):
    seen = {}

    @step(lakehouse)
    def prepare(n, factor=2):
        seen["step_run"] = lakehouse.current_run_id
        df = spark.range(n).withColumn("v", F.col("id") * factor)
        return lakehouse.save_dataframe(df, key="flowstep/prep.parquet")

    @flow(lakehouse)
    def my_workflow(n):
        seen["flow_run"] = lakehouse.current_run_id
        art = prepare(n, factor=3)
        # after the step finishes, the FLOW run is active again
        seen["after_step"] = lakehouse.current_run_id
        return art

    art = my_workflow(5)
    assert lakehouse.current_run_id is None  # cleared after the flow
    runs = _runs(lakehouse)
    flow_run = runs[seen["flow_run"]]
    step_run = runs[seen["step_run"]]
    assert seen["after_step"] == seen["flow_run"]
    # nested-run linkage: the step's initiator is the flow run
    assert step_run["initiated_by_run_id"] == flow_run["id"]
    assert flow_run["initiated_by_run_id"] is None
    # both runs closed clean
    assert flow_run["status_code"] == 0 and step_run["status_code"] == 0
    # the output artifact belongs to the INNERMOST (step) run
    assert art["run_id"] == step_run["id"]


def test_flow_captures_positional_and_default_params(lakehouse):
    import json

    @flow(lakehouse)
    def wf(a, b=10, name="x"):
        return a + b

    wf(7, name="y")
    run = (
        lakehouse.read_raw("run").orderBy(F.desc("id")).first().asDict()
    )
    params = json.loads(run["params"])
    assert params == {"a": 7, "b": 10, "name": "y"}


def test_step_without_active_run_raises(lakehouse):
    @step(lakehouse)
    def lonely():
        return 1

    with pytest.raises(RuntimeError, match="initiating run"):
        lonely()


def test_flow_under_active_run_raises(lakehouse):
    @flow(lakehouse)
    def inner():
        return 1

    @flow(lakehouse)
    def outer():
        return inner()

    with pytest.raises(RuntimeError, match="use @step"):
        outer()
    # the failed inner call must not leak a dangling run context
    assert lakehouse.current_run_id is None


def test_step_error_marks_run_and_restores_parent(lakehouse):
    ids = {}

    @step(lakehouse)
    def bad():
        ids["step"] = lakehouse.current_run_id
        raise ValueError("boom")

    @flow(lakehouse)
    def wf():
        ids["flow"] = lakehouse.current_run_id
        try:
            bad()
        except ValueError:
            pass
        ids["after"] = lakehouse.current_run_id

    wf()
    runs = _runs(lakehouse)
    assert runs[ids["step"]]["status_code"] == -1
    assert runs[ids["flow"]]["status_code"] == 0
    assert ids["after"] == ids["flow"]
