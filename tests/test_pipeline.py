"""Batch pipeline semantics (reference EP3, SURVEY.md §3): gated
stage chain, failure routing, document view, notifications."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.pipeline import (
    Step,
    reference_steps,
    run_downstream,
    run_pipeline,
    status_events,
    to_document_json,
)


def _requests(spark, n=5):
    return spark.range(n).select(
        F.col("id").cast("string").alias("txn_id"),
        F.to_json(F.struct(F.lit(True).alias("foo"))).alias("request"),
    )


def test_happy_path_all_stages(spark):
    state = run_pipeline(_requests(spark))
    rows = {r["txn_id"]: r for r in state.collect()}
    assert len(rows) == 5
    r = rows["0"]
    # the reference's literal stage outputs (aprocess.js:68-74 etc.)
    assert r["step_a_output"]["status"] == "ok"
    assert r["step_a_output"]["stepAOutput2"] is False
    assert r["step_a_output"]["stepAOutput3"] == 123
    assert r["step_b_output"]["property1"] == "p1"
    assert r["step_c_output"]["cProperty"] == "i like c"
    assert r["step_d_output"]["d"] == "d output"
    assert r["step_e_output"]["e"] == "e output"
    assert r["step_f_output"]["downstreamExecutionArn"] == "downstream:0"
    assert r["status"] == "SUCCEEDED"


def test_failure_blocks_downstream_gates(spark):
    steps = reference_steps()
    c = steps[2]
    steps[2] = Step(c.name, c.output_col, c.result, c.gate_on, fail_if=F.col("txn_id") == "1")
    state = run_pipeline(_requests(spark), steps)
    rows = {r["txn_id"]: r for r in state.collect()}
    failed = rows["1"]
    # step-c failed => c/d/e/f outputs absent, terminal FAILED (T9)
    assert failed["step_b_output"] is not None
    assert failed["step_c_output"] is None
    assert failed["step_d_output"] is None
    assert failed["step_f_output"] is None
    assert failed["status"] == "FAILED"
    assert rows["0"]["status"] == "SUCCEEDED"


def test_status_events_shape(spark):
    state = run_pipeline(_requests(spark, 3))
    ev = status_events(state, event_time=F.lit("2024-01-01").cast("timestamp"))
    rows = ev.collect()
    assert {r["status"] for r in rows} == {"SUCCEEDED"}
    assert {r["event_id"] for r in rows} == {"0/step-f", "1/step-f", "2/step-f"}


def test_document_json_roundtrip(spark):
    state = run_pipeline(_requests(spark, 1))
    doc = to_document_json(state).collect()[0]
    assert doc["txn_id"] == "0"
    assert '"cProperty":"i like c"' in doc["document"]
    assert '"status":"SUCCEEDED"' in doc["document"]


def test_downstream_identity(spark):
    state = run_pipeline(_requests(spark, 4))
    assert run_downstream(state.select("txn_id")).count() == 4


def test_pipeline_is_single_stage_plan(spark):
    """The whole 6-stage chain must collapse into one projection —
    no shuffle, no extra exchanges (reference X1 → Spark codegen)."""
    state = run_pipeline(_requests(spark))
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pipeline_from_declarative_config(spark):
    """A config-defined pipeline (the ASL-as-data parity form) runs
    identically to the code-defined reference_steps chain."""
    from sfs3_kinesis_spark.operators.pipeline import (
        reference_steps,
        run_pipeline,
        steps_from_config,
    )

    config = [
        {"name": "step-a", "output_col": "step_a_output",
         "result": {"status": "ok", "details": "nothing to share",
                    "stepAOutput1": "a1", "stepAOutput2": False,
                    "stepAOutput3": 123}},
        {"name": "step-b", "output_col": "step_b_output",
         "result": {"property1": "p1", "property2": "p2"},
         "gate_on": "step_a_output"},
        {"name": "step-c", "output_col": "step_c_output",
         "result": "named_struct('cProperty', 'i like c')",
         "gate_on": "step_b_output"},
    ]
    docs = spark.createDataFrame([("t1",), ("t2",)], "txn_id string")
    out_cfg = run_pipeline(docs, steps_from_config(config))
    rows = {r.txn_id: r for r in out_cfg.collect()}
    assert rows["t1"].step_a_output.stepAOutput3 == 123
    assert rows["t1"].step_b_output.property2 == "p2"
    assert rows["t1"].step_c_output.cProperty == "i like c"
    assert rows["t1"].status == "SUCCEEDED"

    # the first three reference stages produce the same outputs
    ref = run_pipeline(docs, reference_steps()[:3]).collect()
    cfg_cols = {f.name for f in out_cfg.schema.fields}
    for r in ref:
        assert r.step_a_output.asDict() == rows[r.txn_id].step_a_output.asDict()
        assert r.step_b_output.asDict() == rows[r.txn_id].step_b_output.asDict()
        assert r.step_c_output.asDict() == rows[r.txn_id].step_c_output.asDict()
    assert {"step_a_output", "step_b_output", "step_c_output"} <= cfg_cols
