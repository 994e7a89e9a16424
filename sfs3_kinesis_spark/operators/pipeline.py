"""The staged-enrichment pipeline — the reference's core compute.

Reference semantics (``/root/reference/s3-for-process-data/
aprocess.js``): a fixed chain stepA→…→stepF where each stage

1. reads the per-transaction state document (``aprocess.js:51-54``),
2. checks a precondition predicate — "previous stage's output key
   exists" (``aprocess.js:192-214``),
3. merges its output under a stage-specific key
   (``doc[outputKey] = result``, ``aprocess.js:57``),
4. writes the document back (``aprocess.js:58``),

with any stage error publishing a FAILED status event
(``aprocess.js:78-82`` et al.) and the terminal stage publishing
SUCCEEDED plus fanning out a downstream sub-pipeline
(``aprocess.js:165-190``).

Spark-first design: the document is a row of a keyed DataFrame with
one typed struct column per stage; each stage is a ``withColumn``
whose value is gated by ``F.when(predicate, result)``.  A NULL stage
column *is* the reference's missing JSON key, so the predicate for
stage N is simply ``col(stage N-1).isNotNull()``.  Catalyst collapses
the whole chain into a single whole-stage-codegen projection — the
six process hops of the reference become zero extra passes, and the
plan scales embarrassingly (pure per-row map, no shuffle) at any data
size.  Incremental (micro-batch) execution with retry/requeue
semantics lives in ``streaming.incremental``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUCCEEDED = "SUCCEEDED"
FAILED = "FAILED"

#: terminal stage name — the suffix of the idempotency key
TERMINAL_STAGE = "step-f"


def terminal_event_id(txn_col: Column) -> Column:
    """The status event's idempotency key: ``<txn_id>/step-f``.
    ONE definition shared by the producer-side event log
    (:func:`status_events`) and the consumer-side parser
    (``sources.stream.parse_status_events``) so the replay-dedup
    contract cannot drift between the two sides."""
    return F.concat_ws("/", txn_col, F.lit(TERMINAL_STAGE))


@dataclass(frozen=True)
class Step:
    """One pipeline stage.

    ``result`` is an arbitrary Column expression (typically a
    ``F.struct``) — the engine equivalent of the reference's
    host-language stage functions (``aprocess.js:64-135``; the
    reference's UDF surface, SURVEY.md §2.11).

    ``gate_on``: name (or tuple of names — ANDed) of the column(s)
    whose presence is this stage's precondition (``None`` == always
    run, like ``stepAInputPredicate`` at ``aprocess.js:192-194``).
    A gate column may be a PRIOR STAGE's output (the reference's
    "previous key exists" predicate) or an EXTERNAL side-input column
    (the reference's S3 document read, whose absence raises
    ``S3DataPreconditionError`` and is retried with backoff,
    ``serverless.yml:80-85`` — the cross-micro-batch requeue lives in
    ``streaming.incremental.RetryingIncrementalPipeline``).

    ``fail_if``: optional fault-injection predicate; rows matching it
    behave like a thrown stage error (output NULL → every later gate
    blocks → terminal status FAILED, mirroring ``aprocess.js:78-82``).
    Stage ERRORS are terminal in the reference (caught and published
    FAILED immediately); only PRECONDITION misses are retryable.
    """

    name: str
    output_col: str
    result: Column
    gate_on: Optional[str | tuple[str, ...]] = None
    fail_if: Optional[Column] = None

    def predicate(self) -> Column:
        if self.gate_on is None:
            return F.lit(True)
        gates = (self.gate_on,) if isinstance(self.gate_on, str) else tuple(self.gate_on)
        pred = F.lit(True)
        for g in gates:
            pred = pred & F.col(g).isNotNull()
        return pred


def reference_steps() -> list[Step]:
    """The six stages with the reference's literal outputs
    (``aprocess.js:68-74,89-92,105-107,120,129,177-179``)."""
    return [
        Step(
            "step-a",
            "step_a_output",
            F.struct(
                F.lit("ok").alias("status"),
                F.lit("nothing to share").alias("details"),
                F.lit("a1").alias("stepAOutput1"),
                F.lit(False).alias("stepAOutput2"),
                F.lit(123).cast("long").alias("stepAOutput3"),
            ),
        ),
        Step(
            "step-b",
            "step_b_output",
            F.struct(F.lit("p1").alias("property1"), F.lit("p2").alias("property2")),
            gate_on="step_a_output",
        ),
        Step(
            "step-c",
            "step_c_output",
            F.struct(F.lit("i like c").alias("cProperty")),
            gate_on="step_b_output",
        ),
        Step("step-d", "step_d_output", F.struct(F.lit("d output").alias("d")), gate_on="step_c_output"),
        Step("step-e", "step_e_output", F.struct(F.lit("e output").alias("e")), gate_on="step_d_output"),
        Step(
            "step-f",
            "step_f_output",
            F.struct(
                F.concat(F.lit("downstream:"), F.col("txn_id")).alias("downstreamExecutionArn")
            ),
            gate_on="step_e_output",
        ),
    ]


def run_pipeline(requests: DataFrame, steps: Optional[Sequence[Step]] = None) -> DataFrame:
    """Run the staged pipeline in batch over ``requests``.

    ``requests`` needs a ``txn_id`` column (plus any payload
    columns).  Returns the completed process-state DataFrame with one
    struct column per stage and a terminal ``status`` column
    (SUCCEEDED iff every gate passed — the reference's terminal
    notification, ``aprocess.js:182``).

    This is a single narrow projection: no shuffle, no Python, fully
    whole-stage-codegen — identical cost per row at sf0.001 and at
    100 TB (scales linearly with input splits).
    """
    steps = list(steps) if steps is not None else reference_steps()
    if not steps:
        # an explicitly-empty list (e.g. steps_from_config([])) would
        # otherwise surface as an opaque IndexError at steps[-1] —
        # inside foreachBatch for the streaming form
        raise ValueError("steps must be non-empty")
    df = requests
    for step in steps:
        result = step.result
        if step.fail_if is not None:
            result = F.when(~step.fail_if, result)  # error ⇒ missing output key
        df = df.withColumn(step.output_col, F.when(step.predicate(), result))
    terminal = steps[-1].output_col
    df = df.withColumn(
        "status",
        F.when(F.col(terminal).isNotNull(), F.lit(SUCCEEDED)).otherwise(F.lit(FAILED)),
    )
    return df


def faulted_expr(steps: Sequence[Step]) -> Column:
    """True where ANY stage's ``fail_if`` fault predicate fired — a
    thrown stage ERROR in reference terms, which is terminal
    (``aprocess.js:78-82`` publishes FAILED immediately).  Used by the
    retrying incremental pipeline to separate terminal errors from
    retryable PRECONDITION misses (``S3DataPreconditionError``,
    ``serverless.yml:80-85``): a FAILED row with no fault can only be
    a gate miss, i.e. an input that has not arrived yet."""
    pred = F.lit(False)
    for step in steps:
        if step.fail_if is not None:
            pred = pred | F.coalesce(step.fail_if, F.lit(False))
    return pred


def status_events(state: DataFrame, event_time: Optional[Column] = None) -> DataFrame:
    """Project the terminal notification records
    ``{txnId, status}`` (``aprocess.js:148-163``), keyed/partitioned
    by txn_id for per-key ordering (PartitionKey=txnId,
    ``aprocess.js:157``).  ``event_id`` = txn_id + stage is the
    idempotency key that upgrades the reference's fire-and-forget
    send to effective exactly-once under replays (SURVEY.md §7)."""
    ts = event_time if event_time is not None else F.current_timestamp()
    return state.select(
        F.col("txn_id"),
        F.col("status"),
        ts.alias("event_time"),
        terminal_event_id(F.col("txn_id")).alias("event_id"),
    ).repartition("txn_id")


def run_downstream(envelopes: DataFrame) -> DataFrame:
    """The downstream sub-pipeline: three identity stages
    (``/root/reference/s3-for-process-data/downstream.js:1-15``).
    Identity maps — Catalyst eliminates them; documented as explicit
    no-op stages for parity."""
    df = envelopes
    for _ in range(3):
        df = df.select("*")
    return df


def to_document_json(state: DataFrame) -> DataFrame:
    """Open-map JSON view of the typed state row — parity with the
    reference's dynamic whole-document representation
    (``JSON.stringify(body)``, ``aprocess.js:36``)."""
    payload = [c for c in state.columns if c != "txn_id"]
    return state.select(
        "txn_id", F.to_json(F.struct(*[F.col(c) for c in payload])).alias("document")
    )


def steps_from_config(config: list[dict]) -> list[Step]:
    """Declarative pipeline definition — the engine twin of the
    reference's ASL state machine (``serverless.yml:61-129``), where
    the stage chain is data, not code.

    Each entry::

        {"name": "step-a",            # stage name (ASL state name)
         "output_col": "step_a_output",
         "result": {...} | "<sql>",   # literal dict -> struct of
                                      # literals (the reference's
                                      # constant stage outputs);
                                      # string -> any SQL expression
         "gate_on": "step_x_output",  # optional precondition column
         "fail_if": "<sql bool>"}     # optional fault injection

    A literal-dict result reproduces exactly what the reference's
    stages do (constant payloads, ``aprocess.js:68-74``); the SQL
    string form is the general UDF surface.  Because the whole
    pipeline is data, it can be stored, diffed, and generated — the
    property the reference gets from YAML, without a process hop per
    stage.
    """
    steps = []
    for entry in config:
        result = entry["result"]
        if isinstance(result, dict):
            cols = [F.lit(v).alias(k) for k, v in result.items()]
            result_col = F.struct(*cols)
        else:
            result_col = F.expr(result)
        steps.append(
            Step(
                entry["name"],
                entry["output_col"],
                result_col,
                gate_on=entry.get("gate_on"),
                fail_if=F.expr(entry["fail_if"]) if entry.get("fail_if") else None,
            )
        )
    return steps
