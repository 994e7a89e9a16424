"""Canonical schemas for the engine.

The reference's data model is dynamic JSON (``JSON.parse`` on every
read — ``/root/reference/s3-for-process-data/aprocess.js:24``).  The
engine infers/declares once at the edge and is typed internally:
each pipeline stage's output is a typed ``StructType`` column on the
``process_state`` table (reference shapes at ``aprocess.js:68-74,
89-92,105-107,120,129,177-179``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-derived schemas (SURVEY.md §1, FIXTURES.md §A) -----------

STEP_A_OUTPUT = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("details", T.StringType()),
        T.StructField("stepAOutput1", T.StringType()),
        T.StructField("stepAOutput2", T.BooleanType()),
        T.StructField("stepAOutput3", T.LongType()),
    ]
)
STEP_B_OUTPUT = T.StructType(
    [
        T.StructField("property1", T.StringType()),
        T.StructField("property2", T.StringType()),
    ]
)
STEP_C_OUTPUT = T.StructType([T.StructField("cProperty", T.StringType())])
STEP_D_OUTPUT = T.StructType([T.StructField("d", T.StringType())])
STEP_E_OUTPUT = T.StructType([T.StructField("e", T.StringType())])
STEP_F_OUTPUT = T.StructType([T.StructField("downstreamExecutionArn", T.StringType())])

#: one row per transaction; stage columns NULL until the stage runs
#: ("column is non-NULL" == the reference's hasOwnProperty predicate,
#: aprocess.js:196-214)
PROCESS_STATE = T.StructType(
    [
        T.StructField("txn_id", T.StringType(), False),
        T.StructField("request", T.StringType()),
        T.StructField("step_a_output", STEP_A_OUTPUT),
        T.StructField("step_b_output", STEP_B_OUTPUT),
        T.StructField("step_c_output", STEP_C_OUTPUT),
        T.StructField("step_d_output", STEP_D_OUTPUT),
        T.StructField("step_e_output", STEP_E_OUTPUT),
        T.StructField("step_f_output", STEP_F_OUTPUT),
        T.StructField("attempts", T.IntegerType()),
    ]
)

#: the notification stream record {txnId, status}
#: (aprocess.js:150-153; partition key = txnId at :157); event_time /
#: event_id are engine additions for watermarks + idempotency.
STATUS_EVENT = T.StructType(
    [
        T.StructField("txn_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("event_id", T.StringType()),
    ]
)

#: correlation-state input: one row per in-flight request
#: (Map<txnId,{response,executionArn}> at svckinesis.js:66)
PENDING_REQUEST = T.StructType(
    [
        T.StructField("txn_id", T.StringType(), False),
        T.StructField("submitted_at", T.TimestampType()),
        T.StructField("execution_arn", T.StringType()),
        T.StructField("timeout_ms", T.LongType()),
    ]
)

#: correlation operator output
CORRELATION_RESULT = T.StructType(
    [
        T.StructField("txn_id", T.StringType(), False),
        T.StructField("outcome", T.StringType(), False),  # matched|orphan|timeout
        T.StructField("status", T.StringType()),  # SUCCEEDED|FAILED|NULL
        T.StructField("http_code", T.IntegerType()),  # 200|400|NULL
        T.StructField("latency_ms", T.LongType()),
    ]
)

# --- driver fixture schemas (FIXTURES.md §B) ----------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)
