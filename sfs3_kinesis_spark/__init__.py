"""sfs3_kinesis_spark — a PySpark-native analytics & stream-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline ``d-smith/sfs3-kinesis``
(a Step Functions + S3 + Kinesis event pipeline; see SURVEY.md):

* keyed JSON document state with read-modify-write enrichment
  (``operators.pipeline``),
* predicate gating + retry consistency (``operators.pipeline``,
  ``streaming.incremental``),
* an append-only status event stream (``sources``/``sinks``),
* stateful stream<->request correlation with timeouts and orphan
  handling (``streaming.correlate``),
* windowed stream aggregation (``streaming.windows``),

plus the relational layer (joins / aggregations / window functions /
sorts / set ops / scalar functions — ``plans.queries``) and
large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns — ``operators``).

Everything is DataFrame/SQL-first: logical plans are declared
declaratively and Catalyst/Tungsten pick the physical strategy.
Python UDFs appear only where built-ins cannot express the
semantics, and then only as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from sfs3_kinesis_spark.session import get_spark  # noqa: F401

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
