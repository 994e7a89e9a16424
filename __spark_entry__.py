"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference's staged pipeline,
SURVEY.md §3 EP3) over sf0.001.  ``queries()``/``oracle_sql()`` —
the full operator corpus from ``sfs3_kinesis_spark.plans`` (one
entry per operator family in SURVEY.md §2 plus the LLM-data ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sfs3_kinesis_spark.plans import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the 6-stage gated enrichment pipeline (reference
    EP3 semantics) over the sf0.001 documents, returning the
    completed process-state rows with terminal status."""
    return REGISTRY["pipeline_run"].spark(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
