"""Query plans: the engine's declared operator corpus.

``REGISTRY`` maps query name → :class:`QuerySpec` (a Spark
DataFrame-producing callable + the equivalent ANSI SQL oracle for
DuckDB).  Every operator family in SURVEY.md §2 has at least one
entry; ``__spark_entry__.py`` re-exports the registry to the driver.
"""

from sfs3_kinesis_spark.plans.core import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates REGISTRY
from sfs3_kinesis_spark.plans import relational  # noqa: F401,E402
from sfs3_kinesis_spark.plans import events_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import pipeline_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import llm_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import temporal_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import sampling_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import tpch_extra  # noqa: F401,E402
from sfs3_kinesis_spark.plans import analytics_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import scale_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import mining_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import graph_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import advanced_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import retrieval_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import feature_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import eval_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import projection_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import timeseries_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import population_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import curation_queries  # noqa: F401,E402
from sfs3_kinesis_spark.plans import media_queries  # noqa: F401,E402
