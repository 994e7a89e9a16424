"""Registry plumbing for the query corpus.

Conventions that make the DuckDB-oracle hash comparison stable:

* every computed column is explicitly aliased, identically on both
  sides (the driver sorts columns by name before hashing);
* floating-point aggregates are rounded (2 decimals for large sums,
  4 for means/ratios) on BOTH sides — double summation order differs
  between engines (and between Spark runs, since partial aggregates
  combine in partition order), so raw doubles are not hash-stable;
* integer-ish results are cast to BIGINT on both sides (DuckDB's
  ``year()``/``count`` widths differ from Spark's);
* any LIMIT/top-k has a total deterministic ORDER BY (unique key
  tiebreaker) — ties must resolve identically in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from sfs3_kinesis_spark.sources.batch import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], tags: tuple[str, ...] = (), description: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``.

    Duplicate names raise at import time: the registry is a dict, so a
    silent re-registration would REPLACE an existing query (twice
    nearly shipped in round 6 — a new query accidentally shadowing an
    older one of the same name, with only the total count to notice).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(
                f"query name {name!r} is already registered "
                f"(by {REGISTRY[name].spark.__module__}); pick a new name"
            )
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, description)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture loader used by query callables."""
    return load_table(spark, sf_dir, name)


def t_nonnull(spark: SparkSession, sf_dir: str, name: str, *cols: str) -> DataFrame:
    """Fixture loader with an EXPLICIT null-exclusion contract on
    ``cols`` (round-8 null-robustness, r07 verdict next-round #5).

    Queries whose arithmetic runs over free-text columns (token /
    shingle / chunk math) diverge cross-engine on NULL text: DuckDB's
    ``string_split``/list ops and Spark's ``split``/higher-order
    functions propagate NULLs differently (skip vs poison), so the
    same query computes DIFFERENT rows on a null-bearing corpus.
    The corpus convention is therefore a visible contract, applied
    identically on BOTH sides: a NULL text value is NOT a document —
    the Spark side filters here, and the oracle SQL carries the
    matching ``WHERE <col> IS NOT NULL``.  On the driver fixture
    (whose value columns are non-null) the filter matches everything,
    so gate results are unchanged; on null-bearing data both engines
    now agree instead of diverging engine-internally.
    """
    df = load_table(spark, sf_dir, name)
    for c in cols:
        df = df.filter(df[c].isNotNull())
    return df
