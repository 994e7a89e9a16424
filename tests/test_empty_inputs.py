"""Every registered query must BUILD and EXECUTE on empty input
tables (correct schemas, zero rows) without crashing — the
empty-crawl-drop / fresh-deployment case.  The r04 self-review found
pca_power_scores hard-crashing on an empty corpus where its sibling
operators returned empty frames; this sweep closes that class of
defect for the whole registry."""

from __future__ import annotations

import os

import pytest

from sfs3_kinesis_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ALL_QUERIES = sorted(REGISTRY)


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (
            spark.read.parquet(os.path.join(SF, f"{t}.parquet"))
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(base / f"{t}.parquet"))
        )
    return str(base)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_runs_on_empty_tables(spark, empty_sf, name):
    df = REGISTRY[name].spark(spark, empty_sf)
    # must execute, not just build: driver-side collects and guards
    # inside operators fire at execution or plan-build time
    assert df.count() >= 0
    assert len(df.columns) > 0
