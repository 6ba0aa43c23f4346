"""Differential oracle tests — every registered query vs its DuckDB
twin at sf=0.01, mirroring the driver's correctness gate."""

from __future__ import annotations

import pytest

from epl_cas_etl_2026_spark.plans import ORACLES, QUERIES
from tests.oracle_utils import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_connection(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_oracle, con):
    sdf = QUERIES[name](spark, sf_oracle)
    ok, msg = compare(sdf, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_every_query_has_runnable_plan(spark, sf_smoke):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} returned no columns"
