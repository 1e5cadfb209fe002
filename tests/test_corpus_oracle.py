"""Local replica of the driver's t2 gate: every oracle-paired corpus
query, Spark vs DuckDB, at sf0.001 (fast) -- the driver runs sf0.01."""

from __future__ import annotations

import pytest

from location_summary_etl_spark.plans import corpus
from tests.oracle_utils import compare, duckdb_con

_QUERIES = corpus.queries()
_ORACLES = corpus.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, sf_dir, con, name):
    df = _QUERIES[name](spark, sf_dir)
    compare(df, con, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, sf_dir, name):
    # Non-SQL-expressible ops get the driver's weaker rows-only check.
    assert _QUERIES[name](spark, sf_dir).count() >= 0
