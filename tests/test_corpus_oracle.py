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


def test_no_hugeint_oracle_columns(sf_dir, con):
    """Regression gate for the r4/r5 driver hash-reds: DuckDB types
    SUM(INTEGER/BIGINT) as HUGEINT, which survives ``fetchall()`` as a
    lossless Python int (so the local replica stays green) but becomes
    float64 through ``.df()`` / decimal128 through ``.arrow()`` -- the
    driver's fetch path -- so the value hash diverges from Spark's
    bigint ("123.0" vs "123").  Every driver-red row across r4+r5
    (multimodal_inventory, merge_upsert_orders, text_approx_topk_sketch,
    corpus_pack_sequences) had exactly one uncast integer-SUM column,
    and no green row had any.  Ban the type class outright: an oracle
    that needs an integer SUM must CAST(... AS BIGINT)."""
    offenders = {}
    for name, sql in sorted(_ORACLES.items()):
        schema = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
        bad = [f"{f.name}:{f.type}" for f in schema
               if "decimal" in str(f.type)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"uncast HUGEINT/decimal oracle columns: {offenders}"
