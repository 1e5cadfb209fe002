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
    that needs an integer SUM must CAST(... AS BIGINT).

    POLICY (r6 advice): the ban intentionally covers ALL decimal types,
    not just HUGEINT's decimal128(38,0) mapping.  Spark-side corpus
    outputs are double/bigint by construction (round_portable on
    doubles, explicit casts on integer sums), so any decimal-typed
    oracle column means the two engines hash different lexical forms of
    the same value.  A future fixed-point DECIMAL entry must cast both
    sides to double/bigint rather than relax this gate."""
    offenders = {}
    for name, sql in sorted(_ORACLES.items()):
        schema = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
        bad = [f"{f.name}:{f.type}" for f in schema
               if "decimal" in str(f.type)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"uncast HUGEINT/decimal oracle columns: {offenders}"


def test_sketch_exactness_precondition(con):
    """text_approx_topk_sketch's in-plan guard assumes approx_top_k is
    EXACT at gate scale, which holds only while the distinct-token
    count stays within maxItemsTracked=10000 (the sketch then degrades
    gracefully but the top-k count multiset can legitimately diverge).
    Enforce the stated assumption (r6 advice): if a data-generation
    change ever pushes gate-scale distinct tokens past the tracking
    budget, fail HERE with a clear message instead of the generic
    in-plan multiset-divergence raise_error."""
    n = con.execute(
        "SELECT COUNT(DISTINCT tok) FROM ("
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents)"
    ).fetchone()[0]
    assert n <= 10000, (
        f"documents has {n} distinct tokens at gate scale, exceeding "
        "approx_top_k's maxItemsTracked=10000 -- the sketch is no "
        "longer exact; raise maxItemsTracked in text_approx_topk_sketch "
        "(plan + oracle) or loosen its in-plan multiset guard")
