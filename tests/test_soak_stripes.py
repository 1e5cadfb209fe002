"""Striped oracle compare (tools/soak_oracle.py, r12).

At the 100x tier the pair-relation oracles (n-gram Jaccard, MinHash
LSH) exceed any one-shot DuckDB temp budget this sandbox can grant
(measured >60 GB with 48 GB RAM at sf10), so the soak evaluates them
in K passes striped on ``pmod(id_a, K)`` -- see the module docstring.
These tests pin the three properties the striping rests on, at a
scale where the one-shot compare is also cheap:

1. striped == one-shot on an identical result (agreement);
2. a VALUE divergence (same row count, one column's rounding changed)
   is caught by the per-stripe symmetric EXCEPT ALL;
3. a ROW divergence (one oracle row dropped) is caught by the summed
   per-stripe counts;
4. the gate engages exactly where the engine's own scratch striping
   does (documents source past NGRAM_STAGE_SOURCE_FLOOR), so sub-floor
   tiers keep the byte-identical historical compare path.
"""

from __future__ import annotations

import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present")


def _setup(spark, name: str):
    from soak_oracle import SCRATCH, _budgeted_con

    from location_summary_etl_spark.plans import corpus

    os.makedirs(SCRATCH, exist_ok=True)
    qs, oracles = corpus.queries(), corpus.oracle_sql()
    df = qs[name](spark, SF)
    return df, df.count(), _budgeted_con(SF), oracles[name]


def test_striped_compare_agrees_with_oneshot(spark):
    from soak_oracle import compare_large, compare_large_striped

    df, n, con, sql = _setup(spark, "dedup_ngram_jaccard")
    try:
        compare_large(df, con, sql, n)
        compare_large_striped(df, con, sql, n, "id_a", 3)
    finally:
        con.close()


def test_striped_compare_parked_path(spark, tmp_path):
    """The caller-parked variant (r12: the result is written to parquet
    and the engine's scratch released BEFORE the oracle's temp grant is
    sized) must agree with the df-owned path, catch the same value
    divergence, and leave the caller-owned dir in place."""
    from soak_oracle import compare_large_striped

    df, n, con, sql = _setup(spark, "dedup_ngram_jaccard")
    parked = str(tmp_path / "parked")
    df.write.mode("overwrite").parquet(parked)
    bad = sql.replace("AS DOUBLE), 4) AS jaccard",
                      "AS DOUBLE), 3) AS jaccard")
    try:
        compare_large_striped(None, con, sql, n, "id_a", 3,
                              parked=parked)
        assert os.path.isdir(parked)  # caller keeps ownership
        with pytest.raises(AssertionError, match="value mismatch"):
            compare_large_striped(None, con, bad, n, "id_a", 3,
                                  parked=parked)
    finally:
        con.close()


def test_striped_compare_catches_value_divergence(spark):
    from soak_oracle import compare_large_striped

    df, n, con, sql = _setup(spark, "dedup_ngram_jaccard")
    bad = sql.replace("AS DOUBLE), 4) AS jaccard",
                      "AS DOUBLE), 3) AS jaccard")
    assert bad != sql
    try:
        with pytest.raises(AssertionError, match="value mismatch"):
            compare_large_striped(df, con, bad, n, "id_a", 3)
    finally:
        con.close()


def test_striped_compare_catches_row_divergence(spark):
    from soak_oracle import compare_large_striped

    df, n, con, sql = _setup(spark, "dedup_ngram_jaccard")
    bad = (f"SELECT * FROM ({sql}) _q WHERE id_a <> "
           f"(SELECT min(id_a) FROM ({sql}) _r)")
    try:
        with pytest.raises(AssertionError, match="row count mismatch"):
            compare_large_striped(df, con, bad, n, "id_a", 3)
    finally:
        con.close()


def test_inner_needle_striped_compare_agrees(spark):
    """MinHash's banded oracle defeats DuckDB's outer-predicate
    pushdown (measured 3.3x FULL cost per stripe at sf1), so its
    stripe predicate is injected at id_a's binding site in the
    candidate join -- same restriction, same result."""
    from soak_oracle import (
        ORACLE_STRIPE_INNER_NEEDLE,
        compare_large,
        compare_large_striped,
    )

    name = "dedup_minhash_lsh"
    df, n, con, sql = _setup(spark, name)
    needle = ORACLE_STRIPE_INNER_NEEDLE[name]
    try:
        compare_large(df, con, sql, n)
        compare_large_striped(df, con, sql, n, "id_a", 3,
                              inner_needle=needle)
        # a value divergence still surfaces through the inner path
        bad = sql.replace("AS DOUBLE), 4) AS est_jaccard",
                          "AS DOUBLE), 3) AS est_jaccard")
        assert bad != sql
        with pytest.raises(AssertionError, match="value mismatch"):
            compare_large_striped(df, con, bad, n, "id_a", 3,
                                  inner_needle=needle)
        # a needle that does not occur exactly once is refused loudly
        with pytest.raises(AssertionError, match="exactly once"):
            compare_large_striped(df, con, sql, n, "id_a", 3,
                                  inner_needle="no such join condition")
    finally:
        con.close()


def test_cte_splitter_shapes():
    """_split_ctes handles every striped oracle's generated shape and
    passes through SQL it must not touch (no top-level WITH; a WITH
    nested under a wrapper SELECT, the row-divergence test's shape)."""
    from soak_oracle import _split_ctes

    from location_summary_etl_spark.plans import corpus

    oracles = corpus.oracle_sql()
    for name in ("dedup_ngram_jaccard", "dedup_ngram_jaccard_auto",
                 "dedup_minhash_lsh", "dedup_simhash_pairs"):
        ctes, final = _split_ctes(oracles[name])
        assert any(mat for _, _, mat in ctes), name
        assert final.lstrip().upper().startswith("SELECT"), name
        # reassembled text preserves every body verbatim
        for n2, body, _ in ctes:
            assert body in oracles[name], (name, n2)
    assert _split_ctes("SELECT 1 AS x") == ([], "SELECT 1 AS x")
    wrapped = "SELECT * FROM (WITH a AS (SELECT 1) SELECT * FROM a) q"
    assert _split_ctes(wrapped) == ([], wrapped)


def test_stripe_gate_mirrors_engine_scratch_gate(tmp_path):
    from soak_oracle import _oracle_stripe_col

    from location_summary_etl_spark.operators.dedup import (
        NGRAM_STAGE_SOURCE_FLOOR,
    )

    # Sub-floor documents source: one-shot path (None).
    small = tmp_path / "small"
    small.mkdir()
    (small / "documents.parquet").write_bytes(b"x" * 1024)
    assert _oracle_stripe_col("dedup_ngram_jaccard", str(small)) is None
    # Past the floor: striped, with the pair's lower-id column.
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "documents.parquet", "wb") as f:
        f.truncate(NGRAM_STAGE_SOURCE_FLOOR + 1)
    assert _oracle_stripe_col("dedup_ngram_jaccard", str(big)) == "id_a"
    # Non-member entries never stripe.
    assert _oracle_stripe_col("pricing_summary", str(big)) is None
