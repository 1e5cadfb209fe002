"""Persisted IVF ANN index (operators/ann_index.py): build/query are
separate lineages over VersionedTable snapshots; staleness is
detectable; old index generations stay queryable (time travel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from location_summary_etl_spark.operators.ann_index import (
    StaleIndexError,
    build_ivf_index,
    index_meta,
    ivf_query_index,
)
from location_summary_etl_spark.operators.similarity import ivf_topk
from location_summary_etl_spark.sources.registry import load_table


def _rows(df):
    return sorted(map(str, df.collect()))


def test_persisted_index_matches_inplan_and_detects_staleness(
        spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")

    v1 = build_ivf_index(emb, root)
    meta = index_meta(root, v1)
    assert meta["cells_version"] >= 0 and len(meta["fingerprint"]) == 2

    # fresh index + matching base: verification passes, results are
    # bit-identical to the in-plan formulation
    got = ivf_query_index(spark, root, [0, 1, 2], k=3,
                          version=v1, verify_against=emb)
    assert _rows(got) == _rows(ivf_topk(emb, [0, 1, 2], k=3))

    # a changed base relation is detected, not silently served
    changed = emb.filter(F.col("vec_id") != 0)
    with pytest.raises(StaleIndexError, match="rebuild or pin"):
        ivf_query_index(spark, root, [1, 2], version=v1,
                        verify_against=changed)

    # rebuild against the changed base -> a NEW generation; the old pin
    # still answers from its own snapshot, bit-identically (time travel)
    v2 = build_ivf_index(changed, root)
    assert v2 > v1
    assert index_meta(root, v2)["fingerprint"] != meta["fingerprint"]
    again = ivf_query_index(spark, root, [0, 1, 2], k=3,
                            version=v1, verify_against=emb)
    assert _rows(again) == _rows(got)
    # latest generation verifies against (and answers from) the new base
    fresh = ivf_query_index(spark, root, [1, 2], k=3,
                            verify_against=changed)
    assert _rows(fresh) == _rows(ivf_topk(changed, [1, 2], k=3))


def test_ivf_recall_contract(spark, sf_dir, tmp_path):
    """Accuracy contract for the IVF bargain (recall bounded by
    n_probe/cells): at n_probe=2 of 8 label cells on the test data the
    measured recall@5 vs brute force must stay above the floor pinned
    here, and probing EVERY cell must recover brute force exactly --
    the approximation comes only from cell pruning, never from the
    scoring path."""
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    v = build_ivf_index(emb, root)
    qids = list(range(10))
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, qids, k=5).collect()}

    n_cells = len({r["label"] for r in emb.select("label").distinct().collect()})
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_query_index(spark, root, qids, k=5,
                                       n_probe=2, version=v).collect()}
    recall = len(approx & exact) / len(exact)
    # measured 0.30 at sf0.001: cells are the LABEL proxy (deliberately
    # untrained -- see ivf_centroids), so recall sits near the random
    # n_probe/cells baseline of 0.25 rather than a trained IVF's 0.8+;
    # the contract guards the mechanism (pruning-only approximation),
    # not clustering quality the operator intentionally doesn't do.
    assert recall >= 0.25, recall  # 2 of n_cells cells probed

    full = {(r["query_id"], r["vec_id"])
            for r in ivf_query_index(spark, root, qids, k=5,
                                     n_probe=n_cells, version=v).collect()}
    assert full == exact


def test_query_path_reads_only_the_index(spark, sf_dir, tmp_path):
    """The persisted query plan's file scans come from the index root,
    never the base table -- the separate-lineage claim, asserted."""
    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    v = build_ivf_index(emb, root)
    q = ivf_query_index(spark, root, [0, 1], k=3, version=v)
    files = q.inputFiles()
    assert files and all(root in f for f in files), files
