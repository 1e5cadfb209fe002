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


# ----------------------------------------------------- delta refresh (r8)


def _topk_sets(df):
    return sorted((r["query_id"], r["rank"], r["vec_id"], r["cosine"])
                  for r in df.collect())


def test_delta_refresh_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Append 10% of the corpus to the base table, refresh_ivf_index
    takes the DELTA path (op tag ivf_delta), and search results are
    identical to an index rebuilt from scratch over the full table."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 != 0), mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())
    base.commit(emb.filter(F.col("vec_id") % 10 == 0), mode="append")

    v2 = refresh_ivf_index(spark, base, root)
    assert v2 > v1
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_delta", meta
    assert meta["base_version"] == base.latest_version()

    full_root = str(tmp_path / "full")
    vf = build_ivf_index(emb, full_root)
    qids = list(range(10))
    got = ivf_query_index(spark, root, qids, k=5, version=v2,
                          verify_against=base.read(spark))
    want = ivf_query_index(spark, full_root, qids, k=5, version=vf)
    assert _topk_sets(got) == _topk_sets(want)

    # the pre-refresh generation still answers from its own snapshot
    old = ivf_query_index(spark, root, [1, 2], k=3, version=v1)
    assert _topk_sets(old) == _topk_sets(
        ivf_query_index(spark, root, [1, 2], k=3, version=v1))


def test_delta_refresh_update_and_delete_match_full_rebuild(
        spark, sf_dir, tmp_path):
    """MERGE into the base (vector updates, a cross-cell label move,
    and deletes) -> refresh reindexes only the touched members and
    matches a from-scratch build of the post-merge relation."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    base = VersionedTable(str(tmp_path / "base"))
    base.commit(load_table(spark, sf_dir, "embeddings"), mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())

    snap = base.read(spark)
    labels = sorted(r["label"] for r in
                    snap.select("label").distinct().collect())
    # updates: vec 20 gets a new vector (same cell), vec 21 MOVES cells,
    # vecs 22/23 are deleted
    r20, r21 = snap.filter(F.col("vec_id").isin(20, 21)).collect()
    upd = spark.createDataFrame(
        [(20, [float(x) + 0.25 for x in r20["embedding"]],
          int(r20["label"]), False),
         (21, list(map(float, r21["embedding"])),
          int(labels[0] if r21["label"] != labels[0] else labels[1]),
          False),
         (22, None, None, True),
         (23, None, None, True)],
        "vec_id bigint, embedding array<float>, label int, _del boolean")
    base.merge(spark, upd, keys=["vec_id"], delete_col="_del")

    v2 = refresh_ivf_index(spark, base, root)
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_delta", meta

    full_root = str(tmp_path / "full")
    vf = build_ivf_index(base.read(spark), full_root)
    qids = list(range(10))
    got = ivf_query_index(spark, root, qids, k=5, version=v2,
                          verify_against=base.read(spark))
    want = ivf_query_index(spark, full_root, qids, k=5, version=vf)
    assert _topk_sets(got) == _topk_sets(want)


def test_delta_refresh_carries_untouched_cell_files_unread(spark, tmp_path):
    """The untouched-cells claim at file granularity, proven with the
    stats-pruned-MERGE pattern: after the refresh the low-cell file is
    (a) carried BY PATH -- byte-identical by construction -- and
    (b) was never even OPENED: it is corrupted on disk before the
    refresh, so a discovery scan that touched it would have failed."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    rows = [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
            for i in range(200)]
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"),
        mode="overwrite")
    root = str(tmp_path / "idx")
    # test-size data: AQE would coalesce the range shuffle into ONE
    # file spanning every cell, leaving nothing to prune; at real scale
    # the ranges split by bytes on their own
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        build_ivf_index(base.read(spark), root,
                        base_version=base.latest_version())
    finally:
        spark.conf.set(coalesce_key, prev)

    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))
    m = cells_tbl._manifest(cells_tbl.latest_version())
    low_files = [f for f in m["files"]
                 if m["stats"][f]["cl"][1] is not None
                 and m["stats"][f]["cl"][1] <= 1]
    assert low_files, "expected a cl<=1-only file from range partitioning"
    for f in low_files:
        with open(f, "wb") as fh:
            fh.write(b"not parquet anymore")

    # delta touches ONLY cells 2 and 3
    base.commit(spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], 2 + (i % 2)) for i in range(10)],
        "vec_id bigint, embedding array<float>, label int"), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_delta"
    assert sorted(meta["touched_cells"]) == [2, 3]

    m2 = cells_tbl._manifest(meta["cells_version"])
    for f in low_files:
        assert f in m2["files"]                       # carried by path
        assert m2["stats"][f]["cl"] == m["stats"][f]["cl"]


def test_delta_refresh_pure_append_rewrites_no_files(spark, tmp_path):
    """A pure-insert delta appends new cell files and rewrites ZERO
    existing ones: every pre-refresh inverted-file data file is still
    referenced by the new manifest (untouched on disk)."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    rows = [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
            for i in range(200)]
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"),
        mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version())
    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))
    before = set(cells_tbl._manifest(cells_tbl.latest_version())["files"])

    base.commit(spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], i % 4) for i in range(20)],
        "vec_id bigint, embedding array<float>, label int"), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    after = set(cells_tbl._manifest(
        index_meta(root, v2)["cells_version"])["files"])
    assert before <= after, "an existing cell file was rewritten"
    assert after - before, "the inserts produced no new files"


def test_delta_refresh_thresholds_and_pins(spark, tmp_path):
    """Refresh control flow: unchanged base re-uses the current
    generation; a delta past rebuild_fraction falls back to a full
    rebuild (op ivf_build); an index built without a base pin refuses
    delta refresh loudly."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    rows = [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(df, mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())

    assert refresh_ivf_index(spark, base, root) == v1  # no-op

    # 50% delta > default rebuild_fraction -> full rebuild
    base.commit(spark.createDataFrame(
        [(5000 + i, [1.0, 2.0, 3.0], i % 4) for i in range(50)],
        "vec_id bigint, embedding array<float>, label int"), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_build"
    assert meta["base_version"] == base.latest_version()

    # unpinned index: delta refresh must refuse, not guess
    root2 = str(tmp_path / "idx2")
    build_ivf_index(base.read(spark), root2)  # no base_version
    with pytest.raises(ValueError, match="base_version"):
        refresh_ivf_index(spark, base, root2)


def test_delta_refresh_crash_retry_is_idempotent(spark, tmp_path):
    """Crash-window contract: a refresh that died AFTER the cells
    merge but BEFORE the centroid commit leaves the index pinned at
    the old generation with an orphan cells version on top.  The
    retried refresh recomputes the same delta and re-merges it onto
    the LATEST cells -- merge's idempotent re-apply makes that a
    no-op rewrite, never a double-apply -- and the final index matches
    a clean single refresh exactly."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.similarity import ivf_cells
    from location_summary_etl_spark.sources.versioned import VersionedTable

    rows = [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
            for i in range(200)]
    delta_rows = [(1000 + i, [9.0, float(i), 1.0], i % 4)
                  for i in range(10)]
    schema = "vec_id bigint, embedding array<float>, label int"

    def build_base(path):
        base = VersionedTable(str(tmp_path / path))
        base.commit(spark.createDataFrame(rows, schema), mode="overwrite")
        return base

    # clean reference lineage: build -> append -> one refresh
    base_c = build_base("base_clean")
    root_c = str(tmp_path / "idx_clean")
    build_ivf_index(base_c.read(spark), root_c,
                    base_version=base_c.latest_version())
    base_c.commit(spark.createDataFrame(delta_rows, schema), mode="append")
    v_clean = refresh_ivf_index(spark, base_c, root_c)

    # crashed lineage: the first refresh "dies" after the cells merge
    # (simulated by applying the merge by hand) -- centroids never move
    base_x = build_base("base_crash")
    root_x = str(tmp_path / "idx_crash")
    v1 = build_ivf_index(base_x.read(spark), root_x,
                         base_version=base_x.latest_version())
    base_x.commit(spark.createDataFrame(delta_rows, schema), mode="append")
    cells_tbl = VersionedTable(str(tmp_path / "idx_crash" / "cells"))
    orphan = cells_tbl.merge(
        spark,
        ivf_cells(spark.createDataFrame(delta_rows, schema))
        .withColumn("_del", F.lit(False)),
        keys=["cl", "vec_id"], delete_col="_del")
    assert index_meta(root_x)["version"] == v1  # still pinned pre-crash

    v2 = refresh_ivf_index(spark, base_x, root_x)  # the retry
    assert index_meta(root_x, v2)["cells_version"] > orphan

    qids = list(range(8)) + [1002, 1003]
    got = ivf_query_index(spark, root_x, qids, k=5, version=v2,
                          verify_against=base_x.read(spark))
    want = ivf_query_index(spark, root_c, qids, k=5, version=v_clean)
    assert _rows(got) == _rows(want)
    # no duplicate members survived the double apply
    cells = cells_tbl.read(spark, index_meta(root_x, v2)["cells_version"])
    n = cells.count()
    assert n == cells.select("vec_id").distinct().count() == 210


def test_vacuum_index_keeps_every_retained_generation_answerable(
        spark, tmp_path):
    """vacuum_index derives the cells retention from the retained
    generations' PINS.  The constructed history makes the naive
    per-table policy provably wrong: a compact() bumps the cells table
    between generations, so a bare cells.vacuum(retain_last=2) would
    keep only the 2 newest cells versions and delete the files the
    older RETAINED generation still pins.  After vacuum_index the
    dropped generation's manifest is gone, and both retained
    generations answer byte-identically to their pre-vacuum selves."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
        vacuum_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<float>, label int"
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(200)], schema), mode="overwrite")
    root = str(tmp_path / "idx")
    g1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())
    base.commit(spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], i % 4) for i in range(10)],
        schema), mode="append")
    g2 = refresh_ivf_index(spark, base, root)
    # cells-table version with NO generation pinning it
    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))
    cells_tbl.compact(spark)
    base.commit(spark.createDataFrame(
        [(2000 + i, [1.0, 8.0, float(i)], i % 4) for i in range(10)],
        schema), mode="append")
    g3 = refresh_ivf_index(spark, base, root)

    pin2 = index_meta(root, g2)["cells_version"]
    pin3 = index_meta(root, g3)["cells_version"]
    cvs = cells_tbl.versions()
    # the wrongness precondition: a bare retain_last=2 on cells would
    # drop g2's pin (two newer cells versions exist above it)
    assert pin2 < cvs[-2] <= pin3, (pin2, cvs, pin3)

    qids = [1, 2, 1003, 2004]
    before2 = _rows(ivf_query_index(spark, root, qids, k=3, version=g2))
    before3 = _rows(ivf_query_index(spark, root, qids, k=3, version=g3))

    removed = vacuum_index(root, retain_generations=2, grace_seconds=0)
    assert removed["cells"] or removed["centroids"]  # collected something

    assert _rows(ivf_query_index(spark, root, qids, k=3,
                                 version=g2)) == before2
    assert _rows(ivf_query_index(spark, root, qids, k=3,
                                 version=g3)) == before3
    with pytest.raises(FileNotFoundError):
        index_meta(root, g1)  # dropped generation's manifest is gone

    # a retained pin that was vacuumed away directly is a loud error
    cells_tbl.vacuum(retain_last=1, grace_seconds=0)
    with pytest.raises(ValueError, match="already gone"):
        vacuum_index(root, retain_generations=2, grace_seconds=0)


def test_delta_refresh_metadata_only_commit_repins(spark, tmp_path):
    """A base commit that changes no rows (compaction rewrites every
    file but the CDC bag-cancel nets to zero) takes the repin path: a
    new generation whose manifest pins the SAME cells version under
    the new base version -- no inverted-file write at all -- and the
    staleness gate accepts the compacted base."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(120)],
        "vec_id bigint, embedding array<float>, label int"),
        mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())
    pin1 = index_meta(root, v1)["cells_version"]
    before = _rows(ivf_query_index(spark, root, [1, 2, 3], k=3,
                                   version=v1))

    base.compact(spark)
    v2 = refresh_ivf_index(spark, base, root)
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_repin", meta
    assert meta["cells_version"] == pin1          # inverted file untouched
    assert meta["base_version"] == base.latest_version()
    got = _rows(ivf_query_index(spark, root, [1, 2, 3], k=3, version=v2,
                                verify_against=base.read(spark)))
    assert got == before


def test_delta_refresh_survives_additive_base_schema_evolution(
        spark, tmp_path):
    """The base table gains a nullable column between build and
    refresh (additive evolution + an appended delta in the new shape).
    changes() reads both sides under the evolved pinned schema, the
    refresh indexes the delta, and results match a from-scratch build
    of the evolved table -- the index only ever projects
    (id, label, vector), so extra payload columns must ride along
    harmlessly."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(120)],
        "vec_id bigint, embedding array<float>, label int"),
        mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version())

    base.commit(spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], i % 4, f"src{i}")
         for i in range(12)],
        "vec_id bigint, embedding array<float>, label int, origin string"),
        mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    assert index_meta(root, v2)["op"] == "ivf_delta"

    full_root = str(tmp_path / "full")
    vf = build_ivf_index(base.read(spark), full_root)
    qids = [1, 2, 3, 1005, 1006]
    got = ivf_query_index(spark, root, qids, k=5, version=v2,
                          verify_against=base.read(spark))
    want = ivf_query_index(spark, full_root, qids, k=5, version=vf)
    assert _rows(got) == _rows(want)


def test_vector_query_matches_id_query_and_prunes_files(spark, sf_dir,
                                                        tmp_path):
    """ivf_query_index_vectors: (a) a corpus row's own vector with its
    vec_id reproduces the id-keyed path bit-identically; (b) on a
    range-partitioned index the candidate scan OPENS only the probed
    cells' files -- proven by corrupting every other cell file on disk
    before the query (an opened corrupt file would fail the job)."""
    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_vectors,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    v = build_ivf_index(emb, root)
    r5 = emb.filter(F.col("vec_id") == 5).first()
    got = ivf_query_index_vectors(
        spark, root, [(5, list(map(float, r5["embedding"])))],
        k=4, version=v)
    want = ivf_query_index(spark, root, [5], k=4, version=v)
    assert _rows(got) == _rows(want)

    # constructed 4-cell index, range-partitioned into per-cell files
    base = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(200)],
        "vec_id bigint, embedding array<float>, label int")
    root2 = str(tmp_path / "idx2")
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        v2 = build_ivf_index(base, root2)
    finally:
        spark.conf.set(coalesce_key, prev)

    # query = the exact centroid of cell 2, n_probe=1 -> only cell 2
    from location_summary_etl_spark.operators.similarity import (
        ivf_centroids,
    )
    cv2 = [r for r in ivf_centroids(base).collect() if r["cl"] == 2][0]["cv"]

    cells_tbl = VersionedTable(str(tmp_path / "idx2" / "cells"))
    m = cells_tbl._manifest(cells_tbl.latest_version())
    other = [f for f in m["files"]
             if (st := m["stats"][f]["cl"])[0] is not None
             and not (st[0] <= 2 <= st[1])]
    assert other, "expected files that cannot contain cell 2"
    for f in other:
        with open(f, "wb") as fh:
            fh.write(b"not parquet anymore")

    res = ivf_query_index_vectors(spark, root2, [(-1, list(cv2))],
                                  k=3, n_probe=1, version=v2).collect()
    assert len(res) == 3
    got_cells = {r["vec_id"] % 4 for r in res}
    assert got_cells == {2}, res  # every hit from the probed cell


def test_read_where_any_skips_disjoint_point_set_files(spark, tmp_path):
    """VersionedTable.read(where_any=...): a scattered point set skips
    the middle file a single [lo, hi] envelope would keep -- proven by
    corrupting it; stats-less values/files stay conservative."""
    from location_summary_etl_spark.sources.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "t"))
    for lo in (0, 100, 200):
        t.commit(spark.createDataFrame(
            [(lo + i, i) for i in range(10)], "k int, v int").coalesce(1),
            mode="overwrite" if lo == 0 else "append",
            stats_columns=["k"])
    m = t._manifest(t.latest_version())
    mid = [f for f in m["files"] if m["stats"][f]["k"][0] == 100]
    assert len(mid) == 1
    with open(mid[0], "wb") as fh:
        fh.write(b"junk")

    got = {r["k"] for r in t.read(spark, where_any=("k", [5, 205]))
           .filter(F.col("k").isin(5, 205)).collect()}
    assert got == {5, 205}
    # the range form would have kept (and crashed on) the middle file
    import pytest as _pytest
    with _pytest.raises(Exception):
        t.read(spark, where=("k", 5, 205)).filter(
            F.col("k").isin(5, 205)).collect()


# ------------------------------------------- trained (kmeans) quantizer


def test_kmeans_quantizer_recall_contract_and_frozen_refresh(
        spark, sf_dir, tmp_path):
    """quantizer="kmeans": (a) the pruning-only approximation contract
    holds (probing every trained cell recovers brute force exactly);
    (b) a delta refresh assigns new vectors by the PINNED centroids --
    verified against an independent python argmin over the stored
    centroid rows -- and republishes the centroid rows verbatim
    (frozen quantizer, no refit); (c) search over the refreshed index
    equals ivf_search over a directly-constructed frozen-quantizer
    relation of the full table -- the spec a refit-free refresh must
    meet."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_cells_quantized,
        ivf_search,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 != 0), mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version(),
                         quantizer="kmeans", k_cells=6, train_iters=2)
    meta1 = index_meta(root, v1)
    assert meta1["quantizer"] == "kmeans"

    # (a) probing all cells == brute force (approximation = pruning only)
    cent_tbl = VersionedTable(str(tmp_path / "idx" / "centroids"))
    cent_rows = sorted(
        (int(r["cl"]), list(r["cv"]))
        for r in cent_tbl.read(spark, v1).collect())
    qids = list(range(1, 8))
    exact = {(r["query_id"], r["rank"], r["vec_id"])
             for r in brute_force_topk(base.read(spark), qids,
                                       k=4).collect()}
    full_probe = {(r["query_id"], r["rank"], r["vec_id"])
                  for r in ivf_query_index(
                      spark, root, qids, k=4, n_probe=len(cent_rows),
                      version=v1).collect()}
    assert full_probe == exact

    # (b) refresh: new vectors take their pinned-centroid argmin cell
    base.commit(emb.filter(F.col("vec_id") % 10 == 0), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    meta2 = index_meta(root, v2)
    assert meta2["op"] == "ivf_delta" and meta2["quantizer"] == "kmeans"
    cent_rows2 = sorted(
        (int(r["cl"]), list(r["cv"]))
        for r in cent_tbl.read(spark, v2).collect())
    assert cent_rows2 == cent_rows          # frozen: no refit

    cells = VersionedTable(str(tmp_path / "idx" / "cells")).read(
        spark, meta2["cells_version"])
    got_cells = {r["vec_id"]: r["cl"]
                 for r in cells.filter(F.col("vec_id") % 10 == 0).collect()}
    new_rows = emb.filter(F.col("vec_id") % 10 == 0).collect()
    assert got_cells, "appended vectors missing from the inverted file"

    def argmin_cell(v):
        def score(c):
            x = sum(ci * ci for ci in c) - 2 * sum(
                a * b for a, b in zip(v, c))
            import math
            return math.copysign(
                math.floor(abs(x) * 1e6 + 0.5) / 1e6, x) if x else 0.0
        return min(cent_rows, key=lambda jc: (score(jc[1]), jc[0]))[0]

    for r in new_rows:
        v = [float(x) for x in r["embedding"]]
        assert got_cells[r["vec_id"]] == argmin_cell(v), r["vec_id"]

    # (c) refreshed search == frozen-quantizer relation over full table
    spec_cells = ivf_cells_quantized(base.read(spark), cent_rows)
    want = sorted(map(str, ivf_search(
        spec_cells, cent_tbl.read(spark, v2), qids, k=4,
        n_probe=2).collect()))
    got = sorted(map(str, ivf_query_index(
        spark, root, qids, k=4, n_probe=2, version=v2,
        verify_against=base.read(spark)).collect()))
    assert got == want


def test_kmeans_quantizer_beats_label_proxy_recall(spark, sf_dir,
                                                   tmp_path):
    """The point of training the quantizer, measured: at the same
    probe budget (n_probe=2 of 8 cells) the trained quantizer's
    recall@5 vs brute force is 0.71 on this data against the label
    proxy's 0.28 (~ the 0.25 random baseline; sf0.01 measures
    0.62-0.65 vs 0.30).  Deterministic fit -> exact same number every
    run; pinned with slack at 0.5 and at strictly-beats-label."""
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(20))
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(emb, qids, k=5).collect()}

    def recall(root, **kw):
        v = build_ivf_index(emb, root, **kw)
        approx = {(r["query_id"], r["vec_id"])
                  for r in ivf_query_index(spark, root, qids, k=5,
                                           n_probe=2, version=v).collect()}
        return len(approx & exact) / len(exact)

    r_label = recall(str(tmp_path / "lab"))
    r_kmeans = recall(str(tmp_path / "km"), quantizer="kmeans",
                      k_cells=8, train_iters=2)
    assert r_kmeans >= 0.5, r_kmeans
    assert r_kmeans > r_label, (r_kmeans, r_label)


# ------------------------------- r9: meta contracts, compaction, q8


def test_rebuild_preserves_quantizer_config(spark, tmp_path):
    """A delta past rebuild_fraction rebuilds with the SAME quantizer
    configuration: k_cells/train_iters ride in the manifest, so a
    kmeans index built with non-default k_cells must not silently
    become the 8-cell default on its first rebuild (ADVICE r8)."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<float>, label int"
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(100)], schema), mode="overwrite")
    root = str(tmp_path / "idx")
    # max_cell_fraction=None: this test pins the EXACT centroid count
    # through a rebuild, which the (default-on) hot-cell split guard
    # may legitimately change -- disabling it must itself carry through
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version(),
                         quantizer="kmeans", k_cells=5, train_iters=1,
                         max_cell_fraction=None)
    m1 = index_meta(root, v1)
    assert (m1["k_cells"], m1["train_iters"]) == (5, 1)

    # 50% delta -> rebuild path
    base.commit(spark.createDataFrame(
        [(5000 + i, [float(i), 2.0, 3.0], i % 4) for i in range(50)],
        schema), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    m2 = index_meta(root, v2)
    assert m2["op"] == "ivf_build"
    assert m2["quantizer"] == "kmeans"
    assert (m2["k_cells"], m2["train_iters"]) == (5, 1)
    assert m2["n_since_fit"] == 0
    assert m2["max_cell_fraction"] is None  # the opt-out carried too
    cent = VersionedTable(str(tmp_path / "idx" / "centroids")).read(spark, v2)
    assert cent.count() == 5  # not the 8-cell default


def test_incremental_fingerprint_matches_full_rescan(spark, tmp_path):
    """The O(delta) additive fingerprint equals the O(corpus) aggregate
    after inserts, deletes, AND updates -- and the staleness gate keeps
    accepting the true base."""
    from location_summary_etl_spark.operators.ann_index import (
        _fingerprint,
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<float>, label int"
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(150)], schema), mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version())

    # mixed delta: 5 inserts, 2 updates (same id), 2 deletes
    upd = spark.createDataFrame(
        [(1000 + i, [9.0, float(i), 1.0], i % 4, False) for i in range(5)]
        + [(10, [8.0, 8.0, 8.0], 2, False), (11, [7.0, 7.0, 7.0], 3, False),
           (12, None, None, True), (13, None, None, True)],
        schema + ", _del boolean")
    base.merge(spark, upd, keys=["vec_id"], delete_col="_del")
    v2 = refresh_ivf_index(spark, base, root)
    meta = index_meta(root, v2)
    assert meta["op"] == "ivf_delta"
    assert meta["fingerprint"] == _fingerprint(base.read(spark), "vec_id")
    # and the gate accepts (no StaleIndexError)
    ivf_query_index(spark, root, [1, 2], k=3, version=v2,
                    verify_against=base.read(spark)).collect()

    # second hop: repin path carries the fingerprint without rescan
    base.compact(spark)
    v3 = refresh_ivf_index(spark, base, root)
    assert index_meta(root, v3)["fingerprint"] == meta["fingerprint"]


def test_index_meta_rejects_foreign_manifest_operations(spark, tmp_path):
    """compact()/restore() on the CENTROIDS table directly writes a
    non-JSON operation tag; every index read must fail loudly naming
    it, not with a bare JSONDecodeError (ADVICE r8)."""
    from location_summary_etl_spark.operators.ann_index import vacuum_index
    from location_summary_etl_spark.sources.versioned import VersionedTable

    base = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4) for i in range(50)],
        "vec_id bigint, embedding array<float>, label int")
    root = str(tmp_path / "idx")
    build_ivf_index(base, root)
    VersionedTable(str(tmp_path / "idx" / "centroids")).compact(spark)
    with pytest.raises(ValueError, match="must not be compacted"):
        index_meta(root)
    with pytest.raises(ValueError, match="must not be compacted"):
        vacuum_index(root, retain_generations=1, grace_seconds=0)


def test_auto_compaction_bounds_inverted_file_fragmentation(
        spark, tmp_path):
    """N small refreshes with a low compact_files threshold: the pinned
    cells manifest's file count DROPS when the threshold trips, results
    stay identical to a from-scratch build, pre-compaction generations
    still answer (time travel), footer stats survive (the read path's
    pruning contract), and the staleness gate still fires."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<float>, label int"
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(400)], schema), mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())
    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))

    gens = [v1]
    compacted_at = None
    for step in range(6):
        base.commit(spark.createDataFrame(
            [(10_000 + 100 * step + i, [9.0, float(step), float(i)], i % 4)
             for i in range(8)], schema), mode="append")
        before = cells_tbl._manifest(
            index_meta(root, gens[-1])["cells_version"])["n_files"]
        g = refresh_ivf_index(spark, base, root, compact_files=6)
        gens.append(g)
        after_m = cells_tbl._manifest(index_meta(root, g)["cells_version"])
        if compacted_at is None and after_m["n_files"] < before:
            compacted_at = step
            assert after_m["operation"] == "ivf_compact", after_m
    assert compacted_at is not None, "threshold never tripped"
    latest_m = cells_tbl._manifest(index_meta(root, gens[-1])["cells_version"])
    assert latest_m["n_files"] <= 7  # bounded, not monotonically growing
    # stats survive compaction (pruning contract)
    assert latest_m.get("stats"), "footer stats lost by compaction"
    assert all("cl" in per for per in latest_m["stats"].values())

    # results identical to a from-scratch index of the same base
    full_root = str(tmp_path / "full")
    vf = build_ivf_index(base.read(spark), full_root)
    qids = [1, 2, 10_000, 10_501]
    got = ivf_query_index(spark, root, qids, k=5, version=gens[-1],
                          verify_against=base.read(spark))
    want = ivf_query_index(spark, full_root, qids, k=5, version=vf)
    assert _rows(got) == _rows(want)
    # pre-compaction generation still answers from its own file list
    old = ivf_query_index(spark, root, [1, 2], k=3, version=gens[1])
    assert old.count() > 0
    # staleness still detected after compaction
    with pytest.raises(StaleIndexError):
        ivf_query_index(spark, root, [1], k=3, version=gens[-1],
                        verify_against=base.read(spark).filter(
                            F.col("vec_id") != 1))


def test_cumulative_drift_forces_kmeans_refit(spark, tmp_path):
    """The frozen trained quantizer's drift contract: successive deltas
    each below rebuild_fraction accumulate in n_since_fit and force a
    refit when the CUMULATIVE fraction crosses it; the label quantizer
    (drift-free: exact per-delta centroid recompute) keeps taking the
    delta path under the identical commit sequence."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<float>, label int"

    def drive(root_name, base_name, **build_kw):
        base = VersionedTable(str(tmp_path / base_name))
        base.commit(spark.createDataFrame(
            [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
             for i in range(200)], schema), mode="overwrite")
        root = str(tmp_path / root_name)
        build_ivf_index(base.read(spark), root,
                        base_version=base.latest_version(), **build_kw)
        ops = []
        for step in range(2):
            base.commit(spark.createDataFrame(
                [(1000 * (step + 1) + i, [9.0, float(step), 1.0], i % 4)
                 for i in range(30)], schema), mode="append")
            g = refresh_ivf_index(spark, base, root,
                                  rebuild_fraction=0.25)
            ops.append(index_meta(root, g))
        return ops

    km = drive("idx_km", "base_km", quantizer="kmeans", k_cells=4,
               train_iters=1)
    # step 1: 30/200 = 0.15 <= 0.25 -> delta, n_since_fit accumulates
    assert km[0]["op"] == "ivf_delta" and km[0]["n_since_fit"] == 30
    # step 2: 30/230 = 0.13 alone, but cumulative 60/230 = 0.26 > 0.25
    assert km[1]["op"] == "ivf_build" and km[1]["n_since_fit"] == 0
    assert km[1]["k_cells"] == 4

    lab = drive("idx_lab", "base_lab")
    assert [m["op"] for m in lab] == ["ivf_delta", "ivf_delta"]
    assert lab[1]["n_since_fit"] == 60  # tracked, never gating


def test_kmeans_recall_holds_after_small_refreshes(spark, sf_dir, tmp_path):
    """The recall contract under maintenance: after 3 small delta
    refreshes against the FROZEN trained quantizer (rebuild_fraction
    high enough that no refit fires), recall@5 vs brute force at
    n_probe=2 of 8 stays in the trained class (>= 0.5, the same
    slack-pinned floor as the build-time contract; label proxy
    measures ~0.28)."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 > 2), mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version(),
                    quantizer="kmeans", k_cells=8, train_iters=2)
    for m in (0, 1, 2):
        base.commit(emb.filter(F.col("vec_id") % 10 == m), mode="append")
        g = refresh_ivf_index(spark, base, root, rebuild_fraction=0.6)
        assert index_meta(root, g)["op"] == "ivf_delta"

    qids = list(range(20))
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(base.read(spark), qids,
                                       k=5).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_query_index(
                  spark, root, qids, k=5, n_probe=2,
                  verify_against=base.read(spark)).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, recall


def test_quantized_serving_matches_numpy_backend_and_prunes(
        spark, sf_dir, tmp_path):
    """ivf_query_index_quantized: (a) probing EVERY cell reproduces the
    numpy quantized_topk backend exactly (expression integer dot ==
    int64 matmul -- the integer-exactness contract); (b) the candidate
    scan opens ONLY the probed cells' q8 files (corrupt-file proof);
    (c) an index without a q8 table refuses loudly."""
    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_quantized,
    )
    from location_summary_etl_spark.operators.quantize import quantized_topk
    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    v = build_ivf_index(emb, root, store_quantized=True)
    n_cells = emb.select("label").distinct().count()
    qids = [0, 1, 2, 3, 4]
    queries = [(int(i), [float(x) for x in vec])
               for i, vec in fetch_query_rows(emb, "vec_id", "embedding",
                                              qids)]
    got = ivf_query_index_quantized(spark, root, queries, k=5,
                                    n_probe=n_cells, version=v)
    want = quantized_topk(emb, qids, k=5)
    assert _topk_sets(got.withColumnRenamed("qcosine", "cosine")) == \
        _topk_sets(want.withColumnRenamed("qcosine", "cosine"))
    # both serving backends are bit-identical (exact integer dots)
    got_expr = ivf_query_index_quantized(spark, root, queries, k=5,
                                         n_probe=n_cells, version=v,
                                         backend="expr")
    assert sorted(map(str, got_expr.collect())) == \
        sorted(map(str, got.collect()))

    # (b) constructed 4-cell index: corrupt every q8 file that cannot
    # hold cell 2, query the cell-2 centroid with n_probe=1
    base = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0], i % 4)
         for i in range(200)],
        "vec_id bigint, embedding array<float>, label int")
    root2 = str(tmp_path / "idx2")
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        v2 = build_ivf_index(base, root2, store_quantized=True)
    finally:
        spark.conf.set(coalesce_key, prev)
    from location_summary_etl_spark.operators.similarity import (
        ivf_centroids,
    )
    cv2 = [r for r in ivf_centroids(base).collect() if r["cl"] == 2][0]["cv"]
    q8_tbl = VersionedTable(str(tmp_path / "idx2" / "cells_q8"))
    m = q8_tbl._manifest(index_meta(root2, v2)["q8_version"])
    other = [f for f in m["files"]
             if (st := m["stats"][f]["cl"])[0] is not None
             and not (st[0] <= 2 <= st[1])]
    assert other, "expected q8 files that cannot contain cell 2"
    for f in other:
        with open(f, "wb") as fh:
            fh.write(b"not parquet anymore")
    res = ivf_query_index_quantized(spark, root2, [(-1, list(cv2))],
                                    k=3, n_probe=1, version=v2).collect()
    assert len(res) == 3
    assert {r["vec_id"] % 4 for r in res} == {2}

    # (c) no q8 table -> loud refusal
    root3 = str(tmp_path / "idx3")
    v3 = build_ivf_index(base, root3)
    with pytest.raises(ValueError, match="store_quantized"):
        ivf_query_index_quantized(spark, root3, [(-1, list(cv2))],
                                  k=3, version=v3)


def test_delta_refresh_maintains_quantized_cells(spark, sf_dir, tmp_path):
    """A quantized index refreshed through the CDC path serves
    identically to one built from scratch over the post-delta base --
    the q8 merge mirrors the float merge -- and vacuum_index retains
    the q8 pins of retained generations."""
    import os

    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_quantized,
        refresh_ivf_index,
        vacuum_index,
    )
    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 != 0), mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version(),
                    store_quantized=True)
    base.commit(emb.filter(F.col("vec_id") % 10 == 0), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    assert index_meta(root, v2)["q8_version"] is not None

    full_root = str(tmp_path / "full")
    vf = build_ivf_index(base.read(spark), full_root, store_quantized=True)
    queries = [(int(i), [float(x) for x in vec])
               for i, vec in fetch_query_rows(emb, "vec_id", "embedding",
                                              [1, 2, 3, 4])]
    got = ivf_query_index_quantized(spark, root, queries, k=5, version=v2)
    want = ivf_query_index_quantized(spark, full_root, queries, k=5,
                                     version=vf)
    assert _topk_sets(got.withColumnRenamed("qcosine", "cosine")) == \
        _topk_sets(want.withColumnRenamed("qcosine", "cosine"))

    removed = vacuum_index(root, retain_generations=1, grace_seconds=0)
    assert "cells_q8" in removed
    still = ivf_query_index_quantized(spark, root, queries, k=5, version=v2)
    assert still.count() > 0


def test_kmeans_quantized_index_refresh_end_to_end(spark, sf_dir, tmp_path):
    """The two r8/r9 options COMBINED: a trained (frozen) kmeans
    quantizer with a stored q8 inverted file, maintained through a
    delta refresh -- quantized serving over the refreshed index equals
    a from-scratch kmeans+q8 build of the full base (the q8 merge is
    quantizer-independent; the frozen centroids republish verbatim)."""
    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_quantized,
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 != 0), mode="overwrite")
    root = str(tmp_path / "idx")
    build_ivf_index(base.read(spark), root,
                    base_version=base.latest_version(),
                    quantizer="kmeans", k_cells=6, train_iters=1,
                    store_quantized=True)
    base.commit(emb.filter(F.col("vec_id") % 10 == 0), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    m2 = index_meta(root, v2)
    assert m2["op"] == "ivf_delta" and m2["quantizer"] == "kmeans"
    assert m2["q8_version"] is not None

    # from-scratch spec: SAME frozen centroids (pin them from the
    # refreshed index's generation -- a fresh kmeans fit over the full
    # table would legitimately train different cells)
    cent_tbl = VersionedTable(str(tmp_path / "idx" / "centroids"))
    pinned = sorted((int(r["cl"]), list(r["cv"]))
                    for r in cent_tbl.read(spark, v2).collect())
    from location_summary_etl_spark.operators.ann_index import (
        _q8_of_cells,
    )
    from location_summary_etl_spark.operators.similarity import (
        ivf_cells_quantized,
    )
    spec_q8 = _q8_of_cells(
        ivf_cells_quantized(base.read(spark), pinned))
    got_q8 = VersionedTable(str(tmp_path / "idx" / "cells_q8")).read(
        spark, m2["q8_version"])
    assert sorted(map(str, got_q8.collect())) == \
        sorted(map(str, spec_q8.collect()))

    queries = [(int(i), [float(x) for x in vec])
               for i, vec in fetch_query_rows(emb, "vec_id", "embedding",
                                              [1, 2, 3])]
    got = ivf_query_index_quantized(spark, root, queries, k=4, version=v2)
    assert got.count() == 12


# ------------------------------------------------ hot-cell skew guard


def _skewed_hot_blob(spark):
    """1000 vectors: 850 in one dense region (uniform 1D lattice inside
    it, ids scrambled so the sub-split's first-m-ids seeding lands
    spread positions) + 3 well-separated cold regions.  An unguarded
    k_cells=4 fit puts the 850 into one cell."""
    rows = []
    for i in range(3, 853):  # hot blob: positions 0..84.9 along dim 0
        pos = ((i * 211) % 850) * 0.1
        rows.append((i, [pos, 0.0, 0.0, 50.0], 0))
    corners = [[300.0, 0.0, 0.0, 0.0], [0.0, 300.0, 0.0, 0.0],
               [0.0, 0.0, 300.0, 0.0]]
    for j, corner in enumerate(corners):
        rows.append((j, corner, 1 + j))  # ids 0..2: the cold seeds
    for i in range(853, 1000):
        corner = corners[i % 3]
        rows.append((i, [c + (i % 7) * 0.1 for c in corner], 1 + i % 3))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")


def test_build_split_guard_bounds_hot_cells(spark, tmp_path):
    """Default-on hot-cell guard (quantizer='kmeans'): a corpus whose
    embedding distribution concentrates 85% of rows into one trained
    cell gets that cell split by re-seeded sub-centroids until no cell
    exceeds max_cell_fraction -- and exactness is untouched (probing
    every cell still recovers brute force)."""
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _skewed_hot_blob(spark)

    # baseline: guard off reproduces the skew-killer
    root_off = str(tmp_path / "off")
    v_off = build_ivf_index(emb, root_off, quantizer="kmeans",
                            k_cells=4, train_iters=4,
                            max_cell_fraction=None)
    m_off = index_meta(root_off, v_off)
    counts_off = {int(c): n for c, n in m_off["cell_counts"].items()}
    assert max(counts_off.values()) >= 800  # one hot cell holds ~85%

    # guard on (default fraction 0.25): bound holds
    root = str(tmp_path / "on")
    v = build_ivf_index(emb, root, quantizer="kmeans",
                        k_cells=4, train_iters=4)
    m = index_meta(root, v)
    assert m["max_cell_fraction"] == 0.25
    counts = {int(c): n for c, n in m["cell_counts"].items()}
    total = sum(counts.values())
    assert total == 1000
    import math
    cap = math.ceil(total * 0.25)
    assert max(counts.values()) <= cap, counts
    assert len(counts) > len(counts_off)  # sub-centroids were added

    # manifest counts are the true counts
    from location_summary_etl_spark.sources.versioned import VersionedTable
    cells = VersionedTable(str(tmp_path / "on" / "cells")).read(
        spark, m["cells_version"])
    true_counts = {r["cl"]: r["n"] for r in cells.groupBy("cl").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == true_counts

    # exactness contract: probing every cell == brute force
    qids = [3, 100, 500, 853]
    exact = {(r["query_id"], r["rank"], r["vec_id"])
             for r in brute_force_topk(emb, qids, k=5).collect()}
    full = {(r["query_id"], r["rank"], r["vec_id"])
            for r in ivf_query_index(spark, root, qids, k=5,
                                     n_probe=len(counts),
                                     version=v).collect()}
    assert full == exact

    # the payoff the guard protects: a worst-case probe now scans a
    # bounded candidate set instead of ~85% of the corpus
    worst2 = sum(sorted(counts.values())[-2:])
    assert worst2 <= 2 * cap
    assert worst2 < max(counts_off.values())


def test_refresh_split_guard_and_counts_bookkeeping(spark, tmp_path):
    """A delta that grows one cell past the bound gets that cell split
    DURING refresh: file-pruned within-cell re-seed, only the hot
    cell's files rewritten (cold build files carried by path), q8
    table maintained through the split, manifest counts stay exact,
    and probing every cell still recovers brute force."""
    from location_summary_etl_spark.operators.ann_index import (
        _q8_of_cells,
        refresh_ivf_index,
    )
    from location_summary_etl_spark.operators.similarity import (
        brute_force_topk,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    schema = "vec_id bigint, embedding array<double>, label int"
    # 4 balanced natural clusters, 100 rows each
    clusters = [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]]
    rows = []
    for i in range(400):
        c = clusters[i % 4]
        rows.append((i, [c[0] + (i % 10) * 0.1, c[1] + (i // 40) * 0.1],
                     i % 4))
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(spark.createDataFrame(rows, schema), mode="overwrite")
    root = str(tmp_path / "idx")
    # pin one file per cell at this tiny scale (AQE would coalesce
    # everything into one file, leaving nothing to carry by path)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_co = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        v1 = build_ivf_index(base.read(spark), root,
                             base_version=base.latest_version(),
                             quantizer="kmeans", k_cells=4, train_iters=2,
                             store_quantized=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_co)
    m1 = index_meta(root, v1)
    counts1 = {int(c): n for c, n in m1["cell_counts"].items()}
    assert sorted(counts1.values()) == [100, 100, 100, 100]
    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))
    build_files = set(cells_tbl._manifest(m1["cells_version"])["files"])

    # 19.5% delta (under rebuild_fraction): all near cluster 0 but
    # offset, so cell 0 grows to 178/478 > ceil(478*0.25)=120
    delta = [(1000 + i, [8.0 + (i % 6) * 0.1, 0.5 + (i % 13) * 0.1], 0)
             for i in range(78)]
    base.commit(spark.createDataFrame(delta, schema), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    m2 = index_meta(root, v2)
    assert m2["op"] == "ivf_delta"
    assert m2["split_cells"], "hot cell was not split"
    import math
    counts2 = {int(c): n for c, n in m2["cell_counts"].items()}
    total = sum(counts2.values())
    assert total == 478
    assert max(counts2.values()) <= math.ceil(total * 0.25), counts2

    # manifest counts == true counts after the split
    cells2 = cells_tbl.read(spark, m2["cells_version"])
    true_counts = {r["cl"]: r["n"] for r in cells2.groupBy("cl").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts2 == true_counts

    # cold cells carried BY PATH through delta-merge + split-merge
    final_files = set(cells_tbl._manifest(m2["cells_version"])["files"])
    assert build_files & final_files, "every build file was rewritten"

    # q8 inverted file maintained through the split: equals the spec
    # quantization of the post-split float cells
    q8 = VersionedTable(str(tmp_path / "idx" / "cells_q8")).read(
        spark, m2["q8_version"])
    assert sorted(map(str, q8.collect())) == sorted(
        map(str, _q8_of_cells(cells2).collect()))

    # exactness: probing every cell == brute force over the new base
    qids = [0, 1000, 201]
    exact = {(r["query_id"], r["rank"], r["vec_id"])
             for r in brute_force_topk(base.read(spark), qids,
                                       k=5).collect()}
    full = {(r["query_id"], r["rank"], r["vec_id"])
            for r in ivf_query_index(spark, root, qids, k=5,
                                     n_probe=len(counts2),
                                     version=v2).collect()}
    assert full == exact


def test_refresh_counts_stay_exact_without_split(spark, sf_dir, tmp_path):
    """cell_counts bookkeeping on the ordinary (no-split) delta path,
    label quantizer: touched cells are recounted file-pruned, untouched
    cells keep their manifest numbers, and the result equals a full
    recount.  Also pins that the LABEL quantizer is exempt from
    splitting even under extreme label skew."""
    from location_summary_etl_spark.operators.ann_index import (
        refresh_ivf_index,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb.filter(F.col("vec_id") % 10 != 0), mode="overwrite")
    root = str(tmp_path / "idx")
    v1 = build_ivf_index(base.read(spark), root,
                         base_version=base.latest_version())
    m1 = index_meta(root, v1)
    assert m1["quantizer"] == "label"

    base.commit(emb.filter(F.col("vec_id") % 10 == 0), mode="append")
    v2 = refresh_ivf_index(spark, base, root)
    m2 = index_meta(root, v2)
    counts = {int(c): n for c, n in m2["cell_counts"].items()}
    cells = VersionedTable(str(tmp_path / "idx" / "cells")).read(
        spark, m2["cells_version"])
    true_counts = {r["cl"]: r["n"] for r in cells.groupBy("cl").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == true_counts

    # label skew does NOT split (cl==label semantics preserved):
    skew = spark.createDataFrame(
        [(i, [float(i % 5), 1.0], 7) for i in range(200)]
        + [(1000 + i, [50.0, float(i)], i % 2) for i in range(20)],
        "vec_id bigint, embedding array<double>, label int")
    root2 = str(tmp_path / "skewlabel")
    v = build_ivf_index(skew, root2)  # 200/220 rows in label 7
    m = index_meta(root2, v)
    counts = {int(c): n for c, n in m["cell_counts"].items()}
    assert counts[7] == 200  # hot label intact, not re-cut
    assert set(counts) == {0, 1, 7}


# ------------------------------------------- quantized refine stage


def test_refine_recovers_exact_float_ranking(spark, sf_dir, tmp_path):
    """refine=R: the int8 scan selects top-R, floats are fetched for
    exactly those ids, and the final top-k is the EXACT float ranking
    -- row-for-row equal to ivf_query_index_vectors (same rounding,
    same tie order, same `cosine` column) once R covers the float
    top-k.  Also pins refine < k as an error and staleness gating on
    the quantized path (ADVICE r9: previously only the float path had
    verify_against)."""
    import pytest as _pytest

    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_quantized,
        ivf_query_index_vectors,
    )
    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )
    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    base = VersionedTable(str(tmp_path / "base"))
    base.commit(emb, mode="overwrite")
    root = str(tmp_path / "idx")
    v = build_ivf_index(base.read(spark), root,
                        base_version=base.latest_version(),
                        store_quantized=True)
    queries = [(int(i), [float(x) for x in vec])
               for i, vec in fetch_query_rows(emb, "vec_id", "embedding",
                                              [1, 2, 3, 4, 5])]

    float_rows = ivf_query_index_vectors(
        spark, root, queries, k=5, version=v).collect()
    want = sorted(map(str, float_rows))
    # R >= every probed candidate: refine rescans ALL candidates in
    # float, so the result is GUARANTEED row-for-row float-identical
    # (same rounding, ties, column name); finite R trades that
    # guarantee for the bounded fetch -- agreement must then be
    # monotone in R, asserted below
    R_ALL = 10 ** 6
    got_df = ivf_query_index_quantized(spark, root, queries, k=5,
                                       version=v, refine=R_ALL)
    assert got_df.columns == ["query_id", "rank", "vec_id", "cosine"]
    assert sorted(map(str, got_df.collect())) == want

    # both quantized backends refine to the same exact ranking
    got_expr = ivf_query_index_quantized(spark, root, queries, k=5,
                                         version=v, refine=R_ALL,
                                         backend="expr")
    assert sorted(map(str, got_expr.collect())) == want

    # moderate R: refined agreement with the float top-k is at least
    # the bare int8 path's (the refine stage can only fix rankings)
    fset = {(r["query_id"], r["vec_id"]) for r in float_rows}
    q8set = {(r["query_id"], r["vec_id"])
             for r in ivf_query_index_quantized(
                 spark, root, queries, k=5, version=v).collect()}
    r40set = {(r["query_id"], r["vec_id"])
              for r in ivf_query_index_quantized(
                  spark, root, queries, k=5, version=v,
                  refine=40).collect()}
    assert len(fset & r40set) >= len(fset & q8set)

    with _pytest.raises(ValueError, match="refine=3 must be >= k=5"):
        ivf_query_index_quantized(spark, root, queries, k=5,
                                  version=v, refine=3)

    # staleness gate on the quantized path: fresh base passes, a
    # changed base raises before any scan
    ok = ivf_query_index_quantized(spark, root, queries, k=5, version=v,
                                   refine=R_ALL,
                                   verify_against=base.read(spark))
    assert sorted(map(str, ok.collect())) == want
    base.commit(base.read(spark).limit(50), mode="overwrite")
    with pytest.raises(StaleIndexError, match="rebuild or pin"):
        ivf_query_index_quantized(spark, root, queries, k=5, version=v,
                                  verify_against=base.read(spark))


def test_refine_float_fetch_is_pruned_and_bounded(spark, sf_dir,
                                                  tmp_path):
    """The refine fetch pushes the candidate-id IN filter into the
    float scan (visible as a pushed filter over vec_id) and the float
    side of the refined plan joins exactly R x |Q| candidate pairs at
    most -- the fetch is point lookups, not a float re-scan of the
    probed cells' rows."""
    from location_summary_etl_spark.operators.ann_index import (
        ivf_query_index_quantized,
    )
    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    v = build_ivf_index(emb, root, store_quantized=True)
    queries = [(int(i), [float(x) for x in vec])
               for i, vec in fetch_query_rows(emb, "vec_id", "embedding",
                                              [1, 2])]
    df = ivf_query_index_quantized(spark, root, queries, k=5,
                                   version=v, refine=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the IN(ids) predicate reached the float scan as a pushed filter
    assert "PushedFilters: [In(vec_id" in plan, plan
    # exact-rescore output is bounded by the candidate pairs
    n = df.count()
    assert n <= 2 * 5
    # and the rescored relation upstream of top-k is <= R x |Q|
    # (2 queries x R=20): count it by raising k to R
    all_ranked = ivf_query_index_quantized(spark, root, queries, k=20,
                                           version=v, refine=20)
    assert all_ranked.count() <= 2 * 20


def test_build_layout_is_id_sorted_within_cells(spark, sf_dir, tmp_path):
    """The float inverted file is sorted by (cl, vec_id) within each
    data file -- the layout the refine fetch's page-level pruning
    leans on (and compaction restores it after fragmenting deltas)."""
    import pyarrow.parquet as pq

    from location_summary_etl_spark.sources.versioned import VersionedTable

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb, root)
    m = index_meta(root)
    cells_tbl = VersionedTable(str(tmp_path / "idx" / "cells"))
    for f in cells_tbl._manifest(m["cells_version"])["files"]:
        t = pq.read_table(f, columns=["cl", "vec_id"])
        pairs = list(zip(t["cl"].to_pylist(), t["vec_id"].to_pylist()))
        assert pairs == sorted(pairs), f
