"""Persisted IVF ANN index: build once, store, query many times.

The in-plan ``ivf_topk`` (operators/similarity.py) recomputes the
coarse quantizer per run -- fine for a one-off query, wrong for a
100 TB pipeline where the index is built once per corpus snapshot and
served to thousands of queries.  This module persists BOTH index
artifacts to the repo's own lakehouse format (sources/versioned.py):

* ``<root>/cells``      -- the inverted file (:func:`ivf_cells` schema:
  vec_id, cl, c_v, c_nrm), written REPARTITIONED BY CELL so a probe of
  ``n_probe`` cells touches a bounded set of co-located files;
* ``<root>/centroids``  -- the coarse quantizer
  (:func:`ivf_centroids` schema: cl, cv, c_nrm), whose manifest
  ``operation`` tag carries the index metadata: the paired cells
  version (the two tables advance independently; the pin keeps them
  consistent) and a FINGERPRINT of the indexed relation
  (row count + sum of xxhash64(id) -- order-independent, so layout
  changes don't false-alarm).

The query path reads ONLY the pinned snapshots -- the base embeddings
table is never touched (query vectors are looked up in the inverted
file itself).  Staleness is therefore detectable, not silent: pass the
current base relation as ``verify_against`` and a changed fingerprint
raises :class:`StaleIndexError` naming both versions.  Verification
costs one count+sum aggregate over the id column; a production caller
does it once per base-table commit, not per query.

Both commits are ``VersionedTable`` snapshots, so an index REBUILD is
an ``overwrite`` commit: readers pinned to the old version keep
getting bit-identical answers (time travel), and vacuum retires the
old files on the normal schedule.

Reference parity: the reference (AidanFarhi/location-summary-etl,
App.scala) has no ANN surface; this is the SURVEY §2.D similarity
extension's scale path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.operators.similarity import (
    IVF_N_PROBE,
    ivf_cells,
    ivf_centroids,
    ivf_search,
)
from location_summary_etl_spark.sources.versioned import VersionedTable

_CELLS = "cells"
_CENTROIDS = "centroids"


class StaleIndexError(RuntimeError):
    """The pinned index no longer matches the base relation."""


def _fingerprint(emb: DataFrame, id_col: str) -> list[int]:
    """Order-independent identity of the indexed relation: (row count,
    sum of xxhash64(id) in decimal(38,0) -- ANSI mode makes a long sum
    of 64-bit hashes an ARITHMETIC_OVERFLOW error; decimal(38,0) holds
    ~2^126, overflow-free past any real row count).  One
    map-side-combined aggregate: at any scale the shuffle is a single
    partial-sum row per task."""
    row = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)")).alias("h"),
    ).first()
    return [int(row["n"]), int(row["h"])]


def build_ivf_index(emb: DataFrame, root: str, *, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> int:
    """Build and persist the index; returns the centroid-table version
    (THE index version a query pins).

    Two lineages, two commits: the inverted file first (repartitioned
    by cell for probe locality), then the centroids whose manifest
    records the cells pin + base fingerprint.  Commit order matters: a
    crash between the two leaves an unreferenced cells snapshot (never
    a centroid manifest pointing at missing cells)."""
    cells = ivf_cells(emb, id_col, vec_col, label_col).repartition("cl")
    cells_v = VersionedTable(os.path.join(root, _CELLS)).commit(
        cells, mode="overwrite", operation="ivf_cells")
    meta = {
        "op": "ivf_build",
        "cells_version": cells_v,
        "fingerprint": _fingerprint(emb, id_col),
    }
    return VersionedTable(os.path.join(root, _CENTROIDS)).commit(
        ivf_centroids(emb, label_col, vec_col),
        mode="overwrite", operation=json.dumps(meta))


def index_meta(root: str, version: int | None = None) -> dict:
    """The metadata recorded at build time (cells pin, fingerprint)."""
    tbl = VersionedTable(os.path.join(root, _CENTROIDS))
    if version is None:
        version = tbl.latest_version()
    if version is None:
        raise FileNotFoundError(f"no ANN index committed under {root}")
    return {"version": version, **json.loads(tbl._manifest(version)["operation"])}


def ivf_query_index(spark: SparkSession, root: str, query_ids: list[int],
                    k: int = 5, n_probe: int = IVF_N_PROBE,
                    version: int | None = None,
                    verify_against: DataFrame | None = None,
                    id_col: str = "vec_id") -> DataFrame:
    """Top-k from the persisted index alone (no base-table access).

    ``version`` pins an index generation (default: latest);
    ``verify_against`` raises :class:`StaleIndexError` when the pinned
    generation was not built from that relation's current contents."""
    meta = index_meta(root, version)
    if verify_against is not None:
        current = _fingerprint(verify_against, id_col)
        if current != meta["fingerprint"]:
            raise StaleIndexError(
                f"index v{meta['version']} at {root} was built from "
                f"fingerprint {meta['fingerprint']}, but the base relation "
                f"is now {current}; rebuild or pin a matching version")
    cent = VersionedTable(os.path.join(root, _CENTROIDS)).read(
        spark, meta["version"])
    cells = VersionedTable(os.path.join(root, _CELLS)).read(
        spark, meta["cells_version"])
    return ivf_search(cells, cent, query_ids, k=k, n_probe=n_probe)
