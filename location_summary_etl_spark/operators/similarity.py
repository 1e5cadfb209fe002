"""Similarity search over embedding columns (BASELINE.json north star).

Three strategies, one semantics (top-k cosine neighbors per query):

- :func:`brute_force_topk` -- exact; the query set is broadcast, so
  scoring is a map over the candidate table (no shuffle) followed by a
  per-query top-k window.  The baseline and the correctness anchor.
- :func:`lsh_bucket_topk` -- approximate scale path: candidates are
  restricted to the query's sign-LSH bucket (axis-aligned hyperplanes
  = sign bits of the leading dimensions).  Bucketing turns the O(N*Q)
  scan into a bucket-equi-join; recall is traded for fan-in, which is
  the standard ANN bargain.  Fully expressible in SQL -> exact oracle.
- :func:`pandas_cosine_topk` -- the same brute-force semantics through
  an Arrow-batched ``mapInPandas`` (numpy matmul per batch).  This is
  the throughput path when Q is large: BLAS beats per-row expression
  eval by orders of magnitude, and batches stream through executors
  without materializing the pair table.

Ranking is on cosine rounded to 6 decimals with vec_id tie-break, so
ranks are stable across engines/backends (float noise lives below
1e-12; the rounding absorbs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.functions.vectors import cosine, l2_norm
from location_summary_etl_spark.session import ensure_parallelism

LSH_SIGN_BITS = 6  # leading dims used as axis-aligned hyperplanes


def _is_bare_scan(df: DataFrame) -> bool:
    """True iff the ANALYZED plan is a file-source relation, optionally
    under SubqueryAlias/View wrappers or a Project of *plain attributes*
    -- exactly the shapes where the raw files' rows equal the
    DataFrame's rows.  ``inputFiles()`` alone is NOT that test: it also
    returns the source files of filtered / derived relations, so a fast
    path keyed on it would silently ignore upstream transforms and
    serve stale raw rows.  Conservative by construction: any node we
    do not recognize (Filter, Join, computed Project, ...) returns
    False and the caller falls back to a real Spark job.
    """
    import re

    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    for raw in plan.splitlines():
        ln = raw.strip()
        while ln[:2] in ("+-", ":-", ": "):
            ln = ln[2:].strip()
        if not ln:
            continue
        if ln.startswith(("Relation", "SubqueryAlias", "View")):
            continue
        m = re.fullmatch(r"Project \[(.*)\]", ln)
        if m and all(
            re.fullmatch(r"[A-Za-z0-9_]+#\d+[A-Za-z]*", c.strip())
            for c in m.group(1).split(",")
        ):
            continue
        return False
    return True


def fetch_query_rows(emb: DataFrame, id_col: str, vec_col: str,
                     query_ids: list[int]) -> list[tuple]:
    """The |Q| query rows as (id, vector) tuples, WITHOUT a Spark job
    when the relation is a plain file scan.

    The pandas ANN backends need the (small by design) query matrix on
    the driver before they can broadcast it.  ``df.collect()`` pays a
    full job -- scheduling, a repartition exchange if the scan was
    widened, task launch -- to move five rows.  When the analyzed plan
    is a bare scan (:func:`_is_bare_scan` -- NOT merely "has input
    files", which filtered/derived relations also report) over
    driver-local parquet (``file:`` scheme; on object stores the paths
    are not driver-readable so the fast path is skipped), reading
    those files directly with pyarrow (predicate-pushed to ``id IN
    (...)``) returns the same rows in ~10 ms with zero jobs.  Falls
    back to ``collect`` for everything else (literal test frames,
    views over transforms, remote storage).  Same trade as DuckDB
    scanning the file in-process: this is driver metadata access, not
    distributed compute, and |Q| is bounded.
    """
    try:
        files = [f for f in emb.inputFiles() if f.endswith(".parquet")]
    except Exception:
        files = []
    # Local-scheme guard: only file: URIs (or bare paths) are readable
    # from the driver; s3://*, hdfs://* etc. must take the Spark path.
    if files and not all(f.startswith(("file:", "/")) for f in files):
        files = []
    if files and not _is_bare_scan(emb):
        files = []
    if files:
        try:
            import pyarrow.dataset as ds

            dataset = ds.dataset([f.removeprefix("file:") for f in files],
                                 format="parquet")
            tbl = dataset.to_table(
                columns=[id_col, vec_col],
                filter=ds.field(id_col).isin(query_ids),
            )
            ids = tbl.column(id_col).to_pylist()
            vecs = tbl.column(vec_col).to_pylist()
            return list(zip(ids, vecs))
        except Exception:
            pass
    return [
        (r[0], r[1])
        for r in emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()
    ]


def _with_norm(emb: DataFrame, id_col: str, vec_col: str,
               prefix: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_v"),
        l2_norm(v).alias(f"{prefix}_nrm"),
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def brute_force_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    The query side is a broadcast of |Q| rows; scoring is map-only.
    """
    emb = ensure_parallelism(emb, by=id_col)  # 1-partition small scans -> all cores
    q = _with_norm(
        emb.filter(F.col(id_col).isin(query_ids)), id_col, vec_col, "q"
    ).withColumnRenamed("q_id", "query_id")
    c = _with_norm(emb, id_col, vec_col, "c").withColumnRenamed("c_id", "vec_id")
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round_portable(
                cosine(F.col("q_v"), F.col("c_v"),
                       F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return _rank_topk(scored, k)


def sign_bucket(vec_col, bits: int = LSH_SIGN_BITS):
    """Axis-aligned sign LSH bucket id in [0, 2^bits)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return sum(
        F.when(F.element_at(v, i + 1) >= 0, F.lit(1 << i)).otherwise(0)
        for i in range(bits)
    ).cast("int")


def lsh_bucket_topk(emb: DataFrame, query_ids: list[int], k: int = 3,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's sign-LSH bucket.

    At scale the bucket column is a join key: candidates are
    hash-partitioned by bucket once and each query probes one
    partition, instead of scanning the full table per query.
    """
    emb = ensure_parallelism(emb, by=id_col)  # 1-partition small scans -> all cores
    q = (
        _with_norm(emb.filter(F.col(id_col).isin(query_ids)),
                   id_col, vec_col, "q")
        .withColumnRenamed("q_id", "query_id")
        .withColumn("bucket", sign_bucket("q_v"))
    )
    c = (
        _with_norm(emb, id_col, vec_col, "c")
        .withColumnRenamed("c_id", "vec_id")
        .withColumn("bucket", sign_bucket("c_v"))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round_portable(
                cosine(F.col("q_v"), F.col("c_v"),
                       F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return _rank_topk(scored, k)


IVF_N_PROBE = 2
CENTROID_SCALE = 9  # centroid components rounded to 9 decimals


def ivf_centroids(emb: DataFrame, label_col: str = "label",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vector -- the IVF coarse quantizer's cell
    centroids, derived deterministically from the data (a k-means
    trainer would slot in here; the label column stands in for its
    assignment, keeping the whole path reproducible and
    oracle-checkable).

    posexplode -> groupBy(label, pos) -> avg is one shuffle keyed on
    (label, pos): at 100 TB the component-wise sums combine map-side,
    so the shuffle carries |labels| x dim rows regardless of row count.
    Components are rounded to ``CENTROID_SCALE`` decimals so Spark's
    and DuckDB's float summation orders cannot produce diverging
    centroids.

    Returns (cl, cv, c_nrm).
    """
    flat = emb.select(
        F.col(label_col).alias("cl"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    per_comp = flat.groupBy("cl", "i").agg(F.avg("x").alias("cx"))
    return (
        per_comp.groupBy("cl")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("_s"))
        .select(
            "cl",
            F.transform(
                "_s", lambda st: round_portable(st["cx"], CENTROID_SCALE)
            ).alias("cv"),
        )
        .select("cl", "cv", l2_norm(F.col("cv")).alias("c_nrm"))
    )


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_probe: int = IVF_N_PROBE, id_col: str = "vec_id",
             vec_col: str = "embedding",
             label_col: str = "label") -> DataFrame:
    """IVF-style approximate top-k: rank the (tiny) centroid table per
    query, search only the ``n_probe`` nearest cells.

    Scale shape: the centroid table and the (query x probed-cell) list
    are broadcast; candidates are restricted by an equi-join on the
    cell id, so the scored volume is |probed cells' contents| x |Q|,
    never |N| x |Q|.  This is the standard IVF bargain -- recall
    bounded by n_probe/cells -- expressed entirely in DataFrame ops.
    """
    emb = ensure_parallelism(emb, by=id_col)  # 1-partition small scans -> all cores
    cent = ivf_centroids(emb, label_col, vec_col)
    cells = ivf_cells(emb, id_col, vec_col, label_col)
    return ivf_search(cells, cent, query_ids, k=k, n_probe=n_probe)


def ivf_cells(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding",
              label_col: str = "label") -> DataFrame:
    """The IVF inverted file: (vec_id, cl, c_v, c_nrm) -- every vector
    tagged with its cell, norm precomputed.  This is the relation a
    PERSISTED index stores clustered by ``cl`` (see
    operators/ann_index.py); in-plan callers derive it on the fly."""
    v = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).alias("cl"),
        v.alias("c_v"), l2_norm(v).alias("c_nrm"),
    )


def ivf_cells_quantized(emb: DataFrame,
                        cents: list[tuple[int, list[float]]],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """:func:`ivf_cells` with a TRAINED (frozen) coarse quantizer:
    the cell is the codegen'd literal L2-argmin over ``cents``
    (:func:`~location_summary_etl_spark.operators.clustering.kmeans_literal_argmin`)
    instead of the label column -- one scan, no join.  Assignment is
    L2 (the k-means objective); probe RANKING stays cosine in
    :func:`ivf_search` -- standard IVF practice, and harmless to
    exactness because pruning is the only approximation (probing
    every cell still recovers brute force, the recall-contract
    test)."""
    from location_summary_etl_spark.operators.clustering import (
        kmeans_literal_argmin,
    )

    v = F.col(vec_col).cast("array<double>")
    # NULL vectors are excluded, matching kmeans_fit's training set --
    # a NULL vector has no argmin and could never score in a search.
    return emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        kmeans_literal_argmin(vec_col, cents).cast("int").alias("cl"),
        v.alias("c_v"), l2_norm(v).alias("c_nrm"),
    )


def ivf_search(cells: DataFrame, cent: DataFrame, query_ids: list[int],
               k: int = 5, n_probe: int = IVF_N_PROBE) -> DataFrame:
    """The IVF query core over an inverted file (:func:`ivf_cells`
    schema) and a centroid table (:func:`ivf_centroids` schema) --
    shared verbatim by the in-plan ``ivf_topk`` and the persisted-index
    query path, so both stay oracle-identical.  Query vectors are
    looked up IN the inverted file (it stores every vector), keeping
    the persisted path entirely base-table-free."""
    q = cells.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("c_v").alias("q_v"), F.col("c_nrm").alias("q_nrm"),
    )
    return ivf_search_vectors(cells, cent, q, k=k, n_probe=n_probe)


def ivf_search_vectors(cells: DataFrame, cent: DataFrame, q: DataFrame,
                       k: int = 5,
                       n_probe: int = IVF_N_PROBE) -> DataFrame:
    """:func:`ivf_search`'s scoring core over a LITERAL query relation
    ``(query_id, q_v, q_nrm)`` -- the production serving shape, where
    the query vector arrives from outside the corpus (an embedded
    search string) instead of by id lookup.  Identical math and
    rounding to the id-keyed path, so both formulations stay
    oracle-comparable."""
    probe_scores = q.crossJoin(F.broadcast(cent)).select(
        "query_id", "cl", "q_v", "q_nrm",
        round_portable(
            cosine(F.col("q_v"), F.col("cv"), F.col("q_nrm"), F.col("c_nrm")),
            6,
        ).alias("ccos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cl")
    )
    probes = (
        probe_scores.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "cl", "q_v", "q_nrm")
    )
    scored = (
        cells.join(F.broadcast(probes), "cl")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round_portable(
                cosine(F.col("q_v"), F.col("c_v"),
                       F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return _rank_topk(scored, k)


def pandas_cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k through an Arrow-batched numpy matmul.

    The (small) query matrix rides to executors as a Spark broadcast;
    each Arrow batch of candidates is scored with one BLAS call.  Same
    semantics as :func:`brute_force_topk`; this is the 100 TB
    throughput path when |Q| is in the hundreds+.
    """
    import numpy as np

    # jobless driver-side fetch of the |Q| query rows (see
    # fetch_query_rows) -- resolved BEFORE the widening repartition so
    # the fallback collect wouldn't pay the exchange either.
    rows = fetch_query_rows(emb, id_col, vec_col, query_ids)
    # Work-sized Python-stage layout: each Arrow map task costs ~10 ms
    # flat, so partition count follows input bytes, capped at cores.
    from location_summary_etl_spark.session import partition_for_python_scan

    emb = partition_for_python_scan(emb)
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = np.array([r[1] for r in rows], dtype=np.float64)
    # Sequential-fold norm (see the dimension loop in score()).
    qn2 = np.zeros(len(qids))
    for d in range(qm.shape[1]):
        qn2 += qm[:, d] * qm[:, d]
    qn = np.sqrt(qn2)
    spark = emb.sparkSession
    bq = spark.sparkContext.broadcast((qids, qm, qn))

    def score(batches):
        import pandas as pd

        qids, qm, qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # Dimension loop, not matmul: each pair's sum is then the
            # same sequential left fold as the expression backend and
            # DuckDB's list_dot_product, so cosines are bit-exact
            # across backends (BLAS pairwise reordering is ulp-off).
            n_dim = vm.shape[1]
            dots = np.zeros((len(vids), len(qids)))
            vn2 = np.zeros(len(vids))
            for d in range(n_dim):
                dots += np.outer(vm[:, d], qm[:, d])
                vn2 += vm[:, d] * vm[:, d]
            vn = np.sqrt(vn2)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / np.outer(vn, qn)
            n_b, n_q = cos.shape
            out = pd.DataFrame({
                "query_id": np.repeat(qids, n_b),
                "vec_id": np.tile(vids, n_q),
                "cosine": cos.T.reshape(-1),
            })
            out = out[np.isfinite(out["cosine"])]
            out = out[out["query_id"] != out["vec_id"]]
            # Per-batch pre-cut: round exactly as round_portable does
            # (same IEEE ops -> bit-identical), then keep only each
            # query's k best by the FINAL ranking order.  The shuffle
            # into the global top-k window then carries
            # O(partitions * |Q| * k) rows instead of O(N * |Q|) --
            # the difference between a constant-size exchange and
            # shuffling the whole scored corpus at 100 TB.
            c = out["cosine"].to_numpy()
            out["cosine"] = np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6
            out = (
                out.sort_values(["query_id", "cosine", "vec_id"],
                                ascending=[True, False, True])
                .groupby("query_id", sort=False)
                .head(k)
            )
            yield out

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, "query_id bigint, vec_id bigint, cosine double"
    )
    # Portable rounding before ranking keeps ranks identical to the
    # expression-based backends and the oracle.
    scored = scored.withColumn("cosine", round_portable("cosine", 6))
    return _rank_topk(scored, k)
