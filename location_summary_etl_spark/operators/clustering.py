"""K-means clustering over embedding columns — the iterative numeric
algorithm family (next to the iterative-graph ``dedup_clusters``), run
the Spark-idiomatic way for small k:

Each round collects the k centroids to the driver (k rows — bounded,
the reference's collect-then-literal move,
/root/reference/src/main/scala/App.scala:175-185) and re-embeds them
as LITERALS in the next assignment expression, so the per-vector
distance computation is pure whole-stage codegen over one scan — no
join, no broadcast relation, no crossJoin fanout.  The only shuffle
per round is the k-group centroid aggregate (map-side combined).

Determinism across engines (the DuckDB oracle replays the same
rounds): distances are ROUNDED (6dp) before the argmin, assignment
ties break on the centroid index via struct ordering, and re-computed
centroids are rounded (6dp) before they become literals — float
summation-order noise between engines is orders of magnitude below
both rounding grains.

Scale: vectors never leave their partitions; per-round cost is one
scan + one k-row aggregate, and the driver holds k*dim doubles.  A
large-k / large-dim variant would keep centroids in a broadcast
relation instead of literals; for corpus-typical k (8-1024) literals
compile fine and skip the join operator entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable


def _score_sql(vec_col: str, cent: list[float]) -> str:
    """Argmin-equivalent distance score to a literal centroid as SQL
    text: |c|^2 - 2*v.c (the |v|^2 term is constant across centroids,
    so it cannot change the argmin and neither engine computes it).
    SQL-text expression, not nested Column calls — the 64-term dot
    product built via py4j Column arithmetic costs more to CONSTRUCT
    than to run at bench scale (house measurement, see SURVEY round-2
    levers)."""
    dot = " + ".join(
        f"{vec_col}[{i}] * {c!r}" for i, c in enumerate(cent))
    cc = sum(c * c for c in cent)
    # sign*floor(|x|*1e6+0.5)/1e6 == round_portable (DuckDB double
    # rounding), inlined as SQL text.
    x = f"({cc!r} - 2 * ({dot}))"
    return f"(sign({x}) * floor(abs({x}) * 1e6 + 0.5) / 1e6)"


def kmeans_fit(emb: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 8,
               iters: int = 2) -> list[tuple[int, list[float]]]:
    """Train and RETURN the centroids (``[(j, vector), ...]``) after
    ``iters`` Lloyd refits -- the quantizer-fitting companion to
    :func:`kmeans_assign` (which returns assignments).  Same seed,
    same codegen'd literal-argmin assignment, same 6dp-rounded refit:
    ``kmeans_fit(iters=N)`` returns exactly the centroids
    ``kmeans_assign(iters=N+1)`` assigns by on its final pass.
    Callers that need centroids AND assignments (the trained-quantizer
    IVF build) fit once here and assign with the returned literals
    instead of re-running the loop."""
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    cents = [
        (j, list(r["_v"]))
        for j, r in enumerate(base.orderBy("_id").limit(k).collect())
    ]
    if not cents:
        raise ValueError("kmeans_fit: no non-NULL vectors in input")
    dim = len(cents[0][1])
    for _ in range(iters):
        pairs = ", ".join(
            f"struct({_score_sql('_v', c)} AS d, {j} AS j)"
            for j, c in cents)
        rows = (
            base.select(
                "_v", F.expr(f"array_min(array({pairs})).j").alias("cluster"))
            .groupBy("cluster")
            .agg(*[round_portable(F.avg(F.col("_v")[i]), 6).alias(f"c{i}")
                   for i in range(dim)])
            .collect()
        )
        cents = sorted(
            (r["cluster"], [r[f"c{i}"] for i in range(dim)]) for r in rows)
    return cents


def kmeans_literal_argmin(vec_col: str,
                          cents: list[tuple[int, list[float]]]):
    """The assignment expression for a FIXED centroid list: codegen'd
    literal argmin (no join, no broadcast relation), ties to the
    smallest centroid id via struct ordering -- shared by
    :func:`kmeans_assign`'s loop and frozen-quantizer consumers."""
    pairs = ", ".join(
        f"struct({_score_sql(vec_col, c)} AS d, {j} AS j)"
        for j, c in cents)
    return F.expr(f"array_min(array({pairs})).j")


def kmeans_assign(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding", k: int = 8,
                  iters: int = 2) -> DataFrame:
    """Assign every vector to one of ``k`` clusters after ``iters``
    Lloyd iterations.  Returns (id, cluster).

    Init: the vectors of the k smallest ids (TakeOrderedAndProject —
    no full sort).  Each iteration: codegen'd literal-centroid argmin
    assignment, then a k-group per-dimension average, rounded 6dp.
    Empty clusters drop out (both engines derive surviving centroids
    from the same rounded assignment, so they agree).  Rows with NULL
    vectors are EXCLUDED from clustering (documented semantics — a
    NULL vector has no distance; silently argmin-ing NULL scores would
    assign it an arbitrary cluster).
    """
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # The seed collect doubles as the emptiness/dimension probe — no
    # separate first() job (this repo hunts exactly such constant
    # factors, see bands.validate_band_rows).
    cents = [
        (j, list(r["_v"]))
        for j, r in enumerate(base.orderBy("_id").limit(k).collect())
    ]
    if not cents:
        raise ValueError("kmeans_assign: no non-NULL vectors in input")
    dim = len(cents[0][1])

    def assign(df: DataFrame) -> DataFrame:
        pairs = ", ".join(
            f"struct({_score_sql('_v', c)} AS d, {j} AS j)"
            for j, c in cents)
        return df.select(
            "_id", "_v",
            F.expr(f"array_min(array({pairs})).j").alias("cluster"),
        )

    for it in range(iters):
        assigned = assign(base)
        if it == iters - 1:
            return assigned.select(
                F.col("_id").alias(id_col), "cluster")
        rows = (
            assigned.groupBy("cluster")
            .agg(*[round_portable(F.avg(F.col("_v")[i]), 6).alias(f"c{i}")
                   for i in range(dim)])
            .collect()
        )
        cents = sorted(
            (r["cluster"], [r[f"c{i}"] for i in range(dim)]) for r in rows)
    raise AssertionError("iters must be >= 1")
