"""Int8 embedding quantization and quantized similarity search.

A 100 TB embedding corpus is memory-bandwidth bound: float32 vectors
are 4 bytes/dim, symmetric int8 is 1 byte/dim plus one scale per
vector, so a quantized scan moves 4x less data through shuffle, cache,
and network for a ~1e-3 cosine error -- the standard compression rung
below the float paths in operators/similarity.py.

Everything here is built-in higher-order expressions (``transform`` /
``zip_with`` / ``aggregate``), whole-stage-codegen'd, no Python.
Parity discipline: quantized codes and their integer dot products are
EXACT (integers), and every derived double (scale, cosine, MSE) is
computed with the same association as the DuckDB oracle, so results
hash-match bit-for-bit before any rounding.

The reference has no vector surface at all (flat relational rows only
-- /root/reference/src/main/scala/App.scala); this is north-star
extension territory (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.session import ensure_parallelism

INT8_MAX = 127


def _half_away(x: Column) -> Column:
    # C-library round semantics, same expression family as round_portable
    return F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))


def int8_quantize(emb: DataFrame, id_cols: list[str] | None = None,
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization.

    scale = max|x| / 127; code_i = round(x_i / scale) in [-127, 127].
    Adds ``q`` (array<int>), ``qscale`` (double), ``q_l2sq`` (bigint,
    exact integer sum of squared codes).  All-zero vectors get scale 0
    and all-zero codes.  Map-only: no shuffle at any scale.
    """
    id_cols = id_cols or ["vec_id"]
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(float(INT8_MAX))
    with_scale = emb.select(*id_cols, v.alias("_v"), scale.alias("qscale"))
    code = F.when(
        F.col("qscale") == 0, F.transform("_v", lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform("_v", lambda x: _half_away(x / F.col("qscale")).cast("int"))
    )
    return with_scale.withColumn("q", code).withColumn(
        "q_l2sq",
        F.aggregate(
            "q", F.lit(0).cast("bigint"),
            lambda acc, x: acc + (x.cast("bigint") * x.cast("bigint")),
        ),
    )


def reconstruction_mse(qdf: DataFrame) -> Column:
    """Mean squared error of dequantized codes vs the original vector.

    Deliberately staged as single-arithmetic-op array passes
    (dequantize, subtract, square, fold) so neither engine can fuse
    ``x - q*scale`` into an FMA -- a fused multiply-add keeps an
    unrounded intermediate and shifts the result by one ulp, which is
    enough to flip a rounding-boundary hash.  The 0.0-seeded left fold
    is the association the oracle replicates via
    ``list_reduce(list_prepend(0.0, ...))``."""
    deq = F.transform("q", lambda qi: qi.cast("double") * F.col("qscale"))
    err = F.zip_with("_v", deq, lambda x, d: x - d)
    sq = F.transform(err, lambda e: e * e)
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x) / F.size("_v")


def _np_quantize(vm):
    """numpy replica of :func:`int8_quantize` on a (rows, dims) float64
    matrix -> int64 codes.  Same arithmetic, element-for-element: the
    max/divide/floor steps are single IEEE ops, so codes are identical
    to the expression backend and the oracle."""
    import numpy as np

    mx = np.abs(vm).max(axis=1) if vm.size else np.zeros(len(vm))
    scale = mx / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        z = vm / scale[:, None]
    q = np.sign(z) * np.floor(np.abs(z) + 0.5)
    q = np.where(scale[:, None] == 0, 0.0, q)
    return q.astype(np.int64), scale


def quantized_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors by quantized cosine: integer dot products of
    int8 codes scaled into [-1, 1] by the exact integer L2 norms.

    Arrow-batched numpy backend (the ``pandas_cosine_topk`` shape):
    the quantized query matrix broadcasts, each candidate batch is
    quantized and scored with ONE int64 matmul.  Integer arithmetic is
    the parity lever -- exact dots/norms are order-independent, so
    unlike the float path no sequential-fold discipline is needed and
    the matmul can use any backend; only the final sqrt/divide are
    floats, computed identically to the oracle.  (A higher-order
    expression formulation is ~3x slower here: Catalyst evaluates
    array lambdas interpreted, per element, per pair.)

    At 100 TB the candidate scan reads 1 byte/dim -- this path exists
    so the scan/shuffle cost rides the compressed representation.
    """
    import numpy as np

    from location_summary_etl_spark.operators.similarity import (
        fetch_query_rows,
    )

    spark = emb.sparkSession
    # jobless driver-side fetch of the |Q| query rows (see
    # similarity.fetch_query_rows).
    rows = fetch_query_rows(emb, id_col, vec_col, query_ids)
    # Work-sized Python-stage layout (see
    # session.partition_for_python_scan): tiny inputs stay narrow,
    # warehouse-scale inputs still fan to core width.
    from location_summary_etl_spark.session import (
        partition_for_python_scan,
    )

    emb = partition_for_python_scan(emb)
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in rows], dtype=np.float64)
    qq, _ = _np_quantize(qm)
    qn = np.sqrt((qq * qq).sum(axis=1).astype(np.float64))
    live = qn > 0
    qids, qq, qn = qids[live], qq[live], qn[live]
    bq = spark.sparkContext.broadcast((qids, qq, qn))

    def score(batches):
        import pandas as pd

        qids, qq, qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vids = pdf[id_col].to_numpy(dtype=np.int64)
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cq, _ = _np_quantize(vm)
            cn = np.sqrt((cq * cq).sum(axis=1).astype(np.float64))
            dots = cq @ qq.T  # exact int64
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots.astype(np.float64) / (cn[:, None] * qn[None, :])
            p = float(10 ** 6)
            cos = np.sign(cos) * np.floor(np.abs(cos) * p + 0.5) / p
            n_b, n_q = cos.shape
            out = pd.DataFrame({
                "query_id": np.repeat(qids, n_b),
                "vec_id": np.tile(vids, n_q),
                "qcosine": cos.T.reshape(-1),
            })
            out = out[np.isfinite(out["qcosine"])]
            out = out[out["query_id"] != out["vec_id"]]
            # Per-batch pre-cut in the final ranking order: the global
            # top-k window then shuffles O(partitions * |Q| * k) rows,
            # not every scored pair (see pandas_cosine_topk).
            out = (
                out.sort_values(["query_id", "qcosine", "vec_id"],
                                ascending=[True, False, True])
                .groupby("query_id", sort=False)
                .head(k)
            )
            yield out

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, "query_id bigint, vec_id bigint, qcosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "qcosine")
    )
