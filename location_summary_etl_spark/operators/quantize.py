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


def quantized_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors by quantized cosine: integer dot product of int8
    codes scaled into [-1, 1] by the exact integer L2 norms.

    Same broadcast-queries/map-only-scoring shape as
    ``similarity.brute_force_topk``, but the candidate scan reads 1
    byte/dim.  The integer dot is exact, so ranking noise comes only
    from the two sqrt/divide steps -- computed identically in the
    oracle, with vec_id breaking ties.
    """
    emb = ensure_parallelism(emb)
    qd = int8_quantize(emb, [id_col], vec_col).filter(F.col("q_l2sq") > 0)
    queries = (
        qd.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("q").alias("qq"),
            F.sqrt(F.col("q_l2sq").cast("double")).alias("q_nrm"),
        )
    )
    cands = qd.select(
        F.col(id_col).alias("vec_id"),
        F.col("q").alias("cq"),
        F.sqrt(F.col("q_l2sq").cast("double")).alias("c_nrm"),
    )
    dot = F.aggregate(
        F.zip_with("qq", "cq", lambda x, y: (x.cast("bigint") * y.cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        cands.join(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            round_portable(
                dot.cast("double") / (F.col("q_nrm") * F.col("c_nrm")), 6
            ).alias("qcosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "qcosine")
    )
