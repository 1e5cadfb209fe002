"""Quantization corpus: int8 embedding compression and quantized ANN.

Oracle parity strategy (see operators/quantize.py): codes and integer
norms/dots are exact integers; every double (scale, MSE, quantized
cosine) is derived from those integers or folded with the same
association on both engines, so the hashes match without epsilon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from location_summary_etl_spark.functions.scalars import round_portable
from location_summary_etl_spark.operators.quantize import (
    int8_quantize,
    quantized_topk,
    reconstruction_mse,
)
from location_summary_etl_spark.plans.corpus import register
from location_summary_etl_spark.plans.corpus_similarity import QUERY_IDS
from location_summary_etl_spark.sources.registry import load_table


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector quantization audit: scale, exact integer L1/L2 of the
    codes, and reconstruction MSE.  Map-only (no shuffle); the kind of
    audit a pipeline runs before committing to a compressed corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    qd = int8_quantize(emb, ["vec_id", "label"])
    l1 = F.aggregate(
        "q", F.lit(0).cast("bigint"), lambda acc, x: acc + F.abs(x).cast("bigint")
    )
    # The MSE must see the UNROUNDED qscale: stage it before the output
    # projection, because an output alias named "qscale" shadows the
    # input column for sibling expressions in the same select (lateral
    # column alias resolution).
    staged = qd.withColumn("_mse", reconstruction_mse(qd))
    return staged.select(
        "vec_id",
        "label",
        round_portable("qscale", 9).alias("qscale"),
        l1.alias("q_l1"),
        "q_l2sq",
        round_portable("_mse", 12).alias("recon_mse"),
    )


# DuckDB replica of the same arithmetic: CAST to double first (exact),
# identical round/floor/sign expressions, 0.0-seeded left folds.
QUANTIZE_SQL = """
WITH e AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS qscale
    FROM embeddings
),
q AS (
    SELECT vec_id, label, v, qscale,
           CASE WHEN qscale = 0
                THEN list_transform(v, x -> 0)
                ELSE list_transform(
                    v, x -> CAST(sign(x / qscale) * floor(abs(x / qscale) + 0.5)
                                 AS INT))
           END AS code
    FROM e
)
SELECT vec_id, label,
       round(CAST(qscale AS DOUBLE), 9) AS qscale,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                list_transform(code, x -> CAST(abs(x) AS BIGINT))),
                   (a, x) -> a + x) AS q_l1,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                list_transform(code, x -> CAST(x AS BIGINT)
                                                          * CAST(x AS BIGINT))),
                   (a, x) -> a + x) AS q_l2sq,
       round(CAST(list_reduce(
                 list_prepend(0.0, list_transform(
                     list_transform(
                         list_zip(v, list_transform(
                             code, x -> CAST(x AS DOUBLE) * qscale)),
                         p -> p[1] - p[2]),
                     x -> x * x))
                 , (a, x) -> a + x) / len(v) AS DOUBLE), 12) AS recon_mse
FROM q
"""


def ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized brute-force top-5 for the standard query set: the
    1-byte/dim scan variant of ann_topk_bruteforce."""
    return quantized_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=5)


_IDS = ", ".join(str(i) for i in QUERY_IDS)

QUANTIZED_TOPK_SQL = f"""
WITH e AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS qscale
    FROM embeddings
),
q AS (
    SELECT vec_id,
           CASE WHEN qscale = 0
                THEN list_transform(v, x -> 0)
                ELSE list_transform(
                    v, x -> CAST(sign(x / qscale) * floor(abs(x / qscale) + 0.5)
                                 AS INT))
           END AS code
    FROM e
),
n AS (
    SELECT vec_id, code,
           sqrt(CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(code, x -> CAST(x AS BIGINT)
                                                      * CAST(x AS BIGINT))),
               (a, x) -> a + x) AS DOUBLE)) AS nrm
    FROM q
),
nz AS (SELECT * FROM n WHERE nrm > 0),
scored AS (
    SELECT qs.vec_id AS query_id, c.vec_id,
           round(CAST(CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                                  list_transform(list_zip(qs.code, c.code),
                                                 p -> CAST(p[1] AS BIGINT)
                                                      * CAST(p[2] AS BIGINT))),
                     (a, x) -> a + x) AS DOUBLE)
                 / (qs.nrm * c.nrm) AS DOUBLE), 6) AS qcosine
    FROM nz c
    CROSS JOIN (SELECT * FROM nz WHERE vec_id IN ({_IDS})) qs
    WHERE c.vec_id <> qs.vec_id
)
SELECT query_id, rank, vec_id, qcosine FROM (
    SELECT query_id, vec_id, qcosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qcosine DESC, vec_id) AS INT) AS rank
    FROM scored
)
WHERE rank <= 5
"""


register("embedding_quantize_int8", embedding_quantize_int8, QUANTIZE_SQL)
register("ann_topk_quantized", ann_topk_quantized, QUANTIZED_TOPK_SQL)
