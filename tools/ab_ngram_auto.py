"""Interleaved A/B for the r8 n-gram form gate: capped inverted-index
aggregate (ngram_jaccard_pairs) vs prefix-filtered join
(ngram_jaccard_pairs_prefix) on two corpora either side of the
selectivity crossover, plus the bounded reuse probe's reading on each
-- the measurement behind NGRAM_PREFIX_MIN_REUSE_RATIO
(operators/dedup.py).

Corpus DENSE: the synthetic documents table (bench_tiers sf0.1,
~40-word vocabulary -- grams shared corpus-wide).  Corpus SPARSE: same
doc count / length, vocabulary 50k words drawn by hash (grams
near-unique to a doc), built deterministically in-plan.

Usage: python tools/ab_ngram_auto.py [tier]   (default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from tools import hostprobe  # noqa: E402


def sparse_corpus(spark, n_docs: int, n_tokens: int = 80,
                  vocab: int = 50_000):
    """Deterministic rich-vocabulary corpus: token j of doc i is
    'w<xxhash64(i*251+j) mod vocab>'; 1% of docs are near-dups of
    their predecessor (shifted by one token) so the operators have
    real pairs to find."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(
                        F.when(F.col("id") % 100 == 1,
                               (F.col("id") - 1) * 251 + j + 1)
                        .otherwise(F.col("id") * 251 + j)),
                        F.lit(vocab)).cast("string"))),
            " ").alias("text"),
    )
    return base


def timed(spark, fn) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from location_summary_etl_spark.operators.dedup import (
        ngram_gram_reuse_probe,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from location_summary_etl_spark.session import get_session

    tier = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    spark = get_session(app_name="ab-ngram-auto")
    spark.range(1).write.format("noop").mode("overwrite").save()
    print("startup probes:",
          hostprobe.wait_quiet(attempts=20, sleep_sec=110), flush=True)

    dense = spark.read.parquet(
        os.path.join(HERE, "bench_tiers", tier, "documents.parquet"))
    n_docs = dense.count()
    sparse = sparse_corpus(spark, n_docs).persist()
    sparse.count()  # materialize once; both forms then read the cache

    for name, docs in (("dense", dense), ("sparse", sparse)):
        ratio = ngram_gram_reuse_probe(docs)
        agg = lambda: ngram_jaccard_pairs(docs)          # noqa: E731
        pre = lambda: ngram_jaccard_pairs_prefix(docs)   # noqa: E731
        timed(spark, agg); timed(spark, pre)             # warm
        ta, tp = [], []
        for _ in range(3):
            ta.append(timed(spark, agg))
            tp.append(timed(spark, pre))
        na = ngram_jaccard_pairs(docs).count()
        np_ = ngram_jaccard_pairs_prefix(docs).count()
        print(f"{name}: n_docs={n_docs} reuse_ratio={ratio:.5f} "
              f"aggregate min {min(ta):.3f}s {sorted(ta)} | "
              f"prefix min {min(tp):.3f}s {sorted(tp)} | "
              f"pairs agg={na} prefix={np_} probe={hostprobe.probe()}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
