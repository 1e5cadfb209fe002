"""r12 A/B: project the distinct-gram array ONCE below the n-gram
posting explode (the doc_fingerprints r12 fix applied to
ngram_jaccard_pairs' packed-posting construction).

The non-census posting path inlines ``dgrams`` three times into the
generator input (arrays_zip(dgrams, array_repeat(size(dgrams),
size(dgrams)))); GenerateExec evaluates its input without Project's
codegen subexpression elimination, so the shingle transform +
array_distinct runs three times per row.  A projected ``_dgs`` alias
is non-cheap and referenced 3x, so CollapseProject leaves it alone,
and the generator input stays a non-attribute (the arrays_zip) --
InferFiltersFromGenerate stays exempt.

Usage: python tools/ab_r12_ngram_proj.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.functions.texts import ngrams_from_tokens
    from location_summary_etl_spark.operators.dedup import (
        _pack_posting,
        _tokenized,
        ngram_jaccard_pairs,
    )
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from location_summary_etl_spark.sources.registry import load_table
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_ngram")
    demote_guarded_window_warnings(spark)
    jit = _jit_bean(spark)
    n, threshold = 3, 0.5

    def docs():
        return load_table(spark, sf_dir, "documents")

    def finish(postings):
        t = float(threshold)
        na = F.col("ka").bitwiseAND((1 << 21) - 1)
        nb = F.col("kb").bitwiseAND((1 << 21) - 1)
        buckets = (
            postings.groupBy("g").agg(F.collect_list("pk").alias("xs"))
            .filter(F.size("xs") >= 2)
        )
        prs = (
            buckets.select(F.explode("xs").alias("ka"), "xs")
            .select("ka", F.explode("xs").alias("kb"))
            .filter(F.col("ka") < F.col("kb"))
            .filter(F.least(na, nb) * (1.0 + t) >= t * (na + nb))
        )
        shared = prs.groupBy("ka", "kb").agg(F.count("*").alias("shared"))
        out = shared.select(
            F.shiftright("ka", 21).alias("id_a"),
            F.shiftright("kb", 21).alias("id_b"),
            na.alias("na"), nb.alias("nb"), "shared",
        )
        jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
        return out.select(
            "id_a", "id_b", round_portable(jac, 4).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)

    def q_inline(spark_, sf_):
        # replica of today's uncapped path (parity anchor: the real
        # operator is also timed below)
        dgrams = F.array_distinct(ngrams_from_tokens(F.col("_toks"), n))
        packed = F.explode(F.arrays_zip(
            dgrams, F.array_repeat(F.size(dgrams), F.size(dgrams))))
        postings = (
            _tokenized(docs(), "doc_id", "text")
            .select(F.col("doc_id"), packed.alias("_z"))
            .select(
                _pack_posting(F.col("doc_id"), F.col("_z")["1"]).alias("pk"),
                F.xxhash64(F.col("_z")["0"]).alias("g"),
            )
        )
        return finish(postings)

    def q_proj(spark_, sf_):
        packed = F.explode(F.arrays_zip(
            F.col("_dgs"),
            F.array_repeat(F.size("_dgs"), F.size("_dgs"))))
        postings = (
            _tokenized(docs(), "doc_id", "text")
            .select(
                F.col("doc_id"),
                F.array_distinct(
                    ngrams_from_tokens(F.col("_toks"), n)).alias("_dgs"),
            )
            .select(F.col("doc_id"), packed.alias("_z"))
            .select(
                _pack_posting(F.col("doc_id"), F.col("_z")["1"]).alias("pk"),
                F.xxhash64(F.col("_z")["_dgs"]).alias("g"),
            )
        )
        return finish(postings)

    def q_real(spark_, sf_):
        return ngram_jaccard_pairs(docs(), n=n, threshold=threshold,
                                   max_df=None)

    def xor_hash(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    variants = {"inline": q_inline, "proj": q_proj, "real_uncapped": q_real}
    parity = {v: xor_hash(fn(spark, sf_dir)) for v, fn in variants.items()}
    print("parity:", json.dumps(parity))
    assert len({p for p in parity.values()}) == 1, "variants diverged"

    def timed(fn) -> float:
        spark.catalog.clearCache()
        _warm_until_jit_settles(
            lambda: fn(spark, sf_dir).write.format("noop")
            .mode("overwrite").save(), jit)
        best = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    times = {v: [] for v in variants}
    for _ in range(ROUNDS):
        for v, fn in variants.items():
            times[v].append(timed(fn))
    out = {"times": times, "min": {v: min(ts) for v, ts in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out, indent=1))
    with open("/tmp/AB_R12_NGRAM.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
