"""r12 optimization A/B: the ensure_parallelism exchange and the
fingerprint generator input.

Hypotheses (guide §2.3/§2.4), each tested interleaved in ONE session
(cross-window deltas are untrustworthy on this host -- hostprobe.py):

  B  ``ensure_parallelism`` repartitions ROUND-ROBIN, which (a) pays
     the sortBeforeRepartition local sort of the full text payload
     (SPARK-23207: every keyless repartition(n) sorts its input so
     retries reproduce the assignment) and (b) gives downstream
     groupBy(doc_id) aggregates nothing to reuse, so they pay their
     own exchange.  Hash-partitioning by the unique id column skips
     the sort AND satisfies ClusteredDistribution(doc_id ...) for
     every downstream per-doc aggregate -- one exchange deleted from
     minhash signatures / fingerprints / tfidf.  Results are
     partitioning-proof by the fixed-point/argmax policy (r11), so
     the swap is purely physical.

  C  ``doc_fingerprints`` inlines the distinct-shingle array three
     times into the Generate input (arrays_zip(dsh, array_repeat(
     size(dsh), size(dsh)))); projecting dsh ONCE below the explode
     would evaluate the O(shingles) transform+array_distinct once per
     row IF CollapseProject leaves a multiply-referenced non-cheap
     alias alone and InferFiltersFromGenerate stays exempt (the
     generator input arrays_zip(attr,..) is still a non-attribute).

Usage:  python tools/ab_r12_parallelism.py [sf_dir] [out_json]
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
PROBING = os.environ.get("SPARK_GRAFT_AB_PROBE", "1") != "0"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/AB_R12_PAR.json"

    from pyspark.sql import functions as F

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark import session as S
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from tools import hostprobe

    if PROBING:
        hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_par")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    orig_ep = S.ensure_parallelism

    def hashed_ep(df, min_partitions=None):
        """Round-robin -> hash-by-unique-id variant (experiment only:
        the production change threads an explicit ``by=`` key)."""
        out = orig_ep(df, min_partitions)
        if out is df:
            return df
        n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
        for key in ("doc_id", "vec_id"):
            if key in df.columns:
                return df.repartition(n, F.col(key))
        return out

    # C: doc_fingerprints with dsh projected once below the explode.
    def fingerprints_projected(spark, sf_dir):
        from location_summary_etl_spark.functions.scalars import portable_hash32
        from location_summary_etl_spark.functions.texts import char_shingles
        from location_summary_etl_spark.sources.registry import load_table

        docs = load_table(spark, sf_dir, "documents")
        base = S.ensure_parallelism(docs).select(
            F.col("doc_id"),
            F.array_distinct(char_shingles("text", 8)).alias("_dsh"),
        )
        packed = F.explode(
            F.arrays_zip(
                F.col("_dsh"),
                F.array_repeat(F.size("_dsh"), F.size("_dsh"))))
        return (
            base.select(F.col("doc_id"), packed.alias("_z"))
            .select(
                F.col("doc_id"),
                portable_hash32(F.col("_z")["_dsh"]).alias("_h"),
                F.col("_z")["1"].alias("_nd"),
            )
            .groupBy("doc_id")
            .agg(
                F.min("_h").alias("fingerprint"),
                F.min("_nd").cast("int").alias("n_distinct_shingles"),
            )
        )

    TARGETS = ["text_fingerprints", "dedup_minhash_lsh",
               "dedup_ngram_jaccard", "text_token_stats",
               "text_tfidf_top_terms"]

    def run(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def timed(fn) -> float:
        spark.catalog.clearCache()
        _warm_until_jit_settles(lambda: run(fn), jit)
        best = float("inf")
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(fn)
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def xor_hash(df) -> int:
        cols = [F.col(c).cast("string") for c in df.columns]
        row = df.agg(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
            F.count("*").alias("n")).first()
        return (row["h"], row["n"])

    variants: dict[str, dict] = {}
    for name in TARGETS:
        variants[name] = {"A_rr": qs[name]}
        variants[name]["B_hash"] = qs[name]  # run under monkeypatch
    variants["text_fingerprints"]["C_proj_rr"] = fingerprints_projected
    variants["text_fingerprints"]["C_proj_hash"] = fingerprints_projected

    # result parity first (cheap, same session): every variant must
    # emit the identical multiset
    parity = {}
    for name, vs in variants.items():
        ref = None
        for vname, fn in vs.items():
            S.ensure_parallelism = hashed_ep if "hash" in vname else orig_ep
            try:
                h = xor_hash(fn(spark, sf_dir))
            finally:
                S.ensure_parallelism = orig_ep
            if ref is None:
                ref = h
            parity.setdefault(name, {})[vname] = (
                h == ref, [str(x) for x in h])
    print("parity:", json.dumps(parity))

    probes = [hostprobe.probe()] if PROBING else []
    bw = [hostprobe.probe_mt()] if PROBING else []
    times: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in vs} for n, vs in variants.items()}
    for _ in range(ROUNDS):
        for name, vs in variants.items():
            for vname, fn in vs.items():
                S.ensure_parallelism = (
                    hashed_ep if "hash" in vname else orig_ep)
                try:
                    times[name][vname].append(timed(fn))
                finally:
                    S.ensure_parallelism = orig_ep
        if PROBING:
            probes.append(hostprobe.probe())
            bw.append(hostprobe.probe_mt())

    out = {
        "sf_dir": sf_dir, "reps": REPS, "rounds": ROUNDS,
        "times": times,
        "min": {n: {v: min(ts) for v, ts in vs.items()}
                for n, vs in times.items()},
        "parity": {n: {v: ok for v, (ok, _h) in vs.items()}
                   for n, vs in parity.items()},
        "probe_sec": probes, "probe_bw_sec": bw,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["min"], indent=1))


if __name__ == "__main__":
    main()
