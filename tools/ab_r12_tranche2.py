"""r12 A/B tranche 2 (interleaved, one session):

  state_runs_lag  events_state_runs computes run ids with
     row_number(user,ts,id) - row_number(user,type,ts,id): two window
     sort ORDERS, so the one exchange is followed by TWO full sorts.
     The lag form (new_run = type != lag(type), grp = running sum)
     uses ONE order -- one sort, two window passes over it -- and the
     final aggregate still reuses the hash(user_id) partitioning.
     grp values differ but grp is dropped; the run relation (user,
     type, len, start, end) is identical (runs are maximal
     same-type streaks under the same total order either way).

  ngram_drops_share  dedup_ngram_jaccard's filter-mode cap joins the
     per-doc drop counts TWICE (id_a / id_b side).  Today each side
     re-aliases the columns (_did -> id_a / id_b), so the two
     broadcast exchanges differ in schema and ReuseExchange cannot
     fire -- the whole drops lineage (scan -> explode -> collect_list
     aggregate -> over-cap explode -> count) executes twice.  Keeping
     both sides' output schema identical (alias the RELATION, not the
     columns; express the join condition against the qualified name)
     makes the second broadcast a ReusedExchange.

Usage: python tools/ab_r12_tranche2.py [sf_dir]
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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import __spark_entry__ as contract
    from bench import _jit_bean, _warm_until_jit_settles
    from location_summary_etl_spark.functions.scalars import round_portable
    from location_summary_etl_spark.functions.texts import ngrams_from_tokens
    from location_summary_etl_spark.operators.dedup import (
        DEFAULT_MAX_DF,
        _pack_posting,
        _tokenized,
    )
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
        get_session,
    )
    from location_summary_etl_spark.sources.registry import load_table
    from tools import hostprobe

    hostprobe.wait_quiet_all()
    spark = get_session(app_name="ab_r12_t2")
    demote_guarded_window_warnings(spark)
    qs = contract.queries()
    jit = _jit_bean(spark)

    # ---------------- state runs: lag form
    def state_runs_lag(spark_, sf_):
        ev = load_table(spark_, sf_, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        new_run = F.when(
            F.lag("event_type").over(w) == F.col("event_type"), 0
        ).otherwise(1)
        runs = ev.select(
            "user_id", "event_type", "ts",
            F.sum(new_run).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("grp"),
        )
        return (
            runs.groupBy("user_id", "event_type", "grp")
            .agg(
                F.count(F.lit(1)).alias("run_len"),
                F.min("ts").alias("run_start"),
                F.max("ts").alias("run_end"),
            )
            .drop("grp")
        )

    # ---------------- ngram filter-cap with shared drops broadcast
    def ngram_drops_shared(spark_, sf_):
        n, threshold, max_df = 3, 0.5, DEFAULT_MAX_DF
        docs = load_table(spark_, sf_, "documents")
        t = float(threshold)
        na = F.col("ka").bitwiseAND((1 << 21) - 1)
        nb = F.col("kb").bitwiseAND((1 << 21) - 1)
        dgrams = F.array_distinct(ngrams_from_tokens(F.col("_toks"), n))
        packed = F.explode(F.arrays_zip(
            F.col("_dgs"), F.array_repeat(F.size("_dgs"), F.size("_dgs"))))
        postings = (
            _tokenized(docs, "doc_id", "text")
            .select(F.col("doc_id"), dgrams.alias("_dgs"))
            .select(F.col("doc_id"), packed.alias("_z"))
            .select(
                _pack_posting(F.col("doc_id"), F.col("_z")["1"]).alias("pk"),
                F.xxhash64(F.col("_z")["_dgs"]).alias("g"),
            )
        )
        groups = postings.groupBy("g").agg(F.collect_list("pk").alias("xs"))
        buckets = groups.filter(
            (F.size("xs") >= 2) & (F.size("xs") <= max_df))
        drops = (
            groups.filter(F.size("xs") > max_df)
            .select(F.explode("xs").alias("pk"))
            .select(F.shiftright("pk", 21).alias("_did"))
            .groupBy("_did").agg(F.count("*").alias("_d"))
        )
        prs = (
            buckets.select(F.explode("xs").alias("ka"), "xs")
            .select("ka", F.explode("xs").alias("kb"))
            .filter(F.col("ka") < F.col("kb"))
        )
        shared = prs.groupBy("ka", "kb").agg(F.count("*").alias("shared"))
        out = shared.select(
            F.shiftright("ka", 21).alias("id_a"),
            F.shiftright("kb", 21).alias("id_b"),
            na.alias("na"), nb.alias("nb"), "shared",
        )
        da, db = drops.alias("_dal"), drops.alias("_dbl")
        out = (
            out.join(da, F.col("id_a") == F.col("_dal._did"), "left")
            .join(db, F.col("id_b") == F.col("_dbl._did"), "left")
            .select(
                "id_a", "id_b", "shared",
                (F.col("na") - F.coalesce(F.col("_dal._d"), F.lit(0)))
                .alias("na"),
                (F.col("nb") - F.coalesce(F.col("_dbl._d"), F.lit(0)))
                .alias("nb"),
            )
        )
        jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
        return out.select(
            "id_a", "id_b", round_portable(jac, 4).alias("jaccard")
        ).filter(F.col("jaccard") >= threshold)

    pairs = {
        "events_state_runs": (qs["events_state_runs"], state_runs_lag),
        "dedup_ngram_jaccard": (qs["dedup_ngram_jaccard"], ngram_drops_shared),
    }

    def xor_hash(df):
        cols = [F.col(c).cast("string") for c in df.columns]
        r = df.agg(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
                   F.count("*").alias("n")).first()
        return (str(r["h"]), r["n"])

    for name, (a, b) in pairs.items():
        ha, hb = xor_hash(a(spark, sf_dir)), xor_hash(b(spark, sf_dir))
        print("parity", name, ha == hb, ha, hb)
        assert ha == hb, name

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

    times = {n: {"A": [], "B": []} for n in pairs}
    for _ in range(ROUNDS):
        for name, (a, b) in pairs.items():
            times[name]["A"].append(timed(a))
            times[name]["B"].append(timed(b))
    out = {"times": times,
           "min": {n: {v: min(ts) for v, ts in d.items()}
                   for n, d in times.items()},
           "probe": [hostprobe.probe(), hostprobe.probe_mt()]}
    print(json.dumps(out, indent=1))
    with open("/tmp/AB_R12_T2.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
