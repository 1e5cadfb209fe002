"""Full-corpus oracle soak at a chosen scale tier (r10 VERDICT #1).

The driver's correctness gate and its local replica run at
sf0.01/sf0.001 -- toy scales where the machinery the engine is
proudest of (default-on dedup caps, the IVF hot-cell guard, AQE's
runtime SMJ->SHJ conversion, float accumulation over large groups)
never actually bites.  This tool runs EVERY oracle-paired corpus
entry, Spark vs DuckDB, at a self-generated tier (default
bench_tiers/sf1: 10x the sf0.1 testdata, re-keyed -- 6M lineitem,
50k documents, 20k embeddings) with the exact comparison the driver
uses (tests/oracle_utils.compare: row count + column names +
order-insensitive value hash).

Usage:
    python tools/soak_oracle.py [SF_DIR] [OUT_JSON]
        SF_DIR   default bench_tiers/sf1
        OUT_JSON default CORRECTNESS_SF1.json

Writes one JSON artifact in the driver's CORRECTNESS format (plus
per-entry wall times for both engines) and prints a one-line summary.
Entries are run in registration order; a failure records the error
and moves on -- the soak's job is the complete divergence list, not
an early exit.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _ROOT, "bench_tiers", "sf1")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _ROOT, "CORRECTNESS_SF1.json")

    from location_summary_etl_spark import get_session
    from location_summary_etl_spark.plans import corpus
    from tests.oracle_utils import compare, duckdb_con

    # The bench session shape: full local core width, AQE on.  The
    # soak is a correctness run, not a timing run -- no probe gating,
    # but wall times are recorded so a pathological entry is visible.
    spark = get_session()
    from location_summary_etl_spark.session import demote_guarded_window_warnings
    demote_guarded_window_warnings(spark)
    qs, oracles = corpus.queries(), corpus.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = 0
    t_start = time.time()
    for i, name in enumerate(qs, 1):
        row: dict = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "err": None}
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            row["spark_sec"] = round(time.time() - t0, 2)
            t1 = time.time()
            if name in oracles:
                con = duckdb_con(sf_dir)  # fresh con: no view staleness
                compare(df, con, oracles[name])
                con.close()
                row.update(rows_match=True, schema_match=True,
                           hash_match=True)
            else:  # rows-only fallback, mirroring the driver
                assert df.count() >= 0
                row.update(rows_match=True, schema_match=True,
                           hash_match=None)
            row["oracle_sec"] = round(time.time() - t1, 2)
            n_pass += 1
            status = "ok"
        except AssertionError as e:
            # compare() failed: the artifact carries WHICH leg diverged
            msg = str(e)
            row["err"] = msg[:500]
            row["spark_sec"] = round(time.time() - t0, 2)
            if not msg.startswith("column mismatch"):
                row["schema_match"] = True
            if not msg.startswith(("column mismatch", "row count")):
                row["rows_match"] = True
            status = "DIVERGED"
        except Exception as e:  # noqa: BLE001 -- soak must finish
            row["err"] = f"{type(e).__name__}: {e}"[:500]
            row["trace"] = traceback.format_exc()[-1500:]
            status = "ERROR"
        results[name] = row
        print(f"[{i}/{len(qs)}] {name}: {status} "
              f"(spark {row.get('spark_sec', '?')}s, "
              f"oracle {row.get('oracle_sec', '?')}s)", flush=True)

    artifact = {
        "sf_dir": sf_dir,
        "n_entries": len(qs),
        "n_pass": n_pass,
        "total_sec": round(time.time() - t_start, 1),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    bad = [n for n, r in results.items() if not r["hash_match"]
           and r["hash_match"] is not None]
    print(f"SOAK {n_pass}/{len(qs)} green at {sf_dir} "
          f"in {artifact['total_sec']}s; divergent/errored: {bad}")
    return 0 if n_pass == len(qs) else 1


if __name__ == "__main__":
    raise SystemExit(main())
