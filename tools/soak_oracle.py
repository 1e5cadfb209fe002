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

The comparison itself has to scale with the tier: several entries
return O(input) rows (events_user_gapfill is 65M at sf1), and the
driver's collect-into-Python-tuples compare is a driver-side loop --
exactly the anti-pattern the engine bans in query plans.  Past
``BIG_ROWS`` the soak switches to an engine-side compare: Spark
writes its result to temp parquet (distributed write), DuckDB reads
it next to the oracle relation, and multiset equality is one
``EXCEPT ALL`` in each direction over normalized columns (floats
through ``printf('%.9g')`` -- the same 9-significant-digit
granularity ``oracle_utils._norm`` uses, integers widened to
HUGEINT, everything else through VARCHAR).  Both sides normalize in
the SAME engine, so no cross-engine formatting subtleties enter; no
rows ever land in Python.

Usage:
    python tools/soak_oracle.py [SF_DIR] [OUT_JSON] [--resume]
                                [--only n1,n2,...]
        SF_DIR   default bench_tiers/sf1
        OUT_JSON default CORRECTNESS_SF1.json
        --resume skip entries already green in OUT_JSON (re-runs
                 divergent/errored ones); artifact is rewritten
                 after EVERY entry either way, so a killed soak
                 loses at most the entry in flight.
        --only   run only the named entries (comma-separated) --
                 for targeted soaks at tiers where the full corpus
                 is impractical (e.g. sf10: the artifact then
                 records n_entries = the subset size).

Writes one JSON artifact in the driver's CORRECTNESS format (plus
per-entry wall times for both engines) and prints a one-line summary.
Entries are run in registration order; a failure records the error
and moves on -- the soak's job is the complete divergence list, not
an early exit.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import traceback
import uuid

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# Above this row count the collect-based compare is replaced by the
# parquet + EXCEPT ALL path (a 2M-row collect is ~1 GB of Python
# tuples; DuckDB diffs the same rows in seconds, constant memory).
BIG_ROWS = 2_000_000


def _norm_sql(view: str, cols: list[str], types: dict[str, str]) -> str:
    """SELECT list normalizing VIEW's columns (sorted by name) to
    engine-stable lexical forms, mirroring oracle_utils._norm."""
    parts = []
    for c in sorted(cols):
        t = types[c].upper()
        q = f'"{c}"'
        if "FLOAT" in t or "DOUBLE" in t or "DECIMAL" in t or "REAL" in t:
            parts.append(f"printf('%.9g', CAST({q} AS DOUBLE)) AS {q}")
        elif t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                   "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            parts.append(f"CAST({q} AS HUGEINT) AS {q}")
        else:
            parts.append(f"CAST({q} AS VARCHAR) AS {q}")
    return f"SELECT {', '.join(parts)} FROM {view}"


def compare_large(df, con, sql: str, n_spark: int) -> None:
    """Engine-side multiset compare: same contract as
    oracle_utils.compare (column names -> row count -> values), with
    assertion messages the artifact classifier understands."""
    tmp = os.path.join(tempfile.gettempdir(), f"soak_{uuid.uuid4().hex}")
    try:
        df.write.mode("overwrite").parquet(tmp)
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW _spark AS "
            f"SELECT * FROM '{tmp}/*.parquet'")
        con.execute(f"CREATE OR REPLACE TEMP VIEW _oracle AS {sql}")
        s_desc = {r[0]: r[1] for r in con.execute("DESCRIBE _spark").fetchall()}
        d_desc = {r[0]: r[1] for r in con.execute("DESCRIBE _oracle").fetchall()}
        assert sorted(s_desc) == sorted(d_desc), (
            f"column mismatch: spark={sorted(s_desc)} duckdb={sorted(d_desc)}"
        )
        n_oracle = con.execute("SELECT count(*) FROM _oracle").fetchone()[0]
        assert n_spark == n_oracle, (
            f"row count mismatch: spark={n_spark} duckdb={n_oracle}"
        )
        cols = list(s_desc)
        sel_s = _norm_sql("_spark", cols, s_desc)
        sel_o = _norm_sql("_oracle", cols, d_desc)
        n_diff = con.execute(
            f"SELECT count(*) FROM (({sel_s} EXCEPT ALL ({sel_o})) "
            f"UNION ALL (({sel_o}) EXCEPT ALL ({sel_s})))").fetchone()[0]
        assert n_diff == 0, (
            f"value mismatch ({n_diff} rows in the symmetric EXCEPT ALL)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    argv = sys.argv[1:]
    only: list[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = [n for n in argv[i + 1].split(",") if n]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--resume"]
    resume = "--resume" in argv
    sf_dir = args[0] if len(args) > 0 else os.path.join(
        _ROOT, "bench_tiers", "sf1")
    out_path = args[1] if len(args) > 1 else os.path.join(
        _ROOT, "CORRECTNESS_SF1.json")

    from location_summary_etl_spark import get_session
    from location_summary_etl_spark.plans import corpus
    from location_summary_etl_spark.session import (
        demote_guarded_window_warnings,
    )
    from tests.oracle_utils import compare, duckdb_con

    # The bench session shape: full local core width, AQE on.  The
    # soak is a correctness run, not a timing run -- no probe gating,
    # but wall times are recorded so a pathological entry is visible.
    spark = get_session()
    demote_guarded_window_warnings(spark)
    qs, oracles = corpus.queries(), corpus.oracle_sql()
    if only is not None:
        unknown = [n for n in only if n not in qs]
        if unknown:
            raise SystemExit(f"--only names not in the corpus: {unknown}")
        qs = {n: qs[n] for n in qs if n in only}

    results: dict[str, dict] = {}
    if resume and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("results", {})
        results = {n: r for n, r in prior.items()
                   if n in qs and r.get("hash_match") is not False
                   and not r.get("err")}
        print(f"resume: keeping {len(results)} green entries from "
              f"{out_path}", flush=True)

    t_start = time.time()

    def flush(final: bool = False) -> None:
        n_pass = sum(1 for r in results.values()
                     if r.get("hash_match") is not False and not r.get("err"))
        artifact = {
            "sf_dir": sf_dir,
            "n_entries": len(qs),
            "n_pass": n_pass,
            "complete": final and len(results) == len(qs),
            "total_sec": round(time.time() - t_start, 1),
            "results": {n: results[n] for n in qs if n in results},
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)

    for i, name in enumerate(qs, 1):
        if name in results:
            continue
        row: dict = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "err": None}
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            row["spark_sec"] = round(time.time() - t0, 2)
            t1 = time.time()
            if name in oracles:
                con = duckdb_con(sf_dir)  # fresh con: no view staleness
                n_rows = df.count()
                if n_rows > BIG_ROWS:
                    compare_large(df, con, oracles[name], n_rows)
                    row["compare"] = "parquet_except_all"
                else:
                    compare(df, con, oracles[name])
                con.close()
                row.update(rows_match=True, schema_match=True,
                           hash_match=True)
            else:  # rows-only fallback, mirroring the driver
                assert df.count() >= 0
                row.update(rows_match=True, schema_match=True,
                           hash_match=None)
            row["oracle_sec"] = round(time.time() - t1, 2)
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
        flush()
        print(f"[{i}/{len(qs)}] {name}: {status} "
              f"(spark {row.get('spark_sec', '?')}s, "
              f"oracle {row.get('oracle_sec', '?')}s)", flush=True)

    flush(final=True)
    n_pass = sum(1 for r in results.values()
                 if r.get("hash_match") is not False and not r.get("err"))
    bad = [n for n, r in results.items()
           if r.get("hash_match") is False or r.get("err")]
    print(f"SOAK {n_pass}/{len(qs)} green at {sf_dir} "
          f"in {round(time.time() - t_start, 1)}s; "
          f"divergent/errored: {bad}")
    return 0 if n_pass == len(qs) else 1


if __name__ == "__main__":
    raise SystemExit(main())
