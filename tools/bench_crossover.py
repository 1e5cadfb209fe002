"""The 2x-crossover experiment (round-4 verdict item 2).

The floor-bound defense says: most headline queries exceed the
2x-of-DuckDB letter target only because Spark pays a fixed ~23 ms
scheduling cost per job that dwarfs sub-second queries at 17 MB scale,
and the ratio falls as data grows.  Until round 5 that claim rested on
two points (sf0.01, sf0.1) and extrapolation.  This script adds the
third point -- the self-generated ~10x tier from
tools/make_scale_tier.py -- and times every headline query on BOTH
engines at all three scales inside ONE invocation (shared host
conditions, same warm-then-min discipline as bench.py), writing
BENCH_CROSSOVER.json + a committed markdown table to
BENCH_CROSSOVER.md.

Reading the table: a query whose ratio column falls monotonically is
floor-bound as claimed (the distributed-scheduler tax amortizes); a
query whose ratio does NOT fall carries real plan weight and the
floor defense is dead for it.

Usage: python tools/bench_crossover.py [query ...]
(run make_scale_tier first).  With query names, only those are re-timed
and the committed artifacts are NOT rewritten -- subset runs are for
investigating individual trends (env CROSSOVER_REPEATS bumps the
min-of-N discipline for noisier hosts).

``--deep q1 q2 ...`` runs the named queries on tiers sf0.1/sf1/sf10
(make_scale_tier 100x for the last) and MERGES a ``deep`` section into
the committed artifacts -- the follow-up experiment for queries whose
sf1 ratio is still far above the 2x letter target: one more decade of
data shows whether the ratio keeps falling (floor-bound as claimed) or
levels off (real plan weight).

``--retime q1 q2 ...`` (r10 VERDICT #2) re-times ONLY the named main-
table rows under the full two-class gate, RETRYING each row until the
arithmetic and bandwidth stamps on BOTH sides of it are quiet, then
SPLICES the rows into the committed artifacts with provenance (the
``retimes`` ledger in BENCH_CROSSOVER.json records the invocation's
own floor/cal and every stamp; the row's entries in probe_sec /
probe_bw_sec are replaced and a ``<name>_after`` closing stamp added,
so the row is self-bracketed instead of borrowing the next row's
stamp).  This is the repair path for a main-table refresh that caught
a mid-run burst on individual rows: previously such rows stood on the
previous round's cells, which made the table not self-sufficient.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEEP_MARKER = "\n## Deep tier (sf10)\n"  # the one GENERATED "## " heading

REPEATS = int(os.environ.get("CROSSOVER_REPEATS", "2"))
# min-of-REPEATS after one warm run, per (query, engine, sf)


def _time_spark(spark, fn, sf_dir: str) -> float:
    """Warm-then-min, with the warm rep repeated until it overlapped
    < JIT_SETTLE_MS of background C2 compilation (bench.py r11
    finding, ported r12: C2 compiles the plan's generated code on
    background threads AFTER the first warm rep returns, so a timed
    rep taken mid-climb carries 1.0-1.7 s of compile overlap; the
    crossover's first rows were the most exposed, single-warm)."""
    from bench import JIT_SETTLE_MAX_EXTRA, JIT_SETTLE_MS, _jit_bean

    bean = _jit_bean(spark)

    def run():
        spark.catalog.clearCache()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for _ in range(1 + JIT_SETTLE_MAX_EXTRA):
        if bean is None:
            run()
            break
        t0 = bean.getTotalCompilationTime()
        run()
        if bean.getTotalCompilationTime() - t0 < JIT_SETTLE_MS:
            break
    best = float("inf")
    for _ in range(REPEATS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_duck(con, sql: str) -> float:
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import duckdb

    import __spark_entry__ as contract
    from bench import HEADLINE
    from location_summary_etl_spark.session import get_session
    from location_summary_etl_spark.sources.registry import TABLES, table_path

    # ALL tiers are rewritten through the same writer (make_scale_tier's
    # DuckDB COPY; n=1 for the base scales) so every tier shares one
    # physical parquet layout.  The first experiment mixed driver-written
    # base tiers with a DuckDB-written sf1 and DuckDB scanned the 10x
    # lineitem FASTER than the 1x file -- the "trend" measured file
    # layout, not data growth.
    deep = len(sys.argv) > 1 and sys.argv[1] == "--deep"
    retime = len(sys.argv) > 1 and sys.argv[1] == "--retime"
    if retime:
        _retime(sys.argv[2:])
        return
    if deep:
        tiers = [
            ("0.1", os.path.join(HERE, "bench_tiers", "sf0.1")),
            ("1", os.path.join(HERE, "bench_tiers", "sf1")),
            ("10", os.path.join(HERE, "bench_tiers", "sf10")),
        ]
    else:
        tiers = [
            ("0.01", os.path.join(HERE, "bench_tiers", "sf0.01")),
            ("0.1", os.path.join(HERE, "bench_tiers", "sf0.1")),
            ("1", os.path.join(HERE, "bench_tiers", "sf1")),
        ]
    for _, d in tiers:
        if not os.path.isdir(d):
            raise SystemExit(f"missing tier {d} -- run make_scale_tier.py")

    spark = get_session(app_name="bench-crossover")
    qs = contract.queries()
    oracles = contract.oracle_sql()
    names = [n for n in HEADLINE if n in qs and n in oracles]
    subset = sys.argv[2:] if deep else sys.argv[1:]
    if subset:
        unknown = [n for n in subset if n not in names]
        if unknown:
            raise SystemExit(f"not headline/oracled: {unknown}")
        names = subset
    if deep and not subset:
        raise SystemExit("--deep needs explicit query names")

    cons = {}
    for sf, d in tiers:
        con = duckdb.connect()
        # Fail fast instead of filling the disk: the minhash sf10
        # oracle spilled past the host's 77 GB free and took the whole
        # run down (r7).  A capped-temp failure is a recordable DNF.
        con.execute("SET max_temp_directory_size='55GiB'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(d, t)}'")
        cons[sf] = con

    # Session warm-up through the full stack before anything is timed.
    qs[names[0]](spark, tiers[0][1]).write.format("noop").mode(
        "overwrite").save()

    # Steal gate (tools/hostprobe.py): wait for a window where BOTH
    # probe classes are quiet (r10 -- the bandwidth probe separated r9
    # same-commit windows the arithmetic probe called quiet), then
    # stamp boundary probes of both classes before every query row and
    # at the end -- a row is only trusted if the stamps on both sides
    # of it are quiet.  Per-row bandwidth stamps became affordable with
    # the r10 preallocated kernel (~0.5 s incl. warm round vs ~1.5 s
    # for the old allocating one).
    from tools import hostprobe
    startup_probes, startup_bw = hostprobe.wait_quiet_all(
        attempts=20, sleep_sec=110)
    probes: dict[str, float] = {}
    bw_probes: dict[str, float] = {"_startup": startup_bw[-1]}

    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor = min(floor, time.perf_counter() - t0)

    cal = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        cal = min(cal, time.perf_counter() - t0)

    results: dict[str, dict] = {}
    for name in names:
        probes[name] = hostprobe.probe()
        bw_probes[name] = hostprobe.probe_mt()
        row: dict[str, dict] = {}
        for sf, d in tiers:  # sf-inner: codegen/JIT stays hot per query
            s = _time_spark(spark, qs[name], d)
            try:
                k = _time_duck(cons[sf], oracles[name])
            except duckdb.Error as e:
                # e.g. the temp-spill cap above: a per-cell DNF, not a
                # run-fatal crash (the r7 minhash sf10 oracle needed
                # >77 GB of spill).  Spark's time is still recorded.
                row[sf] = {"spark": round(s, 3), "duckdb": None,
                           "ratio": None}
                print(f"{name} sf{sf}: spark={s:.3f} duckdb=DNF "
                      f"({type(e).__name__}: {str(e)[:100]})", flush=True)
                continue
            row[sf] = {"spark": round(s, 3), "duckdb": round(k, 3),
                       "ratio": round(s / k, 2) if k > 0 else None}
            print(f"{name} sf{sf}: spark={s:.3f} duckdb={k:.3f} "
                  f"ratio={s / k:.2f}", flush=True)
        results[name] = row
    probes["_final"] = hostprobe.probe()
    bw_probes["_final"] = hostprobe.probe_mt()
    noisy = sorted(
        set(n for n, p in probes.items() if p > hostprobe.QUIET_SEC)
        | set(n for n, p in bw_probes.items()
              if p > hostprobe.MT_QUIET_SEC))
    if noisy:
        print(f"NOISY boundary probes (arith > {hostprobe.QUIET_SEC}s "
              f"or bw > {hostprobe.MT_QUIET_SEC}s): {noisy}",
              flush=True)

    if deep:
        jpath = os.path.join(HERE, "BENCH_CROSSOVER.json")
        with open(jpath) as f:
            payload = json.load(f)
        deep_prev = payload.get("deep", {}).get("queries", {})
        deep_prev.update(results)  # per-query refresh, keep the rest
        payload["deep"] = {
            "method": (
                f"tiers sf0.1/sf1/sf10 (make_scale_tier 100x), 1 warm + "
                f"min-of-{REPEATS} per cell, one invocation, "
                "probe-gated start + per-query boundary probes"),
            "spark_job_floor_sec": round(floor, 3),
            "host_cpu_cal_sec": round(cal, 3),
            "probe_threshold_sec": hostprobe.QUIET_SEC,
            "probe_bw_threshold_sec": hostprobe.MT_QUIET_SEC,
            "probe_startup_sec": startup_probes,
            "probe_bw_startup_sec": startup_bw,
            "probe_sec": {**payload.get("deep", {}).get("probe_sec", {}),
                          **{k: round(v, 3) for k, v in probes.items()}},
            # r10: per-row bandwidth stamps, GATING (r9 stamps were
            # start/final only and a different kernel scale -- see
            # hostprobe.probe_mt; old probe_bw_runs entries retained
            # as historical evidence, not comparable)
            "probe_bw_sec": {
                **payload.get("deep", {}).get("probe_bw_sec", {}),
                **{k: round(v, 3) for k, v in bw_probes.items()}},
            # bw stamps ACCUMULATE per refresh (the deep table mixes
            # invocations, so a singleton would erase the window
            # evidence behind every retained row -- r9 finding)
            "probe_bw_runs": (
                payload.get("deep", {}).get("probe_bw_runs", [])
                + [{"queries": names,
                    "kernel": "r10-prealloc",
                    **{k.lstrip("_"): round(v, 3)
                       for k, v in bw_probes.items()
                       if k in ("_startup", "_final")}}]),
            "queries": deep_prev,
        }
        results = deep_prev
        names = list(deep_prev)
        with open(jpath, "w") as f:
            json.dump(payload, f, indent=1)
        mdpath = os.path.join(HERE, "BENCH_CROSSOVER.md")
        with open(mdpath) as f:
            md = f.read()
        head, _, rest = md.partition(DEEP_MARKER)
        # The deep section runs to the next "## " heading; any notes /
        # corrections sections after it survive the rewrite (a merge
        # once silently deleted the committed r7 notes).
        nxt = rest.find("\n## ")
        tail = rest[nxt:] if nxt != -1 else ""
        lines = _deep_md_lines(payload["deep"], [sf for sf, _ in tiers])
        with open(mdpath, "w") as f:
            f.write(head.rstrip() + "\n" + "\n".join(lines) + "\n" + tail)
        print("merged deep section into BENCH_CROSSOVER.{json,md}")
        return

    if subset:
        print("subset run -- artifacts not rewritten")
        return

    payload = {
        "method": (
            f"one invocation, per (query, engine, tier): 1 warm run + "
            f"min-of-{REPEATS}; Spark noop sink, cache cleared between "
            "runs; tiers sf0.01/sf0.1 = testdata rewritten via "
            "make_scale_tier n=1, sf1 = 10x re-keyed replication of "
            "sf0.1 -- one writer, one physical layout at every tier; "
            "probe-gated start + per-query boundary probes "
            "(tools/hostprobe.py)"),
        "spark_job_floor_sec": round(floor, 3),
        "host_cpu_cal_sec": round(cal, 3),
        "probe_threshold_sec": hostprobe.QUIET_SEC,
        "probe_bw_threshold_sec": hostprobe.MT_QUIET_SEC,
        "probe_startup_sec": startup_probes,
        "probe_bw_startup_sec": startup_bw,
        # per-row bandwidth stamps, gating since r10 (new kernel scale)
        "probe_bw_sec": {k: round(v, 3) for k, v in bw_probes.items()},
        "probe_sec": {k: round(v, 3) for k, v in probes.items()},
        "queries": results,
    }
    # A full rerun refreshes the MAIN table only -- an existing deep
    # (sf10) section is separate evidence from its own invocation and
    # must survive (a rerun once silently dropped it).
    jpath = os.path.join(HERE, "BENCH_CROSSOVER.json")
    try:
        with open(jpath) as f:
            prev_deep = json.load(f).get("deep")
    except (FileNotFoundError, json.JSONDecodeError):
        prev_deep = None
    if prev_deep:
        payload["deep"] = prev_deep
    with open(jpath, "w") as f:
        json.dump(payload, f, indent=1)

    _write_main_md(payload)
    print("wrote BENCH_CROSSOVER.{json,md}")


def _write_main_md(payload: dict) -> None:
    """Render BENCH_CROSSOVER.md from the json payload: main table
    (worst sf0.1 ratio first), deep section if present, and every
    hand-written "## " notes section carried from the existing file."""
    results = payload["queries"]
    sfs = ["0.01", "0.1", "1"]
    retimed = {q for r in payload.get("retimes", []) for q in r["queries"]}

    def r01(n):
        return results[n]["0.1"]["ratio"] or 0

    lines = [
        "# BENCH_CROSSOVER — Spark/DuckDB ratio vs scale",
        "",
        f"Generated by tools/bench_crossover.py ({payload['method']}).",
        f"Spark job floor {payload['spark_job_floor_sec']} s; host cal "
        f"{payload['host_cpu_cal_sec']} s.",
    ]
    if retimed:
        lines.append(
            "Rows marked † were re-timed in a later fully-gated "
            "invocation and spliced (see the `retimes` ledger in "
            "BENCH_CROSSOVER.json for that invocation's floor/cal and "
            "boundary stamps).")
    lines += [
        "",
        "| query | spark sf0.01 | sf0.1 | sf1 | duck sf0.01 | sf0.1 | sf1 "
        "| ratio sf0.01 | sf0.1 | sf1 | trend |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for n in sorted(results, key=r01, reverse=True):
        q = results[n]
        ratios = [q[sf]["ratio"] for sf in sfs]
        if ratios[2] is not None and ratios[1] is not None:
            trend = ("falling" if ratios[2] < ratios[1]
                     else "flat" if ratios[2] < ratios[1] * 1.15
                     else "RISING")
        else:
            trend = "?"
        label = n + " †" if n in retimed else n
        lines.append(
            "| " + " | ".join(
                [label]
                + [_cell(q[sf]["spark"], "{:.3f}") for sf in sfs]
                + [_cell(q[sf]["duckdb"], "{:.3f}") for sf in sfs]
                + [_cell(q[sf]["ratio"], "{:.2f}") for sf in sfs]
                + [trend]) + " |")
    if payload.get("deep"):
        lines += _deep_md_lines(payload["deep"], ["0.1", "1", "10"])
    # NOTES SURVIVE a full rerun too: every committed "## ... notes"
    # section after the deep table (r7 corrections, r8/r9 refresh
    # notes) is hand-written evidence, not generated -- the r9 full
    # rerun silently deleted all of them before this carry (the same
    # bug the deep branch fixed for its own section in r7).
    mdpath = os.path.join(HERE, "BENCH_CROSSOVER.md")
    carried = ""
    try:
        with open(mdpath) as f:
            old = f.read()
        sections = []
        pos = 0
        while (pos := old.find("\n## ", pos)) != -1:
            sections.append(pos)
            pos += 1
        for p in sections:
            heading = old[p:old.find("\n", p + 1)] + "\n"
            # exclude ONLY the exact generated deep heading: a
            # hand-written note that merely mentions "Deep tier" in
            # its title must survive (r9 review finding)
            if heading != DEEP_MARKER:
                nxt = old.find("\n## ", p + 1)
                carried += old[p:nxt if nxt != -1 else None]
    except FileNotFoundError:
        pass
    with open(mdpath, "w") as f:
        f.write("\n".join(lines) + "\n" + carried)


def _retime(names: list[str], max_attempts: int = 8) -> None:
    """Re-time the named main-table rows under the full two-class gate
    and splice them into the committed artifacts (module docstring).

    Row acceptance is stricter than the full rerun's: the full rerun
    stamps once per row and TAGS noisy rows after the fact; here a row
    whose bracketing stamps (either class, either side) are not quiet
    is DISCARDED and re-timed after a cool-down, up to
    ``max_attempts``.  A row that never gets a quiet bracket is left
    untouched and reported -- splicing a tainted cell would recreate
    the problem this mode exists to fix."""
    import duckdb

    import __spark_entry__ as contract
    from location_summary_etl_spark.session import get_session
    from location_summary_etl_spark.sources.registry import TABLES, table_path
    from tools import hostprobe

    if not names:
        raise SystemExit("--retime needs explicit query names")
    jpath = os.path.join(HERE, "BENCH_CROSSOVER.json")
    with open(jpath) as f:
        payload = json.load(f)
    unknown = [n for n in names if n not in payload["queries"]]
    if unknown:
        raise SystemExit(f"not in the main table: {unknown}")

    tiers = [(sf, os.path.join(HERE, "bench_tiers", f"sf{sf}"))
             for sf in ("0.01", "0.1", "1")]
    spark = get_session(app_name="bench-crossover-retime")
    qs = contract.queries()
    oracles = contract.oracle_sql()
    cons = {}
    for sf, d in tiers:
        con = duckdb.connect()
        con.execute("SET max_temp_directory_size='55GiB'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{table_path(d, t)}'")
        cons[sf] = con
    # full-stack warm-up, then the invocation's own floor/cal for the
    # provenance ledger (cross-invocation splices must carry their own
    # host calibration -- cross-window absolutes are not deltas)
    qs[names[0]](spark, tiers[0][1]).write.format("noop").mode(
        "overwrite").save()
    hostprobe.wait_quiet_all(attempts=20, sleep_sec=110)
    floor = cal = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor = min(floor, time.perf_counter() - t0)
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        cal = min(cal, time.perf_counter() - t0)

    spliced, failed = [], []
    ledger = {"queries": [], "kernel": "r10-prealloc",
              "spark_job_floor_sec": round(floor, 3),
              "host_cpu_cal_sec": round(cal, 3),
              "max_attempts": max_attempts, "stamps": {}}
    for name in names:
        accepted = None
        for attempt in range(1, max_attempts + 1):
            pre_a, pre_b = hostprobe.probe(), hostprobe.probe_mt()
            if pre_a > hostprobe.QUIET_SEC or pre_b > hostprobe.MT_QUIET_SEC:
                print(f"{name} attempt {attempt}: pre-stamp noisy "
                      f"(arith {pre_a}, bw {pre_b}) -- cooling down",
                      flush=True)
                time.sleep(90)
                continue
            row = {}
            for sf, d in tiers:
                s = _time_spark(spark, qs[name], d)
                k = _time_duck(cons[sf], oracles[name])
                row[sf] = {"spark": round(s, 3), "duckdb": round(k, 3),
                           "ratio": round(s / k, 2) if k > 0 else None}
            post_a, post_b = hostprobe.probe(), hostprobe.probe_mt()
            stamps = {"pre": {"arith": pre_a, "bw": pre_b},
                      "post": {"arith": post_a, "bw": post_b},
                      "attempt": attempt}
            if (post_a > hostprobe.QUIET_SEC
                    or post_b > hostprobe.MT_QUIET_SEC):
                print(f"{name} attempt {attempt}: post-stamp noisy "
                      f"(arith {post_a}, bw {post_b}) -- row discarded",
                      flush=True)
                time.sleep(90)
                continue
            accepted = (row, stamps)
            break
        if accepted is None:
            failed.append(name)
            print(f"{name}: NO quiet bracket in {max_attempts} attempts "
                  "-- row left untouched", flush=True)
            continue
        row, stamps = accepted
        payload["queries"][name] = row
        # self-bracketing stamps replace the row's shared-window ones
        payload.setdefault("probe_sec", {})[name] = stamps["pre"]["arith"]
        payload["probe_sec"][f"{name}_after"] = stamps["post"]["arith"]
        payload.setdefault("probe_bw_sec", {})[name] = stamps["pre"]["bw"]
        payload["probe_bw_sec"][f"{name}_after"] = stamps["post"]["bw"]
        ledger["queries"].append(name)
        ledger["stamps"][name] = stamps
        for sf, _ in tiers:
            print(f"{name} sf{sf}: spark={row[sf]['spark']} "
                  f"duckdb={row[sf]['duckdb']} ratio={row[sf]['ratio']}",
                  flush=True)
    if ledger["queries"]:
        payload.setdefault("retimes", []).append(ledger)
        with open(jpath, "w") as f:
            json.dump(payload, f, indent=1)
        _write_main_md(payload)
        print(f"spliced {ledger['queries']} into BENCH_CROSSOVER.json/md"
              + (f"; FAILED (left untouched): {failed}" if failed else ""))
    else:
        print(f"nothing spliced; no quiet bracket for: {failed}")


def _cell(v, fmt):
    # None = engine DNF on that cell (e.g. DuckDB exceeded the
    # temp-spill cap); render visibly rather than crash.
    return ("DNF" if fmt == "{:.3f}" else "—") if v is None else fmt.format(v)


def _deep_md_lines(deep: dict, sfs: list) -> list:
    lines = [
        "", "## Deep tier (sf10)", "",
        f"{deep['method']}; Spark job floor "
        f"{deep['spark_job_floor_sec']} s; host cal "
        f"{deep['host_cpu_cal_sec']} s.",
        "",
        "| query | spark sf0.1 | sf1 | sf10 | duck sf0.1 | sf1 | sf10 "
        "| ratio sf0.1 | sf1 | sf10 |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for n, q in deep["queries"].items():
        lines.append(
            "| " + " | ".join(
                [n]
                + [_cell(q[sf]["spark"], "{:.3f}") for sf in sfs]
                + [_cell(q[sf]["duckdb"], "{:.3f}") for sf in sfs]
                + [_cell(q[sf]["ratio"], "{:.2f}") for sf in sfs]) + " |")
    return lines


if __name__ == "__main__":
    main()
