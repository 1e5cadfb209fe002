"""Co-tenant steal probe: a fixed single-core numpy kernel whose
quiet-host time is ~1.05 s on this VM.  The shared host enters steal
regimes where the same kernel takes 6-19 s for minutes at a time with
near-zero local load average (measured round 7, BENCH_CROSSOVER.md
notes); min-of-N inside one invocation cannot defend against a burst
that covers the invocation, so every timing harness gates on this
probe instead of trusting its own repeats.

Two uses:
- ``wait_quiet()`` before a timing run: poll until the probe clears
  the threshold (or attempts run out), so runs start in a quiet
  window by construction.
- ``probe()`` between engine passes: stamp each pass's window so the
  artifact itself says which cells are trustworthy -- a pass is
  "quiet" iff the probes on both sides of it cleared the threshold.

Threshold 1.4 s = quiet value + the standing ±25-35% wobble band;
anything above it is the burst regime, not wobble.

LIMIT (measured r8): the probe is arithmetic+stream-bound, and two
probe-quiet windows still disagreed 1.3-1.9x on SCAN-heavy queries
(events_asof_purchase_click 0.356 vs 0.477 s min-of-many,
text_fingerprints 0.545 vs 0.747) while CPU-bound queries agreed --
some co-tenant contention classes (IO / page-cache / bandwidth
sub-regimes) pass the gate.  So: the gate makes single artifacts
honestly labelled, but cross-window deltas are still only suggestive;
the authoritative comparison remains the interleaved same-session A/B
(tools/ab_*.py pattern), and bench.py's min-across-passes defends
against within-run flips.

Second probe class (r9, addressing that LIMIT): :func:`probe_mt` runs
the same kernel on MT_THREADS threads at once (numpy releases the GIL
inside ufunc loops, so this is real parallel streaming) -- a
single-core kernel can pass while the co-tenant saturates the
machine's AGGREGATE memory bandwidth, which is what a 32-thread
parquet scan actually competes for.  Quiet value measured 0.3-0.65 s
on this host (2026-08-15, repeated runs after the warm round).  RECORDED, not
gating: bench.py stamps it alongside the arithmetic probes so future
rounds can correlate scan-heavy swings with the MT value before any
threshold is trusted to gate.
"""

from __future__ import annotations

import time

QUIET_SEC = 1.4   # quiet ~1.05 s; >1.4 s = co-tenant steal regime
MT_THREADS = 8
MT_QUIET_SEC = 1.0  # quiet 0.3-0.65 s measured; >1.0 = contended band


def probe(runs: int = 4) -> float:
    """Total time of ``runs`` back-to-back executions of the fixed
    single-core kernel -- the round-7 hand-run definition (4 runs,
    quiet total ~1.05 s), kept so the committed threshold and the
    historical BENCH_CROSSOVER notes stay on one scale.  Total (not
    min): a steal burst inside ANY of the four runs should show."""
    import numpy as np

    # Untimed warm-up: the first kernel in a fresh process pays numpy
    # import + 400 MB first-touch page faults (measured 3.06 s vs
    # 0.78 s steady) -- allocator state, not host steal.
    (np.arange(50_000_000) * 3 + 1).sum()
    t0 = time.perf_counter()
    for _ in range(runs):
        (np.arange(50_000_000) * 3 + 1).sum()
    return round(time.perf_counter() - t0, 3)


def probe_mt(threads: int = MT_THREADS, runs: int = 2,
             n: int = 25_000_000) -> float:
    """Wall time of ``threads`` concurrent executions of the streaming
    kernel (``runs`` each) -- the aggregate-memory-bandwidth probe the
    single-core kernel cannot be (see module docstring).  One untimed
    parallel round first (per-thread first-touch page faults are
    allocator state, not host contention), then MIN of two timed
    rounds: measured, a fresh interpreter's first timed round can
    still read 2-6x steady (THP/allocator settling) while contention
    only ever INFLATES, so the min is the honest contention reading."""
    import threading

    import numpy as np

    def work():
        for _ in range(runs):
            (np.arange(n) * 3 + 1).sum()

    def round_of():
        ts = [threading.Thread(target=work) for _ in range(threads)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return round(time.perf_counter() - t0, 3)

    round_of()
    return min(round_of(), round_of())


def wait_quiet(
    threshold: float = QUIET_SEC,
    attempts: int = 10,
    sleep_sec: float = 60.0,
) -> list[float]:
    """Poll the probe until it clears ``threshold``; returns every
    probe value observed (last one <= threshold means quiet was
    reached; otherwise the caller proceeds tagged-noisy rather than
    refusing -- an unattended driver run must still produce an
    artifact, just an honestly labelled one)."""
    vals: list[float] = []
    for i in range(attempts):
        p = probe()
        vals.append(p)
        if p <= threshold:
            return vals
        if i + 1 < attempts:
            time.sleep(sleep_sec)
    return vals
