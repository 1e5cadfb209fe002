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
"""

from __future__ import annotations

import time

QUIET_SEC = 1.4   # quiet ~1.05 s; >1.4 s = co-tenant steal regime


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
