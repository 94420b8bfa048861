"""Persisted machine-capacity reference for the benchmark steal gates.

The sandbox VM is itself virtualized with CPU steal, and the steal can
be UNIFORM: both legs of any ratio probe slow equally, so every ratio
stays healthy while wall times double.  The only signal that survives
uniform steal is ABSOLUTE compute capacity — but "absolute vs what?"
needs a reference that outlives a single process.  This module persists
the best full-width pure-Python compute rate ever observed per worker
count (``BENCH/probe_ref.json``, max-updating, committed with the repo)
so every bench/scaling run can ask "is this host delivering a sane
fraction of what this machine family has shown it can?".

Ratio probes are separately turbo-confounded: on a measured HEALTHY
idle host, 1 worker ran at 16.0 Mops while 32 workers ran at 10.3
Mops/core — a 1→32 "scaling" of 0.645 with zero steal.  Gates therefore
use half-width→full-width ratios (both legs at near-identical all-core
clocks; 0.93 measured healthy) and this module's absolute floor, never
a single-thread denominator.
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_REF = os.path.join(REPO, "BENCH", "probe_ref.json")


def _burn(k: int) -> int:  # module-level: picklable for pool workers
    x = 0
    for i in range(k):
        x += i * i
    return x


def compute_rate(workers: int, k: int = 4_000_000) -> float:
    """Pure-Python compute rate (ops/sec) at ``workers`` processes."""
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.monotonic()
    with ProcessPoolExecutor(workers) as ex:
        list(ex.map(_burn, [k] * workers * 2))
    return workers * 2 * k / (time.monotonic() - t0)


def probe(workers: int) -> dict:
    """Turbo-robust steal probe at ``workers`` width.

    ``ratio``  — rate(workers) / (2 x rate(workers/2)): collapses when
                 the hypervisor withholds cores from the wide leg.
    ``mops``   — absolute full-width rate, for the uniform-steal floor.
    """
    rh = compute_rate(max(1, workers // 2))
    rn = compute_rate(workers)
    return {
        "ratio": round(rn / (2 * rh), 3),
        "mops": round(rn / 1e6, 1),
        "workers": workers,
    }


def best_mops(workers: int) -> float:
    """Best full-width rate ever recorded for this worker count (0.0 when
    no reference exists yet — the absolute gate then abstains)."""
    try:
        with open(PROBE_REF) as f:
            return float(json.load(f)["best_mops"][str(workers)])
    except (OSError, ValueError, KeyError):
        return 0.0


def update_best_mops(workers: int, mops: float) -> None:
    try:
        with open(PROBE_REF) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    table = data.setdefault("best_mops", {})
    if mops > float(table.get(str(workers), 0.0)):
        table[str(workers)] = round(mops, 1)
        os.makedirs(os.path.dirname(PROBE_REF), exist_ok=True)
        tmp = PROBE_REF + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, PROBE_REF)
