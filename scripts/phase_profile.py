#!/usr/bin/env python
"""Fixed-vs-scalable decomposition of the replay's per-batch phases.

Runs the IDENTICAL replay child used by scaling_bench at one core count
but TWO input sizes (E and E/4).  For a phase with cost F + V(E)/cores,
two sizes at the same core count give:

    F = (4 * p(E/4) - p(E)) / 3        (per whole leg, batches fixed)

A phase whose cost barely moves with input size is fixed per-batch
overhead (job submission / planning / collect latency) — it hits the N
and 4N legs equally and is the main efficiency sink at sandbox batch
sizes.  A phase whose fixed share is small but whose N->4N ratio is
still poor is a genuinely non-scaling data path.

Usage: python scripts/phase_profile.py [--events 2400000] [--cores 8]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/scripts")
import scaling_bench as sb  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_400_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--also-n", type=int, default=0,
                    help="optionally run the small size at this core count too")
    args = ap.parse_args()

    base = tempfile.mkdtemp(prefix="etl_profile_", dir="/dev/shm")
    try:
        dirs = {}
        for tag, ev in (("big", args.events), ("small", args.events // 4)):
            ev_dir = os.path.join(base, f"ev_{tag}")
            wev_dir = os.path.join(base, f"wev_{tag}")
            sys.stderr.write(f"generating {tag}: {ev} events\n")
            sb.run_py(sb.GEN.format(repo=sb.REPO, events=ev, ev_dir=ev_dir,
                                    wev_dir=wev_dir, batches=2))
            dirs[tag] = (ev, ev_dir, wev_dir)

        results = {}
        runs = [("big", args.cores), ("small", args.cores)]
        if args.also_n:
            runs.append(("small", args.also_n))
        for tag, cores in runs:
            ev, ev_dir, wev_dir = dirs[tag]
            sys.stderr.write(f"replay {tag} at cores={cores}\n")
            r = sb.replay_at(cores, ev, ev_dir, wev_dir, trials=1)
            results[f"{tag}@{cores}"] = r
            sys.stderr.write(json.dumps(r) + "\n")

        big = results[f"big@{args.cores}"]["phases"]
        small = results[f"small@{args.cores}"]["phases"]
        decomp = {}
        for k in sorted(set(big) | set(small)):
            pb, ps = big.get(k, 0.0), small.get(k, 0.0)
            fixed = max(0.0, (4 * ps - pb) / 3)
            decomp[k] = {"big": pb, "small": ps,
                         "fixed": round(fixed, 2),
                         "scaled": round(pb - fixed, 2)}
        print(json.dumps({"cores": args.cores, "events": args.events,
                          "decomp": decomp, "runs": results}, indent=1))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
